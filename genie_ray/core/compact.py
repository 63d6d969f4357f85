"""Zero-copy broadcast form of the World for paper-scale catalogs.

The reference's "large" schema carries ~6M entity surfaces
(`download_data.sh:59-70`). The plain :class:`~genie_ray.core.world.World`
holds them as Python dicts (tokenizer vocab, catalog maps, the
token-sequence→surface lookup): correct at fixture scale, but at 6M
surfaces the pickled World is ~750 MB and every worker process pays
40–70 s of CPU just DESERIALIZING those dicts out of plasma — measured in
BASELINE.md "Round-5 paper-scale catalog stress". The trie was never the
problem (flat numpy, zero-copy); the dicts were.

:class:`CompactWorld` re-encodes every heavy member as flat numpy
buffers, so ``ray.get`` from the object store is O(1) memcpy-bounded no
matter the catalog size:

* vocabulary → one utf-8 byte blob + int64 offsets (:class:`StrColumn`);
  word→id is a binary search over the sorted tail (vocab ids 10.. are
  sorted by construction, `core/tokenizer.py`), memoized per process;
* token-sequence→surface lookup → the trie itself plus a node→surface
  int32 array (``FlatTrie.from_sequences_with_leaves``) over a
  :class:`StrColumn` of the sorted surfaces — O(len) trie walk per
  lookup instead of a 6M-entry dict;
* catalogs → aligned (id, surface, provenance-code) StrColumns with a
  by-surface permutation for binary-search lookups; ``to_arrow()``
  feeds the beyond-broadcast ``canonicalize_via_join`` path unchanged.

Conformance: ``tests/test_compact.py`` asserts encode/decode and
extraction outputs are byte-identical between the two forms; the
(slow-marked) 6M stress test measures the before/after fetch cost.
UTF-8 byte order equals code-point order, so byte-wise binary search
agrees exactly with Python ``sorted``/``<`` on str.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .tokenizer import BOS, EOS, PAD, UNK, _SPECIALS, _TAG_WORDS, words
from .trie import FlatTrie


class StrColumn:
    """Immutable string column as (utf-8 blob, offsets) numpy buffers —
    the Arrow string layout, kept as raw numpy so Ray's pickle-5 path
    ships it out-of-band with zero per-element Python objects."""

    __slots__ = ("blob", "offsets")

    def __init__(self, blob: np.ndarray, offsets: np.ndarray):
        self.blob = blob
        self.offsets = offsets

    @classmethod
    def from_strings(cls, strings: Iterable[str]) -> "StrColumn":
        enc = [s.encode("utf-8") for s in strings]
        offsets = np.zeros(len(enc) + 1, np.int64)
        np.cumsum([len(b) for b in enc], out=offsets[1:])
        blob = np.frombuffer(b"".join(enc), np.uint8)
        return cls(blob, offsets)

    def __len__(self) -> int:
        return len(self.offsets) - 1

    def get_bytes(self, i: int) -> bytes:
        return self.blob[self.offsets[i]:self.offsets[i + 1]].tobytes()

    def get(self, i: int) -> str:
        return self.get_bytes(i).decode("utf-8")

    def find_sorted(self, s: str, lo: int = 0, hi: Optional[int] = None) -> int:
        """Index of ``s`` within the (sorted) slice [lo, hi) — -1 if
        absent. Byte-wise binary search (== code-point order)."""
        key = s.encode("utf-8")
        if hi is None:
            hi = len(self)
        while lo < hi:
            mid = (lo + hi) // 2
            if self.get_bytes(mid) < key:
                lo = mid + 1
            else:
                hi = mid
        if lo < len(self) and self.get_bytes(lo) == key:
            return lo
        return -1


_N_HEAD = 4 + 2 + len(_TAG_WORDS)  # specials + brackets + tag words


class CompactVocab:
    """Buffer-backed drop-in for :class:`DetTokenizer`'s encode/decode
    surface (same vocabulary ids: fixed head, sorted tail)."""

    __slots__ = ("_words", "_memo", "bos_token_id", "eos_token_id",
                 "pad_token_id", "unk_token_id")

    def __init__(self, words_col: StrColumn):
        self._words = words_col
        self._memo: Dict[str, int] = {}  # per-process, fills lazily
        self.bos_token_id = BOS
        self.eos_token_id = EOS
        self.pad_token_id = PAD
        self.unk_token_id = UNK

    def __getstate__(self):
        return self._words

    def __setstate__(self, words_col):
        self.__init__(words_col)  # memo intentionally not shipped

    @classmethod
    def from_tokenizer(cls, tok) -> "CompactVocab":
        return cls(StrColumn.from_strings(tok.id2word))

    def __len__(self) -> int:
        return len(self._words)

    def _word_id(self, w: str) -> int:
        got = self._memo.get(w)
        if got is None:
            got = self._words.find_sorted(w, lo=_N_HEAD)
            if got < 0:  # head words ('<', '>', tags) or unknown
                for i in range(4, _N_HEAD):
                    if self._words.get(i) == w:
                        got = i
                        break
                else:
                    got = UNK
            self._memo[w] = got
        return got

    def encode(self, text: str) -> List[int]:
        return [BOS] + [self._word_id(w) for w in words(text)] + [EOS]

    @property
    def word2id(self) -> "_Word2Id":
        """dict.get-compatible view (the scan extractor's batch path
        probes ``tok.word2id.get(w, unk)``, `core/extractor.py:183`)."""
        return _Word2Id(self)

    def decode(self, ids: Iterable[int], skip_special_tokens: bool = True) -> str:
        # identical glue convention to DetTokenizer.decode
        toks = []
        for i in ids:
            if skip_special_tokens and i in _SPECIALS:
                continue
            toks.append(self._words.get(int(i)))
        out: List[str] = []
        prev_glue = True
        for w in toks:
            is_punct = len(w) == 1 and not w.isalnum() and w != "_"
            if not (prev_glue or is_punct) and out:
                out.append(" ")
            out.append(w)
            prev_glue = is_punct
        return "".join(out)


class _Word2Id:
    __slots__ = ("_v",)

    def __init__(self, vocab: "CompactVocab"):
        self._v = vocab

    def get(self, w: str, default=None):
        i = self._v._word_id(w)
        if i == UNK and w != "<unk>":
            return default
        return i


class TrieSurfaceLookup:
    """token-id-tuple → canonical surface, duck-typing ``dict.get`` as
    the extractor consumes it (`core/extractor.py _surface_of`). The
    key set and precedence match the World dict exactly: entities first,
    relations overwrite on (impossible-in-practice) key collisions."""

    __slots__ = ("_tries", "_leaf_idx", "_surfaces", "_eos")

    def __init__(self, tries, leaf_idxs, surfaces, eos: int = EOS):
        # later entries take precedence (dict-update order of the World)
        self._tries: Tuple[FlatTrie, ...] = tuple(tries)
        self._leaf_idx: Tuple[np.ndarray, ...] = tuple(leaf_idxs)
        self._surfaces: Tuple[StrColumn, ...] = tuple(surfaces)
        self._eos = eos

    def get(self, key: Sequence[int], default=None):
        for trie, leaf_idx, surfaces in zip(
            reversed(self._tries), reversed(self._leaf_idx),
            reversed(self._surfaces),
        ):
            node = 0
            for tok in key:
                node = trie.step(node, tok)
                if node < 0:
                    break
            else:
                term = trie.step(node, self._eos)
                if term >= 0:
                    i = int(leaf_idx[term])
                    if i >= 0:
                        return surfaces.get(i)
        return default


_PROV_CODES = ("en_title", "en_label")


class CompactCatalog:
    """Buffer-backed catalog: aligned (id, surface, provenance-code)
    columns in insertion order plus a by-surface permutation. Supports
    the lookup surface the pipelines use (`lookup_id`, `lookup_surface`,
    ``to_arrow`` for the join path, ``surfaces()``); it deliberately has
    NO ``id2surface`` dict — at compact scale the canonicalize stage
    must take the ``canonicalize_via_join`` path, not the broadcast-dict
    one."""

    __slots__ = ("ids", "surfaces", "prov_codes", "prov_legend",
                 "by_surface", "by_id", "overlay")

    def __init__(self, ids: StrColumn, surfaces: StrColumn,
                 prov_codes: np.ndarray, by_surface: np.ndarray,
                 by_id: np.ndarray,
                 prov_legend: Tuple[str, ...] = _PROV_CODES):
        self.ids = ids
        self.surfaces = surfaces
        self.prov_codes = prov_codes
        self.prov_legend = prov_legend
        self.by_surface = by_surface
        self.by_id = by_id
        # process-local additions (lookup-cache fallback resolutions —
        # the reference's per-process replica `update()`,
        # surface_forms_utils.py:343-369); never populated driver-side,
        # so nothing catalog-scale ever ships
        self.overlay: Optional[Dict[str, Tuple[str, str]]] = None

    @classmethod
    def from_catalog(cls, catalog) -> "CompactCatalog":
        rows = [(i, s, p) for i, (s, p) in catalog.id2surface.items()]
        ids = StrColumn.from_strings(r[0] for r in rows)
        surfaces = StrColumn.from_strings(r[1] for r in rows)
        # legend: the standard codes first, then any catalog-specific
        # provenance strings appended (closed small set by construction)
        legend = list(_PROV_CODES)
        code_of = {p: c for c, p in enumerate(legend)}
        codes = []
        for r in rows:
            c = code_of.get(r[2])
            if c is None:
                c = len(legend)
                legend.append(r[2])
                code_of[r[2]] = c
            codes.append(c)
        prov = np.asarray(codes, np.int16)
        surf_list = [r[1] for r in rows]
        by_surface = np.asarray(
            sorted(range(len(rows)), key=surf_list.__getitem__), np.int64
        )
        id_list = [r[0] for r in rows]
        by_id = np.asarray(
            sorted(range(len(rows)), key=id_list.__getitem__), np.int64
        )
        return cls(ids, surfaces, prov, by_surface, by_id, tuple(legend))

    def __len__(self) -> int:
        return len(self.ids)

    def _bisect(self, col: StrColumn, perm: np.ndarray, s: str) -> int:
        key = s.encode("utf-8")
        lo, hi = 0, len(perm)
        while lo < hi:
            mid = (lo + hi) // 2
            if col.get_bytes(int(perm[mid])) < key:
                lo = mid + 1
            else:
                hi = mid
        if lo < len(perm) and col.get_bytes(int(perm[lo])) == key:
            return int(perm[lo])
        return -1

    def lookup_id(
        self, _id: str, allow_labels: bool = False
    ) -> Tuple[Optional[str], Optional[str]]:
        """id → (surface, provenance) with the en_label gate — same
        contract as ``Catalog.lookup_id`` (`core/catalog.py`)."""
        if self.overlay and _id in self.overlay:
            surface, prov = self.overlay[_id]
        else:
            i = self._bisect(self.ids, self.by_id, _id)
            if i < 0:
                return None, None
            surface, prov = self.surfaces.get(i), self.prov_legend[
                self.prov_codes[i]
            ]
        if prov == "en_label" and not allow_labels:
            return None, None
        return surface, prov

    def has_id(self, _id: str) -> bool:
        """Membership regardless of the label gate (the miss test the
        lookup-cache fallback uses before fetching)."""
        if self.overlay and _id in self.overlay:
            return True
        return self._bisect(self.ids, self.by_id, _id) >= 0

    def add_entry(self, _id: str, surface: str, provenance: str) -> None:
        """Process-local overlay insert (reference ``update()``)."""
        if self.overlay is None:
            self.overlay = {}
        self.overlay[_id] = (surface, provenance)

    def lookup_surface(self, surface: str) -> Optional[str]:
        """surface → id; None on miss (``Catalog.lookup_surface``)."""
        i = self._bisect(self.surfaces, self.by_surface, surface)
        if i >= 0:
            return self.ids.get(i)
        if self.overlay:  # overlay is lookup-cache-sized: linear is fine
            for _id, (s, _p) in self.overlay.items():
                if s == surface:
                    return _id
        return None

    def surface_map(self) -> "SurfaceEntryMap":
        """dict.get-compatible surface → (id, provenance) view — what
        the canonicalize actor builds as a per-process dict from the
        plain Catalog; here it is a memoized binary search so no worker
        ever materializes catalog-scale Python state."""
        return SurfaceEntryMap(self)

    def surfaces_list(self) -> List[str]:
        return [self.surfaces.get(i) for i in range(len(self))]

    def to_arrow(self, id_col: str = "id"):
        import pyarrow as pa

        return pa.table({
            id_col: pa.array(
                [self.ids.get(i) for i in range(len(self))], pa.string()
            ),
            "surface": pa.array(
                [self.surfaces.get(i) for i in range(len(self))],
                pa.string(),
            ),
            "provenance": pa.array(
                [self.prov_legend[c] for c in self.prov_codes], pa.string()
            ),
        })


class SurfaceEntryMap:
    __slots__ = ("_cat", "_memo")

    def __init__(self, cat: "CompactCatalog"):
        self._cat = cat
        self._memo: Dict[str, Optional[Tuple[str, str]]] = {}

    def get(self, surface: Optional[str], default=None):
        if surface is None:  # null triple slots: dict.get(None) semantics
            return default
        if surface in self._memo:
            got = self._memo[surface]
        else:
            c = self._cat
            i = c._bisect(c.surfaces, c.by_surface, surface)
            got = (
                None if i < 0
                else (c.ids.get(i), c.prov_legend[c.prov_codes[i]])
            )
            self._memo[surface] = got
        return default if got is None else got


class CompactWorld:
    """Buffer-backed World: same ``make_extractor`` contract, O(1)
    per-process deserialization from the object store regardless of
    catalog size. Built via :meth:`genie_ray.core.world.World.compact`
    (or directly with :meth:`build` to skip the dict World entirely)."""

    __slots__ = ("tokenizer", "entities", "relations",
                 "entities_trie", "relations_trie", "surface_lookup")

    def __init__(self, tokenizer, entities, relations,
                 entities_trie, relations_trie, surface_lookup):
        self.tokenizer = tokenizer
        self.entities = entities
        self.relations = relations
        self.entities_trie = entities_trie
        self.relations_trie = relations_trie
        self.surface_lookup = surface_lookup

    @classmethod
    def build(cls, entities, relations, dedup_titles: bool = True) -> "CompactWorld":
        """Build straight from catalogs — same semantics as
        ``World.build`` (title dedup first, `utils.py:71-104`) but never
        materializes the dict lookup, so peak driver memory stays
        buffer-sized."""
        from .tokenizer import DetTokenizer

        if dedup_titles:
            entities = entities.dedup_surfaces()
            relations = relations.dedup_surfaces()
        tok = DetTokenizer(entities.surfaces() + relations.surfaces())
        e_trie, e_sorted, e_leaves = FlatTrie.from_strings_with_leaves(
            entities.surfaces(), tok
        )
        r_trie, r_sorted, r_leaves = FlatTrie.from_strings_with_leaves(
            relations.surfaces(), tok
        )

        def leaf_idx(trie: FlatTrie, leaves: np.ndarray) -> np.ndarray:
            out = np.full(trie.num_nodes, -1, np.int32)
            ok = leaves >= 0
            out[leaves[ok]] = np.arange(len(leaves), dtype=np.int64)[ok]
            return out

        lookup = TrieSurfaceLookup(
            tries=(e_trie, r_trie),
            leaf_idxs=(leaf_idx(e_trie, e_leaves), leaf_idx(r_trie, r_leaves)),
            surfaces=(StrColumn.from_strings(e_sorted),
                      StrColumn.from_strings(r_sorted)),
            eos=tok.eos_token_id,
        )
        return cls(
            tokenizer=CompactVocab.from_tokenizer(tok),
            entities=CompactCatalog.from_catalog(entities),
            relations=CompactCatalog.from_catalog(relations),
            entities_trie=e_trie,
            relations_trie=r_trie,
            surface_lookup=lookup,
        )

    def make_extractor(
        self,
        num_beams: int = 10,
        validate_with_fsm: bool = True,
        max_input_tokens: int = 256,
        decode_mode: str = "scan",
    ):
        from .extractor import DeterministicExtractor

        return DeterministicExtractor(
            self.tokenizer,
            self.entities_trie,
            self.relations_trie,
            num_beams=num_beams,
            validate_with_fsm=validate_with_fsm,
            surface_lookup=self.surface_lookup,
            max_input_tokens=max_input_tokens,
            decode_mode=decode_mode,
        )

    # -- persistence (S6 "trie persist/share" extended to the full world:
    # the driver-side build is minutes at the reference's 6M-surface
    # magnitude — pay it once per catalog version, mmap-load it per run.
    # The reference pickles its trie + dicts the same way,
    # `trie.py:65-77` / `surface_forms_utils.py:250-262`) ----------------

    def save_npz(self, path: str) -> None:
        """One .npz of flat arrays — no pickle, loads zero-copy-ish."""
        arrays = {
            "vocab_blob": self.tokenizer._words.blob,
            "vocab_offsets": self.tokenizer._words.offsets,
        }
        for name, trie in (("et", self.entities_trie),
                           ("rt", self.relations_trie)):
            for k, v in trie.to_arrays().items():
                arrays[f"{name}_{k}"] = v
        sl = self.surface_lookup
        for j in range(len(sl._leaf_idx)):
            arrays[f"sl{j}_leaf_idx"] = sl._leaf_idx[j]
            arrays[f"sl{j}_blob"] = sl._surfaces[j].blob
            arrays[f"sl{j}_offsets"] = sl._surfaces[j].offsets
        arrays["sl_eos"] = np.asarray([sl._eos], np.int64)
        for name, cat in (("ec", self.entities), ("rc", self.relations)):
            arrays[f"{name}_ids_blob"] = cat.ids.blob
            arrays[f"{name}_ids_offsets"] = cat.ids.offsets
            arrays[f"{name}_surf_blob"] = cat.surfaces.blob
            arrays[f"{name}_surf_offsets"] = cat.surfaces.offsets
            arrays[f"{name}_prov"] = cat.prov_codes
            arrays[f"{name}_by_surface"] = cat.by_surface
            arrays[f"{name}_by_id"] = cat.by_id
            legend_col = StrColumn.from_strings(cat.prov_legend)
            arrays[f"{name}_legend_blob"] = legend_col.blob
            arrays[f"{name}_legend_offsets"] = legend_col.offsets
        np.savez(path, **arrays)

    @classmethod
    def load_npz(cls, path: str) -> "CompactWorld":
        z = np.load(path)  # flat arrays only — no pickle anywhere

        def col(prefix):
            return StrColumn(z[f"{prefix}_blob"], z[f"{prefix}_offsets"])

        def trie(name):
            return FlatTrie.from_arrays({
                k: z[f"{name}_{k}"]
                for k in ("node_start", "edge_tokens", "edge_child")
            })

        def cat(name):
            legend = col(f"{name}_legend")
            return CompactCatalog(
                col(f"{name}_ids"), col(f"{name}_surf"), z[f"{name}_prov"],
                z[f"{name}_by_surface"], z[f"{name}_by_id"],
                tuple(legend.get(i) for i in range(len(legend))),
            )

        e_trie, r_trie = trie("et"), trie("rt")
        lookup = TrieSurfaceLookup(
            tries=(e_trie, r_trie),
            leaf_idxs=(z["sl0_leaf_idx"], z["sl1_leaf_idx"]),
            surfaces=(StrColumn(z["sl0_blob"], z["sl0_offsets"]),
                      StrColumn(z["sl1_blob"], z["sl1_offsets"])),
            eos=int(z["sl_eos"][0]),
        )
        return cls(
            tokenizer=CompactVocab(StrColumn(z["vocab_blob"],
                                             z["vocab_offsets"])),
            entities=cat("ec"),
            relations=cat("rc"),
            entities_trie=e_trie,
            relations_trie=r_trie,
            surface_lookup=lookup,
        )
