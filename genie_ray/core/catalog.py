"""Entity / relation catalogs: surface-form ↔ catalog-ID mappings.

Mirrors the reference's ``WikidataID2SurfaceForm`` (`/root/reference/genie/
datamodule/utils/surface_forms_utils.py:235-404`) in closed-world form:

* each catalog row is ``(id, surface, provenance)`` with provenance in
  ``{en_title, en_label}`` (`_get_surface_form_from_info_obj`, `:297-308`);
* ``lookup_id``: id → (surface, provenance); an ``en_label`` entry is hidden
  unless ``allow_labels`` (`get_from_wikidata_id`, `:369-404`); a missing id
  → (None, None). The reference's live pywikibot fallback (`:310-340`) is
  NOT ported — catalogs here are closed-world;
* ``surface2id``: later duplicate surfaces overwrite earlier ones, like the
  reference's dict construction (`construct_surface_form2id`, `:278-295`) —
  which is why catalogs are title-deduped first;
* ``dedup_surfaces``: remove ALL rows whose surface collides, so that
  surface ↔ id is bijective (reference `utils.py:39-104`, asserted at
  `:83,101`).

Triple-level helpers mirror ``TripletUtils.process_triple_of_ids``
(`triplet_utils.py:37-68`): per-triple match status is ``no_match`` if any
element misses, ``label`` if any element matched via ``en_label``, else
``title``.

Catalogs persist as Parquet (not JSONL/pickle) and are broadcast to actors
via ``ray.put`` of the plain-dict state.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import pyarrow as pa

EN_TITLE = "en_title"
EN_LABEL = "en_label"

STATUS_TITLE = "title"
STATUS_LABEL = "label"
STATUS_NO_MATCH = "no_match"


class Catalog:
    """One side (entities or relations) of the constrained world."""

    def __init__(self, rows: Iterable[Tuple[str, str, str]] = ()):
        # id -> (surface, provenance); insertion order preserved like the
        # reference's dicts.
        self.id2surface: Dict[str, Tuple[str, str]] = {}
        for _id, surface, provenance in rows:
            assert _id not in self.id2surface, "Duplicate catalog IDs"  # surface_forms_utils.py:258
            self.id2surface[_id] = (surface, provenance)
        self._rebuild_surface_index()

    def _rebuild_surface_index(self) -> None:
        # later duplicates overwrite (construct_surface_form2id, :278-295)
        self.surface2id: Dict[str, str] = {
            surface: _id for _id, (surface, _prov) in self.id2surface.items()
        }

    # -- reference semantics -------------------------------------------------

    def lookup_id(
        self, _id: str, allow_labels: bool = False
    ) -> Tuple[Optional[str], Optional[str]]:
        """id → (surface, provenance) with the en_label gate
        (`surface_forms_utils.py:369-404`)."""
        entry = self.id2surface.get(_id)
        if entry is None:
            return None, None
        surface, provenance = entry
        if provenance == EN_LABEL and not allow_labels:
            return None, None
        return surface, provenance

    def lookup_surface(self, surface: str) -> Optional[str]:
        """surface → id; None on miss (the reference raises KeyError at
        `genie_base_pl.py:408` — we make misses explicit)."""
        return self.surface2id.get(surface)

    def dedup_surfaces(self) -> "Catalog":
        """Drop ALL ids whose surface occurs more than once (reference
        `utils.py:71-86`); returns a new bijective catalog."""
        counts: Dict[str, int] = {}
        for _id, (surface, _p) in self.id2surface.items():
            counts[surface] = counts.get(surface, 0) + 1
        kept = [
            (_id, surface, prov)
            for _id, (surface, prov) in self.id2surface.items()
            if counts[surface] == 1
        ]
        out = Catalog(kept)
        assert len(out.id2surface) == len(out.surface2id)  # utils.py:83,101
        return out

    # -- (de)materialization -------------------------------------------------

    def __len__(self) -> int:
        return len(self.id2surface)

    def surfaces(self) -> List[str]:
        return [s for s, _ in self.id2surface.values()]

    def to_arrow(self, id_col: str = "id") -> pa.Table:
        ids, surfs, provs = [], [], []
        for _id, (s, p) in self.id2surface.items():
            ids.append(_id)
            surfs.append(s)
            provs.append(p)
        return pa.table({id_col: ids, "surface": surfs, "provenance": provs})

    @classmethod
    def from_arrow(cls, table: pa.Table, id_col: str = "id") -> "Catalog":
        return cls(
            zip(
                table[id_col].to_pylist(),
                table["surface"].to_pylist(),
                table["provenance"].to_pylist(),
            )
        )


def triple_match_status(provenances: Sequence[Optional[str]]) -> str:
    """Per-triple status from the three element provenances
    (`triplet_utils.py:59-66`)."""
    if any(p is None for p in provenances):
        return STATUS_NO_MATCH
    if any(p == EN_LABEL for p in provenances):
        return STATUS_LABEL
    if all(p == EN_TITLE for p in provenances):
        return STATUS_TITLE
    raise Exception("Invalid provenance")


def annotate_id_triple(
    triple: Sequence[str],
    entities: Catalog,
    relations: Catalog,
    allow_labels: bool = False,
):
    """ID triple → (status, id_form, surface_form, provenance); mirrors
    ``process_triple_of_ids`` (`triplet_utils.py:37-68`)."""
    if len(triple) != 3:
        raise Exception("Invalid triple:", triple)
    head_id, rel_id, tail_id = triple
    head_s, head_p = entities.lookup_id(head_id, allow_labels)
    tail_s, tail_p = entities.lookup_id(tail_id, allow_labels)
    rel_s, rel_p = relations.lookup_id(rel_id, allow_labels)
    status = triple_match_status([head_p, rel_p, tail_p])
    return status, tuple(triple), [head_s, rel_s, tail_s], [head_p, rel_p, tail_p]


def canonicalize_surface_triple(
    triple: Sequence[str], entities: Catalog, relations: Catalog
) -> Tuple[Optional[str], Optional[str], Optional[str], bool]:
    """Surface triple → (subj_id, pred_id, obj_id, matched); the exact-match
    lookup of ``_convert_surface_form_triplets_to_ids``
    (`genie_base_pl.py:406-410`) with misses made explicit."""
    s, r, o = triple
    sid = entities.lookup_surface(s)
    rid = relations.lookup_surface(r)
    oid = entities.lookup_surface(o)
    return sid, rid, oid, (sid is not None and rid is not None and oid is not None)
