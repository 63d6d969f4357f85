"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference only needs exact set-dedup (SURVEY.md §2.7); a training-data
engine needs the near-dup family too. All follow the scale pattern from
the Ray guide: per-batch vectorized signature computation (no shuffle) →
explode to (bucket-key, doc) rows → ``groupby(bucket)`` → candidate pairs
verified within groups. Signatures are seeded/deterministic so retried
blocks reproduce identical output.
"""

from __future__ import annotations

import hashlib
import re
from typing import List, Tuple

import numpy as np
import pyarrow as pa
import ray.data

_WORD_RE = re.compile(r"\w+")


# -- exact dedup -------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the min-id row per distinct text: hash-partition on a content
    hash, first-per-group (guide's exact-dedup pattern). Returns
    (doc_id, n_dups) — the survivor plus its duplicate count."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5((t or "").encode()).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table(
            {
                id_col: batch[id_col],
                "content_hash": pa.array(hashes, pa.string()),
            }
        )

    def keep_first(g: pa.Table) -> pa.Table:
        ids = sorted(g[id_col].to_pylist())
        return pa.table(
            {
                id_col: pa.array([ids[0]], g[id_col].type),
                "n_dups": pa.array([len(ids)], pa.int64()),
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return hashed.groupby("content_hash").map_groups(keep_first, batch_format="pyarrow")


# -- shingling / minhash -----------------------------------------------------


def _shingles(text: str, k: int) -> set:
    words = _WORD_RE.findall((text or "").lower())
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


# per-process word-hash memo: corpora are Zipf-distributed, so the md5 of
# each DISTINCT word is paid once per worker, not once per occurrence
_WORD_HASH_CACHE: dict = {}

# odd mixing constants for combining word hashes into shingle hashes;
# extended deterministically (splitmix of the index) for any shingle_k
_MIX_CACHE: dict = {}


def _mix_constants(k: int) -> np.ndarray:
    got = _MIX_CACHE.get(k)
    if got is None:
        cs = []
        for i in range(k):
            z = ((i + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            cs.append((z ^ (z >> 31)) | 1)  # odd
        got = _MIX_CACHE[k] = np.array(cs, dtype=np.uint64)
    return got


_WORD_CACHE_LIMIT = 2_000_000  # bound the memo on high-cardinality corpora


def _word_hash64(w: str) -> int:
    h = _WORD_HASH_CACHE.get(w)
    if h is None:
        if len(_WORD_HASH_CACHE) >= _WORD_CACHE_LIMIT:
            _WORD_HASH_CACHE.clear()  # amortized reset beats unbounded growth
        h = _WORD_HASH_CACHE[w] = int.from_bytes(
            hashlib.md5(w.encode()).digest()[:8], "big"
        )
    return h


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Deterministic 64-bit hash per distinct k-word shingle: md5-hash each
    distinct word (memoized), then combine sliding windows with odd-constant
    multiply-add (uint64 wraparound is deterministic). Vectorized — no
    per-shingle digest calls."""
    ws = _WORD_RE.findall((text or "").lower())
    if not ws:
        return np.empty(0, dtype=np.uint64)
    hs = np.array([_word_hash64(w) for w in ws], dtype=np.uint64)
    kk = min(k, len(hs))
    with np.errstate(over="ignore"):
        windows = np.lib.stride_tricks.sliding_window_view(hs, kk)
        vals = (windows * _mix_constants(kk)).sum(axis=1, dtype=np.uint64)
    return np.unique(vals)  # shingle SET semantics


def _minhash_sig(shingle_hashes: np.ndarray, num_perm: int, seed: int) -> np.ndarray:
    """Deterministic minhash via num_perm independent universal hashes over
    the 64-bit shingle hashes."""
    if shingle_hashes.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    rng = np.random.default_rng(seed)
    M = np.uint64((1 << 61) - 1)
    a = rng.integers(1, 1 << 60, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 60, size=num_perm, dtype=np.uint64)
    # (a*x+b) mod M for each permutation; outer product then min
    with np.errstate(over="ignore"):
        vals = (shingle_hashes[None, :] * a[:, None] + b[:, None]) % M
    return vals.min(axis=1)


def minhash_signatures_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_perm: int = 64,
    seed: int = 42,
) -> pa.Table:
    ids = batch[id_col].to_pylist()
    sigs = [
        _minhash_sig(_shingle_hashes(t, shingle_k), num_perm, seed)
        for t in batch[text_col].to_pylist()
    ]
    return pa.table(
        {
            id_col: pa.array(ids, batch[id_col].type),
            "minhash": pa.array(
                [s.astype(np.int64).tolist() for s in sigs], pa.list_(pa.int64())
            ),
        }
    )


def minhash_lsh_candidates(
    sigs: ray.data.Dataset,
    id_col: str = "doc_id",
    num_bands: int = 16,
    rows_per_band: int = 4,
) -> ray.data.Dataset:
    """Band the signatures (b bands × r rows), hash each band → explode to
    (band_id, band_hash, doc_id) rows → groupby band bucket → emit
    candidate pairs (a < b). Pairs can repeat across bands; downstream
    verification dedups."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs_ = batch["minhash"].to_pylist()
        o_band, o_hash, o_id = [], [], []
        for did, sig in zip(ids, sigs_):
            for b in range(num_bands):
                seg = tuple(sig[b * rows_per_band : (b + 1) * rows_per_band])
                h = hashlib.md5(repr((b, seg)).encode()).hexdigest()[:16]
                o_band.append(b)
                o_hash.append(h)
                o_id.append(did)
        return pa.table(
            {
                "band": pa.array(o_band, pa.int32()),
                "band_hash": pa.array(o_hash, pa.string()),
                id_col: pa.array(o_id, batch[id_col].type),
            }
        )

    def pairs(g: pa.Table) -> pa.Table:
        ids = sorted(g[id_col].to_pylist())
        a_, b_ = [], []
        # bucket sizes are tiny for sane band widths; quadratic within
        # bucket is the standard LSH cost model. Hot buckets are capped to
        # bound worst-case skew (documented truncation).
        cap = 200
        ids = ids[:cap]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_.append(ids[i])
                b_.append(ids[j])
        return pa.table(
            {
                "id_a": pa.array(a_, g[id_col].type),
                "id_b": pa.array(b_, g[id_col].type),
            }
        )

    exploded = sigs.map_batches(explode, batch_format="pyarrow")
    return exploded.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pyarrow"
    )


def verify_jaccard_pairs(
    candidates: ray.data.Dataset,
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> "pa.Table":
    """Exact n-gram Jaccard over the (small) candidate set: broadcast the
    candidate doc texts (only docs appearing in candidates) and verify on
    the driver-side batch — candidates after LSH are a vanishing fraction
    of the corpus. Returns pairs with jaccard ≥ threshold."""
    import ray

    cand = candidates.to_pandas().drop_duplicates()
    need = set(cand["id_a"]) | set(cand["id_b"])
    if not need:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    need_ref = ray.put(need)

    def project(batch: pa.Table) -> pa.Table:
        needed = ray.get(need_ref)
        ids = batch[id_col].to_pylist()
        mask = [i in needed for i in ids]
        return batch.filter(pa.array(mask, pa.bool_()))

    texts = docs.map_batches(project, batch_format="pyarrow").to_pandas()
    text_of = dict(zip(texts[id_col], texts[text_col]))
    sh = {i: _shingles(t, shingle_k) for i, t in text_of.items()}
    o_a, o_b, o_j = [], [], []
    for a, b in zip(cand["id_a"], cand["id_b"]):
        sa, sb = sh.get(a, set()), sh.get(b, set())
        if not sa and not sb:
            continue
        j = len(sa & sb) / len(sa | sb) if (sa | sb) else 0.0
        if j >= threshold:
            o_a.append(a)
            o_b.append(b)
            o_j.append(j)
    return pa.table(
        {
            "id_a": pa.array(o_a),
            "id_b": pa.array(o_b),
            "jaccard": pa.array(o_j, pa.float64()),
        }
    )


# -- simhash -----------------------------------------------------------------


def simhash_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> pa.Table:
    """64-bit SimHash over word features (md5-derived feature hashes)."""
    from collections import Counter

    ids = batch[id_col].to_pylist()
    out = []
    shifts = np.arange(bits, dtype=np.uint64)
    for t in batch[text_col].to_pylist():
        words = _WORD_RE.findall((t or "").lower())
        if not words:
            out.append(0)
            continue
        counts = Counter(words)
        uniq = list(counts)
        n = np.array([counts[w] for w in uniq], dtype=np.int64)
        hs = np.array([_word_hash64(w) for w in uniq], dtype=np.uint64)
        # one matrix op per doc: ±count per bit, summed over distinct words
        bitmat = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        acc = ((2 * bitmat - 1) * n[:, None]).sum(axis=0)
        sig = int(((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
        out.append(sig - (1 << 63))  # store as signed int64
    return pa.table(
        {
            id_col: pa.array(ids, batch[id_col].type),
            "simhash": pa.array(out, pa.int64()),
        }
    )


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# -- embedding cosine near-dup ----------------------------------------------


def embedding_near_dup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> ray.data.Dataset:
    """Cosine near-duplicate pairs within blocking groups: group by a
    blocking key (here a label/shard column — at web scale an LSH bucket
    of the embedding) and compute the cosine similarity matrix per group
    with one float64 matmul. Emits (id_a < id_b, cosine ≥ threshold)."""

    def per_block(g: pa.Table) -> pa.Table:
        ids = np.asarray(g[id_col].to_pylist())
        vecs = np.asarray(g[vec_col].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sim = unit @ unit.T
        order = np.argsort(ids)
        ids, sim = ids[order], sim[np.ix_(order, order)]
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = sim[iu, ju] >= threshold
        return pa.table(
            {
                "id_a": pa.array(ids[iu[mask]].tolist(), g[id_col].type),
                "id_b": pa.array(ids[ju[mask]].tolist(), g[id_col].type),
                "cosine": pa.array(sim[iu, ju][mask].tolist(), pa.float64()),
            }
        )

    return ds.groupby(block_col).map_groups(per_block, batch_format="pyarrow")


# -- exact n-gram Jaccard all-pairs (verification-side primitive) -------------


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """EXACT token-set Jaccard near-dup pairs (id_a < id_b, jaccard ≥
    threshold). One side of the comparison is broadcast once via
    ``ray.put`` (token sets, not raw text); each batch compares its rows
    against the broadcast side — distributed over the left side, no
    shuffle. This is the exact counterpart the MinHash-LSH path
    (``minhash_lsh_candidates`` → ``verify_jaccard_pairs``) approximates;
    use THAT at corpus scale and this where exactness is required (e.g.
    auditing LSH recall on a sample)."""
    import pandas as pd

    side = ds.to_pandas()  # small side by contract (sample/audit scale)
    sets = {
        did: frozenset((t or "").split())
        for did, t in zip(side[id_col], side[text_col])
    }
    side_ref = ray.put(sets)

    class PairFinder:
        def __init__(self):
            self.sets = ray.get(side_ref)
            self.order = sorted(self.sets)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a_ids, b_ids, jaccs = [], [], []
            for did, text in zip(
                batch[id_col].to_pylist(), batch[text_col].to_pylist()
            ):
                s = frozenset((text or "").split())
                for other in self.order:
                    if other <= did:
                        continue
                    o = self.sets[other]
                    union = len(s | o)
                    j = (len(s & o) / union) if union else 0.0
                    if j >= threshold:
                        a_ids.append(did)
                        b_ids.append(other)
                        jaccs.append(j)
            return pa.table(
                {
                    "id_a": pa.array(a_ids, batch[id_col].type),
                    "id_b": pa.array(b_ids, batch[id_col].type),
                    "jaccard": pa.array(jaccs, pa.float64()),
                }
            )

    return ds.map_batches(PairFinder, batch_format="pyarrow", concurrency=2)
