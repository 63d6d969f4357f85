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
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

_WORD_RE = re.compile(r"\w+")


# -- exact dedup -------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Keep the min-id row per distinct text. Returns (doc_id, n_dups) —
    the survivor plus its duplicate count.

    Bucketed two-phase aggregation (the 100-TB shape): each batch combines
    locally with one Arrow ``group_by`` (min-id + count per content hash)
    and tags a hash-derived bucket, so the exchange moves one row per
    (batch × distinct text) and the wide ``groupby`` orders only
    ``num_buckets`` values — never a global sort over every content hash.
    Hot buckets stay bounded: after the local combine a hash contributes
    at most one row per upstream batch.

    The content hash is per-row Python md5 deliberately: EXACT dedup must
    not merge distinct texts, and md5's 128 bits make collisions
    negligible at 10^12 rows where a vectorized 64-bit hash (polars/
    xxhash) gives a birthday-bound collision probability near 1. The md5
    costs ~1 µs/doc — reading the text dominates it."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        hashes, buckets = [], []
        for t in texts:
            h = hashlib.md5((t or "").encode()).hexdigest()
            hashes.append(h)
            buckets.append(int(h[:8], 16) % num_buckets)
        t = pa.table(
            {
                "content_hash": pa.array(hashes, pa.string()),
                "bucket": pa.array(buckets, pa.int32()),
                id_col: batch[id_col],
            }
        )
        g = t.group_by(["content_hash", "bucket"]).aggregate(
            [(id_col, "min"), (id_col, "count")]
        )
        return g.rename_columns(["content_hash", "bucket", "min_id", "n"])

    def merge(g: pa.Table) -> pa.Table:
        t = g.group_by("content_hash").aggregate(
            [("min_id", "min"), ("n", "sum")]
        )
        return pa.table(
            {
                id_col: t["min_id_min"],
                "n_dups": t["n_sum"],
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return parts.groupby("bucket").map_groups(merge, batch_format="pyarrow")


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
    """Deterministic minhash: ``num_perm`` independent affine hashes
    ``((a·x + b) mod 2^64) mod M`` (odd ``a``, M = 2^61−1) over the 64-bit
    shingle hashes. NOTE: the multiply wraps mod 2^64 BEFORE the mod-M
    reduction, so this is a multiply-shift-style mixing family, not the
    textbook (a·x+b) mod M universal family — weaker theoretical collision
    bounds, identical determinism, and empirically uniform on md5-derived
    inputs (the shingle hashes are already well-mixed)."""
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
    bucket_cap: int = 200,
    num_shuffle_buckets: int = 64,
) -> ray.data.Dataset:
    """Band the signatures (b bands × r rows), hash each band → explode to
    (band_id, band_hash, doc_id) rows → ONE bucketed shuffle → emit
    candidate pairs (a < b). Pairs can repeat across bands; downstream
    verification dedups.

    The wide step shuffles ``num_shuffle_buckets`` hash buckets of the
    band keys, NOT one group per distinct (band, band_hash) — almost every
    band value is a singleton, and a per-group Python callback over tens
    of thousands of one-doc groups measured ~4 s at sf0.1 where the
    bucketed form (Arrow ``group_by`` cohort detection inside each bucket,
    Python only for the rare ≥2-doc cohorts) takes well under 1 s.

    Hot buckets (boilerplate-heavy corpora) are capped at ``bucket_cap``
    docs to bound the quadratic within-bucket cost; truncation is NOT
    silent — every emitted pair row carries ``bucket_truncated`` (number
    of docs dropped from its bucket, 0 normally) and each truncation is
    logged, so recall loss is observable downstream."""
    import logging

    band_salts = _mix_constants(num_bands)  # distinct 64-bit salt per band

    def explode(batch: pa.Table) -> pa.Table:
        """Vectorized banding: one multiply-add reduction per batch turns
        each (doc, band) signature segment into a 64-bit bucket key — no
        per-row hashing (the earlier md5-of-repr cost ~1s per 5k docs)."""
        ids = batch[id_col].to_pylist()
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int32()),
                    "band": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.int64()),
                    id_col: pa.array([], batch[id_col].type),
                }
            )
        from .similarity import _vec_matrix

        sig = _vec_matrix(batch["minhash"]).view(np.uint64)  # int64 preserved
        sig = sig.reshape(n, num_bands, rows_per_band)
        mix = _mix_constants(rows_per_band)
        with np.errstate(over="ignore"):
            bh = (sig * mix).sum(axis=2, dtype=np.uint64) ^ band_salts[None, :]
        flat = bh.T.reshape(-1)
        return pa.table(
            {
                "bucket": pa.array(
                    (flat % np.uint64(num_shuffle_buckets)).astype(np.int32)
                ),
                "band": pa.array(
                    np.repeat(np.arange(num_bands, dtype=np.int32), n)
                ),
                "band_hash": pa.array(flat.view(np.int64)),
                id_col: pa.array(ids * num_bands, batch[id_col].type),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        """One hash bucket of band keys: find multi-doc cohorts with a
        single Arrow ``group_by`` (singletons — the vast majority — never
        touch Python), then pair-generate inside each ≥2-doc cohort."""
        cohorts = g.group_by(["band", "band_hash"]).aggregate(
            [(id_col, "count"), (id_col, "list")]
        )
        counts = cohorts[f"{id_col}_count"].to_numpy()
        keep = np.flatnonzero(counts >= 2)
        a_, b_, trunc_ = [], [], []
        if len(keep):
            bands = cohorts["band"].to_numpy()
            hashes = cohorts["band_hash"].to_numpy()
            id_lists = cohorts[f"{id_col}_list"].to_pylist()
            for i in keep:
                ids = sorted(id_lists[i])
                # bucket sizes are tiny for sane band widths; quadratic
                # within cohort is the standard LSH cost model
                truncated = max(0, len(ids) - bucket_cap)
                if truncated:
                    logging.getLogger(__name__).warning(
                        "LSH bucket (%s, %s) holds %d docs; capped at %d — "
                        "%d docs dropped from candidate generation",
                        int(bands[i]), int(hashes[i]),
                        len(ids), bucket_cap, truncated,
                    )
                ids = ids[:bucket_cap]
                for x in range(len(ids)):
                    for y in range(x + 1, len(ids)):
                        a_.append(ids[x])
                        b_.append(ids[y])
                        trunc_.append(truncated)
        return pa.table(
            {
                "id_a": pa.array(a_, g[id_col].type),
                "id_b": pa.array(b_, g[id_col].type),
                "bucket_truncated": pa.array(trunc_, pa.int64()),
            }
        )

    # shuffle partitions scale with the bucket count (raise
    # num_shuffle_buckets for bigger corpora — partitions follow), never a
    # fixed constant that would concentrate a corpus-scale exploded stream
    exploded = sigs.map_batches(explode, batch_format="pyarrow")
    return exploded.groupby(
        "bucket", num_partitions=max(1, num_shuffle_buckets // 8)
    ).map_groups(bucket_pairs, batch_format="pyarrow")


_PAIR_SEP = "\x1f"


def verify_jaccard_pairs(
    candidates: ray.data.Dataset,
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
    num_partitions: int = 8,
    broadcast_limit: int = 20_000,
) -> ray.data.Dataset:
    """Distributed exact-Jaccard verification of LSH candidate pairs.

    Nothing corpus-sized touches the driver: the pair table stays
    distributed end-to-end, and only the DISTINCT candidate-ID column
    (#candidate docs ≤ #pairs×2, a vanishing fraction of the corpus by
    LSH design) is batch-locally deduped in the cluster and streamed to
    the driver to build the docs-scan pruning set:

        candidates → groupby(id_a, id_b)             # global pair dedup
        pairs → distinct ids (batch-local dedup → streamed driver union)
        docs ⋉ candidate-ids → per-doc shingle-hash arrays
        → shingle attach (broadcast or join, see below)
        → one vectorized batch pass: exact Jaccard ≥ threshold

    Shingle attach is the repo's standard size-threshold switch (same
    boundary as q5's supplier side and M12 canonicalization): when the
    candidate-doc count is ≤ ``broadcast_limit`` the {id: shingle-blob}
    map rides plasma once (``ray.put``) and one task pass over the pair
    table judges every pair — zero extra shuffle barriers. Above the
    limit (boilerplate-heavy corpora where even the candidate set is too
    big to hold anywhere whole) the blobs attach via two native hash
    joins on id_a then id_b; both paths share the same Jaccard kernel and
    are conformance-tested equal.

    No per-group Python anywhere: pair dedup is a native groupby, the
    shingle sets ride as binary blobs (raw uint64 bytes), and the final
    pass does one ``np.intersect1d`` per pair (real O(|set|) work, not
    bookkeeping) — ~8 bytes/shingle regardless of text size. Returns a
    Dataset of (id_a, id_b, jaccard)."""
    import ray

    sch = docs.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]

    def empty_out():
        return ray.data.from_arrow(
            pa.table(
                {"id_a": pa.array([], id_type), "id_b": pa.array([], id_type),
                 "jaccard": pa.array([], pa.float64())}
            )
        )

    def local_dedup(t: pa.Table) -> pa.Table:
        return t.select(["id_a", "id_b"]).group_by(["id_a", "id_b"]).aggregate([])

    # materialize ONCE: the pair table is tiny (LSH output) but feeds two
    # consumers below (id-set derivation + the joins) — without this the
    # whole signatures+LSH chain would re-execute per consumer (measured
    # 3-4x the verify cost). Batch-local combine, then a global distinct
    # groupby so cross-band duplicates verify once.
    pairs = (
        candidates.map_batches(
            local_dedup, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["id_a", "id_b"])
        .count()  # native distinct: vectorized sort-shuffle, no per-group fn
        .map_batches(
            lambda t: t.select(["id_a", "id_b"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # coalesce: drops the schema-less empty blocks that sort-based
        # groupbys emit for empty partitions (Arrow's hash join rejects
        # them with 'No match for FieldRef') and shrinks block count for
        # the tiny pair table
        .repartition(num_partitions)
        .materialize()
    )

    # DISTINCT candidate ids: batch-local dedup in the cluster, then a
    # streamed driver union of the per-block distinct columns — only id
    # values ever reach the driver (bounded by #candidate docs, a
    # vanishing corpus fraction by LSH design), never the pair table.
    # A `Dataset.unique` here would add a full groupby shuffle only to
    # produce the very set the driver is about to hold anyway.
    def id_column(t: pa.Table) -> pa.Table:
        both = pa.chunked_array(
            list(t["id_a"].chunks) + list(t["id_b"].chunks), type=id_type
        )
        return pa.table({"cid": both}).group_by("cid").aggregate([])

    need: set = set()
    for blk in pairs.map_batches(
        id_column, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        need.update(blk["cid"].to_pylist())
    if not need:
        return empty_out()
    need_ref = ray.put(need)

    def shingle_rows(batch: pa.Table) -> pa.Table:
        """(id, shingle set) rows for the candidate docs. The set rides as
        a BINARY blob (raw little-endian uint64 array bytes — Arrow's hash
        join rejects list<> payload columns but carries binary fine;
        identical ~8 bytes/shingle volume)."""
        needed = ray.get(need_ref)
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        o_id, o_h = [], []
        for i, t in zip(ids, texts):
            if i in needed:
                o_id.append(i)
                o_h.append(_shingle_hashes(t, shingle_k).tobytes())
        return pa.table(
            {
                "id_a": pa.array(o_id, id_type),
                "hashes_a": pa.array(o_h, pa.binary()),
            }
        )

    def judge_table(t: pa.Table, blobs_a, blobs_b) -> pa.Table:
        """Shared Jaccard kernel for both attach paths."""
        jacc = np.empty(t.num_rows, dtype=np.float64)
        for i, (ha, hb) in enumerate(zip(blobs_a, blobs_b)):
            sa = np.frombuffer(ha or b"", dtype=np.uint64)
            sb = np.frombuffer(hb or b"", dtype=np.uint64)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            jacc[i] = (inter / union) if union else 0.0
        out = pa.table(
            {"id_a": t["id_a"], "id_b": t["id_b"],
             "jaccard": pa.array(jacc, pa.float64())}
        )
        return out.filter(pa.array(jacc >= threshold))

    if len(need) <= broadcast_limit:
        # small side: one pruned docs scan streams the candidate shingle
        # blobs (~8 bytes/shingle × ≤ broadcast_limit docs), the map rides
        # plasma once, and a single task pass judges the pair table — no
        # joins, no extra barriers
        sh_map: dict = {}
        for blk in docs.map_batches(
            shingle_rows, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            sh_map.update(
                zip(blk["id_a"].to_pylist(), blk["hashes_a"].to_pylist())
            )
        sh_ref = ray.put(sh_map)

        def judge_bcast(t: pa.Table) -> pa.Table:
            m = ray.get(sh_ref)  # plasma-cached per node, not per batch
            return judge_table(
                t,
                [m.get(i, b"") for i in t["id_a"].to_pylist()],
                [m.get(i, b"") for i in t["id_b"].to_pylist()],
            )

        return pairs.map_batches(judge_bcast, batch_format="pyarrow")

    # big side: ONE pruned docs scan + shingle pass, materialized
    # (candidate docs only), feeds both attach sides via a rename;
    # pairs gain blobs on id_a then on id_b through the shared bucketed
    # lookup exchange (stages/exchange.py) — no JoinOperators, so the
    # two-live-hash-joins deadlock guard materialize() is unnecessary
    from ..stages.exchange import bucketed_lookup_join

    nb = 1 << max(2, (num_partitions - 1).bit_length())  # next 2^k
    sh_a = docs.map_batches(shingle_rows, batch_format="pyarrow").materialize()
    sh_b = sh_a.map_batches(
        lambda t: t.rename_columns(["id_b", "hashes_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    with_a = bucketed_lookup_join(
        pairs, sh_a, "id_a", "id_a", how="inner", num_buckets=nb
    )
    both = bucketed_lookup_join(
        with_a, sh_b, "id_b", "id_b", how="inner", num_buckets=nb
    )

    def judge(t: pa.Table) -> pa.Table:
        return judge_table(
            t, t["hashes_a"].to_pylist(), t["hashes_b"].to_pylist()
        )

    return both.map_batches(judge, batch_format="pyarrow")


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


# byte-wise popcount table (numpy < 2.0 has no bitwise_count)
_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(arr: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    return _POPCOUNT8[arr.view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(np.int64)


def simhash_dup_pairs(
    sigs: ray.data.Dataset,
    max_hamming: int = 8,
    num_bands: int = 16,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    bucket_cap: int = 2000,
) -> ray.data.Dataset:
    """Distributed SimHash near-dup pair search: banded bit-chunk bucket
    join. The 64-bit signature splits into ``num_bands`` contiguous chunks;
    docs sharing any chunk value land in one bucket (groupby), and pairs
    are verified with an exact vectorized Hamming distance inside the
    bucket.

    EXACT for ``max_hamming < num_bands``: a pair differing in ≤
    ``num_bands - 1`` bits must leave at least one chunk untouched
    (pigeonhole), so it shares a bucket. Signatures are stored as signed
    int64 (bit pattern = unsigned sig XOR the top bit); XOR-based Hamming
    is invariant to that constant flip, and chunk bucketing is only
    relabeled by it, so both work on the stored form directly.

    Hot buckets (a chunk value shared by huge cohorts — e.g. all-zero
    chunks of near-empty docs) are capped with a logged, per-row-reported
    truncation count, same policy as the MinHash LSH stage."""
    import logging

    assert max_hamming < num_bands, (
        f"banded search is only exact for max_hamming < num_bands "
        f"(got {max_hamming} >= {num_bands})"
    )
    assert 64 % num_bands == 0, "num_bands must divide 64"
    chunk_bits = 64 // num_bands
    chunk_mask = np.uint64((1 << chunk_bits) - 1)

    num_shuffle_buckets = 64

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        raw = np.asarray(batch[sig_col].to_pylist(), dtype=np.int64).view(np.uint64)
        o_chunk, o_val, o_id, o_sig, o_b = [], [], [], [], []
        for c in range(num_bands):
            vals = (raw >> np.uint64(c * chunk_bits)) & chunk_mask
            with np.errstate(over="ignore"):
                h = (
                    vals * np.uint64(0x9E3779B97F4A7C15)
                    + np.uint64(c) * np.uint64(0xBF58476D1CE4E5B9)
                )
            o_b.extend(
                (h % np.uint64(num_shuffle_buckets)).astype(np.int32).tolist()
            )
            o_chunk.extend([c] * len(ids))
            o_val.extend(vals.astype(np.int64).tolist())
            o_id.extend(ids)
            o_sig.extend(batch[sig_col].to_pylist())
        return pa.table(
            {
                "bucket": pa.array(o_b, pa.int32()),
                "chunk": pa.array(o_chunk, pa.int32()),
                "chunk_val": pa.array(o_val, pa.int64()),
                id_col: pa.array(o_id, batch[id_col].type),
                sig_col: pa.array(o_sig, pa.int64()),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        """One SHUFFLE bucket (many (chunk, value) cohorts at once —
        round-4 conversion from one Python callback per cohort): an
        Arrow ``group_by`` finds multi-doc cohorts vectorized, singleton
        cohorts (the vast majority) never touch Python, and each ≥2-doc
        cohort pair-generates with the same triu Hamming kernel."""
        id_type = g[id_col].type
        empty = pa.table(
            {"id_a": pa.array([], id_type),
             "id_b": pa.array([], id_type),
             "hamming": pa.array([], pa.int64()),
             "bucket_truncated": pa.array([], pa.int64())}
        )
        if len(g) == 0:
            return empty
        cohorts = g.group_by(["chunk", "chunk_val"]).aggregate(
            [(id_col, "count"), (id_col, "list"), (sig_col, "list")]
        )
        counts = cohorts[f"{id_col}_count"].to_numpy()
        keep_idx = np.flatnonzero(counts >= 2)
        if not len(keep_idx):
            return empty
        chunks_np = cohorts["chunk"].to_numpy()
        vals_np = cohorts["chunk_val"].to_numpy()
        id_lists = cohorts[f"{id_col}_list"].to_pylist()
        sig_lists = cohorts[f"{sig_col}_list"].to_pylist()
        a_, b_, h_, t_ = [], [], [], []
        for i in keep_idx:
            ids = np.asarray(id_lists[i], dtype=object)
            sig = np.asarray(sig_lists[i], dtype=np.int64).view(np.uint64)
            order = np.argsort(ids)
            ids, sig = ids[order], sig[order]
            truncated = max(0, len(ids) - bucket_cap)
            if truncated:
                logging.getLogger(__name__).warning(
                    "SimHash bucket (chunk=%s val=%s) holds %d docs; "
                    "capped at %d — %d docs dropped",
                    int(chunks_np[i]), int(vals_np[i]),
                    len(ids), bucket_cap, truncated,
                )
                ids, sig = ids[:bucket_cap], sig[:bucket_cap]
            iu, ju = np.triu_indices(len(ids), k=1)
            ham = _popcount64(sig[iu] ^ sig[ju])
            ok = ham <= max_hamming
            a_.extend(ids[iu[ok]].tolist())
            b_.extend(ids[ju[ok]].tolist())
            h_.extend(ham[ok].tolist())
            t_.extend([truncated] * int(ok.sum()))
        return pa.table(
            {
                "id_a": pa.array(a_, id_type),
                "id_b": pa.array(b_, id_type),
                "hamming": pa.array(h_, pa.int64()),
                "bucket_truncated": pa.array(t_, pa.int64()),
            }
        )

    exploded = sigs.map_batches(explode, batch_format="pyarrow")
    raw_pairs = exploded.groupby("bucket", num_partitions=8).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    # a close pair shares many chunks → dedup across buckets (hamming is a
    # pure function of the pair, so min == the value)
    out = raw_pairs.groupby(["id_a", "id_b"]).min("hamming")
    return out.map_batches(
        lambda t: t.rename_columns(["id_a", "id_b", "hamming"]),
        batch_format="pyarrow",
    )


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


def embedding_near_dup_pairs_lsh(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: Optional[int] = None,
) -> ray.data.Dataset:
    """Web-scale blocking for ``embedding_near_dup_pairs``: the blocking
    key is a signed-random-projection (SRP) LSH bucket of the embedding —
    ``num_planes`` hyperplanes drawn deterministically from ``seed`` give a
    2^planes-bucket code; vectors sharing a bucket get the exact blocked
    cosine matmul. Approximate by design (a near-dup pair straddling a
    hyperplane is missed; P[same bit] = 1 − θ/π per plane — identical
    directions ALWAYS share a bucket), recall tunable via fewer planes or
    multiple salted tables. Replaces the label/shard blocking column when
    no natural key exists."""
    if dim is None:
        first = ds.take(1)[0]
        dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes))
    planes_ref = ray.put(planes)
    weights = (1 << np.arange(num_planes)).astype(np.int64)

    def bucket(batch: pa.Table) -> pa.Table:
        w = ray.get(planes_ref)
        vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        if len(vecs) == 0:
            return batch.append_column("srp_block", pa.array([], pa.int64()))
        bits = (vecs @ w) > 0
        codes = (bits * weights).sum(axis=1)
        return batch.append_column("srp_block", pa.array(codes, pa.int64()))

    blocked = ds.map_batches(bucket, batch_format="pyarrow")
    return embedding_near_dup_pairs(
        blocked, threshold=threshold, id_col=id_col, vec_col=vec_col,
        block_col="srp_block",
    )


# -- exact n-gram Jaccard all-pairs (verification-side primitive) -------------


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    audit_limit: int = 50_000,
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
    # HARD audit-scale gate: this operator broadcasts every token set and
    # compares all pairs — O(n²). At corpus scale use the LSH path
    # (minhash_lsh_candidates → verify_jaccard_pairs) instead; this guard
    # turns a silent 100-TB footgun into an immediate, explicit error.
    if len(side) > audit_limit:
        raise ValueError(
            f"ngram_jaccard_pairs is an exact all-pairs AUDIT operator "
            f"(corpus of {len(side)} rows > audit_limit={audit_limit}); "
            "use minhash_lsh_candidates + verify_jaccard_pairs at scale"
        )
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


# -- duplicate clusters (connected components over near-dup pairs) ------------


def duplicate_clusters(
    pairs: ray.data.Dataset,
    num_partitions: int = 8,
    max_iters: int = 25,
) -> ray.data.Dataset:
    """Connected components over a near-dup pair table: every doc that
    appears in an edge gets ``cluster_id`` = the minimum (lexicographic)
    doc id reachable from it — the keep-list primitive of a dedup
    pipeline (drop every row whose ``doc_id != cluster_id``).

    Distributed iterative MIN-LABEL PROPAGATION (the standard scalable CC
    formulation — no global union-find state): labels start as self; each
    round hash-joins the (bidirectional) edge list against current labels
    and takes the per-node min over {self} ∪ {neighbor labels}; converges
    in O(component diameter) rounds — LSH near-dup components are
    near-cliques, so 2–4 rounds in practice, hard-capped at
    ``max_iters``. Per round: one hash join + one groupby-min over
    edge-scale data (the pair table, ≪ corpus by LSH design); labels are
    materialized per round (they are the small side).

    Convergence is detected with a cheap distributed checksum (sum of
    stable label hashes), not a driver collect."""
    import polars as pl

    sch = pairs.schema()
    id_type = dict(zip(sch.names, sch.types))["id_a"]

    def both_dirs(t: pa.Table) -> pa.Table:
        src = pa.chunked_array(
            list(t["id_a"].chunks) + list(t["id_b"].chunks), type=id_type
        )
        dst = pa.chunked_array(
            list(t["id_b"].chunks) + list(t["id_a"].chunks), type=id_type
        )
        return pa.table({"src": src, "dst": dst})

    edges = pairs.map_batches(
        both_dirs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        d = t.select(["src"]).group_by("src").aggregate([])
        return pa.table({"node": d["src"], "label": d["src"]})

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node", num_partitions=num_partitions)
        .min("label")
        .map_batches(
            lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
        )
        .repartition(num_partitions)
        .materialize()
    )

    def checksum(ds: ray.data.Dataset) -> int:
        def part(t: pa.Table) -> pa.Table:
            h = pl.from_arrow(t["label"]).hash(seed=11).to_numpy()
            s = np.sum(h, dtype=np.uint64) & np.uint64((1 << 63) - 1)
            return pa.table({"c": pa.array([int(s)], pa.int64())})

        s = ds.map_batches(part, batch_format="pyarrow").sum("c")
        return int(s) if s is not None else 0

    prev = checksum(labels)
    # per-round edges⋈labels co-location as the bucketed-groupby polars
    # join (same exchange swap as pagerank/khop — a JoinOperator pays
    # ~2 s/round fixed aggregator cost); edges tagged by hash(dst) ONCE
    nb = 1 << max(2, (num_partitions - 1).bit_length())  # 2^k buckets
    bmask = nb - 1

    def _jb(t: pa.Table, col: str) -> pa.Array:
        h = pl.from_arrow(t.select([col]))[col].hash(seed=11).to_numpy()
        return pa.array((h & np.uint64(bmask)).astype(np.int32), pa.int32())

    def edge_rows(t: pa.Table) -> pa.Table:
        out = pa.table(
            {"dst": t["dst"], "src": t["src"],
             "label": pa.nulls(len(t), t["src"].type)}
        )
        return out.append_column("jbucket", _jb(out, "dst"))

    edges_b = edges.map_batches(
        edge_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def label_rows(t: pa.Table) -> pa.Table:
        out = pa.table(
            {"dst": t["node"], "src": pa.nulls(len(t), t["node"].type),
             "label": t["label"]}
        )
        return out.append_column("jbucket", _jb(out, "dst"))

    def nbr_join(g: pa.Table) -> pa.Table:
        empty = pa.table({"node": pa.array([], id_type),
                          "label": pa.array([], id_type)})
        if len(g) == 0:
            return empty
        df = pl.from_arrow(g.drop_columns(["jbucket"]))
        e_ = df.filter(pl.col("label").is_null()).select(["dst", "src"])
        lab = df.filter(pl.col("label").is_not_null()).select(
            ["dst", "label"]
        )
        j = (
            e_.join(lab, on="dst", how="inner")
            .group_by("src")
            .agg(pl.col("label").min())
            .to_arrow()
        )
        if j.num_rows == 0:
            return empty
        return pa.table(
            {"node": j["src"].cast(id_type),
             "label": j["label"].cast(id_type)}
        )

    for _ in range(max_iters):
        nbr = (
            edges_b.union(
                labels.map_batches(label_rows, batch_format="pyarrow")
            )
            .groupby("jbucket", num_partitions=max(1, nb // 2))
            .map_groups(nbr_join, batch_format="pyarrow")
        )
        labels = (
            labels.union(nbr)
            .groupby("node", num_partitions=num_partitions)
            .min("label")
            .map_batches(
                lambda t: t.rename_columns(["node", "label"]),
                batch_format="pyarrow",
            )
            .repartition(num_partitions)
            .materialize()
        )
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
