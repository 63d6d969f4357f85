"""Bloom-filter semi join: the standard shuffle-volume cutter for
key-membership filters at corpus scale.

Problem shape: keep the fact rows whose key appears in a second dataset
(benchmark-id decontamination, orders-with-status filters, keep-list
application after dedup). The naive plan shuffles the ENTIRE fact table
through a hash join; the broadcast plan needs the full key set in every
worker. The Bloom plan sits between them:

1. **build** — each key batch folds its keys into an m-bit bitmap
   partial (double hashing, k probes per key, splitmix64 mixes — the
   engine-wide stable hash family); partials are m/8-byte blobs, merged
   with one elementwise OR (`repartition(1)`, associative/commutative —
   tree-reduces for free on a real cluster). The merged filter
   broadcasts once via ``ray.put`` regardless of key count: 2^20 bits =
   128 KB covers ~10^5 keys at ~1% false-positive rate with k=4; size
   ``m_bits`` ∝ keys.
2. **prefilter** — a stateless cached-task map probes every fact batch
   against the broadcast bitmap (vectorized gather + bit test). Only
   true members AND ~fp-rate false positives survive — the hash join
   that follows shuffles that slice, not the fact table.
3. **verify** — a native inner hash join against the (distinct) key
   table removes the false positives, so the result is EXACT: equal to
   ``WHERE key IN (SELECT key FROM keys)`` and DuckDB-oracle-checkable.

The prefilter is where the 100-TB win lives: with 1% selectivity the
join exchange moves ~1% of the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.sampling import splitmix64

_SALT = np.uint64(0x9E3779B97F4A7C15)

# per-process cache of the deserialized bitmap (one filter live per query)
_BLOOM_CACHE: dict = {}


def _probe_indices(vals: np.ndarray, m_bits: int, k_hashes: int):
    """k probe positions per value via double hashing (h1 + i·h2 mod m),
    h2 forced odd so the stride cycles the full table."""
    x = vals.astype(np.uint64)
    h1 = splitmix64(x)
    h2 = splitmix64(x ^ _SALT) | np.uint64(1)
    m = np.uint64(m_bits)
    return [
        ((h1 + np.uint64(i) * h2) % m).astype(np.int64)
        for i in range(k_hashes)
    ]


def build_bloom(
    keys: ray.data.Dataset,
    key_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
):
    """Distributed Bloom build → ``ray.put`` ObjectRef of the bitmap.
    Per-batch OR partials (m/8-byte blobs), one tiny merge task."""
    nbytes = m_bits // 8

    def local_bitmap(t: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, dtype=np.uint8)
        vals = t[key_col].to_numpy(zero_copy_only=False)
        for idx in _probe_indices(vals, m_bits, k_hashes):
            np.bitwise_or.at(bm, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    def merge(t: pa.Table) -> pa.Table:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for blob in t["bm"].to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint8)
        return pa.table({"bm": pa.array([acc.tobytes()], pa.binary())})

    merged = (
        keys.map_batches(local_bitmap, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    return ray.put(np.frombuffer(merged[0]["bm"], dtype=np.uint8))


def bloom_semi_join(
    facts: ray.data.Dataset,
    keys: ray.data.Dataset,
    fact_key_col: str,
    key_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    num_partitions: int = 16,
    keys_unique: bool = True,
) -> ray.data.Dataset:
    """EXACT semi join (facts rows whose key ∈ keys) with a Bloom
    prefilter cutting the join exchange to members + ~fp-rate false
    positives. ``keys_unique`` is retained for API compatibility but
    no longer matters: the verify step is a MEMBERSHIP semi join, which
    cannot multiply fact rows however duplicated the key side is (the
    old JoinOperator verify needed the distinct pass)."""
    del keys_unique  # semi-join verify is duplicate-safe by construction
    keys = keys.map_batches(
        lambda t: t.select([key_col]), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    bloom_ref = build_bloom(keys, key_col, m_bits, k_hashes)

    def prefilter(t: pa.Table) -> pa.Table:
        ck = bloom_ref.hex()
        bm = _BLOOM_CACHE.get(ck)
        if bm is None:
            _BLOOM_CACHE.clear()
            bm = _BLOOM_CACHE[ck] = ray.get(bloom_ref)
        vals = t[fact_key_col].to_numpy(zero_copy_only=False)
        member = np.ones(len(vals), dtype=bool)
        for idx in _probe_indices(vals, m_bits, k_hashes):
            member &= (bm[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1 == 1
        return t.filter(pa.array(member))

    survivors = facts.map_batches(
        prefilter, batch_format="pyarrow", zero_copy_batch=True
    )
    # hash-shuffle cost tracks block count — coalesce the pruned side
    survivors = survivors.repartition(max(2, num_partitions // 2))
    # verify: bucketed membership semi join (stages/exchange.py) — the
    # JoinOperator at this shape paid ~2 s of fixed aggregator cost and
    # a duplicate keys read; semi filtering also drops the
    # keys_unique distinct requirement (a semi join can't multiply rows)
    fact_cols = [c for c in facts.schema().names]
    from .exchange import bucketed_membership_join

    nb = 1 << max(1, (num_partitions - 1).bit_length())  # next 2^k
    return bucketed_membership_join(
        survivors, keys, fact_key_col, key_col, how="semi",
        num_buckets=nb,
    ).map_batches(lambda t: t.select(fact_cols), batch_format="pyarrow")
