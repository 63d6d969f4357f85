"""Deterministic hash-based sampling for training-data curation.

Large-scale pipelines resample their corpus constantly — domain mixture
reweighting (keep p_source of each source), train/val/test assignment,
decontamination holdouts. All of it must be (a) a pure streaming filter
with NO shuffle, (b) deterministic and partition-invariant (the same doc
gets the same verdict on every run, cluster size, and block layout), and
(c) independent per row so a 100-TB scan parallelizes trivially. The
standard construction is a strong integer mixer over the stable row id:

    keep(doc)  ⇔  splitmix64(doc_id) mod M  <  rate · M

``splitmix64`` (Steele et al., "Fast splittable pseudorandom number
generators", OOPSLA 2014 — the JDK SplittableRandom finalizer) is
implemented twice, bit-for-bit identically: once over numpy uint64 (the
engine path) and once as a DuckDB SQL fragment (the oracle path), with
the 64×64→64 multiply expressed via 32-bit word splitting because INT128
overflows on full 64-bit products. Parity is asserted in tests.

Operators:

* ``weighted_sample`` — per-key keep rates (domain mixture): one
  broadcast dict probe + one vectorized hash per batch; pure filter.
* ``assign_splits`` — stratum assignment (train/val/test) by cumulative
  integer thresholds; adds a column, drops nothing.

Both ride ``map_batches(batch_format="pyarrow")`` with no stage state
beyond the tiny rate table, so they fuse with the read.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wrapping arithmetic)."""
    z = x.astype(np.uint64) + _GAMMA
    z = (z ^ (z >> np.uint64(30))) * _M1
    z = (z ^ (z >> np.uint64(27))) * _M2
    return z ^ (z >> np.uint64(31))


def _mulmod64_sql(a_expr: str, b: int) -> str:
    """SQL for (a · b) mod 2^64 with constant b, via 32-bit word splits —
    every partial product fits HUGEINT (a_expr must be a HUGEINT in
    [0, 2^64))."""
    lo, hi = b & 0xFFFFFFFF, b >> 32
    return (
        f"((({a_expr}) % 4294967296) * {lo} + "
        f"(((({a_expr}) % 4294967296) * {hi} + "
        f"(({a_expr}) // 4294967296) * {lo}) % 4294967296) * 4294967296) "
        f"% 18446744073709551616"
    )


def splitmix64_sql(select_cols: str, from_sql: str, id_expr: str) -> str:
    """A parenthesized subquery computing ``h = splitmix64(id_expr)`` as
    UBIGINT alongside ``select_cols``, bit-identical to :func:`splitmix64`.
    ``from_sql`` is the source relation (table name or subquery)."""
    s1 = f"SELECT {select_cols}, ((({id_expr})::HUGEINT + 11400714819323198485) % 18446744073709551616)::UBIGINT AS z FROM {from_sql}"
    s2 = f"SELECT {select_cols}, ({_mulmod64_sql('xor(z, z >> 30)::HUGEINT', int(_M1))})::UBIGINT AS z FROM ({s1})"
    s3 = f"SELECT {select_cols}, ({_mulmod64_sql('xor(z, z >> 27)::HUGEINT', int(_M2))})::UBIGINT AS z FROM ({s2})"
    return f"(SELECT {select_cols}, xor(z, z >> 31) AS h FROM ({s3}))"


def weighted_sample(
    ds: ray.data.Dataset,
    rates: Dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    mod: int = 1 << 20,
) -> ray.data.Dataset:
    """Keep each row with probability ``rates[key]``, deterministically by
    row id: keep ⇔ splitmix64(id) mod `mod` < round(rate · mod). Rows
    whose key has no rate are dropped. Pure per-batch filter — the rate
    table is a handful of entries shipped in the task closure, the hash
    is one vectorized pass, and nothing shuffles."""
    keys = pa.array(list(rates), pa.string())
    thrs = np.array([round(r * mod) for r in rates.values()], dtype=np.uint64)

    def keep(t: pa.Table) -> pa.Table:
        h = splitmix64(t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64))
        idx = pc.index_in(t[key_col], value_set=keys)
        thr = np.where(
            idx.is_valid().to_numpy(zero_copy_only=False),
            thrs[np.minimum(idx.fill_null(0).to_numpy(zero_copy_only=False), len(thrs) - 1)],
            np.uint64(0),
        )
        return t.filter(pa.array(h % np.uint64(mod) < thr))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def assign_splits(
    ds: ray.data.Dataset,
    fractions: Sequence[Tuple[str, float]] = (
        ("train", 0.90),
        ("val", 0.05),
        ("test", 0.05),
    ),
    id_col: str = "doc_id",
    mod: int = 10_000,
) -> ray.data.Dataset:
    """Assign every row a split label by cumulative hash thresholds:
    h = splitmix64(id) mod `mod`; the i-th split owns
    [cum_i, cum_{i+1}). Deterministic, partition-invariant, no shuffle;
    fractions must sum to 1 (thresholds are exact integers)."""
    names = [n for n, _ in fractions]
    cum = np.cumsum([round(f * mod) for _, f in fractions]).astype(np.uint64)
    if int(cum[-1]) != mod:
        raise ValueError(f"fractions sum to {int(cum[-1])}/{mod}, expected {mod}")
    name_arr = pa.array(names, pa.string())

    def label(t: pa.Table) -> pa.Table:
        h = splitmix64(t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64))
        idx = np.searchsorted(cum, h % np.uint64(mod), side="right")
        return t.append_column("split", pc.take(name_arr, pa.array(idx, pa.int64())))

    return ds.map_batches(label, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds: ray.data.Dataset,
    k: int = 20,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Fixed-quota uniform sample: the k rows per group with the LARGEST
    ``splitmix64(id)`` — hash order is uniform and the finalizer is a
    bijection on uint64, so unique ids give a collision-free, seedless,
    partition-invariant ranking (the per-group analogue of
    ``weighted_sample``'s Bernoulli keep).

    Scale shape: delegates to ``grouped_top_k`` — each batch forwards at
    most k rows per group it contains, so the one ``groupby(group)``
    shuffle moves O(k · groups · blocks) rows, never the corpus. Output
    is (group, id, rank), rank 1-based by hash DESC, ties by id ASC
    (unreachable for unique ids)."""
    from ..pipelines.relational import grouped_top_k

    def add_h(t: pa.Table) -> pa.Table:
        h = splitmix64(t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64))
        return t.append_column("h", pa.array(h, pa.uint64()))

    with_h = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)
    picked = grouped_top_k(with_h, k=k, group_col=group_col,
                           order_col="h", id_col=id_col)
    return picked.map_batches(
        lambda t: t.drop_columns(["h"]), batch_format="pyarrow"
    )
