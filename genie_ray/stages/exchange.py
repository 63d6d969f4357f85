"""Bucketed-groupby membership joins (semi / anti) on one key column.

The repo's measured-fast alternative to a JoinOperator for the
key-membership shape (keep / drop the fact rows whose key appears in a
key set): both sides are tagged with a polars-row-hash bucket of the key
value, union, ONE bounded groupby, and a vectorized polars ``semi`` /
``anti`` join per bucket. The key side contributes only its key column;
the fact side's full rows cross the exchange once. A JoinOperator at
this shape pays ~2 s of per-partition fixed aggregator cost at sf0.1
scale (bench.py graph sizing note) and ships both sides through hash
shuffles anyway.

Exactness: same key value → same bucket on both sides, so per-bucket
membership is global membership. Duplicate keys on the key side cannot
multiply fact rows (semi/anti are filters, not products) — no
distinct pass needed.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import ray.data


def bucketed_membership_join(
    facts: ray.data.Dataset,
    keys: ray.data.Dataset,
    fact_key_col: str,
    key_col: str,
    how: str = "semi",  # "semi" (keep members) | "anti" (keep misses)
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Rows of ``facts`` whose ``fact_key_col`` is (semi) / is not
    (anti) present in ``keys[key_col]``. Output schema == fact schema."""
    import polars as pl

    assert how in ("semi", "anti")
    mask = num_buckets - 1  # num_buckets must be 2^k
    schema = facts.schema()
    all_types = dict(zip(schema.names, schema.types))
    data_cols: List[str] = [c for c in schema.names if c != fact_key_col]
    key_type = all_types[fact_key_col]

    def _bucket(t: pa.Table, col: str) -> pa.Array:
        h = pl.from_arrow(t.select([col]))[col].hash(seed=11).to_numpy()
        return pa.array((h & np.uint64(mask)).astype(np.int32), pa.int32())

    def fact_rows(t: pa.Table) -> pa.Table:
        out = t.select([fact_key_col] + data_cols)
        out = out.append_column("bucket", _bucket(t, fact_key_col))
        return out.append_column(
            "_is_key", pa.array(np.zeros(len(t), np.int8))
        )

    def key_rows(t: pa.Table) -> pa.Table:
        cols = {fact_key_col: t[key_col].cast(key_type)}
        for c in data_cols:
            cols[c] = pa.nulls(len(t), all_types[c])
        out = pa.table(cols)
        out = out.append_column("bucket", _bucket(out, fact_key_col))
        return out.append_column(
            "_is_key", pa.array(np.ones(len(t), np.int8))
        )

    _empty = pa.table(
        {fact_key_col: pa.array([], key_type),
         **{c: pa.array([], all_types[c]) for c in data_cols}}
    )

    def member(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _empty
        df = pl.from_arrow(g.drop_columns(["bucket"]))
        f = df.filter(pl.col("_is_key") == 0).drop("_is_key")
        k = df.filter(pl.col("_is_key") == 1).select(fact_key_col)
        out = f.join(k, on=fact_key_col, how=how).to_arrow()
        if out.num_rows == 0:
            return _empty
        return pa.table(
            {fact_key_col: out[fact_key_col].cast(key_type),
             **{c: out[c].cast(all_types[c]) for c in data_cols}}
        )

    keys_proj = keys.map_batches(
        key_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        facts.map_batches(
            fact_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(keys_proj)
        .groupby("bucket", num_partitions=max(1, num_buckets // 2))
        .map_groups(member, batch_format="pyarrow")
    )
