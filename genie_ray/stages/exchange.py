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


def bucketed_lookup_join(
    facts: ray.data.Dataset,
    lookup: ray.data.Dataset,
    fact_key_col: str,
    key_col: str,
    how: str = "inner",  # "inner" | "left"
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Attach ``lookup``'s payload columns to ``facts`` rows by key —
    the bucketed-groupby alternative to a JoinOperator for the LOOKUP
    shape (each fact row gains the ≤1 matching lookup row's columns;
    callers must guarantee key uniqueness on the lookup side, or accept
    row multiplication exactly as a SQL join would).

    Output schema: fact columns (fact order) + lookup payload columns
    (lookup order, ``key_col`` excluded). ``how="left"`` keeps
    unmatched fact rows with null payloads. Unlike two live
    JoinOperators, chained bucketed exchanges cannot deadlock on small
    nodes (sort-based groupbys hold no aggregator pools) — no
    ``materialize()`` barriers needed between chained lookups."""
    import polars as pl

    assert how in ("inner", "left")
    mask = num_buckets - 1  # num_buckets must be 2^k
    f_schema = facts.schema()
    f_types = dict(zip(f_schema.names, f_schema.types))
    l_schema = lookup.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    payload_cols: List[str] = [c for c in l_schema.names if c != key_col]
    overlap = set(f_schema.names) & set(payload_cols)
    assert not overlap, f"column collision: {sorted(overlap)}"
    key_type = f_types[fact_key_col]
    out_cols = list(f_schema.names) + payload_cols
    out_types = {**f_types, **{c: l_types[c] for c in payload_cols}}

    def _bucket(t: pa.Table, col: str) -> pa.Array:
        h = pl.from_arrow(t.select([col]))[col].hash(seed=11).to_numpy()
        return pa.array((h & np.uint64(mask)).astype(np.int32), pa.int32())

    def fact_rows(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in f_schema.names}
        for c in payload_cols:
            cols[c] = pa.nulls(len(t), l_types[c])
        out = pa.table(cols)
        out = out.append_column("bucket", _bucket(t, fact_key_col))
        return out.append_column(
            "_side", pa.array(np.zeros(len(t), np.int8))
        )

    def lookup_rows(t: pa.Table) -> pa.Table:
        cols = {}
        for c in f_schema.names:
            if c == fact_key_col:
                cols[c] = t[key_col].cast(key_type)
            else:
                cols[c] = pa.nulls(len(t), f_types[c])
        for c in payload_cols:
            cols[c] = t[c]
        out = pa.table(cols)
        out = out.append_column("bucket", _bucket(out, fact_key_col))
        return out.append_column(
            "_side", pa.array(np.ones(len(t), np.int8))
        )

    _empty = pa.table({c: pa.array([], out_types[c]) for c in out_cols})

    def attach(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _empty
        df = pl.from_arrow(g.drop_columns(["bucket"]))
        f = df.filter(pl.col("_side") == 0).select(list(f_schema.names))
        lk = df.filter(pl.col("_side") == 1).select(
            [fact_key_col] + payload_cols
        )
        out = f.join(lk, on=fact_key_col, how=how).to_arrow()
        if out.num_rows == 0:
            return _empty
        return pa.table(
            {c: out[c].cast(out_types[c]) for c in out_cols}
        )

    return (
        facts.map_batches(
            fact_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(
            lookup.map_batches(
                lookup_rows, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("bucket", num_partitions=max(1, num_buckets // 2))
        .map_groups(attach, batch_format="pyarrow")
    )
