"""Distributed as-of and range (interval) joins — operators Ray Data
lacks natively.

``asof_join``: each LEFT row gets the latest RIGHT row of the same key
whose timestamp is ≤ the left row's (DuckDB ``ASOF LEFT JOIN``
semantics, equal timestamps match) — the feature-store enrichment
primitive. ``range_join``: one row per (left row, interval) pair with
``start ≤ ts ≤ end``, one-to-many — the attribution-window primitive.

Composition (no raw actors needed): align the two sides to one schema
with a side tag → ``union`` → ONE ``groupby(key-hash BUCKET)`` shuffle →
per-BUCKET vectorized merge handling every key in the bucket at once
(polars ``join_asof(by=key)`` / key join + interval filter — no per-key
Python callback; round-4 conversion from the per-key ``groupby(key)``
shape, the same fix as session_windows).

Partitioning assumption (documented contract, same as sessionization's):
one BUCKET of keys fits in a single group — raise the bucket count with
key cardinality. A single key whose history exceeds worker memory needs
a time-bucketed variant (join within day buckets, carrying each bucket's
last right-row forward), which composes from the same merge kernel.

The union emits a benign "different schema" RefBundle warning on the
terminal empty bundle (see BASELINE.md round-2 notes); real blocks all
carry the aligned schema.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_NUM_BUCKETS = 32  # 2^k key-hash buckets per exchange


def _key_bucket(t: pa.Table, key_col: str) -> pa.Array:
    """Stable key-hash bucket (polars value hash — process-stable)."""
    import polars as pl

    h = pl.from_arrow(t.select([key_col]))[key_col].hash(seed=11).to_numpy()
    return pa.array(
        (h & np.uint64(_NUM_BUCKETS - 1)).astype(np.int32), pa.int32()
    )


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    right_cols: Sequence[str],
    suffix: str = "_w",
) -> ray.data.Dataset:
    """Interval (range) join: emit one row per (left row, right interval)
    pair of the same key with ``start ≤ ts ≤ end`` (inclusive, SQL
    ``BETWEEN``), one-to-MANY — overlapping intervals each match. Inner
    join: unmatched left rows are dropped.

    Same distribution as :func:`asof_join`: aligned union → one
    ``groupby(key)`` shuffle → per-group vectorized pair generation.
    Within a group the candidate mask is a chunked numpy broadcast
    (O(n_left · n_right) bools per key, evaluated a few MB at a time) —
    the honest cost of a general interval join; keys whose event ×
    interval product is huge should pre-bucket by time (compose this
    kernel inside a (key, time-bucket) groupby with intervals replicated
    into each bucket they overlap)."""
    ls, rs = left.schema(), right.schema()
    left_names = list(ls.names)
    left_types = dict(zip(ls.names, ls.types))
    rtypes = dict(zip(rs.names, rs.types))
    out_names = left_names + [f"{c}{suffix}" for c in right_cols]
    right_types = {c: rtypes[c] for c in right_cols}

    def out_schema() -> pa.Schema:
        return pa.schema(
            [pa.field(n, left_types[n]) for n in left_names]
            + [pa.field(f"{c}{suffix}", right_types[c]) for c in right_cols]
        )

    def align_left(t: pa.Table) -> pa.Table:
        cols = {n: t[n] for n in left_names}
        cols["__start"] = pa.nulls(t.num_rows, rtypes[start_col])
        cols["__end"] = pa.nulls(t.num_rows, rtypes[end_col])
        for c in right_cols:
            cols[f"__r_{c}"] = pa.nulls(t.num_rows, right_types[c])
        cols["__side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        out = pa.table(cols)
        return out.append_column("__bucket", _key_bucket(t, key_col))

    def align_right(t: pa.Table) -> pa.Table:
        cols = {}
        for n in left_names:
            cols[n] = t[n] if n == key_col else pa.nulls(t.num_rows, left_types[n])
        cols["__start"] = t[start_col]
        cols["__end"] = t[end_col]
        for c in right_cols:
            cols[f"__r_{c}"] = t[c]
        cols["__side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        out = pa.table(cols)
        return out.append_column("__bucket", _key_bucket(t, key_col))

    def merge(g: pa.Table) -> pa.Table:
        """One KEY-HASH BUCKET (all its keys at once): polars inner join
        on key then the interval filter — vectorized across every key in
        the bucket, no per-key Python callback (the round-4 bucket
        conversion; the pre-filter per-key product is the honest general
        interval-join cost — huge event×interval keys should pre-bucket
        by time as documented above)."""
        import polars as pl

        empty = pa.table(
            {f.name: pa.nulls(0, f.type) for f in out_schema()},
            schema=out_schema(),
        )
        if len(g) == 0:
            return empty
        df = pl.from_arrow(g.drop_columns(["__bucket"]))
        l = df.filter(pl.col("__side") == 1).select(left_names)
        r = df.filter(pl.col("__side") == 0).select(
            [key_col, "__start", "__end"] + [f"__r_{c}" for c in right_cols]
        )
        if len(l) == 0 or len(r) == 0:
            return empty
        j = (
            l.join(r, on=key_col, how="inner")
            .filter(
                (pl.col(ts_col) >= pl.col("__start"))
                & (pl.col(ts_col) <= pl.col("__end"))
            )
            .to_arrow()
        )
        if j.num_rows == 0:
            return empty
        out = {n: j[n].cast(left_types[n]) for n in left_names}
        for c in right_cols:
            out[f"{c}{suffix}"] = j[f"__r_{c}"].cast(right_types[c])
        return pa.table(out, schema=out_schema())

    both = left.map_batches(align_left, batch_format="pyarrow").union(
        right.map_batches(align_right, batch_format="pyarrow")
    )
    return both.groupby("__bucket").map_groups(
        merge, batch_format="pyarrow"
    ).select_columns(out_names)


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    right_cols: Sequence[str],
    suffix: str = "_r",
) -> ray.data.Dataset:
    """Left as-of join: every left row, plus ``<col><suffix>`` columns
    holding the right row with the greatest ts ≤ left ts for the same
    key (nulls when no such row). Left columns pass through unchanged."""
    ls, rs = left.schema(), right.schema()  # ray Schema: .names/.types
    left_names = list(ls.names)
    left_types = dict(zip(ls.names, ls.types))
    rtypes = dict(zip(rs.names, rs.types))
    out_names = left_names + [f"{c}{suffix}" for c in right_cols]
    right_types = {c: rtypes[c] for c in right_cols}

    def align_left(t: pa.Table) -> pa.Table:
        cols = {n: t[n] for n in left_names}
        for c in right_cols:
            cols[f"__r_{c}"] = pa.nulls(t.num_rows, right_types[c])
        cols["__side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        out = pa.table(cols)
        return out.append_column("__bucket", _key_bucket(t, key_col))

    def align_right(t: pa.Table) -> pa.Table:
        cols = {}
        for n in left_names:
            if n in (key_col, ts_col):
                cols[n] = t[n]
            else:
                cols[n] = pa.nulls(t.num_rows, left_types[n])
        for c in right_cols:
            cols[f"__r_{c}"] = t[c]
        cols["__side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        out = pa.table(cols)
        return out.append_column("__bucket", _key_bucket(t, key_col))

    def merge(g: pa.Table) -> pa.Table:
        """One KEY-HASH BUCKET: polars ``join_asof(by=key)`` handles all
        the bucket's keys in one vectorized pass (backward strategy =
        greatest right ts ≤ left ts, equal timestamps match — the same
        semantics the old per-key searchsorted kernel implemented)."""
        import polars as pl

        empty = pa.table(
            {f.name: pa.nulls(0, f.type) for f in _out_schema()},
            schema=_out_schema(),
        )
        if len(g) == 0:
            return empty
        df = pl.from_arrow(g.drop_columns(["__bucket"]))
        l = df.filter(pl.col("__side") == 1).select(left_names)
        r = df.filter(pl.col("__side") == 0).select(
            [key_col, ts_col] + [f"__r_{c}" for c in right_cols]
        )
        if len(l) == 0:
            return empty
        if len(r) == 0:
            out = {n: l.to_arrow()[n].cast(left_types[n]) for n in left_names}
            for c in right_cols:
                out[f"{c}{suffix}"] = pa.nulls(len(l), right_types[c])
            return pa.table(out, schema=_out_schema())
        # Right-side sort must be RUN-deterministic: when a key has
        # several rows at the same timestamp the last sorted row wins,
        # and polars' default sort is unstable while the group's input
        # row order depends on block layout. Sorting by ts + every
        # payload column makes the winner a pure function of content
        # (the repo contract is bit-identical reruns).
        j = (
            l.sort(ts_col, maintain_order=True)
            .join_asof(
                r.sort(r.columns), on=ts_col, by=key_col,
                strategy="backward",
            )
            .to_arrow()
        )
        out = {n: j[n].cast(left_types[n]) for n in left_names}
        for c in right_cols:
            out[f"{c}{suffix}"] = j[f"__r_{c}"].cast(right_types[c])
        return pa.table(out, schema=_out_schema())

    def _out_schema() -> pa.Schema:
        fields = [pa.field(n, left_types[n]) for n in left_names]
        fields += [
            pa.field(f"{c}{suffix}", right_types[c]) for c in right_cols
        ]
        return pa.schema(fields)

    both = left.map_batches(align_left, batch_format="pyarrow").union(
        right.map_batches(align_right, batch_format="pyarrow")
    )
    return both.groupby("__bucket").map_groups(
        merge, batch_format="pyarrow"
    ).select_columns(out_names)
