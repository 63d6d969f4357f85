"""Distributed as-of and range (interval) joins — operators Ray Data
lacks natively.

``asof_join``: each LEFT row gets the latest RIGHT row of the same key
whose timestamp is ≤ the left row's (DuckDB ``ASOF LEFT JOIN``
semantics, equal timestamps match) — the feature-store enrichment
primitive. ``range_join``: one row per (left row, interval) pair with
``start ≤ ts ≤ end``, one-to-many — the attribution-window primitive.

Composition (no raw actors needed): align the two sides to one schema
with a side tag → ``union`` → ONE ``groupby(key)`` shuffle → per-group
vectorized merge (sort the right side once, one ``np.searchsorted`` for
all left rows, one ``pc.take`` per attached column — no Python loop over
rows).

Partitioning assumption (documented contract, same as sessionization's):
one key's rows fit in a single group. Keys here are entities (users,
instruments); a key whose history exceeds worker memory needs a
time-bucketed variant (join within day buckets, carrying each bucket's
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
        return pa.table(cols)

    def align_right(t: pa.Table) -> pa.Table:
        cols = {}
        for n in left_names:
            cols[n] = t[n] if n == key_col else pa.nulls(t.num_rows, left_types[n])
        cols["__start"] = t[start_col]
        cols["__end"] = t[end_col]
        for c in right_cols:
            cols[f"__r_{c}"] = t[c]
        cols["__side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    def merge(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        l = g.filter(pa.array(side == 1))
        r = g.filter(pa.array(side == 0))
        if l.num_rows == 0 or r.num_rows == 0:
            return pa.table(
                {f.name: pa.nulls(0, f.type) for f in out_schema()},
                schema=out_schema(),
            )
        lts = l[ts_col].to_numpy(zero_copy_only=False)
        rs_ = r["__start"].to_numpy(zero_copy_only=False)
        re_ = r["__end"].to_numpy(zero_copy_only=False)
        # chunk left rows so the boolean block stays a few MB
        step = max(1, (1 << 22) // max(1, len(rs_)))
        li_parts, rj_parts = [], []
        for lo in range(0, len(lts), step):
            chunk = lts[lo : lo + step]
            li, rj = np.nonzero(
                (chunk[:, None] >= rs_[None, :]) & (chunk[:, None] <= re_[None, :])
            )
            li_parts.append(li + lo)
            rj_parts.append(rj)
        li = np.concatenate(li_parts)
        rj = np.concatenate(rj_parts)
        out = {n: pc.take(l[n].combine_chunks(), pa.array(li)) for n in left_names}
        for c in right_cols:
            out[f"{c}{suffix}"] = pc.take(r[f"__r_{c}"].combine_chunks(), pa.array(rj))
        return pa.table(out, schema=out_schema())

    both = left.map_batches(align_left, batch_format="pyarrow").union(
        right.map_batches(align_right, batch_format="pyarrow")
    )
    return both.groupby(key_col).map_groups(
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
        return pa.table(cols)

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
        return pa.table(cols)

    def merge(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        l = g.filter(pa.array(side == 1)).select(
            left_names + [f"__r_{c}" for c in right_cols]
        )
        r = g.filter(pa.array(side == 0))
        out = {n: l[n] for n in left_names}
        if r.num_rows == 0:
            for c in right_cols:
                out[f"{c}{suffix}"] = pa.nulls(l.num_rows, right_types[c])
            return pa.table(out, schema=_out_schema())
        rts = r[ts_col].to_numpy(zero_copy_only=False)
        order = np.argsort(rts, kind="stable")
        rts_sorted = rts[order]
        lts = l[ts_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(rts_sorted, lts, side="right") - 1
        valid = idx >= 0
        indices = pa.array(order[np.maximum(idx, 0)], mask=~valid)
        for c in right_cols:
            out[f"{c}{suffix}"] = pc.take(r[f"__r_{c}"].combine_chunks(), indices)
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
    return both.groupby(key_col).map_groups(
        merge, batch_format="pyarrow"
    ).select_columns(out_names)
