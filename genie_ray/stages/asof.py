"""Distributed as-of join — an operator Ray Data lacks natively.

For each LEFT row, attach the latest RIGHT row of the same key whose
timestamp is ≤ the left row's (DuckDB ``ASOF LEFT JOIN`` semantics,
equal timestamps match). The classic feature-store / event-enrichment
primitive: "each click gets the most recent prior purchase".

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
