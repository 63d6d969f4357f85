"""Fuzzy surface-form → catalog-entity resolution (edit distance ≤ 1).

The reference's canonicalization is exact-match only
(`genie_base_pl.py:406-410` raises KeyError on a miss; our broadcast/join
paths mark ``no_match``). A production KG pipeline additionally wants the
near-miss tier — OCR slips, inflections, single-typo mentions — resolved
against the catalog WITHOUT an all-pairs scan.

Scalable shape: **deletion-neighborhood blocking** (the SymSpell idea).
For edit distance ≤ 1, two strings must share at least one member of each
other's {self} ∪ {one-char-deletion} variant sets, so:

1. both sides fan out row-locally into (variant, original) rows —
   bounded by string length, no shuffle;
2. ONE hash join on the variant key produces the candidate pairs
   (corpus-scale all-pairs never materializes);
3. candidates dedup and verify with an exact bounded edit-distance check
   (two-pointer O(len) — the deletion-share condition admits false
   positives like "ab"/"ba", which is distance 2).

The verify step walks candidate pairs in Python — same posture as the
LSH Jaccard verify (`functions/dedup.py`): candidates are a vanishing
fraction of the cross product by blocking design, and each check is
O(len). The join is the only exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _variants_table(
    t: pa.Table, surface_col: str, keep_cols: list[str]
) -> pa.Table:
    """Row-local deletion-neighborhood fan-out: for each string s, emit
    (variant, *keep_cols) for s itself and every one-char deletion of s.
    Output size = Σ (len(s) + 1) — bounded, computed before any shuffle."""
    surfaces = t[surface_col].to_pylist()
    keeps = {c: t[c].to_pylist() for c in keep_cols}
    out_v: list[str] = []
    out_idx: list[int] = []
    for i, s in enumerate(surfaces):
        if s is None:
            continue
        out_v.append(s)
        out_idx.append(i)
        for j in range(len(s)):
            out_v.append(s[:j] + s[j + 1 :])
            out_idx.append(i)
    idx = pa.array(out_idx, pa.int64())
    cols = {"variant": pa.array(out_v, pa.string())}
    for c in keep_cols:
        cols[c] = pc.take(pa.array(keeps[c], pa.string()), idx)
    return pa.table(cols)


def edit_distance_le1(a: str, b: str) -> bool:
    """Exact ``levenshtein(a, b) <= 1`` via a two-pointer walk (O(len));
    matches DuckDB's ``levenshtein`` on the ≤1 decision boundary."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # lb == la + 1: b must equal a with one char inserted
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def fuzzy_match(
    probes: ray.data.Dataset,
    catalog: ray.data.Dataset,
    probe_col: str = "surface",
    catalog_surface_col: str = "surface",
    catalog_id_col: str = "ent_id",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """All (probe surface, catalog entity) pairs within edit distance ≤ 1,
    with the exact distance. Output: (surface, ent_id, dist int64).

    Both sides build their deletion neighborhoods row-locally; the single
    hash join on the variant key replaces the |probes|×|catalog| cross
    product; survivors of the exact verify dedup on (surface, ent_id)
    keeping the MIN distance (a pair can meet through several shared
    variants — e.g. at distance 0 through every one)."""
    pv = probes.map_batches(
        lambda t: _variants_table(t, probe_col, [probe_col]).rename_columns(
            ["variant", "surface_p"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cv = catalog.map_batches(
        lambda t: _variants_table(
            t, catalog_surface_col, [catalog_surface_col, catalog_id_col]
        ).rename_columns(["variant", "surface_c", "ent_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = pv.repartition(num_partitions).join(
        cv.repartition(num_partitions),
        "inner",
        num_partitions=num_partitions,
        on=("variant",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def verify(t: pa.Table) -> pa.Table:
        # batch-local candidate dedup first: a pair meets once per shared
        # variant; verify each distinct pair once
        d = (
            t.select(["surface_p", "surface_c", "ent_id"])
            .group_by(["surface_p", "surface_c", "ent_id"])
            .aggregate([])
        )
        ps = d["surface_p"].to_pylist()
        cs = d["surface_c"].to_pylist()
        keep = np.fromiter(
            (edit_distance_le1(a, b) for a, b in zip(ps, cs)),
            dtype=bool,
            count=len(ps),
        )
        d = d.filter(pa.array(keep))
        dist = pa.array(
            np.fromiter(
                (0 if a == b else 1 for a, b in zip(
                    d["surface_p"].to_pylist(), d["surface_c"].to_pylist()
                )),
                dtype=np.int64,
                count=d.num_rows,
            )
        )
        return pa.table(
            {
                "surface": d["surface_p"],
                "ent_id": d["ent_id"],
                "dist": dist,
            }
        )

    out = joined.map_batches(verify, batch_format="pyarrow")
    # cross-block dedup (the same pair can surface in several join blocks
    # via different variants): keep the min dist per (surface, ent_id)
    return (
        out.groupby(["surface", "ent_id"], num_partitions=max(1, num_partitions // 2))
        .min("dist")
        .map_batches(
            lambda t: t.rename_columns(["surface", "ent_id", "dist"]),
            batch_format="pyarrow",
        )
    )
