"""Global triple dedup / support aggregation — the graph's wide step.

The reference never materializes a global graph; its set semantics
(`triplet_set_f1.py:15-17`) imply exact triple dedup (SURVEY.md §2.7 D5).
Here it is the two-phase aggregate the Ray guide prescribes:

1. **partial** (``map_batches``, no shuffle): within each batch, group by
   ``(subj_id, pred_id, obj_id)``, emitting one row per distinct triple
   with a partial ``support`` count and a capped, sorted sample of
   supporting ``doc_ids`` — this collapses the heavy per-document
   duplication BEFORE the exchange, so the all-to-all shuffle moves one
   row per (batch × distinct triple), not one per occurrence;
2. **final** (``groupby(bucket).map_groups``): hash-bucket on the triple
   key, merge partials per triple, cap the doc-id sample at
   ``max_doc_ids`` (unbounded lists for hot triples would reintroduce
   skew), sort lexicographically, and write each bucket atomically with a
   lineage manifest.

The bucket count is the graph's output partitioning; hot-key skew is
bounded because after partial aggregation a triple contributes at most one
row per upstream batch.
"""

from __future__ import annotations

from typing import Dict, List

import pyarrow as pa

TRIPLE_COLS = ["subj_id", "pred_id", "obj_id"]


def _hash_bucket(key: str, num_buckets: int) -> int:
    # deterministic across processes (no PYTHONHASHSEED dependence)
    import hashlib

    return int.from_bytes(hashlib.sha1(key.encode()).digest()[:4], "big") % num_buckets


def partial_triple_agg(batch: pa.Table, num_buckets: int, max_doc_ids: int) -> pa.Table:
    """Batch-local combine: (bucket, triple, support, doc_ids-sample)."""
    agg: Dict[tuple, List] = {}
    subj = batch["subj_id"].to_pylist()
    pred = batch["pred_id"].to_pylist()
    obj = batch["obj_id"].to_pylist()
    docs = batch["doc_id"].to_pylist()
    for s, r, o, d in zip(subj, pred, obj, docs):
        if s is None or r is None or o is None:
            continue
        k = (s, r, o)
        got = agg.get(k)
        if got is None:
            agg[k] = [1, {d}]
        else:
            got[0] += 1
            got[1].add(d)  # batch-bounded; capped deterministically below
    b_s, b_r, b_o, b_n, b_d, b_b = [], [], [], [], [], []
    for (s, r, o), (n, ds) in agg.items():
        b_s.append(s)
        b_r.append(r)
        b_o.append(o)
        b_n.append(n)
        b_d.append(sorted(ds)[:max_doc_ids])
        b_b.append(_hash_bucket(f"{s}|{r}|{o}", num_buckets))
    return pa.table(
        {
            "bucket": pa.array(b_b, pa.int32()),
            "subj_id": pa.array(b_s, pa.string()),
            "pred_id": pa.array(b_r, pa.string()),
            "obj_id": pa.array(b_o, pa.string()),
            "support": pa.array(b_n, pa.int64()),
            "doc_ids": pa.array(b_d, pa.list_(pa.string())),
        }
    )


def merge_triple_partials(group: pa.Table, max_doc_ids: int) -> pa.Table:
    """Per-bucket final merge: sum supports, union+cap doc-id samples,
    lexicographic sort (deterministic, resumable layout)."""
    agg: Dict[tuple, List] = {}
    subj = group["subj_id"].to_pylist()
    pred = group["pred_id"].to_pylist()
    obj = group["obj_id"].to_pylist()
    sup = group["support"].to_pylist()
    docs = group["doc_ids"].to_pylist()
    for s, r, o, n, ds in zip(subj, pred, obj, sup, docs):
        k = (s, r, o)
        got = agg.get(k)
        if got is None:
            agg[k] = [n, set(ds)]
        else:
            got[0] += n
            # unconditional union: a capacity-gated add would make the
            # retained sample depend on partial ARRIVAL ORDER, breaking
            # byte-identical output under retries; the union is bounded
            # (each partial row is already capped at max_doc_ids) and the
            # deterministic sorted()[:max_doc_ids] cap is applied below
            got[1].update(ds)
    keys = sorted(agg.keys())
    return pa.table(
        {
            "subj_id": pa.array([k[0] for k in keys], pa.string()),
            "pred_id": pa.array([k[1] for k in keys], pa.string()),
            "obj_id": pa.array([k[2] for k in keys], pa.string()),
            "support": pa.array([agg[k][0] for k in keys], pa.int64()),
            "doc_ids": pa.array(
                [sorted(agg[k][1])[:max_doc_ids] for k in keys],
                pa.list_(pa.string()),
            ),
        }
    )


# -- vectorized variants (bucket scheme v2) -----------------------------------


def bucket_hash_probe() -> str:
    """Fingerprint of the polars row-hash function actually in effect:
    the hash of a fixed sentinel triple set, digested. Folded into the
    resume manifests' ``bucket_scheme`` so that a polars upgrade (or a
    mixed-version cluster) whose ``hash_rows`` output changed
    auto-invalidates old buckets instead of silently splitting triples
    across incompatible bucket assignments — and, unlike pinning
    ``pl.__version__``, does NOT needlessly invalidate when an upgrade
    keeps the hash stable."""
    import hashlib

    import polars as pl

    sentinel = pl.DataFrame(
        {
            "subj_id": ["E0", "E17", "", "Ω-entity"],
            "pred_id": ["P0", "P3", "p", "P"],
            "obj_id": ["E2", "E9", "o", "O"],
        }
    )
    h = sentinel.hash_rows(seed=11).to_list()
    return hashlib.sha1(",".join(map(str, h)).encode()).hexdigest()[:12]


def partial_triple_agg_vec(
    batch: pa.Table, num_buckets: int, max_doc_ids: int
) -> pa.Table:
    """Vectorized batch-local combine — identical semantics to
    :func:`partial_triple_agg` (support = row count, doc_ids = sorted
    unique sample capped at ``max_doc_ids``, null-component rows dropped)
    expressed as one polars ``group_by`` + list kernels instead of a
    Python row loop. Bucket scheme v2: a polars row hash over the triple
    key (process-stable, vectorized) replaces the per-row sha1 — resumes
    against scheme-v1 manifests auto-invalidate via the ``bucket_scheme``
    key in the bucket manifest metadata."""
    import polars as pl

    mask = num_buckets - 1  # num_buckets must be 2^k

    df = pl.from_arrow(
        batch.select(["doc_id", "subj_id", "pred_id", "obj_id"])
    ).filter(
        pl.col("subj_id").is_not_null()
        & pl.col("pred_id").is_not_null()
        & pl.col("obj_id").is_not_null()
    )
    g = (
        df.group_by(TRIPLE_COLS)
        .agg(
            support=pl.len().cast(pl.Int64),
            doc_ids=pl.col("doc_id").unique().sort().head(max_doc_ids),
        )
    )
    import numpy as np

    b = (g.select(TRIPLE_COLS).hash_rows(seed=11).to_numpy()
         & np.uint64(mask)).astype(np.int32)
    t = g.to_arrow()
    return pa.table(
        {
            "bucket": pa.array(b, pa.int32()),
            "subj_id": t["subj_id"].cast(pa.string()),
            "pred_id": t["pred_id"].cast(pa.string()),
            "obj_id": t["obj_id"].cast(pa.string()),
            "support": t["support"].cast(pa.int64()),
            "doc_ids": t["doc_ids"].cast(pa.list_(pa.string())),
        }
    )


def merge_triple_partials_vec(group: pa.Table, max_doc_ids: int) -> pa.Table:
    """Vectorized per-bucket final merge — identical output contract to
    :func:`merge_triple_partials` (summed support, deterministic sorted
    capped doc-id union, lexicographic triple order) via polars list
    ``flatten → unique → sort → head``; no per-triple Python."""
    import polars as pl

    cols = TRIPLE_COLS + ["support", "doc_ids"]
    df = (
        pl.from_arrow(group.select(cols))
        .group_by(TRIPLE_COLS)
        .agg(
            support=pl.col("support").sum(),
            doc_ids=pl.col("doc_ids").flatten().unique().sort()
            .head(max_doc_ids),
        )
        .sort(TRIPLE_COLS)
    )
    t = df.to_arrow()
    return pa.table(
        {
            "subj_id": t["subj_id"].cast(pa.string()),
            "pred_id": t["pred_id"].cast(pa.string()),
            "obj_id": t["obj_id"].cast(pa.string()),
            "support": t["support"].cast(pa.int64()),
            "doc_ids": t["doc_ids"].cast(pa.list_(pa.string())),
        }
    )
