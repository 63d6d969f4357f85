"""Distributed evaluation pipeline: micro / macro / bucket / zero-shot
triple-set metrics + bootstrap CIs.

Re-expresses the reference's evaluators (`/root/reference/genie/utils/
evaluators.py`, `evaluation.py`, `genie/metrics/*`) over Ray Data:

* predictions ⋈ targets by ``doc_id`` (SURVEY.md §2.4 J3) instead of the
  reference's positional zip (`evaluators.py:28-31`) — implemented as a
  tagged union + ``groupby(doc_id)`` co-group so Ray's unordered streaming
  execution is safe;
* per-document set-semantics counters (G4) computed inside the group, then
  summed distributedly — the Ray Data form of torchmetrics'
  ``dist_reduce_fx="sum"`` (`triplet_set_f1.py:9-11`);
* per-relation counters for macro metrics (G5): every doc's sets filtered
  to one relation (`evaluation.py:29-30`) reduces to exploded-triple
  counting co-grouped on ``(doc_id, subj, rel, obj)``;
* macro average = unweighted mean over relations with ≥1 target occurrence
  (`evaluators.py:84-89,140-147`);
* bucket metrics (G6): relations bucketed by floor(log2(train occurrence))
  (`plot_helpers.py:19-31`), metrics per bucket from the same per-relation
  counters;
* bootstrap (G8): 50 doc-level resamples with replacement, ``random.seed(
  123)``, mean ± sample std (`evaluation.py:12-26`) — driver-side over the
  tiny per-doc counter table, resampling counters, not data.
"""

from __future__ import annotations

import math
import random
from typing import Dict, Optional, Sequence

import pandas as pd
import pyarrow as pa
import ray.data

from ..core.linearization import parse_linearization
from ..core.metrics import MetricCounters


def _parse_side(batch: pa.Table, side: str) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["linearization"].to_pylist()
    o_doc, o_s, o_r, o_o, o_side = [], [], [], [], []
    for did, text in zip(doc_ids, texts):
        triples = parse_linearization(text)
        if not triples:
            # empty-set marker row: the doc must exist in the co-group even
            # with zero triples (counts toward predicted/target totals)
            o_doc.append(did)
            o_s.append(None)
            o_r.append(None)
            o_o.append(None)
            o_side.append(side)
            continue
        for s, r, o in sorted(triples):
            o_doc.append(did)
            o_s.append(s)
            o_r.append(r)
            o_o.append(o)
            o_side.append(side)
    return pa.table(
        {
            "doc_id": pa.array(o_doc, pa.string()),
            "subj": pa.array(o_s, pa.string()),
            "rel": pa.array(o_r, pa.string()),
            "obj": pa.array(o_o, pa.string()),
            "side": pa.array(o_side, pa.string()),
        }
    )


def parse_sides(
    predictions: ray.data.Dataset, targets: ray.data.Dataset
) -> ray.data.Dataset:
    """Both inputs: (doc_id, linearization). Output: tagged exploded
    triples, unioned (one streaming pass per side, no materialize).

    Note: Ray's UnionOperator emits a terminal empty (schema-less) bundle
    in streaming plans, so a shuffle consuming this union logs a benign
    executor schema-mismatch WARNING; every real block carries the full
    tagged schema (verified block-by-block) and all three eval queries are
    hash-exact against their oracles."""
    p = predictions.map_batches(
        _parse_side, fn_kwargs={"side": "pred"}, batch_format="pyarrow"
    )
    t = targets.map_batches(
        _parse_side, fn_kwargs={"side": "target"}, batch_format="pyarrow"
    )
    return p.union(t)


def _tag_count_batch(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Vectorized pre-shuffle pass: side flags as int columns + a stable
    hash bucket of ``doc_id`` so ALL of one document's rows (both sides)
    co-locate in one bucket group. Marker rows (null subj — the doc exists
    with an empty set) keep the doc present with zero counts."""
    import polars as pl

    valid = pa.compute.is_valid(batch["subj"])
    is_pred = pa.compute.cast(
        pa.compute.and_(valid, pa.compute.equal(batch["side"], "pred")), pa.int64()
    )
    is_targ = pa.compute.cast(
        pa.compute.and_(valid, pa.compute.equal(batch["side"], "target")), pa.int64()
    )
    bucket = (
        (pl.from_arrow(batch["doc_id"]).hash(seed=0) % num_buckets)
        .cast(pl.Int32)
        .to_arrow()
    )
    return pa.table(
        {
            "bucket": bucket,
            "doc_id": batch["doc_id"],
            "subj": batch["subj"],
            "rel": batch["rel"],
            "obj": batch["obj"],
            "is_pred": is_pred,
            "is_targ": is_targ,
        }
    )


def _quad_counts_arrow(g: pa.Table):
    """One vectorized Arrow ``group_by`` over the full quad key: per
    distinct (doc, s, r, o), whether each side saw it — the set-semantics
    intersection without any per-group Python (each (doc, quad, side) row
    is already distinct because the parser emits per-doc SETS)."""
    quad = g.group_by(["doc_id", "subj", "rel", "obj"]).aggregate(
        [("is_pred", "sum"), ("is_targ", "sum")]
    )
    one = pa.scalar(1, pa.int64())
    p1 = pa.compute.min_element_wise(quad["is_pred_sum"], one)
    t1 = pa.compute.min_element_wise(quad["is_targ_sum"], one)
    return quad, p1, t1, pa.compute.multiply(p1, t1)


def per_doc_counters(
    tagged: ray.data.Dataset, num_buckets: int = 64
) -> ray.data.Dataset:
    """One (doc_id, correct, predicted, target) row per document (G4,
    `triplet_set_f1.py:14-20`). Bucketed two-phase shape: the wide shuffle
    orders ``num_buckets`` keys, and within each bucket the quad- and
    doc-level rollups are single Arrow ``group_by`` calls — no one-row
    Python tables per document (the 100-TB form of torchmetrics'
    ``dist_reduce_fx="sum"``)."""

    def merge(g: pa.Table) -> pa.Table:
        quad, p1, t1, corr = _quad_counts_arrow(g)
        doc = pa.table(
            {
                "doc_id": quad["doc_id"],
                "correct": corr,
                "predicted": p1,
                "target": t1,
            }
        )
        out = doc.group_by("doc_id").aggregate(
            [("correct", "sum"), ("predicted", "sum"), ("target", "sum")]
        )
        return out.rename_columns(["doc_id", "correct", "predicted", "target"])

    counted = tagged.map_batches(
        _tag_count_batch,
        fn_kwargs={"num_buckets": num_buckets},
        batch_format="pyarrow",
    )
    # partitions sized to the bucket cardinality: empty sort partitions
    # would emit schema-less blocks (executor schema-mismatch warnings)
    return counted.groupby("bucket", num_partitions=max(1, num_buckets // 8)).map_groups(
        merge, batch_format="pyarrow"
    )


def micro_metrics_distributed(
    predictions: ray.data.Dataset, targets: ray.data.Dataset
) -> Dict:
    """G1-G3: global micro P/R/F1 via summed per-doc counters."""
    counters = per_doc_counters(parse_sides(predictions, targets))
    sums = counters.sum(["correct", "predicted", "target"])
    c = MetricCounters(
        int(sums["sum(correct)"]), int(sums["sum(predicted)"]), int(sums["sum(target)"])
    )
    return c.as_dict()


def per_relation_counters(
    tagged: ray.data.Dataset, num_buckets: int = 64
) -> pd.DataFrame:
    """G5 support: per-relation (correct, predicted, target) counts over
    distinct quads. Same bucketed shape as ``per_doc_counters`` (the
    doc-hash bucket co-locates every quad's two sides); within each bucket
    one Arrow ``group_by`` computes quad counts and a second pre-pivots
    them per relation, so the final shuffle moves ``num_buckets ×
    #relations`` partial rows — never one Python table per distinct
    triple. Returns the small (#relations) pandas frame."""

    def merge(g: pa.Table) -> pa.Table:
        quad, p1, t1, corr = _quad_counts_arrow(g)
        relq = pa.table(
            {
                "rel": quad["rel"],
                "correct": corr,
                "predicted": p1,
                "target": t1,
            }
        ).filter(pa.compute.is_valid(quad["rel"]))  # drop empty-set markers
        out = relq.group_by("rel").aggregate(
            [("correct", "sum"), ("predicted", "sum"), ("target", "sum")]
        )
        return out.rename_columns(["rel", "correct", "predicted", "target"])

    counted = tagged.map_batches(
        _tag_count_batch,
        fn_kwargs={"num_buckets": num_buckets},
        batch_format="pyarrow",
    )
    partials = counted.groupby(
        "bucket", num_partitions=max(1, num_buckets // 8)
    ).map_groups(merge, batch_format="pyarrow")
    per_rel = (
        # partials are tiny (num_buckets × #relations rows): one partition
        partials.groupby("rel", num_partitions=1)
        .sum(["correct", "predicted", "target"])
        .to_pandas()
        .rename(
            columns={
                "sum(correct)": "correct",
                "sum(predicted)": "predicted",
                "sum(target)": "target",
            }
        )
    )
    return per_rel


def _prf(row) -> Dict[str, float]:
    c = MetricCounters(int(row["correct"]), int(row["predicted"]), int(row["target"]))
    return {"precision": c.precision, "recall": c.recall, "f1": c.f1}


def macro_metrics_distributed(
    predictions: ray.data.Dataset, targets: ray.data.Dataset
) -> Dict:
    """G5: unweighted mean of per-relation P/R/F1 over relations with ≥1
    target occurrence (`evaluators.py:84-89`)."""
    return macro_from_per_rel(
        per_relation_counters(parse_sides(predictions, targets))
    )


def macro_from_per_rel(per_rel: pd.DataFrame) -> Dict:
    """Macro metrics from an already-computed per-relation counter frame
    (shared by the one-pass results orchestration)."""
    per_rel = per_rel[per_rel["target"] > 0]  # reference: all_relations = target rels
    if per_rel.empty:
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0, "num_relations": 0}
    scores = per_rel.apply(_prf, axis=1, result_type="expand")
    return {
        "precision": float(scores["precision"].mean()),
        "recall": float(scores["recall"].mean()),
        "f1": float(scores["f1"].mean()),
        "num_relations": int(len(per_rel)),
    }


def bucket_metrics(
    per_rel: pd.DataFrame, occurrence: Dict[str, int]
) -> pd.DataFrame:
    """G6: bucket relations by floor(log2(train occurrence)); 0-occurrence
    relations form their own bucket -1 (`plot_helpers.py:19-31` bin edges
    are powers of two). Metrics per bucket are micro within the bucket."""
    rows = []
    per_rel = per_rel[per_rel["target"] > 0]
    buckets: Dict[int, MetricCounters] = {}
    for _, row in per_rel.iterrows():
        occ = occurrence.get(row["rel"], 0)
        b = int(math.floor(math.log2(occ))) if occ > 0 else -1
        buckets.setdefault(b, MetricCounters()).merge(
            MetricCounters(int(row["correct"]), int(row["predicted"]), int(row["target"]))
        )
    for b in sorted(buckets):
        c = buckets[b]
        rows.append(
            {
                "bucket": b,
                "min_occurrence": 0 if b < 0 else 2**b,
                **c.as_dict(),
            }
        )
    return pd.DataFrame(rows)


def zero_shot_group_metrics(
    per_rel: pd.DataFrame, rel2group: Dict[str, str]
) -> pd.DataFrame:
    """G10: metrics per relation group (seen / dropped / ignored …,
    `evaluators.py:206-263`)."""
    per_rel = per_rel[per_rel["target"] > 0]
    groups: Dict[str, MetricCounters] = {}
    for _, row in per_rel.iterrows():
        g = rel2group.get(row["rel"], "unknown")
        groups.setdefault(g, MetricCounters()).merge(
            MetricCounters(int(row["correct"]), int(row["predicted"]), int(row["target"]))
        )
    return pd.DataFrame(
        [{"group": g, **c.as_dict()} for g, c in sorted(groups.items())]
    )


def bootstrap_micro(
    per_doc: pd.DataFrame,
    num_bootstrap_samples: int = 50,
    seed: int = 123,
    metrics: Sequence[str] = ("precision", "recall", "f1"),
) -> Dict[str, tuple]:
    """G8: reference bootstrap (`evaluation.py:12-26`): seed 123,
    ``random.choices(range(n), k=n)`` per resample, mean ± SAMPLE std
    (torch.std default ddof=1). Operates on the per-doc counter frame —
    resampling counters, not data."""
    n = len(per_doc)
    random.seed(seed)
    correct = per_doc["correct"].to_numpy()
    predicted = per_doc["predicted"].to_numpy()
    target = per_doc["target"].to_numpy()
    samples: Dict[str, list] = {m: [] for m in metrics}
    for _ in range(num_bootstrap_samples):
        ids = random.choices(range(n), k=n)
        c = MetricCounters(
            int(correct[ids].sum()), int(predicted[ids].sum()), int(target[ids].sum())
        )
        d = c.as_dict()
        for m in metrics:
            samples[m].append(d[m])
    out = {}
    for m in metrics:
        s = pd.Series(samples[m])
        out[m] = (float(s.mean()), float(s.std(ddof=1)))
    return out


def relation_occurrence(targets: ray.data.Dataset) -> Dict[str, int]:
    """G7: relation → #occurrences over a corpus of (doc_id, linearization)
    targets (`surface_forms_utils.py:11-24`)."""
    tagged = targets.map_batches(
        _parse_side, fn_kwargs={"side": "target"}, batch_format="pyarrow"
    )
    triples = tagged.map_batches(
        lambda t: t.filter(pa.compute.is_valid(t["subj"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    counts = triples.groupby("rel").count().to_pandas()
    return dict(zip(counts["rel"], counts["count()"]))
