"""Full-evaluation orchestration + results writer (S10).

The reference's ``evaluate_from_file`` entry point
(`/root/reference/genie/evaluate_from_file.py:19-214`) instantiates a
getter over the predictions file and runs every configured evaluator —
micro (+ bootstrap CIs), macro, bucketed, zero-shot — writing one
``{evaluator}_results.json`` per evaluator and a merged
``evaluation_results_object.json`` (S10, `evaluate_from_file.py:56-59,
176-179,211-214`). Here the same composition runs over Ray Datasets in
ONE parse pass:

    predictions ∪ targets → parse/explode (tagged triples, materialized
    once — both counter families consume it without re-parsing)
      ├─ groupby(doc_id)  → per-doc counters  → micro + bootstrap
      └─ groupby(quad)    → per-relation counters → macro / bucket / ZS

The exploded-triple table is ~1% of the document bytes, so the single
mid-pipeline ``materialize()`` holds triples, not documents — the price
of not parsing every linearization twice.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import ray.data

from .evaluate import (
    bootstrap_micro,
    bucket_metrics,
    macro_from_per_rel,
    parse_sides,
    per_doc_counters,
    per_relation_counters,
    relation_occurrence,
    zero_shot_group_metrics,
)
from ..core.metrics import MetricCounters

RESULTS_OBJECT_NAME = "evaluation_results_object.json"


def run_full_evaluation(
    predictions: ray.data.Dataset,
    targets: ray.data.Dataset,
    occurrence_targets: Optional[ray.data.Dataset] = None,
    rel2group: Optional[Dict[str, str]] = None,
    num_bootstrap_samples: int = 50,
    bootstrap_seed: int = 123,
) -> Dict:
    """Run micro(+bootstrap)/macro/bucket[/zero-shot] in one parse pass.

    ``occurrence_targets``: the corpus whose relation frequencies define
    the buckets — the reference reloads the TRAIN split for this
    (`evaluate_from_file.py:90-100`); defaults to ``targets``.
    ``rel2group``: relation → group name map for the zero-shot evaluator
    (`evaluators.py:206-263`); omit to skip that evaluator.
    """
    tagged = parse_sides(predictions, targets).materialize()

    per_doc = per_doc_counters(tagged).to_pandas()
    micro = MetricCounters(
        int(per_doc["correct"].sum()),
        int(per_doc["predicted"].sum()),
        int(per_doc["target"].sum()),
    ).as_dict()
    micro["bootstrap"] = {
        metric: list(ci)
        for metric, ci in bootstrap_micro(
            per_doc, num_bootstrap_samples=num_bootstrap_samples, seed=bootstrap_seed
        ).items()
    }

    per_rel = per_relation_counters(tagged)
    macro = macro_from_per_rel(per_rel)

    if occurrence_targets is None:
        occ = dict(
            zip(
                per_rel["rel"],
                per_rel["target"].astype(int),
            )
        )
    else:
        occ = relation_occurrence(occurrence_targets)
    bucket = bucket_metrics(per_rel, occ).to_dict(orient="records")

    results: Dict = {
        "num_docs": int(len(per_doc)),
        "micro": micro,
        "macro": macro,
        "bucket": bucket,
    }
    if rel2group is not None:
        results["zero_shot"] = zero_shot_group_metrics(per_rel, rel2group).to_dict(
            orient="records"
        )
    return results


def write_results(results: Dict, output_dir: str) -> str:
    """S10: one ``{evaluator}_results.json`` per evaluator plus the merged
    ``evaluation_results_object.json`` (`evaluate_from_file.py:56-59,
    211-214`) and the bucket figure (`:153-169` — PNG when matplotlib is
    available, deterministic SVG here). Returns the merged object's path."""
    os.makedirs(output_dir, exist_ok=True)
    for name in ("micro", "macro", "bucket", "zero_shot"):
        if name in results:
            with open(os.path.join(output_dir, f"{name}_results.json"), "w") as f:
                json.dump(results[name], f, indent=4, sort_keys=True)
    if results.get("bucket"):
        from .plots import plot_bucket_results

        plot_bucket_results(
            results["bucket"], os.path.join(output_dir, "bucket_results")
        )
    merged = os.path.join(output_dir, RESULTS_OBJECT_NAME)
    with open(merged, "w") as f:
        json.dump(results, f, indent=4, sort_keys=True)
    return merged
