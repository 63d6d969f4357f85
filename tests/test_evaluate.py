"""Distributed evaluation vs a local reference-semantics implementation."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from genie_ray.core.linearization import linearize_triples, parse_linearization
from genie_ray.core.metrics import MetricCounters, micro_metrics
from genie_ray.pipelines.evaluate import (
    bootstrap_micro,
    bucket_metrics,
    macro_metrics_distributed,
    micro_metrics_distributed,
    parse_sides,
    per_doc_counters,
    per_relation_counters,
    relation_occurrence,
    zero_shot_group_metrics,
)

DOCS = {
    "d1": (
        [("A", "r1", "B"), ("C", "r2", "D")],  # pred
        [("A", "r1", "B"), ("E", "r2", "F")],  # target
    ),
    "d2": ([("A", "r1", "B")], [("A", "r1", "B")]),
    "d3": ([], [("X", "r3", "Y")]),
    "d4": ([("P", "r1", "Q")], []),
    "d5": ([("M", "r2", "N"), ("M", "r2", "N")], [("M", "r2", "N")]),
}


def _ds(side_idx):
    rows = [
        {"doc_id": d, "linearization": linearize_triples(v[side_idx])}
        for d, v in DOCS.items()
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


@pytest.fixture(scope="module")
def preds_targets(ray_session):
    return _ds(0), _ds(1)


def local_reference_micro():
    pairs = [
        (set(p), set(t)) for p, t in DOCS.values()
    ]
    return micro_metrics(pairs)


def test_micro_matches_local_reference(preds_targets):
    preds, targets = preds_targets
    got = micro_metrics_distributed(preds, targets)
    want = local_reference_micro().as_dict()
    assert got == want
    # sanity against hand count: correct=3 (d1:1,d2:1,d5:1), pred=5, target=5
    assert got["correct"] == 3 and got["predicted"] == 5 and got["target"] == 5


def test_per_doc_counters_include_empty_sets(preds_targets):
    preds, targets = preds_targets
    df = per_doc_counters(parse_sides(preds, targets)).to_pandas().set_index("doc_id")
    assert df.loc["d3", "predicted"] == 0 and df.loc["d3", "target"] == 1
    assert df.loc["d4", "predicted"] == 1 and df.loc["d4", "target"] == 0
    assert df.loc["d5", "predicted"] == 1  # set dedup of duplicate pred


def test_macro_matches_local_reference(preds_targets):
    preds, targets = preds_targets
    got = macro_metrics_distributed(preds, targets)
    # local reference: per-relation filtered sets, mean over target rels
    rels = {"r1", "r2", "r3"}
    per_rel = {}
    for rel in rels:
        pairs = [
            (
                {t for t in set(p) if t[1] == rel},
                {t for t in set(t_) if t[1] == rel},
            )
            for p, t_ in DOCS.values()
        ]
        per_rel[rel] = micro_metrics(pairs)
    import numpy as np

    want_p = float(np.mean([c.precision for c in per_rel.values()]))
    want_r = float(np.mean([c.recall for c in per_rel.values()]))
    want_f = float(np.mean([c.f1 for c in per_rel.values()]))
    assert got["num_relations"] == 3
    assert abs(got["precision"] - want_p) < 1e-12
    assert abs(got["recall"] - want_r) < 1e-12
    assert abs(got["f1"] - want_f) < 1e-12


def test_relation_occurrence(preds_targets):
    _, targets = preds_targets
    occ = relation_occurrence(targets)
    assert occ == {"r1": 2, "r2": 2, "r3": 1}


def test_bucket_metrics(preds_targets):
    preds, targets = preds_targets
    per_rel = per_relation_counters(parse_sides(preds, targets))
    occ = {"r1": 2, "r2": 2, "r3": 1}
    df = bucket_metrics(per_rel, occ)
    # r3: occ 1 → bucket 0; r1,r2: occ 2 → bucket 1
    assert set(df["bucket"]) == {0, 1}
    b1 = df[df["bucket"] == 1].iloc[0]
    assert b1["correct"] == 3 and b1["predicted"] == 5 and b1["target"] == 4


def test_zero_shot_groups(preds_targets):
    preds, targets = preds_targets
    per_rel = per_relation_counters(parse_sides(preds, targets))
    df = zero_shot_group_metrics(per_rel, {"r1": "seen", "r2": "seen", "r3": "zs"})
    seen = df[df["group"] == "seen"].iloc[0]
    zs = df[df["group"] == "zs"].iloc[0]
    assert seen["correct"] == 3 and seen["predicted"] == 5 and seen["target"] == 4
    assert zs["correct"] == 0 and zs["target"] == 1
    assert zs["recall"] == 0.0


def test_bootstrap_reproducible(preds_targets):
    preds, targets = preds_targets
    per_doc = per_doc_counters(parse_sides(preds, targets)).to_pandas()
    a = bootstrap_micro(per_doc, num_bootstrap_samples=20)
    b = bootstrap_micro(per_doc, num_bootstrap_samples=20)
    assert a == b  # seeded
    for m, (mean, std) in a.items():
        assert 0.0 <= mean <= 1.0 and std >= 0.0


def test_round_trip_parse():
    for p, t in DOCS.values():
        assert parse_linearization(linearize_triples(p)) == set(p)
