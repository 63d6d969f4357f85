"""Relation-set sample filters (M5-M8 + S3) and the full-evaluation
orchestration (S10): reference-semantics checks plus the end-to-end
zero-shot workflow wiring."""

import json

import pyarrow as pa
import pytest
import ray.data

from genie_ray.core.linearization import linearize_triples, parse_linearization
from genie_ray.pipelines.evaluate import (
    parse_sides,
    per_relation_counters,
    zero_shot_group_metrics,
)
from genie_ray.pipelines.samples import (
    filter_samples_drop_relations,
    filter_samples_keep_relations,
    ignore_relations_relinearize,
    observed_relations,
    read_relation_set,
    relations_not_to_ignore_complement,
    zero_shot_relation_groups,
)

SAMPLES = [
    ("d1", [("A", "imports", "B"), ("C", "calls", "D")]),
    ("d2", [("A", "extends", "B")]),
    ("d3", [("X", "imports", "Y"), ("X", "extends", "Z")]),
    ("d4", []),  # zero-triple sample
    ("d5", [("Q", "wraps", "R")]),
]


def _ds():
    rows = [
        {"doc_id": d, "linearization": linearize_triples(t)} for d, t in SAMPLES
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _ids(ds):
    return sorted(ds.to_pandas()["doc_id"])


def test_drop_filter_whole_sample_semantics(ray_session):
    """M5: sample dropped if ANY triple relation hits the drop-set
    (`datasets.py:171-185`); zero-triple samples kept."""
    out = filter_samples_drop_relations(_ds(), {"imports"})
    assert _ids(out) == ["d2", "d4", "d5"]


def test_keep_filter_whole_sample_semantics(ray_session):
    """M6: dropped if ANY relation is outside the keep-set
    (`datasets.py:187-201`); zero-triple samples vacuously kept."""
    out = filter_samples_keep_relations(_ds(), {"imports", "calls", "extends"})
    assert _ids(out) == ["d1", "d2", "d3", "d4"]


def test_ignore_relinearize(ray_session):
    """M7: per-triple removal + re-linearization; empty samples dropped
    (`datasets.py:102-124`, `:263-267`)."""
    out = ignore_relations_relinearize(_ds(), {"imports"}).to_pandas()
    got = {r.doc_id: parse_linearization(r.linearization) for r in out.itertuples()}
    assert set(got) == {"d1", "d2", "d3", "d5"}  # d4 empty already, dropped
    assert got["d1"] == {("C", "calls", "D")}
    assert got["d3"] == {("X", "extends", "Z")}
    # format round-trips through the canonical sorted order
    assert out[out.doc_id == "d1"].linearization.iloc[0] == linearize_triples(
        [("C", "calls", "D")]
    )


def test_relations_complement(ray_session):
    """M8: ignore = observed − keep (`datasets.py:237-253`)."""
    obs = set(observed_relations(_ds()).to_pandas()["rel"])
    assert obs == {"imports", "calls", "extends", "wraps"}
    ign = relations_not_to_ignore_complement(_ds(), {"imports", "calls"})
    assert ign == {"extends", "wraps"}


def test_relation_set_reader(tmp_path):
    """S3: JSONL of relation names → set (`datasets.py:134-139`)."""
    p = tmp_path / "rels.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in ["imports", "calls"]) + "\n")
    assert read_relation_set(str(p)) == {"imports", "calls"}


def test_zero_shot_workflow_end_to_end(ray_session):
    """The full zero-shot dataset-prep → evaluation chain: build the
    dropped/ignored splits with the filters, evaluate per relation group
    (`evaluators.py:206-263`) — preds == targets must score 1.0 in every
    group that remains."""
    dropped_set = {"wraps"}
    base = filter_samples_drop_relations(_ds(), dropped_set)
    ignored_set = relations_not_to_ignore_complement(
        base, {"imports", "calls"}
    )
    assert ignored_set == {"extends"}
    prepared = ignore_relations_relinearize(base, ignored_set).materialize()

    obs = set(observed_relations(prepared).to_pandas()["rel"])
    rel2group = zero_shot_relation_groups(
        obs | dropped_set | ignored_set, dropped_set, ignored_set
    )
    assert rel2group == {
        "imports": "seen", "calls": "seen",
        "extends": "ignored", "wraps": "dropped",
    }

    per_rel = per_relation_counters(parse_sides(prepared, prepared))
    zs = zero_shot_group_metrics(per_rel, rel2group)
    assert set(zs["group"]) == {"seen"}  # dropped/ignored rels left the data
    assert (zs["f1"] == 1.0).all()


def test_results_orchestration_matches_components(ray_session, tmp_path):
    """S10: run_full_evaluation == the individually-called evaluators, and
    the writer emits per-evaluator JSONs + the merged object."""
    from genie_ray.pipelines.evaluate import (
        bootstrap_micro,
        bucket_metrics,
        macro_metrics_distributed,
        micro_metrics_distributed,
        per_doc_counters,
        relation_occurrence,
    )
    from genie_ray.pipelines.results import run_full_evaluation, write_results

    preds, targets = _ds(), _ds()
    res = run_full_evaluation(
        preds, targets, rel2group={"imports": "seen"}, num_bootstrap_samples=10
    )

    micro = micro_metrics_distributed(_ds(), _ds())
    for k, v in micro.items():
        assert res["micro"][k] == v
    per_doc = per_doc_counters(parse_sides(_ds(), _ds())).to_pandas()
    boot = bootstrap_micro(per_doc, num_bootstrap_samples=10)
    assert res["micro"]["bootstrap"]["f1"] == list(boot["f1"])

    macro = macro_metrics_distributed(_ds(), _ds())
    assert res["macro"] == macro

    per_rel = per_relation_counters(parse_sides(_ds(), _ds()))
    occ = relation_occurrence(_ds())
    assert res["bucket"] == bucket_metrics(per_rel, occ).to_dict(orient="records")

    out = tmp_path / "results"
    merged = write_results(res, str(out))
    names = {p.name for p in out.iterdir()}
    assert names == {
        "micro_results.json", "macro_results.json", "bucket_results.json",
        "zero_shot_results.json", "evaluation_results_object.json",
        "bucket_results.svg",  # the figure surface (PNG when matplotlib)
    }
    with open(merged) as f:
        assert json.load(f)["micro"]["f1"] == res["micro"]["f1"]


def test_results_cli(ray_session, tmp_path):
    """`python -m genie_ray.run results` writes the merged object."""
    import pyarrow.parquet as pq

    from genie_ray.run import main

    rows = [
        {"doc_id": d, "linearization": linearize_triples(t)} for d, t in SAMPLES
    ]
    p = tmp_path / "preds.parquet"
    pq.write_table(pa.Table.from_pylist(rows), p)
    out = tmp_path / "res"
    drop = tmp_path / "dropped.jsonl"
    drop.write_text(json.dumps("wraps") + "\n")
    main([
        "results", "--predictions", str(p), "--targets", str(p),
        "--output", str(out), "--relations-dropped", str(drop),
        "--bootstrap", "5",
    ])
    with open(out / "evaluation_results_object.json") as f:
        obj = json.load(f)
    assert obj["micro"]["f1"] == 1.0
    assert {g["group"] for g in obj["zero_shot"]} >= {"seen", "dropped"}


def test_testing_output_reader(ray_session, tmp_path):
    """M18 DefaultGetter key fallbacks (`evaluation.py:129-174`):
    guess>prediction, raw_output>target; pre-parsed `triples` rows
    re-linearize."""
    from genie_ray.sources.predictions import read_testing_output

    lines = [
        {"id": 1, "input": "a", "prediction": linearize_triples([("A", "r", "B")]),
         "target": linearize_triples([("A", "r", "B")])},
        {"id": 2, "input": "b", "guess": linearize_triples([("C", "r", "D")]),
         "prediction": "IGNORED", "raw_output": linearize_triples([("C", "r", "E")]),
         "target": "IGNORED"},
        {"id": 3, "input": "c", "triples": [["X", "q", "Y"], ["X", "q", "Z"]],
         "target": linearize_triples([("X", "q", "Y")])},
        # pipeline-baseline row: ONLY {id, triples} — both sides must
        # fall back to re-linearizing the parsed triples
        {"id": 4, "triples": [["P", "s", "Q"]]},
    ]
    p = tmp_path / "testing_output.jsonl"
    p.write_text("\n".join(json.dumps(x) for x in lines) + "\n")
    preds, targets = read_testing_output(str(p))
    pd_ = {r.doc_id: parse_linearization(r.linearization)
           for r in preds.to_pandas().itertuples()}
    td_ = {r.doc_id: parse_linearization(r.linearization)
           for r in targets.to_pandas().itertuples()}
    assert pd_["2"] == {("C", "r", "D")}       # guess wins over prediction
    assert td_["2"] == {("C", "r", "E")}       # raw_output wins over target
    assert pd_["3"] == {("X", "q", "Y"), ("X", "q", "Z")}  # parsed triples
    assert pd_["4"] == {("P", "s", "Q")}       # {id, triples}-only row:
    assert td_["4"] == {("P", "s", "Q")}       # both sides re-linearize

    # the evaluate CLI consumes the reference file directly
    from genie_ray.run import main
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["evaluate", "--predictions", str(p), "--targets", str(p)])
    out = json.loads(buf.getvalue())
    assert out["micro"]["predicted"] == 5 and out["micro"]["target"] == 4
