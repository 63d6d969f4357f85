"""Config-driven composition (§2.10, reference `run.py:10-39` Hydra
``_target_`` surface): instantiate semantics + an end-to-end config-file
extract run equal to the programmatic pipeline."""

import json
import os

import pytest

from genie_ray.config import instantiate, load_config, run_config


def test_instantiate_resolves_target_with_kwargs():
    cfg = {
        "_target_": "genie_ray.pipelines.kg.KGConfig",
        "num_partitions": 4,
        "num_buckets": 2,
        "decode_mode": "scan",
    }
    obj = instantiate(cfg)
    from genie_ray.pipelines.kg import KGConfig

    assert isinstance(obj, KGConfig)
    assert obj.num_partitions == 4 and obj.num_buckets == 2


def test_instantiate_nested_and_partial():
    cfg = {
        "outer": {
            "_target_": "genie_ray.core.metrics.MetricCounters",
            "correct": 3,
            "predicted": 4,
            "target": 6,
        },
        "deferred": {
            "_target_": "genie_ray.core.metrics.MetricCounters",
            "_partial_": True,
            "correct": 1,
        },
        "plain": [1, {"k": "v"}],
    }
    got = instantiate(cfg)
    assert got["outer"].precision == 0.75
    made = got["deferred"](predicted=2, target=2)
    assert made.correct == 1 and made.predicted == 2
    assert got["plain"] == [1, {"k": "v"}]


def test_instantiate_rejects_foreign_targets():
    with pytest.raises(ValueError, match="genie_ray"):
        instantiate({"_target_": "os.system", "command": "true"})


def test_load_config_yaml_and_dict(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("mode: extract\ninput: /x\npipeline:\n  num_buckets: 2\n")
    cfg = load_config(str(p))
    assert cfg["mode"] == "extract" and cfg["pipeline"]["num_buckets"] == 2
    assert load_config({"a": 1}) == {"a": 1}


def test_config_extract_equals_programmatic(ray_session, tmp_path):
    """A YAML-driven extract run produces the same graph as the direct
    run_kg_pipeline call with equivalent KGConfig."""
    from genie_ray.fixtures import write_documents_parquet
    from genie_ray.pipelines.kg import KGConfig, run_kg_pipeline

    docs = str(tmp_path / "docs")
    write_documents_parquet(docs, n_docs=40, seed=3, n_files=2)

    out_cfg = str(tmp_path / "out_cfg")
    out_direct = str(tmp_path / "out_direct")
    cfg_file = tmp_path / "run.yaml"
    cfg_file.write_text(
        "mode: extract\n"
        f"input: {docs}\n"
        f"output: {out_cfg}\n"
        "pipeline:\n"
        "  _target_: genie_ray.pipelines.kg.KGConfig\n"
        "  num_partitions: 4\n"
        "  num_buckets: 2\n"
        "  concurrency: 2\n"
        "  resume: false\n"
    )
    got = run_config(str(cfg_file))
    _, buckets = run_kg_pipeline(
        docs, out_direct,
        cfg=KGConfig(num_partitions=4, num_buckets=2, concurrency=2, resume=False),
    )
    assert got["graph_triples"] == int(buckets["num_triples"].sum())
    assert got["triples_written"] > 0
    assert os.path.isdir(out_cfg)


def test_config_results_mode(ray_session, tmp_path):
    from genie_ray.golden import ensure_golden

    paths = ensure_golden()
    out = str(tmp_path / "res")
    got = run_config(
        {
            "mode": "results",
            "predictions": paths["preds"],
            "targets": paths["samples"],
            "output": out,
            "evaluators": {"bootstrap": 10},
        }
    )
    assert os.path.exists(got["results_object"])
    with open(got["results_object"]) as f:
        obj = json.load(f)
    assert 0 < obj["micro"]["f1"] <= 1.0


def test_config_unknown_mode_raises():
    with pytest.raises(ValueError, match="unknown config mode"):
        run_config({"mode": "nope"})
