"""Config-driven composition: the reference's Hydra ``_target_`` surface.

The reference instantiates every component from YAML via Hydra
(`/root/reference/run.py:10-39`: ``hydra.utils.instantiate(cfg.model)``,
``instantiate(cfg.datamodule)``; configs under
`/root/reference/configs/*`). This module re-expresses that contract
without the Hydra dependency:

* ``instantiate(node)`` — resolve a dict with ``_target_:
  genie_ray.x.y.Z`` to the named callable and call it with the remaining
  keys as kwargs (nested ``_target_`` dicts instantiate first, like
  ``hydra.utils.instantiate``'s recursive mode). ``_partial_: true``
  returns ``functools.partial`` instead of calling — the reference uses
  this for constructor-deferred components.
* ``run_config(path_or_dict)`` — the ``run.py`` mode dispatch driven by a
  config file: ``mode: extract | evaluate | results`` plus per-mode
  component nodes. See ``tests/test_config.py`` for a complete example.

Targets are restricted to the ``genie_ray.`` namespace: a config file is
data, not code — it must not be able to import arbitrary modules.
"""

from __future__ import annotations

import functools
import importlib
import json
from typing import Any, Dict

_TARGET_KEY = "_target_"
_PARTIAL_KEY = "_partial_"


def _resolve(target: str):
    if not target.startswith("genie_ray."):
        raise ValueError(
            f"config _target_ {target!r} is outside the genie_ray "
            "namespace — configs may only instantiate engine components"
        )
    mod_name, attr = target.rsplit(".", 1)
    return getattr(importlib.import_module(mod_name), attr)


def instantiate(node: Any) -> Any:
    """Hydra-style recursive instantiation of a plain-data config tree."""
    if isinstance(node, dict) and _TARGET_KEY in node:
        fn = _resolve(node[_TARGET_KEY])
        kwargs = {
            k: instantiate(v)
            for k, v in node.items()
            if k not in (_TARGET_KEY, _PARTIAL_KEY)
        }
        if node.get(_PARTIAL_KEY):
            return functools.partial(fn, **kwargs)
        return fn(**kwargs)
    if isinstance(node, dict):
        return {k: instantiate(v) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


def load_config(path_or_dict) -> Dict:
    if isinstance(path_or_dict, dict):
        return path_or_dict
    with open(path_or_dict) as f:
        text = f.read()
    try:
        import yaml

        return yaml.safe_load(text)
    except ImportError:  # pragma: no cover - yaml is present in this env
        return json.loads(text)


def run_config(path_or_dict) -> Dict:
    """The reference's config-driven mode dispatch (`run.py:10-39`):
    ``mode`` selects the pipeline; component nodes instantiate via
    ``_target_``. Returns the mode's result dict (same shapes as the CLI
    modes in ``genie_ray.run``)."""
    cfg = load_config(path_or_dict)
    mode = cfg.get("mode")
    if mode == "extract":
        return _run_extract(cfg)
    if mode == "evaluate":
        return _run_evaluate(cfg)
    if mode == "results":
        return _run_results(cfg)
    raise ValueError(f"unknown config mode: {mode!r}")


def _run_extract(cfg: Dict) -> Dict:
    from .core.world import World
    from .pipelines.kg import KGConfig, run_kg_pipeline

    world_node = cfg.get("world")
    if world_node is not None:
        # e.g. {_target_: genie_ray.sources.wikidata.catalogs_from_dump,
        #       path: dump.json.gz} → (entities, relations)
        entities, relations = instantiate(world_node)
    else:
        from .fixtures import make_catalogs

        entities, relations = make_catalogs()
    world = World.build(entities, relations)
    kg_node = dict(cfg.get("pipeline") or {})
    kg_node.setdefault(_TARGET_KEY, "genie_ray.pipelines.kg.KGConfig")
    kg_cfg = instantiate(kg_node)
    assert isinstance(kg_cfg, KGConfig)
    parts, buckets = run_kg_pipeline(
        cfg["input"], cfg["output"], world=world, cfg=kg_cfg
    )
    return {
        "partitions": int(len(parts)),
        "triples_written": int(parts["num_rows"].sum()),
        "graph_buckets": int(len(buckets)),
        "graph_triples": int(buckets["num_triples"].sum()),
        "output": cfg["output"],
    }


def _eval_sides(cfg: Dict):
    from .sources.predictions import read_eval_side

    return (
        read_eval_side(cfg["predictions"], "pred"),
        read_eval_side(cfg["targets"], "target"),
    )


def _run_evaluate(cfg: Dict) -> Dict:
    from .pipelines.evaluate import (
        macro_metrics_distributed,
        micro_metrics_distributed,
    )

    preds, targets = _eval_sides(cfg)
    p2, t2 = _eval_sides(cfg)
    return {
        "micro": micro_metrics_distributed(preds, targets),
        "macro": macro_metrics_distributed(p2, t2),
    }


def _run_results(cfg: Dict) -> Dict:
    from .pipelines.results import run_full_evaluation, write_results

    preds, targets = _eval_sides(cfg)
    evaluators = cfg.get("evaluators") or {}
    results = run_full_evaluation(
        preds,
        targets,
        num_bootstrap_samples=int(evaluators.get("bootstrap", 50)),
        rel2group=evaluators.get("rel2group"),
    )
    out = write_results(results, cfg["output"])
    return {
        "results_object": out,
        "micro_f1": results["micro"]["f1"],
        "macro_f1": results["macro"]["f1"],
    }
