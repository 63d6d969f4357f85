"""CLI entry points — the analog of the reference's ``run.py`` mode
dispatch (`/root/reference/run.py:10-39`: ``train`` / ``evaluate`` /
``evaluate_from_file``). Modes here:

* ``extract``  — flagship KG pipeline: documents Parquet → triples +
  deduped graph with lineage manifests (resumable; rerun the same command
  after a crash and finished partitions are skipped).
* ``evaluate`` — distributed micro/macro metrics of a predictions table
  against a targets table (both ``(doc_id, linearization)`` Parquet).

Usage::

    python -m genie_ray.run extract --input docs_dir_or_file.parquet --output /tmp/out
    python -m genie_ray.run evaluate --predictions p.parquet --targets t.parquet

Owns its Ray session (guarded — the driver/test harness may already have
one); library modules never call ``ray.init``.
"""

from __future__ import annotations

import argparse
import json


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def cmd_extract(args) -> dict:
    from .core.world import World
    from .fixtures import make_catalogs
    from .pipelines.kg import KGConfig, run_kg_pipeline
    from .sources.wikidata import catalogs_from_dump

    if args.world_npz:
        from .core.compact import CompactWorld

        # persisted build (save_npz): skip catalog + world construction
        world = CompactWorld.load_npz(args.world_npz)
        entities = relations = None
    elif args.catalog_dump:
        entities, relations = catalogs_from_dump(args.catalog_dump)
    else:
        entities, relations = make_catalogs()
    if entities is not None and args.compact_world:
        from .core.compact import CompactWorld

        # zero-copy broadcast — mandatory posture at paper-scale
        # catalogs (6M surfaces: 0.01 s/worker fetch vs 40-73 s for the
        # dict World; BASELINE.md round-5 stress)
        world = CompactWorld.build(entities, relations)
    elif entities is not None:
        world = World.build(entities, relations)
    cfg = KGConfig(
        num_partitions=args.num_partitions,
        num_buckets=args.num_buckets,
        concurrency=args.concurrency,
        batch_size=args.batch_size,
        resume=not args.no_resume,
        decode_mode=args.decode_mode,
    )
    parts, buckets = run_kg_pipeline(args.input, args.output, world=world, cfg=cfg)
    return {
        "partitions": int(len(parts)),
        "triples_written": int(parts["num_rows"].sum()),
        "graph_buckets": int(len(buckets)),
        "graph_triples": int(buckets["num_triples"].sum()),
        "output": args.output,
    }


def cmd_evaluate(args) -> dict:
    from .pipelines.evaluate import (
        macro_metrics_distributed,
        micro_metrics_distributed,
    )
    from .sources.predictions import read_eval_side

    micro = micro_metrics_distributed(
        read_eval_side(args.predictions, "pred"),
        read_eval_side(args.targets, "target"),
    )
    macro = macro_metrics_distributed(
        read_eval_side(args.predictions, "pred"),
        read_eval_side(args.targets, "target"),
    )
    return {"micro": micro, "macro": macro}


def cmd_results(args) -> dict:
    """``results`` mode: the reference's ``evaluate_from_file`` composition
    (micro+bootstrap / macro / bucket / zero-shot) over a predictions and
    targets Parquet pair, written as per-evaluator JSONs + the merged
    results object (S10)."""
    import ray.data

    from .pipelines.results import run_full_evaluation, write_results
    from .pipelines.samples import read_relation_set, zero_shot_relation_groups
    from .sources.predictions import read_eval_side

    preds = read_eval_side(args.predictions, "pred")
    targets = read_eval_side(args.targets, "target")
    occurrence = (
        read_eval_side(args.train_targets, "target") if args.train_targets else None
    )
    rel2group = None
    if args.relations_dropped or args.relations_ignored:
        dropped = (
            read_relation_set(args.relations_dropped) if args.relations_dropped else set()
        )
        ignored = (
            read_relation_set(args.relations_ignored) if args.relations_ignored else set()
        )
        from .pipelines.evaluate import relation_occurrence

        observed = set(relation_occurrence(read_eval_side(args.targets, "target")))
        rel2group = zero_shot_relation_groups(observed | dropped | ignored, dropped, ignored)
    results = run_full_evaluation(
        preds,
        targets,
        occurrence_targets=occurrence,
        rel2group=rel2group,
        num_bootstrap_samples=args.bootstrap,
    )
    path = write_results(results, args.output)
    return {"results_object": path, "micro_f1": results["micro"]["f1"],
            "macro_f1": results["macro"]["f1"]}


def cmd_graph(args) -> dict:
    """``graph`` mode: run the selected analytics over a triples Parquet
    and write each result as partitioned Parquet under
    ``<output>/<op>/`` — one file per block, so a rerun of a failed op
    only redoes that op's directory."""
    from .pipelines import graph as G

    builders = {
        "degrees": lambda: G.entity_degrees(
            args.triples, num_buckets=args.num_buckets),
        "pagerank": lambda: G.pagerank_fixed(
            args.triples, iters=args.iters,
            num_buckets=min(16, args.num_buckets),
            num_partitions=args.num_partitions,
            checkpoint_dir=(os.path.join(args.checkpoint_dir, "pagerank")
                            if args.checkpoint_dir else None),
            dangling=args.dangling),
        "khop": lambda: G.khop_reachable(
            args.triples, k=args.k,
            num_buckets=min(16, args.num_buckets),
            num_partitions=args.num_partitions,
            checkpoint_dir=(os.path.join(args.checkpoint_dir, "khop")
                            if args.checkpoint_dir else None)),
        "cooccur": lambda: G.entity_cooccurrence(
            args.triples, num_buckets=args.num_buckets),
        "paths2": lambda: G.relation_paths2(
            args.triples, num_buckets=min(16, args.num_buckets),
            num_partitions=args.num_partitions),
        "neg_sample": lambda: G.negative_samples(
            args.triples, per_edge=args.per_edge,
            num_buckets=min(16, args.num_buckets),
            num_partitions=args.num_partitions),
        "triangles": lambda: G.triangle_count(
            args.triples, num_buckets=min(16, args.num_buckets),
            num_partitions=args.num_partitions),
        "clustering": lambda: G.clustering_counts(
            args.triples, num_buckets=min(16, args.num_buckets),
            num_partitions=args.num_partitions),
    }
    import os

    summary = {}
    for op in [o.strip() for o in args.ops.split(",") if o.strip()]:
        if op not in builders:
            raise SystemExit(
                f"unknown graph op {op!r}; choose from {sorted(builders)}"
            )
        out_dir = os.path.join(args.output, op)
        ds = builders[op]()
        # clear first: Ray's write_parquet APPENDs by default, so a rerun
        # over a partially-written op dir would duplicate rows (same
        # contract as the per-round checkpoint writer, pipelines/graph.py)
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        ds.write_parquet(out_dir)
        import ray.data

        summary[op] = ray.data.read_parquet(out_dir).count()
    return summary


def cmd_curate(args) -> dict:
    """``curate`` mode: the staged resumable curation pipeline — one
    lineage-manifested Parquet set per stage under ``<output>/``."""
    from .pipelines.curate import CurateConfig, curate

    cfg = CurateConfig(
        num_partitions=args.num_partitions,
        num_buckets=args.num_buckets,
        lang_mode=args.lang_mode,
        lang_keep=tuple(args.lang.split(",")),
        near_dup=args.near_dup,
        pack_budget=args.pack_budget,
        pack_groups=args.pack_groups,
        resume=not args.no_resume,
    )
    summary = curate(args.input, args.output, cfg)
    print(json.dumps(summary))
    return summary


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="genie_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="mode", required=True)

    ex = sub.add_parser("extract")
    ex.add_argument("--input", required=True)
    ex.add_argument("--output", required=True)
    ex.add_argument("--catalog-dump", default=None,
                    help="optional gz JSONL dump to build catalogs from")
    ex.add_argument("--num-partitions", type=int, default=16)
    ex.add_argument("--num-buckets", type=int, default=8)
    ex.add_argument("--concurrency", type=int, default=4)
    ex.add_argument("--batch-size", type=int, default=64)
    ex.add_argument("--decode-mode", default="scan", choices=["scan", "beam"])
    ex.add_argument("--no-resume", action="store_true")
    ex.add_argument("--compact-world", action="store_true",
                    help="broadcast the catalog world in the zero-copy "
                         "buffer form (use for catalogs beyond ~1M "
                         "surfaces; identical outputs)")
    ex.add_argument("--world-npz", default=None,
                    help="load a persisted CompactWorld (save_npz) "
                         "instead of building from catalogs — pays the "
                         "minutes-scale 6M-surface build once per "
                         "catalog version")
    ex.set_defaults(fn=cmd_extract)

    ev = sub.add_parser("evaluate")
    ev.add_argument("--predictions", required=True)
    ev.add_argument("--targets", required=True)
    ev.set_defaults(fn=cmd_evaluate)

    rs = sub.add_parser("results")
    rs.add_argument("--predictions", required=True)
    rs.add_argument("--targets", required=True)
    rs.add_argument("--output", required=True)
    rs.add_argument("--train-targets", default=None,
                    help="corpus defining bucket occurrence counts "
                         "(reference reloads the train split); defaults to "
                         "--targets")
    rs.add_argument("--relations-dropped", default=None,
                    help="JSONL relation set: zero-shot 'dropped' group")
    rs.add_argument("--relations-ignored", default=None,
                    help="JSONL relation set: zero-shot 'ignored' group")
    rs.add_argument("--bootstrap", type=int, default=50)
    rs.set_defaults(fn=cmd_results)

    gr = sub.add_parser(
        "graph",
        help="analytics over a triples Parquet (the extract stage's "
             "output): degrees, PageRank, k-hop, co-occurrence, 2-hop "
             "paths, negative samples",
    )
    gr.add_argument("--triples", required=True,
                    help="triples Parquet path/dir (canonicalized schema)")
    gr.add_argument("--output", required=True)
    gr.add_argument("--ops", default="degrees,pagerank,cooccur,paths2",
                    help="comma list of: degrees pagerank khop cooccur "
                         "paths2 neg_sample triangles clustering")
    gr.add_argument("--iters", type=int, default=3)
    gr.add_argument("--k", type=int, default=3)
    gr.add_argument("--per-edge", type=int, default=2)
    gr.add_argument("--num-buckets", type=int, default=64)
    gr.add_argument("--num-partitions", type=int, default=8)
    gr.add_argument("--checkpoint-dir", default=None,
                    help="per-round state checkpoints for the iterative "
                         "ops (pagerank/khop) — a rerun resumes from the "
                         "highest finished round, bit-identical")
    gr.add_argument("--dangling", default="drop",
                    choices=["drop", "redistribute"],
                    help="PageRank dangling-mass policy")
    gr.set_defaults(fn=cmd_graph)

    cu = sub.add_parser(
        "curate",
        help="resumable end-to-end training-data curation over a "
             "documents Parquet: lang gate → quality/repetition cut → "
             "global dedup → decontamination → split → packing",
    )
    cu.add_argument("--input", required=True,
                    help="documents Parquet (doc_id, text, source, lang)")
    cu.add_argument("--output", required=True)
    cu.add_argument("--num-partitions", type=int, default=16)
    cu.add_argument("--num-buckets", type=int, default=16)
    cu.add_argument("--lang", default="en",
                    help="comma list of languages to keep")
    cu.add_argument("--lang-mode", default="column",
                    choices=["column", "predict"],
                    help="'predict' uses the trigram LangId model instead "
                         "of trusting the lang column")
    cu.add_argument("--near-dup", action="store_true",
                    help="also drop MinHash-LSH near-dup cluster losers")
    cu.add_argument("--pack-budget", type=int, default=512)
    cu.add_argument("--pack-groups", type=int, default=8)
    cu.add_argument("--no-resume", action="store_true")
    cu.set_defaults(fn=cmd_curate)

    # config-file-driven composition (the reference's Hydra surface,
    # `run.py:10-39`): every component node instantiates via `_target_`
    cf = sub.add_parser("config")
    cf.add_argument("config_path", help="YAML/JSON config with a 'mode' key")
    cf.set_defaults(fn=lambda a: __import__(
        "genie_ray.config", fromlist=["run_config"]
    ).run_config(a.config_path))

    args = ap.parse_args(argv)
    _ensure_ray(args.num_cpus)
    print(json.dumps(args.fn(args), default=float))


if __name__ == "__main__":
    main()
