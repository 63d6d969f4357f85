"""End-to-end Ray Data pipeline: extraction → triples → graph, gated
against the single-process oracle (micro-P/R, target 1.0 with the
deterministic backend), plus lineage/resume semantics (FIXTURES.md §7)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from genie_ray.core.metrics import micro_metrics
from genie_ray.core.oracle import oracle_extract
from genie_ray.core.world import World
from genie_ray.fixtures import make_catalogs, make_documents
from genie_ray.pipelines.kg import KGConfig, build_graph, extract_to_triples, run_kg_pipeline
from genie_ray.state import lineage


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    entities, relations = make_catalogs(n_entities=200, n_relations=30)
    world = World.build(entities, relations)
    docs = make_documents(n_docs=150, seed=42, entities=entities, relations=relations)
    root = tmp_path_factory.mktemp("kg")
    input_path = str(root / "documents.parquet")
    pq.write_table(docs, input_path)
    return world, docs, input_path, root


def read_all_triples(triples_dir):
    import glob

    files = sorted(glob.glob(os.path.join(triples_dir, "*.parquet")))
    return pa.concat_tables([pq.read_table(f) for f in files])


def test_pipeline_matches_oracle(setup):
    world, docs, input_path, root = setup
    out = str(root / "run1")
    parts, buckets = run_kg_pipeline(input_path, out, world=world, cfg=KGConfig(num_partitions=8, num_buckets=4, concurrency=2, batch_size=16))

    got = read_all_triples(os.path.join(out, "triples"))
    by_doc = {}
    for d, s, r, o in zip(
        got["doc_id"].to_pylist(),
        got["subj"].to_pylist(),
        got["pred"].to_pylist(),
        got["obj"].to_pylist(),
    ):
        by_doc.setdefault(d, set()).add((s, r, o))

    golden = oracle_extract(docs, world)
    pairs = [(by_doc.get(d, set()), t) for d, t in golden.items()]
    c = micro_metrics(pairs)
    # BASELINE.json gate: micro-P/R >= 0.95; deterministic backend → 1.0
    assert c.precision == 1.0 and c.recall == 1.0, c.as_dict()


def test_manifests_cover_every_doc(setup):
    world, docs, input_path, root = setup
    out = str(root / "run1")  # written by previous test (module-scoped)
    manifests = lineage.read_manifests(os.path.join(out, "triples"))
    assert manifests
    total_docs = sum(m["num_input_docs"] for m in manifests.values())
    golden = oracle_extract(docs, world)  # doc_id-keyed (dedups identical content)
    assert total_docs == len(golden)
    for m in manifests.values():
        assert len(m["input_content_sha256_digest"]) == 64


def test_graph_is_globally_deduped(setup):
    world, docs, input_path, root = setup
    out = str(root / "run1")
    import glob

    files = sorted(glob.glob(os.path.join(out, "graph", "*.parquet")))
    assert files
    graph = pa.concat_tables([pq.read_table(f) for f in files])
    keys = list(
        zip(
            graph["subj_id"].to_pylist(),
            graph["pred_id"].to_pylist(),
            graph["obj_id"].to_pylist(),
        )
    )
    assert len(keys) == len(set(keys))  # exact dedup
    assert all(s >= 1 for s in graph["support"].to_pylist())
    # support sums match the raw matched triple count
    raw = read_all_triples(os.path.join(out, "triples"))
    n_matched = sum(1 for m in raw["matched"].to_pylist() if m)
    assert sum(graph["support"].to_pylist()) == n_matched


def test_resume_skips_finished_and_is_identical(setup):
    world, docs, input_path, root = setup
    cfg = KGConfig(num_partitions=8, num_buckets=4, concurrency=2, batch_size=16)
    from genie_ray.state.broadcast import put_world

    world_ref = put_world(world)

    # full run (reference output)
    full_dir = str(root / "full" / "triples")
    extract_to_triples(input_path, full_dir, world_ref, cfg).materialize()

    # interrupted run: fake a partial run by deleting some partitions'
    # data+manifests from a copy
    import shutil

    part_dir = str(root / "partial" / "triples")
    shutil.copytree(full_dir, part_dir)
    removed = []
    for part in [1, 3, 5]:
        data, manifest = lineage.partition_paths(part_dir, part)
        if os.path.exists(manifest):
            os.unlink(manifest)
            os.unlink(data)
            removed.append(part)
    assert removed, "expected some partitions to exist"

    done_before = lineage.finished_partitions(part_dir)
    summary = extract_to_triples(input_path, part_dir, world_ref, cfg).to_pandas()
    # resume only processed the removed partitions
    assert set(summary["part"]) == set(removed)
    assert lineage.finished_partitions(part_dir) >= done_before | set(removed)

    # final output identical to the uninterrupted run — byte for byte
    import glob

    f_full = sorted(glob.glob(os.path.join(full_dir, "*.parquet")))
    f_part = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
    assert [os.path.basename(f) for f in f_full] == [os.path.basename(f) for f in f_part]
    for a, b in zip(f_full, f_part):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), f"{a} differs"


def test_graph_resume(setup):
    world, docs, input_path, root = setup
    cfg = KGConfig(num_partitions=8, num_buckets=4, concurrency=2, batch_size=16)
    triples_dir = str(root / "full" / "triples")  # from previous test
    g1 = str(root / "g1")
    build_graph(triples_dir, g1, cfg).materialize()
    # delete one bucket, resume, compare bytes
    import glob, shutil

    g2 = str(root / "g2")
    shutil.copytree(g1, g2)
    data, manifest = lineage.partition_paths(g2, 2, prefix="bucket")
    os.unlink(manifest)
    os.unlink(data)
    summary = build_graph(triples_dir, g2, cfg).to_pandas()
    assert set(summary["bucket"]) == {2}
    for a, b in zip(
        sorted(glob.glob(os.path.join(g1, "*.parquet"))),
        sorted(glob.glob(os.path.join(g2, "*.parquet"))),
    ):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read()


def test_partition_invariance(setup, tmp_path):
    """Same rows in 1 block vs many blocks → identical triples output
    (FIXTURES.md §6 partition-invariance)."""
    world, docs, input_path, root = setup
    from genie_ray.state.broadcast import put_world

    world_ref = put_world(world)
    # NB: concurrency must leave CPUs for the task-pool operators (read,
    # write) — extract pool + canonicalize pool + tasks > num_cpus stalls
    # the streaming executor (guide: "a pool that reserves every CPU
    # starves the read").
    cfg_a = KGConfig(num_partitions=4, num_buckets=2, concurrency=1, batch_size=256)
    cfg_b = KGConfig(num_partitions=4, num_buckets=2, concurrency=2, batch_size=7)
    da = str(tmp_path / "a")
    db = str(tmp_path / "b")
    extract_to_triples(input_path, da, world_ref, cfg_a).materialize()
    extract_to_triples(input_path, db, world_ref, cfg_b).materialize()
    ta = read_all_triples(da).sort_by([("doc_id", "ascending"), ("subj", "ascending"), ("pred", "ascending"), ("obj", "ascending")])
    tb = read_all_triples(db).sort_by([("doc_id", "ascending"), ("subj", "ascending"), ("pred", "ascending"), ("obj", "ascending")])
    assert ta.equals(tb)


def test_resume_rejects_changed_partition_count(setup):
    """A manifest written with num_partitions=8 must not silently satisfy
    a rerun with num_partitions=4 (docs would hash into 'finished' parts)."""
    world, docs, input_path, root = setup
    out = str(root / "resume_guard")
    run_kg_pipeline(input_path, out, world=world,
                    cfg=KGConfig(num_partitions=8, num_buckets=4,
                                 concurrency=2, batch_size=16))
    with pytest.raises(ValueError, match="DIFFERENT run configuration"):
        run_kg_pipeline(input_path, out, world=world,
                        cfg=KGConfig(num_partitions=4, num_buckets=4,
                                     concurrency=2, batch_size=16))


def test_resume_rejects_changed_input(setup, tmp_path):
    """Appending to the input between run and resume must fail fast."""
    world, docs, input_path, root = setup
    grown = str(tmp_path / "docs_grow.parquet")
    pq.write_table(docs.slice(0, 100), grown)
    out = str(tmp_path / "out")
    run_kg_pipeline(grown, out, world=world,
                    cfg=KGConfig(num_partitions=8, num_buckets=4,
                                 concurrency=2, batch_size=16))
    pq.write_table(docs, grown)  # input grew
    with pytest.raises(ValueError, match="DIFFERENT run configuration"):
        run_kg_pipeline(grown, out, world=world,
                        cfg=KGConfig(num_partitions=8, num_buckets=4,
                                     concurrency=2, batch_size=16))


def test_graph_buckets_invalidated_on_config_change(setup, tmp_path):
    """Stage B derives from stage A's output: a changed bucket count
    invalidates (recomputes) stale buckets instead of failing."""
    world, docs, input_path, root = setup
    out = str(tmp_path / "out")
    run_kg_pipeline(input_path, out, world=world,
                    cfg=KGConfig(num_partitions=8, num_buckets=4,
                                 concurrency=2, batch_size=16))
    g1 = pq.read_table(os.path.join(out, "graph")).sort_by(
        [("subj_id", "ascending"), ("pred_id", "ascending"), ("obj_id", "ascending")]
    )
    summary = build_graph(os.path.join(out, "triples"), os.path.join(out, "graph"),
                          cfg=KGConfig(num_partitions=8, num_buckets=2,
                                       concurrency=2, batch_size=16)).to_pandas()
    assert len(summary) == 2  # all 2 new buckets computed fresh
    g2 = pq.read_table(os.path.join(out, "graph")).sort_by(
        [("subj_id", "ascending"), ("pred_id", "ascending"), ("obj_id", "ascending")]
    )
    assert g1.select(["subj_id", "pred_id", "obj_id", "support"]).equals(
        g2.select(["subj_id", "pred_id", "obj_id", "support"])
    )


def test_worker_crash_retry_reproduces_output(setup, tmp_path):
    """Fault injection: a worker process dies (os._exit) while processing
    a batch mid-pipeline; Ray retries the task and the run completes with
    output BYTE-IDENTICAL to an uninjected run — the determinism-under-
    retries contract (SURVEY §7.4: per-doc seeds, no worker RNG state)."""
    import glob

    from genie_ray.state.broadcast import put_world

    world, docs, input_path, root = setup
    world_ref = put_world(world)
    cfg = KGConfig(num_partitions=8, num_buckets=4, concurrency=2, batch_size=16)

    clean_dir = str(tmp_path / "clean")
    extract_to_triples(input_path, clean_dir, world_ref, cfg).materialize()

    flag = str(tmp_path / "poison_fired")

    def poison(batch, flag_path=flag):
        # kill the FIRST worker process that sees a batch, exactly once
        # (flag file is cross-process); retried task finds the flag set
        if not os.path.exists(flag_path):
            try:
                with open(flag_path, "x") as f:
                    f.write("fired")
            except FileExistsError:
                return batch
            os._exit(1)  # hard worker death, no cleanup
        return batch

    from genie_ray.pipelines import kg as kgmod
    from genie_ray.sources.documents import prepare_documents, read_documents

    # same pipeline as extract_to_triples but with the poison map injected
    # after prepare (stateless task stage → Ray task retry path)
    import pyarrow.compute as _pc

    from genie_ray.stages.canonicalize import canonicalize_batch
    from genie_ray.stages.extract import ExtractTriples
    from genie_ray.stages.parse import parse_predictions_batch

    crash_dir = str(tmp_path / "crash")
    ds = read_documents(input_path, override_num_blocks=16)
    ds = prepare_documents(ds, num_partitions=cfg.num_partitions)
    ds = ds.map_batches(poison, batch_format="pyarrow")
    gens = ds.map_batches(
        ExtractTriples,
        fn_constructor_kwargs={"world_ref": world_ref},
        batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=cfg.concurrency,
    )
    triples = gens.map_batches(parse_predictions_batch, batch_format="pyarrow")
    canon = triples.map_batches(
        canonicalize_batch, fn_kwargs={"world_ref": world_ref},
        batch_format="pyarrow",
    )
    # reuse stage A's partition writer via the public pipeline: write rows
    # grouped by part exactly as extract_to_triples does
    from genie_ray.state import lineage as L

    def write_parts(batch):
        out_part, out_rows = [], []
        for part in set(batch["part"].to_pylist()):
            group = batch.filter(_pc.equal(batch["part"], part))
            data = group.filter(_pc.is_valid(group["subj"])).sort_by(
                [(c, "ascending") for c in ("doc_id", "subj", "pred", "obj")]
            )
            L.write_partition(
                data.select(
                    ["doc_id", "subj", "pred", "obj",
                     "subj_id", "pred_id", "obj_id", "matched", "match_status"]
                ),
                crash_dir, int(part),
            )
            out_part.append(int(part))
            out_rows.append(data.num_rows)
        import pyarrow as _pa

        return _pa.table({"part": _pa.array(out_part, _pa.int32()),
                          "num_rows": _pa.array(out_rows, _pa.int64())})

    canon.groupby("part").map_groups(write_parts, batch_format="pyarrow").materialize()

    assert os.path.exists(flag), "poison never fired — test is vacuous"
    f_clean = sorted(glob.glob(os.path.join(clean_dir, "*.parquet")))
    f_crash = sorted(glob.glob(os.path.join(crash_dir, "*.parquet")))
    assert [os.path.basename(f) for f in f_clean] == [
        os.path.basename(f) for f in f_crash
    ]
    for a, b in zip(f_clean, f_crash):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), f"{a} differs after crash-retry"


def test_triple_agg_vec_matches_loop_semantics():
    """The vectorized dedup partials/merge (the production path since
    bucket scheme v2) must reproduce the Python-loop pair's output
    exactly — support counts, capped sorted doc-id samples, row order —
    modulo bucket assignment (v2 hashes with polars rows, v1 with sha1;
    the union over buckets is the contract)."""
    import pandas as pd
    import pyarrow.compute as pc

    from genie_ray.stages.dedup import (
        merge_triple_partials,
        merge_triple_partials_vec,
        partial_triple_agg,
        partial_triple_agg_vec,
    )

    rows = []
    for i in range(3000):
        rows.append(
            {
                "doc_id": f"d{i % 400:03d}",
                "subj_id": f"E{(i * 7) % 50}",
                "pred_id": f"P{(i * 3) % 5}",
                "obj_id": f"E{(i * 11) % 60}" if i % 97 else None,  # null drop
            }
        )
    batch = pa.Table.from_pylist(rows)
    slices = [batch.slice(i, 700) for i in range(0, batch.num_rows, 700)]

    def run(pf, mf):
        parts = pa.concat_tables(
            [pf(s, num_buckets=8, max_doc_ids=3) for s in slices]
        )
        out = pa.concat_tables(
            [
                mf(parts.filter(pc.equal(parts["bucket"], b)), max_doc_ids=3)
                for b in pc.unique(parts["bucket"]).to_pylist()
            ]
        )
        df = out.to_pandas()
        df["doc_ids"] = df["doc_ids"].map(tuple)
        cols = ["subj_id", "pred_id", "obj_id", "support", "doc_ids"]
        return df[cols].sort_values(cols[:3]).reset_index(drop=True)

    pd.testing.assert_frame_equal(
        run(partial_triple_agg, merge_triple_partials),
        run(partial_triple_agg_vec, merge_triple_partials_vec),
    )
