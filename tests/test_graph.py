"""Graph-analytics semantics on hand-built micro graphs — complements the
oracle-parity checks in test_queries_vs_duckdb.py with cases small enough
to verify by hand (dangling mass, hop minimality, self-corruption and
false-negative removal)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from genie_ray.pipelines.graph import (
    PR_SCALE,
    entity_cooccurrence,
    entity_degrees,
    khop_reachable,
    negative_samples,
    pagerank_fixed,
)


def _write_triples(tmp_path, rows):
    """rows: list of (doc_id, subj_id, pred_id, obj_id, matched)."""
    path = os.path.join(str(tmp_path), "triples.parquet")
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(cols[0], pa.string()),
                "subj": pa.array(cols[1], pa.string()),
                "pred": pa.array(cols[2], pa.string()),
                "obj": pa.array(cols[3], pa.string()),
                "subj_id": pa.array(cols[1], pa.string()),
                "pred_id": pa.array(cols[2], pa.string()),
                "obj_id": pa.array(cols[3], pa.string()),
                "matched": pa.array(cols[4], pa.bool_()),
            }
        ),
        path,
    )
    return path


# A -> B -> C, A -> C, plus an unmatched row that must be ignored and a
# duplicate (doc2 repeats A->B) that must collapse in the distinct graph.
_CHAIN = [
    ("d1", "A", "p", "B", True),
    ("d1", "B", "p", "C", True),
    ("d1", "A", "q", "C", True),
    ("d2", "A", "p", "B", True),
    ("d2", "X", "p", "Y", False),  # unmatched: not an edge
]


def test_degrees_chain(ray_session, tmp_path):
    path = _write_triples(tmp_path, _CHAIN)
    got = (
        entity_degrees(path, num_buckets=8)
        .to_pandas()
        .set_index("ent_id")
        .sort_index()
    )
    # distinct triples: (A,p,B), (B,p,C), (A,q,C)
    assert got.loc["A", "out_degree"] == 2 and got.loc["A", "in_degree"] == 0
    assert got.loc["B", "out_degree"] == 1 and got.loc["B", "in_degree"] == 1
    assert got.loc["C", "out_degree"] == 0 and got.loc["C", "in_degree"] == 2
    assert (got["degree"] == got["out_degree"] + got["in_degree"]).all()
    assert "X" not in got.index  # unmatched rows contribute nothing


def test_pagerank_fixed_point_chain(ray_session, tmp_path):
    path = _write_triples(tmp_path, _CHAIN)
    got = (
        pagerank_fixed(path, iters=2, num_buckets=8, num_partitions=2)
        .to_pandas()
        .set_index("ent_id")["rank"]
        .sort_index()
    )
    # hand-rolled integer recurrence on edges A->B, B->C, A->C
    n = 3
    r0 = PR_SCALE // n
    base = (15 * r0) // 100
    ranks = {"A": r0, "B": r0, "C": r0}
    for _ in range(2):
        contrib = {
            "B": ranks["A"] // 2,
            "C": ranks["A"] // 2 + ranks["B"] // 1,
        }
        ranks = {v: base + (85 * contrib.get(v, 0)) // 100 for v in ranks}
    assert got.to_dict() == ranks
    # C is the sink: strictly the highest rank; A (no in-edges) the lowest
    assert ranks["C"] > ranks["B"] > ranks["A"]


def test_khop_min_distance(ray_session, tmp_path):
    # A -> B -> C and the shortcut A -> C: C must report hops=1 (min), not 2.
    # D -> E is disconnected from the seeds' component... except D sorts
    # into the seed set (3 smallest sources: A, B, D).
    rows = _CHAIN + [("d3", "D", "p", "E", True)]
    path = _write_triples(tmp_path, rows)
    got = (
        khop_reachable(path, k=3, num_seeds=3, num_buckets=8, num_partitions=2)
        .to_pandas()
        .set_index("ent_id")["hops"]
        .to_dict()
    )
    assert got == {"A": 0, "B": 0, "D": 0, "C": 1, "E": 1}


def test_khop_excludes_unreached(ray_session, tmp_path):
    # only 1 seed (A): D/E unreachable and absent from the output
    rows = _CHAIN + [("d3", "D", "p", "E", True)]
    path = _write_triples(tmp_path, rows)
    got = (
        khop_reachable(path, k=2, num_seeds=1, num_buckets=8, num_partitions=2)
        .to_pandas()
        .set_index("ent_id")["hops"]
        .to_dict()
    )
    assert got == {"A": 0, "B": 1, "C": 1}


def test_cooccurrence_pairs(ray_session, tmp_path):
    # d1 mentions {A,B,C}; d2 mentions {A,B}; pair (A,B) in 2 docs
    path = _write_triples(tmp_path, _CHAIN)
    got = entity_cooccurrence(path, num_buckets=8).to_pandas()
    got = {
        (r.ent_a, r.ent_b): r.n_docs for r in got.itertuples()
    }
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}
    assert all(a < b for a, b in got)  # canonical unordered pairs


def test_negative_samples_exclusions(ray_session, tmp_path):
    path = _write_triples(tmp_path, _CHAIN)
    got = negative_samples(
        path, per_edge=4, num_buckets=8, num_partitions=2
    ).to_pandas()
    positives = {("A", "p", "B"), ("B", "p", "C"), ("A", "q", "C")}
    for r in got.itertuples():
        corrupted = (r.subj_id, r.pred_id, r.neg_obj_id)
        assert corrupted not in positives, "false negative survived"
    # determinism: a second run yields the identical sample set
    again = negative_samples(
        path, per_edge=4, num_buckets=8, num_partitions=2
    ).to_pandas()
    key = ["subj_id", "pred_id", "neg_obj_id", "sample_i"]
    assert sorted(map(tuple, got[key].values.tolist())) == sorted(
        map(tuple, again[key].values.tolist())
    )


def test_relation_paths2_chain(ray_session, tmp_path):
    from genie_ray.pipelines.graph import relation_paths2

    # paths through B: (A,p,B)->(B,p,C); through C: (B,p,C)->(C,?,..) none;
    # (A,q,C) has no outgoing from C -> patterns: (p,p) x1, (q,?) none...
    # add (C,r,A) to create (p,r) and (q,r) patterns and a cycle.
    rows = _CHAIN + [("d3", "C", "r", "A", True)]
    path = _write_triples(tmp_path, rows)
    got = relation_paths2(path, num_buckets=8, num_partitions=2).to_pandas()
    got = {(r.pred_a, r.pred_b): r.n_paths for r in got.itertuples()}
    # edges: A-p->B, B-p->C, A-q->C, C-r->A
    # chains: (A,p,B)(B,p,C)=pp; (B,p,C)(C,r,A)=pr; (A,q,C)(C,r,A)=qr;
    # (C,r,A)(A,p,B)=rp; (C,r,A)(A,q,C)=rq
    assert got == {
        ("p", "p"): 1, ("p", "r"): 1, ("q", "r"): 1,
        ("r", "p"): 1, ("r", "q"): 1,
    }


def test_merge_graph_increment_equals_full_build(ray_session, tmp_path):
    """Incremental fold of a triple batch into an existing graph must be
    indistinguishable from rebuilding over the whole corpus — support
    counts exact, doc_ids the deterministic sorted cap."""
    import ray.data

    from genie_ray.pipelines.kg import merge_graph_increment

    rows = _CHAIN + [
        ("d3", "A", "p", "B", True),   # boosts (A,p,B) support to 3
        ("d4", "B", "p", "C", True),
        ("d5", "C", "r", "A", True),
    ]
    path = _write_triples(tmp_path, rows)
    full = ray.data.read_parquet(path)
    old = full.filter(lambda r: r["doc_id"] <= "d2")
    new = full.filter(lambda r: r["doc_id"] > "d2")

    def canon(ds):
        df = ds.to_pandas()
        df["doc_ids"] = df["doc_ids"].map(tuple)
        cols = ["subj_id", "pred_id", "obj_id", "support", "doc_ids"]
        return df[cols].sort_values(cols[:3]).reset_index(drop=True)

    full_build = merge_graph_increment(None, full, num_buckets=8, max_doc_ids=2)
    old_graph = merge_graph_increment(None, old, num_buckets=8, max_doc_ids=2)
    merged = merge_graph_increment(
        old_graph.materialize(), new, num_buckets=8, max_doc_ids=2
    )
    got, want = canon(merged), canon(full_build)
    assert got.equals(want), f"\n{got}\nvs\n{want}"
    # support is exact even where the doc_ids sample is capped at 2
    assert int(got.loc[got.subj_id.eq("A") & got.obj_id.eq("B"), "support"].iloc[0]) == 3


def test_graph_ops_empty_input(ray_session, tmp_path):
    """Zero matched triples: every graph op returns an empty result with
    a stable schema instead of crashing (pagerank's node-count division,
    khop's empty seed sort, negative sampling's empty vocabulary)."""
    from genie_ray.pipelines.graph import relation_paths2

    rows = [("d1", "X", "p", "Y", False)]  # only unmatched rows
    path = _write_triples(tmp_path, rows)
    assert pagerank_fixed(path, num_buckets=8, num_partitions=2).count() == 0
    assert khop_reachable(path, num_buckets=8, num_partitions=2).count() == 0
    assert entity_degrees(path, num_buckets=8).count() == 0
    assert entity_cooccurrence(path, num_buckets=8).count() == 0
    assert negative_samples(path, num_buckets=8, num_partitions=2).count() == 0
    assert relation_paths2(path, num_buckets=8, num_partitions=2).count() == 0


def test_skew_caps(ray_session, tmp_path):
    """The documented hot-key caps actually engage: a hub middle entity /
    an entity-dense doc is dropped (entirely, not biased-truncated) when
    the cap binds, and both ops are unchanged when it does not."""
    from genie_ray.pipelines.graph import relation_paths2

    # B is a hub: in-degree 2 (A->B twice via p,q), out-degree 2
    rows = [
        ("d1", "A", "p", "B", True),
        ("d1", "A", "q", "B", True),
        ("d1", "B", "p", "C", True),
        ("d1", "B", "q", "D", True),
        ("d2", "C", "p", "D", True),  # gives C a small mid role too
    ]
    path = _write_triples(tmp_path, rows)
    free = relation_paths2(path, num_buckets=8, num_partitions=2).to_pandas()
    capped = relation_paths2(
        path, num_buckets=8, num_partitions=2, max_mid_degree=1
    ).to_pandas()
    # B (deg 2 both sides) pruned; only paths through C (in 1 / out 1) stay
    assert free["n_paths"].sum() == 5  # 2x2 through B + 1 through C
    assert capped["n_paths"].sum() == 1
    # no-op cap returns the full result
    loose = relation_paths2(
        path, num_buckets=8, num_partitions=2, max_mid_degree=10
    ).to_pandas()
    assert loose["n_paths"].sum() == 5

    co_free = entity_cooccurrence(path, num_buckets=8).to_pandas()
    co_cap = entity_cooccurrence(
        path, num_buckets=8, max_ents_per_doc=3
    ).to_pandas()
    # d1 mentions {A,B,C,D} (4 ents > 3: dropped); d2 mentions {C,D}
    assert len(co_free) == 6  # C(4,2) pairs from d1; (C,D) merges with d2
    assert co_cap.values.tolist() == [["C", "D", 1]]


def test_cli_graph_mode(ray_session, tmp_path):
    """`python -m genie_ray.run graph` writes one partitioned-Parquet
    directory per selected analytic over a triples table."""
    import json

    from genie_ray.run import main

    path = _write_triples(tmp_path, _CHAIN)
    out = str(tmp_path / "out")
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main([
            "graph", "--triples", path, "--output", out,
            "--ops", "degrees,pagerank,paths2",
            "--num-buckets", "8", "--num-partitions", "2",
        ])
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary == {"degrees": 3, "pagerank": 3, "paths2": 1}
    import os

    assert sorted(os.listdir(out)) == ["degrees", "pagerank", "paths2"]


def test_triangle_count_micro(ray_session, tmp_path):
    from genie_ray.pipelines.graph import triangle_count

    # undirected triangles: {A,B,C} via A->B, B->C, A->C (direction
    # ignored: C->A below still closes it) + an open wedge to D + a
    # self-loop that must not count
    rows = [
        ("d1", "A", "p", "B", True),
        ("d1", "B", "p", "C", True),
        ("d1", "C", "q", "A", True),
        ("d1", "C", "p", "D", True),
        ("d1", "D", "p", "D", True),   # self-loop
        ("d2", "B", "q", "A", True),   # duplicate undirected edge A-B
    ]
    path = _write_triples(tmp_path, rows)
    out = triangle_count(path, num_buckets=8, num_partitions=2).to_pandas()
    assert out["n_triangles"].tolist() == [1]


def test_pagerank_duckdb_parity_at_scale(ray_session, tmp_path):
    """Int64 fixed-point parity holds at 30x the golden scale (larger
    contribution sums, skewed degrees): distributed 3-iter PageRank over
    20k synthetic triples is value-identical to the unrolled DuckDB CTE
    recurrence."""
    import duckdb

    from genie_ray.fixtures import write_triples_parquet
    from genie_ray.pipelines.graph import pagerank_fixed

    path = os.path.join(str(tmp_path), "t20k.parquet")
    write_triples_parquet(path, n_triples=20_000, n_entities=2_000,
                          n_docs=4_000)
    got = (
        pagerank_fixed(path, iters=3)
        .to_pandas()
        .sort_values("ent_id")
        .reset_index(drop=True)
    )
    e = ("(SELECT DISTINCT subj_id AS src, obj_id AS dst FROM "
         f"(SELECT DISTINCT subj_id, pred_id, obj_id FROM "
         f"read_parquet('{path}') WHERE matched))")
    sql = (
        f"WITH e AS {e}, "
        "nodes AS (SELECT src AS ent FROM e UNION SELECT dst FROM e), "
        "od AS (SELECT src AS ent, count(*) AS od FROM e GROUP BY 1), "
        "p AS (SELECT 1000000000000 // count(*) AS r0 FROM nodes), "
        "r0 AS (SELECT ent, (SELECT r0 FROM p) AS rank FROM nodes)"
    )
    for k in range(1, 4):
        sql += (
            f", r{k} AS (SELECT n.ent, (15 * (SELECT r0 FROM p)) // 100 "
            "+ (85 * coalesce(x.s, 0)) // 100 AS rank "
            "FROM nodes n LEFT JOIN ("
            "SELECT e.dst AS ent, sum(r.rank // o.od) AS s "
            f"FROM e JOIN r{k-1} r ON e.src = r.ent "
            "JOIN od o ON e.src = o.ent GROUP BY e.dst) x ON n.ent = x.ent)"
        )
    sql += " SELECT ent AS ent_id, rank::BIGINT AS rank FROM r3 ORDER BY ent"
    want = duckdb.sql(sql).df().reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_clustering_counts_micro(ray_session, tmp_path):
    from genie_ray.pipelines.graph import clustering_counts

    # triangle {A,B,C} + pendant D off C
    rows = [
        ("d1", "A", "p", "B", True),
        ("d1", "B", "p", "C", True),
        ("d1", "C", "q", "A", True),
        ("d1", "C", "p", "D", True),
    ]
    path = _write_triples(tmp_path, rows)
    got = (
        clustering_counts(path, num_buckets=8, num_partitions=2)
        .to_pandas()
        .set_index("ent_id")
        .sort_index()
    )
    # degrees: A=2, B=2, C=3, D=1; wedges = deg*(deg-1)/2
    assert got["n_wedges"].to_dict() == {"A": 1, "B": 1, "C": 3, "D": 0}
    # the one triangle touches A, B, C
    assert got["n_tri"].to_dict() == {"A": 1, "B": 1, "C": 1, "D": 0}


def test_triangle_degree_ordering_bounds_hub_wedges(ray_session, tmp_path):
    """Round-4 scale fix: wedges are generated from each vertex's
    HIGHER-RANK out-neighborhood (rank = (degree, id)), so a hub whose id
    sorts low no longer contributes deg² wedge candidates. The fixture is
    the adversarial case for the old canonical-id orientation: hub "E000"
    (lexicographically smallest) touches ~38% of edges.

    Asserts (a) the count is still exact vs a DuckDB oracle that knows
    nothing about orientation, and (b) the analytic wedge-table size under
    degree-ordering is >1000x smaller than under id-ordering."""
    import duckdb

    hub = "E000"
    spokes = [f"E{i:03d}" for i in range(1, 1201)]
    rows = [("d0", hub, "p", s, True) for s in spokes]
    # triangles: hub-E001-E002, hub-E003-E004 (spoke-spoke edges)
    rows += [("d1", "E001", "q", "E002", True),
             ("d1", "E003", "q", "E004", True),
             # a hub-free triangle, plus its duplicate/reversed edges
             ("d2", "E500", "q", "E501", True),
             ("d2", "E501", "q", "E502", True),
             ("d2", "E502", "q", "E500", True),
             ("d2", "E501", "p", "E500", True)]
    path = _write_triples(tmp_path, rows)

    from genie_ray.pipelines.graph import triangle_count

    got = triangle_count(path, num_buckets=8, num_partitions=4).to_pandas()
    want = duckdb.sql(
        "WITH e AS (SELECT DISTINCT least(subj_id, obj_id) u, "
        "greatest(subj_id, obj_id) v FROM "
        f"read_parquet('{path}') WHERE matched AND subj_id <> obj_id) "
        "SELECT count(*) n FROM e a JOIN e b ON a.v = b.u "
        "JOIN e c ON c.u = a.u AND c.v = b.v"
    ).df()["n"][0]
    # 6 = hub-E001-E002, hub-E003-E004, E500-E501-E502, plus the three
    # hub-E50x-E50y triangles (E50x are spokes too)
    assert got["n_triangles"].tolist() == [int(want)] == [6]

    # analytic wedge-table sizes: sum over vertices of C(outdeg, 2)
    edges = duckdb.sql(
        "SELECT DISTINCT least(subj_id, obj_id) u, "
        "greatest(subj_id, obj_id) v FROM "
        f"read_parquet('{path}') WHERE matched AND subj_id <> obj_id"
    ).df()
    deg = {}
    for a, b in zip(edges["u"], edges["v"]):
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out_id, out_rank = {}, {}
    for a, b in zip(edges["u"], edges["v"]):
        lo_id = min(a, b)
        out_id[lo_id] = out_id.get(lo_id, 0) + 1
        lo_rk = min(a, b, key=lambda x: (deg[x], x))
        out_rank[lo_rk] = out_rank.get(lo_rk, 0) + 1
    wedges_id = sum(d * (d - 1) // 2 for d in out_id.values())
    wedges_rank = sum(d * (d - 1) // 2 for d in out_rank.values())
    assert wedges_id > 700_000          # hub deg² explosion under id order
    assert wedges_rank < 700            # bounded under degree order


def test_pagerank_checkpoint_resume_bit_identical(ray_session, tmp_path):
    """Kill-after-round-k contract: a run checkpointing per round, then a
    resumed run asking for more rounds, produces ranks BIT-IDENTICAL to
    an uninterrupted run (int64 fixed-point makes this exactly
    checkable) — and the finished round checkpoints are not rewritten."""
    import pandas as pd

    from genie_ray.fixtures import write_triples_parquet
    from genie_ray.pipelines.graph import pagerank_fixed

    path = os.path.join(str(tmp_path), "t.parquet")
    write_triples_parquet(path, n_triples=5_000, n_entities=800, n_docs=1_000)
    want = (
        pagerank_fixed(path, iters=3)
        .to_pandas().sort_values("ent_id").reset_index(drop=True)
    )
    ck = os.path.join(str(tmp_path), "ck")
    # "crash" after round 2: run only 2 rounds, checkpointed
    pagerank_fixed(path, iters=2, checkpoint_dir=ck).materialize()
    m1 = os.path.join(ck, "_manifest", "round-00001.json")
    m2 = os.path.join(ck, "_manifest", "round-00002.json")
    assert os.path.exists(m1) and os.path.exists(m2)
    t1, t2 = os.path.getmtime(m1), os.path.getmtime(m2)
    got = (
        pagerank_fixed(path, iters=3, checkpoint_dir=ck)
        .to_pandas().sort_values("ent_id").reset_index(drop=True)
    )
    assert os.path.getmtime(m1) == t1 and os.path.getmtime(m2) == t2, (
        "finished rounds were recomputed on resume"
    )
    assert os.path.exists(os.path.join(ck, "_manifest", "round-00003.json"))
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_pagerank_checkpoint_survives_partial_round_write(
    ray_session, tmp_path
):
    """A crash mid-write of round k leaves a data dir with files but NO
    manifest. The resumed run must discard that partial dir (Ray's
    write_parquet APPENDs by default — without the purge the round would
    hold two copies of every row and the manifest would commit them)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from genie_ray.fixtures import write_triples_parquet
    from genie_ray.pipelines.graph import pagerank_fixed

    path = os.path.join(str(tmp_path), "t.parquet")
    write_triples_parquet(path, n_triples=5_000, n_entities=800, n_docs=1_000)
    want = (
        pagerank_fixed(path, iters=3)
        .to_pandas().sort_values("ent_id").reset_index(drop=True)
    )
    ck = os.path.join(str(tmp_path), "ck")
    pagerank_fixed(path, iters=1, checkpoint_dir=ck).materialize()
    # Fake a crash mid-write of round 2: data files present, no manifest.
    r2 = os.path.join(ck, "round-00002")
    os.makedirs(r2)
    src = next(
        os.path.join(ck, "round-00001", f)
        for f in os.listdir(os.path.join(ck, "round-00001"))
        if f.endswith(".parquet")
    )
    import shutil

    shutil.copy(src, os.path.join(r2, "partial.parquet"))
    got = (
        pagerank_fixed(path, iters=3, checkpoint_dir=ck)
        .to_pandas().sort_values("ent_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    # the committed round-2 dir must hold exactly one copy of each entity
    n_rows = sum(
        pq.read_metadata(os.path.join(r2, f)).num_rows
        for f in os.listdir(r2) if f.endswith(".parquet")
    )
    assert n_rows == len(want)


def test_pagerank_checkpoint_invalidates_on_input_change(
    ray_session, tmp_path
):
    """Checkpoints from a DIFFERENT input are deleted, not resumed —
    mixing round state across inputs would be silently wrong."""
    import pandas as pd

    from genie_ray.fixtures import write_triples_parquet
    from genie_ray.pipelines.graph import pagerank_fixed

    pa_ = os.path.join(str(tmp_path), "a.parquet")
    pb = os.path.join(str(tmp_path), "b.parquet")
    write_triples_parquet(pa_, n_triples=3_000, n_entities=500, n_docs=600)
    write_triples_parquet(pb, n_triples=3_000, n_entities=500, n_docs=600,
                          seed=7)
    ck = os.path.join(str(tmp_path), "ck")
    pagerank_fixed(pa_, iters=2, checkpoint_dir=ck).materialize()
    got = (
        pagerank_fixed(pb, iters=2, checkpoint_dir=ck)
        .to_pandas().sort_values("ent_id").reset_index(drop=True)
    )
    want = (
        pagerank_fixed(pb, iters=2)
        .to_pandas().sort_values("ent_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_graph_cli_checkpoint_resume(ray_session, tmp_path):
    """The `graph` CLI path of the checkpoint contract: rerunning the
    same command with more iters resumes from the finished rounds (their
    manifests are not rewritten), the op output dir is REPLACED not
    appended, and the result equals a cold run bit-for-bit."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from genie_ray.fixtures import write_triples_parquet
    from genie_ray.run import main as cli_main

    path = os.path.join(str(tmp_path), "t.parquet")
    write_triples_parquet(path, n_triples=5_000, n_entities=800, n_docs=1_000)

    def run(out, ck, iters):
        cli_main([
            "graph", "--triples", path, "--output", out,
            "--ops", "pagerank", "--iters", str(iters),
            "--checkpoint-dir", ck,
        ])

    def read(out):
        d = os.path.join(out, "pagerank")
        return (
            pa.concat_tables([
                pq.read_table(os.path.join(d, f))
                for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            ])
            .sort_by([("ent_id", "ascending")]).to_pandas()
        )

    cold_out = os.path.join(str(tmp_path), "cold")
    run(cold_out, os.path.join(str(tmp_path), "ck_cold"), 3)
    want = read(cold_out)

    ck = os.path.join(str(tmp_path), "ck")
    half_out = os.path.join(str(tmp_path), "half")
    run(half_out, ck, 2)
    m1 = os.path.join(ck, "pagerank", "_manifest", "round-00001.json")
    m2 = os.path.join(ck, "pagerank", "_manifest", "round-00002.json")
    t1, t2 = os.path.getmtime(m1), os.path.getmtime(m2)
    resume_out = os.path.join(str(tmp_path), "resume")
    run(resume_out, ck, 3)
    assert os.path.getmtime(m1) == t1 and os.path.getmtime(m2) == t2, (
        "CLI resume recomputed finished rounds"
    )
    pd.testing.assert_frame_equal(read(resume_out), want, check_exact=True)
    # rerun into the SAME output dir: replaced, not appended
    run(resume_out, ck, 3)
    pd.testing.assert_frame_equal(read(resume_out), want, check_exact=True)


def test_khop_checkpoint_resume_bit_identical(ray_session, tmp_path):
    import pandas as pd

    from genie_ray.fixtures import write_triples_parquet
    from genie_ray.pipelines.graph import khop_reachable

    path = os.path.join(str(tmp_path), "t.parquet")
    write_triples_parquet(path, n_triples=5_000, n_entities=800, n_docs=1_000)
    want = (
        khop_reachable(path, k=3)
        .to_pandas().sort_values("ent_id").reset_index(drop=True)
    )
    ck = os.path.join(str(tmp_path), "ck")
    khop_reachable(path, k=2, checkpoint_dir=ck).materialize()
    got = (
        khop_reachable(path, k=3, checkpoint_dir=ck)
        .to_pandas().sort_values("ent_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_pagerank_dangling_conserves_mass(ray_session, tmp_path):
    """redistribute: total rank stays ~PR_SCALE (only integer-division
    dust leaks); drop: a sink-heavy graph loses mass every round."""
    rows = [
        ("d1", "A", "p", "B", True),
        ("d1", "A", "p", "C", True),
        ("d1", "B", "p", "C", True),   # C is a sink
    ]
    path = _write_triples(tmp_path, rows)
    from genie_ray.pipelines.graph import PR_SCALE, pagerank_fixed

    drop = pagerank_fixed(path, iters=3).to_pandas()["rank"].sum()
    redist = pagerank_fixed(
        path, iters=3, dangling="redistribute"
    ).to_pandas()["rank"].sum()
    assert drop < 0.8 * PR_SCALE
    assert redist > 0.95 * PR_SCALE
