"""Graph analytics over the materialized KG triple table.

The reference stops at materializing per-document triples (its set-based
metrics imply the global graph, SURVEY.md §2.7 D5); a production KG
pipeline immediately *consumes* that graph — degree statistics for
entity-importance cuts, PageRank for ranking, k-hop neighborhoods for
subgraph retrieval, entity co-occurrence for relatedness, and negative
sampling for KG-embedding training data. Each operator here is shaped for
the 100-TB regime:

- **one partitioning key per stage** (entity id, or a hash bucket of it);
  wide steps shuffle 2^k bucket values, never range-sort the key space;
- **iterative ops (PageRank, k-hop) run a FIXED number of rounds**, each
  round = one hash join + one bounded groupby over edge-scale data — the
  standard scalable formulation (no global state, no driver collects);
- **all arithmetic is int64 fixed-point** (PageRank mass in 1e-12 units),
  so distributed summation order cannot perturb results: the DuckDB
  oracles are hash-exact, not approximately-equal.

Inputs are the canonical triples Parquet (``doc_id, subj, pred, obj,
subj_id, pred_id, obj_id, matched, match_status`` — the output of the
canonicalization stage, reference `genie_base_pl.py:406-433`); only
matched triples (both endpoints + relation resolved) form graph edges.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from genie_ray.functions.sampling import splitmix64

_TRIPLE = ["subj_id", "pred_id", "obj_id"]


# -- per-round checkpoints for the iterative ops ------------------------------
#
# At 100 TB a 20-round PageRank that dies in round 19 must not restart from
# round 0. Each round's node-scale state (ranks / BFS labels) is written as
# a distributed Parquet directory plus a manifest (manifest LAST — its
# existence is the commit point, same contract as state/lineage.py); resume
# loads the highest contiguous finished round whose manifest matches this
# run's identity (input fingerprint + op params) and iterates onward.
# Because all round arithmetic is int64 fixed-point, a resumed run is
# bit-identical to an uninterrupted one regardless of block layout.


def _ckpt_paths(ckpt_dir: str, k: int):
    import os

    return (
        os.path.join(ckpt_dir, f"round-{k:05d}"),
        os.path.join(ckpt_dir, "_manifest", f"round-{k:05d}.json"),
    )


def _ckpt_resume_round(ckpt_dir: str, meta: dict, max_round: int) -> int:
    """Highest contiguous finished round r (1-based) with a meta-matching
    manifest, 0 if none. Mismatched checkpoints (different input/params)
    are deleted — resuming across them would mix incompatible state."""
    import json
    import os
    import shutil

    mdir = os.path.join(ckpt_dir, "_manifest")
    # Purge uncommitted round data dirs (a crash mid-write leaves files but
    # no manifest; re-running must not append a second copy into them).
    if os.path.isdir(ckpt_dir):
        committed = set()
        if os.path.isdir(mdir):
            committed = {n[: -len(".json")] for n in os.listdir(mdir)
                         if n.endswith(".json")}
        for name in os.listdir(ckpt_dir):
            if name.startswith("round-") and name not in committed:
                shutil.rmtree(os.path.join(ckpt_dir, name),
                              ignore_errors=True)
    if not os.path.isdir(mdir):
        return 0
    finished = {}
    for name in os.listdir(mdir):
        if not (name.startswith("round-") and name.endswith(".json")):
            continue
        k = int(name[len("round-"):-len(".json")])
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        finished[k] = all(m.get(key) == v for key, v in meta.items())
    stale = [k for k, ok in finished.items() if not ok]
    if stale:
        import logging

        logging.getLogger(__name__).warning(
            "%s: invalidating %d stale round checkpoints (run identity "
            "changed)", ckpt_dir, len(stale),
        )
        for k in list(finished):
            data, man = _ckpt_paths(ckpt_dir, k)
            shutil.rmtree(data, ignore_errors=True)
            if os.path.exists(man):
                os.unlink(man)
        return 0
    r = 0
    while r + 1 in finished and r + 1 <= max_round:
        r += 1
    return r


def _ckpt_write_round(
    ckpt_dir: str, k: int, state: ray.data.Dataset, meta: dict
) -> ray.data.Dataset:
    """Distributed-write round ``k``'s state, commit the manifest, and
    return a Dataset READING the checkpoint (so the lineage of later
    rounds roots at the file, not at the whole upstream plan)."""
    import json
    import shutil

    from genie_ray.state.lineage import _atomic_write_bytes

    data, man = _ckpt_paths(ckpt_dir, k)
    # Ray's write_parquet defaults to APPEND: a partial dir left by a crash
    # (or a stale uncommitted one) would get a second copy appended and the
    # manifest would then commit duplicated rows. Clear first — the manifest
    # (written LAST) is the only commit point, so this is always safe.
    shutil.rmtree(data, ignore_errors=True)
    state.write_parquet(data)
    n = ray.data.read_parquet(data).count()
    _atomic_write_bytes(
        man, json.dumps({**meta, "round": k, "num_rows": n},
                        sort_keys=True).encode()
    )
    return ray.data.read_parquet(data)


def _row_bucket(t: pa.Table, cols: List[str], mask: int) -> pa.Array:
    """Deterministic hash bucket over the named columns (polars row hash —
    stable across processes, unlike Python's salted str hash)."""
    import polars as pl

    h = pl.from_arrow(t.select(cols)).hash_rows(seed=11).to_numpy()
    return pa.array((h & np.uint64(mask)).astype(np.int32), pa.int32())


def _distinct(
    ds: ray.data.Dataset, cols: List[str], num_buckets: int = 16
) -> ray.data.Dataset:
    """Distributed DISTINCT over ``cols``: batch-local Arrow ``group_by``
    collapse first (the combine), then one groupby over ``num_buckets``
    hash buckets whose merge re-collapses cross-batch duplicates — the
    repo's standard two-phase wide-step shape (same key always lands in
    the same bucket, so per-bucket distinct is globally exact)."""
    mask = num_buckets - 1  # num_buckets must be 2^k

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(cols).group_by(cols).aggregate([])
        return g.append_column("bucket", _row_bucket(g, cols, mask))

    def merge(g: pa.Table) -> pa.Table:
        return g.drop_columns(["bucket"]).group_by(cols).aggregate([])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket", num_partitions=max(1, num_buckets // 2))
        .map_groups(merge, batch_format="pyarrow")
    )


def _matched_triples(
    triples_path: str, num_partitions: int = 8
) -> ray.data.Dataset:
    """Matched canonical triples, key columns only (pruned at the read).

    Coalesced to ``num_partitions`` blocks right after the projection:
    sort/shuffle cost tracks input BLOCK count, not bytes (a single small
    parquet file arrives as 64 SplitBlocks splits — measured 5x slower
    through the first bucket groupby; same note as left_join_nulls). The
    rows at this point are three short id columns, so the move is cheap;
    at real scale callers raise ``num_partitions`` with input size."""
    ds = ray.data.read_parquet(triples_path, columns=_TRIPLE + ["matched"])
    return ds.map_batches(
        lambda t: t.filter(t["matched"]).select(_TRIPLE),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).repartition(num_partitions)


def _edges(
    triples_path: str, num_buckets: int = 16, num_partitions: int = 8
) -> ray.data.Dataset:
    """Distinct (src, dst) entity pairs — the graph's adjacency list
    (parallel edges across relations collapse; self-loops stay). Goes
    straight from matched triples to the pair distinct: a triple-level
    dedup first would be subsumed by it (one full sort saved).
    ``num_partitions`` is threaded from the public operators so the
    read-side coalesce scales with input size (callers raise both knobs
    together at corpus scale)."""
    e = _matched_triples(triples_path, num_partitions).map_batches(
        lambda t: pa.table({"src": t["subj_id"], "dst": t["obj_id"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _distinct(e, ["src", "dst"], num_buckets)


def _both_roles(ds: ray.data.Dataset, cols=("src", "dst")) -> ray.data.Dataset:
    def flat(t: pa.Table) -> pa.Table:
        ent = pa.chunked_array(
            list(t[cols[0]].chunks) + list(t[cols[1]].chunks), type=pa.string()
        )
        return pa.table({"ent": ent})

    return ds.map_batches(flat, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# degrees
# ---------------------------------------------------------------------------


def entity_degrees(
    triples_path: str, num_buckets: int = 16, num_partitions: int = 8
) -> ray.data.Dataset:
    """Per-entity in/out/total degree over the distinct-triple graph.

    One pass over the deduped edges emits (ent, out_partial, in_partial)
    batch-combined rows; the single shuffle groups 2^k hash buckets and
    each bucket merges with one Arrow ``group_by`` — a full-outer-join
    of the two role counts falls out of the union representation for
    free (an entity appearing only as object simply has no out rows)."""
    g = _distinct(
        _matched_triples(triples_path, num_partitions), _TRIPLE, num_buckets
    )
    mask = num_buckets - 1

    def partial(t: pa.Table) -> pa.Table:
        out = t.group_by("subj_id").aggregate([("subj_id", "count")])
        inn = t.group_by("obj_id").aggregate([("obj_id", "count")])
        t_out = pa.table(
            {
                "ent_id": out["subj_id"],
                "out_p": out["subj_id_count"],
                "in_p": pa.array(np.zeros(len(out), np.int64)),
            }
        )
        t_in = pa.table(
            {
                "ent_id": inn["obj_id"],
                "out_p": pa.array(np.zeros(len(inn), np.int64)),
                "in_p": inn["obj_id_count"],
            }
        )
        both = pa.concat_tables([t_out, t_in])
        return both.append_column("bucket", _row_bucket(both, ["ent_id"], mask))

    def merge(t: pa.Table) -> pa.Table:
        m = (
            t.drop_columns(["bucket"])
            .group_by("ent_id")
            .aggregate([("out_p", "sum"), ("in_p", "sum")])
            .rename_columns(["ent_id", "out_degree", "in_degree"])
        )
        return m.append_column(
            "degree", pc.add(m["out_degree"], m["in_degree"])
        )

    parts = g.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return parts.groupby("bucket", num_partitions=max(1, num_buckets // 2)).map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PageRank (fixed-point, fixed iterations)
# ---------------------------------------------------------------------------

PR_SCALE = 10**12  # rank mass in 1e-12 units — int64 arithmetic is exact


def pagerank_fixed(
    triples_path: str,
    iters: int = 3,
    num_buckets: int = 16,
    num_partitions: int = 8,
    checkpoint_dir: str | None = None,
    dangling: str = "drop",
) -> ray.data.Dataset:
    """Fixed-iteration PageRank (damping 0.85) over the entity graph.

    **Fixed-point int64**: ranks live in units of 1e-12 (``PR_SCALE``);
    every update is ``base + (85 * Σ incoming) // 100`` with incoming
    contribution ``rank // out_degree`` — pure integer ops, so the
    distributed sum is bit-identical to the single-process/SQL value
    regardless of addition order (floats would drift in the last ulp and
    break hash-exact verification).

    ``dangling``: ``"drop"`` (default — a sink's mass leaves the system,
    the documented reference semantics) or ``"redistribute"`` — each
    round the total rank of out-degree-0 nodes is re-injected uniformly
    (``+ dangling_mass // n`` inside the damped term, still exact int64;
    the ``% n`` remainder dust is dropped, documented). The per-round
    dangling mass is ONE tiny distributed aggregate over the node-scale
    rank table (which carries an ``od`` column in this mode) — no extra
    join.

    Scale shape: per iteration ONE hash join (edges ⋈ ranks on src — the
    edge list is pre-joined with out-degrees once) and ONE bucketed
    groupby-sum keyed by dst; ranks (node-scale, ≪ edges) materialize per
    round. O(iters) rounds, no driver-side state beyond the node count.
    """
    e = (
        _edges(triples_path, num_buckets, num_partitions)
        .repartition(num_partitions)
        .materialize()
    )
    nodes = _distinct(_both_roles(e), ["ent"], num_buckets).materialize()
    n = nodes.count()
    if n == 0:  # no matched edges: empty ranking, stable schema
        return ray.data.from_arrow(
            pa.table({"ent_id": pa.array([], pa.string()),
                      "rank": pa.array([], pa.int64())})
        )
    r0 = PR_SCALE // n
    base = (15 * r0) // 100
    mask = num_buckets - 1
    # clamp join partitions to data size: a join partition empty on BOTH
    # sides finalizes schema-less and Arrow rejects it (verify skill note)
    num_partitions = max(1, min(num_partitions, n // 1000 + 1))

    # out-degree, attached to each edge once (reused every iteration)
    od = e.map_batches(
        lambda t: t.group_by("src").aggregate([("src", "count")])
        .rename_columns(["src", "od_p"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def od_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", _row_bucket(t, ["src"], mask))

    def od_merge(t: pa.Table) -> pa.Table:
        return (
            t.drop_columns(["bucket"])
            .group_by("src")
            .aggregate([("od_p", "sum")])
            .rename_columns(["src", "od"])
        )

    od = (
        od.map_batches(od_bucket, batch_format="pyarrow")
        .groupby("bucket", num_partitions=max(1, num_buckets // 2))
        .map_groups(od_merge, batch_format="pyarrow")
        # coalesce: sort-based groupbys emit schema-less empty blocks for
        # empty partitions (same note as functions/dedup.py verify join)
        .repartition(num_partitions)
        # materialized: consumed by BOTH the e_od build and (in
        # redistribute mode) the od-annotated rank init — re-consuming a
        # lazy wide output is the known re-execution hazard
        .materialize()
    )
    # edges ⋈ out-degree, ONCE, via the bucketed-groupby hash join (the
    # repo's measured-fast exchange — a JoinOperator pays ~2 s/round in
    # per-partition fixed cost at this scale, bench.py sizing note). The
    # result stays keyed by jbucket = hash(src) so every round's
    # edges⋈ranks co-location reuses the same bucket assignment.
    import polars as pl

    def eod_rows(t: pa.Table) -> pa.Table:
        out = pa.table(
            {"src": t["src"], "dst": t["dst"],
             "od": pa.nulls(len(t), pa.int64())}
        )
        return out.append_column("jbucket", _row_bucket(out, ["src"], mask))

    def odj_rows(t: pa.Table) -> pa.Table:
        out = pa.table(
            {"src": t["src"], "dst": pa.nulls(len(t), pa.string()),
             "od": t["od"]}
        )
        return out.append_column("jbucket", _row_bucket(out, ["src"], mask))

    def eod_merge(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"src": pa.array([], pa.string()),
             "dst": pa.array([], pa.string()),
             "od": pa.array([], pa.int64()),
             "jbucket": pa.array([], pa.int32())}
        )
        if len(g) == 0:
            return empty
        df = pl.from_arrow(g.drop_columns(["jbucket"]))
        e_ = df.filter(pl.col("od").is_null()).select(["src", "dst"])
        o_ = df.filter(pl.col("od").is_not_null()).select(["src", "od"])
        j = e_.join(o_, on="src", how="inner").to_arrow()
        if j.num_rows == 0:
            return empty
        out = pa.table(
            {"src": j["src"].cast(pa.string()),
             "dst": j["dst"].cast(pa.string()),
             "od": j["od"].cast(pa.int64())}
        )
        return out.append_column("jbucket", _row_bucket(out, ["src"], mask))

    e_od = (
        e.map_batches(eod_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(od.map_batches(odj_rows, batch_format="pyarrow"))
        .groupby("jbucket", num_partitions=max(1, num_buckets // 2))
        .map_groups(eod_merge, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column(
                "rank", pa.nulls(len(t), pa.int64())
            ).select(["src", "dst", "od", "rank", "jbucket"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table(
            {"ent": t["ent"], "rank": pa.array(np.full(len(t), r0, np.int64))}
        )

    if dangling == "redistribute":
        # rank state carries each node's out-degree so the per-round
        # dangling mass is a filter+sum over the rank table itself
        def od_zero(t: pa.Table) -> pa.Table:
            z = pa.table(
                {"ent": t["ent"], "od_p": pa.array(np.zeros(len(t), np.int64))}
            )
            return z.append_column("bucket", _row_bucket(z, ["ent"], mask))

        def od_rows(t: pa.Table) -> pa.Table:
            z = pa.table({"ent": t["src"], "od_p": t["od"]})
            return z.append_column("bucket", _row_bucket(z, ["ent"], mask))

        def od_fold(t: pa.Table) -> pa.Table:
            m = (
                t.drop_columns(["bucket"])
                .group_by("ent")
                .aggregate([("od_p", "sum")])
            )
            return pa.table(
                {
                    "ent": m["ent"],
                    "rank": pa.array(np.full(len(m), r0, np.int64)),
                    "od": m["od_p_sum"],
                }
            )

        ranks = (
            nodes.map_batches(od_zero, batch_format="pyarrow",
                              zero_copy_batch=True)
            .union(od.map_batches(od_rows, batch_format="pyarrow"))
            .groupby("bucket", num_partitions=max(1, num_buckets // 2))
            .map_groups(od_fold, batch_format="pyarrow")
            .repartition(num_partitions)
            .materialize()
        )
    else:
        ranks = nodes.map_batches(
            init_ranks, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    def zero_rows(t: pa.Table) -> pa.Table:
        z = pa.table(
            {"ent": t["ent"], "s_p": pa.array(np.zeros(len(t), np.int64))}
        )
        if dangling == "redistribute":  # zeros carry the constant od
            z = z.append_column("od", t["od"])
        return z.append_column("bucket", _row_bucket(z, ["ent"], mask))

    zeros_src = ranks if dangling == "redistribute" else nodes
    zeros = zeros_src.map_batches(
        zero_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def contrib_join(g: pa.Table) -> pa.Table:
        """One jbucket: polars-join the bucket's edges against its ranks
        on src, emit per-dst partial contribution sums (still int64
        floor-div — bit-identical to the oracle recurrence)."""
        cols = {"ent": pa.array([], pa.string()),
                "s_p": pa.array([], pa.int64())}
        if dangling == "redistribute":
            cols["od"] = pa.array([], pa.int64())
        cols["bucket"] = pa.array([], pa.int32())
        empty = pa.table(cols)
        if len(g) == 0:
            return empty
        df = pl.from_arrow(g.drop_columns(["jbucket"]))
        edges_ = df.filter(pl.col("rank").is_null()).select(
            ["src", "dst", "od"]
        )
        rk = df.filter(pl.col("rank").is_not_null()).select(["src", "rank"])
        j = (
            edges_.join(rk, on="src", how="inner")
            .with_columns(s_p=pl.col("rank") // pl.col("od"))
            .group_by("dst")
            .agg(pl.col("s_p").sum())
            .to_arrow()
        )
        if j.num_rows == 0:
            return empty
        out = pa.table(
            {"ent": j["dst"].cast(pa.string()),
             "s_p": j["s_p"].cast(pa.int64())}
        )
        if dangling == "redistribute":  # od rides only on the zeros rows
            out = out.append_column("od", pa.nulls(len(out), pa.int64()))
        return out.append_column("bucket", _row_bucket(out, ["ent"], mask))

    def make_update(share: int):
        def update(t: pa.Table) -> pa.Table:
            aggs = [("s_p", "sum")]
            if dangling == "redistribute":
                aggs.append(("od", "max"))  # null on contrib rows, set on
            m = (                           # the per-node zeros row
                t.drop_columns(["bucket"]).group_by("ent").aggregate(aggs)
            )
            s = m["s_p_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            rank = base + (85 * (s + share)) // 100
            out = pa.table(
                {"ent": m["ent"], "rank": pa.array(rank, pa.int64())}
            )
            if dangling == "redistribute":
                out = out.append_column(
                    "od", pc.cast(m["od_max"], pa.int64())
                )
            return out

        return update

    def dangling_mass(rk: ray.data.Dataset) -> int:
        def part(t: pa.Table) -> pa.Table:
            d = t.filter(pc.equal(t["od"], 0).combine_chunks())
            s = pc.sum(d["rank"]).as_py() or 0
            return pa.table({"d": pa.array([int(s)], pa.int64())})

        return int(
            rk.map_batches(part, batch_format="pyarrow").sum("d") or 0
        )

    start = 0
    ckpt_meta = None
    if checkpoint_dir:
        from genie_ray.state.lineage import input_fingerprint

        ckpt_meta = {
            "op": "pagerank",
            "input_fingerprint": input_fingerprint(triples_path),
            "num_buckets": num_buckets,
            "arith": "int64-85/100",
            "dangling": dangling,
        }
        start = _ckpt_resume_round(checkpoint_dir, ckpt_meta, iters)
        if start:
            data, _ = _ckpt_paths(checkpoint_dir, start)
            ranks = (
                ray.data.read_parquet(data)
                .repartition(num_partitions)
                .materialize()
            )

    def rank_rows(t: pa.Table) -> pa.Table:
        out = pa.table(
            {"src": t["ent"],
             "dst": pa.nulls(len(t), pa.string()),
             "od": pa.nulls(len(t), pa.int64()),
             "rank": t["rank"]}
        )
        return out.append_column("jbucket", _row_bucket(out, ["src"], mask))

    for k in range(start + 1, iters + 1):
        share = (
            dangling_mass(ranks) // n if dangling == "redistribute" else 0
        )
        sums = (
            e_od.union(
                ranks.map_batches(rank_rows, batch_format="pyarrow")
            )
            .groupby("jbucket", num_partitions=max(1, num_buckets // 2))
            .map_groups(contrib_join, batch_format="pyarrow")
        )
        ranks = (
            sums.union(zeros)
            .groupby("bucket", num_partitions=max(1, num_buckets // 2))
            .map_groups(make_update(share), batch_format="pyarrow")
            .repartition(num_partitions)  # join input: no empty-schema blocks
            .materialize()
        )
        if checkpoint_dir:
            ranks = (
                _ckpt_write_round(checkpoint_dir, k, ranks, ckpt_meta)
                .repartition(num_partitions)
                .materialize()
            )

    return ranks.map_batches(
        lambda t: pa.table({"ent_id": t["ent"], "rank": t["rank"]}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# k-hop reachability
# ---------------------------------------------------------------------------


def khop_reachable(
    triples_path: str,
    k: int = 3,
    num_seeds: int = 3,
    num_buckets: int = 16,
    num_partitions: int = 8,
    checkpoint_dir: str | None = None,
) -> ray.data.Dataset:
    """Entities reachable within ``k`` directed hops of the seed set (the
    ``num_seeds`` lexicographically-smallest source entities — a
    deterministic stand-in for a user-provided seed list), with the
    minimum hop distance.

    Distributed BFS by label propagation: ``labels = (ent, hops)`` starts
    at the seeds with 0; each of the k rounds hash-joins edges against
    labels on src, emits (dst, hops+1), and folds with a bucketed
    groupby-MIN — one join + one bounded shuffle per round, labels
    (node-scale) materialized per round, same shape as
    ``duplicate_clusters`` (`functions/dedup.py`)."""
    e = (
        _edges(triples_path, num_buckets, num_partitions)
        .repartition(num_partitions)
        .materialize()
    )
    n_e = e.count()
    if n_e == 0:  # no matched edges: empty result, stable schema
        return ray.data.from_arrow(
            pa.table({"ent_id": pa.array([], pa.string()),
                      "hops": pa.array([], pa.int64())})
        )
    # clamp join partitions to data size (schema-less empty-partition
    # hazard — same note as pagerank_fixed)
    num_partitions = max(1, min(num_partitions, n_e // 1000 + 1))
    seeds = _distinct(e.select_columns(["src"]), ["src"], num_buckets).sort(
        "src"
    ).limit(num_seeds)
    mask = num_buckets - 1

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {"ent": t["src"], "hops": pa.array(np.zeros(len(t), np.int64))}
        )

    labels = seeds.map_batches(
        init_labels, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    import polars as pl

    # edges tagged by jbucket = hash(src), ONCE — every round's
    # edges⋈labels co-location is a bucketed groupby, not a JoinOperator
    # (same exchange swap as pagerank_fixed; ~2 s/round fixed cost saved)
    def e_rows(t: pa.Table) -> pa.Table:
        out = pa.table(
            {"src": t["src"], "dst": t["dst"],
             "hops": pa.nulls(len(t), pa.int64())}
        )
        return out.append_column("jbucket", _row_bucket(out, ["src"], mask))

    e_b = e.map_batches(
        e_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def label_rows(t: pa.Table) -> pa.Table:
        out = pa.table(
            {"src": t["ent"], "dst": pa.nulls(len(t), pa.string()),
             "hops": t["hops"]}
        )
        return out.append_column("jbucket", _row_bucket(out, ["src"], mask))

    def nbr_join(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"ent": pa.array([], pa.string()),
             "hops": pa.array([], pa.int64()),
             "bucket": pa.array([], pa.int32())}
        )
        if len(g) == 0:
            return empty
        df = pl.from_arrow(g.drop_columns(["jbucket"]))
        edges_ = df.filter(pl.col("hops").is_null()).select(["src", "dst"])
        lab = df.filter(pl.col("hops").is_not_null()).select(
            ["src", "hops"]
        )
        j = (
            edges_.join(lab, on="src", how="inner")
            .group_by("dst")
            .agg(pl.col("hops").min() + 1)
            .to_arrow()
        )
        if j.num_rows == 0:
            return empty
        out = pa.table(
            {"ent": j["dst"].cast(pa.string()),
             "hops": j["hops"].cast(pa.int64())}
        )
        return out.append_column("bucket", _row_bucket(out, ["ent"], mask))

    def bucketed(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", _row_bucket(t, ["ent"], mask))

    def fold_min(t: pa.Table) -> pa.Table:
        return (
            t.drop_columns(["bucket"])
            .group_by("ent")
            .aggregate([("hops", "min")])
            .rename_columns(["ent", "hops"])
        )

    start = 0
    ckpt_meta = None
    if checkpoint_dir:
        from genie_ray.state.lineage import input_fingerprint

        ckpt_meta = {
            "op": "khop",
            "input_fingerprint": input_fingerprint(triples_path),
            "num_buckets": num_buckets,
            "num_seeds": num_seeds,
        }
        start = _ckpt_resume_round(checkpoint_dir, ckpt_meta, k)
        if start:
            data, _ = _ckpt_paths(checkpoint_dir, start)
            labels = (
                ray.data.read_parquet(data)
                .repartition(num_partitions)
                .materialize()
            )

    for rnd in range(start + 1, k + 1):
        nbr = (
            e_b.union(
                labels.map_batches(label_rows, batch_format="pyarrow")
            )
            .groupby("jbucket", num_partitions=max(1, num_buckets // 2))
            .map_groups(nbr_join, batch_format="pyarrow")
        )
        labels = (
            labels.map_batches(bucketed, batch_format="pyarrow")
            .union(nbr)
            .groupby("bucket", num_partitions=max(1, num_buckets // 2))
            .map_groups(fold_min, batch_format="pyarrow")
            .repartition(num_partitions)  # no empty-schema blocks onward
            .materialize()
        )
        if checkpoint_dir:
            labels = (
                _ckpt_write_round(checkpoint_dir, rnd, labels, ckpt_meta)
                .repartition(num_partitions)
                .materialize()
            )

    return labels.map_batches(
        lambda t: t.rename_columns(["ent_id", "hops"]), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# document-level entity co-occurrence
# ---------------------------------------------------------------------------


def entity_cooccurrence(
    triples_path: str,
    num_buckets: int = 16,
    max_ents_per_doc: int | None = None,
) -> ray.data.Dataset:
    """Unordered entity pairs co-mentioned in the same document, with the
    number of distinct co-mentioning documents.

    Phase 1 buckets distinct (doc, entity) rows BY DOCUMENT hash, so every
    document's entity set lands whole in one bucket; inside a bucket one
    vectorized polars self-join on doc_id generates the ``ent_a < ent_b``
    pairs for all docs at once (no per-doc Python) and pre-counts them.
    Phase 2 merges the per-bucket partial counts with a second bounded
    groupby keyed by pair hash. Skew note: a document mentioning m
    entities emits m(m-1)/2 pairs — extraction bounds m (≤ beams ×
    triples per doc), which is what keeps this quadratic term constant."""
    import polars as pl

    ds = ray.data.read_parquet(
        triples_path, columns=["doc_id", "subj_id", "obj_id", "matched"]
    ).repartition(max(8, num_buckets // 4))  # small-file SplitBlocks coalesce
    mask = num_buckets - 1

    def de_partial(t: pa.Table) -> pa.Table:
        t = t.filter(t["matched"])
        de = pa.table(
            {
                "doc_id": pa.chunked_array(
                    list(t["doc_id"].chunks) * 2, type=pa.string()
                ),
                "ent": pa.chunked_array(
                    list(t["subj_id"].chunks) + list(t["obj_id"].chunks),
                    type=pa.string(),
                ),
            }
        )
        g = de.group_by(["doc_id", "ent"]).aggregate([])
        return g.append_column("bucket", _row_bucket(g, ["doc_id"], mask))

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        g = (
            t.drop_columns(["bucket"])
            .group_by(["doc_id", "ent"])
            .aggregate([])  # cross-batch re-distinct within the bucket
        )
        df = pl.from_arrow(g)
        if max_ents_per_doc is not None:
            # skew cap: an m-entity doc emits m(m-1)/2 pairs — drop docs
            # beyond the cap ENTIRELY (a truncated entity set would bias
            # which pairs survive) and log how many, same observable-
            # truncation posture as the LSH bucket caps (functions/dedup)
            sizes = df.group_by("doc_id").len()
            hot = sizes.filter(pl.col("len") > max_ents_per_doc)["doc_id"]
            if len(hot):
                import logging

                logging.getLogger(__name__).warning(
                    "entity_cooccurrence: dropping %d docs over the "
                    "max_ents_per_doc=%d cap", len(hot), max_ents_per_doc,
                )
                df = df.filter(~pl.col("doc_id").is_in(hot))
        pairs = (
            df.join(df, on="doc_id", suffix="_b")
            .filter(pl.col("ent") < pl.col("ent_b"))
            .group_by(["ent", "ent_b"])
            .len()
            .rename({"ent": "ent_a", "ent_b": "ent_b", "len": "n_p"})
        )
        out = pairs.to_arrow()
        out = pa.table(
            {
                "ent_a": out["ent_a"].cast(pa.string()),
                "ent_b": out["ent_b"].cast(pa.string()),
                "n_p": out["n_p"].cast(pa.int64()),
            }
        )
        return out.append_column(
            "bucket2", _row_bucket(out, ["ent_a", "ent_b"], mask)
        )

    def merge(t: pa.Table) -> pa.Table:
        return (
            t.drop_columns(["bucket2"])
            .group_by(["ent_a", "ent_b"])
            .aggregate([("n_p", "sum")])
            .rename_columns(["ent_a", "ent_b", "n_docs"])
        )

    return (
        ds.map_batches(de_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket", num_partitions=max(1, num_buckets // 2))
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
        .groupby("bucket2", num_partitions=max(1, num_buckets // 2))
        .map_groups(merge, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# negative sampling (KG-embedding training data)
# ---------------------------------------------------------------------------


def negative_samples(
    triples_path: str,
    per_edge: int = 2,
    num_buckets: int = 16,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Deterministic object-corruption negatives: for each distinct
    positive triple (s, p, o) and sample index i < ``per_edge``, replace o
    with ``ents[splitmix64(sidx·1000003 + oidx·101 + i) mod |ents|]``
    (``ents`` = the sorted entity vocabulary, ``sidx/oidx`` = positions in
    it), then drop self-corruptions (o' = o) and **false negatives** —
    corrupted triples that happen to be true — via a distributed
    anti-join against the positive set. Seedless and partition-invariant:
    the hash depends only on triple content, so retries/reshards
    reproduce identical samples (same contract as ``split_assign``).

    The sorted entity vocabulary is the canonical *small side* (the
    entity catalog — the same broadcast assumption as J1/J2
    canonicalization, `genie_base_pl.py:406-410`): it ships to tasks once
    via the closure/object store, and index lookup is one vectorized
    ``pc.index_in`` per batch. If the vocabulary ever outgrew broadcast,
    sidx/oidx would come from two hash joins against an indexed entity
    table instead (the ``canonicalize_via_join`` path)."""
    g = (
        _distinct(
            _matched_triples(triples_path, num_partitions), _TRIPLE, num_buckets
        )
        .repartition(num_partitions)
        .materialize()
    )
    if g.count() == 0:  # no positives: empty result, stable schema
        return ray.data.from_arrow(
            pa.table({"subj_id": pa.array([], pa.string()),
                      "pred_id": pa.array([], pa.string()),
                      "neg_obj_id": pa.array([], pa.string()),
                      "sample_i": pa.array([], pa.int64())})
        )
    ents_tab = _distinct(
        _both_roles(g, cols=("subj_id", "obj_id")), ["ent"], num_buckets
    ).to_pandas()
    ents = np.sort(ents_tab["ent"].to_numpy())  # row_number() ORDER BY ent parity
    n_ents = np.uint64(len(ents))
    ents_pa = pa.array(ents, pa.string())

    def gen(t: pa.Table) -> pa.Table:
        sidx = pc.index_in(t["subj_id"], ents_pa).cast(pa.uint64()).to_numpy(
            zero_copy_only=False
        )
        oidx = pc.index_in(t["obj_id"], ents_pa).cast(pa.uint64()).to_numpy(
            zero_copy_only=False
        )
        outs = []
        for i in range(per_edge):
            key = sidx * np.uint64(1000003) + oidx * np.uint64(101) + np.uint64(i)
            nidx = (splitmix64(key) % n_ents).astype(np.int64)
            neg = ents[nidx]
            keep = neg != t["obj_id"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            outs.append(
                pa.table(
                    {
                        "subj_id": t["subj_id"].combine_chunks().filter(
                            pa.array(keep)
                        ),
                        "pred_id": t["pred_id"].combine_chunks().filter(
                            pa.array(keep)
                        ),
                        "neg_obj_id": pa.array(neg[keep], pa.string()),
                        "sample_i": pa.array(
                            np.full(int(keep.sum()), i, np.int64)
                        ),
                    }
                )
            )
        return pa.concat_tables(outs)

    cands = g.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)

    # anti-join: drop corrupted triples that are actually true positives.
    # The 3-column key rides as one composite string (US-separator — ids
    # never contain control bytes) through the shared bucketed
    # membership exchange (stages/exchange.py) instead of a left_outer
    # JoinOperator + null filter.
    _SEP = "\x1f"

    def cand_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "nkey",
            pc.binary_join_element_wise(
                t["subj_id"], t["pred_id"], t["neg_obj_id"], _SEP
            ),
        )

    def pos_key(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "nkey": pc.binary_join_element_wise(
                    t["subj_id"], t["pred_id"], t["obj_id"], _SEP
                )
            }
        )

    from ..stages.exchange import bucketed_membership_join

    nb = 1 << max(2, (num_partitions - 1).bit_length())  # next 2^k
    kept = bucketed_membership_join(
        cands.map_batches(
            cand_key, batch_format="pyarrow", zero_copy_batch=True
        ),
        g.map_batches(pos_key, batch_format="pyarrow", zero_copy_batch=True),
        "nkey",
        "nkey",
        how="anti",
        num_buckets=nb,
    )
    return kept.map_batches(
        lambda t: t.select(
            ["subj_id", "pred_id", "neg_obj_id", "sample_i"]
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# 2-hop relation path patterns
# ---------------------------------------------------------------------------


def relation_paths2(
    triples_path: str,
    num_buckets: int = 16,
    num_partitions: int = 8,
    max_mid_degree: int | None = None,
) -> ray.data.Dataset:
    """Counts of 2-hop relation path patterns: for every pair of distinct
    matched triples (s, p1, m) and (m, p2, o) chained through a middle
    entity, one path instance grouped by (p1, p2) — the classic KG
    pattern-mining primitive (association-rule / meta-path statistics).

    One hash join of the distinct triple set against itself on the
    middle-entity key, then batch-local Arrow ``group_by`` partials over
    the (pred_a, pred_b) pairs (relation-pair cardinality is tiny —
    |relations|², so partials collapse almost completely before the final
    bucketed merge). Skew note: a hub entity with in-degree i and
    out-degree o contributes i·o join rows — at corpus scale, cap or
    sample hub middles before the join (same hot-bucket treatment as the
    LSH candidate caps in functions/dedup.py) and log the truncation."""
    g = (
        _distinct(_matched_triples(triples_path, num_partitions), _TRIPLE,
                  num_buckets)
        .repartition(num_partitions)
        .materialize()
    )
    n_g = g.count()
    if n_g == 0:  # no matched triples: empty result, stable schema
        return ray.data.from_arrow(
            pa.table({"pred_a": pa.array([], pa.string()),
                      "pred_b": pa.array([], pa.string()),
                      "n_paths": pa.array([], pa.int64())})
        )
    # a join partition with zero rows on both sides finalizes schema-less
    # and Arrow rejects it — never run more partitions than the data can
    # plausibly fill (g is materialized: the count is free)
    num_partitions = max(1, min(num_partitions, n_g // 1000 + 1))
    a = g.map_batches(
        lambda t: pa.table({"mid": t["obj_id"], "pred_a": t["pred_id"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    b = g.map_batches(
        lambda t: pa.table({"mid": t["subj_id"], "pred_b": t["pred_id"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if max_mid_degree is not None:
        # hub cap: a middle entity with in-degree i and out-degree o emits
        # i·o join rows — drop mids over the cap on EITHER side (dropping
        # one side only would keep a biased subset of its paths) and log
        # the count, same observable-truncation posture as the LSH bucket
        # caps. Hub degrees come from entity_degrees over the SAME triple
        # table (one extra pass over g — never a re-consumption of the
        # join inputs). The degree table itself is NODE-scale, so the
        # cap filter runs distributed and only the surviving hub ids —
        # a handful by definition — are driver-collected and broadcast
        # into the projection filters.
        def hub_filter(t: pa.Table) -> pa.Table:
            keep = pc.or_(
                pc.greater(t["in_degree"], max_mid_degree),
                pc.greater(t["out_degree"], max_mid_degree),
            )
            return t.filter(keep).select(["ent_id"])

        hot_df = (
            entity_degrees(triples_path, num_buckets=num_buckets)
            .map_batches(hub_filter, batch_format="pyarrow",
                         zero_copy_batch=True)
            .to_pandas()
        )
        # an all-empty filtered dataset loses its schema in to_pandas
        if "ent_id" not in hot_df.columns:
            hot_df = hot_df.reindex(columns=["ent_id"])
        hot = hot_df["ent_id"]
        if len(hot):
            import logging

            logging.getLogger(__name__).warning(
                "relation_paths2: dropping %d hub mids over "
                "max_mid_degree=%d", len(hot), max_mid_degree,
            )
            hot_arr = pa.array(hot.to_numpy(), pa.string())

            # prune INSIDE the projections over the clean materialized g
            # (a standalone filter stage after the projection maps would
            # forward schema-less empty bundles into Arrow's hash join)
            def project_prune(role_col, pred_name):
                def f(t: pa.Table) -> pa.Table:
                    p = pa.table(
                        {"mid": t[role_col], pred_name: t["pred_id"]}
                    )
                    return p.filter(
                        pc.invert(pc.is_in(p["mid"], value_set=hot_arr))
                    )

                return f

            a = g.map_batches(
                project_prune("obj_id", "pred_a"), batch_format="pyarrow"
            )
            b = g.map_batches(
                project_prune("subj_id", "pred_b"), batch_format="pyarrow"
            )
    # mid-entity self-join THROUGH the bucketed-groupby exchange, with
    # the (pred_a, pred_b) count partial fused INSIDE the bucket kernel:
    # the i·o join product never materializes as rows — each bucket
    # emits at most |relations|² partial counts (JoinOperator version
    # paid ~2 s fixed cost AND shipped every path instance)
    import polars as pl

    mask = num_buckets - 1

    def a_rows(t: pa.Table) -> pa.Table:
        out = pa.table(
            {"mid": t["mid"], "pred_a": t["pred_a"],
             "pred_b": pa.nulls(len(t), pa.string())}
        )
        return out.append_column("jbucket", _row_bucket(out, ["mid"], mask))

    def b_rows(t: pa.Table) -> pa.Table:
        out = pa.table(
            {"mid": t["mid"], "pred_a": pa.nulls(len(t), pa.string()),
             "pred_b": t["pred_b"]}
        )
        return out.append_column("jbucket", _row_bucket(out, ["mid"], mask))

    def join_count(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"pred_a": pa.array([], pa.string()),
             "pred_b": pa.array([], pa.string()),
             "n_p": pa.array([], pa.int64()),
             "bucket": pa.array([], pa.int32())}
        )
        if len(g) == 0:
            return empty
        df = pl.from_arrow(g.drop_columns(["jbucket"]))
        a_ = df.filter(pl.col("pred_a").is_not_null()).select(
            ["mid", "pred_a"]
        )
        b_ = df.filter(pl.col("pred_b").is_not_null()).select(
            ["mid", "pred_b"]
        )
        j = (
            a_.join(b_, on="mid", how="inner")
            .group_by(["pred_a", "pred_b"])
            .len(name="n_p")
            .to_arrow()
        )
        if j.num_rows == 0:
            return empty
        out = pa.table(
            {"pred_a": j["pred_a"].cast(pa.string()),
             "pred_b": j["pred_b"].cast(pa.string()),
             "n_p": j["n_p"].cast(pa.int64())}
        )
        return out.append_column(
            "bucket", _row_bucket(out, ["pred_a", "pred_b"], mask)
        )

    def merge(t: pa.Table) -> pa.Table:
        return (
            t.drop_columns(["bucket"])
            .group_by(["pred_a", "pred_b"])
            .aggregate([("n_p", "sum")])
            .rename_columns(["pred_a", "pred_b", "n_paths"])
        )

    return (
        a.map_batches(a_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            b.map_batches(
                b_rows, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("jbucket", num_partitions=max(1, num_buckets // 2))
        .map_groups(join_count, batch_format="pyarrow")
        .groupby("bucket", num_partitions=max(1, num_buckets // 2))
        .map_groups(merge, batch_format="pyarrow")
    )




def _undirected_edges(
    triples_path: str, num_buckets: int, num_partitions: int
):
    """Canonical (u < v) undirected distinct edges — self-loops dropped,
    directions collapsed with element-wise min/max. Returns a
    materialized Dataset, or None for an empty graph."""
    e = (
        _edges(triples_path, num_buckets, num_partitions)
        .repartition(num_partitions)
        .materialize()
    )
    n_e = e.count()
    if n_e == 0:
        return None

    def undirect(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.not_equal(t["src"], t["dst"]))
        return pa.table(
            {
                "u": pc.min_element_wise(keep["src"], keep["dst"]),
                "v": pc.max_element_wise(keep["src"], keep["dst"]),
            }
        )

    return (
        _distinct(e.map_batches(undirect, batch_format="pyarrow",
                                zero_copy_batch=True), ["u", "v"], num_buckets)
        .repartition(max(1, min(num_partitions, n_e // 1000 + 1)))
        .materialize()
    )


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------




def _degrees_over(u: ray.data.Dataset, num_buckets: int) -> ray.data.Dataset:
    """(ent, deg) undirected degree over canonical distinct edges ``u`` —
    the bucketed two-phase count (per-batch Arrow combine, one 2^k-bucket
    shuffle, per-bucket merge)."""
    mask = num_buckets - 1

    def partial(t: pa.Table) -> pa.Table:
        ent = pa.chunked_array(
            list(t["u"].chunks) + list(t["v"].chunks), type=pa.string()
        )
        p = (
            pa.table({"ent": ent})
            .group_by("ent")
            .aggregate([("ent", "count")])
            .rename_columns(["ent", "deg_p"])
        )
        return p.append_column("bucket", _row_bucket(p, ["ent"], mask))

    def merge(t: pa.Table) -> pa.Table:
        return (
            t.drop_columns(["bucket"])
            .group_by("ent")
            .aggregate([("deg_p", "sum")])
            .rename_columns(["ent", "deg"])
        )

    return (
        u.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket", num_partitions=max(1, num_buckets // 2))
        .map_groups(merge, batch_format="pyarrow")
    )


def _closed_triangles(
    triples_path: str, num_buckets: int, num_partitions: int
):
    """Shared core of :func:`triangle_count` / :func:`clustering_counts`:
    the set of triangles in the undirected entity graph, one row each,
    found by DEGREE-ORDERED wedge closing (compact-forward / Latapy 2008;
    cf. Suri & Vassilvitskii, "Counting Triangles and the Curse of the
    Last Reducer", WWW'11 — public algorithms literature).

    Every undirected edge is oriented from its lower- to higher-RANK
    endpoint, rank = (degree, ent id) — a total order because ids are
    unique. Wedges are generated only from a vertex's higher-rank
    out-neighborhood, so out-deg ≤ O(√E) on ANY graph (a hub of degree d
    has at most ~√E neighbors of even-higher rank): the wedge table is
    bounded by O(E^1.5) instead of Σ deg(apex)² — the difference between
    hours and an explosion on a power-law KG where the round-3
    canonical-id orientation could hand a low-id hub its full deg².

    Each triangle {x,y,z} with rank(x)<rank(y)<rank(z) is produced
    exactly once: oriented edges are x→y, x→z, y→z, so the only wedge is
    (apex=x, y, z) and it closes against oriented edge y→z.

    Execution shape: NO JoinOperators — every co-location (degree
    attach ×2, wedge self-join, wedge-edge closing) is the repo's
    bucketed-groupby hash join (bucket both sides by key hash, one
    polars join per bucket), which at 200k edges runs ~2s per exchange
    where a JoinOperator pays ~2s in per-partition fixed cost alone
    (measured note at bench.py graph sizing). Five bounded exchanges
    total, all keyed by entity / pair hash.

    Returns ``(u, deg, closed)``: the canonical undirected edge Dataset,
    the (ent, deg) Dataset, and the closed-triangle Dataset with columns
    (apex, a, b) = the min-rank / mid-rank / max-rank vertices — or
    ``(None, None, None)`` on an empty graph.
    """
    import polars as pl

    u = _undirected_edges(triples_path, num_buckets, num_partitions)
    if u is None:
        return None, None, None
    mask = num_buckets - 1
    nparts = max(1, num_buckets // 2)
    deg = _degrees_over(u, num_buckets).materialize()

    def attach(edges, key_col, payload, deg_name):
        """Bucketed hash join: edges gain column ``deg_name`` = degree of
        endpoint ``key_col``. ``payload`` maps the OTHER columns to their
        Arrow types (for typed nulls on the degree-side union rows)."""

        def edge_rows(t: pa.Table) -> pa.Table:
            cols = {"key": t[key_col]}
            for c in payload:
                cols[c] = t[c]
            cols[deg_name] = pa.nulls(len(t), pa.int64())
            out = pa.table(cols)
            return out.append_column("bucket", _row_bucket(out, ["key"], mask))

        def deg_rows(t: pa.Table) -> pa.Table:
            cols = {"key": t["ent"]}
            for c, typ in payload.items():
                cols[c] = pa.nulls(len(t), typ)
            cols[deg_name] = t["deg"]
            out = pa.table(cols)
            return out.append_column("bucket", _row_bucket(out, ["key"], mask))

        def merge(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {key_col: pa.array([], pa.string()),
                     **{c: pa.array([], typ) for c, typ in payload.items()},
                     deg_name: pa.array([], pa.int64())}
                )
            df = pl.from_arrow(t.drop_columns(["bucket"]))
            e = df.filter(pl.col(deg_name).is_null()).drop(deg_name)
            d = df.filter(pl.col(deg_name).is_not_null()).select(
                ["key", deg_name]
            )
            j = e.join(d, on="key", how="inner").rename({"key": key_col})
            out = j.to_arrow()
            return pa.table(
                {key_col: out[key_col].cast(pa.string()),
                 **{c: out[c].cast(typ) for c, typ in payload.items()},
                 deg_name: out[deg_name].cast(pa.int64())}
            )

        both = edges.map_batches(
            edge_rows, batch_format="pyarrow", zero_copy_batch=True
        ).union(
            deg.map_batches(
                deg_rows, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        return both.groupby("bucket", num_partitions=nparts).map_groups(
            merge, batch_format="pyarrow"
        )

    e_du = attach(u, "u", {"v": pa.string()}, "deg_u")
    e_dd = attach(
        e_du, "v", {"u": pa.string(), "deg_u": pa.int64()}, "deg_v"
    )

    def orient(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "deg_b": pa.array([], pa.int64())})
        lo_first = pc.or_(
            pc.less(t["deg_u"], t["deg_v"]),
            pc.and_(
                pc.equal(t["deg_u"], t["deg_v"]), pc.less(t["u"], t["v"])
            ),
        )
        out = pa.table(
            {
                "a": pc.if_else(lo_first, t["u"], t["v"]),
                "b": pc.if_else(lo_first, t["v"], t["u"]),
                "deg_b": pc.if_else(lo_first, t["deg_v"], t["deg_u"]),
            }
        )
        return out.append_column("bucket", _row_bucket(out, ["a"], mask))

    oriented = e_dd.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    _WEDGE_EMPTY = pa.table(
        {"apex": pa.array([], pa.string()), "a": pa.array([], pa.string()),
         "b": pa.array([], pa.string()), "bucket2": pa.array([], pa.int32())}
    )

    def wedges_in_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _WEDGE_EMPTY
        df = pl.from_arrow(t.drop_columns(["bucket"]))
        w = df.join(df, on="a", suffix="_2").filter(
            (pl.col("deg_b") < pl.col("deg_b_2"))
            | ((pl.col("deg_b") == pl.col("deg_b_2"))
               & (pl.col("b") < pl.col("b_2")))
        )
        out = w.to_arrow()
        out = pa.table(
            {"apex": out["a"].cast(pa.string()),
             "a": out["b"].cast(pa.string()),
             "b": out["b_2"].cast(pa.string())}
        )
        return out.append_column(
            "bucket2", _row_bucket(out, ["a", "b"], mask)
        )

    wedges = oriented.groupby("bucket", num_partitions=nparts).map_groups(
        wedges_in_bucket, batch_format="pyarrow"
    )

    def edge_markers(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _WEDGE_EMPTY
        out = pa.table(
            {"apex": pa.nulls(len(t), pa.string()),
             "a": t["a"], "b": t["b"]}
        )
        return out.append_column(
            "bucket2", _row_bucket(out, ["a", "b"], mask)
        )

    def close_in_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"apex": pa.array([], pa.string()),
                 "a": pa.array([], pa.string()),
                 "b": pa.array([], pa.string())}
            )
        df = pl.from_arrow(t.drop_columns(["bucket2"]))
        w = df.filter(pl.col("apex").is_not_null())
        e = df.filter(pl.col("apex").is_null()).select(["a", "b"])
        out = w.join(e, on=["a", "b"], how="semi").to_arrow()
        return pa.table(
            {"apex": out["apex"].cast(pa.string()),
             "a": out["a"].cast(pa.string()),
             "b": out["b"].cast(pa.string())}
        )

    closed = (
        wedges.union(
            oriented.map_batches(
                edge_markers, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("bucket2", num_partitions=nparts)
        .map_groups(close_in_bucket, batch_format="pyarrow")
    )
    return u, deg, closed


def triangle_count(
    triples_path: str,
    num_buckets: int = 16,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Number of triangles in the UNDIRECTED entity graph (distinct
    edges, directions collapsed with element-wise min/max, self-loops
    dropped). Output: one row, ``n_triangles`` int64.

    Degree-ordered wedge closing (see :func:`_closed_triangles`): two
    vertex-scale degree joins + two edge-scale hash joins + one count,
    with the wedge table bounded at O(E^1.5) on any degree distribution.
    """
    _, _, closed = _closed_triangles(triples_path, num_buckets, num_partitions)
    if closed is None:
        return ray.data.from_arrow(
            pa.table({"n_triangles": pa.array([0], pa.int64())})
        )
    n = closed.count()
    return ray.data.from_arrow(
        pa.table({"n_triangles": pa.array([n], pa.int64())})
    )


def clustering_counts(
    triples_path: str,
    num_buckets: int = 16,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Per-entity triangle and wedge counts over the undirected graph —
    the integer numerators/denominators of the local clustering
    coefficient (2·n_tri / (deg·(deg−1))); counts stay int64 so the
    result is hash-exact (the float ratio is one vectorized division away
    for the consumer). Output: (ent_id, n_tri, n_wedges).

    Triangles come from the degree-ordered closing in
    :func:`_closed_triangles` (each discovered exactly once, apex =
    min-RANK vertex) and attribute to all three corners; wedge
    denominators are deg·(deg−1)/2 from the shared degree table — exact
    integer since one of two consecutive ints is even. One role-union +
    bucketed groupby merges the two partial families, degrees-style."""
    u, deg, closed = _closed_triangles(
        triples_path, num_buckets, num_partitions
    )
    if closed is None:
        return ray.data.from_arrow(
            pa.table({"ent_id": pa.array([], pa.string()),
                      "n_tri": pa.array([], pa.int64()),
                      "n_wedges": pa.array([], pa.int64())})
        )
    mask = num_buckets - 1
    _empty_partial = pa.table(
        {
            "ent_id": pa.array([], pa.string()),
            "tri_p": pa.array([], pa.int64()),
            "wedge_p": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.int32()),
        }
    )

    def tri_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:  # joins emit schema-less empty blocks
            return _empty_partial
        ent = pa.chunked_array(
            list(t["apex"].chunks) + list(t["a"].chunks) + list(t["b"].chunks),
            type=pa.string(),
        )
        p = (
            pa.table({"ent_id": ent})
            .group_by("ent_id")
            .aggregate([("ent_id", "count")])
        )
        out = pa.table(
            {
                "ent_id": p["ent_id"],
                "tri_p": p["ent_id_count"],
                "wedge_p": pa.array(np.zeros(len(p), np.int64)),
            }
        )
        return out.append_column("bucket", _row_bucket(out, ["ent_id"], mask))

    def deg_wedges(t: pa.Table) -> pa.Table:
        d = t["deg"].combine_chunks().to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                "ent_id": t["ent"],
                "tri_p": pa.array(np.zeros(len(t), np.int64)),
                "wedge_p": pa.array(d * (d - 1) // 2, pa.int64()),
            }
        )
        return out.append_column("bucket", _row_bucket(out, ["ent_id"], mask))

    tri = closed.map_batches(tri_partial, batch_format="pyarrow")
    wed = deg.map_batches(deg_wedges, batch_format="pyarrow")

    def merge(t: pa.Table) -> pa.Table:
        return (
            t.drop_columns(["bucket"])
            .group_by("ent_id")
            .aggregate([("tri_p", "sum"), ("wedge_p", "sum")])
            .rename_columns(["ent_id", "n_tri", "n_wedges"])
        )

    return (
        tri.union(wed)
        .groupby("bucket", num_partitions=max(1, num_buckets // 2))
        .map_groups(merge, batch_format="pyarrow")
    )

