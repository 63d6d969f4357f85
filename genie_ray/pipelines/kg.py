"""Flagship KG-construction pipeline, Ray-Data-first.

End-to-end re-expression of the reference's evaluate entry point
(`/root/reference/genie/evaluate.py` + `genie_base_pl.py:194-297`) as a
streaming Dataset pipeline (SURVEY.md §7.1 steps 3-6):

    read_parquet(documents)                      # streaming, pruned
    → prepare (doc_id=sha256(content), part)     # stateless Arrow map
    → [skew split: long-content branch]          # explicit skew routing
    → ExtractTriples actor pool                  # state loaded once/actor
    → parse linearizations                       # stateless Arrow map
    → canonicalize (broadcast catalogs)          # map-side join, no shuffle
    → groupby(part).map_groups(atomic write)     # per-partition lineage
    then
    build_graph: read triples → partial agg → groupby(bucket) → sorted
    per-bucket graph Parquet with manifests (exact global dedup D5).

Both stages are resumable: finished partitions/buckets (manifest exists)
are filtered out of the INPUT with a vectorized hash filter, so a rerun
only pays for unfinished work.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..sources.documents import prepare_documents, read_documents
from ..stages.canonicalize import canonicalize_batch
from ..stages.dedup import (
    bucket_hash_probe,
    merge_triple_partials_vec,
    partial_triple_agg_vec,
)
from ..stages.extract import ExtractTriples, extract_triples_task
from ..stages.parse import parse_predictions_batch
from ..state import lineage
from ..state.broadcast import put_world


@dataclass
class KGConfig:
    """Sizing note: ``concurrency`` (extract pool) + ``concurrency // 2``
    (canonicalize pool) must leave CPUs free for the task-pool operators
    (read, partition write) or the streaming executor starves — size the
    pools to ~2/3 of the node, not all of it."""

    num_partitions: int = 16
    num_buckets: int = 8
    batch_size: int = 64
    concurrency: int = 4
    max_doc_ids: int = 20
    num_beams: int = 10
    resume: bool = True
    # "scan" = fast direct extraction; "beam" = full constrained beam
    # search (reference decode-loop compute shape), identical top-1 output
    decode_mode: str = "scan"
    # "deterministic" (conformance) | "hf" (real BART weights; requires
    # torch+transformers and a checkpoint path)
    backend: str = "deterministic"
    checkpoint_path: str = ""


def _filter_parts(ds: ray.data.Dataset, done: set) -> ray.data.Dataset:
    if not done:
        return ds
    done_arr = pa.array(sorted(done), pa.int32())
    return ds.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t["part"], value_set=done_arr))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def extract_to_triples(
    input_path: str,
    triples_dir: str,
    world_ref,
    cfg: Optional[KGConfig] = None,
) -> ray.data.Dataset:
    """Stage A (resumable): documents → canonical triples, one Parquet +
    manifest per doc-hash partition. Returns the small per-partition
    summary Dataset."""
    cfg = cfg or KGConfig()
    # resume gate: a manifest only counts as finished if it was written by
    # an equivalent run — same partition count AND same input (fingerprint
    # of the file listing). A changed --num-partitions or an appended input
    # otherwise silently drops documents hashing into "finished" parts.
    input_fp = lineage.input_fingerprint(input_path)
    run_meta = {
        "num_partitions": cfg.num_partitions,
        "input_fingerprint": input_fp,
    }
    done = (
        lineage.validated_finished_partitions(triples_dir, run_meta)
        if cfg.resume
        else set()
    )

    # enough read tasks to feed the extract pool (capped by the file's
    # row-group count; harmless when the input already has many files)
    # ~8 tasks per extract actor: fine enough that the last wave's
    # quantization loss is small, coarse enough that per-task overhead
    # stays negligible
    ds = read_documents(
        input_path,
        override_num_blocks=max(cfg.concurrency * 8, cfg.num_partitions),
    )
    ds = prepare_documents(ds, num_partitions=cfg.num_partitions)
    ds = _filter_parts(ds, done)

    # explicit skew handling (north rule): cluster rows by content length
    # within each block so a 500KB document lands in a batch of its peers
    # instead of straggling a batch of 64 short rows; extraction cost is
    # ~linear in chars, so length-homogeneous batches equalize batch wall
    # time and the streaming executor pipelines them. Single pass — a
    # predicate-split into two branch Datasets would re-execute the read
    # for each branch.
    ds = ds.map_batches(
        lambda t: t.sort_by("n_chars"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    extract_kwargs = {
        "world_ref": world_ref,
        "num_beams": cfg.num_beams,
        "decode_mode": cfg.decode_mode,
        "backend": cfg.backend,
        "checkpoint_path": cfg.checkpoint_path,
    }
    if cfg.decode_mode == "scan" and cfg.backend == "deterministic":
        # cheap decode: stateless cached-task map (extractor built once
        # per worker process) fuses with the read/sort maps and pays no
        # actor-pool spin-up per run — the pool start alone cost ~1-2 s
        # of a ~2.5 s warm pipeline at sf0.1
        gens = ds.map_batches(
            extract_triples_task,
            fn_kwargs=extract_kwargs,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
    else:
        gens = ds.map_batches(
            ExtractTriples,
            fn_constructor_kwargs=extract_kwargs,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            # fixed pool: this stage is ~95% of the compute; a (1, N)
            # autoscale ramp costs seconds. With the downstream stages
            # stateless, the remaining CPUs serve the sort/write tasks.
            concurrency=cfg.concurrency,
        )

    triples = gens.map_batches(
        parse_predictions_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    # stateless tasks (per-process dict cache) — fuses with the parse map
    # and never reserves CPUs the way a second actor pool would
    canon = triples.map_batches(
        canonicalize_batch,
        fn_kwargs={"world_ref": world_ref},
        batch_format="pyarrow",
    )

    def write_parts(batch: pa.Table) -> pa.Table:
        """One hash-partitioned block in, one summary row per partition
        written. Hash repartition co-locates every row of a ``part`` in
        exactly one block, so each part is written atomically here."""
        o_part, o_rows, o_docs = [], [], []
        for part in pc.unique(batch["part"]).to_pylist():
            group = batch.filter(pc.equal(batch["part"], part))
            # deterministic layout: sort rows; null marker rows excluded
            # from the data file but counted in the manifest
            data = group.filter(pc.is_valid(group["subj"]))
            data = data.sort_by(
                [(c, "ascending") for c in ("doc_id", "subj", "pred", "obj")]
            )
            manifest = lineage.write_partition(
                data.select(
                    [
                        "doc_id", "subj", "pred", "obj",
                        "subj_id", "pred_id", "obj_id", "matched", "match_status",
                    ]
                ),
                triples_dir,
                int(part),
                extra_meta={
                    "num_input_docs": len(set(group["doc_id"].to_pylist())),
                    # digest over ALL input docs of the partition (incl.
                    # docs that produced zero triples) — the per-row sha
                    # invariant
                    "input_content_sha256_digest": lineage.content_digest(
                        group["doc_id"].to_pylist()
                    ),
                    "input_path": os.path.abspath(input_path),
                    **run_meta,
                },
            )
            o_part.append(int(part))
            o_rows.append(manifest["num_rows"])
            o_docs.append(manifest["num_input_docs"])
        return pa.table(
            {
                "part": pa.array(o_part, pa.int32()),
                "num_rows": pa.array(o_rows, pa.int64()),
                "num_docs": pa.array(o_docs, pa.int64()),
            }
        )

    # sort-based groupby: at this shuffle volume (triples are ~1% of the
    # input bytes — content never crosses this boundary) the sort's cost
    # is the barrier, not the bytes; hash-shuffle aggregator pools
    # measured strictly worse on ≤32-CPU nodes.
    # COALESCE before the sort: Ray's sort cost grows with input block
    # count, not bytes — 320 extraction-output blocks took ~11 s to sort
    # 66 MB of triples where 32 coalesced blocks take ~1 s (measured).
    # The extraction stage emits one block per task (concurrency × 8), so
    # without this the sort barrier was 36% of the 32-CPU wall and the
    # dominant scaling loss. repartition() here is a cheap concat (no
    # shuffle flag), and the groupby is a barrier anyway.
    canon = canon.repartition(max(cfg.num_partitions * 2, 16))
    return canon.groupby("part").map_groups(
        write_parts, batch_format="pyarrow"
    )


def build_graph(
    triples_dir: str,
    graph_dir: str,
    cfg: Optional[KGConfig] = None,
) -> ray.data.Dataset:
    """Stage B (resumable): triples Parquet → deduped graph, one sorted
    Parquet + manifest per triple-hash bucket."""
    cfg = cfg or KGConfig()
    # graph buckets derive from the triples dir, which legitimately GROWS
    # when a crashed extraction stage resumes — stale buckets (written
    # against fewer triples, or a different bucket count) are auto-
    # invalidated (deleted + recomputed) rather than silently kept
    bucket_meta = {
        "num_buckets": cfg.num_buckets,
        "input_fingerprint": lineage.input_fingerprint(triples_dir),
        # v2 = vectorized polars row-hash buckets (stages/dedup.py
        # *_vec): buckets written under the old per-row sha1 scheme hold
        # different triples, so resuming across the scheme change must
        # invalidate them. The sentinel-probe suffix additionally
        # invalidates if a polars upgrade changes hash_rows output
        # (buckets from two hash versions must never mix).
        "bucket_scheme": f"polars-v2-{bucket_hash_probe()}",
    }
    done = (
        lineage.validated_finished_partitions(
            graph_dir, bucket_meta, prefix="bucket", on_mismatch="invalidate"
        )
        if cfg.resume
        else set()
    )

    ds = ray.data.read_parquet(
        triples_dir,
        columns=["doc_id", "subj_id", "pred_id", "obj_id", "matched"],
    )
    ds = ds.map_batches(
        lambda t: t.filter(t["matched"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    partial = ds.map_batches(
        partial_triple_agg_vec,
        fn_kwargs={"num_buckets": cfg.num_buckets, "max_doc_ids": cfg.max_doc_ids},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if done:
        done_arr = pa.array(sorted(done), pa.int32())
        partial = partial.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t["bucket"], value_set=done_arr))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    max_doc_ids = cfg.max_doc_ids

    def write_buckets(batch: pa.Table) -> pa.Table:
        o_bucket, o_rows = [], []
        for bucket in pc.unique(batch["bucket"]).to_pylist():
            group = batch.filter(pc.equal(batch["bucket"], bucket))
            merged = merge_triple_partials_vec(group, max_doc_ids=max_doc_ids)
            manifest = lineage.write_partition(
                merged, graph_dir, int(bucket), prefix="bucket",
                doc_id_col="__none__", extra_meta=bucket_meta,
            )
            o_bucket.append(int(bucket))
            o_rows.append(manifest["num_rows"])
        return pa.table(
            {
                "bucket": pa.array(o_bucket, pa.int32()),
                "num_triples": pa.array(o_rows, pa.int64()),
            }
        )

    # same block-count coalesce as the extract sink (sort cost tracks
    # block count, and partials are tiny after the batch-local combine)
    partial = partial.repartition(max(cfg.num_buckets * 2, 16))
    return partial.groupby("bucket").map_groups(
        write_buckets, batch_format="pyarrow"
    )


def run_kg_pipeline(
    input_path: str,
    output_dir: str,
    world=None,
    cfg: Optional[KGConfig] = None,
):
    """Full run: extraction stage then graph stage. Returns the two small
    summary tables (per-partition, per-bucket)."""
    from ..fixtures import make_catalogs
    from ..core.world import World

    cfg = cfg or KGConfig()
    if world is None:
        from ..core.compact import CompactWorld

        # default to the zero-copy buffer form: wall-identical at fixture
        # scale, 0.01 s/worker instead of 40-73 s at the reference's 6M
        # magnitude (BASELINE.md round-5 stress) — the scale-safe posture
        entities, relations = make_catalogs()
        world = CompactWorld.build(entities, relations)
    world_ref = put_world(world) if not isinstance(world, ray.ObjectRef) else world

    triples_dir = os.path.join(output_dir, "triples")
    graph_dir = os.path.join(output_dir, "graph")

    import pandas as pd

    def _with_cols(df: "pd.DataFrame", cols):
        # a fully-resumed stage yields an empty dataset with no schema
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        return df

    part_summary = extract_to_triples(input_path, triples_dir, world_ref, cfg)
    parts = _with_cols(part_summary.to_pandas(), ["part", "num_rows", "num_docs"])
    graph_summary = build_graph(triples_dir, graph_dir, cfg)
    buckets = _with_cols(graph_summary.to_pandas(), ["bucket", "num_triples"])
    return parts, buckets


def merge_graph_increment(
    graph: "ray.data.Dataset | None",
    new_triples: ray.data.Dataset,
    num_buckets: int = 16,
    max_doc_ids: int = 8,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Fold a NEW batch of per-document triples into an EXISTING aggregated
    graph without recomputing it — the incremental-ingestion primitive a
    production KG pipeline runs per crawl/commit batch.

    Both sides are reduced to the same partial shape ``(triple, support,
    doc_ids sample, bucket)``: existing graph rows ARE valid partials
    (support already aggregated, doc_ids already capped), new triples are
    combined batch-locally first. One bounded bucket groupby then merges —
    cost scales with the INCREMENT plus the touched graph rows' shuffle,
    never with a re-extraction. Equivalence contract: merging any split of
    the corpus reproduces the full-build graph exactly (support counts
    exact; doc_ids the deterministic sorted cap — tested).

    Fully vectorized, like the full-build path's ``*_vec`` pair in
    ``stages/dedup.py``: polars group_by for the combine, list
    ``flatten→unique→sort→head`` for the doc-id sample, a polars row hash
    for the bucket (the bucket only needs to agree WITHIN this merge —
    it is a shuffle key, not an addressing scheme).
    """
    import polars as pl

    mask = num_buckets - 1  # num_buckets must be 2^k
    keys = ["subj_id", "pred_id", "obj_id"]

    def _bucket(df: pl.DataFrame) -> pa.Table:
        b = (df.select(keys).hash_rows(seed=11).to_numpy()
             & np.uint64(mask)).astype(np.int32)
        t = df.to_arrow()
        cast = pa.table(
            {
                **{k: t[k].cast(pa.string()) for k in keys},
                "support": t["support"].cast(pa.int64()),
                "doc_ids": t["doc_ids"].cast(pa.list_(pa.string())),
            }
        )
        return cast.append_column("bucket", pa.array(b, pa.int32()))

    def new_partial(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.filter(t["matched"]) if "matched" in t.column_names else t)
            .group_by(keys)
            .agg(support=pl.len(), doc_ids=pl.col("doc_id").unique())
            .with_columns(
                doc_ids=pl.col("doc_ids").list.sort().list.head(max_doc_ids)
            )
        )
        return _bucket(df)

    def old_partial(t: pa.Table) -> pa.Table:
        return _bucket(pl.from_arrow(t.select(keys + ["support", "doc_ids"])))

    def merge(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.drop_columns(["bucket"]))
            .group_by(keys)
            .agg(
                support=pl.col("support").sum(),
                doc_ids=pl.col("doc_ids").flatten().unique().sort()
                .head(max_doc_ids),
            )
            .sort(keys)
        )
        return _bucket(df).drop_columns(["bucket"])

    parts = new_triples.map_batches(
        new_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    if graph is not None:
        parts = parts.union(
            graph.map_batches(
                old_partial, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    return parts.groupby(
        "bucket", num_partitions=max(1, num_buckets // 2)
    ).map_groups(merge, batch_format="pyarrow")
