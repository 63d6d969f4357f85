"""Flagship end-to-end training-data curation pipeline, Ray-Data-first.

The reference stops at KG extraction; the brief's 100-TB user runs the
curation chain — language gate, quality/repetition cut, global dedup,
benchmark decontamination, split assignment, sequence packing — as ONE
resumable job, not eight scripts. Every operator in the chain already
exists and is individually oracle-checked (`functions/text.py`,
`functions/dedup.py`, `functions/corpus.py`, `functions/sampling.py`);
this module composes them with the kg-pipeline's per-partition lineage
manifests (`state/lineage.py`) so a killed run resumes from finished
partitions.

Three resumable stages, each writing partitioned Parquet + manifests:

    Stage A  clean/     documents → lang gate + quality/repetition cut,
                        one file per doc-hash partition (resume: part)
    Stage B  droplist/  global dedup verdicts — ids to DROP (exact
                        md5-content losers; optionally MinHash-LSH
                        near-dup cluster losers), one file per id-hash
                        bucket (resume: invalidate-on-input-change)
    Stage C  packed/    anti-join droplist → 8-gram decontamination →
                        split assignment → keep `train` → greedy packing,
                        one file per pack group (resume: grp)

Scale posture: document text bytes are shuffled exactly ONCE (the pack
grouping); dedup moves only (content-hash, id) pairs; the droplist rides
a bucketed hash anti-join (never a driver collect); benchmark grams are
broadcast once per process (benchmarks are small by contract).

The in-memory composition (`curate_dataset`) and the staged writer
(`curate`) share the same three transform functions, so the
oracle-checked `curate_pipeline` query cannot diverge from the resumable
production path.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.corpus import _bench_grams, _ngram_frame, benchmark_ngram_list, pack_sequences
from ..functions.dedup import (
    duplicate_clusters,
    minhash_lsh_candidates,
    minhash_signatures_batch,
    verify_jaccard_pairs,
)
from ..functions.sampling import assign_splits, splitmix64
from ..functions.text import quality_score_batch, repetition_score_batch
from ..state import lineage


@dataclass
class CurateConfig:
    # stage A: language gate + quality/repetition thresholds
    num_partitions: int = 16
    lang_mode: str = "column"  # "column" (trusted lang col) | "predict"
    lang_keep: Tuple[str, ...] = ("en",)
    min_chars: int = 100
    min_stopword_ratio: float = 0.02
    max_top_bigram_frac: float = 0.05
    max_dup_trigram_frac: float = 0.50
    max_dup_line_frac: float = 0.30
    # stage B: dedup
    num_buckets: int = 16  # droplist id-hash buckets (2^k)
    near_dup: bool = False  # + MinHash-LSH near-dup cluster losers
    jaccard_threshold: float = 0.8
    # stage C: decontamination + split + packing
    bench_mod: int = 97  # docs with doc_id % bench_mod == 0 are held out
    ngram_n: int = 8
    split_keep: str = "train"
    pack_budget: int = 512
    pack_groups: int = 8
    resume: bool = True

    def filter_fingerprint(self) -> str:
        """Identity of the stage-A predicate — folded into the resume
        manifests so a threshold change invalidates finished parts."""
        key = (
            f"{self.lang_mode}|{','.join(self.lang_keep)}|{self.min_chars}|"
            f"{self.min_stopword_ratio}|{self.max_top_bigram_frac}|"
            f"{self.max_dup_trigram_frac}|{self.max_dup_line_frac}"
        )
        return hashlib.md5(key.encode()).hexdigest()[:12]


# ---------------------------------------------------------------------------
# transforms (shared by the staged writer and the in-memory composition)
# ---------------------------------------------------------------------------


def clean_transform(
    ds: ray.data.Dataset, cfg: CurateConfig
) -> ray.data.Dataset:
    """Stage A semantics: language gate + Gopher-style quality /
    repetition cut. Stateless vectorized map — the quality and
    repetition kernels are the oracle-checked batch functions; one pass,
    nothing shuffles. Output columns: (doc_id, text, source, lang,
    part)."""
    lang_arr = pa.array(list(cfg.lang_keep), pa.string())
    mask = np.uint64(cfg.num_partitions - 1) if _is_pow2(
        cfg.num_partitions
    ) else None

    def gate(t: pa.Table) -> pa.Table:
        if cfg.lang_mode == "predict":
            from ..functions.text import lang_id_batch

            t = lang_id_batch(t)
            lang_col = t["lang_pred"]
        else:
            lang_col = t["lang"]
        keep = pc.is_in(lang_col, value_set=lang_arr)
        t = t.filter(keep)
        # staged predicate, cheap→expensive: each stage only pays its
        # kernel for rows the cheaper stages kept (the conjunction is
        # order-independent, so semantics — and the SQL oracle — are
        # unchanged; the repetition kernel is the costly one)
        n_chars = pc.cast(
            pc.fill_null(pc.utf8_length(t["text"]), 0), pa.int64()
        )
        t = t.filter(pc.greater_equal(n_chars, cfg.min_chars))
        q = quality_score_batch(t)
        q = q.filter(
            pc.greater_equal(q["stopword_ratio"], cfg.min_stopword_ratio)
        )
        r = repetition_score_batch(q)
        ok = pc.and_(
            pc.and_(
                pc.less_equal(
                    r["top_bigram_frac"], cfg.max_top_bigram_frac
                ),
                pc.less_equal(
                    r["dup_trigram_frac"], cfg.max_dup_trigram_frac
                ),
            ),
            pc.less_equal(r["dup_line_frac"], cfg.max_dup_line_frac),
        )
        kept = r.filter(ok).select(["doc_id", "text", "source", "lang"])
        ids = kept["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if mask is not None:
            part = (splitmix64(ids) & mask).astype(np.int32)
        else:
            part = (splitmix64(ids) % np.uint64(cfg.num_partitions)).astype(
                np.int32
            )
        return kept.append_column("part", pa.array(part, pa.int32()))

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def droplist_transform(
    clean: ray.data.Dataset, cfg: CurateConfig
) -> ray.data.Dataset:
    """Stage B semantics: the set of doc_ids to DROP as duplicates.

    Exact path: per-batch (md5(text), doc_id) pairs — text bytes never
    leave their block — bucketed by content hash; each bucket keeps the
    min id per hash and emits the rest. 128-bit md5 keys are
    collision-safe at 10^12 rows (same argument as ``exact_dedup``).

    Near-dup path (``cfg.near_dup``): the full distributed MinHash chain
    (signatures → banded LSH → exact-Jaccard verify) feeds
    ``duplicate_clusters`` (distributed min-label propagation); every
    cluster member except the minimum id is dropped. Union of both drop
    sets, distinct. Output: one ``doc_id`` column."""
    import hashlib as _hl

    mask = cfg.num_buckets - 1  # num_buckets must be 2^k

    def pairs(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        hashes = [_hl.md5((x or "").encode()).hexdigest() for x in texts]
        buckets = [int(h[:8], 16) & mask for h in hashes]
        return pa.table(
            {
                "content_hash": pa.array(hashes, pa.string()),
                "doc_id": t["doc_id"],
                "bucket": pa.array(buckets, pa.int32()),
            }
        )

    def losers(g: pa.Table) -> pa.Table:
        import polars as pl

        if len(g) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        df = pl.from_arrow(g.drop_columns(["bucket"]))
        out = df.filter(
            pl.col("doc_id")
            > pl.col("doc_id").min().over("content_hash")
        ).select("doc_id")
        return pa.table(
            {"doc_id": out.to_arrow()["doc_id"].cast(pa.int64())}
        )

    exact_drop = (
        clean.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket", num_partitions=max(1, cfg.num_buckets // 2))
        .map_groups(losers, batch_format="pyarrow")
    )
    if not cfg.near_dup:
        return exact_drop

    # near-dup cluster losers: ids are int64 here, the cluster ops key on
    # strings and pick the LEXICOGRAPHIC min as the cluster keeper —
    # zero-pad to 20 digits so lexicographic order == numeric order and
    # the keeper is the true min id (int64 max is 19 digits)
    docs = clean.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.utf8_lpad(
                    pc.cast(t["doc_id"], pa.string()), 20, "0"
                ),
                "text": t["text"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    sigs = docs.map_batches(minhash_signatures_batch, batch_format="pyarrow")
    cands = minhash_lsh_candidates(sigs)
    pairs_nd = verify_jaccard_pairs(
        cands, docs, threshold=cfg.jaccard_threshold
    )
    clusters = duplicate_clusters(
        pairs_nd.map_batches(
            lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
        ),
        num_partitions=max(2, cfg.num_buckets // 4),
    )

    def cluster_losers(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        roots = pc.cast(t["cluster_id"], pa.int64())
        keep = pc.not_equal(ids, roots)
        return pa.table({"doc_id": ids.filter(keep.combine_chunks())})

    near_drop = clusters.map_batches(
        cluster_losers, batch_format="pyarrow"
    )
    both = exact_drop.union(near_drop)

    def tag(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(ids) & np.uint64(mask)).astype(np.int32)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    return (
        both.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket", num_partitions=max(1, cfg.num_buckets // 2))
        .map_groups(
            lambda t: t.drop_columns(["bucket"])
            .group_by("doc_id")
            .aggregate([]),
            batch_format="pyarrow",
        )
    )


def finalize_transform(
    clean: ray.data.Dataset,
    droplist: ray.data.Dataset,
    cfg: CurateConfig,
    skip_groups: Optional[set] = None,
) -> ray.data.Dataset:
    """Stage C semantics: drop duplicates, hold out + decontaminate
    against the benchmark subset, assign splits, keep ``cfg.split_keep``,
    pack into token-budget sequences. Output: (grp, doc_id, n_tok, bin).

    The droplist anti-join is a bucketed hash exchange (both sides keyed
    by splitmix64(doc_id)); the benchmark gram set is driver-collected
    and broadcast — benchmarks are contractually small (same posture as
    ``decontaminate``).

    ``skip_groups`` (resume): pack groups already committed to disk.
    Applied AFTER the benchmark gram list is built — the gram list is a
    global property of the whole deduped corpus, so it must include
    benchmark docs whose doc_id lands in a finished group, or resumed
    runs would silently keep contaminated documents."""
    deduped = _anti_join_ids(clean, droplist, num_buckets=cfg.num_buckets)

    # benchmark = held-out subset of the DEDUPED corpus
    def is_bench(t: pa.Table) -> pa.ChunkedArray:
        return pc.equal(_mod(t["doc_id"], cfg.bench_mod), 0)

    bench = deduped.map_batches(
        lambda t: t.filter(is_bench(t)), batch_format="pyarrow"
    )
    grams_ref = ray.put(benchmark_ngram_list(bench, n=cfg.ngram_n))

    if skip_groups:
        done_arr = pa.array(sorted(skip_groups), pa.int64())
        deduped = deduped.map_batches(
            lambda t: t.filter(
                pc.invert(
                    pc.is_in(
                        _mod(t["doc_id"], cfg.pack_groups),
                        value_set=done_arr,
                    )
                ).combine_chunks()
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def decon_filter(t: pa.Table) -> pa.Table:
        import polars as pl

        t = t.filter(pc.invert(is_bench(t)).combine_chunks())
        if len(t) == 0:
            return t.select(["doc_id", "text"])
        grams = _bench_grams(grams_ref)
        hits = (
            _ngram_frame(t, cfg.ngram_n, "doc_id", "text")
            .group_by("doc_id")
            .agg(n_hits=pl.col("g").is_in(grams).sum().cast(pl.Int64))
        )
        contaminated = set(
            hits.filter(pl.col("n_hits") > 0)["doc_id"].to_list()
        )
        if contaminated:
            keep = pa.array(
                [d not in contaminated for d in t["doc_id"].to_pylist()]
            )
            t = t.filter(keep)
        return t.select(["doc_id", "text"])

    decon = deduped.map_batches(decon_filter, batch_format="pyarrow")
    split = assign_splits(decon)
    train = split.map_batches(
        lambda t: t.filter(
            pc.equal(t["split"], cfg.split_keep).combine_chunks()
        ).select(["doc_id", "text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return pack_sequences(
        train, budget=cfg.pack_budget, num_groups=cfg.pack_groups
    )


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def _mod(arr, m: int):
    return pc.subtract(arr, pc.multiply(pc.divide(arr, m), m))


def _anti_join_ids(
    ds: ray.data.Dataset,
    drop: ray.data.Dataset,
    id_col: str = "doc_id",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Rows of ``ds`` whose ``id_col`` does NOT appear in ``drop`` — the
    shared bucketed membership exchange (`stages/exchange.py`). The drop
    side is ids only; ``ds`` text bytes cross the exchange once (this is
    the pipeline's single full-corpus shuffle)."""
    from ..stages.exchange import bucketed_membership_join

    return bucketed_membership_join(
        ds, drop, id_col, id_col, how="anti", num_buckets=num_buckets
    )


# ---------------------------------------------------------------------------
# staged, resumable writer
# ---------------------------------------------------------------------------


def _read_docs(input_path: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        input_path, columns=["doc_id", "text", "source", "lang"]
    )


def clean_stage(
    input_path: str, clean_dir: str, cfg: CurateConfig
) -> ray.data.Dataset:
    """Stage A writer: one Parquet + manifest per doc-hash partition."""
    run_meta = {
        "num_partitions": cfg.num_partitions,
        "input_fingerprint": lineage.input_fingerprint(input_path),
        "filter_fingerprint": cfg.filter_fingerprint(),
    }
    done = (
        lineage.validated_finished_partitions(clean_dir, run_meta)
        if cfg.resume
        else set()
    )
    ds = clean_transform(_read_docs(input_path), cfg)
    if done:
        done_arr = pa.array(sorted(done), pa.int32())
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t["part"], value_set=done_arr))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def write_parts(batch: pa.Table) -> pa.Table:
        o_part, o_rows = [], []
        for part in pc.unique(batch["part"]).to_pylist():
            group = batch.filter(pc.equal(batch["part"], part))
            data = group.drop_columns(["part"]).sort_by(
                [("doc_id", "ascending")]
            )
            m = lineage.write_partition(
                data, clean_dir, int(part),
                extra_meta=run_meta, doc_id_col="doc_id",
            )
            o_part.append(int(part))
            o_rows.append(m["num_rows"])
        return pa.table(
            {
                "part": pa.array(o_part, pa.int32()),
                "num_rows": pa.array(o_rows, pa.int64()),
            }
        )

    return (
        ds.repartition(max(cfg.num_partitions, 8))
        .groupby("part")
        .map_groups(write_parts, batch_format="pyarrow")
    )


def droplist_stage(
    clean_dir: str, drop_dir: str, cfg: CurateConfig
) -> ray.data.Dataset:
    """Stage B writer: droplist ids, one Parquet + manifest per id-hash
    bucket. Input legitimately grows when stage A resumes → stale
    buckets invalidate (same contract as ``build_graph``)."""
    meta = {
        "input_fingerprint": lineage.input_fingerprint(clean_dir),
        "near_dup": cfg.near_dup,
        "num_buckets": cfg.num_buckets,
    }
    done = (
        lineage.validated_finished_partitions(
            drop_dir, meta, prefix="bucket", on_mismatch="invalidate"
        )
        if cfg.resume
        else set()
    )
    if len(done) == cfg.num_buckets:
        return ray.data.read_parquet(
            os.path.join(drop_dir)
        ).select_columns(["doc_id"])
    clean = ray.data.read_parquet(clean_dir, columns=["doc_id", "text"])
    drop = droplist_transform(clean, cfg)
    mask = cfg.num_buckets - 1

    def tag(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(ids) & np.uint64(mask)).astype(np.int32)
        return t.append_column("wbucket", pa.array(b, pa.int32()))

    def write_bucket(g: pa.Table) -> pa.Table:
        bid = int(g["wbucket"][0].as_py())
        data = g.drop_columns(["wbucket"]).sort_by([("doc_id", "ascending")])
        lineage.write_partition(
            data, drop_dir, bid, extra_meta=meta, prefix="bucket",
            doc_id_col="doc_id",
        )
        return pa.table({"bucket": pa.array([bid], pa.int32()),
                         "num_rows": pa.array([data.num_rows], pa.int64())})

    written = (
        drop.map_batches(tag, batch_format="pyarrow")
        .groupby("wbucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .materialize()
    )
    # buckets with zero drop ids never reach write_bucket — write empty
    # markers so resume sees a complete bucket set
    seen = set(
        written.to_pandas()["bucket"].tolist()
    ) if written.count() else set()
    for bid in range(cfg.num_buckets):
        if bid not in seen and bid not in done:
            lineage.write_partition(
                pa.table({"doc_id": pa.array([], pa.int64())}),
                drop_dir, bid, extra_meta=meta, prefix="bucket",
                doc_id_col="doc_id",
            )
    return ray.data.read_parquet(drop_dir).select_columns(["doc_id"])


def packed_stage(
    clean_dir: str, drop_dir: str, packed_dir: str, cfg: CurateConfig
) -> ray.data.Dataset:
    """Stage C writer: packed sequences, one Parquet + manifest per pack
    group (resume: grp — pack groups are doc_id % groups, so finished
    groups filter at the read)."""
    meta = {
        "input_fingerprint": lineage.input_fingerprint(clean_dir),
        "droplist_fingerprint": lineage.input_fingerprint(drop_dir),
        "pack_budget": cfg.pack_budget,
        "pack_groups": cfg.pack_groups,
        "split_keep": cfg.split_keep,
    }
    done = (
        lineage.validated_finished_partitions(
            packed_dir, meta, prefix="grp", on_mismatch="invalidate"
        )
        if cfg.resume
        else set()
    )
    clean = ray.data.read_parquet(
        clean_dir, columns=["doc_id", "text", "source", "lang"]
    )
    # NOTE: the done-group filter is passed INTO finalize_transform (not
    # applied here) so the benchmark n-gram list is still built from the
    # FULL deduped corpus — filtering first would drop benchmark docs of
    # finished groups from the gram list and resumed runs would keep
    # contaminated documents.
    drop = ray.data.read_parquet(drop_dir).select_columns(["doc_id"])
    packed = finalize_transform(clean, drop, cfg, skip_groups=done or None)

    def write_grp(g: pa.Table) -> pa.Table:
        gid = int(g["grp"][0].as_py())
        data = g.sort_by([("doc_id", "ascending")])
        lineage.write_partition(
            data, packed_dir, gid, extra_meta=meta, prefix="grp",
            doc_id_col=None if "doc_id" not in g.column_names else "doc_id",
        )
        return pa.table({"grp": pa.array([gid], pa.int64()),
                         "num_rows": pa.array([data.num_rows], pa.int64())})

    return packed.groupby("grp").map_groups(
        write_grp, batch_format="pyarrow"
    )


def curate(
    input_path: str, output_dir: str, cfg: Optional[CurateConfig] = None
) -> dict:
    """Run the full staged pipeline; returns per-stage row counts."""
    cfg = cfg or CurateConfig()
    clean_dir = os.path.join(output_dir, "clean")
    drop_dir = os.path.join(output_dir, "droplist")
    packed_dir = os.path.join(output_dir, "packed")
    a = clean_stage(input_path, clean_dir, cfg).materialize()
    droplist_stage(clean_dir, drop_dir, cfg)
    c = packed_stage(clean_dir, drop_dir, packed_dir, cfg).materialize()
    import pyarrow.parquet as pq

    n_packed = sum(
        pq.read_metadata(os.path.join(packed_dir, f)).num_rows
        for f in os.listdir(packed_dir)
        if f.endswith(".parquet")
    )
    return {
        "clean_parts": a.count(),
        "packed_groups": c.count(),
        "packed_rows": n_packed,
        "dirs": {
            "clean": clean_dir, "droplist": drop_dir, "packed": packed_dir
        },
    }


def curate_dataset(
    input_path: str, cfg: Optional[CurateConfig] = None
) -> ray.data.Dataset:
    """In-memory composition of the same three transforms (no lineage
    writes) — the `curate_pipeline` queries() entry, hash-checked
    against the chained DuckDB oracle."""
    cfg = cfg or CurateConfig()
    clean = clean_transform(_read_docs(input_path), cfg).map_batches(
        lambda t: t.drop_columns(["part"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    clean = clean.materialize()  # consumed twice (droplist + finalize)
    drop = droplist_transform(clean, cfg)
    return finalize_transform(clean, drop, cfg)
