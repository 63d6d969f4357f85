"""Corpus-level statistics and sequence packing for training-data
pipelines.

Three operators, each demonstrating a distinct distributed shape:

- ``top_terms``: global top-k vocabulary — batch-local term counts
  (partial aggregation) → ONE bucketed shuffle on a term-hash (complete
  per-term totals within a bucket by construction) → per-bucket top-k →
  tiny global merge. The wide step moves (term, count) partials, never
  raw text, and the bucket count is the scale knob.
- ``int_quantiles``: EXACT quantiles of a bounded-domain integer column
  via a distributed value-count histogram — batch-local Arrow
  ``group_by`` counts → one small ``groupby(value).sum`` (cardinality =
  #distinct values, not #rows) → driver-side cumulative walk over the
  tiny histogram. Exact at any corpus size because integer domains
  (doc lengths, token counts) have bounded cardinality.
- ``pack_sequences``: greedy fixed-budget sequence packing (the
  standard LLM pretraining step) — docs are hash-grouped into G
  independent streams, each stream packs sequentially by doc_id order.
  Packing is inherently a sequential scan (bin state depends on every
  prior doc), so the parallelism unit is the GROUP — exactly how real
  packers shard work — and G scales with the cluster. The per-doc work
  inside a group is one integer add+compare.

All three are deterministic and DuckDB-oracle-checked (the packer via a
recursive CTE replaying the same greedy recurrence).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

# shared tokenization with the oracle: \S+ runs, no case folding
TOKEN_RE = r"\S+"


def top_terms(
    ds: ray.data.Dataset,
    k: int = 50,
    text_col: str = "text",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Global top-k terms by occurrence count, ties broken by term
    (count DESC, term ASC — matches ``ORDER BY n DESC, term LIMIT k``).
    Returns a Dataset of (term, n, rank)."""
    import polars as pl

    def local_counts(t: pa.Table) -> pa.Table:
        """Partial aggregation: per-batch term counts + stable hash
        bucket. The shuffle that follows moves one row per DISTINCT term
        per batch — bounded by vocabulary, not corpus size."""
        c = (
            pl.from_arrow(t[text_col])
            .rename("t")
            .to_frame()
            .select(term=pl.col("t").str.extract_all(TOKEN_RE))
            .explode("term")
            .drop_nulls("term")
            .group_by("term")
            .len(name="n")
        )
        if len(c) == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int32()),
                 "term": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        bucket = (
            c["term"].hash(seed=7).to_numpy().astype(np.uint64)
            % np.uint64(num_buckets)
        ).astype(np.int32)
        return pa.table(
            {"bucket": pa.array(bucket),
             "term": c["term"].to_arrow(),
             "n": c["n"].cast(pl.Int64).to_arrow()}
        )

    def bucket_topk(g: pa.Table) -> pa.Table:
        """One shuffle bucket: term totals here are globally complete
        (term→bucket is deterministic), so a local top-k is safe."""
        agg = g.group_by("term").aggregate([("n", "sum")])
        order = agg.sort_by([("n_sum", "descending"), ("term", "ascending")])
        return order.slice(0, k).rename_columns(["term", "n"])

    def global_merge(t: pa.Table) -> pa.Table:
        t = t.sort_by([("n", "descending"), ("term", "ascending")]).slice(0, k)
        return t.append_column(
            "rank", pa.array(np.arange(1, t.num_rows + 1), pa.int64())
        )

    partials = ds.map_batches(local_counts, batch_format="pyarrow")
    per_bucket = partials.groupby(
        "bucket", num_partitions=max(1, num_buckets // 8)
    ).map_groups(bucket_topk, batch_format="pyarrow")
    # k × num_buckets rows at most — a single tiny merge task
    return per_bucket.repartition(1).map_batches(
        global_merge, batch_format="pyarrow", batch_size=None
    )


def int_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> pa.Table:
    """Exact discrete quantiles of an integer column, DuckDB
    ``quantile_disc`` semantics (probed: idx = max(0, ceil(q·n) − 1) into
    the sorted values). Distributed as a value-count histogram: the only
    shuffle is ``groupby(col).sum`` over #distinct values; the driver
    walks the tiny sorted histogram. Returns a (q, value) pa.Table."""

    def local_hist(t: pa.Table) -> pa.Table:
        return (
            t.select([col])
            .group_by(col)
            .aggregate([([], "count_all")])
            .rename_columns([col, "cnt"])
        )

    hist = (
        ds.map_batches(local_hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(col)
        .sum("cnt")
        .to_pandas()
        .sort_values(col)
    )
    vals = hist[col].to_numpy()
    cnts = hist["sum(cnt)"].to_numpy().astype(np.int64)
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        idx = max(0, math.ceil(q * n) - 1) if n else 0
        # first histogram row whose cumulative count exceeds idx
        v = int(vals[np.searchsorted(cum, idx, side="right")]) if n else None
        out_q.append(float(q))
        out_v.append(v)
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.int64())}
    )


def grouped_int_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    col: str,
    qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> pa.Table:
    """Exact per-group discrete quantiles (DuckDB ``quantile_disc``
    semantics, same probe as ``int_quantiles``: idx = max(0, ceil(q·n)−1)
    into the group's sorted values), distributed as a (group, value)
    COUNT histogram: batch-local Arrow ``group_by`` partials, then one
    ``groupby`` whose cardinality is #groups × #distinct values — never
    #rows. The driver walks each group's tiny sorted histogram. Returns
    a (group, q, value) pa.Table sorted by (group, q)."""

    def local_hist(t: pa.Table) -> pa.Table:
        return (
            t.select([group_col, col])
            .group_by([group_col, col])
            .aggregate([([], "count_all")])
            .rename_columns([group_col, col, "cnt"])
        )

    hist = (
        ds.map_batches(local_hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, col])
        .sum("cnt")
        .to_pandas()
        .sort_values([group_col, col])
    )
    out_g, out_q, out_v = [], [], []
    for g, sub in hist.groupby(group_col, sort=True):
        vals = sub[col].to_numpy()
        cum = np.cumsum(sub["sum(cnt)"].to_numpy().astype(np.int64))
        n = int(cum[-1])
        for q in qs:
            idx = max(0, math.ceil(q * n) - 1)
            out_g.append(g)
            out_q.append(float(q))
            out_v.append(int(vals[np.searchsorted(cum, idx, side="right")]))
    return pa.table(
        {
            group_col: pa.array(out_g),
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.int64()),
        }
    )


def stratified_quantile_filter(
    ds: ray.data.Dataset,
    frac: float = 0.5,
    by: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    mod: int = 10_000,
) -> ray.data.Dataset:
    """Keep the top ``frac`` of documents per group by quantized stopword
    ratio (a FineWeb-style per-domain quality cut): a doc survives iff
    its score ≥ the group's exact (1−frac) discrete quantile, ties
    included.

    Scale shape — the classic two-pass threshold plan, no wide shuffle:

    1. score every doc (vectorized kernel), quantize to an integer in
       [0, mod], and build a per-(group, score) COUNT histogram —
       batch-local Arrow ``group_by`` partials, then one tiny
       ``groupby`` whose cardinality is #groups × #distinct scores,
       never #rows;
    2. the driver walks the tiny histogram to the per-group
       ``quantile_disc``-semantics threshold (idx = ⌈q·n⌉−1 into the
       sorted values) and broadcasts a {group: thr} dict in the task
       closure;
    3. a second streaming pass recomputes the score and filters — at
       corpus scale recomputing a cheap kernel beats materializing the
       scored table between passes.

    Quantization is ``floor(r·mod + 0.5)`` (half-up for the nonnegative
    ratio), the same float64 ops as the DuckDB oracle, so thresholds and
    verdicts are bit-identical."""
    from genie_ray.functions.text import quality_score_batch

    def scored(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        q = quality_score_batch(t, text_col=text_col)
        r = q["stopword_ratio"].to_numpy(zero_copy_only=False)
        qi = np.floor(r * mod + 0.5).astype(np.int64)
        return pa.table(
            {id_col: t[id_col], by: t[by], "qi": pa.array(qi, pa.int64())}
        )

    def local_hist(t: pa.Table) -> pa.Table:
        return (
            scored(t)
            .select([by, "qi"])
            .group_by([by, "qi"])
            .aggregate([([], "count_all")])
            .rename_columns([by, "qi", "cnt"])
        )

    hist = (
        ds.map_batches(local_hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([by, "qi"])
        .sum("cnt")
        .to_pandas()
    )
    thr = {}
    for key, g in hist.groupby(by):
        g = g.sort_values("qi")
        cnts = g["sum(cnt)"].to_numpy().astype(np.int64)
        cum = np.cumsum(cnts)
        idx = max(0, math.ceil((1.0 - frac) * int(cum[-1])) - 1)
        thr[key] = int(g["qi"].to_numpy()[np.searchsorted(cum, idx, side="right")])

    keys = pa.array(list(thr), pa.string())
    vals = np.array(list(thr.values()), dtype=np.int64)

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = scored(t)
        idx = pc.index_in(s[by], value_set=keys)
        th = np.where(
            idx.is_valid().to_numpy(zero_copy_only=False),
            vals[np.minimum(
                idx.fill_null(0).to_numpy(zero_copy_only=False), len(vals) - 1
            )] if len(vals) else np.int64(0),
            np.iinfo(np.int64).max,
        )
        return s.filter(pa.array(s["qi"].to_numpy(zero_copy_only=False) >= th))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def _ngram_frame(t: pa.Table, n: int, id_col: str, text_col: str):
    """(id, g) polars frame of all word n-grams per row — tokens via the
    shared ``TOKEN_RE`` scan, grams via n−1 window shifts over the
    exploded token list (fully vectorized; `concat_str` nulls out the
    tail positions that lack n successors, which are then dropped)."""
    import polars as pl

    ex = (
        pl.from_arrow(t.select([id_col, text_col]))
        .select(pl.col(id_col), tok=pl.col(text_col).str.extract_all(TOKEN_RE))
        .explode("tok")
        .drop_nulls("tok")
    )
    parts = [pl.col("tok").shift(-k).over(id_col) for k in range(n)]
    return ex.select(
        pl.col(id_col), g=pl.concat_str(parts, separator=" ")
    ).drop_nulls("g")


def benchmark_ngram_list(
    bench: ray.data.Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "pa.Array":
    """Distinct word n-grams of a BENCHMARK document set, collected to the
    driver. Benchmarks are small by contract (an eval set is MBs, not TBs)
    — per-batch gram extraction + distinct runs in the cluster and only
    the distinct gram strings come back, to be ``ray.put`` once for
    :func:`decontaminate`."""

    def grams(t: pa.Table) -> pa.Table:
        df = _ngram_frame(t, n, id_col, text_col)
        return df.select("g").unique().to_arrow()

    df = bench.map_batches(grams, batch_format="pyarrow").to_pandas()
    if "g" not in df.columns:  # empty benchmark set → no gram column
        return pa.array([], pa.string())
    tab = pa.Table.from_pandas(df.drop_duplicates())
    return tab["g"].combine_chunks()


def decontaminate(
    ds: ray.data.Dataset,
    bench_grams_ref,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Benchmark decontamination: flag every corpus document containing
    any word n-gram that also occurs in a benchmark/eval set (the
    GPT-3/PaLM-style 8-gram overlap rule). Returns (id, n_hits,
    contaminated) for every input row.

    Scale shape: the benchmark gram set is broadcast ONCE via
    ``ray.put`` and hydrated once per worker PROCESS (plasma read cached
    in a module dict — a stateless task map, so no actor-pool startup is
    paid per invocation and the stage fuses with the read); the corpus
    side is a pure streaming map — gram construction and membership are
    vectorized polars kernels, each doc is judged entirely inside its own
    batch, and nothing shuffles."""

    def scan(t: pa.Table) -> pa.Table:
        import polars as pl

        bench = _bench_grams(bench_grams_ref)
        hits = (
            _ngram_frame(t, n, id_col, text_col)
            .group_by(id_col)
            .agg(n_hits=pl.col("g").is_in(bench).sum().cast(pl.Int64))
        )
        return (
            pl.from_arrow(t.select([id_col]))
            .join(hits, on=id_col, how="left")
            .with_columns(pl.col("n_hits").fill_null(0))
            .with_columns(contaminated=pl.col("n_hits") > 0)
            .to_arrow()
        )

    return ds.map_batches(scan, batch_format="pyarrow")


# one broadcast gram set per worker process; keyed by ObjectRef so a new
# benchmark evicts the old (only one is live per decontamination run)
_BENCH_CACHE: dict = {}


def _bench_grams(ref):
    import polars as pl
    import ray as _ray

    key = ref.hex()
    if key not in _BENCH_CACHE:
        _BENCH_CACHE.clear()
        _BENCH_CACHE[key] = pl.Series("g", _ray.get(ref))
    return _BENCH_CACHE[key]


def pack_sequences(
    ds: ray.data.Dataset,
    budget: int = 512,
    num_groups: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Greedy sequence packing: assign each document to a training
    sequence (bin) of at most ``budget`` whitespace tokens, never
    splitting a document (an oversized doc gets its own bin). Docs are
    routed to ``num_groups`` independent streams by ``id % num_groups``
    and packed in id order within the stream, so the result is
    deterministic and partition-invariant; streams are the parallelism
    unit and their count scales with the cluster (a real packer's
    per-shard layout). Returns (grp, doc_id, n_tok, bin) rows.

    The per-group scan is a tight integer loop — packing is inherently
    sequential (bin state depends on every prior doc), so there is no
    vectorized form; the loop does one add+compare per doc over numpy
    arrays, and all token counting stays in the vectorized Arrow stage."""
    import pyarrow.compute as pc

    def tokens(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.fill_null(pc.count_substring_regex(t[text_col], TOKEN_RE), 0),
            pa.int64(),
        )
        ids = t[id_col]
        grp = pc.cast(
            pc.subtract(ids, pc.multiply(pc.divide(ids, num_groups), num_groups)),
            pa.int64(),
        )
        return pa.table({"grp": grp, id_col: ids, "n_tok": n_tok})

    def pack_group(g: pa.Table) -> pa.Table:
        g = g.sort_by([(id_col, "ascending")])
        toks = g["n_tok"].to_numpy()
        bins = np.empty(len(toks), dtype=np.int64)
        b, fill = 0, 0
        for i, nt in enumerate(toks):
            if fill and fill + nt > budget:
                b += 1
                fill = 0
            fill += int(nt)
            bins[i] = b
        return g.append_column("bin", pa.array(bins, pa.int64()))

    return (
        ds.map_batches(tokens, batch_format="pyarrow")
        .groupby("grp", num_partitions=max(1, num_groups // 2))
        .map_groups(pack_group, batch_format="pyarrow")
    )


# -- HyperLogLog approximate distinct count -----------------------------------


def _hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias-correction constant."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(registers: np.ndarray) -> float:
    """Standard HLL estimator over a register array: harmonic-mean raw
    estimate with the small-range linear-counting correction (the
    large-range correction is unnecessary with 64-bit hashes)."""
    m = len(registers)
    raw = _hll_alpha(m) * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int(np.sum(registers == 0))
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return float(raw)


def _msb_position(w: np.ndarray) -> np.ndarray:
    """Exact vectorized MSB bit position (0-based) of uint64 values via
    binary-search shifts — no float log2 (which misrounds values within
    1 ulp of a power of two). Position is undefined for w == 0 (returns
    0); callers mask zeros separately."""
    v = w.copy()
    pos = np.zeros(len(w), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = (v >> np.uint64(s)) != 0
        pos[big] += s
        v[big] >>= np.uint64(s)
    return pos


def approx_distinct(
    ds: ray.data.Dataset,
    cols: tuple,
    p: int = 12,
    seed: int = 7,
) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT col) for each column via HyperLogLog —
    THE sketch for distinct counting at 100 TB, where an exact distinct
    is a full shuffle of every value but the sketch is a fixed
    2^p-byte register array per column regardless of corpus size.

    Scale shape: each batch hashes its values (stable vectorized polars
    hash, the engine-wide bucket hash) and folds them into per-batch
    register maxima — one 2^p-byte blob per column per batch leaves the
    task, never a value. The merge is an elementwise max over blobs:
    one block-count-sized ``repartition(1)`` concat (bytes moved =
    #blocks × #cols × 2^p, e.g. 4 KB each), with no groupby at all. On
    a real cluster the same blobs tree-reduce for free because max is
    associative/commutative.

    Deterministic: fixed hash seed, exact integer bit arithmetic — the
    single-process oracle (`golden.py _hll_single`, per-row Python
    ``int.bit_length``) must reproduce every estimate bit-for-bit.
    Returns a (col, approx_distinct) Dataset, int64 estimates
    (floor(E + 0.5)).
    """
    import polars as pl

    m = 1 << p
    max_rho = np.uint8(64 - p + 1)

    def local_regs(t: pa.Table) -> pa.Table:
        blobs = []
        for col in cols:
            h = (
                pl.from_arrow(t.select([col]))[col]
                .hash(seed=seed)
                .to_numpy()
                .astype(np.uint64)
            )
            idx = (h >> np.uint64(64 - p)).astype(np.int64)
            w = h << np.uint64(p)  # wraps mod 2^64: the low 64-p bits
            rho = np.where(
                w == 0, max_rho, (64 - _msb_position(w)).astype(np.uint8)
            ).astype(np.uint8)
            # rho = leading-zeros(w) + 1 = (63 - msb) + 1
            regs = np.zeros(m, dtype=np.uint8)
            np.maximum.at(regs, idx, rho)
            blobs.append(regs.tobytes())
        return pa.table(
            {
                "col": pa.array(list(cols), pa.string()),
                "regs": pa.array(blobs, pa.binary()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out_c, out_n = [], []
        for col in cols:
            sub = t.filter(pc.equal(t["col"], col))
            stacked = np.stack(
                [np.frombuffer(b, dtype=np.uint8) for b in sub["regs"].to_pylist()]
            )
            est = hll_estimate(stacked.max(axis=0))
            out_c.append(col)
            out_n.append(int(math.floor(est + 0.5)))
        return pa.table(
            {
                "col": pa.array(out_c, pa.string()),
                "approx_distinct": pa.array(out_n, pa.int64()),
            }
        )

    partials = ds.map_batches(
        local_regs, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


# -- TF-IDF --------------------------------------------------------------------

# per-process cache for the broadcast DF lookup (cleared on new ref: only
# one corpus's DF table is live per query)
_TFIDF_CACHE: dict = {}


def tfidf_top_terms(
    ds: ray.data.Dataset,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Top-k terms per document by TF-IDF (idf = ln(N/df), ties score
    DESC then term ASC, 1-based rank) — the classic corpus-relevance
    scoring pass of a training-data pipeline.

    Scale shape, two passes over the corpus and ONE vocabulary-sized
    shuffle total:

    1. document frequencies — a document is one ROW, so per-batch
       distinct-(doc, term) counts are exact partials; the shuffle that
       merges them is ``groupby(term)`` over #vocab rows, never #tokens.
       The merged DF table (vocab-sized, bounded) broadcasts once via
       ``ray.put`` as a sorted term array + df array; above broadcast
       budget the same lookup becomes a hash join on term (the
       ``canonicalize_join`` pattern).
    2. scoring — entirely row-local: per-batch polars tf counts, one
       numpy ``searchsorted`` df gather, ``tf·ln(N/df)``, per-doc top-k
       inside the batch. No shuffle; output is (doc_id, term, score,
       rank).

    N (total docs) comes from parquet metadata (``ds.count()`` is a
    metadata read, not a scan, on an un-transformed parquet dataset).
    """
    import polars as pl
    import ray

    n_docs = ds.count()

    def local_df(t: pa.Table) -> pa.Table:
        c = (
            pl.from_arrow(t.select([id_col, text_col]))
            .with_columns(term=pl.col(text_col).str.extract_all(TOKEN_RE))
            .explode("term")
            .drop_nulls("term")
            .unique(subset=[id_col, "term"])
            .group_by("term")
            .len(name="df")
        )
        return pa.table(
            {"term": c["term"].to_arrow(), "df": c["df"].cast(pl.Int64).to_arrow()}
        )

    df_tab = (
        ds.map_batches(local_df, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term", num_partitions=num_partitions)
        .sum("df")
        .to_pandas()
        .sort_values("term")
    )
    terms_sorted = df_tab["term"].to_numpy(dtype=object)
    df_sorted = df_tab["sum(df)"].to_numpy().astype(np.float64)
    df_ref = ray.put((terms_sorted, df_sorted, float(n_docs)))

    class Score:
        def __init__(self, ref, top_k):
            self.terms, self.df, self.n = ray.get(ref)
            self.k = top_k

        def __call__(self, t: pa.Table) -> pa.Table:
            tf = (
                pl.from_arrow(t.select([id_col, text_col]))
                .with_columns(term=pl.col(text_col).str.extract_all(TOKEN_RE))
                .explode("term")
                .drop_nulls("term")
                .group_by([id_col, "term"])
                .len(name="tf")
            )
            if len(tf) == 0:
                return pa.table(
                    {
                        id_col: pa.array([], t[id_col].type),
                        "term": pa.array([], pa.string()),
                        "score": pa.array([], pa.float64()),
                        "rank": pa.array([], pa.int64()),
                    }
                )
            idx = np.searchsorted(
                self.terms, np.asarray(tf["term"].to_list(), dtype=object)
            )
            score = tf["tf"].to_numpy().astype(np.float64) * np.log(
                self.n / self.df[idx]
            )
            ranked = (
                tf.with_columns(score=pl.Series(score))
                .sort(["score", "term"], descending=[True, False])
                .group_by(id_col, maintain_order=True)
                .head(self.k)
                .with_columns(
                    rank=pl.int_range(pl.len()).over(id_col).cast(pl.Int64) + 1
                )
                .drop("tf")
            )
            out = ranked.to_arrow()
            sc = pa.array(np.round(ranked["score"].to_numpy(), 6))
            return out.set_column(
                out.schema.get_field_index("score"), "score", sc
            )

    def score_task(t: pa.Table) -> pa.Table:
        # stateless cached-task map (see stages/extract.py
        # extract_triples_task): the DF lookup is built once per worker
        # PROCESS, the stage fuses with the read map and pays no
        # actor-pool spin-up per run (~4 s at sf0.1)
        key = (df_ref.hex(), k)
        inst = _TFIDF_CACHE.get(key)
        if inst is None:
            _TFIDF_CACHE.clear()
            inst = _TFIDF_CACHE[key] = Score(df_ref, k)
        return inst(t)

    return ds.map_batches(score_task, batch_format="pyarrow")


# -- unigram LM log-likelihood (perplexity-style quality score) ----------------

# per-process cache for the broadcast unigram table
_UNIGRAM_CACHE: dict = {}


def unigram_loglik(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Mean per-token log-likelihood of each document under the corpus's
    own unigram LM — the CCNet/Wikipedia-LM perplexity-filter shape
    (score = Σ ln(count(term)/total_tokens) / n_tok). Low scores mark
    repetitive/outlier documents.

    Scale shape mirrors ``tfidf_top_terms``: ONE vocab-sized shuffle
    (batch-local term-count partials → ``groupby(term).sum``), the
    count table broadcast once via ``ray.put``, then a shuffle-free
    row-local scoring pass (a doc is a row) run as a cached-task map.
    Returns (doc_id, n_tok, logprob) — docs with no tokens are excluded
    (no LM event to score)."""
    import polars as pl
    import ray

    def local_counts(t: pa.Table) -> pa.Table:
        c = (
            pl.from_arrow(t[text_col])
            .rename("t")
            .to_frame()
            .select(term=pl.col("t").str.extract_all(TOKEN_RE))
            .explode("term")
            .drop_nulls("term")
            .group_by("term")
            .len(name="n")
        )
        return pa.table(
            {"term": c["term"].to_arrow(), "n": c["n"].cast(pl.Int64).to_arrow()}
        )

    cnt = (
        ds.map_batches(local_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term", num_partitions=num_partitions)
        .sum("n")
        .to_pandas()
        .sort_values("term")
    )
    terms_sorted = cnt["term"].to_numpy(dtype=object)
    counts = cnt["sum(n)"].to_numpy().astype(np.float64)
    total = float(counts.sum())
    lm_ref = ray.put((terms_sorted, np.log(counts / total)))

    def score(t: pa.Table) -> pa.Table:
        ck = lm_ref.hex()
        lm = _UNIGRAM_CACHE.get(ck)
        if lm is None:
            _UNIGRAM_CACHE.clear()
            lm = _UNIGRAM_CACHE[ck] = ray.get(lm_ref)
        terms, logp = lm
        tf = (
            pl.from_arrow(t.select([id_col, text_col]))
            .with_columns(term=pl.col(text_col).str.extract_all(TOKEN_RE))
            .explode("term")
            .drop_nulls("term")
            .group_by([id_col, "term"])
            .len(name="tf")
        )
        if len(tf) == 0:
            return pa.table(
                {
                    id_col: pa.array([], t[id_col].type),
                    "n_tok": pa.array([], pa.int64()),
                    "logprob": pa.array([], pa.float64()),
                }
            )
        idx = np.searchsorted(terms, np.asarray(tf["term"].to_list(), dtype=object))
        w = tf["tf"].to_numpy().astype(np.float64)
        agg = (
            tf.with_columns(ll=pl.Series(w * logp[idx]))
            .group_by(id_col)
            .agg(n_tok=pl.col("tf").sum().cast(pl.Int64), ll=pl.col("ll").sum())
        )
        out = agg.to_arrow()
        lp = pa.array(
            np.round(agg["ll"].to_numpy() / agg["n_tok"].to_numpy(), 6)
        )
        out = out.set_column(out.schema.get_field_index("ll"), "logprob", lp)
        return out

    return ds.map_batches(score, batch_format="pyarrow")


# -- column profiling ----------------------------------------------------------


def profile_columns(ds: ray.data.Dataset, cols: tuple) -> ray.data.Dataset:
    """Data-quality profile — row count, null count, min, max per column
    (min/max rendered as strings so one schema covers every column type;
    int renders match SQL ``CAST(x AS VARCHAR)``, string compare is
    binary/codepoint in both Arrow and DuckDB).

    Scale shape: one pass, no value shuffle — per-batch Arrow aggregates
    collapse each block to #cols partial rows, and the merge is a single
    tiny task over #cols × #blocks partials (``repartition(1)``; min/max
    /sum are associative, so a real cluster tree-reduces them). Distinct
    counts deliberately live in ``approx_distinct`` (HyperLogLog) — an
    exact distinct is the one profile stat that NEEDS a value shuffle."""

    def local(t: pa.Table) -> pa.Table:
        # typed wide layout: one row per block, typed min/max per column
        # (stringifying BEFORE the merge would order int renders
        # lexicographically: min("10", "9") = "10")
        import pyarrow.compute as pc

        data = {}
        for col in cols:
            a = t[col]
            data[f"{col}__n"] = pa.array([len(a)], pa.int64())
            data[f"{col}__nn"] = pa.array([a.null_count], pa.int64())
            data[f"{col}__min"] = pa.array([pc.min(a).as_py()], a.type)
            data[f"{col}__max"] = pa.array([pc.max(a).as_py()], a.type)
        return pa.table(data)

    def merge(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out_c, out_n, out_nn, out_mn, out_mx = [], [], [], [], []
        for col in cols:
            mn = pc.min(t[f"{col}__min"]).as_py()
            mx = pc.max(t[f"{col}__max"]).as_py()
            out_c.append(col)
            out_n.append(pc.sum(t[f"{col}__n"]).as_py())
            out_nn.append(pc.sum(t[f"{col}__nn"]).as_py())
            out_mn.append(None if mn is None else str(mn))
            out_mx.append(None if mx is None else str(mx))
        return pa.table(
            {
                "col": pa.array(out_c, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "n_null": pa.array(out_nn, pa.int64()),
                "min_v": pa.array(out_mn, pa.string()),
                "max_v": pa.array(out_mx, pa.string()),
            }
        )

    return (
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )


def top_terms_sketch(
    ds: ray.data.Dataset,
    k: int = 50,
    cap: int = 4096,
    text_col: str = "text",
) -> ray.data.Dataset:
    """EXACT global top-k terms (same output contract and SQL oracle as
    :func:`top_terms`) via two passes and NO vocabulary-sized shuffle —
    the 100-TB heavy-hitters plan (Misra–Gries / SpaceSaving family,
    public streaming-algorithms literature):

    **Pass 1** — per-batch Misra–Gries sketches (≤ ``cap`` counters:
    exact batch counts, decremented by the (cap+1)-th largest so at most
    ``cap`` survive), merged by summing counters and re-trimming. Only
    sketch rows ever move (≤ cap per block), never the vocabulary. The
    decrement total rides along as a null-term sentinel row: any term
    ABSENT from the merged sketch has true count ≤ that total (the MG
    guarantee, made exact by explicit bookkeeping).

    **Pass 2** — the ≤ cap candidate terms broadcast once; one streaming
    scan counts exactly those terms (vectorized ``is_in``), a single
    tiny merge ranks them. If the k-th exact count exceeds the decrement
    total, the result is PROVABLY the exact global top-k; otherwise
    (adversarially flat distributions / cap too small) the operator
    logs and falls back to the exact shuffle plan — so the output is
    always exact, and the fallback is observable."""
    import logging

    import polars as pl
    import pyarrow.compute as pc

    def mg_partial(t: pa.Table) -> pa.Table:
        c = (
            pl.from_arrow(t[text_col])
            .rename("t")
            .to_frame()
            .select(term=pl.col("t").str.extract_all(TOKEN_RE))
            .explode("term")
            .drop_nulls("term")
            .group_by("term")
            .len(name="n")
        )
        if len(c) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        n = c["n"].cast(pl.Int64).to_numpy()
        terms = c["term"].to_arrow().cast(pa.string())
        offset = 0
        if len(c) > cap:
            order = np.argsort(-n, kind="stable")
            offset = int(n[order[cap]])
            keep = n > offset
            terms = terms.filter(pa.array(keep))
            n = n[keep] - offset
        out_terms = list(terms.to_pylist()) + [None]
        out_n = list(np.asarray(n, dtype=np.int64)) + [offset]
        return pa.table(
            {"term": pa.array(out_terms, pa.string()),
             "n": pa.array(np.asarray(out_n, dtype=np.int64), pa.int64())}
        )

    def mg_merge(t: pa.Table) -> pa.Table:
        g = t.group_by("term").aggregate([("n", "sum")]).rename_columns(
            ["term", "n"]
        )
        null_mask = pc.is_null(g["term"])
        dec_total = int(
            pc.sum(g.filter(null_mask)["n"]).as_py() or 0
        )
        terms_t = g.filter(pc.invert(null_mask))
        n = terms_t["n"].to_numpy(zero_copy_only=False)
        terms = terms_t["term"]
        if len(terms_t) > cap:
            order = np.argsort(-n, kind="stable")
            offset = int(n[order[cap]])
            keep = n > offset
            terms = terms.filter(pa.array(keep))
            n = n[keep] - offset
            dec_total += offset
        out_terms = list(terms.to_pylist()) + [None]
        out_n = list(np.asarray(n, dtype=np.int64)) + [dec_total]
        return pa.table(
            {"term": pa.array(out_terms, pa.string()),
             "n": pa.array(np.asarray(out_n, dtype=np.int64), pa.int64())}
        )

    sketch = (
        ds.map_batches(mg_partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(8)
        .map_batches(mg_merge, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(mg_merge, batch_format="pyarrow", batch_size=None)
        .take_all()  # ≤ cap+1 rows by construction — sketch-sized
    )
    candidates = [r["term"] for r in sketch if r["term"] is not None]
    dec_total = sum(r["n"] for r in sketch if r["term"] is None)
    if not candidates:
        return ray.data.from_arrow(
            pa.table({"term": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64())})
        )
    import ray as _ray

    cand_ref = _ray.put(pl.Series("c", candidates))

    def exact_partial(t: pa.Table) -> pa.Table:
        key = cand_ref.hex()
        cand = _CAND_CACHE.get(key)
        if cand is None:
            _CAND_CACHE.clear()
            cand = _CAND_CACHE[key] = _ray.get(cand_ref)
        c = (
            pl.from_arrow(t[text_col])
            .rename("t")
            .to_frame()
            .select(term=pl.col("t").str.extract_all(TOKEN_RE))
            .explode("term")
            .drop_nulls("term")
            .filter(pl.col("term").is_in(cand))
            .group_by("term")
            .len(name="n")
        )
        return pa.table(
            {"term": c["term"].to_arrow().cast(pa.string()),
             "n": c["n"].cast(pl.Int64).to_arrow()}
        )

    def final_rank(t: pa.Table) -> pa.Table:
        g = t.group_by("term").aggregate([("n", "sum")]).rename_columns(
            ["term", "n"]
        )
        g = g.sort_by([("n", "descending"), ("term", "ascending")])
        top = g.slice(0, k)
        kth = (
            int(top["n"][top.num_rows - 1].as_py()) if top.num_rows else 0
        )
        # provably exact iff the sketch never decremented (whole vocab
        # captured) OR a full k rows exist and the k-th exceeds the
        # decrement total (no absent term can outrank it)
        if dec_total > 0 and (top.num_rows < k or kth <= dec_total):
            return pa.table(
                {"term": pa.array(["__MG_FALLBACK__"], pa.string()),
                 "n": pa.array([-1], pa.int64()),
                 "rank": pa.array([-1], pa.int64())}
            )
        return top.append_column(
            "rank", pa.array(np.arange(1, top.num_rows + 1), pa.int64())
        )

    out = (
        ds.map_batches(exact_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .repartition(1)
        .map_batches(final_rank, batch_format="pyarrow", batch_size=None)
        .take_all()  # ≤ k rows
    )
    if out and out[0]["term"] == "__MG_FALLBACK__":
        logging.getLogger(__name__).warning(
            "top_terms_sketch: k-th count ≤ decrement total %d (cap=%d "
            "too small for this distribution) — falling back to the "
            "exact vocabulary-shuffle plan", dec_total, cap,
        )
        return top_terms(ds, k=k, text_col=text_col)
    return ray.data.from_arrow(
        pa.table(
            {"term": pa.array([r["term"] for r in out], pa.string()),
             "n": pa.array([r["n"] for r in out], pa.int64()),
             "rank": pa.array([r["rank"] for r in out], pa.int64())}
        )
    )


# per-process broadcast cache for the sketch candidate list
_CAND_CACHE: dict = {}
