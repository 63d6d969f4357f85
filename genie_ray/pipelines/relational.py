"""Relational operator pipelines over the test star schema.

Each function demonstrates one operator family from SURVEY.md §2 as an
idiomatic Ray Data pipeline over the driver's Parquet tables, and has an
exactly-matching DuckDB oracle in ``__ray_entry__.oracle_sql`` (column
names included). Vectorized pyarrow.compute bodies throughout; joins
broadcast the small side; aggregates pre-combine per batch before the
shuffle where profitable.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _read(sf_dir: str, table: str, columns: List[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# per-worker-process cache for broadcast dimension tables (lets map stages
# run as stateless tasks on any free CPU instead of reserved actor pools)
_DIM_CACHE: dict = {}


def _to_arrow(ds: ray.data.Dataset) -> pa.Table:
    """Materialize a SMALL (dimension-sized) dataset as one Arrow table."""
    import ray as _ray

    return pa.concat_tables(_ray.get(ds.to_arrow_refs())).combine_chunks()


# -- filters (M4 / M5 / M6: value-set keep/drop semantics) -------------------


def filter_keep(sf_dir: str) -> ray.data.Dataset:
    """Keep rows whose flag is in an allow-set (reference matching-status
    filter, `datasets.py:157-169`)."""
    keep = pa.array(["A", "R"])
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"])
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t["l_returnflag"], value_set=keep)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def filter_drop(sf_dir: str) -> ray.data.Dataset:
    """Drop rows whose type is in a drop-set (reference relations-drop
    filter, `datasets.py:171-185`)."""
    drop = pa.array(["click", "view"])
    ds = _read(sf_dir, "events", ["event_id", "event_type", "user_id"])
    return ds.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t["event_type"], value_set=drop))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# -- aggregates (G7 counts; G1-G3-style partial+final sums) ------------------


def group_counts(sf_dir: str) -> ray.data.Dataset:
    """Occurrence counting (reference relation-occurrence counter,
    `surface_forms_utils.py:11-24`): partial counts per batch, then a tiny
    groupby-sum — the pre-aggregation pattern."""
    ds = _read(sf_dir, "events", ["event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([("event_type", "count")])
        return g.rename_columns(["event_type", "n_partial"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = partials.groupby("event_type").sum("n_partial")
    return out.map_batches(
        lambda t: t.rename_columns(["event_type", "n"]), batch_format="pyarrow"
    )


def group_agg(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-shaped grouped aggregate with batch-local combine before
    the shuffle; float sums rounded to 2dp for engine-exact comparison."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"],
    )
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ("l_quantity", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "p_qty", "p_price", "p_n"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .sum(["p_qty", "p_price", "p_n"])
        .to_pandas()
    )
    out = out.rename(
        columns={"sum(p_qty)": "sum_qty", "sum(p_price)": "sum_price", "sum(p_n)": "n"}
    )
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_price"] = out["sum_price"].round(2)
    out["n"] = out["n"].astype("int64")
    return out[["l_returnflag", "l_linestatus", "sum_qty", "sum_price", "n"]]


# -- joins (J3 broadcast hash join; J4 anti-join) ----------------------------


def join_enrich(sf_dir: str) -> ray.data.Dataset:
    """orders ⋈ customer on custkey — broadcast the small dimension side
    via ray.put as ARROW ARRAYS, probed per batch with vectorized
    ``pc.index_in`` + ``pc.take`` (no per-row Python; reference id-keyed
    join semantics, `evaluation.py:96-126`; broadcast strategy per
    SURVEY.md §2.4 J1). This query DEMONSTRATES the broadcast pattern;
    above broadcast size the same join runs through the native hash join —
    see ``q5_region_revenue``, which routes customer exactly that way."""
    cust = _to_arrow(
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    )
    lookup_ref = ray.put(
        (cust["c_custkey"], cust["c_name"], cust["c_mktsegment"])
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    class Join:
        def __init__(self):
            self.keys, self.names, self.segments = ray.get(lookup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t["o_custkey"], value_set=self.keys)
            out = t.append_column("c_name", pc.take(self.names, idx))
            out = out.append_column("c_mktsegment", pc.take(self.segments, idx))
            # inner-join semantics: null index = miss (null mask rows drop)
            return out.filter(pc.is_valid(idx))

    return orders.map_batches(Join, batch_format="pyarrow", concurrency=2)


def join_shuffle(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ lineitem on orderkey via Ray Data's native hash join —
    the big-side⋈big-side path where a broadcast won't fit (contrast
    ``join_enrich``'s broadcast map-side join). Aggregated per order so
    the result is compact: revenue = sum(extendedprice) per order over
    'O'-status orders."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "O")).select(["o_orderkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    joined = orders.join(
        items, join_type="inner", num_partitions=16,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )
    out = (
        joined.groupby("o_orderkey")
        .sum("l_extendedprice")
        .to_pandas()
        .rename(columns={"sum(l_extendedprice)": "revenue"})
    )
    out["revenue"] = out["revenue"].round(2)
    return out[["o_orderkey", "revenue"]]


def anti_join_unique(sf_dir: str, num_buckets: int = 32) -> ray.data.Dataset:
    """Keys occurring exactly once — single-lineitem orders (the
    reference's title-dedup shape: collisions removed entirely,
    `utils.py:39-104` / SURVEY.md §2.4 J4).

    Manual hash-shuffle aggregation: batch-local Arrow ``group_by`` counts
    + a bucket column (key mod 2^k), then ``groupby(bucket)`` merges each
    bucket's partials with one in-memory ``group_by``. The wide step sorts
    only ``num_buckets`` distinct values instead of range-sorting ~150k
    keys — measured 3× faster than the direct key groupby at sf0.1 (a
    plain batch-local combine WITHOUT bucketing was slower than direct:
    the global key sort still dominated)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey"])
    mask = pa.scalar(num_buckets - 1, pa.int64())  # num_buckets must be 2^k

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("l_orderkey").aggregate([("l_orderkey", "count")])
        g = g.rename_columns(["l_orderkey", "n"])
        b = pc.bit_wise_and(g["l_orderkey"], mask)
        return g.append_column("bucket", b.cast(pa.int32()))

    def merge(g: pa.Table) -> pa.Table:
        t = g.group_by("l_orderkey").aggregate([("n", "sum")])
        return t.filter(pc.equal(t["n_sum"], 1)).select(["l_orderkey"])

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return parts.groupby("bucket").map_groups(merge, batch_format="pyarrow")


def session_windows(
    sf_dir: str, gap_minutes: int = 30, num_buckets: int = 32
) -> ray.data.Dataset:
    """Gap-based sessionization of the event log: a user's events belong
    to one session while consecutive gaps stay under ``gap_minutes``.

    Scale shape (the ``user_running`` pattern): users are hash-bucketed,
    so the ONE shuffle is a bounded-cardinality groupby — never a
    per-user group. Inside each bucket a single vectorized polars kernel
    (sort → gap diff ``over(user_id)`` → ``cum_sum`` session ids → one
    group_by) sessionizes every user in the bucket at once; at millions
    of users the old per-user pandas ``map_groups`` callback was
    millions of tiny Python frames (the round-3 VERDICT's #2 item).
    Partitioning contract: a BUCKET of users fits a task — raise
    ``num_buckets`` with user count."""
    import polars as pl

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    gap_us = gap_minutes * 60 * 1_000_000
    mask = num_buckets - 1  # num_buckets must be 2^k

    def assign(t: pa.Table) -> pa.Table:
        h = pl.from_arrow(t.select(["user_id"]))["user_id"].hash(seed=11)
        bucket = (h.to_numpy() & np.uint64(mask)).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket, pa.int32()))

    def sessions(g: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(g.drop_columns(["bucket"]))
            .sort(["user_id", "ts"])
            .with_columns(
                new_s=(
                    (pl.col("ts") - pl.col("ts").shift(1).over("user_id"))
                    .dt.total_microseconds()
                    > gap_us
                ).fill_null(True)
            )
            .with_columns(sid=pl.col("new_s").cum_sum().over("user_id"))
        )
        out = (
            df.group_by(["user_id", "sid"])
            .agg(
                session_start=pl.col("ts").min(),
                session_end=pl.col("ts").max(),
                n_events=pl.len().cast(pl.Int64),
                sum_value=pl.col("value").sum(),
            )
            .drop("sid")
        )
        t = out.to_arrow()
        # numpy round matches DuckDB round(x, 2) representation (same
        # note as user_running)
        sv = pa.array(np.round(out["sum_value"].to_numpy(), 2))
        uid = t["user_id"]
        if pa.types.is_large_string(uid.type):  # polars strings round-trip
            uid = uid.cast(pa.string())         # as large_string
        return pa.table(
            {
                "user_id": uid,
                "session_start": t["session_start"],
                "session_end": t["session_end"],
                "n_events": t["n_events"].cast(pa.int64()),
                "sum_value": sv,
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(sessions, batch_format="pyarrow")
    )


def q5_region_revenue(
    sf_dir: str, supplier_broadcast_limit: int = 2_000_000
) -> pd.DataFrame:
    """TPC-H-Q5-shaped multi-join: revenue per nation of one region over a
    date window. Plan: every FACT-SCALED table goes through Ray's native
    hash join — orders ⋈ CUSTOMER (customer is 150k×sf rows, far too big
    to broadcast at 100×), then ⋈ lineitem on orderkey. True DIMENSIONS
    (region/nation — fixed 5/25 rows — and supplier via the size-threshold
    switch) are broadcast once as Arrow arrays and probed with vectorized
    ``pc.index_in``/``pc.take`` (no per-row Python), with a batch-local
    combine before the final tiny groupby."""
    import ray

    # dims (driver-side, tiny): nations of region ASIA; name lookup
    region = _read(sf_dir, "region").to_pandas()
    nation = _read(sf_dir, "nation").to_pandas()
    asia = set(region[region["r_name"] == "ASIA"]["r_regionkey"])
    nat = pa.Table.from_pandas(
        nation[nation["n_regionkey"].isin(asia)][["n_nationkey", "n_name"]],
        preserve_index=False,
    ).combine_chunks()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    # supplier is 10k×sf: broadcast below the threshold, native hash join
    # above it (same plan shape as the customer side — supplier becomes a
    # third join stage instead of a plasma dict)
    supplier_join = supp.count() > supplier_broadcast_limit
    if supplier_join:
        supp_tab = None
        dims_ref = ray.put((nat["n_nationkey"], nat["n_name"], None, None))
    else:
        supp_tab = _to_arrow(supp)
        dims_ref = ray.put(
            (nat["n_nationkey"], nat["n_name"], supp_tab["s_suppkey"], supp_tab["s_nationkey"])
        )

    lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1998-01-01"), pa.timestamp("us"))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi))
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # FACT ⋈ FACT #1: orders ⋈ customer through the native hash join — the
    # customer side is never materialized on the driver. Fractional-CPU
    # aggregators: TWO chained join operators run concurrently in this
    # plan, and with default (1-CPU) aggregators their pools can't both
    # schedule on a small node — the executor deadlocks (observed at
    # num_cpus=4). 0.25 CPU × 8 partitions × 2 joins = 4 logical CPUs of
    # reservation, and aggregators are I/O-bound between shuffles anyway.
    join_args = {"aggregator_ray_remote_args": {"num_cpus": 0.25}}
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    # materialize() between the two joins: two LIVE hash-join operators in
    # one streaming plan deadlock on small nodes (each holds its aggregator
    # pool while waiting for the other's output; observed at num_cpus=4
    # even with fractional-CPU aggregators). A join is a full barrier
    # anyway, so staging its compact 2-int-column output in the (spillable,
    # distributed) object store costs residency, not an extra pass — the
    # same staged-shuffle execution Spark/MR use between shuffle stages.
    orders_n = orders.join(
        customer, join_type="inner", num_partitions=8,
        on=("o_custkey",), right_on=("c_custkey",), **join_args,
    ).select_columns(["o_orderkey", "c_nationkey"]).materialize()
    items = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    # FACT ⋈ FACT #2: ⋈ lineitem on orderkey
    joined = orders_n.join(
        items, join_type="inner", num_partitions=8,
        on=("o_orderkey",), right_on=("l_orderkey",), **join_args,
    )
    if supplier_join:
        # big-side supplier: third native hash join on suppkey (barrier
        # between live joins, same deadlock guard as above)
        joined = joined.materialize().join(
            supp, join_type="inner", num_partitions=8,
            on=("l_suppkey",), right_on=("s_suppkey",), **join_args,
        )

    # STATELESS task-based dim apply (per-process broadcast cache, the
    # canonicalize_batch pattern): an actor pool here would RESERVE CPUs
    # alongside the live hash-join aggregator pool and starve the lineitem
    # read tasks on small nodes (observed deadlock at num_cpus=4); tasks
    # share whatever CPUs the executor has free
    def dim_apply(t: pa.Table, dims_ref=dims_ref) -> pa.Table:
        dims = _DIM_CACHE.get(dims_ref.hex())
        if dims is None:
            # only one dims tuple is live per query — keep the cache at
            # one entry so long-lived workers don't pin stale broadcasts
            _DIM_CACHE.clear()
            dims = _DIM_CACHE[dims_ref.hex()] = ray.get(dims_ref)
        nat_keys, nat_names, supp_keys, supp_nations = dims
        # Q5 semantics: customer and supplier in the SAME nation, and
        # that nation inside the region — all vectorized
        if supp_keys is None:  # supplier arrived via the hash join
            s_nation = t["s_nationkey"]
        else:
            s_nation = pc.take(
                supp_nations, pc.index_in(t["l_suppkey"], value_set=supp_keys)
            )
        nat_idx = pc.index_in(t["c_nationkey"], value_set=nat_keys)
        keep = pc.and_(pc.equal(t["c_nationkey"], s_nation), pc.is_valid(nat_idx))
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        out = pa.table(
            {"n_name": pc.take(nat_names, nat_idx), "rev": rev}
        ).filter(keep)  # null keep (miss) drops, like the inner join
        # batch-local combine before the tiny global groupby
        return out.group_by("n_name").aggregate([("rev", "sum")]).rename_columns(
            ["n_name", "p_rev"]
        )

    partials = joined.map_batches(dim_apply, batch_format="pyarrow")
    out = (
        partials.groupby("n_name")
        .sum("p_rev")
        .to_pandas()
        .rename(columns={"sum(p_rev)": "revenue"})
    )
    out["revenue"] = out["revenue"].round(2)
    return out[["n_name", "revenue"]]


def brand_volume(sf_dir: str) -> pd.DataFrame:
    """lineitem ⋈ part (broadcast dimension) → quantity by brand: the
    small-side broadcast join + pre-aggregated groupby pattern."""
    import ray

    part = _to_arrow(_read(sf_dir, "part", ["p_partkey", "p_brand"]))
    brand_ref = ray.put((part["p_partkey"], part["p_brand"]))
    items = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])

    class Apply:
        def __init__(self):
            self.keys, self.brands = ray.get(brand_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t["l_partkey"], value_set=self.keys)
            out = pa.table(
                {"p_brand": pc.take(self.brands, idx), "q": t["l_quantity"]}
            )
            out = out.filter(pc.is_valid(idx))
            return out.group_by("p_brand").aggregate([("q", "sum"), ("q", "count")]).rename_columns(
                ["p_brand", "p_q", "p_n"]
            )

    partials = items.map_batches(Apply, batch_format="pyarrow", concurrency=2)
    out = (
        partials.groupby("p_brand")
        .sum(["p_q", "p_n"])
        .to_pandas()
        .rename(columns={"sum(p_q)": "sum_qty", "sum(p_n)": "n"})
    )
    out["sum_qty"] = out["sum_qty"].round(2)
    out["n"] = out["n"].astype("int64")
    return out[["p_brand", "sum_qty", "n"]]


# -- sort / top-k (O4) -------------------------------------------------------


def topk_orders(sf_dir: str) -> ray.data.Dataset:
    """Global top-10 by price with deterministic tiebreak."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def grouped_top_k(
    ds: ray.data.Dataset,
    k: int,
    group_col: str,
    order_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """Top-k rows per group by ``order_col`` DESC, ties broken by
    ``id_col`` ASC, with a 1-based ``rank`` column (``row_number()``
    semantics). Scale shape: a batch-local top-k prune first — each
    input batch forwards at most k rows per group it contains, so the
    one ``groupby(group)`` shuffle moves O(k · groups · blocks) rows,
    never the corpus — then a per-group final top-k over those
    survivors. Both steps are the same vectorized polars kernel."""
    import polars as pl

    def local_topk(t: pa.Table, with_rank: bool = False) -> pa.Table:
        df = (
            pl.from_arrow(t.select([group_col, order_col, id_col]))
            .sort([order_col, id_col], descending=[True, False])
            .group_by(group_col, maintain_order=True)
            .head(k)
        )
        if with_rank:
            df = df.with_columns(
                rank=pl.int_range(pl.len()).over(group_col).cast(pl.Int64) + 1
            )
        return df.to_arrow()

    pruned = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    return pruned.groupby(group_col).map_groups(
        lambda g: local_topk(g, with_rank=True), batch_format="pyarrow"
    )


def user_running(sf_dir: str, num_buckets: int = 32) -> ray.data.Dataset:
    """Per-user running aggregates over the event stream — the window-
    function family (running ``SUM`` + ``LAG`` delta) the reference's
    per-group statistics imply (SURVEY.md §2.6 G11-adjacent).

    Scale shape: users are hash-bucketed (``num_buckets`` groups), so the
    ONE shuffle is a bounded-cardinality groupby — never a range sort of
    the full (user, ts) composite key. Inside each bucket a single
    vectorized polars window kernel (sort + ``cum_sum``/``shift`` over
    ``user_id``) handles every user in the bucket at once — no per-user
    Python. Same partitioning contract as ``window_tumbling``: a bucket
    (not the corpus) fits a task; raise ``num_buckets`` with user count."""
    import polars as pl

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    mask = num_buckets - 1  # num_buckets must be 2^k

    def assign(t: pa.Table) -> pa.Table:
        h = pl.from_arrow(t.select(["user_id"]))["user_id"].hash(seed=11)
        bucket = (h.to_numpy() & np.uint64(mask)).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket, pa.int32()))

    def windows(g: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(g.drop_columns(["bucket"]))
            .sort(["user_id", "ts", "event_id"])
            .with_columns(
                running_sum=pl.col("value").cum_sum().over("user_id"),
                delta_us=(
                    pl.col("ts") - pl.col("ts").shift(1).over("user_id")
                ).dt.total_microseconds(),
            )
        )
        t = df.to_arrow()
        # numpy round (scale-rint-descale) lands on the same double
        # representation as DuckDB round(x, 2); pc.round does not
        # (e.g. 13.530000000000001 vs 13.53) — same choice as
        # window_tumbling's pandas .round
        rs = pa.array(np.round(df["running_sum"].to_numpy(), 2))
        return t.set_column(
            t.schema.get_field_index("running_sum"), "running_sum", rs
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(windows, batch_format="pyarrow")
    )


def _source_lang_finest(
    sf_dir: str, with_chars: bool, num_buckets: int = 8
) -> pd.DataFrame:
    """Finest-level (source, lang) aggregate for the ROLLUP/CUBE/pivot
    family: batch-local Arrow partials, ONE bounded hash-bucket shuffle,
    per-bucket Arrow merge. Deliberately NOT ``ds.groupby([keys])``:
    Ray's sort-based groupby comparator rejects NULL grouping keys
    (``'<' not supported``), while Arrow ``group_by`` and the polars row
    hash both treat null as an ordinary value — so null-keyed corpora
    aggregate instead of crashing (SQL semantics)."""
    import polars as pl

    cols = ["source", "lang"] + (["n_chars"] if with_chars else [])
    ds = _read(sf_dir, "documents", cols)
    mask = num_buckets - 1  # num_buckets must be 2^k
    aggs = [([], "count_all")] + ([("n_chars", "sum")] if with_chars else [])
    names = ["source", "lang", "n"] + (["sum_chars"] if with_chars else [])
    sums = ["n"] + (["sum_chars"] if with_chars else [])

    def partial(t: pa.Table) -> pa.Table:
        p = t.group_by(["source", "lang"]).aggregate(aggs).rename_columns(names)
        h = pl.from_arrow(p.select(["source", "lang"])).hash_rows(
            seed=11
        ).to_numpy()
        return p.append_column(
            "bucket", pa.array((h & np.uint64(mask)).astype(np.int32))
        )

    def merge(g: pa.Table) -> pa.Table:
        return (
            g.drop_columns(["bucket"])
            .group_by(["source", "lang"])
            .aggregate([(c, "sum") for c in sums])
            .rename_columns(["source", "lang"] + sums)
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket", num_partitions=max(1, num_buckets // 2))
        .map_groups(merge, batch_format="pyarrow")
        .to_pandas()
    )


def rollup_stats(sf_dir: str) -> pd.DataFrame:
    """``GROUP BY ROLLUP (source, lang)`` over documents: count + total
    chars at every rollup level. Scale shape: the corpus is touched ONCE
    — batch-local Arrow ``group_by`` partials, one tiny
    ``groupby(source, lang)`` over #source×#lang partial rows — and the
    coarser levels (per-source, grand total) are re-aggregated from that
    finest-level table, which is aggregate-sized, not corpus-sized."""
    finest = _source_lang_finest(sf_dir, with_chars=True)
    per_source = (
        finest.groupby("source", as_index=False, dropna=False)[
            ["n", "sum_chars"]
        ]
        .sum()
        .assign(lang=None)
    )
    total = pd.DataFrame(
        [{"source": None, "lang": None,
          "n": finest["n"].sum(), "sum_chars": finest["sum_chars"].sum()}]
    )
    out = pd.concat([finest, per_source, total], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out[["source", "lang", "n", "sum_chars"]]


def left_join_nulls(sf_dir: str) -> ray.data.Dataset:
    """orders LEFT OUTER JOIN its returned lineitems — the
    miss-preserving join variant: orders with NO 'R'-flag items survive
    with a null right payload, which the per-order valid-count turns
    into ``n_ret = 0``. Runs through Ray Data's native hash join
    (``left_outer``) with both sides big — the realistic 100-TB shape
    for an outer join (a dim-sized right side would take the broadcast
    path of ``join_enrich`` with misses kept instead of filtered).
    Post-join aggregation is batch-local Arrow valid-count partials,
    then a sum over #orders partial rows."""
    orders = _read(sf_dir, "orders", ["o_orderkey"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_quantity"])
    items = items.map_batches(
        lambda t: t.filter(pc.equal(t["l_returnflag"], "R")).select(
            ["l_orderkey", "l_quantity"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # hash-shuffle cost tracks input BLOCK count, not bytes (see
    # BASELINE.md round-3 headline fix): coalesce the small parquet
    # read's 64 splits before the exchange — 2.2x on this query at sf0.1
    orders = orders.repartition(8)
    items = items.repartition(8)
    joined = orders.join(
        items, join_type="left_outer", num_partitions=16,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def per_partition(t: pa.Table) -> pa.Table:
        # Arrow count mode 'only_valid': misses (null l_quantity) -> 0
        return (
            t.group_by(["o_orderkey"])
            .aggregate([("l_quantity", "count")])
            .rename_columns(["o_orderkey", "n_ret"])
        )

    # The hash join already co-partitioned output by o_orderkey (one
    # block per partition, all rows of a key in one block), so the
    # post-join aggregate is a BLOCK-LOCAL Arrow group_by
    # (batch_size=None = whole blocks) — no second shuffle. Measured 4 s
    # faster than a global groupby of the partials at sf0.1. Invariant:
    # size num_partitions so each join partition fits one block.
    return joined.map_batches(
        per_partition, batch_format="pyarrow", batch_size=None
    )


# -- distinct (G9 / D4) ------------------------------------------------------


def distinct_pairs(sf_dir: str) -> ray.data.Dataset:
    ds = _read(sf_dir, "documents", ["lang", "source"])
    out = ds.groupby(["lang", "source"]).count()
    return out.map_batches(
        lambda t: t.select(["lang", "source"]), batch_format="pyarrow"
    )


# -- JSON scalar extraction (reference M10-style record parsing) -------------


def props_extract(sf_dir: str) -> ray.data.Dataset:
    """Parse the JSON ``props`` column and project a field — the scalar
    JSON-parse family (reference dump-record parsing,
    `process_wikidata_dump.py:66`), vectorized per batch."""
    import json

    ds = _read(sf_dir, "events", ["event_id", "props"])

    def extract(t: pa.Table) -> pa.Table:
        ks = []
        for p in t["props"].to_pylist():
            try:
                v = json.loads(p).get("k") if p else None
            except (ValueError, AttributeError):
                v = None
            ks.append(v)
        return pa.table(
            {"event_id": t["event_id"], "k": pa.array(ks, pa.int64())}
        )

    return ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)


# -- windowed aggregate over the event log (streaming-shaped) ----------------


def window_tumbling(sf_dir: str, num_buckets: int = 32) -> pd.DataFrame:
    """1-hour tumbling window per user over the events log: window
    assignment is a row-local Arrow ``floor_temporal`` (zero-copy, no
    pandas), then a BUCKETED grouped aggregate — the shuffle keys on
    ``window-hour mod num_buckets`` (a vectorized int) and each bucket
    aggregates its (user, window) groups with one in-memory Arrow
    ``group_by``, instead of range-sorting the full composite
    (string, timestamp) key — measured 2× faster at sf0.1, identical
    output. Partitioning assumption: the log spans many hours (true for
    event telemetry); a corpus concentrated in < num_buckets hours should
    salt the bucket with a user-id hash. No per-batch pre-aggregation:
    (user, window) is near-unique per row here, so a combiner would
    shuffle the same volume and pay an extra pass."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    mask = pa.scalar(num_buckets - 1, pa.int64())  # num_buckets must be 2^k
    hour_us = pa.scalar(3_600_000_000, pa.int64())

    def assign(t: pa.Table) -> pa.Table:
        ws = pc.floor_temporal(t["ts"], unit="hour")
        bucket = pc.bit_wise_and(pc.divide(ws.cast(pa.int64()), hour_us), mask)
        return pa.table(
            {
                "user_id": t["user_id"],
                "window_start": ws,
                "value": t["value"],
                "bucket": bucket.cast(pa.int32()),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        t = g.group_by(["user_id", "window_start"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return t.rename_columns(["user_id", "window_start", "n", "sum_value"])

    win = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        win.groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out[["user_id", "window_start", "n", "sum_value"]]


def window_hopping(sf_dir: str, num_buckets: int = 32) -> pd.DataFrame:
    """1-hour HOPPING windows (30-min hop) per user over the events log —
    the overlapping-window sibling of ``window_tumbling``: every event
    belongs to exactly size/hop = 2 windows, materialized row-locally as
    a vectorized 2-way fan-out (int64 timestamp arithmetic, one concat,
    no per-row Python), then the identical bucketed grouped aggregate.
    The fan-out happens BEFORE the shuffle, so the exchange carries
    size/hop × rows — bounded and known, the standard distributed
    hopping-window shape (overlap factor is the price of the semantics,
    not of the engine)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    mask = pa.scalar(num_buckets - 1, pa.int64())  # num_buckets must be 2^k
    hop_us = 1_800_000_000  # 30 min
    n_windows = 2  # size / hop

    def assign(t: pa.Table) -> pa.Table:
        ts_t = t["ts"].type
        ts_i = t["ts"].cast(pa.int64())
        w0 = pc.multiply(pc.divide(ts_i, hop_us), hop_us)
        outs = []
        for k in range(n_windows):
            ws = pc.subtract(w0, k * hop_us)
            outs.append(
                pa.table(
                    {
                        "user_id": t["user_id"],
                        "window_start": ws.cast(ts_t),
                        "value": t["value"],
                        "bucket": pc.bit_wise_and(
                            pc.divide(ws, hop_us), mask
                        ).cast(pa.int32()),
                    }
                )
            )
        return pa.concat_tables(outs)

    def merge(g: pa.Table) -> pa.Table:
        t = g.group_by(["user_id", "window_start"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return t.rename_columns(["user_id", "window_start", "n", "sum_value"])

    win = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        win.groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out[["user_id", "window_start", "n", "sum_value"]]


def cube_stats(sf_dir: str) -> pd.DataFrame:
    """``GROUP BY CUBE (source, lang)`` over documents — all four grouping
    sets. Same scale shape as ``rollup_stats``: the corpus is touched once
    (batch-local partials, one tiny finest-level shuffle) and the three
    coarser sets re-aggregate from the aggregate-sized finest table; CUBE
    adds the per-lang set ROLLUP lacks."""
    finest = _source_lang_finest(sf_dir, with_chars=True)
    # dropna=False: data rows with NULL source/lang must still reach the
    # subtotal sets (SQL GROUP BY CUBE keeps null keys as ordinary
    # values). NOTE the remaining documented divergence: in the OUTPUT a
    # NULL key is ambiguous between "total row" and "data null" — SQL
    # disambiguates with GROUPING(); consumers needing that on
    # null-keyed inputs should add a grouping-id column.
    per_source = (
        finest.groupby("source", as_index=False, dropna=False)[
            ["n", "sum_chars"]
        ]
        .sum()
        .assign(lang=None)
    )
    per_lang = (
        finest.groupby("lang", as_index=False, dropna=False)[
            ["n", "sum_chars"]
        ]
        .sum()
        .assign(source=None)
    )
    total = pd.DataFrame(
        [{"source": None, "lang": None,
          "n": finest["n"].sum(), "sum_chars": finest["sum_chars"].sum()}]
    )
    out = pd.concat([finest, per_source, per_lang, total], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out[["source", "lang", "n", "sum_chars"]]


def pivot_counts(sf_dir: str) -> pd.DataFrame:
    """Pivot documents to a wide per-source table with one column per
    language (doc counts; absent combinations 0) — the reshape step of
    reporting pipelines. Distributed shape: identical to the finest-level
    aggregate above (one tiny shuffle); the pivot itself happens on the
    aggregate-sized result, never on the corpus. The language column set
    must be small and known — a wide pivot over unbounded keys belongs in
    a (key, value) long table instead."""
    finest = _source_lang_finest(sf_dir, with_chars=False)
    langs = ["de", "en", "es", "fr", "zh"]  # fixed domain: stable schema
    extra = sorted(set(finest["lang"].dropna()) - set(langs))
    if extra:
        # observable truncation (same posture as the LSH bucket caps):
        # langs outside the fixed pivot domain are dropped from the wide
        # table, never silently
        import logging

        logging.getLogger(__name__).warning(
            "pivot_counts: %d langs outside the fixed column domain "
            "dropped from the pivot: %s", len(extra), extra,
        )
    wide = (
        finest.pivot_table(index="source", columns="lang", values="n",
                           aggfunc="sum", fill_value=0)
        .reindex(columns=langs, fill_value=0)  # absent langs still present
        .reset_index()
    )
    wide.columns = ["source"] + [f"n_{c}" for c in wide.columns[1:]]
    for c in wide.columns[1:]:
        wide[c] = wide[c].astype("int64")
    return wide
