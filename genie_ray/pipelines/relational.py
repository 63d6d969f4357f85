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
    via ray.put, dict-map per batch (reference id-keyed join semantics,
    `evaluation.py:96-126`; broadcast strategy per SURVEY.md §2.4 J1)."""
    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
        .to_pandas()
    )
    lookup_ref = ray.put(
        {
            k: (n, m)
            for k, n, m in zip(cust["c_custkey"], cust["c_name"], cust["c_mktsegment"])
        }
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    class Join:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["o_custkey"].to_pylist()
            hits = [self.lookup.get(k) for k in keys]
            mask = pa.array([h is not None for h in hits], pa.bool_())
            out = t.append_column(
                "c_name", pa.array([h[0] if h else None for h in hits], pa.string())
            )
            out = out.append_column(
                "c_mktsegment",
                pa.array([h[1] if h else None for h in hits], pa.string()),
            )
            return out.filter(mask)  # inner-join semantics

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


def anti_join_unique(sf_dir: str) -> ray.data.Dataset:
    """Keys occurring exactly once — single-lineitem orders (the
    reference's title-dedup shape: collisions removed entirely,
    `utils.py:39-104` / SURVEY.md §2.4 J4)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey"])
    # no pre-aggregation: ~150k distinct keys over 600k rows spread across
    # blocks means a batch-local combine shrinks little and costs a pass
    # (measured slower than the direct groupby)
    counts = ds.groupby("l_orderkey").count()
    return counts.map_batches(
        lambda t: t.filter(pc.equal(t["count()"], 1)).select(["l_orderkey"]),
        batch_format="pyarrow",
    )


def session_windows(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Gap-based sessionization of the event log: a user's events belong
    to one session while consecutive gaps stay under ``gap_minutes``.
    Ray Data expression: hash-partition by user (``groupby.map_groups``),
    sort each user's events locally by time, split on gap, emit one row
    per session. The partitioning assumption is the documented one for
    this operator family: all events of a user fit one group (true for
    keyed telemetry; a user with unbounded history would need
    day-bucketing first)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("ts", kind="mergesort")
        ts = df["ts"].to_numpy()
        new_session = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new_session[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(new_session)
        g = df.assign(session=sid).groupby("session", as_index=False).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
            sum_value=("value", "sum"),
        )
        g.insert(0, "user_id", df["user_id"].iloc[0])
        return g.drop(columns=["session"])

    out = ds.groupby("user_id").map_groups(sessions, batch_format="pandas").to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out[["user_id", "session_start", "session_end", "n_events", "sum_value"]]


def q5_region_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q5-shaped multi-join: revenue per nation of one region over a
    date window. Plan: the two FACT tables (lineitem ⋈ orders) go through
    Ray's native hash join; every DIMENSION (region→nation→customer/
    supplier) is broadcast driver-side as dicts (tiny), applied map-side,
    with a batch-local combine before the final tiny groupby — the
    canonical big⋈big + broadcast-dims + pre-aggregate shape."""
    import ray

    # dims (driver-side, tiny): nations of region ASIA; name lookup
    region = _read(sf_dir, "region").to_pandas()
    nation = _read(sf_dir, "nation").to_pandas()
    asia = set(region[region["r_name"] == "ASIA"]["r_regionkey"])
    nat = nation[nation["n_regionkey"].isin(asia)]
    nation_name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    cust_nation = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    supp_nation = dict(zip(supp["s_suppkey"], supp["s_nationkey"]))
    dims_ref = ray.put((nation_name, cust_nation, supp_nation))

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
    items = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    joined = orders.join(
        items, join_type="inner", num_partitions=8,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    class DimApply:
        def __init__(self):
            self.nation_name, self.cust_nation, self.supp_nation = ray.get(dims_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            # Q5 semantics: customer and supplier in the SAME nation, and
            # that nation inside the region
            names = []
            keep = []
            for ck, sk in zip(t["o_custkey"].to_pylist(), t["l_suppkey"].to_pylist()):
                cn = self.cust_nation.get(ck)
                keep_row = cn is not None and cn == self.supp_nation.get(sk) and cn in self.nation_name
                keep.append(keep_row)
                names.append(self.nation_name.get(cn) if keep_row else None)
            rev = pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            )
            out = pa.table({"n_name": pa.array(names, pa.string()), "rev": rev})
            out = out.filter(pa.array(keep, pa.bool_()))
            # batch-local combine before the tiny global groupby
            return out.group_by("n_name").aggregate([("rev", "sum")]).rename_columns(
                ["n_name", "p_rev"]
            )

    partials = joined.map_batches(DimApply, batch_format="pyarrow", concurrency=2)
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

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    brand_ref = ray.put(dict(zip(part["p_partkey"], part["p_brand"])))
    items = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])

    class Apply:
        def __init__(self):
            self.brand = ray.get(brand_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            brands = [self.brand.get(k) for k in t["l_partkey"].to_pylist()]
            out = pa.table(
                {"p_brand": pa.array(brands, pa.string()), "q": t["l_quantity"]}
            )
            out = out.filter(pc.is_valid(out["p_brand"]))
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


def window_tumbling(sf_dir: str) -> pd.DataFrame:
    """1-hour tumbling window per user over the events log: window
    assignment is a row-local Arrow ``floor_temporal`` (zero-copy, no
    pandas), then one grouped aggregate — Ray Data's batch expression of a
    streaming tumbling window (ordering assumption: none needed, windows
    are keyed not sequential). No per-batch pre-aggregation: (user,
    window) is near-unique per row here, so a combiner would shuffle the
    same volume and pay an extra pass."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def assign(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "window_start": pc.floor_temporal(t["ts"], unit="hour"),
                "value": t["value"],
            }
        )

    win = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        win.groupby(["user_id", "window_start"])
        .aggregate(
            ray.data.aggregate.Count(),
            ray.data.aggregate.Sum("value"),
        )
        .to_pandas()
        .rename(columns={"count()": "n", "sum(value)": "sum_value"})
    )
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out[["user_id", "window_start", "n", "sum_value"]]
