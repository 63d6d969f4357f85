"""Direct unit tests for the shared bucketed-groupby exchanges
(stages/exchange.py) — the membership (semi/anti) and lookup
(inner/left) joins every iterative/lookup path now rides. Transitive
coverage exists through bloom/curate/canonicalize/jaccard parity tests;
these pin the helper contracts themselves (typed nulls, duplicate keys,
empty sides, schema preservation)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from genie_ray.stages.exchange import (
    bucketed_lookup_join,
    bucketed_membership_join,
)


def _facts(ids, vals, id_type=pa.int64()):
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(ids, id_type),
                "v": pa.array(vals, pa.string()),
            }
        )
    )


def _keys(ids, id_type=pa.int64(), col="kk"):
    return ray.data.from_arrow(pa.table({col: pa.array(ids, id_type)}))


def test_membership_semi_and_anti_partition(ray_session):
    facts = _facts([1, 2, 3, 4, 5], list("abcde")).repartition(3)
    keys = _keys([2, 4, 99]).repartition(2)
    semi = (
        bucketed_membership_join(facts, keys, "k", "kk", how="semi")
        .to_pandas().sort_values("k")
    )
    anti = (
        bucketed_membership_join(facts, keys, "k", "kk", how="anti")
        .to_pandas().sort_values("k")
    )
    assert semi["k"].tolist() == [2, 4] and semi["v"].tolist() == ["b", "d"]
    assert anti["k"].tolist() == [1, 3, 5]
    # fact schema preserved exactly
    assert list(semi.columns) == ["k", "v"]


def test_membership_duplicate_keys_never_multiply(ray_session):
    facts = _facts([1, 2], ["a", "b"])
    keys = _keys([2, 2, 2])
    semi = bucketed_membership_join(facts, keys, "k", "kk", how="semi")
    assert semi.to_pandas()["k"].tolist() == [2]


def test_membership_string_keys_and_empty_key_side(ray_session):
    facts = _facts(["x", "y"], ["a", "b"], id_type=pa.string())
    keys = _keys([], id_type=pa.string())
    anti = bucketed_membership_join(facts, keys, "k", "kk", how="anti")
    assert sorted(anti.to_pandas()["k"].tolist()) == ["x", "y"]


def test_lookup_inner_and_left(ray_session):
    facts = _facts([1, 2, 3], ["a", "b", "c"]).repartition(2)
    lut = ray.data.from_arrow(
        pa.table(
            {
                "lk": pa.array([1, 3], pa.int64()),
                "payload": pa.array([10, 30], pa.int64()),
            }
        )
    )
    inner = (
        bucketed_lookup_join(facts, lut, "k", "lk", how="inner")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert inner["k"].tolist() == [1, 3]
    assert inner["payload"].tolist() == [10, 30]
    assert list(inner.columns) == ["k", "v", "payload"]
    left = (
        bucketed_lookup_join(facts, lut, "k", "lk", how="left")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert left["k"].tolist() == [1, 2, 3]
    assert left["payload"].isna().tolist() == [False, True, False]


def test_lookup_column_collision_rejected(ray_session):
    facts = _facts([1], ["a"])
    lut = ray.data.from_arrow(
        pa.table({"lk": pa.array([1], pa.int64()),
                  "v": pa.array(["clash"], pa.string())})
    )
    with pytest.raises(AssertionError, match="collision"):
        bucketed_lookup_join(facts, lut, "k", "lk")
