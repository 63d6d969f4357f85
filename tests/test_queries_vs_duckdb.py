"""Mirror of the driver's correctness gate: run every ``queries()`` entry
at sf0.001 and compare to its ``oracle_sql()`` via DuckDB — columns sorted
by name, rows sorted, exact values (what an order-insensitive value-hash
sees). Rows-only queries must run and produce a stable schema."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t)}.parquet'"
        )
    return c


def to_pandas(result):
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(ray_session, con, name):
    got = canon(to_pandas(QUERIES[name](SF_DIR)))
    want = canon(con.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    # check_exact: the driver compares via value HASHES — bit-exact floats
    # required (caught a banker's-vs-half-away rounding divergence once)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_every_query_has_an_oracle():
    """Round-3 invariant: zero rows-only queries — every operator in the
    driver contract is hash-checked against an oracle."""
    assert set(QUERIES) - set(ORACLES) == set()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_q5_supplier_join_branch_matches_oracle(ray_session, con):
    """Force the supplier size-threshold to 0 so supplier routes through
    the native hash join (the >2M-row cluster-scale branch) — must still
    match the DuckDB oracle exactly."""
    from genie_ray.pipelines.relational import q5_region_revenue

    got = canon(q5_region_revenue(SF_DIR, supplier_broadcast_limit=0))
    want = canon(con.sql(ORACLES["q5_region_revenue"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
