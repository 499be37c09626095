from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from sc_crawler_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    # same profile as bench.py: shuffled-hash opt-in, so the plan-guard
    # tests exercise the shapes the bench actually runs
    s = get_spark("sc-crawler-spark-tests", shuffle_partitions=8,
                  prefer_shuffled_hash=True)
    yield s
    s.stop()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's compare: sort columns by name, then sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_oracle_match(spark, name: str, fn, sql: str, sf_dir: str = SF_ORACLE):
    got = canonicalize(fn(spark, sf_dir).toPandas())
    con = duck_con(sf_dir)
    want = canonicalize(con.execute(sql).df())
    con.close()
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} != oracle {len(want)}"
    )
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    # dtype KINDS must agree (int vs float): a strict value-hash would
    # stringify 99111 vs 99111.0 differently even when numerically equal
    kinds_got = [d.kind for d in got.dtypes]
    kinds_want = [d.kind for d in want.dtypes]
    assert kinds_got == kinds_want, (
        f"{name}: dtype kinds {kinds_got} != oracle {kinds_want} "
        f"(cast the oracle aggregate, e.g. SUM -> BIGINT)"
    )
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9,
        obj=name,
    )
