"""Shared fixtures: one SparkSession per test session, a DuckDB
connection with the synthetic tables registered, and an oracle-compare
helper mirroring the driver's check (row count + schema width +
order-insensitive value comparison)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aces_nifi_processors_bundle_spark.session import get_spark  # noqa: E402
from aces_nifi_processors_bundle_spark.sources.registry import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="aces-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str):
    """Order-insensitive, column-name-sorted value comparison."""
    cols = sorted(spark_df.columns)
    spark_rows = sorted(
        tuple(_norm(r[c]) for c in cols) for r in spark_df.collect()
    )
    cur = duck_con.execute(oracle_sql)
    duck_cols = [d[0] for d in cur.description]
    assert sorted(duck_cols) == cols, f"columns differ: {sorted(duck_cols)} vs {cols}"
    idx = [duck_cols.index(c) for c in cols]
    duck_rows = sorted(tuple(_norm(row[i]) for i in idx) for row in cur.fetchall())
    assert len(spark_rows) == len(duck_rows), (
        f"row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
        assert a == b, f"row {i} differs:\n  spark : {a}\n  oracle: {b}"
