"""The local mirror of the driver's correctness gate: every registered
query with an oracle must value-match DuckDB on the same tables."""

from __future__ import annotations

import pytest

from aces_nifi_processors_bundle_spark.plans.oracles import ORACLES
from aces_nifi_processors_bundle_spark.plans.registry import QUERIES

from .conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    assert_matches_oracle(df, duck, ORACLES[name])


def test_every_query_has_oracle_or_reason():
    missing = set(QUERIES) - set(ORACLES)
    # Every registered query is currently SQL-expressible — even the
    # hyperplane-LSH funnel (md5-derived planes as a SQL derived table).
    assert not missing, f"queries lacking oracles: {missing}"
