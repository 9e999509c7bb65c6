"""Query registry: name → Callable[(SparkSession, sf_dir), DataFrame].

The single source of truth consumed by __spark_entry__.queries().
Every entry here should have a matching oracle in `oracles.ORACLES`
unless genuinely non-SQL-expressible (driver then records a weaker
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import queries as q

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {
    "q_bin_flagship": q.q_bin_flagship,
}


def register(name: str, fn: QueryFn) -> None:
    QUERIES[name] = fn
