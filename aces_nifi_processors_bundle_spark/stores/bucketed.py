"""Bucketed managed tables — shuffle-free co-located joins.

The KeyedParquetStore co-locates a KEY with its bucket for incremental
writes; this layer does the same for JOINS: two tables bucketed (and
sorted) by the join key into the same bucket count join with NO
exchange on either side — Spark reads bucket i of both tables into the
same task. At 100 TB, joining a fact table to an enriched dimension
both bucketed on the key turns the dominant shuffle of the pipeline
into a local merge per bucket.

Uses Spark's session catalog (works with the in-memory catalog — no
Hive metastore needed); tables are managed parquet under
spark.sql.warehouse.dir. The bucketing metadata is what the planner
needs to elide the exchange — plain directory layout (like the keyed
store) is invisible to the join planner, which is why this is a
separate write path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    """Save as a managed parquet table bucketed (and sorted) by keys.

    Sorting within buckets lets the join skip its per-task sort too
    (SortMergeJoin reads both sides pre-sorted)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, keys: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. With equal
    bucket counts the plan has no Exchange on either side (asserted in
    tests/test_stores.py by reading the physical plan)."""
    return spark.table(left_table).join(spark.table(right_table), keys, how)
