"""O5 — insert with duplicate detection.

Reference: PutMongoWithDuplicateCheck
(mongodb/PutMongoWithDuplicateCheck.java:54; insert :142-147,
dup-catch :151-157). The NiFi processor insertOne's each record and,
when the primary key already exists, routes the record to an
`already-exists` relationship instead of failing — detected by
string-matching the duplicate-key exception message (:153).

Spark mapping (SURVEY.md §2.3 quirk 5): deterministic joins — strictly
better than exception sniffing, identical observable routing:
- success        = first occurrence of each key within the batch whose
                   key is NOT already in the target
- already-exists = everything else (keys clashing with the target, and
                   later in-batch duplicates — matching the
                   one-at-a-time reference where the second insert of a
                   key hits the dup error)
- post_state     = target ∪ success (no duplicate keys, by construction)

Single-pass shape (one scan of the source): a window row_number over
the keys tags the first-in-batch occurrence, a left join against the
distinct target keys flags target clashes, and one `_route` expression
splits the relationships — the engine's route_by idiom. The window and
the join share the same hash partitioning on the keys, so the source
shuffles once and the join reuses that exchange; the target side ships
only its key columns. (An earlier draft scanned the source three times
— two joins plus an exceptAll set-difference — for the same answer.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .routing import ROUTE_COL, Routed


def tag_put_if_absent(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """The single-pass core: source rows tagged with a `_route` column
    (success | already-exists). Storage layers consume this directly so
    one observed write both appends and counts (stores/keyed_table.py).
    """
    clash = {"_ord", "_rn", "_in_target"} & set(
        set(source.columns) | set(target.columns)
    )
    if clash:
        raise ValueError(
            f"put_if_absent: input carries reserved helper column(s) "
            f"{sorted(clash)} — rename them (they would be overwritten "
            "and dropped)"
        )
    if order_col:
        ordered = source
        w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    else:
        # Window orderBy must be deterministic, so materialize the
        # arbitrary tag as a projected column first.
        ordered = source.withColumn("_ord", F.monotonically_increasing_id())
        w = Window.partitionBy(*keys).orderBy(F.col("_ord").asc())

    tgt_keys = target.select(*keys).dropDuplicates(keys).withColumn(
        "_in_target", F.lit(True)
    )
    return (
        ordered.withColumn("_rn", F.row_number().over(w))
        .join(tgt_keys, keys, "left")
        .withColumn(
            ROUTE_COL,
            F.when(F.col("_in_target").isNotNull(), F.lit("already-exists"))
            .when(F.col("_rn") == 1, F.lit("success"))
            .otherwise(F.lit("already-exists")),
        )
        .drop("_rn", "_in_target", *([] if order_col else ["_ord"]))
    )


def put_if_absent(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> tuple[Routed, DataFrame]:
    """Returns (routed{success, already-exists}, post_state).

    order_col picks the surviving in-batch duplicate deterministically
    (min order wins); without it an arbitrary stable tag is used —
    matching NiFi's nondeterministic arrival order.
    """
    tagged = tag_put_if_absent(target, source, keys, order_col)
    inserted = tagged.filter(F.col(ROUTE_COL) == "success").drop(ROUTE_COL)
    already = tagged.filter(F.col(ROUTE_COL) == "already-exists").drop(ROUTE_COL)

    post_state = target.unionByName(inserted.select(*target.columns))
    return Routed({"success": inserted, "already-exists": already}), post_state
