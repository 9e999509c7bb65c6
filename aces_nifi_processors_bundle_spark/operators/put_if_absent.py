"""O5 — insert with duplicate detection.

Reference: PutMongoWithDuplicateCheck
(mongodb/PutMongoWithDuplicateCheck.java:54; insert :142-147,
dup-catch :151-157). The NiFi processor insertOne's each record and,
when the primary key already exists, routes the record to an
`already-exists` relationship instead of failing — detected by
string-matching the duplicate-key exception message (:153).

Spark mapping (SURVEY.md §2.3 quirk 5): a deterministic anti-join /
semi-join split — strictly better than exception sniffing, identical
observable routing:
- inserted       = source rows whose keys are NOT in target (and the
                   first occurrence within the batch; later in-batch
                   duplicates are `already-exists` too, matching the
                   one-at-a-time reference where the second insert of a
                   key hits the dup error)
- already-exists = everything else
- post_state     = target ∪ inserted (no duplicate keys, by construction)

Scale notes: left_anti/left_semi shuffle once on the keys; a small
source batch broadcasts. The in-batch first-occurrence pick is a
window-free groupBy(min(surrogate)) when an ordering column is given,
else dropDuplicates (any-one-wins, which matches NiFi's nondeterministic
arrival order).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .routing import Routed


def put_if_absent(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> tuple[Routed, DataFrame]:
    """Returns (routed{success, already-exists}, post_state)."""
    if order_col:
        w_first = (
            source.groupBy(*keys).agg(F.min(order_col).alias("_first"))
        )
        first_in_batch = source.join(
            w_first,
            [*keys],
        ).filter(F.col(order_col) == F.col("_first")).drop("_first")
    else:
        first_in_batch = source.dropDuplicates(keys)

    inserted = first_in_batch.join(target.select(*keys), keys, "left_anti")
    # already-exists = source minus the inserted rows (key-wise for the
    # target-clash part, row-wise for in-batch later duplicates).
    exists_in_target = source.join(target.select(*keys), keys, "left_semi")
    in_batch_dupes = source.exceptAll(first_in_batch).join(
        target.select(*keys), keys, "left_anti"
    )
    already = exists_in_target.unionByName(in_batch_dupes)

    post_state = target.unionByName(inserted.select(*target.columns))
    return Routed({"success": inserted, "already-exists": already}), post_state
