"""Slowly-changing-dimension maintenance (SCD Type 2) as a pure
DataFrame transform.

The reference's keyed-store operators overwrite in place ($set,
PartialUpdateMongo.java:277-429) — history is lost. SCD2 is the
warehouse-standard alternative: every attribute change CLOSES the
key's open row (stamps valid_to) and appends a new open version, so
point-in-time queries (`valid_from <= t AND (valid_to IS NULL OR
t < valid_to)`) reconstruct any past state. Pairs naturally with
KeyedParquetStore.init()/time-travel: apply → init is one atomic
manifest publish of the new dimension state.

Scale shape: one full-outer equi-join of the OPEN rows against the
batch on the natural key (historical rows never join — they union
straight through), null-safe change detection in codegen, no window
functions, no UDFs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    batch: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    effective_ts_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Fold one batch into an SCD2 dimension; returns the new state.

    `current` columns: keys + compare_cols + (valid_from, valid_to,
    is_current); `batch` columns: keys + compare_cols +
    effective_ts_col — ONE row per key (pre-combine a multi-row batch
    with max_by upstream, as the store's merge does).

    Per key: new key → open row; open row whose compare_cols differ
    (null-safe) → close it at the batch timestamp and append a new
    open version; unchanged or absent from the batch → untouched.
    Historical (closed) rows always pass through unchanged; a NULL
    is_current counts as closed (it would otherwise match neither
    filter and silently vanish).

    Preconditions enforced loudly: a NULL effective_ts raises (a
    data-null presence marker would silently drop the row), and a
    batch timestamp EARLIER than the open row's valid_from raises —
    stamping valid_to < valid_from would make that version
    unmatchable by the point-in-time predicate and backdate the new
    one; out-of-order batches need event-time reprocessing, not a
    silent fold.
    """
    cur = F.coalesce(F.col(is_current), F.lit(False))
    if not keys or not compare_cols:
        raise ValueError(
            f"scd2_apply: keys and compare_cols must be non-empty "
            f"(got keys={keys!r}, compare_cols={compare_cols!r})"
        )
    open_rows = current.filter(cur)
    hist_rows = current.filter(~cur)
    b = batch.select(
        *[F.col(k).alias(f"_b_{k}") for k in keys],
        *[F.col(c).alias(f"_b_{c}") for c in compare_cols],
        F.when(
            F.col(effective_ts_col).isNull(),
            F.raise_error(F.lit("scd2_apply: batch effective_ts is NULL")),
        )
        .otherwise(F.col(effective_ts_col))
        .alias("_b_ts"),
        F.lit(True).alias("_b_present"),
    )
    # eqNullSafe: a NULL natural key must match its own open row —
    # plain == never matches NULL, leaving the old version open AND
    # appending a new opener (two concurrent current rows per key)
    cond = reduce(
        lambda a, c: a & c,
        [F.col(k).eqNullSafe(F.col(f"_b_{k}")) for k in keys],
    )
    j = open_rows.join(b, cond, "full")
    in_batch = F.col("_b_present").isNotNull()
    in_open = F.col(is_current).isNotNull()
    changed: Column = in_open & in_batch & ~reduce(
        lambda a, c: a & c,
        [F.col(c).eqNullSafe(F.col(f"_b_{c}")) for c in compare_cols],
    )

    keep_cols = [*keys, *compare_cols, valid_from, valid_to, is_current]
    ts_type = dict(current.dtypes)[valid_to]
    close_ts = F.when(
        # <= not <: an EQUAL timestamp would close the survivor into
        # the empty interval [T, T) — unreachable by the documented
        # `valid_from <= t AND t < valid_to` predicate, so the old
        # version silently vanished from every point-in-time read.
        # Same-instant versioning needs a finer effective_ts.
        F.col("_b_ts") <= F.col(valid_from),
        F.raise_error(
            F.lit(
                "scd2_apply: batch effective_ts is at or before the open "
                "version's valid_from (out-of-order or same-instant "
                "batch — use a finer-grained effective_ts)"
            )
        ).cast(ts_type),
    ).otherwise(F.col("_b_ts"))
    # open rows: unchanged/un-batched survive as-is; changed close.
    survivors = j.filter(in_open).select(
        *keys,
        *compare_cols,
        F.col(valid_from),
        F.when(changed, close_ts).otherwise(F.col(valid_to)).alias(valid_to),
        F.when(changed, F.lit(False)).otherwise(F.lit(True)).alias(is_current),
    )
    # batch rows opening a new version: brand-new keys or changed attrs
    openers = j.filter(in_batch & (changed | ~in_open)).select(
        *[F.col(f"_b_{k}").alias(k) for k in keys],
        *[F.col(f"_b_{c}").alias(c) for c in compare_cols],
        F.col("_b_ts").alias(valid_from),
        F.lit(None).cast(dict(current.dtypes)[valid_to]).alias(valid_to),
        F.lit(True).alias(is_current),
    )
    return (
        hist_rows.select(*keep_cols)
        .unionByName(survivors)
        .unionByName(openers)
    )
