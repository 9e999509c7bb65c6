"""Multi-dimensional data layout: z-order (Morton) clustering for
data-skipping scans — the OPTIMIZE ZORDER BY analog, without Delta.

Why: parquet scans skip row groups whose column min/max stats exclude
the predicate. A table sorted by ONE column skips well on that column
and not at all on others; interleaving the bits of several columns'
ranks (the Morton curve) clusters rows so that EVERY indexed column's
values are locally narrow — a 2-D/3-D predicate then touches a small
fraction of files instead of all of them. At 100 TB this is the
difference between scanning a terabyte and scanning a partition's
worth.

Mechanics (all deterministic, no UDFs):
1. One multi-column approxQuantile pass computes every column's
   2^bits - 1 range boundaries in a single scan (driver-side
   metadata).
2. The per-row rank is a STATIC sum of `value >= boundary` terms —
   codegen'd comparisons, not an interpreted higher-order fold.
3. The z-value interleaves the rank bits; `repartitionByRange` on it
   range-shuffles rows into files ordered along the curve.

Rank ties (heavy skew onto one boundary) only cost skipping
resolution, never correctness — the z-value orders the WRITE layout;
reads stay plain parquet scans with pushed-down predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank_expr(col: Column, bounds: list[float]) -> Column:
    """Static codegen rank: how many boundaries the value is >=."""
    out = F.lit(0)
    for b in bounds:
        out = out + F.when(col >= F.lit(b), 1).otherwise(0)
    return out


def zorder_value(df: DataFrame, cols: list[str], bits: int = 4) -> Column:
    """Morton z-value column over `cols` (numeric/timestamp): each
    column contributes `bits` bits of its quantile rank, interleaved
    round-robin so every column shares the high-order bits."""
    if bits * len(cols) > 62:
        raise ValueError(
            f"zorder_value: bits*len(cols) = {bits * len(cols)} exceeds 62 "
            "— bit 63 is the long's sign bit (inverting the sort) and "
            "higher shifts wrap; lower `bits` or index fewer columns"
        )
    n_bounds = (1 << bits) - 1
    probs = [(i + 1) / (n_bounds + 1) for i in range(n_bounds)]
    dts = dict(df.dtypes)
    as_dbl = [
        (
            F.unix_micros(F.col(c)) if dts[c].startswith("timestamp") else F.col(c)
        ).cast("double")
        for c in cols
    ]
    # ONE multi-column approxQuantile pass — a single scan computes
    # every column's boundaries (per-column calls would rescan the
    # input len(cols) times).
    qdf = df.select(*[e.alias(f"_q{i}") for i, e in enumerate(as_dbl)])
    all_bounds = qdf.approxQuantile([f"_q{i}" for i in range(len(cols))], probs, 0.001)
    ranks = [
        _rank_expr(e, sorted({b for b in bounds if b is not None}))
        for e, bounds in zip(as_dbl, all_bounds)
    ]
    z = F.lit(0)
    for bit in range(bits):
        for ci, r in enumerate(ranks):
            pos = bit * len(ranks) + ci
            z = z + F.shiftleft(
                F.shiftright(r.cast("long"), bit).bitwiseAND(F.lit(1)), pos
            )
    return z


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 16, bits: int = 4
) -> None:
    """Write `df` as parquet clustered along the z-curve of `cols`:
    range-shuffle on the z-value into `n_files` output partitions
    (AQE-proof explicit count — no small-files explosion), sort
    within each, drop the helper column. The written files carry
    narrow per-column min/max stats on every indexed column, so
    later scans with multi-column predicates skip most row groups."""
    z = zorder_value(df, cols, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist `df` as a BUCKETED (and optionally bucket-sorted)
    external table: rows are hash-partitioned on `key` into
    `n_buckets` files at WRITE time, and the catalog records the
    layout. A later join or aggregation on `key` between two tables
    bucketed the same way runs with ZERO exchange — the shuffle was
    paid once, at write, and every subsequent query reuses it. At
    100 TB this is the difference between re-shuffling the fact table
    per query and never shuffling it at all (pre-partitioned
    co-located joins; see CLUSTER.md).

    The one-file-per-bucket discipline: repartition(n_buckets, key)
    first, so each task holds exactly one bucket's rows and writes one
    file — without it every task emits a file per bucket it touches
    (tasks x buckets small-files explosion).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = (
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
