"""Declarative data-quality validation — the Deequ / dbt-test analog.

A large-scale ingest pipeline needs constraint checking BEFORE data
reaches training or analytics: null fractions, key uniqueness, value
domains, referential integrity. The reference bundle has no such
stage (its NiFi processors assume upstream-validated FlowFiles), but
any production deployment of the same flows puts a validation
processor in front — this module is that stage, Spark-first.

Scale design (the whole point):

- Every ROW-LEVEL constraint (not_null / in_range / accepted_values /
  matches_regex / satisfies) compiles to one conditional-sum column
  in a SINGLE `agg()` over a single scan of the frame — map-side
  partial aggregation, one scalar result row, no per-constraint jobs.
  Adding a 20th constraint costs one more codegen'd sum, not a scan.
- `unique()` adds an exact `count(DISTINCT col)` to the same
  aggregate. Spark plans multi-distinct aggregates with an Expand
  (one input replica per distinct column), so each exact-unique
  constraint multiplies shuffle volume; `approx=True` swaps in
  `approx_count_distinct` (HLL++, mergeable, no Expand) — the 100 TB
  default, with the exact form kept for oracle-checked runs.
- `foreign_key()` is necessarily a second job per parent (left-anti
  join); the parent side ships `broadcast()`-hinted when
  `broadcast=True` (dimension tables), falling back to a shuffled
  anti-join for large parents. Null FK values are NOT violations
  (SQL FK semantics) — pair with `not_null` to forbid them.
- The long-format result is produced JVM-side by exploding an array
  of structs built from the one scalar row — no driver collect, no
  Python loop.

Result schema (one row per constraint):
  constraint string, target string, total bigint, violations bigint,
  metric double (fraction of checked rows passing; 1.0 on empty
  input), passed boolean (violations == 0).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint. `kind` is 'row' (conditional-sum in the shared
    aggregate), 'unique' (distinct-count in the shared aggregate) or
    'fk' (separate anti-join job)."""

    name: str
    target: str
    kind: str
    violated: Column | None = None  # kind == 'row': 1-if-bad predicate
    checked: Column | None = None  # kind == 'row': row participates
    fk_parent: str | None = None  # kind == 'fk': parents[] key
    fk_parent_col: str | None = None
    fk_broadcast: bool = field(default=True)
    group_cols: list[str] | None = None  # kind == 'group'
    group_min: int | None = None


def not_null(col: str) -> Check:
    return Check(
        name=f"not_null({col})",
        target=col,
        kind="row",
        violated=F.col(col).isNull(),
        checked=F.lit(True),
    )


def in_range(
    col: str, lo: float | None = None, hi: float | None = None
) -> Check:
    """lo <= col <= hi over NON-NULL rows (open end = unbounded).
    Null handling is not_null's job — counting nulls here too would
    double-report one bad row under two constraints."""
    if lo is None and hi is None:
        # a bound-less range is an always-passing no-op — almost
        # certainly a misconfigured spec, so fail loudly (dbt/Deequ
        # behavior) instead of green-lighting every value forever
        raise ValueError(f"in_range({col}): need at least one of lo/hi")
    c = F.col(col)
    bad = F.lit(False)
    if lo is not None:
        bad = bad | (c < F.lit(lo))
    if hi is not None:
        bad = bad | (c > F.lit(hi))
    return Check(
        name=f"in_range({col},{lo},{hi})",
        target=col,
        kind="row",
        violated=bad,
        checked=c.isNotNull(),
    )


def accepted_values(col: str, values: list) -> Check:
    # sort the STRINGIFIED values: mixed-type or None-bearing lists
    # raise TypeError under plain sorted(); the name just needs to be
    # deterministic
    vals = ",".join(sorted(str(v) for v in values))
    return Check(
        name=f"accepted_values({col},[{vals}])",
        target=col,
        kind="row",
        violated=~F.col(col).isin(values),
        checked=F.col(col).isNotNull(),
    )


def matches_regex(col: str, pattern: str) -> Check:
    return Check(
        name=f"matches_regex({col})",
        target=col,
        kind="row",
        violated=~F.col(col).rlike(pattern),
        checked=F.col(col).isNotNull(),
    )


def satisfies(name: str, predicate_sql: str, target: str = "*") -> Check:
    """Arbitrary row predicate (dbt `expression_is_true`): violated
    when the SQL expression is not TRUE on a row. NULL predicate
    results count as violations (SQL three-valued logic would
    otherwise let bad rows vanish)."""
    ok = F.expr(predicate_sql)
    return Check(
        name=f"satisfies({name})",
        target=target,
        kind="row",
        violated=~F.coalesce(ok, F.lit(False)),
        checked=F.lit(True),
    )


def unique(col: str) -> Check:
    """Distinctness over non-null rows: violations = rows beyond one
    per distinct value (count - count_distinct); metric =
    distinct/total — Deequ's 'distinctness', not its stricter
    'uniqueness' (#singleton values / total), which needs a value
    histogram rather than one distinct-count."""
    return Check(name=f"unique({col})", target=col, kind="unique")


def min_group_size(cols: list[str], k: int) -> Check:
    """k-anonymity-style constraint: every combination of the
    quasi-identifier columns must cover at least k rows — rows in
    under-k groups are the re-identifiable ones and count as
    violations (so the metric reads 'fraction of rows k-anonymous').
    Runs as ONE separate map-side-combined groupBy job whose output is
    group-cardinality-sized; NULL quasi-identifier values form groups
    like any other value (NULL is itself identifying)."""
    if k < 1:
        raise ValueError(f"min_group_size: k must be >= 1, got {k}")
    if not cols:
        raise ValueError("min_group_size: need at least one column")
    return Check(
        name=f"min_group_size([{','.join(cols)}],{k})",
        target=",".join(cols),
        kind="group",
        group_cols=list(cols),
        group_min=k,
    )


def foreign_key(
    col: str, parent: str, parent_col: str, broadcast: bool = True
) -> Check:
    return Check(
        name=f"foreign_key({col}->{parent}.{parent_col})",
        target=col,
        kind="fk",
        fk_parent=parent,
        fk_parent_col=parent_col,
        fk_broadcast=broadcast,
    )


def run_checks(
    df: DataFrame,
    checks: list[Check],
    parents: dict[str, DataFrame] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Evaluate all checks; one aggregate job for every row/unique
    constraint plus one anti-join job per foreign_key. Returns the
    long-format report ordered by constraint name.

    approx=True replaces exact distinct counts with
    approx_count_distinct (rsd 1%) — the scale path; leave False when
    an exact oracle will compare the numbers.
    """
    parents = parents or {}
    aggs: list[Column] = [F.count(F.lit(1)).alias("__total")]
    for i, ck in enumerate(checks):
        if ck.kind == "row":
            # coalesce: sum() over ZERO rows is NULL, which would
            # propagate into total/violations/passed on empty input.
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(
                            ck.checked & ck.violated, F.lit(1)
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).alias(f"__v{i}")
            )
            aggs.append(
                F.coalesce(
                    F.sum(F.when(ck.checked, F.lit(1)).otherwise(0)),
                    F.lit(0),
                ).alias(f"__t{i}")
            )
        elif ck.kind == "unique":
            c = F.col(ck.target)
            distinct = (
                F.approx_count_distinct(c, 0.01)
                if approx
                else F.count_distinct(c)
            )
            aggs.append(distinct.alias(f"__v{i}"))  # raw distinct count
            aggs.append(F.count(c).alias(f"__t{i}"))  # non-null rows
        elif ck.kind == "fk":
            # Totals for the FK metric come from this same pass; the
            # violation count joins in below.
            aggs.append(F.count(F.col(ck.target)).alias(f"__t{i}"))
        elif ck.kind == "group":
            # totals = all rows (every row belongs to some group); the
            # under-k row count joins in below.
            aggs.append(F.count(F.lit(1)).alias(f"__t{i}"))
        else:  # pragma: no cover - constructor functions fix the kinds
            raise ValueError(f"unknown check kind {ck.kind!r}")
    scalars = df.agg(*aggs)

    # One anti-join job per FK; each yields a 1-row scalar frame that
    # cross-joins (1x1) onto the aggregate row.
    for i, ck in enumerate(checks):
        if ck.kind != "fk":
            continue
        if ck.fk_parent not in parents:
            raise KeyError(
                f"check {ck.name}: parents[] has no frame named "
                f"{ck.fk_parent!r}; have {sorted(parents)}"
            )
        keys = parents[ck.fk_parent].select(
            F.col(ck.fk_parent_col).alias("__pk")
        ).dropDuplicates(["__pk"])
        if ck.fk_broadcast:
            keys = F.broadcast(keys)
        orphans = (
            df.select(F.col(ck.target).alias("__ck"))
            .where(F.col("__ck").isNotNull())
            .join(keys, F.col("__ck") == F.col("__pk"), "left_anti")
            .agg(F.count(F.lit(1)).alias(f"__v{i}"))
        )
        scalars = scalars.crossJoin(orphans)

    # One group-cardinality-sized job per min_group_size check:
    # violations = rows living in groups smaller than k.
    for i, ck in enumerate(checks):
        if ck.kind != "group":
            continue
        under = (
            df.groupBy(*[F.col(c) for c in ck.group_cols])
            .agg(F.count(F.lit(1)).alias("__gn"))
            .agg(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("__gn") < ck.group_min, F.col("__gn")
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).alias(f"__v{i}")
            )
        )
        scalars = scalars.crossJoin(under)

    rows = []
    for i, ck in enumerate(checks):
        total = F.col(f"__t{i}")
        if ck.kind == "unique":
            # Clamp at 0: approx_count_distinct can OVERestimate, and
            # count - distinct would then report negative violations
            # and fail a genuinely unique column. (The exact path is
            # always >= 0; underestimates still produce small spurious
            # counts — the documented rsd trade of approx=True.)
            viol = F.greatest(F.lit(0), total - F.col(f"__v{i}"))
        else:
            viol = F.col(f"__v{i}")
        rows.append(
            F.struct(
                F.lit(ck.name).alias("constraint"),
                F.lit(ck.target).alias("target"),
                total.cast("bigint").alias("total"),
                viol.cast("bigint").alias("violations"),
                F.when(total > 0, 1.0 - viol / total)
                .otherwise(F.lit(1.0))
                .cast("double")
                .alias("metric"),
                (viol == 0).alias("passed"),
            )
        )
    if not rows:
        # F.array() of zero structs is array<void> — star-expanding it
        # fails with a baffling AnalysisException far from the cause
        raise ValueError("run_checks: empty check list")
    return (
        scalars.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("constraint")
    )
