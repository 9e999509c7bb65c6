"""Scalar conversion functions matching the reference's Java semantics.

All pure Column expressions — JVM-side, whole-stage-codegen eligible.
No Python UDFs: at 100 TB these run inside the codegen'd stage that
also does the parquet scan, so they add no serialization boundary.

Reference semantics encoded here (file:line in /root/reference):
- Boolean.parseBoolean: case-insensitive "true" → true, anything else
  (including null) → false (BetterAttributesToJSON.java:225-239; the
  missing-attribute default is false, not null, per :234-236).
- Epoch-millis date rendering: "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'" in GMT-0
  (BetterAttributesToJSON.java:59-60,271-293), optionally wrapped as
  Mongo extended JSON {"$date": ...} (:283-287).
- JSON-encoded numeric array attributes are parsed then immediately
  reduced to their sum (BetterAttributesToJSON.java:295-335). The
  reference's int-array path has a guard bug (it re-checks the double
  list at :316); we implement the intended semantics (guard on the int
  list) — divergence documented in tests/test_attributes_to_json.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference constant: BetterAttributesToJSON.java:59 (DATE_FORMAT), :60 (GMT-0).
ISO_MILLIS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def java_parse_boolean(col: Column) -> Column:
    """Boolean.parseBoolean semantics: 'true' (any case) → true, else false.

    A plain ``cast('boolean')`` is wrong here: Spark casts '1'/'yes'→null
    but 't'→true; Java yields false for all of those.
    """
    return F.lower(F.coalesce(col, F.lit(""))) == "true"


def epoch_millis_to_iso(col: Column) -> Column:
    """Epoch-millis string/long → "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'" (UTC).

    Null-safe: unparseable or missing input → null (the reference routes
    a NumberFormatException to failure; callers split that route —
    BetterAttributesToJSON.java:277-293).

    Requires spark.sql.session.timeZone=UTC (set by session.get_spark)
    so date_format renders GMT-0 like the reference's DATE_TIME_ZONE.
    """
    millis = col.try_cast("long")
    return F.date_format(F.timestamp_millis(millis), ISO_MILLIS_FMT)


def mongo_extended_date(col: Column) -> Column:
    """Wrap an ISO date string as Mongo extended JSON {"$date": ...};
    a missing/unparseable epoch propagates NULL (the reference's map
    holds a plain null — {"$date": null} would be a different shape).

    Ref: BetterAttributesToJSON.java:283-287 emits {"$date": "<iso>"}.
    """
    iso = epoch_millis_to_iso(col)
    return F.when(iso.isNotNull(), F.struct(iso.alias("$date")))


def array_sum_double(col: Column) -> Column:
    """JSON '[1.5,2.5]' string → sum as double (null if unparseable/missing).

    Ref: BetterAttributesToJSON.java:295-314 (parse Double[] then sum).
    """
    arr = F.from_json(col, "array<double>")
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def array_sum_int(col: Column) -> Column:
    """JSON '[1,2,3]' string → sum as long (null if unparseable/missing).

    Ref: BetterAttributesToJSON.java:316-335 — intended semantics (the
    reference's guard bug is documented in the module docstring).
    """
    # array<int>, not bigint: Java parses Integer[] — a value past
    # INT_MAX is unparseable there (and in the failure-routing guard,
    # which uses the SAME schema; bigint here quietly summed what the
    # guard had already routed to failure)
    arr = F.from_json(col, "array<int>")
    return F.aggregate(
        arr, F.lit(0).cast("bigint"), lambda acc, x: acc + x.cast("bigint")
    )
