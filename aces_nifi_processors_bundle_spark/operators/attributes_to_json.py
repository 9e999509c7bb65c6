"""O1 — typed projection of string attributes into typed columns + JSON.

Reference: BetterAttributesToJSON (json/BetterAttributesToJSON.java:55,
core :194-337, trigger :339-372). The NiFi processor takes a FlowFile's
Map<String,String> attributes and seven comma-separated config lists
declaring which attribute becomes which type, then serializes the typed
map as a JSON body.

Spark mapping: the "attribute bag" is a DataFrame of string columns;
each config list compiles to cast/coalesce/date_format/from_json column
expressions — one declarative select, fully inside whole-stage codegen.

Defaulting semantics (exact, per reference):
- string: missing → ""            (BetterAttributesToJSON.java:216)
- boolean: missing → false        (:234-236, Boolean.parseBoolean)
- int / double / date: missing → null  (:250, :265, :289)
- present-but-unparseable int/double/date: the reference throws
  NumberFormatException per record → failure relationship (:368-371).
  We detect it declaratively (value non-null but cast null) and route.

Array-sum attributes (:295-335): JSON-encoded numeric arrays reduced to
their sum. The reference's integer path has a guard bug (:316 re-checks
the double list); we implement the intended guard — see SURVEY.md §2.3.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import (
    mongo_extended_date,
    array_sum_double,
    array_sum_int,
    epoch_millis_to_iso,
    java_parse_boolean,
)
from .routing import Routed, route_by


@dataclass
class AttributesToJsonConfig:
    """The seven csv config lists (BetterAttributesToJSON.java:65-140).

    Attribute names are trimmed at config-parse time, mirroring the
    per-token trim in the reference (:211). Empty ``string_attrs`` plus
    ``include_all_when_empty`` projects every column as string
    (:221-223).
    """

    string_attrs: list[str] = field(default_factory=list)
    bool_attrs: list[str] = field(default_factory=list)
    int_attrs: list[str] = field(default_factory=list)
    double_attrs: list[str] = field(default_factory=list)
    epoch_date_attrs: list[str] = field(default_factory=list)
    double_array_sum_attrs: list[str] = field(default_factory=list)
    int_array_sum_attrs: list[str] = field(default_factory=list)
    include_all_when_empty: bool = True
    mongo_extended_dates: bool = False
    emit_json_body: bool = False

    def __post_init__(self) -> None:
        for f_ in (
            "string_attrs", "bool_attrs", "int_attrs", "double_attrs",
            "epoch_date_attrs", "double_array_sum_attrs", "int_array_sum_attrs",
        ):
            setattr(self, f_, [a.strip() for a in getattr(self, f_) if a.strip()])


def _get(df: DataFrame, attr: str) -> Column:
    """Attribute fetch: missing column ≡ missing attribute (→ null)."""
    return F.col(attr) if attr in df.columns else F.lit(None).cast("string")


def attributes_to_json(df: DataFrame, cfg: AttributesToJsonConfig) -> Routed:
    """Apply the typed projection; returns success/failure routed frames.

    Failure rows are those where a declared int/double/date attribute is
    present but unparseable (Java parseInt/parseLong would throw —
    BetterAttributesToJSON.java:248,263,281); everything else succeeds.
    """
    out_cols: list[Column] = []
    fail_checks: list[Column] = []

    if cfg.string_attrs:
        for a in cfg.string_attrs:
            out_cols.append(F.coalesce(_get(df, a).cast("string"), F.lit("")).alias(a))
    elif cfg.include_all_when_empty:
        declared = set(
            cfg.bool_attrs + cfg.int_attrs + cfg.double_attrs
            + cfg.epoch_date_attrs + cfg.double_array_sum_attrs + cfg.int_array_sum_attrs
        )
        for a in df.columns:
            if a not in declared:
                out_cols.append(F.coalesce(F.col(a).cast("string"), F.lit("")).alias(a))

    for a in cfg.bool_attrs:
        out_cols.append(java_parse_boolean(_get(df, a)).alias(a))

    for a in cfg.int_attrs:
        src = _get(df, a)
        cast = F.trim(src).try_cast("int")
        out_cols.append(cast.alias(a))
        fail_checks.append(src.isNotNull() & cast.isNull())

    for a in cfg.double_attrs:
        src = _get(df, a)
        cast = F.trim(src).try_cast("double")
        out_cols.append(cast.alias(a))
        fail_checks.append(src.isNotNull() & cast.isNull())

    for a in cfg.epoch_date_attrs:
        src = _get(df, a)
        if cfg.mongo_extended_dates:
            # the shared helper null-propagates: a missing epoch is a
            # plain null, never {"$date": null}
            out_cols.append(mongo_extended_date(src).alias(a))
        else:
            out_cols.append(epoch_millis_to_iso(src).alias(a))
        fail_checks.append(src.isNotNull() & F.trim(src).try_cast("long").isNull())

    # a PRESENT but unparseable JSON array routes to failure like the
    # reference (Jackson's readValue throws JsonProcessingException —
    # an IOException — caught into REL_FAILURE); silently emitting a
    # NULL sum into success accepted garbage
    for a in cfg.double_array_sum_attrs:
        src = _get(df, a)
        out_cols.append(array_sum_double(src).alias(a))
        fail_checks.append(
            src.isNotNull() & F.from_json(src, "array<double>").isNull()
        )
    for a in cfg.int_array_sum_attrs:
        src = _get(df, a)
        out_cols.append(array_sum_int(src).alias(a))
        fail_checks.append(
            src.isNotNull() & F.from_json(src, "array<int>").isNull()
        )

    projected = df.select(*out_cols) if not fail_checks else None
    if fail_checks:
        any_fail = fail_checks[0]
        for c in fail_checks[1:]:
            any_fail = any_fail | c
        tagged = df.select(*out_cols, any_fail.alias("_fail"))
        routed = route_by(
            tagged, F.when(F.col("_fail"), "failure").otherwise("success"),
            ["success", "failure"],
        )
        result = Routed({rel: f.drop("_fail") for rel, f in routed.frames.items()})
    else:
        result = Routed({"success": projected, "failure": projected.limit(0)})

    if cfg.emit_json_body:
        for rel in list(result.frames):
            f = result.frames[rel]
            # ignoreNullFields=false: the reference's Jackson writes
            # explicit nulls (BetterAttributesToJSON.java:250 puts
            # null values in the map); Spark's default would DROP the
            # key — and DuckDB's to_json keeps nulls, so this also
            # aligns the oracle comparison
            result.frames[rel] = f.withColumn(
                "json_body",
                F.to_json(
                    F.struct(*f.columns), {"ignoreNullFields": "false"}
                ),
            )
    return result
