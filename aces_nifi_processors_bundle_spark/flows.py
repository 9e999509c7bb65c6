"""Declarative flow assembly — the NiFi flow-definition analog.

The reference isn't used as one processor at a time: operators are
wired on the NiFi canvas into a flow (source → processors →
relationships → sinks) defined by configuration, not code. This module
is that layer for the Spark engine: a flow is a JSON-able list of
stage dicts, each naming a registered stage kind plus its config, and
``build_flow`` folds them into ONE DataFrame plan — so a whole
configured flow still gets whole-plan Catalyst optimization (pushdown
through every stage, one shuffle set), which per-processor execution
in NiFi structurally cannot do.

Stage kinds mirror the reference surface:

  {"op": "load",        "table": "events"}
  {"op": "filter",      "condition": "event_id % 10 != 0"}
  {"op": "select",      "columns": ["event_id", "ts", "event_type"]}
  {"op": "attrs_to_json", "relationship": "success", ...O1 config}
  {"op": "security_marking", "relationship": "success", ...O2 config}
  {"op": "bin",         "binners": [{"kind": "date", ...}, ...]}
  {"op": "bin_count",   "binners": [...]}
  {"op": "sql",         "query": "SELECT ... FROM __this__"}

Routed operators take a ``relationship`` key selecting which port
continues down the flow — the analog of connecting a downstream
processor to one relationship.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from .operators.attributes_to_json import AttributesToJsonConfig, attributes_to_json
from .operators.binning import (
    BinnerConfig,
    DateBinner,
    GeoTileBinner,
    LiteralBinner,
    MergedBinner,
    NumericBinner,
    bin_count,
    bin_records,
)
from .operators.security_marking import SecurityMarkingConfig, convert_security_marking
from .sources.registry import load_table

_BINNER_KINDS: dict[str, type[BinnerConfig]] = {
    "date": DateBinner,
    "literal": LiteralBinner,
    "numeric": NumericBinner,
    "geotile": GeoTileBinner,
    "merged": MergedBinner,
}


def _binners(specs: list[dict[str, Any]]) -> list[BinnerConfig]:
    out = []
    for spec in specs:
        spec = dict(spec)
        kind = spec.pop("kind")
        out.append(_BINNER_KINDS[kind](**spec))
    return out


StageFn = Callable[..., DataFrame]
STAGES: dict[str, StageFn] = {}


def stage(name: str) -> Callable[[StageFn], StageFn]:
    def register(fn: StageFn) -> StageFn:
        STAGES[name] = fn
        return fn
    return register


@stage("load")
def _load(spark: SparkSession, df: DataFrame | None, *, table: str, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, table)


@stage("filter")
def _filter(spark: SparkSession, df: DataFrame, *, condition: str) -> DataFrame:
    return df.filter(condition)


@stage("select")
def _select(spark: SparkSession, df: DataFrame, *, columns: list[str]) -> DataFrame:
    return df.selectExpr(*columns)


@stage("sql")
def _sql(spark: SparkSession, df: DataFrame, *, query: str) -> DataFrame:
    # Unique view name per stage so concurrent flows in one session
    # can't clobber each other; the config still just says __this__.
    import uuid

    view = f"__this_{uuid.uuid4().hex[:12]}"
    df.createOrReplaceTempView(view)
    return spark.sql(query.replace("__this__", view))


@stage("attrs_to_json")
def _attrs(
    spark: SparkSession, df: DataFrame, *, relationship: str = "success", **cfg: Any
) -> DataFrame:
    return attributes_to_json(df, AttributesToJsonConfig(**cfg))[relationship]


@stage("security_marking")
def _marking(
    spark: SparkSession,
    df: DataFrame,
    *,
    relationship: str = "success",
    marking_col: str,
    **cfg: Any,
) -> DataFrame:
    return convert_security_marking(df, marking_col, SecurityMarkingConfig(**cfg))[
        relationship
    ]


@stage("bin")
def _bin(
    spark: SparkSession, df: DataFrame, *, binners: list[dict[str, Any]], **kw: Any
) -> DataFrame:
    return bin_records(df, _binners(binners), **kw)


@stage("bin_count")
def _bin_count(
    spark: SparkSession, df: DataFrame, *, binners: list[dict[str, Any]]
) -> DataFrame:
    return bin_count(df, _binners(binners))


def build_flow(
    spark: SparkSession, flow: list[dict[str, Any]], sf_dir: str
) -> DataFrame:
    """Fold a stage list into one DataFrame plan. ``load`` stages get
    ``sf_dir`` injected; the result is lazy — callers write/collect."""
    df: DataFrame | None = None
    for i, spec in enumerate(flow):
        spec = dict(spec)
        op = spec.pop("op")
        if op not in STAGES:
            raise KeyError(f"stage {i}: unknown op {op!r}; have {sorted(STAGES)}")
        if op == "load":
            spec.setdefault("sf_dir", sf_dir)
        if df is None and op != "load":
            raise ValueError(f"stage {i}: flow must start with a 'load' stage")
        df = STAGES[op](spark, df, **spec)
    if df is None:
        raise ValueError("empty flow")
    return df
