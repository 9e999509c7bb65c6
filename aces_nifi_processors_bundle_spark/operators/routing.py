"""Multi-way routed outputs — the NiFi "relationship" model in Spark.

Each reference processor emits to named ports: success/failure
(BetterAttributesToJSON.java:142-145), success/success-unmodified/
original/failure (PartialUpdateMongo.java:65-72), success/failure/
already-exists (PutMongoWithDuplicateCheck.java:56-61), bin/original/
failure (DataBinningProcessor.java:85-96).

Spark mapping (SURVEY.md §1.2): one input DataFrame → N filtered
DataFrames. We compute a single ``_route`` column once and filter per
relationship, so Catalyst sees one shared subplan; per-row exceptions
become declarative validation predicates (try-cast-style null checks),
which is both deterministic and vectorizable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROUTE_COL = "_route"


@dataclass
class Routed:
    """Named relationship → DataFrame mapping."""

    frames: dict[str, DataFrame] = field(default_factory=dict)

    def __getattr__(self, name: str) -> DataFrame:
        key = name.replace("_", "-")
        try:
            return self.frames[key]
        except KeyError:
            raise AttributeError(f"no relationship {key!r}; have {sorted(self.frames)}")

    def __getitem__(self, key: str) -> DataFrame:
        return self.frames[key]

    def relationships(self) -> list[str]:
        return sorted(self.frames)


def route_by(df: DataFrame, route_expr: Column, relationships: list[str]) -> Routed:
    """Split ``df`` into one frame per relationship by a route expression.

    The route column is computed once; each output is a filter over the
    same cached logical subtree (Catalyst reuses the exchange under AQE).
    """
    # TOTALITY guard (lazy): in the NiFi model every FlowFile lands
    # on some relationship — a NULL route (a when() with no otherwise)
    # or a value missing from `relationships` previously appeared in
    # NO output frame, vanishing silently. raise_error at first
    # evaluation instead.
    checked = F.when(
        route_expr.isin(relationships), route_expr
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"route_by: route value not in {relationships}: "),
                F.coalesce(route_expr.cast("string"), F.lit("NULL")),
            )
        )
    )
    tagged = df.withColumn(ROUTE_COL, checked)
    return Routed(
        {rel: tagged.filter(tagged[ROUTE_COL] == rel).drop(ROUTE_COL) for rel in relationships}
    )


def write_routed(df: DataFrame, route_expr: Column, base_path: str) -> None:
    """Persist every relationship in ONE pass: partitionBy the route
    column, so `base_path/_route=<relationship>/` holds that port's
    rows. The NiFi success/failure/original connection fan-out costs N
    sink writes per processor; here the upstream plan executes once and
    the split is a partitioned write, not N filtered re-computations.
    Downstream consumers read a single relationship with partition
    pruning: `spark.read.parquet(base).filter(col('_route') == 'x')`.
    """
    (
        df.withColumn(ROUTE_COL, route_expr)
        .write.mode("overwrite")
        .partitionBy(ROUTE_COL)
        .parquet(base_path)
    )
