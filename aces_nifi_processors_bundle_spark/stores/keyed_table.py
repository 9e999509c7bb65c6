"""Keyed table store — the persistent-upsert layer behind O4/O5.

Reference: the NiFi processors' entire purpose is incremental writes
into a keyed MongoDB collection — bulk upserts at
PartialUpdateMongo.java:431-454 (UpdateOptions().upsert(true) :446,
unordered :451) and duplicate-checked inserts at
PutMongoWithDuplicateCheck.java:142-157 — with a provenance SEND per
external write (PartialUpdateMongo.java:255,
PutMongoWithDuplicateCheck.java:149).

Spark mapping: a hash-bucketed parquet table (Delta Lake would give
MERGE INTO directly, but this environment ships without it; the store
implements the same contract on stock parquet):

- Layout: rows partitioned by `_bucket = pmod(xxhash64(keys), n)` —
  a stable function of the key, so a key always lives in exactly one
  partition directory.
- merge(batch): the incremental path. Only the buckets containing the
  batch's keys are READ (partition pruning on `_bucket`) and only
  those buckets are REWRITTEN (dynamic partition overwrite). Work per
  batch scales with touched-buckets/total, not table size — the
  property a full-outer-join-and-rewrite-everything approach lacks at
  any real scale. Updates-per-key semantics come from
  operators/partial_update.py ($set/$inc/$addToSet/$currentDate,
  upsert, match-one/many), unchanged.
- put_if_absent(batch): appends only first-occurrence-new-key rows
  (operators/put_if_absent.py single-pass tag); parquet append never
  rewrites existing buckets.
- Routing counts (the modifiedCount analog, PartialUpdateMongo.java:
  253-275) come from `DataFrame.observe` metrics collected DURING the
  single write job — no second pass over the plan — and land in a
  provenance SEND event per merge, mirroring the reference's
  StopWatch-around-send pattern (:458,467-479).

Concurrency note (scale honesty): parquet has no transaction log, so
concurrent merges to the same store require external serialization;
swap the write layer for Delta `MERGE INTO` when available — the
operator semantics and metrics carry over unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..operators.partial_update import PartialUpdateConfig, partial_update
from ..operators.put_if_absent import tag_put_if_absent
from ..operators.routing import ROUTE_COL
from ..provenance import ProvenanceLog

BUCKET_COL = "_bucket"


@dataclass
class MergeMetrics:
    """Per-merge operation metrics (Delta-operation-metrics analog)."""

    updated: int
    unmodified: int
    inserted: int


@dataclass
class KeyedParquetStore:
    spark: SparkSession
    path: str
    keys: list[str]
    n_buckets: int = 64
    provenance: ProvenanceLog = field(default_factory=ProvenanceLog)

    def _bucket_of(self) -> Column:
        return F.pmod(F.xxhash64(*[F.col(k) for k in self.keys]), F.lit(self.n_buckets))

    def init(self, df: DataFrame) -> None:
        """Full (re)write of the table, bucketed by key hash."""
        out = df.withColumn(BUCKET_COL, self._bucket_of())
        out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path).drop(BUCKET_COL)

    def _touched(self, source: DataFrame) -> tuple[list[int], DataFrame]:
        """Bucket ids containing any source key (small driver-side list
        — partition METADATA, bounded by n_buckets, never row data),
        plus the pruned target scan for exactly those buckets."""
        buckets = [
            r[0]
            for r in source.select(self._bucket_of().alias("b")).distinct().collect()
        ]
        target = (
            self.spark.read.parquet(self.path)
            .filter(F.col(BUCKET_COL).isin(buckets))
            .drop(BUCKET_COL)
        )
        return buckets, target

    def merge(self, source: DataFrame, cfg: PartialUpdateConfig) -> MergeMetrics:
        """Incremental partial-update merge: read touched buckets,
        apply operators, rewrite ONLY those buckets, one observed job.
        """
        assert cfg.keys == self.keys, "merge keys must match store keys"
        _, target = self._touched(source)
        res = partial_update(target, source, cfg)
        obs = Observation()
        route = F.col(ROUTE_COL)
        observed = res.merged.observe(
            obs,
            F.sum(F.when(route == "success", 1).otherwise(0)).alias("updated"),
            F.sum(F.when(route == "success-unmodified", 1).otherwise(0)).alias(
                "unmodified"
            ),
            F.sum(F.when(route == "insert", 1).otherwise(0)).alias("inserted"),
        )
        out = (
            observed.filter(route != "drop")
            .drop(ROUTE_COL)
            .withColumn(BUCKET_COL, self._bucket_of())
        )
        with self.provenance.send(self.path, detail="merge") as ctx:
            # The merge plan reads the same path it rewrites; Spark
            # (correctly) refuses overwrite-while-reading, so the merge
            # result materializes first (one compute of the plan — this
            # also fires the observe metrics), then the write streams
            # from the checkpointed blocks.
            materialized = out.localCheckpoint(eager=True)
            m = obs.get
            (
                materialized.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(BUCKET_COL)
                .parquet(self.path)
            )
            materialized.unpersist()
            ctx["n_rows"] = int(m["updated"] or 0) + int(m["inserted"] or 0)
        return MergeMetrics(
            updated=int(m["updated"] or 0),
            unmodified=int(m["unmodified"] or 0),
            inserted=int(m["inserted"] or 0),
        )

    def put_if_absent(
        self, source: DataFrame, order_col: str | None = None
    ) -> MergeMetrics:
        """Duplicate-checked insert: append first-occurrence-new-key
        rows; existing buckets are never rewritten. Returns counts
        (inserted / already-exists) from the observed append job."""
        _, target = self._touched(source)
        tagged = tag_put_if_absent(target, source, self.keys, order_col)
        obs = Observation()
        route = F.col(ROUTE_COL)
        observed = tagged.observe(
            obs,
            F.sum(F.when(route == "success", 1).otherwise(0)).alias("inserted"),
            F.sum(F.when(route == "already-exists", 1).otherwise(0)).alias("dupes"),
        )
        out = (
            observed.filter(route == "success")
            .drop(ROUTE_COL)
            .select(*target.columns)
            .withColumn(BUCKET_COL, self._bucket_of())
        )
        with self.provenance.send(self.path, detail="put-if-absent") as ctx:
            materialized = out.localCheckpoint(eager=True)
            m = obs.get
            materialized.write.mode("append").partitionBy(BUCKET_COL).parquet(self.path)
            materialized.unpersist()
            ctx["n_rows"] = int(m["inserted"] or 0)
        return MergeMetrics(
            updated=0,
            unmodified=int(m["dupes"] or 0),
            inserted=int(m["inserted"] or 0),
        )
