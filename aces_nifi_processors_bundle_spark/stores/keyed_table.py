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

Write protocol: merge/put_if_absent compute into a STAGING directory
next to the table (one pass over the plan — this also fires the
observe metrics), then commit per-bucket with atomic Hadoop
FileSystem renames. Nothing is pinned in executor storage memory, so
a merge touching every bucket of a 100 TB table streams through the
normal shuffle/write path; the commit step moves directory entries
only. Per-bucket rename atomicity mirrors the reference's per-document
atomicity from MongoDB (PartialUpdateMongo.java:431-454); a crash
mid-commit leaves each bucket either old or new, never mixed — the
one non-atomic window (old renamed out, new not yet in) is repaired by
the next writer's recovery pass, which restores any displaced
`.old-…--_bucket=N` dir whose bucket is missing. (On object stores
without atomic rename, gate on Delta MERGE instead — the operator
semantics and metrics carry over unchanged.)

Concurrency: parquet has no transaction log, so writers are serialized
by a create-exclusive `.lock` file with a stale-timeout — a second
concurrent writer fails fast with ConcurrentWriterError instead of
corrupting buckets.
"""

from __future__ import annotations

import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..operators.partial_update import PartialUpdateConfig, partial_update
from ..operators.put_if_absent import tag_put_if_absent
from ..operators.routing import ROUTE_COL
from ..provenance import ProvenanceLog

BUCKET_COL = "_bucket"


class ConcurrentWriterError(RuntimeError):
    """A second writer holds the store's lock (fail-fast, no corruption)."""


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
    # A writer crashing mid-merge leaves its lock behind; a later writer
    # may break locks older than this (seconds).
    lock_stale_sec: float = 3600.0

    def _bucket_of(self) -> Column:
        return F.pmod(F.xxhash64(*[F.col(k) for k in self.keys]), F.lit(self.n_buckets))

    # --- filesystem commit layer (Hadoop FS: works on local + HDFS) ----

    def _fs(self):
        jvm = self.spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(self.path)
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        return jpath.getFileSystem(conf), jvm.org.apache.hadoop.fs.Path

    @contextmanager
    def _write_lock(self):
        """Create-exclusive lock file serializing writers (fail-fast)."""
        fs, Path = self._fs()
        lock = Path(self.path + ".lock")
        if fs.exists(lock):
            age = time.time() - fs.getFileStatus(lock).getModificationTime() / 1000.0
            if age < self.lock_stale_sec:
                raise ConcurrentWriterError(
                    f"store {self.path} is locked by another writer "
                    f"({age:.0f}s old; stale after {self.lock_stale_sec:.0f}s)"
                )
            fs.delete(lock, False)  # break a stale lock from a dead writer
        if not fs.createNewFile(lock):
            raise ConcurrentWriterError(f"store {self.path}: lost lock race")
        try:
            self._gc_stale_staging(fs, Path)
            yield
        finally:
            fs.delete(lock, False)

    def _gc_stale_staging(self, fs, Path) -> None:
        """Crash recovery, run under the freshly-acquired lock.

        1. Staging dirs from a writer that died before commit: readers
           never saw them (commit is the rename step) — delete when
           older than the stale window.
        2. Displaced `.old-…--_bucket=N` dirs: these exist only inside
           a live commit's replace window. If the real bucket dir is
           MISSING, the writer died between rename-out and rename-in
           and the displaced dir holds the only copy — restore it.
           Otherwise the commit completed (or the new dir landed) and
           the displaced copy is garbage — delete it. Either way every
           bucket ends up whole: old or new, never absent."""
        parent = Path(self.path).getParent()
        prefix = Path(self.path).getName() + ".staging-"
        for entry in fs.listStatus(parent):
            name = entry.getPath().getName()
            if not name.startswith(prefix):
                continue
            age = time.time() - entry.getModificationTime() / 1000.0
            if age >= self.lock_stale_sec:
                fs.delete(entry.getPath(), True)
        for entry in fs.listStatus(Path(self.path)):
            name = entry.getPath().getName()
            if not (name.startswith(".old-") and "--" in name):
                continue
            bucket_dir = name.split("--", 1)[1]
            dst = Path(f"{self.path}/{bucket_dir}")
            if fs.exists(dst):
                fs.delete(entry.getPath(), True)
            else:
                fs.rename(entry.getPath(), dst)

    def _commit_staging(self, staging: str, append: bool) -> None:
        """Move staged bucket output into the table, bucket-atomically.

        replace (merge): old bucket dir renamed aside, new renamed in,
        old deleted — a reader never sees a half-written bucket.
        append (put_if_absent): staged part-files moved INTO existing
        bucket dirs (Spark part names carry a task UUID, collision-free).
        """
        fs, Path = self._fs()
        st = Path(staging)
        for entry in fs.listStatus(st):
            name = entry.getPath().getName()
            if not name.startswith(f"{BUCKET_COL}="):
                continue  # _SUCCESS and friends
            dst = Path(f"{self.path}/{name}")
            if append and fs.exists(dst):
                for f_ in fs.listStatus(entry.getPath()):
                    fs.rename(f_.getPath(), Path(f"{self.path}/{name}/{f_.getPath().getName()}"))
            elif fs.exists(dst):
                # Dot-prefixed: hidden from Hadoop/Spark listings, so a
                # concurrent reader's partition discovery can never pick
                # up the displaced old bucket as a bogus partition value.
                # The bucket name rides after `--` so crash recovery
                # (_gc_stale_staging) can restore it if we die before
                # the rename-in below.
                old = Path(f"{self.path}/.old-{uuid.uuid4().hex}--{name}")
                fs.rename(dst, old)
                fs.rename(entry.getPath(), dst)
                fs.delete(old, True)
            else:
                fs.rename(entry.getPath(), dst)
        fs.delete(st, True)

    def init(self, df: DataFrame) -> None:
        """Full (re)write of the table, bucketed by key hash."""
        out = df.withColumn(BUCKET_COL, self._bucket_of())
        self._bucketed_write(out).mode("overwrite").partitionBy(BUCKET_COL).parquet(
            self.path
        )

    @staticmethod
    def _bucketed_write(out: DataFrame):
        # partitionBy alone emits one file per (input partition × bucket)
        # — a small-files explosion (32 tasks × 64 buckets = 2048 files
        # per write). Repartitioning on the bucket column first makes
        # each task own whole buckets: one file per bucket per write,
        # and the write parallelism scales with n_buckets, which is the
        # store's sizing knob at scale.
        return out.repartition(F.col(BUCKET_COL)).write

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

        The LOCK covers the target read too, not just the write:
        `spark.read.parquet` snapshots the file listing eagerly, so
        planning the read outside the lock would both race a concurrent
        writer's commit (read-modify-write on a stale snapshot) and
        run before crash recovery has restored any displaced bucket.
        """
        assert cfg.keys == self.keys, "merge keys must match store keys"
        with self.provenance.send(self.path, detail="merge") as ctx, self._write_lock():
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
            # The merge plan reads the same path it rewrites; Spark
            # (correctly) refuses overwrite-while-reading. Writing to a
            # staging dir sidesteps that with ONE pass over the plan
            # (which also fires the observe metrics) and, unlike an
            # eager localCheckpoint, never pins the touched buckets'
            # post-state in executor storage memory — the result streams
            # through the normal write path. Commit = per-bucket renames.
            staging = f"{self.path}.staging-{uuid.uuid4().hex}"
            self._bucketed_write(out).mode("overwrite").partitionBy(BUCKET_COL).parquet(
                staging
            )
            m = obs.get
            self._commit_staging(staging, append=False)
            ctx["n_rows"] = int(m["updated"] or 0) + int(m["inserted"] or 0)
        return MergeMetrics(
            updated=int(m["updated"] or 0),
            unmodified=int(m["unmodified"] or 0),
            inserted=int(m["inserted"] or 0),
        )

    def compact(self, min_files: int = 2) -> int:
        """Rewrite buckets fragmented by put_if_absent appends into one
        file each (the Delta OPTIMIZE analog). Only buckets with ≥
        min_files part-files are touched — compaction work scales with
        fragmentation, not table size. Returns rewritten-bucket count.
        Runs under the writer lock: readers keep seeing either the old
        file set or the new single file, per-bucket atomically."""
        fs, Path = self._fs()
        root = Path(self.path)
        with self._write_lock():  # fragmentation scan under the lock too
            frag = []
            for entry in fs.listStatus(root):
                name = entry.getPath().getName()
                if not name.startswith(f"{BUCKET_COL}="):
                    continue
                n = sum(
                    1
                    for f_ in fs.listStatus(entry.getPath())
                    if f_.getPath().getName().endswith(".parquet")
                )
                if n >= min_files:
                    frag.append(int(name.split("=", 1)[1]))
            if not frag:
                return 0
            staging = f"{self.path}.staging-{uuid.uuid4().hex}"
            out = (
                self.spark.read.parquet(self.path)
                .filter(F.col(BUCKET_COL).isin(frag))
                .repartition(F.col(BUCKET_COL))
            )
            out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staging)
            self._commit_staging(staging, append=False)
        return len(frag)

    def put_if_absent(
        self, source: DataFrame, order_col: str | None = None
    ) -> MergeMetrics:
        """Duplicate-checked insert: append first-occurrence-new-key
        rows; existing buckets are never rewritten. Returns counts
        (inserted / already-exists) from the observed append job.
        Lock covers the duplicate-check read (see merge)."""
        with self.provenance.send(self.path, detail="put-if-absent") as ctx, self._write_lock():
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
            staging = f"{self.path}.staging-{uuid.uuid4().hex}"
            self._bucketed_write(out).mode("overwrite").partitionBy(BUCKET_COL).parquet(
                staging
            )
            m = obs.get
            self._commit_staging(staging, append=True)
            ctx["n_rows"] = int(m["inserted"] or 0)
        return MergeMetrics(
            updated=0,
            unmodified=int(m["dupes"] or 0),
            inserted=int(m["inserted"] or 0),
        )
