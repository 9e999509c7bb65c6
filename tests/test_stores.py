"""KeyedParquetStore: incremental merge scope, provenance SEND events
(the PartialUpdateMongo.java:255 / PutMongoWithDuplicateCheck.java:149
analogs), and observe-based routing metrics."""

from __future__ import annotations

import glob
import os
import time

import pytest
from pyspark.sql import Row

from aces_nifi_processors_bundle_spark.operators.partial_update import (
    PartialUpdateConfig,
)
from aces_nifi_processors_bundle_spark.stores import KeyedParquetStore
from aces_nifi_processors_bundle_spark.stores.keyed_table import (
    ConcurrentWriterError,
)


def _mtimes(path: str) -> dict[str, float]:
    return {
        d: max(
            os.path.getmtime(f)
            for f in glob.glob(os.path.join(path, d, "*.parquet"))
        )
        for d in os.listdir(path)
        if d.startswith("_bucket=")
    }


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    store = KeyedParquetStore(
        spark=spark, path=str(tmp_path / "t"), keys=["k"], n_buckets=8
    )
    store.init(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(100)]))
    before = _mtimes(store.path)
    time.sleep(1.1)  # parquet mtimes are second-granular on some fs
    cfg = PartialUpdateConfig(keys=["k"], operations={"v": "$set"}, upsert=False)
    m = store.merge(spark.createDataFrame([Row(k=7, v=777.0)]), cfg)
    assert (m.updated, m.unmodified, m.inserted) == (1, 0, 0)
    after = _mtimes(store.path)
    rewritten = [d for d in after if after[d] != before[d]]
    assert len(rewritten) == 1  # k=7 lives in exactly one bucket
    assert store.read().count() == 100
    assert store.read().filter("k = 7").collect()[0]["v"] == 777.0


def test_merge_metrics_and_provenance(spark, tmp_path):
    store = KeyedParquetStore(
        spark=spark, path=str(tmp_path / "t"), keys=["k"], n_buckets=4
    )
    store.init(spark.createDataFrame([Row(k=i, v=float(i), n=0) for i in range(10)]))
    cfg = PartialUpdateConfig(
        keys=["k"], operations={"v": "$set", "n": "$inc"}, upsert=True
    )
    m = store.merge(
        spark.createDataFrame(
            [Row(k=3, v=3.0, n=0),   # $set to current value, $inc 0 → unmodified
             Row(k=4, v=44.0, n=1),  # real update
             Row(k=99, v=9.9, n=1)]  # upsert insert
        ),
        cfg,
    )
    assert (m.updated, m.unmodified, m.inserted) == (1, 1, 1)
    ev = store.provenance.events[-1]
    assert ev.event_type == "SEND" and ev.detail == "merge"
    assert ev.n_rows == 2  # updated + inserted, the modifiedCount analog
    assert store.read().count() == 11


def test_put_if_absent_appends_and_counts(spark, tmp_path):
    store = KeyedParquetStore(
        spark=spark, path=str(tmp_path / "t"), keys=["k"], n_buckets=4
    )
    store.init(spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]))
    before = _mtimes(store.path)
    time.sleep(1.1)
    m = store.put_if_absent(
        spark.createDataFrame(
            [Row(k=2, v="dup"), Row(k=3, v="new"), Row(k=3, v="newer")]
        )
    )
    assert (m.inserted, m.unmodified) == (1, 2)
    after = _mtimes(store.path)
    # append never rewrites pre-existing bucket files
    assert all(after[d] == before[d] for d in before)
    ev = store.provenance.events[-1]
    assert ev.event_type == "SEND" and ev.detail == "put-if-absent"
    assert ev.n_rows == 1
    rows = {r["k"]: r["v"] for r in store.read().collect()}
    assert rows[2] == "b" and rows[3] in {"new", "newer"} and len(rows) == 3


def test_compact_merges_fragmented_buckets(spark, tmp_path):
    """Repeated appends fragment buckets; compact() rewrites only the
    fragmented ones down to one file each, preserving content."""
    store = KeyedParquetStore(
        spark=spark, path=str(tmp_path / "t"), keys=["k"], n_buckets=2
    )
    store.init(spark.createDataFrame([Row(k=i, v=i) for i in range(8)]))
    for batch in range(3):
        store.put_if_absent(
            spark.createDataFrame([Row(k=100 + 2 * batch + j, v=0) for j in range(2)])
        )
    before = store.read().count()

    def files_per_bucket():
        return {
            d: len(glob.glob(os.path.join(store.path, d, "*.parquet")))
            for d in os.listdir(store.path)
            if d.startswith("_bucket=")
        }

    assert max(files_per_bucket().values()) > 1
    n = store.compact()
    assert n >= 1
    assert max(files_per_bucket().values()) == 1
    assert store.read().count() == before
    assert store.compact() == 0  # idempotent: nothing fragmented now


def test_merge_touching_every_bucket(spark, tmp_path):
    """A batch hitting ALL buckets commits correctly through the staging
    write — no eager materialization, every bucket swapped atomically."""
    store = KeyedParquetStore(
        spark=spark, path=str(tmp_path / "t"), keys=["k"], n_buckets=8
    )
    store.init(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(200)]))
    cfg = PartialUpdateConfig(keys=["k"], operations={"v": "$inc"}, upsert=True)
    src = spark.createDataFrame(
        [Row(k=i, v=1000.0) for i in range(0, 200, 2)]  # half update...
        + [Row(k=i, v=0.5) for i in range(200, 232)]    # ...plus inserts
    )
    m = store.merge(src, cfg)
    assert (m.updated, m.inserted) == (100, 32)
    got = store.read()
    assert got.count() == 232
    assert got.filter("k = 4").collect()[0]["v"] == 1004.0
    assert got.filter("k = 5").collect()[0]["v"] == 5.0
    assert got.filter("k = 210").collect()[0]["v"] == 0.5
    # no staging leftovers next to the table
    parent = os.path.dirname(store.path)
    assert not [d for d in os.listdir(parent) if ".staging-" in d]


def test_concurrent_writer_fails_fast(spark, tmp_path):
    """A held lock makes a second writer raise instead of corrupting."""
    store = KeyedParquetStore(
        spark=spark, path=str(tmp_path / "t"), keys=["k"], n_buckets=4
    )
    store.init(spark.createDataFrame([Row(k=1, v=1.0)]))
    cfg = PartialUpdateConfig(keys=["k"], operations={"v": "$set"}, upsert=False)
    with store._write_lock():  # writer A holds the store
        writer_b = KeyedParquetStore(
            spark=spark, path=store.path, keys=["k"], n_buckets=4
        )
        with pytest.raises(ConcurrentWriterError):
            writer_b.merge(spark.createDataFrame([Row(k=1, v=2.0)]), cfg)
    # lock released → the same merge now succeeds
    m = writer_b.merge(spark.createDataFrame([Row(k=1, v=2.0)]), cfg)
    assert m.updated == 1


def test_crashed_writer_leftovers_recovered(spark, tmp_path):
    """A writer that died mid-merge leaves a stale lock and a staging
    dir; the next merge breaks the lock, GCs the orphan staging, and
    completes — reads never saw the uncommitted data."""
    store = KeyedParquetStore(
        spark=spark, path=str(tmp_path / "t"), keys=["k"], n_buckets=4,
        lock_stale_sec=0.0,
    )
    store.init(spark.createDataFrame([Row(k=1, v=1.0), Row(k=2, v=2.0)]))
    # simulate the dead writer's droppings
    open(store.path + ".lock", "w").close()
    orphan = store.path + ".staging-deadbeef"
    os.makedirs(os.path.join(orphan, "_bucket=0"))
    with open(os.path.join(orphan, "_bucket=0", "part-zombie.parquet"), "w") as f:
        f.write("not parquet")
    assert store.read().count() == 2  # orphan invisible to readers
    time.sleep(0.05)
    cfg = PartialUpdateConfig(keys=["k"], operations={"v": "$set"}, upsert=False)
    m = store.merge(spark.createDataFrame([Row(k=1, v=9.0)]), cfg)
    assert m.updated == 1
    assert not os.path.exists(orphan)  # GC'd under the reclaimed lock
    assert store.read().filter("k = 1").collect()[0]["v"] == 9.0


def test_crash_in_rename_window_restores_bucket(spark, tmp_path):
    """Death between rename-out and rename-in leaves a bucket ABSENT
    with its only copy in the displaced .old dir; the next writer's
    recovery pass must restore it before doing anything else."""
    import shutil

    store = KeyedParquetStore(
        spark=spark, path=str(tmp_path / "t"), keys=["k"], n_buckets=2,
        lock_stale_sec=0.0,
    )
    store.init(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(20)]))
    total = store.read().count()
    bucket = next(d for d in os.listdir(store.path) if d.startswith("_bucket="))
    displaced = os.path.join(store.path, f".old-deadbeef--{bucket}")
    shutil.move(os.path.join(store.path, bucket), displaced)  # simulate crash
    assert store.read().count() < total  # bucket really is gone
    time.sleep(0.05)
    cfg = PartialUpdateConfig(keys=["k"], operations={"v": "$set"}, upsert=False)
    store.merge(spark.createDataFrame([Row(k=0, v=100.0)]), cfg)
    assert not os.path.exists(displaced)
    assert store.read().count() == total  # restored, then merged
    assert store.read().filter("k = 0").collect()[0]["v"] == 100.0


def test_stale_lock_broken(spark, tmp_path):
    """A lock older than lock_stale_sec (dead writer) is broken."""
    store = KeyedParquetStore(
        spark=spark, path=str(tmp_path / "t"), keys=["k"], n_buckets=4,
        lock_stale_sec=0.0,
    )
    store.init(spark.createDataFrame([Row(k=1, v=1.0)]))
    open(store.path + ".lock", "w").close()  # abandoned lock
    time.sleep(0.05)
    cfg = PartialUpdateConfig(keys=["k"], operations={"v": "$set"}, upsert=False)
    m = store.merge(spark.createDataFrame([Row(k=1, v=2.0)]), cfg)
    assert m.updated == 1 and not os.path.exists(store.path + ".lock")


def test_bucketed_tables_join_without_exchange(spark):
    """Two tables bucketed+sorted on the join key by the same bucket
    count must SortMergeJoin with NO Exchange on either side (and no
    per-task Sort either) — the co-located join that turns the
    dominant pipeline shuffle into a local merge per bucket."""
    from aces_nifi_processors_bundle_spark.stores.bucketed import (
        co_located_join,
        write_bucketed,
    )

    left = spark.range(10_000).selectExpr("id AS k", "id * 2 AS a")
    right = spark.range(5_000).selectExpr("id AS k", "id * 3 AS b")
    write_bucketed(left, "t_bleft", ["k"], n_buckets=8)
    write_bucketed(right, "t_bright", ["k"], n_buckets=8)
    # force the join strategy question: no broadcast shortcut for the
    # tiny test tables (at real scale neither side broadcasts anyway)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, "t_bleft", "t_bright", ["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # neither side shuffles
        assert joined.count() == 5_000
        # sanity: the same join on unbucketed frames DOES shuffle
        shuffled = left.join(right, "k")
        plan2 = shuffled._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")
