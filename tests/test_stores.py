"""KeyedParquetStore: incremental merge scope, provenance SEND events
(the PartialUpdateMongo.java:255 / PutMongoWithDuplicateCheck.java:149
analogs), and observe-based routing metrics."""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import Row

from aces_nifi_processors_bundle_spark.operators.partial_update import (
    PartialUpdateConfig,
)
from aces_nifi_processors_bundle_spark.stores import KeyedParquetStore


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
