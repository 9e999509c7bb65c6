"""Streaming mode: the batch binning transforms run unchanged under
Structured Streaming; foreachBatch wraps the merge sinks (SURVEY.md
§1.4 — streaming is an execution mode, not a semantic change)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from aces_nifi_processors_bundle_spark.operators.binning import (
    DateBinner,
    LiteralBinner,
)
from aces_nifi_processors_bundle_spark.operators.partial_update import (
    PartialUpdateConfig,
    partial_update,
)
from aces_nifi_processors_bundle_spark.sources.registry import load_table
from aces_nifi_processors_bundle_spark.streaming.binning_stream import (
    foreach_batch_merge,
    stream_bin_count_global,
)

BINNERS = [
    DateBinner(bin_name="byDay", data_field="ts", granularity="DAY"),
    LiteralBinner(bin_name="byType", data_field="event_type"),
]


def _stream_events(spark, sf_dir, tmp_path):
    """readStream over a parquet copy (streaming needs a directory it
    can list; the nanos-ts column is pre-normalized via load_table)."""
    src = load_table(spark, sf_dir, "events")
    data_dir = str(tmp_path / "events_stream")
    src.write.mode("overwrite").parquet(data_dir)
    return spark.readStream.schema(src.schema).parquet(data_dir)


def test_stream_bin_count_matches_batch(spark, sf_dir, tmp_path):
    stream = _stream_events(spark, sf_dir, tmp_path)
    out = stream_bin_count_global(stream, BINNERS)
    q = (
        out.writeStream.format("memory")
        .queryName("bins_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["name"], r["total"])
        for r in spark.sql("SELECT * FROM bins_stream").collect()
    }
    batch = load_table(spark, sf_dir, "events")
    from aces_nifi_processors_bundle_spark.operators.binning import bin_count

    want = {(r["name"], r["total"]) for r in bin_count(batch, BINNERS).collect()}
    assert got == want


def test_stream_windowed_watermark_counts(spark, sf_dir, tmp_path):
    """Watermarked tumbling-window variant: append-mode windows that the
    watermark has finalized must agree exactly with batch day-binning;
    the still-open tail window is withheld (that's the point of the
    watermark — bounded state, late-data tolerance)."""
    from aces_nifi_processors_bundle_spark.operators.binning import bin_count
    from aces_nifi_processors_bundle_spark.streaming.binning_stream import (
        stream_bin_count,
    )

    stream = _stream_events(spark, sf_dir, tmp_path)
    out = stream_bin_count(stream, BINNERS, ts_col="ts", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("bins_windowed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM bins_windowed").collect()
    assert emitted, "watermark should finalize at least the early windows"

    from aces_nifi_processors_bundle_spark.operators.binning import bin_records

    batch = load_table(spark, sf_dir, "events")
    # one batch job: (window-day, name) -> count, same keying as the stream
    want = {
        (r["day"], r["name"]): r["total"]
        for r in (
            bin_records(batch, BINNERS, keep=["ts"])
            .groupBy(
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
                "name",
            )
            .agg(F.count(F.lit(1)).alias("total"))
            .collect()
        )
    }
    for r in emitted:
        day = r["window"]["start"].strftime("%Y-%m-%d")
        assert want.get((day, r["name"])) == r["total"], (day, r["name"], r["total"])


def test_foreach_batch_partial_update(spark, sf_dir, tmp_path):
    """O4 as a streaming sink: micro-batches merge into a parquet-backed
    keyed store via foreachBatch — the NiFi-session-commit analog."""
    store = str(tmp_path / "store")
    target0 = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .limit(50)
    )
    target0.write.mode("overwrite").parquet(store)

    cfg = PartialUpdateConfig(
        keys=["c_custkey"], operations={"c_acctbal": "$set"}, upsert=True
    )

    def merge(batch_df, _epoch):
        tgt = spark.read.parquet(store)
        post = partial_update(tgt, batch_df, cfg).post_state
        # two-phase write: parquet target has no atomic merge (Delta
        # would); stage then swap keeps the demo honest
        staged = store + ".staged"
        post.write.mode("overwrite").parquet(staged)
        shutil.rmtree(store)
        os.rename(staged, store)

    updates = target0.select(
        "c_custkey", (F.col("c_acctbal") + 1000).alias("c_acctbal")
    )
    stream_dir = str(tmp_path / "updates")
    updates.write.mode("overwrite").parquet(stream_dir)
    stream = spark.readStream.schema(updates.schema).parquet(stream_dir)
    q = (
        foreach_batch_merge(stream, merge, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    before = {r["c_custkey"]: r["c_acctbal"] for r in target0.collect()}
    after = {
        r["c_custkey"]: r["c_acctbal"] for r in spark.read.parquet(store).collect()
    }
    assert len(after) == len(before)
    assert all(abs(after[k] - (v + 1000)) < 1e-9 for k, v in before.items())


def test_first_seen_keys_state_survives_micro_batches(spark, tmp_path):
    """A key emitted in micro-batch 1 must NOT re-emit in batch 2 —
    i.e. operator state persists across batches (the whole point of
    applyInPandasWithState over per-batch dropDuplicates)."""
    from pyspark.sql import Row

    from aces_nifi_processors_bundle_spark.streaming.stateful import (
        first_seen_keys,
    )

    data_dir = str(tmp_path / "src")
    # file 1: keys a,b ; file 2: keys b,c  → distinct emission {a,b,c}
    spark.createDataFrame([Row(k="a"), Row(k="b")]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(data_dir)
    spark.createDataFrame([Row(k="b"), Row(k="c")]).coalesce(1).write.mode(
        "append"
    ).parquet(data_dir)
    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)  # force one file per batch
        .parquet(data_dir)
    )
    out = first_seen_keys(stream, ["k"])
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batches = [int(p.batchId) for p in q.recentProgress if int(p.numInputRows) > 0]
    rows = sorted(r["k"] for r in spark.table("first_seen_test").collect())
    assert rows == ["a", "b", "c"]  # b appears once despite two arrivals
    assert len(batches) >= 2  # genuinely exercised multiple micro-batches


def test_first_seen_keys_native_matches_custom(spark, tmp_path):
    """The JVM-native routing (dropDuplicates) emits the same distinct
    key set across micro-batches as the applyInPandasWithState path —
    the contract that lets q_stream_first_seen switch to it."""
    from pyspark.sql import Row

    from aces_nifi_processors_bundle_spark.streaming.stateful import (
        first_seen_keys_native,
    )

    data_dir = str(tmp_path / "src")
    spark.createDataFrame([Row(k="a"), Row(k="b")]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(data_dir)
    spark.createDataFrame([Row(k="b"), Row(k="c")]).coalesce(1).write.mode(
        "append"
    ).parquet(data_dir)
    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    )
    out = first_seen_keys_native(stream, ["k"])
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen_native_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(r["k"] for r in spark.table("first_seen_native_test").collect())
    assert rows == ["a", "b", "c"]


def test_first_seen_keys_native_watermarked_bounds_state(spark, tmp_path):
    """With watermark=(ts, delay) the native path routes through
    dropDuplicatesWithinWatermark — bounded state, key-only output."""
    from pyspark.sql import Row

    from aces_nifi_processors_bundle_spark.streaming.stateful import (
        first_seen_keys_native,
    )

    data_dir = str(tmp_path / "src")
    spark.createDataFrame(
        [
            Row(k="a", ts="2024-01-01 00:00:00"),
            Row(k="a", ts="2024-01-01 00:00:05"),
            Row(k="b", ts="2024-01-01 00:01:00"),
        ]
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts").coalesce(1).write.mode(
        "overwrite"
    ).parquet(data_dir)
    stream = spark.readStream.schema("k string, ts timestamp").parquet(data_dir)
    out = first_seen_keys_native(stream, ["k"], watermark=("ts", "10 minutes"))
    assert out.columns == ["k"]  # watermark column projected away
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen_wm_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(r["k"] for r in spark.table("first_seen_wm_test").collect())
    assert rows == ["a", "b"]


def test_foreach_batch_replay_is_idempotent_end_to_end(spark, tmp_path):
    """foreachBatch is at-least-once: Structured Streaming re-runs a
    micro-batch with the SAME epoch id after a failure between sink
    commit and checkpoint advance. The exact q_stream_store_merge
    closure shape — pre-agg + $inc merge with txn=(name, epoch) —
    must be a no-op on replay: calling the closure twice with one
    epoch id leaves the store byte-identical; the next epoch applies."""
    from aces_nifi_processors_bundle_spark.stores import KeyedParquetStore

    path = str(tmp_path / "replay_store")
    store = KeyedParquetStore(spark=spark, path=path, keys=["ub"], n_buckets=4)
    store.init(
        spark.range(10).selectExpr("id AS ub", "CAST(0 AS LONG) AS n")
    )
    cfg = PartialUpdateConfig(keys=["ub"], operations={"n": "$inc"}, upsert=False)

    def merge_fn(batch_df, epoch_id):
        pre = batch_df.groupBy("ub").agg(F.count(F.lit(1)).cast("long").alias("n"))
        store.merge(pre, cfg, txn=("replay_test", epoch_id))

    batch = spark.range(30).selectExpr("id % 10 AS ub")
    merge_fn(batch, 0)
    state = {r["ub"]: r["n"] for r in store.read().collect()}
    assert state == {i: 3 for i in range(10)}
    version = store.history()[0]["version"]

    merge_fn(batch, 0)  # the replay — same epoch id, same batch
    assert {r["ub"]: r["n"] for r in store.read().collect()} == state
    assert store.history()[0]["version"] == version  # no new commit at all

    merge_fn(batch, 1)  # stream progress resumes
    assert {r["ub"]: r["n"] for r in store.read().collect()} == {
        i: 6 for i in range(10)
    }


def test_stream_funnel_chain_batch_split_independent(spark, sf_dir, tmp_path):
    """The stateful streaming funnel must converge to the batch funnel
    regardless of micro-batch boundaries: the same events split into
    many single-file micro-batches (maxFilesPerTrigger=1, files NOT in
    time order) end in the same final per-user chain, because every
    batch re-folds the full sorted history instead of chaining
    incrementally."""
    from pyspark.sql import Window

    from aces_nifi_processors_bundle_spark.pipeline.reports import funnel
    from aces_nifi_processors_bundle_spark.streaming.stateful import (
        stream_funnel_chain,
    )

    steps = ["view", "click", "purchase"]
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    data_dir = str(tmp_path / "ev")
    # 8 files split by a hash, NOT by time — late events land in later
    # micro-batches, exercising the re-fold
    events.withColumn("_f", F.pmod(F.xxhash64("event_type", "ts"), F.lit(8))) \
        .repartition(8, "_f").drop("_f").write.mode("overwrite").parquet(data_dir)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    )
    si = (
        F.array_position(F.array(*[F.lit(s) for s in steps]), F.col("event_type"))
        - 1
    ).cast("int")
    projected = stream.filter(F.col("event_type").isin(steps)).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"),
        si.alias("_si"),
    )
    out = stream_funnel_chain(projected, n_steps=3)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_split_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    updates = spark.table("funnel_split_test")
    assert updates.count() > updates.select("user_id").distinct().count()  # multi-batch
    final = updates.withColumn(
        "_rn", F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.desc("n_seen"))
        )
    ).filter(F.col("_rn") == 1)
    got = {
        r["user_id"]: tuple(r[f"_s{i}"] for i in range(3))
        for r in final.collect()
    }
    from aces_nifi_processors_bundle_spark.pipeline.reports import (
        _funnel_times_array,
    )
    want = {
        r["user_id"]: tuple(r[f"_s{i}"] for i in range(3))
        for r in _funnel_times_array(
            events, steps, "user_id", "event_type", "ts", None
        ).collect()
    }
    assert got == want


def test_stream_funnel_drops_dirty_rows_instead_of_dying(spark, sf_dir, tmp_path):
    """A NULL timestamp/step reaching the Python state worker as NaN
    previously killed the WHOLE streaming query (int(NaN)); dirty rows
    are now dropped plan-side."""
    import pyspark.sql.functions as F

    from aces_nifi_processors_bundle_spark.streaming.stateful import (
        stream_funnel_chain,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 0, 1_000_000), (1, 1, None), (1, 1, 2_000_000)],
        "user_id long, _si int, _us bigint",
    ).write.parquet(src)
    stream = spark.readStream.schema("user_id long, _si int, _us bigint").parquet(src)
    out = stream_funnel_chain(stream, n_steps=2)
    q = (
        out.writeStream.format("memory")
        .queryName("dirty_funnel")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = spark.table("dirty_funnel").collect()
    assert rows and rows[0]["_s1"] == 2_000_000  # clean rows still chain


def test_late_data_policy_drops_closed_windows_keeps_open_ones(spark, sf_dir):
    """Pins the engine's declared late-data policy end-to-end on the
    3-batch straggler fixture (q_stream_late_data): pre-01-10
    stragglers arrive AFTER the late watermark passed their day
    windows and must vanish without trace; day-21 stragglers arrive
    equally out of order but their window is still open (end 01-22 >
    max(b0) - 1d), so every one of them must be counted; and append
    mode emits no window the final watermark has not passed."""
    from aces_nifi_processors_bundle_spark.plans.queries import (
        q_stream_late_data,
    )

    events = load_table(spark, sf_dir, "events")
    rows = q_stream_late_data(spark, sf_dir).collect()
    by_day = {}
    for r in rows:
        by_day[r["day"]] = by_day.get(r["day"], 0) + r["n"]
    # DROPPED: nothing before 01-10 survives, though the source holds
    # hundreds of such rows
    n_old = events.where(F.col("ts") < F.lit("2024-01-10").cast("timestamp")).count()
    assert n_old > 0
    assert all(d >= "2024-01-10" for d in by_day)
    # KEPT: the day-21 stragglers are complete, not sampled
    n_d21 = events.where(
        (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-22").cast("timestamp"))
    ).count()
    assert by_day.get("2024-01-21") == n_d21
    # EMITTED: exactly the windows the final watermark closed — the
    # last full day before max(ts) - 1d, never day 29/30
    assert max(by_day) == "2024-01-28"
    # on-time days pass through complete
    n_d15 = events.where(
        (F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
    ).count()
    assert by_day.get("2024-01-15") == n_d15
