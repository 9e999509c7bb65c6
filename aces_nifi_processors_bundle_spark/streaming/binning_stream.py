"""Streaming mode: the same binning transforms under Structured
Streaming.

The reference's processors are @EventDriven/@SupportsBatching NiFi
stages with no event-time semantics (SURVEY.md §1.4) — streaming is an
execution mode, not a semantic change. We therefore reuse the exact
batch transforms:

- stateless operators (O1/O2/O3 bin fan-out) run unchanged on a
  readStream DataFrame;
- the counting stage becomes a windowed aggregation with a watermark
  (DateBinner at granularity g ≡ a tumbling window of size g — the
  watermark bounds state for late data, which NiFi simply never
  handled);
- external-store operators (O4/O5/O6) wrap their batch form in
  foreachBatch — the Spark idiom for merge/upsert sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from ..operators.binning import BinnerConfig, bin_records

def _ensure_event_time(stream_df: DataFrame, ts_col: str) -> DataFrame:
    """readStream on driver parquet can surface TIMESTAMP_NTZ (fixtures
    ship timestamp[us] with no zone), which withWatermark rejects; the
    session zone is pinned UTC so the cast is value-preserving."""
    if dict(stream_df.dtypes).get(ts_col) == "timestamp_ntz":
        return stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream_df


def stream_bin_count(
    stream_df: DataFrame,
    binners: list[BinnerConfig],
    ts_col: str = "ts",
    watermark: str = "1 hour",
    window: str = "1 day",
    slide: str | None = None,
) -> DataFrame:
    """Continuous bin counting with bounded state.

    groupBy(name) alone would keep state per distinct bin forever; the
    watermark + event-time window lets Spark drop finalized windows.
    With `slide` the windows overlap (each event lands in
    window/slide of them — hopping counts for dashboards); default is
    tumbling. Output: (window, name, total).
    """
    stream_df = _ensure_event_time(stream_df, ts_col)
    recs = bin_records(
        stream_df.withWatermark(ts_col, watermark), binners, keep=[ts_col]
    )
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return recs.groupBy(win.alias("window"), F.col("name")).agg(
        F.count(F.lit(1)).alias("total")
    )


def stream_bin_count_global(
    stream_df: DataFrame, binners: list[BinnerConfig]
) -> DataFrame:
    """NiFi-faithful variant: running totals per bin name (no window),
    for complete-mode sinks — state grows with distinct bins, which is
    fine for date/literal binners whose name cardinality is bounded."""
    return (
        bin_records(stream_df, binners)
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("total"))
    )


def foreach_batch_merge(
    stream_df: DataFrame,
    merge_fn,
    checkpoint: str,
) -> DataStreamWriter:
    """Wrap a batch merge (partial_update / put_if_absent closure) as a
    streaming sink: merge_fn(batch_df, epoch_id) runs per micro-batch —
    exactly the NiFi @SupportsBatching session-commit pattern.

    REPLAY CONTRACT — foreachBatch is at-least-once: a failure between
    the sink commit and the streaming checkpoint advance makes Spark
    re-run the whole micro-batch with the SAME epoch_id. merge_fn MUST
    therefore thread epoch_id into an idempotent sink commit —
    `KeyedParquetStore.merge(..., txn=(query_name, epoch_id))` /
    `put_if_absent(..., txn=...)` for store sinks, or
    `ivf_append_index(..., epoch=epoch_id)` for the ANN index — never
    discard it for a sink whose apply is not naturally idempotent
    ($inc double-counts, appends duplicate)."""
    return stream_df.writeStream.foreachBatch(merge_fn).option(
        "checkpointLocation", checkpoint
    )


def stream_session_counts(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    gap: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sessionization: per-key event counts over session windows (a
    session = events separated by less than `gap`; the window extends
    to last-event + gap). The streaming primitive class the tumbling
    binners can't express — session state merges as events arrive and
    a session finalizes only when the watermark passes its end, which
    is what bounds state for keys that go quiet.

    Output (append mode): one row per closed session —
    (window, key, n_events). Deterministic: which physical row arrived
    first never matters, only event times, so the emitted session set
    is oracle-able with a gaps-and-islands SQL rewrite plus the
    watermark cutoff (last_event + gap <= max_ts - delay)."""
    stream_df = _ensure_event_time(stream_df, ts_col)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("window"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
