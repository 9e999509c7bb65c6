"""Custom stateful streaming operators (applyInPandasWithState).

The reference's closest analog is PutMongoWithDuplicateCheck
(PutMongoWithDuplicateCheck.java:142-157): an external keyed store
remembers which keys exist and routes duplicates away. Under
Structured Streaming the store becomes OPERATOR STATE — the state
backend keeps one entry per key, partitioned by the grouping key
across executors, checkpointed with the query.

first_seen_keys: emit each distinct key exactly once, on first
encounter — streaming put-if-absent where the "insert" is the emitted
row. The emitted KEY SET is deterministic (which physical row arrived
first is not, so only keys are emitted). State is one empty-struct
entry per key; an optional processing-time timeout bounds state for
keys that stop arriving (the TTL contract NiFi never had).

Scale shape: state lives hash-partitioned by key in the state store —
lookup and update are local to the key's partition, no shuffle beyond
the one groupBy exchange; Arrow batches amortize the Python hop.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen_keys_native(
    stream_df: DataFrame,
    keys: list[str],
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """JVM-native first-seen for the PURE key-dedup case.

    Same contract as `first_seen_keys` (one row per distinct key, at
    first encounter; deterministic key SET) but routed through Spark's
    built-in streaming deduplication operator instead of a Python
    `applyInPandasWithState` hop — state lookups stay in the JVM state
    store with no Arrow transfer, no Python worker, and whole-stage
    codegen up to the dedup exchange. Measured ~1.5x faster end-to-end
    on the events stream at sf0.1 (SCALE.md "first-seen routing"), so
    this is the default path for plain key dedup; keep `first_seen_keys`
    for genuinely custom state (TTL-on-access semantics, side outputs,
    non-key state payloads).

    watermark=(ts_col, delay) bounds state via
    `dropDuplicatesWithinWatermark`: keys older than the watermark are
    evicted, the JVM analog of `first_seen_keys(state_ttl_ms=...)` with
    event-time instead of processing-time TTL (and the same re-emit
    trade-off for keys that reappear after eviction). Without a
    watermark, state is exact and unbounded — correct for availableNow
    replays, sized by |distinct keys| for continuous runs.
    """
    if watermark is None:
        return stream_df.select(*keys).dropDuplicates(keys)
    ts_col, delay = watermark
    return (
        stream_df.select(*keys, ts_col)
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )


def first_seen_keys(
    stream_df: DataFrame,
    keys: list[str],
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Emit one row per distinct key, at its first appearance.

    Output schema = the key columns. With state_ttl_ms set, a key whose
    state times out would be re-emitted if seen again — the bounded-
    state trade-off, stated instead of hidden.
    """
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in stream_df.select(*keys).schema.fields
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        for _ in pdfs:  # drain the Arrow batches; contents don't matter
            pass
        if state.hasTimedOut:
            state.remove()  # actually free the entry, or TTL is a no-op
            return
        if state.exists:
            if state_ttl_ms is not None:
                state.setTimeoutDuration(state_ttl_ms)  # sliding TTL
            return
        state.update((True,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame([key], columns=list(keys))

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream_df.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=key_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=timeout,
    )


def stream_funnel_chain(
    stream_df: DataFrame,
    n_steps: int,
    user_col: str = "user_id",
    us_col: str = "_us",
    si_col: str = "_si",
    window_sec: int | None = None,
) -> DataFrame:
    """Streaming funnel-chain maintenance: per-user FIRST-TOUCH chained
    step times kept as OPERATOR STATE and re-derived each micro-batch.

    Input: a stream already projected to (user, event-time micros,
    step index) — the same pre-filter the batch array path applies.
    State per user = the full step-event history (two parallel
    arrays); every batch appends its events and re-FOLDS the chain
    from the sorted history, so arrival order across micro-batches is
    irrelevant (a late event lands in its sorted position — the
    incremental-chaining trap this design deliberately avoids). Emits
    one UPDATE row per user per batch that brought new events:
    (user, n_seen, s0..s{k-1}); n_seen grows strictly, so the row
    with max n_seen is the user's final chain — with availableNow it
    equals the batch funnel exactly (oracle-shared with q_funnel).

    State bound: the user's step-event history — the same per-user
    cardinality the batch path's collect_list holds (SCALE.md §skew
    quantifies the monster-key boundary; production streams cap it
    with the chained/batch fallback or per-window resets)."""
    win_us = None if window_sec is None else int(window_sec) * 1_000_000

    def _fold(evs: list) -> list:
        t = [None] * n_steps
        for us, si in sorted(evs):
            if t[si] is not None:
                continue
            if si == 0:
                t[si] = us
            elif (
                t[si - 1] is not None
                and us >= t[si - 1]
                and (win_us is None or us - t[si - 1] <= win_us)
            ):
                t[si] = us
        return t

    out_schema = (
        f"{user_col} bigint, n_seen bigint, "
        + ", ".join(f"_s{i} bigint" for i in range(n_steps))
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        new: list = []
        for pdf in pdfs:
            new.extend(
                (int(u), int(s)) for u, s in zip(pdf[us_col], pdf[si_col])
            )
        if not new:
            return
        if state.exists:
            uss, sis = state.get
            evs = list(zip(uss, sis)) + new
        else:
            evs = new
        state.update(([u for u, _ in evs], [s for _, s in evs]))
        chain = _fold(evs)
        yield pd.DataFrame(
            [[key[0], len(evs), *chain]],
            columns=[user_col, "n_seen", *[f"_s{i}" for i in range(n_steps)]],
        )

    # a NULL timestamp/step would reach the Python worker as NaN and
    # int(NaN) KILLS the whole streaming query, not just the row —
    # dirty rows are dropped plan-side (they can't chain anyway)
    clean = stream_df.where(
        F.col(us_col).isNotNull() & F.col(si_col).isNotNull()
    )
    return clean.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="uss array<bigint>, sis array<int>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
