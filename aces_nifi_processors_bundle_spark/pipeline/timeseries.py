"""Time-series operators over event streams: trailing rolling
aggregates, EWMA, gap-filled resampling, and exact group-wise anomaly
flags.

The reference bundle bins time (DateBinner,
aces-nifi-processors/src/main/java/net/acesinc/nifi/processors/binning/
DateBinner.java) but has no trailing-window or anomaly stage; any
monitoring deployment of the same flows computes these downstream.
This module is that stage, Spark-first.

Scale design:

- `rolling_aggregates` is ONE native window spec — a single hash
  exchange on the key + per-partition sort, then every aggregate rides
  the same running RANGE frame (Spark evaluates all frames of one
  WindowSpec in one pass). Values are summed as integer cents
  (bigint), so results are exact and cross-engine hashable — no
  floating accumulation order to disagree about.
- `ewma_last` is a per-key left fold. The recurrence
  `y = y*(1-a) + x*a` is order-sensitive and non-associative, so it
  cannot be a partial aggregate; we collect each key's (modest)
  series into a sorted array and fold JVM-side with F.aggregate. The
  operand order in the lambda is written to match DuckDB's
  `list_reduce` exactly, so the IEEE-754 result is bit-identical and
  the oracle compares UNrounded doubles. Per-key series length is the
  scale bound (same bound as sessionize's per-user sort); alpha
  should be a dyadic rational (0.25, 0.5) so `1-alpha` is exact.
- `resample_gapfill` builds each key's bucket grid with
  `sequence()` + `explode` — pure fan-out, no shuffle — and joins
  observed buckets back on (key, bucket). Grid size is
  span/bucket_sec per key, independent of event count; zero-fill and
  forward-fill are both exact (counts, cents, carried values).
- `anomaly_flags` deliberately does NOT use a window over the group:
  with few giant groups (event_type at 100 TB) a window partition is
  one task. Instead (n, Σx, Σx²) come from a map-side-combined
  groupBy — mergeable partial aggregates — and the tiny stats frame
  broadcast-joins back onto the rows. The |z| > k test is evaluated
  WITHOUT sqrt or division, in integer-cents decimal arithmetic:
      (n-1)·(n·x − S1)² > k²·n·(n·S2 − S1²)
  which is exact in Spark decimal(38) and DuckDB HUGEINT, so the
  flag is hash-comparable — no float boundary jitter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cents(col: Column) -> Column:
    """Exact integer-cents view of a 2-decimal double column."""
    return F.round(col * 100).cast("bigint")


def _bucket_of(us: Column, step_us: int) -> Column:
    """Exact floor(us / step) for ANY bigint microseconds (pre-1970
    included): pmod's non-negative remainder makes the subtraction a
    true floor — `%` truncates toward zero for negative us, which
    misassigned chunk-boundary context rows. Plain
    `(us / step).cast("bigint")` would also round the double quotient
    (half-ulp boundary flips at ~2^53); subtracting the remainder
    first makes the dividend an exact multiple, whose double quotient
    is exact."""
    return ((us - F.pmod(us, F.lit(step_us))) / F.lit(step_us)).cast("bigint")


def rolling_aggregates(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    window_sec: int,
    chunk_sec: int | None = None,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-row trailing-window aggregates: for each event, the
    count / exact cents-sum / min / max of `value_col` over this key's
    events in (ts - window_sec, ts] — peers at the same timestamp
    included (RANGE frame semantics, identical in Spark and DuckDB).

    One exchange + one sort; all four aggregates share the frame.

    chunk_sec — the HOT-KEY defense (same shape as sessionize's):
    a zipf monster key puts its whole history in one window task
    (measured 11x on the 530k-event sf1-skew user). chunk_sec >=
    window_sec re-partitions by (key, time-chunk); a trailing frame
    can only reach the current chunk plus the final window_sec of the
    previous one, so each row is written once as an EMIT row in its
    own chunk and, when within window_sec of the next boundary, once
    more as a CONTEXT row there (frame input only, filtered from the
    output). Per-task work is bounded by events-per-key-per-chunk,
    output is byte-identical to the single-partition path — the
    chunked query shares the oracle verbatim.

    id_col names the row-identifier column (emitted as `event_id`, the
    module-wide output convention shared with anomaly_flags' id_cols).
    """
    us_expr = F.unix_micros(F.col(ts_col))
    cents_expr = _cents(F.col(value_col))
    step = window_sec * 1_000_000
    base = df.select(
        F.col(id_col).alias("event_id"),
        F.col(key),
        us_expr.alias("__us"),
        cents_expr.alias("__cents"),
    )
    if chunk_sec is None:
        w = (
            Window.partitionBy(key)
            .orderBy("__us")
            .rangeBetween(-step + 1, 0)
        )
        src, emit_filter = base, None
    else:
        if chunk_sec < window_sec:
            raise ValueError(
                f"chunk_sec ({chunk_sec}) must be >= window_sec "
                f"({window_sec}): a trailing frame may span one full "
                "window into the previous chunk"
            )
        cstep = chunk_sec * 1_000_000
        bucket = _bucket_of(F.col("__us"), cstep)
        emits = base.select(
            "*", bucket.alias("__chunk"), F.lit(True).alias("__emit")
        )
        # rows within window_sec of the next boundary also serve as
        # frame context there
        ctx = (
            base.where(F.col("__us") >= (bucket + 1) * cstep - step + 1)
            .select(
                "*",
                (bucket + 1).alias("__chunk"),
                F.lit(False).alias("__emit"),
            )
        )
        src = emits.unionByName(ctx)
        w = (
            Window.partitionBy(key, "__chunk")
            .orderBy("__us")
            .rangeBetween(-step + 1, 0)
        )
        emit_filter = F.col("__emit")
    out = src.select(
        F.col("event_id"),
        F.col(key),
        F.col("__us").alias("ts_us"),
        F.col("__cents").alias("value_cents"),
        F.count(F.lit(1)).over(w).alias("n_window"),
        F.sum(F.col("__cents")).over(w).alias("sum_cents"),
        F.min(F.col("__cents")).over(w).alias("min_cents"),
        F.max(F.col("__cents")).over(w).alias("max_cents"),
        *([emit_filter.alias("__emit")] if emit_filter is not None else []),
    )
    if emit_filter is not None:
        out = out.where(F.col("__emit")).drop("__emit")
    return out


def ewma_last(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    alpha: float,
    tie_col: str,
    chunk_sec: int | None = None,
) -> DataFrame:
    """Final EWMA value per key: fold y = y*(1-alpha) + x*alpha over
    the key's series in (ts, tie) order, seeded with the first value
    (pandas `ewm(adjust=False)` recurrence). Returns one row per key:
    (key, n_points, ewma).

    The fold lambda is `acc * (1-alpha) + x * alpha` — keep this
    operand order in sync with the DuckDB `list_reduce` oracle; both
    engines then execute the same IEEE-754 sequence and the unrounded
    doubles compare equal.

    chunk_sec — the MONSTER-KEY defense. The sequential fold collects
    one array per key; a key with 10⁸ events breaks the single-row
    array limit long before the fold costs anything. Each EWMA step
    is the affine map y → β·y + α·x, and affine maps compose:
    a chunk of steps collapses to one (A, B) with A = β^m and
    B = Σ α·x_i·β^(m-i), and chunks chain as (A₂A₁, A₂B₁+B₂). So the
    chunked path folds each (key, time-chunk) independently (bounded
    arrays) and composes the per-chunk affine summaries in bucket
    order — a two-level parallel scan. Composition reassociates the
    float ops, so the result is mathematically equal but NOT
    bit-identical to the sequential path (~1e-15 relative; the
    oracle-gated query stays sequential, the pytest equivalence is
    toleranced).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    beta = 1.0 - alpha
    elem = F.struct(
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(tie_col).alias("tie"),
        F.col(value_col).alias("x"),
    )
    if chunk_sec is None:
        per_key = df.groupBy(key).agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sort_array(F.collect_list(elem)).alias("__arr"),
        )
        rest = F.slice(F.col("__arr"), 2, F.size(F.col("__arr")) - 1)
        fold = F.aggregate(
            rest,
            F.element_at(F.col("__arr"), 1)["x"].cast("double"),
            lambda acc, e: acc * F.lit(beta) + e["x"] * F.lit(alpha),
        )
        return per_key.select(key, "n_points", fold.alias("ewma"))

    cstep = chunk_sec * 1_000_000
    bucket = _bucket_of(F.unix_micros(F.col(ts_col)), cstep)
    chunks = df.groupBy(F.col(key), bucket.alias("__bk")).agg(
        F.count(F.lit(1)).alias("__m"),
        F.sort_array(F.collect_list(elem)).alias("__arr"),
    )
    # Pure affine summary of the chunk's steps, plus the SEEDED value
    # for whichever chunk turns out to be the key's first.
    arr = F.col("__arr")
    pure_b = F.aggregate(
        arr,
        F.lit(0.0),
        lambda acc, e: acc * F.lit(beta) + e["x"] * F.lit(alpha),
    )
    seeded = F.aggregate(
        F.slice(arr, 2, F.size(arr) - 1),
        F.element_at(arr, 1)["x"].cast("double"),
        lambda acc, e: acc * F.lit(beta) + e["x"] * F.lit(alpha),
    )
    summaries = chunks.select(
        F.col(key),
        F.col("__bk"),
        F.col("__m"),
        F.pow(F.lit(beta), F.col("__m")).alias("__ca"),
        pure_b.alias("__cb"),
        seeded.alias("__seeded"),
    )
    # Second level: compose per-chunk summaries in bucket order —
    # element counts are #chunks per key, never #events.
    per_key = summaries.groupBy(key).agg(
        F.sum("__m").alias("n_points"),
        F.sort_array(
            F.collect_list(
                F.struct("__bk", "__ca", "__cb", "__seeded")
            )
        ).alias("__cs"),
    )
    compose = F.aggregate(
        F.slice(F.col("__cs"), 2, F.size(F.col("__cs")) - 1),
        F.element_at(F.col("__cs"), 1)["__seeded"].cast("double"),
        lambda acc, c: acc * c["__ca"] + c["__cb"],
    )
    return per_key.select(key, "n_points", compose.alias("ewma"))


def resample_gapfill(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    bucket_sec: int,
    how: str = "zero",
    id_col: str = "event_id",
) -> DataFrame:
    """Regularize each key's series onto a bucket_sec grid spanning
    that key's [min, max] bucket, emitting one row per (key, bucket):
    n_events, sum_cents (0 on gap buckets), and for how='ffill'
    additionally last_cents carried forward across gaps (null before
    the first observation — there is nothing to carry).

    The grid is sequence()+explode per key — fan-out only, no extra
    shuffle; the observed-bucket aggregate and the grid join share the
    hash partitioning on the key.
    """
    if how not in ("zero", "ffill"):
        raise ValueError(f"how must be 'zero' or 'ffill', got {how!r}")
    step = bucket_sec * 1_000_000
    bucket = _bucket_of(F.unix_micros(F.col(ts_col)), step) * step
    cents = _cents(F.col(value_col))
    observed = df.groupBy(F.col(key), bucket.alias("bucket_us")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents).alias("sum_cents"),
        # id_col is the within-timestamp tie-breaker (same contract as
        # rolling_aggregates/cusum_flags/anomaly_flags' id columns).
        # NULL-valued rows are excluded from the ordering (a NULL
        # ordering key is skipped by max_by): otherwise a bucket whose
        # LATEST row is NULL-valued forward-fills as if the bucket had
        # no observations at all.
        F.max_by(
            cents,
            F.when(
                cents.isNotNull(), F.struct(F.col(ts_col), F.col(id_col))
            ),
        ).alias("__last"),
    )
    grid = (
        observed.groupBy(key)
        .agg(
            F.min("bucket_us").alias("__lo"), F.max("bucket_us").alias("__hi")
        )
        .select(
            key,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
            ).alias("bucket_us"),
        )
    )
    out = (
        grid.join(observed, [key, "bucket_us"], "left")
        .select(
            key,
            "bucket_us",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            # fill 0 for GRID GAPS only (no observed row): a bucket
            # whose observations are all NULL-valued keeps a NULL sum
            # — 0 would be indistinguishable from a real zero total
            F.when(F.col("n_events").isNull(), F.lit(0))
            .otherwise(F.col("sum_cents"))
            .alias("sum_cents"),
            "__last",
        )
    )
    if how == "zero":
        return out.drop("__last")
    wff = (
        Window.partitionBy(key)
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return out.withColumn(
        "last_cents", F.last("__last", ignorenulls=True).over(wff)
    ).drop("__last")


def anomaly_flags(
    df: DataFrame,
    group: str,
    value_col: str,
    k: int = 3,
    id_cols: tuple[str, ...] = ("event_id",),
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Rows whose value lies more than k sample standard deviations
    from their group's mean, decided EXACTLY: with x in integer cents
    and S1=Σx, S2=Σx² over the group,
        |x - S1/n| > k·sqrt((S2 - S1²/n)/(n-1))
    ⟺  (n-1)·(n·x - S1)² > k²·n·(n·S2 - S1²)
  which needs no sqrt, no division, and no floats — decimal(38)
    on the Spark side, HUGEINT in the DuckDB oracle. Groups with
    n < 2 produce no flags (sample variance undefined).

    The decimal products are computed with try_multiply: beyond
    decimal(38) range (roughly n·|x_cents| > 10¹⁹ — e.g. 10¹⁰-row
    groups of 10⁹-cent values) the exact products overflow to NULL
    (uniformly, ANSI on or off) and the comparison FALLS BACK to the
    same inequality in float64 — approximate at the z≈k boundary but
    never silently dropping a group's flags. Inputs within the bound
    (every oracle-gated dataset) always take the exact branch.

    Stats come from one map-side-combined groupBy; the stats frame
    (one row per group) broadcast-joins back — no window over giant
    group-partitions, no second shuffle of the fact rows.

    `train_df` separates training from scoring: when given, the (n,
    S1, S2) stats are aggregated over train_df while df supplies the
    rows to flag — the train/score split used by the streaming twin
    (q_stream_anomaly scores a stream against batch-trained stats;
    stateless, so df may be a streaming frame). Default None trains
    on df itself.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cents = _cents(F.col(value_col)).cast("decimal(38,0)")
    stats = (train_df if train_df is not None else df).groupBy(group).agg(
        # count(cents), not count(*): a NULL value must be absent from
        # n AND the sums, or the mean/variance dilute and every real
        # row looks anomalous
        F.count(cents).cast("decimal(38,0)").alias("__n"),
        F.try_sum(cents).alias("__s1"),
        F.try_sum(cents * cents).alias("__s2"),
    )
    n = stats["__n"]
    dev = F.try_subtract(F.try_multiply(n, cents), F.col("__s1"))
    lhs = F.try_multiply(F.try_multiply(n - 1, dev), dev)
    rhs = F.try_multiply(
        F.try_multiply(F.lit(k * k).cast("decimal(38,0)"), n),
        F.try_subtract(
            F.try_multiply(n, F.col("__s2")),
            F.try_multiply(F.col("__s1"), F.col("__s1")),
        ),
    )
    # float64 mirror of the same inequality for the overflow fallback
    nd = n.cast("double")
    cd = cents.cast("double")
    s1d, s2d = F.col("__s1").cast("double"), F.col("__s2").cast("double")
    dev_d = nd * cd - s1d
    flag_d = (nd - 1) * dev_d * dev_d > k * k * nd * (nd * s2d - s1d * s1d)
    overflow_err = F.raise_error(
        F.lit(
            "anomaly_flags: decimal stats sum overflow — values beyond "
            "~1e17 need a coarser value unit (the float fallback covers "
            "PRODUCT overflow only; a silent NULL sum would drop the "
            "whole group's flags)"
        )
    ).cast("boolean")
    flagged = (
        F.when((n > 0) & (F.col("__s1").isNull() | F.col("__s2").isNull()),
               overflow_err)
        .when(lhs.isNotNull() & rhs.isNotNull(), lhs > rhs)
        .otherwise(flag_d)
    )
    return (
        df.join(F.broadcast(stats), group)
        .where((n >= 2) & flagged)
        .select(
            *id_cols,
            group,
            cents.cast("bigint").alias("value_cents"),
            n.cast("bigint").alias("n_group"),
        )
    )


def _hist_median2(
    df: DataFrame, group: str, v_col: str
) -> DataFrame:
    """Twice-the-median per group, EXACTLY: the two middle order
    statistics (rank floor((n+1)/2) and rank floor(n/2)+1 — equal for
    odd n) summed, an INTEGER with no interpolation. Runs on the
    shared value-histogram rank walk (stats.hist_order_stats — which
    also drops NULL values, matching DuckDB median()'s aggregate
    semantics; n counts non-null rows). Returns (group, __med2,
    __n)."""
    from .stats import hist_order_stats

    out = hist_order_stats(
        df,
        group,
        v_col,
        {
            "__lo": lambda n: F.floor((n + F.lit(1)) / F.lit(2.0)).cast(
                "bigint"
            ),
            "__hi": lambda n: (F.floor(n / F.lit(2.0)) + F.lit(1)).cast(
                "bigint"
            ),
        },
    )
    return out.select(
        F.col(group),
        (F.col("__lo") + F.col("__hi")).cast("bigint").alias("__med2"),
        F.col("__n"),
    )


def mad_flags(
    df: DataFrame,
    group: str,
    value_col: str,
    k: int = 3,
    id_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Robust outliers: rows with |x - median| > k * MAD within their
    group (MAD = median absolute deviation) — the median/MAD twin of
    `anomaly_flags`' mean/stddev z-score, immune to the outliers
    themselves inflating the scale estimate (50% breakdown point vs
    0% for stddev).

    Decided EXACTLY in integers: with med2 = 2*median(x_cents) and
    d2 = |2*x_cents - med2| (both integers even when the median falls
    between two values), a row flags iff  2*d2 > k * mad2  where
    mad2 = 2*median(d2) — every comparison is bigint, so the flag set
    is bit-reproducible and oracle-checked against DuckDB's native
    median(). Degenerate groups where MAD = 0 (a majority-identical
    value) flag every deviating row — the documented MAD caveat, kept
    (use anomaly_flags where that bites). Groups with n < 2 produce
    no flags (consistency with anomaly_flags).

    Scale: two _hist_median2 passes (histogram-sized windows, never a
    per-group value buffer) + two broadcast joins of group-cardinality
    stats frames back onto the rows. MAD is inherently two-level
    (deviations need the median first), so two scans of df is the
    floor for an exact answer; feed a cached/checkpointed frame when
    scanning twice matters."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cents = _cents(F.col(value_col))
    base = df.select(*id_cols, group, cents.alias("__x"))
    med = _hist_median2(base, group, "__x")
    dev = base.join(F.broadcast(med), group).select(
        *id_cols,
        group,
        "__x",
        "__n",
        F.abs(F.lit(2) * F.col("__x") - F.col("__med2")).alias("__d2"),
    )
    mad = _hist_median2(dev, group, "__d2").select(
        group, F.col("__med2").alias("__mad2")
    )
    return (
        dev.join(F.broadcast(mad), group)
        .where(
            (F.col("__n") >= 2)
            & (F.lit(2) * F.col("__d2") > F.lit(int(k)) * F.col("__mad2"))
        )
        .select(
            *id_cols,
            group,
            F.col("__x").alias("value_cents"),
            F.col("__n").alias("n_group"),
        )
    )


def cusum_flags(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    train_end_ts: str,
    h_cents: int,
    slack_cents: int = 0,
    id_col: str = "event_id",
    chunk_sec: int | None = None,
) -> DataFrame:
    """Upward mean-shift detection (one-sided CUSUM): per key, train a
    baseline mean on rows BEFORE `train_end_ts`, then over the scoring
    rows (at/after it, in (ts, id) order) accumulate
        y_i = max(0, y_{i-1} + (x_i - mean - slack))
    and flag rows where y_i > h — the classic Page CUSUM control
    chart. Detect downward shifts by negating the value column.

    THE SCALE REFORMULATION — the fold above looks sequential, but
    max(0, ...) recurrences have the prefix-scan closed form
        y_i = S_i - min(0, min_{j<=i} S_j),   S = running sum of d
    so the whole per-key chart is TWO window functions over one
    (key)-partitioned sort — one exchange, no iterative jobs, no
    per-key arrays (contrast ewma_last, whose affine fold genuinely
    needs the chunk-composition trick).

    EXACTNESS — divisions never happen: with n_t training rows summing
    to S_t cents, everything is scaled by n_t:
        d_i = n_t*x_i - S_t - n_t*slack   (integer)
    and the threshold is y > n_t * h_cents. Running sums are
    decimal(38,0) (HUGEINT in the oracle): at 10^10 rows per key of
    10^5-cent deviations a bigint cumsum would overflow, decimal(38)
    does not. Output cusum_scaled stays decimal(38,0) for the same
    reason — the excess is running-sum magnitude, in n_t*cents units
    (divide by n_t for cents).

    Keys with no training rows have no baseline and emit nothing
    (inner join with the training stats). Returns flagged rows only:
    (id_col, key, ts_us, cusum_scaled, n_train).

    chunk_sec — the MONSTER-KEY defense (the module-wide pattern).
    The prefix scan itself chunks cleanly: per (key, time-chunk)
    compute local prefix sums, then compose per-chunk summaries
    (total T_c, min-prefix M_c) with one window over SUMMARY rows:
        S_i      = O_c + s_loc_i          (O_c = Σ T of earlier chunks)
        min S_j  = min(min_{c'<c}(O_c' + M_c'), O_c + runmin_loc_i)
    Per-task window work is bounded by rows-per-key-per-chunk. Unlike
    the EWMA chunk composition (reassociated FLOATS, toleranced),
    decimal addition is exactly associative — the chunked output is
    BIT-IDENTICAL to the sequential path and shares its oracle.
    """
    if h_cents <= 0:
        raise ValueError(f"h_cents must be positive, got {h_cents}")
    cents = _cents(F.col(value_col))
    import datetime as _dt

    try:  # eager: a malformed string must not surface as a mid-job
        # ANSI cast error (or, ANSI off, a silent empty result)
        _dt.datetime.fromisoformat(str(train_end_ts))
    except ValueError as exc:
        raise ValueError(
            f"cusum_flags: train_end_ts {train_end_ts!r} is not an "
            "ISO timestamp"
        ) from exc
    cutoff = F.lit(train_end_ts).cast("timestamp")
    train = (
        df.where(F.col(ts_col) < cutoff)
        .groupBy(key)
        .agg(
            # count(cents): NULL-valued training rows are absent from
            # the sum, so they must be absent from n too
            F.count(cents).cast("bigint").alias("__nt"),
            # decimal BEFORE the sum: a bigint cents sum overflows at
            # exactly the magnitudes the decimal design targets
            F.sum(cents.cast("decimal(38,0)")).alias("__st"),
        )
    )
    score = df.where(F.col(ts_col) >= cutoff).select(
        F.col(id_col),
        F.col(key),
        F.unix_micros(F.col(ts_col)).alias("__us"),
        cents.alias("__x"),
    )
    dec = "decimal(38,0)"
    d = (
        # every operand decimal BEFORE multiplying: bigint nt*x threw
        # (ANSI) or wrapped (non-ANSI) at large magnitudes, defeating
        # the decimal cumsum design one expression upstream
        F.col("__nt").cast(dec) * F.col("__x").cast(dec)
        - F.col("__st").cast(dec)
        - F.col("__nt").cast(dec) * F.lit(int(slack_cents)).cast(dec)
    ).cast(dec)
    joined = score.join(F.broadcast(train), key)
    zero = F.lit(0).cast("decimal(38,0)")
    if chunk_sec is None:
        w = Window.partitionBy(key).orderBy("__us", id_col)
        wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        c1 = joined.select(
            id_col, key, "__us", "__nt", F.sum(d).over(wrun).alias("__cum")
        )
        c2 = c1.select(
            id_col,
            key,
            "__us",
            "__nt",
            "__cum",
            F.least(F.min("__cum").over(wrun), zero).alias("__runmin"),
        )
    else:
        if chunk_sec <= 0:
            raise ValueError(f"chunk_sec must be positive, got {chunk_sec}")
        cstep = chunk_sec * 1_000_000
        rows = joined.select(
            id_col, key, "__us", "__nt", d.alias("__d"),
            _bucket_of(F.col("__us"), cstep).alias("__chunk"),
        )
        wloc = (
            Window.partitionBy(key, "__chunk")
            .orderBy("__us", id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        loc = rows.select(
            id_col, key, "__us", "__nt", "__chunk",
            F.sum("__d").over(wloc).alias("__sloc"),
        ).withColumn("__mloc", F.min("__sloc").over(wloc))
        # per-chunk summaries in ONE aggregate over the local-scan rows:
        # total T = the LAST row's local prefix sum (max_by on the sort
        # key — plain max(sloc) would be wrong under negative
        # deviations), min-prefix M = min local prefix sum
        summ = loc.groupBy(key, "__chunk").agg(
            F.max_by(
                "__sloc", F.struct(F.col("__us"), F.col(id_col))
            ).alias("__t"),
            F.min("__sloc").alias("__m"),
        )
        wsum = Window.partitionBy(key).orderBy("__chunk")
        off = F.coalesce(
            F.sum("__t").over(
                wsum.rowsBetween(Window.unboundedPreceding, -1)
            ),
            zero,
        )
        aprev = F.min(off + F.col("__m")).over(
            wsum.rowsBetween(Window.unboundedPreceding, -1)
        )
        summ2 = summ.select(
            key, "__chunk", off.alias("__off"), aprev.alias("__aprev")
        )
        c2 = loc.join(summ2, [key, "__chunk"]).select(
            id_col,
            key,
            "__us",
            "__nt",
            (F.col("__off") + F.col("__sloc")).alias("__cum"),
            F.least(
                zero,
                F.col("__aprev"),
                F.col("__off") + F.col("__mloc"),
            ).alias("__runmin"),
        )
    y = F.col("__cum") - F.col("__runmin")
    # The cumsum stays decimal(38,0) INTERNALLY (a bigint running sum
    # would overflow on a long excursion), but the output boundary is
    # bigint: the external hash gate renders Decimal and int
    # differently, so an uncast decimal column can never hash-match
    # the oracle's BIGINT (CORRECTNESS_r07's q_changepoint_cusum /
    # q_cusum_chunked). y >= 0 always (runmin <= min(cum, 0)), so only
    # the upper bound needs the loud-overflow guard — same contract as
    # anomaly_flags' raise_error, and as DuckDB's raising
    # HUGEINT->BIGINT cast on the oracle side.
    y_big = F.when(
        y > F.lit(2**63 - 1).cast("decimal(38,0)"),
        F.raise_error(
            F.lit(
                "cusum_flags: cusum_scaled exceeds bigint range — the "
                "excursion magnitude n_t*sum(dev) overflowed the "
                "int64 output type; rescale the input or lower n_t"
            )
        ).cast("bigint"),
    ).otherwise(y.cast("bigint"))
    return c2.where(
        y
        > F.col("__nt").cast("decimal(38,0)")
        * F.lit(int(h_cents)).cast("decimal(38,0)")
    ).select(
        id_col,
        key,
        F.col("__us").alias("ts_us"),
        y_big.alias("cusum_scaled"),
        F.col("__nt").alias("n_train"),
    )


# --- seasonal (time-of-week) profile and residual anomalies --------------


def seasonal_profile(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group: str,
) -> DataFrame:
    """Time-of-week baseline per group: (group, dow, hour, n,
    mean_value) over the (group x 7 x 24) slot grid — the 'what does
    a normal Tuesday-9am look like' profile a monitoring pipeline
    diffs live traffic against. One map-side-combined groupBy; the
    output is slot-grid-sized (|groups| x 168) regardless of input
    rows. The mean is the only division, done once per slot in double
    and rounded; sums are exact integer cents. NULL values are absent
    from n and the sum (count(x) semantics), matching AVG."""
    cents = _cents(F.col(value_col))
    return (
        df.groupBy(
            F.col(group),
            F.dayofweek(F.col(ts_col)).cast("int").alias("dow"),
            F.hour(F.col(ts_col)).cast("int").alias("hour"),
        )
        .agg(
            F.count(cents).cast("bigint").alias("n"),
            F.sum(cents).alias("__s1"),
        )
        .select(
            group,
            "dow",
            "hour",
            "n",
            F.round(
                F.col("__s1").cast("double") / (F.lit(100.0) * F.col("n").cast("double")),
                6,
            ).alias("mean_value"),
        )
    )


def seasonal_anomalies(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group: str,
    k: int = 3,
    id_cols: tuple[str, ...] = ("event_id",),
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Rows deviating more than k sample standard deviations from
    their (group, day-of-week, hour) slot — seasonality-aware
    anomaly detection: a weekend-traffic dip that is 4 sigma against
    the whole week is 0 sigma against its own slot. Delegates to
    anomaly_flags on a composite slot key, so it inherits the exact
    division/sqrt-free decimal inequality, the broadcast-stats
    no-giant-window plan, and the overflow contract; slot stats are
    |groups| x 168 rows — broadcast territory at any input size.
    `train_df` separates training from scoring exactly as in
    anomaly_flags (the streaming twin trains on the static table and
    scores the stream). Output: (*id_cols, slot, value_cents,
    n_group), slot = 'group:dow:hour'.

    NULL semantics: a NULL group or NULL timestamp yields a NULL slot
    (F.concat propagates NULL — deliberately NOT concat_ws, which
    would silently pool every NULL-group row into malformed
    two-segment slots), and NULL-slot rows never join slot stats, so
    they cannot flag — mirroring the oracle's NULL-propagating '||'
    concatenation."""

    def tag(frame: DataFrame) -> DataFrame:
        return frame.withColumn(
            "__slot",
            F.concat(
                F.col(group).cast("string"),
                F.lit(":"),
                F.dayofweek(F.col(ts_col)).cast("string"),
                F.lit(":"),
                F.hour(F.col(ts_col)).cast("string"),
            ),
        )

    return (
        anomaly_flags(
            tag(df),
            "__slot",
            value_col,
            k,
            id_cols,
            train_df=tag(train_df) if train_df is not None else None,
        )
        .withColumnRenamed("__slot", "slot")
    )


def linear_trend(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group: str,
    bucket: str = "day",
) -> DataFrame:
    """Per-group OLS trend of bucketed totals: slope/intercept of
    sum(value) per time bucket regressed on the bucket index — 'is
    this series growing and how fast' per key, the screening pass
    before any heavier forecasting.

    Exactness: x is the integer epoch-bucket index, y the exact
    integer-cents bucket total; the five regression sums (n, Σx, Σy,
    Σxy, Σx²) are decimal(38)-exact, the closed-form numerator/
    denominator n·Σxy − Σx·Σy and n·Σx² − (Σx)² are decimal products
    of those sums, and ONLY the final slope/intercept divisions happen
    in double (correctly rounded, cross-engine identical), rendered at
    6 dp. Groups with a single bucket have no slope (NULL, not a
    divide crash).

    Scale: two map-side-combined aggregates — (group, bucket) then
    (group) — shuffling bucket totals, never rows; no window, no sort.
    """
    if bucket not in ("day", "hour"):
        raise ValueError(f"linear_trend: bucket must be day|hour, got {bucket}")
    step = 86_400 if bucket == "day" else 3_600
    x = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(step)).cast("long")
    cents = _cents(F.col(value_col))
    # every sum is decimal BEFORE accumulation: a long sum would wrap
    # silently at 2^63 (non-ANSI) — at 100 TB a group's total cents or
    # an epoch-index cross product both exceed int64
    daily = (
        df.groupBy(F.col(group), x.alias("_x"))
        .agg(F.sum(cents.cast("decimal(38,0)")).alias("_y"))
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = daily.groupBy(group).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum(F.col("_x").cast("decimal(38,0)")).cast("decimal(38,0)").alias("_sx"),
        F.sum("_y").cast("decimal(38,0)").alias("_sy"),
        F.sum(
            F.col("_x").cast("decimal(38,0)") * F.col("_y")
        ).cast("decimal(38,0)").alias("_sxy"),
        F.sum(
            F.col("_x").cast("decimal(38,0)") * F.col("_x").cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("_sxx"),
    )
    num = d("_n") * d("_sxy") - d("_sx") * d("_sy")
    den = d("_n") * d("_sxx") - d("_sx") * d("_sx")
    slope = num.cast("double") / den.cast("double")
    intercept = (
        d("_sy").cast("double") - slope * d("_sx").cast("double")
    ) / d("_n").cast("double")
    return sums.select(
        group,
        F.col("_n").cast("bigint").alias("n_buckets"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(F.round(slope / F.lit(100.0), 6))
        .alias("slope_per_bucket"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(F.round(intercept / F.lit(100.0), 6))
        .alias("intercept"),
    )
