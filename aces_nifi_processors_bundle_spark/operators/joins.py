"""Temporal joins Spark lacks as built-ins: as-of join and banded
range join.

No reference analog — the NiFi bundle never correlates two flows
(SURVEY.md §2 "Joins: none"; the only implicit joins are keyed store
lookups, PartialUpdateMongo.java:282-298). These extend the engine's
relational surface for event-stream enrichment, the same way
pipeline/* extends it for the LLM-corpus workload.

Design rules:
- Pure DataFrame ops, zero UDFs: both operators are codegen'd
  expressions around ONE shuffle.
- Deterministic tie-breaks everywhere, and no NULLs in any sort key
  (Spark sorts NULLS FIRST ascending, DuckDB NULLS LAST — a silent
  oracle-divergence trap), so both are fully DuckDB-checkable.

Scale notes (100 TB):
- `asof_join` is one shuffle + sort on the key — the union-window
  formulation. Per-key data must fit a task's sort spill comfortably;
  for keys with unbounded history, pre-bucket by (key, coarse time
  bucket) and carry each bucket's last right-row forward one bucket
  (two windows, same total shuffle volume) — documented here, not
  needed for user-grained keys.
- `range_join` is a bucket-and-neighbor equi-join: each left row
  joins exactly the right rows within one bucket of its own, so
  candidate volume is Σ per-bucket |L|·|R| instead of |L|·|R| — the
  same Σ|bucket|² shape as the LSH band join in pipeline/dedup.py.
  Bucket width = the band predicate's radius; AQE skew-join splits
  hot buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_T, _SIDE, _TB = "_asof_t", "_asof_side", "_asof_tb"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    values: list[str] | None = None,
    tolerance_sec: float | None = None,
    suffix: str = "_matched",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: for every left row, attach the
    `values` columns of the right row with the same `on` key and the
    greatest right_ts <= left_ts (optionally within `tolerance_sec`).

    Implementation — the single-shuffle union-window formulation
    rather than a join: tag both sides, union, then ONE running
    `last(struct(ts, values...), ignorenulls=True)` window ordered by
    (ts, side, tiebreak). The whole matched row is carried as a
    single struct, so every output column comes from THE SAME right
    row even when some of its value columns are NULL (independent
    per-column carries would stitch columns from different rows).
    Right rows sort before left rows at equal ts (inclusive match),
    and among equal-ts right rows the greatest `tiebreak` (default:
    first value column; any orderable type — left rows sort with a
    NULLS FIRST null, which never competes since their side differs)
    wins — deterministic without a pre-dedup pass. Unmatched left
    rows carry NULLs; `<right_ts><suffix>` carries the matched row's
    timestamp.

    A forward as-of is the same operator on negated timestamps.
    """
    on = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if not values:
        raise ValueError("asof_join: `values` must name ≥1 right column")
    # the matched timestamp is always carried as <right_ts><suffix>;
    # listing it in `values` too would alias the same name twice
    values = [v for v in values if v != right_ts]
    tiebreak = tiebreak or (values[0] if values else right_ts)
    carried = [f"{right_ts}{suffix}"] + [f"{v}{suffix}" for v in values]
    clash = [c for c in carried if c in left.columns]
    if clash:
        raise ValueError(
            f"asof_join: left frame already has column(s) {clash}; pass a "
            "different `suffix` (chained enrichments need distinct suffixes)"
        )

    ldt, rdt = dict(left.dtypes)[left_ts], dict(right.dtypes)[right_ts]
    if ldt.startswith("timestamp") != rdt.startswith("timestamp"):
        # fail at the API boundary: the union below would otherwise
        # throw a type-mismatch error naming an internal column
        raise ValueError(
            f"asof_join: {left_ts} is {ldt} but {right_ts} is {rdt} — "
            "both sides must be timestamps, or both numeric epochs"
        )
    l2 = (
        left.withColumn(_T, F.col(left_ts))
        .withColumn(_SIDE, F.lit(1))
        .withColumn(_TB, F.lit(None).cast(dict(right.dtypes)[tiebreak]))
    )
    # SQL join semantics on dirty data: a right row with a NULL
    # timestamp (sorts NULLS-FIRST before everything — every early
    # left row would carry its values) or a NULL join key (NULL never
    # equals NULL in a join; the window PARTITION would group them)
    # can never be a match. NULL-key LEFT rows still pass through
    # unmatched, like a left join.
    _clean = F.col(right_ts).isNotNull()
    for k in on:
        _clean = _clean & F.col(k).isNotNull()
    r2 = right.filter(_clean).select(
        *on,
        F.col(right_ts).alias(_T),
        F.lit(0).alias(_SIDE),
        F.col(tiebreak).alias(_TB),
        F.struct(
            F.col(right_ts).alias("ts"),
            *[F.col(v).alias(v) for v in values],
        ).alias("_asof_row"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col(_T).asc(), F.col(_SIDE).asc(), F.col(_TB).asc_nulls_first()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = u.select(
        "*", F.last(F.col("_asof_row"), ignorenulls=True).over(w).alias("_m")
    ).filter(F.col(_SIDE) == 1)
    match = F.col("_m")
    if tolerance_sec is not None:
        # A match staler than the tolerance is no match: null the whole
        # carried struct (all columns stay consistent). Timestamp
        # columns compare in microseconds; numeric "timestamps"
        # compare in their own units (tolerance_sec is then unitless).
        if dict(left.dtypes)[left_ts].startswith("timestamp"):
            gap = F.unix_micros(F.col(_T)) - F.unix_micros(match["ts"])
            bound = int(tolerance_sec * 1_000_000)
        else:
            gap = F.col(_T) - match["ts"]
            bound = tolerance_sec
        match = F.when(gap <= bound, match)
    proj = [match["ts"].alias(f"{right_ts}{suffix}")] + [
        match[v].alias(f"{v}{suffix}") for v in values
    ]
    return m.select(*left.columns, *proj)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_val: str,
    right_val: str,
    band: float,
) -> DataFrame:
    """Band-predicate join: all (left, right) pairs with equal `on`
    keys and |left_val - right_val| <= band.

    Naively this is an equi-join on `on` followed by a filter — which
    at scale materializes every same-key pair first (quadratic in hot
    keys). Instead both sides bucket their value at width `band`; a
    qualifying pair's buckets differ by at most 1, so the left side
    explodes into its 3 neighbor buckets and the join runs on
    (on, bucket) — each candidate pair is produced exactly once, and
    candidate volume collapses from Σ|key|² to Σ|bucket-pair|. The
    exact band predicate then filters the survivors (codegen, no UDF).
    """
    on = [on] if isinstance(on, str) else list(on)
    if not band > 0:
        raise ValueError(
            f"range_join: band must be > 0 (got {band}); band=0 'exact "
            "equality' is a plain equi-join on the value column"
        )
    ints = ("tinyint", "smallint", "int", "bigint")
    # BOTH sides must bucket with the same arithmetic: `div` truncates
    # toward zero while floor rounds toward -inf, so mixing them on
    # negative values breaks the buckets-differ-by-≤1 invariant and
    # silently drops pairs. Integer `div` (exact, no double rounding
    # at bucket boundaries) only when both columns are integral.
    both_integral = (
        dict(left.dtypes).get(left_val) in ints
        and dict(right.dtypes).get(right_val) in ints
    )

    def bucket(col: str) -> Column:
        if both_integral and float(band).is_integer():
            return F.expr(f"`{col}` div {int(band)}")
        return F.floor(F.col(col) / F.lit(band)).cast("long")

    def bucket_right(frame: DataFrame, col: str) -> Column:
        if both_integral and float(band).is_integer():
            return F.expr(f"`{col}` div {int(band)}")
        return F.floor(frame[col] / F.lit(band)).cast("long")

    lb = bucket(left_val)
    l3 = left.withColumn(
        "_rj_b", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    # same-named value columns (the self-schema band case — sensor vs
    # sensor) are joined via an internal rename and restored as
    # <name>_right, the geo_radius_join collision convention
    rv_out = right_val
    r3 = right
    if right_val == left_val or right_val in left.columns:
        rv_out = f"{right_val}_right"
        if rv_out in left.columns or rv_out in right.columns:
            raise ValueError(
                f"range_join: both {right_val!r} and {rv_out!r} exist — "
                "rename one side"
            )
        r3 = right.withColumnRenamed(right_val, rv_out)
    r3 = r3.withColumn("_rj_b", bucket_right(r3, rv_out))
    return (
        l3.join(r3, [*on, "_rj_b"])
        .filter(F.abs(F.col(left_val) - F.col(rv_out)) <= F.lit(band))
        .drop("_rj_b")
    )


def _salt_hash(left: DataFrame, n_salts: int):
    """Per-row spread for the fact side's hot keys. xxhash64 rejects
    MapType inputs, so maps are excluded; if NOTHING hashable remains,
    a nondeterministic spread is fine — the salt only balances
    partitions, the JOIN RESULT is salt-independent."""
    hashable = [
        F.col(c) for c, t in left.dtypes if not t.startswith("map<")
    ]
    if hashable:
        return F.xxhash64(*hashable)
    return (F.rand(seed=7) * F.lit(float(n_salts))).cast("long")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    hot_keys: DataFrame | list | None = None,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: identical result to ``left.join(right, on,
    how)``, but rows of explicitly-listed HOT keys are spread over
    `n_salts` shuffle partitions instead of landing on one task.

    Mechanics: the fact (left) side salts hot-key rows with a
    deterministic hash-derived salt in [0, n_salts); the dim (right)
    side replicates ONLY its hot-key rows n_salts times (cold rows get
    salt 0 on both sides, unreplicated). The join key becomes
    (on..., _salt) — same matches, bounded per-task fan-in. This is
    what AQE's skew-join split does at runtime for sort-merge joins;
    the explicit operator covers the cases AQE can't see (skew created
    mid-pipeline after stats, or aggregation-feeding joins).

    `hot_keys`: a small DataFrame of key columns (broadcast), or a
    Python list of single-key values. Supplying the hot set explicitly
    keeps the operator deterministic and costs one broadcast — at
    scale, compute it once with `pipeline.reports.frequent_keys`
    (exact one-groupBy pass, or its seeded-sample estimate mode) and
    reuse it; passing that frame directly stays fully LAZY (it joins
    as a broadcast subplan — no driver collect), pytest-wired in
    tests/test_joins.py::test_salted_join_with_frequent_keys_hot_set.
    `how`: inner / left joins preserve semantics (every left row keeps
    exactly its matches; unmatched left rows survive a left join with
    one salt). Right/full joins would duplicate unmatched replicated
    right rows — rejected.
    """
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join: how={how!r} would duplicate unmatched "
                         "replicated right rows; use inner or left")
    if n_salts < 1:
        # 0 divides by zero (ANSI) or NULLs every hot salt so inner
        # joins silently drop the hot rows (non-ANSI)
        raise ValueError(f"salted_join: n_salts must be >= 1, got {n_salts}")
    spark = left.sparkSession
    if hot_keys is None:
        raise ValueError("salted_join: pass the hot key set (small DataFrame "
                         "or list); without one use a plain join + AQE")
    if not isinstance(hot_keys, DataFrame):
        if len(on) != 1:
            raise ValueError("list-form hot_keys needs a single join key")
        hot_keys = spark.createDataFrame(
            [(k,) for k in hot_keys], left.select(*on).schema
        )
    hot = F.broadcast(hot_keys.select(*on).distinct().withColumn("_hot", F.lit(True)))

    # Fact side: deterministic per-row salt for hot keys — hash the
    # whole row's columns so the spread is even without needing an id.
    lsalt = F.when(
        F.col("_hot").isNotNull(),
        F.pmod(_salt_hash(left, n_salts), F.lit(n_salts)),
    ).otherwise(F.lit(0))
    l2 = left.join(hot, on, "left").withColumn("_salt", lsalt.cast("int")).drop("_hot")

    # Dim side: replicate hot rows across every salt, cold rows once.
    rsalts = F.when(
        F.col("_hot").isNotNull(),
        F.sequence(F.lit(0), F.lit(n_salts - 1)),
    ).otherwise(F.array(F.lit(0)))
    r2 = (
        right.join(hot, on, "left")
        .withColumn("_salt", F.explode(rsalts))
        .withColumn("_salt", F.col("_salt").cast("int"))
        .drop("_hot")
    )
    return l2.join(r2, [*on, "_salt"], how).drop("_salt")


def haversine_km(
    lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column
) -> Column:
    """Great-circle distance in km (haversine, mean earth radius).
    Squared terms are written as products (not pow) and the operand
    order is fixed so a SQL oracle can reproduce the float result."""
    sdlat = F.sin(F.radians(lat_b - lat_a) / 2)
    sdlon = F.sin(F.radians(lon_b - lon_a) / 2)
    h = sdlat * sdlat + F.cos(F.radians(lat_a)) * F.cos(F.radians(lat_b)) * (
        sdlon * sdlon
    )
    return F.asin(F.sqrt(h)) * F.lit(2 * 6371.0088)


def max_safe_zoom(radius_km: float, ring: int, max_abs_lat: float) -> int:
    """Finest Web-Mercator zoom whose ring-neighborhood still covers
    radius_km at the data's worst (highest-|lat|) latitude: tiles are
    locally square and 40075*cos(lat)/2^z km wide, so the no-lost-pairs
    constraint is 40075*cos(lat_max)/2^z >= radius_km/ring."""
    import math as _m

    lat = min(abs(max_abs_lat), _MAX_TILE_LAT)
    width_equator = 40075.016686 * _m.cos(_m.radians(lat))
    if radius_km <= 0:
        return 22
    z = int(_m.floor(_m.log2(width_equator * ring / radius_km)))
    return max(0, min(z, 22))


_MAX_TILE_LAT = 85.05112878


def geo_radius_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    radius_km: float,
    zoom: int | None = None,
    left_lat: str = "lat",
    left_lon: str = "lon",
    right_lat: str = "lat",
    right_lon: str = "lon",
    dist_col: str = "dist_km",
    ring: int = 1,
    validate_zoom: bool = True,
) -> DataFrame:
    """Spatial radius join: all same-key (left, right) pairs within
    `radius_km` great-circle distance — the 2-D sibling of
    `range_join`, bucketed on Web-Mercator tiles instead of value
    bands.

    Both sides tile at `zoom` (`functions/geotile.py` math); the left
    side explodes into its 3x3 tile neighborhood (x wraps across the
    antimeridian), the join runs on (on..., tile), and the exact
    haversine predicate filters the survivors. Candidate volume is
    Σ|tile-pair|, never the all-pairs product.

    `zoom` and `ring` trade against each other: `ring` tiles of
    neighborhood on each side must cover the radius, i.e. pick z with
    40075 * cos(lat_max) / 2^z >= radius_km / ring. Too-coarse only
    costs candidate volume; too-fine silently loses pairs. zoom=None
    derives the finest safe zoom from the data's actual latitude bound
    (one eager max(|lat|) aggregate over each side at PLAN TIME —
    documented planning scan; pass zoom explicitly to avoid it). An
    explicit zoom gets a LAZY in-plan guard instead: a PER-ROW
    raise_error filter inline in each side's existing scan (safe-zoom
    is monotone in |lat|, so any-row-violates ≡ max-violates — see
    _zoom_guard), firing at EXECUTION time if the zoom is too fine —
    the operator stays a pure lazy transform (the flows contract), no
    driver jobs run at construction, and the guard adds zero extra
    scans of either input (a previous aggregate-based guard re-ran
    both upstream plans); validate_zoom=False drops the check
    entirely. ring > 1 trades a
    (2*ring+1)^2 left-side explode for 4x-per-zoom lower per-tile
    density — it pays only for data dense in BOTH axes (measured in
    SCALE.md: on a corpus dense along one axis the explode cost wins
    and ring=1 is right; radius joins are ultimately output-bound —
    the result set itself is Σ within-radius pairs).

    The two sides may carry identically named lat/lon columns (the
    defaults): the right side's coordinates are renamed to internal
    names for the join and restored in the OUTPUT as `<name>_right`
    when they would collide with a left column, original names
    otherwise — the COORDINATE columns never collide. Other columns
    shared by both sides are the caller's to disambiguate (select or
    rename before joining), as with any Spark join.
    """
    on = [on] if isinstance(on, str) else list(on)
    if ring < 1:
        # ring=0 makes the lazy zoom guard's log2(...*0) NULL — the
        # when() falls through PERMISSIVELY and pairs silently vanish
        raise ValueError(f"geo_radius_join: ring must be >= 1, got {ring}")
    from ..functions.geotile import tile_x, tile_y

    def _zoom_guard(lat_col: Column) -> Column:
        """Per-row lazy zoom check: the safe-zoom bound is monotone
        decreasing in |lat|, so `zoom > safe(max |lat|)` holds iff
        SOME row violates `zoom <= safe(|lat_row|)` — checking each
        row inline is exactly equivalent to the old max(|lat|)
        aggregate guard but costs a few codegen'd trig ops inside the
        existing scan instead of a SECOND full execution of each
        input subplan (the aggregate guard re-ran both sides' upstream
        plans — for expensive upstreams that doubled scan cost). Kept
        as a FILTER (when(bad, raise_error).otherwise(true)) so column
        pruning can't optimize the check away; NULL lats fall through
        to the permissive branch (they never produce a pair anyway).
        Same clamps as max_safe_zoom ([0, 22] — zoom=0 always safe)."""
        lat_clamped = F.least(F.abs(lat_col), F.lit(_MAX_TILE_LAT))
        safe_expr = F.greatest(
            F.least(
                F.floor(
                    F.log2(
                        F.lit(40075.016686)
                        * F.cos(F.radians(lat_clamped))
                        * F.lit(float(ring))
                        / F.lit(float(radius_km))
                    )
                ),
                F.lit(22.0),
            ),
            F.lit(0.0),
        )
        return F.when(
            F.lit(float(zoom)) > safe_expr,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"geo_radius_join: zoom={zoom} is too fine for "
                        f"radius_km={radius_km}, ring={ring} at |lat| "
                    ),
                    F.round(F.abs(lat_col), 2).cast("string"),
                    F.lit(
                        " — pairs near the radius would be silently "
                        "lost; use zoom<="
                    ),
                    safe_expr.cast("int").cast("string"),
                    F.lit(" (or zoom=None to derive it)"),
                )
            ).isNull(),
        ).otherwise(F.lit(True))

    guarded = validate_zoom and radius_km > 0 and zoom is not None
    if zoom is None:
        lat_bound = max(
            _max_abs_lat(left, left_lat), _max_abs_lat(right, right_lat)
        )
        zoom = max_safe_zoom(radius_km, ring, lat_bound)
    elif guarded:
        # Applied pre-explode on the left (once per input row, not x9)
        # and on the right below.
        left = left.filter(_zoom_guard(F.col(left_lat)))
    # Internal names for the right side's coordinates so identically
    # named lat/lon inputs (the defaults) stay unambiguous post-join;
    # restored (suffixed on collision) at the end.
    r_in = right.withColumnRenamed(right_lat, "_gjlat").withColumnRenamed(
        right_lon, "_gjlon"
    )
    out_rlat = right_lat + "_right" if right_lat in left.columns else right_lat
    out_rlon = right_lon + "_right" if right_lon in left.columns else right_lon
    n = 2**zoom
    lx, ly = tile_x(F.col(left_lon), zoom), tile_y(F.col(left_lat), zoom)
    span = range(-ring, ring + 1)
    # array_distinct: at coarse zooms (2^zoom <= 2*ring+1) the pmod
    # antimeridian wrap folds distinct dx offsets onto the SAME tile —
    # without the dedup a qualifying pair is emitted once per
    # colliding offset (silent duplicate output rows)
    neighbors = F.array_distinct(
        F.array(
            *[
                F.struct(
                    F.pmod(lx + dx, F.lit(n)).alias("jx"),
                    (ly + dy).alias("jy"),  # y never wraps (mercator clamp)
                )
                for dx in span
                for dy in span
            ]
        )
    )
    l3 = left.withColumn("_gj", F.explode(neighbors)).select(
        "*", F.col("_gj.jx").alias("_gjx"), F.col("_gj.jy").alias("_gjy")
    ).drop("_gj")
    if guarded:
        r_in = r_in.filter(_zoom_guard(F.col("_gjlat")))
    r3 = r_in.withColumn("_gjx", tile_x(F.col("_gjlon"), zoom)).withColumn(
        "_gjy", tile_y(F.col("_gjlat"), zoom)
    )
    dist = haversine_km(
        l3[left_lat], l3[left_lon], F.col("_gjlat"), F.col("_gjlon")
    )
    return (
        l3.join(r3, [*on, "_gjx", "_gjy"])
        .withColumn(dist_col, dist)
        .filter(F.col(dist_col) <= F.lit(radius_km))
        .drop("_gjx", "_gjy")
        .withColumnRenamed("_gjlat", out_rlat)
        .withColumnRenamed("_gjlon", out_rlon)
    )


def _max_abs_lat(df: DataFrame, lat_col: str) -> float:
    row = df.agg(F.max(F.abs(F.col(lat_col))).alias("m")).collect()[0]
    return float(row["m"]) if row["m"] is not None else 0.0
