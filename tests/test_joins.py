"""Tests for operators/joins.py (as-of + banded range join) and the
similarity clustering/semantic-dedup additions."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from aces_nifi_processors_bundle_spark.operators.joins import asof_join, range_join


def _ts(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_join_semantics(spark):
    """Backward-inclusive match, greatest-ts wins, equal-ts right rows
    resolve by tiebreak, unmatched rows carry NULLs."""
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(10.0), lid=1),
            Row(k="a", ts=_ts(5.0), lid=2),   # ties a right row exactly
            Row(k="a", ts=_ts(1.0), lid=3),   # before any right row
            Row(k="b", ts=_ts(100.0), lid=4),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(5.0), rid=10, v=1.0),
            Row(k="a", ts=_ts(5.0), rid=11, v=2.0),  # same ts: max rid wins
            Row(k="a", ts=_ts(7.0), rid=12, v=3.0),
        ]
    )
    out = {
        r["lid"]: (r["rid_matched"], r["v_matched"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", values=["rid", "v"], tiebreak="rid"
        ).collect()
    }
    assert out[1] == (12, 3.0)      # greatest ts <= 10
    assert out[2] == (11, 2.0)      # inclusive at equal ts, rid tiebreak
    assert out[3] == (None, None)   # nothing at-or-before
    assert out[4] == (None, None)   # key absent on the right


def test_asof_join_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame([Row(k="a", ts=_ts(100.0), lid=1)])
    right = spark.createDataFrame([Row(k="a", ts=_ts(10.0), rid=5, v=9.0)])
    fresh = asof_join(left, right, on="k", values=["v"], tolerance_sec=95).collect()[0]
    stale = asof_join(left, right, on="k", values=["v"], tolerance_sec=60).collect()[0]
    assert fresh["v_matched"] == 9.0 and fresh["ts_matched"] == _ts(10.0)
    assert stale["v_matched"] is None and stale["ts_matched"] is None


def test_asof_join_single_shuffle(spark):
    """The union-window formulation must plan exactly ONE exchange
    (the key partitioning) — no join exchange, no second sort pass."""
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 10).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 17).alias("ts"),
        (F.col("id") * 1.5).alias("v"),
    )
    out = asof_join(left, right, on="k", values=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert out.count() == 100


def test_range_join_matches_naive_and_dedups(spark):
    """Bucket-and-neighbor join = naive join + band filter, each
    qualifying pair exactly once, boundary |delta| == band included."""
    rows = [
        Row(u=i % 3, rid=i, x=(i * 37) % 100) for i in range(60)
    ] + [Row(u=9, rid=100, x=0), Row(u=9, rid=101, x=10)]  # exact boundary
    df = spark.createDataFrame(rows)
    a = df.select("u", F.col("rid").alias("id_a"), F.col("x").alias("xa"))
    b = df.select("u", F.col("rid").alias("id_b"), F.col("x").alias("xb"))
    got = (
        range_join(a, b, on="u", left_val="xa", right_val="xb", band=10)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .collect()
    )
    naive = (
        a.join(b, "u")
        .filter((F.col("id_a") < F.col("id_b")) & (F.abs(F.col("xa") - F.col("xb")) <= 10))
        .select("id_a", "id_b")
        .collect()
    )
    got_pairs = sorted((r["id_a"], r["id_b"]) for r in got)
    assert got_pairs == sorted(set(got_pairs)), "pair emitted twice"
    assert got_pairs == sorted((r["id_a"], r["id_b"]) for r in naive)
    assert (100, 101) in got_pairs  # |0 - 10| == band is inside


def test_range_join_no_nested_loop(spark):
    df = spark.range(100).select(
        (F.col("id") % 4).alias("u"), F.col("id").alias("rid"),
        (F.col("id") * 3).alias("x"),
    )
    a = df.select("u", F.col("rid").alias("id_a"), F.col("x").alias("xa"))
    b = df.select("u", F.col("rid").alias("id_b"), F.col("x").alias("xb"))
    plan = (
        range_join(a, b, on="u", left_val="xa", right_val="xb", band=7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_drops_planted_copy_keeps_rest(spark):
    from aces_nifi_processors_bundle_spark.pipeline.similarity import semantic_dedup

    def unit(seed: int):
        # orthogonal-ish deterministic unit vectors
        v = [0.0] * 8
        v[seed % 8] = 1.0
        v[(seed + 3) % 8] = 0.5 if seed % 2 else -0.5
        n = sum(x * x for x in v) ** 0.5
        return [x / n for x in v]

    rows = [Row(vec_id=i, embedding=unit(i)) for i in range(6)]
    rows.append(Row(vec_id=100, embedding=unit(2)))  # exact copy of id 2
    out = semantic_dedup(
        spark.createDataFrame(rows), dim=8, n_centroids=4, threshold=0.99
    )
    marks = {r["vec_id"]: r["keep"] for r in out.collect()}
    assert marks[2] is True and marks[100] is False  # greater id dropped
    assert sum(1 for k in marks.values() if not k) == 1
    # same cluster for the duplicate pair, by construction
    cids = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
    assert cids[2] == cids[100]


def test_cluster_corpus_partitions_whole_corpus(spark, sf_dir):
    from aces_nifi_processors_bundle_spark.pipeline.similarity import cluster_corpus
    from aces_nifi_processors_bundle_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = cluster_corpus(emb, dim=64, n_centroids=16)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cos").alias("lo"),
        F.max("cos").alias("hi"),
        F.countDistinct("cluster_id").alias("c"),
    ).collect()[0]
    assert agg["n"] == emb.count()          # every row assigned exactly once
    assert -1.0 <= agg["lo"] <= agg["hi"] <= 1.0
    assert 1 < agg["c"] <= 16


def test_salted_join_equals_plain_join(spark):
    from aces_nifi_processors_bundle_spark.operators.joins import salted_join

    left = spark.range(500).selectExpr(
        "id AS rid", "CASE WHEN id % 10 < 7 THEN 1 ELSE id % 37 END AS k"
    )  # key 1 is hot (~70% of rows)
    right = spark.range(40).selectExpr("id AS k", "id * 100 AS payload")

    for how in ("inner", "left"):
        got = sorted(
            map(tuple, salted_join(left, right, "k", hot_keys=[1], n_salts=8,
                                   how=how).select("rid", "k", "payload").collect())
        )
        want = sorted(
            map(tuple, left.join(right, "k", how).select("rid", "k", "payload").collect())
        )
        assert got == want, how

    # unmatched hot left key under left join survives exactly once
    lonely = spark.createDataFrame([(999, 77)], "rid long, k long")
    got = salted_join(lonely, right, "k", hot_keys=[77], n_salts=4, how="left").collect()
    assert len(got) == 1 and got[0]["payload"] is None


def test_salted_join_rejects_right_outer_and_missing_hot_set(spark):
    import pytest

    from aces_nifi_processors_bundle_spark.operators.joins import salted_join

    df = spark.range(10).selectExpr("id AS k", "id AS v")
    with pytest.raises(ValueError, match="inner or left"):
        salted_join(df, df, "k", hot_keys=[1], how="right")
    with pytest.raises(ValueError, match="hot key set"):
        salted_join(df, df, "k")


def test_asof_join_forward_via_negated_ts(spark):
    """The documented forward-as-of recipe: negate timestamps on both
    sides and the backward operator answers 'earliest at-or-after'."""
    left = spark.createDataFrame(
        [Row(k="a", ts=_ts(10.0), lid=1), Row(k="a", ts=_ts(50.0), lid=2)]
    )
    right = spark.createDataFrame(
        [Row(k="a", ts=_ts(20.0), rid=7, v=1.0), Row(k="a", ts=_ts(60.0), rid=8, v=2.0)]
    )
    neg = lambda df: df.withColumn("nts", -F.unix_micros("ts"))  # noqa: E731
    out = {
        r["lid"]: r["rid_matched"]
        for r in asof_join(
            neg(left), neg(right), on="k", left_ts="nts", values=["rid"], tiebreak="rid"
        ).collect()
    }
    assert out[1] == 7   # earliest right at-or-after t=10 is t=20
    assert out[2] == 8   # earliest at-or-after t=50 is t=60


def test_geo_radius_join_matches_naive_and_wraps_antimeridian(spark):
    from aces_nifi_processors_bundle_spark.operators.joins import (
        geo_radius_join,
        haversine_km,
    )

    rows = [
        Row(k=1, pid=i, lat=float((i * 13) % 50 - 25), lon=float((i * 29) % 340 - 170))
        for i in range(80)
    ] + [
        # antimeridian pair ~22 km apart: neighbor x-wrap must find it
        Row(k=2, pid=200, lat=0.0, lon=179.9),
        Row(k=2, pid=201, lat=0.0, lon=-179.9),
    ]
    df = spark.createDataFrame(rows)
    a = df.select("k", F.col("pid").alias("id_a"), F.col("lat").alias("lat_a"),
                  F.col("lon").alias("lon_a"))
    b = df.select("k", F.col("pid").alias("id_b"), F.col("lat").alias("lat_b"),
                  F.col("lon").alias("lon_b"))
    out = (
        geo_radius_join(a, b, on="k", radius_km=500.0, zoom=6,
                        left_lat="lat_a", left_lon="lon_a",
                        right_lat="lat_b", right_lon="lon_b")
        .filter(F.col("id_a") < F.col("id_b"))
    )
    got = sorted((r["id_a"], r["id_b"]) for r in out.collect())
    naive = (
        a.join(b, "k")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("d", haversine_km(F.col("lat_a"), F.col("lon_a"),
                                      F.col("lat_b"), F.col("lon_b")))
        .filter(F.col("d") <= 500.0)
    )
    want = sorted((r["id_a"], r["id_b"]) for r in naive.collect())
    assert got == sorted(set(got)), "pair emitted twice"
    assert got == want
    assert (200, 201) in got  # across the antimeridian


def test_geo_radius_join_auto_zoom_and_mis_sized_guard(spark):
    """zoom=None derives the finest safe zoom from the data's latitude
    bound; a manually mis-sized (too-fine) zoom raises instead of
    silently losing pairs; identically named lat/lon inputs (the
    defaults) work without an AMBIGUOUS_REFERENCE failure."""
    import pytest

    from aces_nifi_processors_bundle_spark.operators.joins import (
        geo_radius_join,
        max_safe_zoom,
    )

    # two points 60 deg north, ~55.6 km apart (0.5 deg of latitude)
    rows = [Row(k=1, pid=1, lat=60.0, lon=10.0), Row(k=1, pid=2, lat=60.5, lon=10.0)]
    df = spark.createDataFrame(rows)
    a = df.select("k", F.col("pid").alias("id_a"), "lat", "lon")
    b = df.select("k", F.col("pid").alias("id_b"), "lat", "lon")

    # auto zoom finds the pair — and the default identical lat/lon
    # column names are handled by the internal right-side aliases
    got = geo_radius_join(a, b, on="k", radius_km=100.0).filter(
        F.col("id_a") < F.col("id_b")
    )
    assert [(r["id_a"], r["id_b"]) for r in got.collect()] == [(1, 2)]

    # at lat 60 tiles are half their equator width: zoom 9 tiles span
    # 40075*cos(60)/512 ~= 39 km < 100 km — a silent-pair-loss zoom.
    # The guard is LAZY (in-plan raise_error so the operator stays a
    # pure transform): construction succeeds, execution raises.
    assert max_safe_zoom(100.0, 1, 60.5) < 9
    lazy = geo_radius_join(a, b, on="k", radius_km=100.0, zoom=9)
    with pytest.raises(Exception, match="too fine"):
        lazy.collect()

    # opting out of validation reproduces the historical footgun
    # (documented escape hatch for scan-free planning)
    unchecked = geo_radius_join(
        a, b, on="k", radius_km=100.0, zoom=12, validate_zoom=False
    ).filter(F.col("id_a") < F.col("id_b"))
    assert unchecked.count() == 0  # the pair is silently lost


def test_haversine_known_distance(spark):
    from aces_nifi_processors_bundle_spark.operators.joins import haversine_km

    # one degree of latitude on the meridian ~= 111.19 km
    d = spark.range(1).select(
        haversine_km(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0)).alias("d")
    ).collect()[0]["d"]
    assert abs(d - 111.19) < 0.1


def test_asof_join_values_may_name_the_timestamp_and_numeric_ts_tolerance(spark):
    from aces_nifi_processors_bundle_spark.operators.joins import asof_join

    left = spark.createDataFrame([Row(k="a", ts=_ts(10.0), lid=1)])
    right = spark.createDataFrame([Row(k="a", ts=_ts(7.0), v=1.0)])
    # ts listed in values: carried once as ts_matched, no dup-alias error
    out = asof_join(left, right, on="k", values=["ts", "v"]).collect()[0]
    assert out["ts_matched"] == _ts(7.0) and out["v_matched"] == 1.0

    # numeric (non-timestamp) time column with tolerance in same units
    nl = spark.createDataFrame([(1, 100, 1)], "k long, t long, lid long")
    nr = spark.createDataFrame([(1, 60, 5.0)], "k long, t long, v double")
    hit = asof_join(nl, nr, on="k", left_ts="t", values=["v"],
                    tolerance_sec=50).collect()[0]
    miss = asof_join(nl, nr, on="k", left_ts="t", values=["v"],
                     tolerance_sec=30).collect()[0]
    assert hit["v_matched"] == 5.0 and miss["v_matched"] is None


def test_geo_radius_join_guard_adds_no_extra_scans(spark):
    """The explicit-zoom validity guard is a per-row inline check, NOT
    an aggregate over the inputs: each input subplan must appear in
    the executed plan exactly once (the old max(|lat|) guard re-ran
    both sides, doubling upstream scan cost)."""
    from aces_nifi_processors_bundle_spark.operators.joins import geo_radius_join

    rows = [Row(k=1, pid=1, lat=10.0, lon=10.0), Row(k=1, pid=2, lat=10.2, lon=10.0)]
    df = spark.createDataFrame(rows)
    a = df.select("k", F.col("pid").alias("id_a"), "lat", "lon")
    b = df.select("k", F.col("pid").alias("id_b"), "lat", "lon")
    j = geo_radius_join(a, b, on="k", radius_km=100.0, zoom=5)  # safe zoom
    plan = j._jdf.queryExecution().executedPlan().toString()
    # two input scans total — one per side, none duplicated by the guard
    assert plan.count("Scan ExistingRDD") == 2
    # guard present and passing: the join still finds the pair
    assert j.filter(F.col("id_a") < F.col("id_b")).count() == 1


def test_salted_join_with_frequent_keys_hot_set(spark, sf_dir):
    """The intended 100 TB wiring: frequent_keys discovers the hot set
    as a LAZY DataFrame that salted_join broadcasts — result identical
    to the plain join, no driver-side collect anywhere in the plan."""
    from aces_nifi_processors_bundle_spark.operators.joins import salted_join
    from aces_nifi_processors_bundle_spark.pipeline.reports import frequent_keys
    from aces_nifi_processors_bundle_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = events.groupBy("user_id").agg(F.count("*").alias("n"))
    hot = frequent_keys(events, "user_id", min_count=2).select("user_id")
    out = salted_join(events, dim, on="user_id", hot_keys=hot, n_salts=4)
    plain = events.join(dim, "user_id")
    assert sorted(map(tuple, out.select(*plain.columns).collect())) == sorted(
        map(tuple, plain.collect())
    )


# --- round-7 review hardening --------------------------------------------

import pytest


def test_asof_join_ignores_null_keys_and_null_timestamps(spark):
    """SQL join semantics on dirty data: NULL right timestamps and
    NULL join keys never match; NULL-key left rows pass through
    unmatched."""
    import datetime as dt

    from aces_nifi_processors_bundle_spark.operators.joins import asof_join

    t = dt.datetime(2025, 1, 1)
    left = spark.createDataFrame(
        [("a", t), (None, t)], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("a", None, 99, 7.0), (None, t, 42, 1.0)],
        "k string, ts timestamp, rid long, v double",
    )
    out = {r["k"]: r for r in
           asof_join(left, right, "k", "ts", values=["rid", "v"]).collect()}
    assert out["a"]["rid_matched"] is None   # NULL-ts right row is no match
    assert out[None]["rid_matched"] is None  # NULL keys never join
    # mismatched ts dtypes fail fast with a clear message
    nleft = spark.createDataFrame([("a", 5)], "k string, ts bigint")
    with pytest.raises(ValueError, match="both sides must be"):
        asof_join(nleft, right, "k", "ts", values=["rid"])


def test_range_join_same_named_value_columns(spark):
    from aces_nifi_processors_bundle_spark.operators.joins import range_join

    x = spark.createDataFrame([("k", 1.0), ("k", 5.0)], "k string, val double")
    out = range_join(x, x, "k", "val", "val", band=2.0)
    assert "val_right" in out.columns
    pairs = {(r["val"], r["val_right"]) for r in out.collect()}
    assert (1.0, 1.0) in pairs and (1.0, 5.0) not in pairs


def test_salted_join_map_columns_and_n_salts_validation(spark):
    from aces_nifi_processors_bundle_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(7, {"a": "b"}), (7, {"c": "d"}), (1, {"e": "f"})],
        "k long, attrs map<string,string>",
    )
    right = spark.createDataFrame([(7, "hot"), (1, "cold")], "k long, v string")
    out = salted_join(left, right, "k", hot_keys=[7])
    assert out.count() == 3  # map column no longer breaks the salt hash
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(left, right, "k", hot_keys=[7], n_salts=0)


def test_geo_radius_join_coarse_zoom_no_duplicate_pairs(spark):
    from aces_nifi_processors_bundle_spark.operators.joins import (
        geo_radius_join,
    )

    a = spark.createDataFrame([("k", 0.0, 10.0)], "k string, lat double, lon double")
    b = spark.createDataFrame([("k", 0.0, -60.0)], "k string, lat double, lon double")
    out = geo_radius_join(a, b, "k", radius_km=15000.0).collect()
    assert len(out) == 1  # antimeridian wrap previously emitted it twice
    with pytest.raises(ValueError, match="ring"):
        geo_radius_join(a, b, "k", radius_km=100.0, zoom=8, ring=0)
