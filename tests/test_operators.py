"""Unit tests encoding the reference's Java semantics line-by-line
(SURVEY.md §5): missing-attr defaults, Boolean.parseBoolean, epoch
rendering, $addToSet dedup + time fixup, dot-path $set, match-many,
dissemination fallback, and the §2.3 quirks."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aces_nifi_processors_bundle_spark.operators.attributes_to_json import (
    AttributesToJsonConfig,
    attributes_to_json,
)
from aces_nifi_processors_bundle_spark.operators.binning import (
    DateBinner,
    LiteralBinner,
    MergedBinner,
    NumericBinner,
    bin_records,
)
from aces_nifi_processors_bundle_spark.operators.partial_update import (
    PartialUpdateConfig,
    partial_update,
)
from aces_nifi_processors_bundle_spark.operators.security_marking import (
    SecurityMarkingConfig,
    convert_security_marking,
)


def test_o1_defaults(spark):
    """Missing attr → '' / false / null (BetterAttributesToJSON.java
    :216,235,250,265,289); bool is parseBoolean not cast."""
    df = spark.createDataFrame(
        [(None, None, None, None, None, "YES", "TrUe")],
        schema="s string, b string, i string, d string, ts string, b2 string, b3 string",
    )
    cfg = AttributesToJsonConfig(
        string_attrs=["s", "missing_col"],
        bool_attrs=["b", "b2", "b3"],
        int_attrs=["i"],
        double_attrs=["d"],
        epoch_date_attrs=["ts"],
    )
    row = attributes_to_json(df, cfg).success.collect()[0]
    assert row["s"] == ""
    assert row["missing_col"] == ""  # absent column ≡ absent attribute
    assert row["b"] is False
    assert row["b2"] is False  # 'YES' → false (Java), unlike SQL cast
    assert row["b3"] is True  # case-insensitive 'true'
    assert row["i"] is None and row["d"] is None and row["ts"] is None


def test_o1_epoch_iso_rendering(spark):
    """Epoch-millis → yyyy-MM-dd'T'HH:mm:ss.SSS'Z' GMT-0 (:59-60)."""
    df = spark.createDataFrame([Row(ts="1690000000123")])
    cfg = AttributesToJsonConfig(epoch_date_attrs=["ts"], include_all_when_empty=False)
    row = attributes_to_json(df, cfg).success.collect()[0]
    assert row["ts"] == "2023-07-22T04:26:40.123Z"


def test_o1_array_sums_and_guard_divergence(spark):
    """Array attrs parse + sum. DIVERGENCE (documented, SURVEY.md §2.3
    quirk 1): the reference's int-sum only runs when the DOUBLE list is
    also non-blank (guard bug at :316); we implement the intended
    semantics — int list alone works."""
    df = spark.createDataFrame([Row(ia="[1,2,3]")])
    cfg = AttributesToJsonConfig(int_array_sum_attrs=["ia"], include_all_when_empty=False)
    row = attributes_to_json(df, cfg).success.collect()[0]
    assert row["ia"] == 6  # reference would emit nothing here


def test_o1_failure_routing(spark):
    """parseInt('garbage') → failure relationship (:368-371)."""
    df = spark.createDataFrame([Row(i="42"), Row(i="4.2"), Row(i="abc")])
    cfg = AttributesToJsonConfig(int_attrs=["i"], include_all_when_empty=False)
    routed = attributes_to_json(df, cfg)
    # Java parseInt throws on both '4.2' and 'abc'
    assert routed.success.count() == 1
    assert routed.failure.count() == 2


def test_o2_dissem_fallback_and_blank(spark):
    """Fallback rule :268-277 (no dissem + any rel → controls[1]) and
    blank marking → failure (:414-416)."""
    cfg = SecurityMarkingConfig(
        levels_to_convert_to=["UNCLASSIFIED", "SECRET"],
        levels_can_receive=["UNCLASS", "SECRET"],
        level_abbrevs_can_receive=["U", "S"],
        compartments=["ALPHA"],
        dissemination_controls=["NOFORN", "RELTO"],
        releasabilities=["ABC"],
    )
    df = spark.createDataFrame(
        [Row(marking="SECRET//ABC"), Row(marking=""), Row(marking=None)]
    )
    routed = convert_security_marking(df, "marking", cfg)
    ok = routed.success.collect()
    assert len(ok) == 1
    c = ok[0]["classification"]
    assert c["levels"] == ["SECRET"]
    assert c["releasabilities"] == ["ABC"]
    assert c["disseminationControls"] == ["RELTO"]  # the SECOND control
    assert routed.failure.count() == 2


def test_o3_output_modes_and_typo(spark):
    """'mulitple' (sic, :66) accepted; unknown mode rejected."""
    df = spark.createDataFrame([Row(x="a")])
    binners = [LiteralBinner(bin_name="b", data_field="x")]
    assert bin_records(df, binners, "mulitple").collect()[0]["bins"] == ["b.a"]
    assert bin_records(df, binners, "single").collect()[0]["name"] == "b.a"
    with pytest.raises(ValueError):
        bin_records(df, binners, "sideways")


def test_o3_merged_order_dependency(spark):
    """MergedBinner referencing a later binner fails like the
    reference's warn-and-skip (:206) — we fail loudly instead."""
    df = spark.createDataFrame([Row(x="a")])
    binners = [
        MergedBinner(bin_name="m", components=["lit"]),
        LiteralBinner(bin_name="lit", data_field="x"),
    ]
    with pytest.raises(ValueError, match="not yet defined"):
        bin_records(df, binners).collect()


def test_o3_geotile_null_coords_skip_all_zooms(spark):
    """Null coordinates skip every zoom INCLUDING 0 (the constant root
    tile) and the max_level=0 case — one semantic across levels."""
    from pyspark.sql import Row

    from aces_nifi_processors_bundle_spark.operators.binning import (
        GeoTileBinner,
        bin_records,
    )

    df = spark.createDataFrame(
        [Row(lat=10.0, lon=20.0), Row(lat=None, lon=20.0)]
    )
    out = bin_records(df, [GeoTileBinner(bin_name="g", lat_field="lat",
                                         lon_field="lon", max_level=2)])
    names = [r["name"] for r in out.collect()]
    assert len(names) == 3 and all(n.startswith("g.") for n in names)
    out0 = bin_records(df, [GeoTileBinner(bin_name="g", lat_field="lat",
                                          lon_field="lon", max_level=0)])
    assert [r["name"] for r in out0.collect()] == ["g.0."]


def test_o3_geotile_names_without_prepare_raises(spark):
    from pyspark.sql import Row

    from aces_nifi_processors_bundle_spark.operators.binning import GeoTileBinner

    df = spark.createDataFrame([Row(lat=1.0, lon=2.0)])
    b = GeoTileBinner(bin_name="g", lat_field="lat", lon_field="lon", max_level=2)
    with pytest.raises(ValueError, match="prepare"):
        b.names(df)


def test_o3_json_flowfile_failure_route(spark):
    """bin/original/failure relationships with malformed JSON content
    (DataBinningProcessor.java:85-96, :316-318) + output metadata."""
    from pyspark.sql import Row

    from aces_nifi_processors_bundle_spark.operators.binning import (
        LiteralBinner,
        bin_json_flowfiles,
        with_bin_metadata,
    )

    df = spark.createDataFrame(
        [Row(fid=1, content='{"t": "a"}'),
         Row(fid=2, content='{"t": "b"}'),
         Row(fid=3, content='{"broken')]
    )
    routed = bin_json_flowfiles(
        df, "content", "t string", [LiteralBinner(bin_name="byT", data_field="t")]
    )
    assert [r["fid"] for r in routed.failure.collect()] == [3]
    assert routed.original.count() == 3
    bins = with_bin_metadata(routed.bin)
    rows = {(r["name"], r["filename"], r["mime.type"]) for r in bins.collect()}
    assert rows == {("byT.a", "bin-byT.a.json", "application/json"),
                    ("byT.b", "bin-byT.b.json", "application/json")}


def test_o3_numeric_negative_floor(spark):
    """Floor semantics on negatives: -5 at width 10 → bin -10."""
    df = spark.createDataFrame([Row(v=-5.0)])
    out = bin_records(df, [NumericBinner(bin_name="n", data_field="v", max_level=1)])
    names = [r["name"] for r in out.collect()]
    assert names == ["n.L0.-10", "n.L1.-5"]


def test_o4_dot_path_set_and_missing_parent(spark):
    """$set on parent.child via withField (:537-543); missing source
    parent → no-op → success-unmodified (:563, quirk 6)."""
    target = spark.createDataFrame(
        [Row(k=1, nested=Row(child="old", other="keep")),
         Row(k=2, nested=Row(child="old2", other="keep2"))]
    )
    source = spark.createDataFrame(
        [(1, ("new", None)), (2, None)],
        schema="k bigint, nested struct<child:string, other:string>",
    )
    cfg = PartialUpdateConfig(keys=["k"], operations={"nested.child": "$set"},
                              upsert=False)
    res = partial_update(target, source, cfg)
    post = {r["k"]: r["nested"] for r in res.post_state.collect()}
    assert post[1]["child"] == "new" and post[1]["other"] == "keep"
    assert post[2]["child"] == "old2"  # missing parent → untouched
    assert res.success.count() == 1
    assert res.success_unmodified.count() == 1


def test_o4_addtoset_struct_time_fixup(spark):
    """$addToSet array-of-structs with epoch→timestamp fixup on 'time'
    fields (:646-672) via the compat substring heuristic."""
    from pyspark.sql import types as T

    tgt_schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("seen", T.ArrayType(T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("time", T.TimestampType()),
        ]))),
    ])
    target = spark.createDataFrame([(1, [])], schema=tgt_schema)
    src_schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("seen", T.ArrayType(T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("time", T.LongType()),  # epoch millis
        ]))),
    ])
    source = spark.createDataFrame([(1, [(7, 1690000000123)])], schema=src_schema)
    cfg = PartialUpdateConfig(
        keys=["k"], operations={"seen": "$addToSet"}, upsert=False,
        time_substring_heuristic=True,
    )
    res = partial_update(target, source, cfg)
    seen = res.post_state.collect()[0]["seen"]
    assert seen[0]["id"] == 7
    assert seen[0]["time"].year == 2023  # converted to timestamp


def test_o4_addtoset_dedup(spark):
    """$addToSet never duplicates (array_union set semantics)."""
    target = spark.createDataFrame([Row(k=1, tags=["a", "b"])])
    source = spark.createDataFrame([Row(k=1, tags=["b", "c"])])
    cfg = PartialUpdateConfig(keys=["k"], operations={"tags": "$addToSet"},
                              upsert=False)
    res = partial_update(target, source, cfg)
    assert sorted(res.post_state.collect()[0]["tags"]) == ["a", "b", "c"]


def test_o4_match_many(spark):
    """updateMany (:473-475): non-unique key updates every match."""
    target = spark.createDataFrame(
        [Row(nation=1, bal=10.0), Row(nation=1, bal=20.0), Row(nation=2, bal=30.0)]
    )
    source = spark.createDataFrame([Row(nation=1, bal=99.0)])
    cfg = PartialUpdateConfig(keys=["nation"], operations={"bal": "$set"},
                              mode="many", upsert=False)
    res = partial_update(target, source, cfg)
    rows = sorted((r["nation"], r["bal"]) for r in res.post_state.collect())
    assert rows == [(1, 99.0), (1, 99.0), (2, 30.0)]


def test_o4_source_combine_inc(spark):
    """Multiple source rows per key converge like unordered bulkWrite:
    $inc values sum."""
    target = spark.createDataFrame([Row(k=1, n=100)])
    source = spark.createDataFrame([Row(k=1, n=5), Row(k=1, n=7)])
    cfg = PartialUpdateConfig(keys=["k"], operations={"n": "$inc"}, upsert=False)
    res = partial_update(target, source, cfg)
    assert res.post_state.collect()[0]["n"] == 112


def test_o4_combine_order_col_deterministic(spark):
    """With order_col, $set resolves by max_by(value, order) — the same
    post-state regardless of partition layout or row arrival order
    (F.last(ignorenulls=True) is shuffle-order-dependent; max_by isn't).
    Null values never win even at the greatest order."""
    target = spark.createDataFrame([Row(k=1, v="orig")])
    rows = [Row(k=1, seq=i, v=(None if i == 5 else f"v{i}")) for i in range(6)]
    cfg = PartialUpdateConfig(
        keys=["k"], operations={"v": "$set"}, upsert=False, order_col="seq"
    )
    states = set()
    for perm in (rows, rows[::-1], rows[3:] + rows[:3]):
        src = spark.createDataFrame(perm, schema="k int, seq int, v string")
        src = src.repartition(8)  # force a shuffle → arbitrary arrival order
        res = partial_update(target, src, cfg)
        states.add(res.post_state.collect()[0]["v"])
    assert states == {"v4"}  # seq=5 is null → seq=4 wins; identical every run


def test_o4_wildcard_whole_doc(spark):
    """Property '*' = whole-document $set (:304-305)."""
    target = spark.createDataFrame([Row(k=1, a="x", b=10)])
    source = spark.createDataFrame([(1, "y", None)], schema="k bigint, a string, b bigint")
    cfg = PartialUpdateConfig(keys=["k"], operations={"*": "$set"}, upsert=False)
    res = partial_update(target, source, cfg)
    row = res.post_state.collect()[0]
    assert row["a"] == "y"
    assert row["b"] == 10  # null source value → skip (absent-prop rule)


def test_write_routed_single_pass_partition_dirs(spark, tmp_path):
    """write_routed persists every relationship in one partitioned
    write; each port is a partition dir readable with pruning."""
    import os

    from aces_nifi_processors_bundle_spark.operators.routing import write_routed

    df = spark.createDataFrame([Row(k=i) for i in range(10)])
    base = str(tmp_path / "routed")
    write_routed(df, F.when(F.col("k") % 3 == 0, "failure").otherwise("success"), base)
    dirs = sorted(d for d in os.listdir(base) if d.startswith("_route="))
    assert dirs == ["_route=failure", "_route=success"]
    routed = spark.read.parquet(base)
    assert routed.filter(F.col("_route") == "failure").count() == 4
    assert routed.filter(F.col("_route") == "success").count() == 6


def test_scd2_apply_point_in_time_reconstruction(spark):
    """Two batches folded into an SCD2 dimension; every historical
    time point must reconstruct exactly via the valid_from/valid_to
    predicate."""
    from pyspark.sql import functions as F

    from aces_nifi_processors_bundle_spark.operators.scd import scd2_apply

    def dim(rows):
        return spark.createDataFrame(
            rows, "k long, attr string, valid_from long, valid_to long, is_current boolean"
        )

    def batch(rows, ts):
        return spark.createDataFrame(
            [(k, a, ts) for k, a in rows], "k long, attr string, effective_ts long"
        )

    state = dim([(1, "a", 0, None, True), (2, "x", 0, None, True)])
    state = scd2_apply(state, batch([(1, "b"), (3, "n")], 10),
                       keys=["k"], compare_cols=["attr"])
    state = scd2_apply(state, batch([(1, "b"), (2, "y")], 20),
                       keys=["k"], compare_cols=["attr"])

    def as_of(t):
        return {
            r["k"]: r["attr"]
            for r in state.filter(
                (F.col("valid_from") <= t)
                & (F.col("valid_to").isNull() | (F.lit(t) < F.col("valid_to")))
            ).collect()
        }

    assert as_of(5) == {1: "a", 2: "x"}
    assert as_of(15) == {1: "b", 2: "x", 3: "n"}
    assert as_of(25) == {1: "b", 2: "y", 3: "n"}
    # exactly one open row per live key; k=1 unchanged at t=20 kept ONE version
    open_rows = state.filter("is_current").collect()
    assert sorted(r["k"] for r in open_rows) == [1, 2, 3]
    assert state.count() == 5  # 3 open + 2 closed versions


def test_partial_update_null_keys_mode_one_and_dot_paths(spark):
    """Round-7 review: null-key target rows survive the merge; mode=one
    updates exactly one matched row; dot-path $addToSet/$currentDate
    work end to end (previously failed analysis / clobbered structs)."""
    import pyspark.sql.functions as F

    from aces_nifi_processors_bundle_spark.operators.partial_update import (
        PartialUpdateConfig,
        partial_update,
    )

    # null-key target row must survive untouched, not become all-null
    tgt = spark.createDataFrame(
        [(1, "a"), (None, "nullkey")], "k long, v string"
    )
    src = spark.createDataFrame([(1, "A")], "k long, v string")
    cfg = PartialUpdateConfig(keys=["k"], operations={"v": "$set"})
    res = partial_update(tgt, src, cfg)
    post = {r["k"]: r["v"] for r in res.post_state.collect()}
    assert post[1] == "A" and post[None] == "nullkey"

    # mode='one': exactly ONE of the matched rows updates (the
    # reference's updateOne default); the other passes through
    many_tgt = spark.createDataFrame(
        [(7, "x", 1), (7, "y", 2)], "k long, v string, ord int"
    )
    many_src = spark.createDataFrame([(7, "Z")], "k long, v string")
    one = partial_update(many_tgt, many_src,
                         PartialUpdateConfig(keys=["k"], operations={"v": "$set"}))
    vals = sorted(r["v"] for r in one.post_state.collect())
    assert vals.count("Z") == 1 and len(vals) == 2
    assert one.success.count() == 1
    both = partial_update(many_tgt, many_src,
                          PartialUpdateConfig(keys=["k"], operations={"v": "$set"},
                                              mode="many"))
    assert sorted(r["v"] for r in both.post_state.collect()) == ["Z", "Z"]

    # dot-path $addToSet (previously AnalysisException at plan build)
    stgt = spark.createDataFrame(
        [(1, (["a"],))], "k long, p struct<tags:array<string>>"
    )
    ssrc = spark.createDataFrame(
        [(1, (["b"],)), (1, (["c"],))], "k long, p struct<tags:array<string>>"
    )
    scfg = PartialUpdateConfig(keys=["k"], operations={"p.tags": "$addToSet"})
    srow = partial_update(stgt, ssrc, scfg).post_state.collect()[0]
    assert sorted(srow["p"]["tags"]) == ["a", "b", "c"]

    # dot-path $currentDate stamps the CHILD, keeps siblings
    dtgt = spark.createDataFrame(
        [(1, ("keep", None))],
        "k long, meta struct<note:string, updatedAt:timestamp>",
    )
    dsrc = spark.createDataFrame([(1,)], "k long")
    dcfg = PartialUpdateConfig(
        keys=["k"], operations={"meta.updatedAt": "$currentDate"},
        now="2026-02-03 04:05:06",
    )
    drow = partial_update(dtgt, dsrc, dcfg).post_state.collect()[0]
    assert drow["meta"]["note"] == "keep"
    assert str(drow["meta"]["updatedAt"]) == "2026-02-03 04:05:06"

    # insert path: $addToSet scalar wrap + epoch-millis fixup
    itgt = spark.createDataFrame(
        [], "k long, evs array<struct<eventTime:timestamp,val:string>>"
    )
    isrc = spark.createDataFrame(
        [(5, [(1700000000000, "e")])],
        "k long, evs array<struct<eventTime:bigint,val:string>>",
    )
    icfg = PartialUpdateConfig(
        keys=["k"], operations={"evs": "$addToSet"},
        time_fixup_fields=["eventTime"],
    )
    irow = partial_update(itgt, isrc, icfg).post_state.collect()[0]
    assert irow["evs"][0]["eventTime"].year == 2023  # millis, not seconds


def test_reference_parity_round7_fixes(spark):
    """Markings with spaces fail the level match (Java full-match),
    leading whitespace trims, the dissem fallback probes plain
    contains; bad JSON arrays route to failure; json_body keeps
    explicit nulls; multiple-mode filenames carry .json."""
    import pyspark.sql.functions as F
    from pyspark.sql import Row

    from aces_nifi_processors_bundle_spark.operators.attributes_to_json import (
        AttributesToJsonConfig,
        attributes_to_json,
    )
    from aces_nifi_processors_bundle_spark.operators.binning import (
        LiteralBinner,
        bin_records,
        with_bin_metadata,
    )
    from aces_nifi_processors_bundle_spark.operators.security_marking import (
        SecurityMarkingConfig,
        convert_security_marking,
    )

    cfg = SecurityMarkingConfig(
        levels_to_convert_to=["UNCLASSIFIED", "SECRET"],
        levels_can_receive=["UNCLASS", "SECRET"],
        level_abbrevs_can_receive=["U", "S"],
        compartments=["ALPHA"],
        dissemination_controls=["NOFORN", "RELTO"],
        releasabilities=["ABC"],
        delimiter="//",
    )
    df = spark.createDataFrame(
        [Row(marking="SECRET//REL TO ABC"), Row(marking="  SECRET//ALPHA"),
         Row(marking="SECRET ABC")]
    )
    got = {r["marking"]: r for r in convert_security_marking(
        df, "marking", cfg
    ).success.select("marking", "classification.*").collect()}
    assert got["SECRET//REL TO ABC"]["levels"] == []      # space breaks full-match
    assert got["  SECRET//ALPHA"]["levels"] == ["SECRET"]  # trimmed first
    assert got["SECRET ABC"]["disseminationControls"] == ["RELTO"]  # plain contains

    # bad JSON array attr -> failure route (was silent null in success)
    bag = spark.createDataFrame(
        [Row(id="1", arr="[1.5,2.5]"), Row(id="2", arr="not json")]
    )
    routed = attributes_to_json(
        bag, AttributesToJsonConfig(string_attrs=["id"],
                                    double_array_sum_attrs=["arr"],
                                    emit_json_body=True)
    )
    assert [r["id"] for r in routed.failure.collect()] == ["2"]
    body = routed.success.collect()[0]["json_body"]
    assert '"arr":4.0' in body

    # json_body keeps explicit nulls (Jackson parity)
    nbag = spark.createDataFrame([Row(id="1", n=None)], "id string, n string")
    nrouted = attributes_to_json(
        nbag, AttributesToJsonConfig(string_attrs=["id"], int_attrs=["n"],
                                     emit_json_body=True)
    )
    assert '"n":null' in nrouted.success.collect()[0]["json_body"]

    # multiple-mode filename: bins-<orig>.json
    recs = bin_records(
        spark.createDataFrame([Row(event_type="x", fn="data.txt")]),
        [LiteralBinner(bin_name="t", data_field="event_type")],
        output_mode="mulitple",
        keep=["fn"],
    )
    meta = with_bin_metadata(recs, output_mode="mulitple", orig_filename_col="fn")
    assert meta.collect()[0]["filename"] == "bins-data.txt.json"


def test_routing_scd_pia_hygiene_round7(spark):
    """route_by raises on unrouted rows; SCD2 handles NULL keys and
    rejects same-instant closes; put_if_absent rejects reserved helper
    columns."""
    import datetime as dt

    import pyspark.sql.functions as F
    from pyspark.sql import Row

    from aces_nifi_processors_bundle_spark.operators.put_if_absent import (
        put_if_absent,
    )
    from aces_nifi_processors_bundle_spark.operators.routing import route_by
    from aces_nifi_processors_bundle_spark.operators.scd import scd2_apply

    df = spark.createDataFrame([Row(x=1), Row(x=2)])
    routed = route_by(
        df, F.when(F.col("x") == 1, "a"), ["a", "b"]
    )  # x=2 routes to NULL
    with pytest.raises(Exception, match="route_by|USER_RAISED"):
        routed["b"].collect()

    t = dt.datetime(2025, 1, 1)
    cur = spark.createDataFrame(
        [(None, "v1", t, None, True)],
        "k string, v string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    batch = spark.createDataFrame(
        [(None, "v2", t + dt.timedelta(days=1))],
        "k string, v string, ts timestamp",
    )
    out = scd2_apply(cur, batch, ["k"], ["v"], effective_ts_col="ts")
    opens = out.filter("is_current").collect()
    assert len(opens) == 1 and opens[0]["v"] == "v2"  # NULL key closed + versioned
    same_t = spark.createDataFrame([(None, "v3", t)], "k string, v string, ts timestamp")
    with pytest.raises(Exception, match="same-instant|USER_RAISED|at or before"):
        scd2_apply(cur, same_t, ["k"], ["v"], effective_ts_col="ts").collect()
    with pytest.raises(ValueError, match="non-empty"):
        scd2_apply(cur, batch, ["k"], [], effective_ts_col="ts")

    tgt = spark.createDataFrame([Row(k=1)])
    src = spark.createDataFrame([Row(k=2, _ord=5)])
    with pytest.raises(ValueError, match="reserved"):
        put_if_absent(tgt, src, ["k"])


def test_functions_null_nan_and_range_hygiene(spark):
    """Round-7 review: garbage coordinates yield NULL tiles (not valid
    edge tiles); int-array sums share the failure guard's Integer
    parse contract; missing epoch dates are plain NULL, never
    {'$date': null}."""
    import pyspark.sql.functions as F
    from pyspark.sql import Row

    from aces_nifi_processors_bundle_spark.functions.geotile import quadkey
    from aces_nifi_processors_bundle_spark.functions.scalar import (
        array_sum_int,
        mongo_extended_date,
    )

    nan = float("nan")
    df = spark.createDataFrame(
        [(None, 10.0), (10.0, nan), (10.0, 10.0)],
        "lon double, lat double",
    )
    qs = [r["q"] for r in df.select(
        quadkey(F.col("lon"), F.col("lat"), 4).alias("q")
    ).collect()]
    assert qs[0] is None and qs[1] is None and qs[2] is not None

    vals = spark.createDataFrame(
        [Row(a="[3000000000]"), Row(a="[1,2]")]
    )
    out = [r["s"] for r in vals.select(array_sum_int(F.col("a")).alias("s")).collect()]
    assert out == [None, 3]  # > INT_MAX is unparseable, like Integer.parseInt

    dates = spark.createDataFrame([Row(e=None), Row(e="1700000000000")],
                                  "e string")
    wrapped = [r["w"] for r in dates.select(
        mongo_extended_date(F.col("e")).alias("w")).collect()]
    assert wrapped[0] is None  # plain null, not {'$date': null}
    assert wrapped[1]["$date"].startswith("2023-11-14")
