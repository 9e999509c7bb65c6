"""Declarative flow assembly: a config-defined stage list must produce
the same plan/results as hand-composed operators — the NiFi
flow-definition analog (flows are wired by config on the canvas, not
by code)."""

from __future__ import annotations

import json

from aces_nifi_processors_bundle_spark.flows import build_flow
from aces_nifi_processors_bundle_spark.plans.queries import FLAGSHIP_BINNERS
from aces_nifi_processors_bundle_spark.operators.binning import bin_count
from aces_nifi_processors_bundle_spark.sources.registry import load_table

FLAGSHIP_FLOW = [
    {"op": "load", "table": "events"},
    {
        "op": "bin_count",
        "binners": [
            {"kind": "date", "bin_name": "byDay", "data_field": "ts", "granularity": "DAY"},
            {"kind": "literal", "bin_name": "byType", "data_field": "event_type"},
            {"kind": "merged", "bin_name": "dayType", "components": ["byDay", "byType"]},
        ],
    },
]


def test_flow_matches_hand_composed_flagship(spark, sf_dir):
    flow_df = build_flow(spark, FLAGSHIP_FLOW, sf_dir)
    direct = bin_count(load_table(spark, sf_dir, "events"), FLAGSHIP_BINNERS)
    assert sorted(map(tuple, flow_df.collect())) == sorted(map(tuple, direct.collect()))


def test_flow_is_json_roundtrippable(spark, sf_dir):
    """The flow IS configuration: survives JSON serialization (the
    flow.json analog) and still builds."""
    flow = json.loads(json.dumps(FLAGSHIP_FLOW))
    assert build_flow(spark, flow, sf_dir).count() > 0


def test_flow_stage_chain_with_filter_select_sql(spark, sf_dir):
    flow = [
        {"op": "load", "table": "events"},
        {"op": "filter", "condition": "event_id % 10 != 0"},
        {"op": "select", "columns": ["event_id", "event_type"]},
        {"op": "sql", "query": "SELECT event_type, count(*) AS n FROM __this__ GROUP BY event_type"},
    ]
    out = {r["event_type"]: r["n"] for r in build_flow(spark, flow, sf_dir).collect()}
    expect = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .filter("event_id % 10 != 0")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert out == expect


def test_flow_routed_operator_selects_relationship(spark, sf_dir):
    """A routed op continues down the named relationship, like wiring a
    downstream processor to one port."""
    flow = [
        {"op": "load", "table": "events"},
        {
            "op": "attrs_to_json",
            "relationship": "success",
            "string_attrs": ["event_type"],
            "int_attrs": ["event_id"],
        },
    ]
    n_success = build_flow(spark, flow, sf_dir).count()
    n_all = load_table(spark, sf_dir, "events").count()
    assert 0 < n_success <= n_all


def test_flow_errors_are_actionable(spark, sf_dir):
    import pytest

    with pytest.raises(KeyError, match="unknown op"):
        build_flow(spark, [{"op": "load", "table": "events"}, {"op": "nope"}], sf_dir)
    with pytest.raises(ValueError, match="must start with a 'load'"):
        build_flow(spark, [{"op": "filter", "condition": "1=1"}], sf_dir)
