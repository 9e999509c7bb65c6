"""Query catalog: one entry per operator family from SURVEY.md §2,
each paired with an ANSI-SQL DuckDB oracle in `oracles.py`.

Conventions for driver-compare safety (the driver sorts columns by
name and hashes values):
- every computed column is aliased identically in Spark and SQL
- float aggregates are computed in DECIMAL where exact, else rounded
- arrays are sorted and joined to strings
- timestamps are rendered as formatted strings
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.binning import (
    DateBinner,
    GeoTileBinner,
    LiteralBinner,
    MergedBinner,
    NumericBinner,
    bin_count,
    bin_records,
)
from ..sources.registry import load_table


# --- O3 flagship: bin events by day × event_type and count -------------

FLAGSHIP_BINNERS = [
    DateBinner(bin_name="byDay", data_field="ts", granularity="DAY"),
    LiteralBinner(bin_name="byType", data_field="event_type"),
    MergedBinner(bin_name="dayType", components=["byDay", "byType"]),
]


def q_bin_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date + literal + merged binning over events, counted.

    Exercises cast/date_format/explode/groupBy-count — the minimum
    end-to-end slice from SURVEY.md §7 step 1.
    """
    events = load_table(spark, sf_dir, "events")
    return bin_count(events, FLAGSHIP_BINNERS).orderBy("name")
