"""FlowFile-model sources: JSON content + string-attribute maps.

The reference's input model is the NiFi FlowFile (SURVEY.md §1.1): an
untyped Map<String,String> of attributes plus a UTF-8 JSON content
body, read wholesale per record (PartialUpdateMongo.java:186-205,
DataBinningProcessor.java:241-249; array-vs-object sniffing via
startsWith("[") at PartialUpdateMongo.java:210).

Spark mapping: a batch of FlowFiles is a DataFrame. Content parses
with an EXPLICIT schema (the reference is config-driven, never
schema-inferred — SURVEY.md §1.3); attribute maps become string
columns so the O1/O2 typed-projection operators apply unchanged.

Scale notes: json-lines scans split by line across tasks; explicit
schemas skip the inference pre-pass entirely (one full extra read at
100 TB); from_json is codegen'd per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    encoding: str = "UTF-8",
) -> DataFrame:
    """JSON-lines content source with a declared schema.

    The charset option mirrors the reference's configurable charset
    (PartialUpdateMongo.java:129-135, default UTF-8)."""
    return (
        spark.read.schema(schema)
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
        .json(path)
    )


def parse_content(
    df: DataFrame,
    content_col: str,
    schema: str,
    keep_raw: bool = False,
) -> DataFrame:
    """Parse a JSON content column in place with an explicit schema.

    Single-object content only; use parse_content_auto when a batch
    mixes `[...]` arrays and `{...}` objects like the reference accepts.
    """
    parsed = df.withColumn("_doc", F.from_json(F.col(content_col), schema))
    out = parsed.select(
        *[c for c in df.columns if keep_raw or c != content_col], "_doc.*"
    )
    return out


def parse_content_auto(
    df: DataFrame,
    content_col: str,
    element_schema: str,
) -> DataFrame:
    """Array-vs-object content handling (PartialUpdateMongo.java:210-219).

    The reference sniffs startsWith("[") and bulk-processes arrays one
    element at a time; here both shapes normalize to one row per
    element: objects wrap into a 1-element array, arrays explode.
    """
    from pyspark.sql.types import ArrayType, StructType

    elem_type = StructType.fromDDL(element_schema)
    c = F.trim(F.col(content_col))
    arr = F.when(
        c.startswith("["), F.from_json(c, ArrayType(elem_type))
    ).otherwise(F.array(F.from_json(c, elem_type)))
    # explode_outer: malformed ARRAY content (from_json -> NULL array)
    # must surface as an all-null row like malformed OBJECT content
    # does (array(NULL) keeps one row) — plain explode silently
    # deleted the whole FlowFile for one of the two shapes
    exploded = df.withColumn("_doc", F.explode_outer(arr))
    return exploded.select(
        *[col for col in df.columns if col != content_col], "_doc.*"
    )


def attributes_to_columns(
    df: DataFrame, attr_col: str, attrs: list[str]
) -> DataFrame:
    """Lift map<string,string> FlowFile attributes into string columns
    (ff.getAttribute analog, BetterAttributesToJSON.java:212); missing
    keys → null, exactly like the reference's absent attributes."""
    return df.select(
        *[c for c in df.columns if c != attr_col],
        *[F.col(attr_col).getItem(a).alias(a) for a in attrs],
    )
