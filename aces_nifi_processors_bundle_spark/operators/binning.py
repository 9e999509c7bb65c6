"""O3 — multi-dimensional binning / counting.

Reference: DataBinningProcessor (counter/DataBinningProcessor.java:63;
config parse :128-227, trigger :229-320). Per record, each configured
binner emits bin-name strings; the processor fans out {name, count: 1}
records for a downstream counter to sum. The binning math itself lives
in the external net.acesinc.data:data-binner lib (pom.xml:29-33), so
the exact bin-name strings below are this engine's golden spec
(SURVEY.md §7 hard-part b).

Spark mapping: a binner's fan-out is STATIC — it depends only on
config (levels, components), never on data — so each binner compiles to
a fixed Python list of name Column expressions. The record's bins are
one `array(...)` of those expressions + `explode`: plain concat/cast
expressions, fully inside whole-stage codegen. (An earlier draft used
nested higher-order `transform` for the merged cross-product; HOFs are
interpreted per-element in Spark and benched 60× slower — the static
expression list is the Catalyst-friendly shape.)

- "single" output mode (one record per bin, :270-289)  → explode
- "mulitple" mode (sic — the reference's actual config value is this
  typo, DataBinningProcessor.java:66; one record carrying all bins,
  :291-307) → keep the array column. Both spellings accepted.

The downstream "counter" is groupBy(name).count(): Spark's partial
(map-side) + final hash aggregation replaces NiFi's emit-1s-then-sum
pattern, so the shuffle moves only (name, partial_count) pairs — at
100 TB this is the difference between shuffling a row per record-bin
and a row per distinct bin per task.

Golden bin-name spec:
- DateBinner:    "<bin>.<GRAN>.<formatted>"  e.g. "byDay.DAY.2024-03-01"
  (formats: YEAR yyyy | MONTH yyyy-MM | DAY yyyy-MM-dd | HOUR
  yyyy-MM-dd-HH | MIN yyyy-MM-dd-HH-mm | SEC yyyy-MM-dd-HH-mm-ss;
  invalid granularity falls back to MIN like DateGranularity.valueOf
  default at DataBinningProcessor.java:151-164)
- LiteralBinner: "<bin>.<value>"             (:165-169)
- NumericBinner: "<bin>.L<level>.<floor(x/10^(max-level))*10^(max-level)>"
  for level 0..maxLevel — hierarchical decimal truncation (:170-178)
- GeoTileBinner: "<bin>.<zoom>.<quadkey>" for zoom 0..maxLevel
  (:179-197; quadkey math in functions/geotile.py)
- MergedBinner:  "<bin>.<a>|<b>" cross-product of component binners'
  names joined with "|" (:198-214; order dependency — components must
  already be defined, binnersByName registry :138,221-223)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.geotile import quadkey

_DATE_FORMATS = {
    "YEAR": "yyyy",
    "MONTH": "yyyy-MM",
    "DAY": "yyyy-MM-dd",
    "HOUR": "yyyy-MM-dd-HH",
    "MIN": "yyyy-MM-dd-HH-mm",
    "SEC": "yyyy-MM-dd-HH-mm-ss",
}

OUTPUT_MODE_SINGLE = "single"
# The reference's actual config constant is the misspelling (":66").
OUTPUT_MODES_MULTIPLE = {"mulitple", "multiple"}


@dataclass
class BinnerConfig:
    bin_name: str

    def prepare(self, df: DataFrame) -> DataFrame:
        """Optionally add helper columns evaluated ONCE per row.

        Catalyst duplicates an expression subtree at every reference
        site within a Project, so a binner whose name expressions share
        an expensive subcomputation (e.g. Web-Mercator trig) should
        materialize it here as a real column and reference it from
        ``names`` — guaranteeing single evaluation regardless of
        codegen subexpression elimination."""
        return df

    def names(self, df: DataFrame) -> list[Column]:
        """Fixed list of bin-name expressions (fan-out is config-static)."""
        raise NotImplementedError  # pragma: no cover


@dataclass
class DateBinner(BinnerConfig):
    """granularity enum w/ MIN fallback (DataBinningProcessor.java:151-164)."""

    data_field: str = ""
    granularity: str = "MIN"

    def names(self, df: DataFrame) -> list[Column]:
        gran = self.granularity.upper()
        if gran not in _DATE_FORMATS:
            gran = "MIN"
        return [
            F.concat(
                F.lit(f"{self.bin_name}.{gran}."),
                F.date_format(F.col(self.data_field), _DATE_FORMATS[gran]),
            )
        ]


@dataclass
class LiteralBinner(BinnerConfig):
    """Field value as its own bin (DataBinningProcessor.java:165-169)."""

    data_field: str = ""

    def names(self, df: DataFrame) -> list[Column]:
        return [
            F.concat(F.lit(f"{self.bin_name}."), F.col(self.data_field).cast("string"))
        ]


@dataclass
class NumericBinner(BinnerConfig):
    """Hierarchical decimal bins to maxLevel (DataBinningProcessor.java:170-178).

    Level ℓ truncates to width 10^(maxLevel-ℓ): level 0 is coarsest.
    Bin value rendered as a long (deterministic cross-engine format).
    """

    data_field: str = ""
    max_level: int = 3

    def names(self, df: DataFrame) -> list[Column]:
        x = F.col(self.data_field).cast("double")
        out = []
        for level in range(self.max_level + 1):
            width = 10 ** (self.max_level - level)
            val = (F.floor(x / F.lit(float(width))) * width).cast("long")
            out.append(
                F.concat(F.lit(f"{self.bin_name}.L{level}."), val.cast("string"))
            )
        return out


@dataclass
class GeoTileBinner(BinnerConfig):
    """Quadkey bins for zoom 0..maxLevel (DataBinningProcessor.java:179-197).

    Either split lat/lon fields or a single data field holding "lat,lon"
    (the reference's single-dataFieldName variant, :186-191).
    """

    lat_field: str = ""
    lon_field: str = ""
    data_field: str = ""
    max_level: int = 8

    @property
    def _qk_col(self) -> str:
        return f"__qk_{self.bin_name}"

    def prepare(self, df: DataFrame) -> DataFrame:
        """Materialize the max-zoom quadkey once per row.

        The zoom-z quadkey is by construction the z-char prefix of the
        max-zoom quadkey (tile_x at zoom z = tile_x at max >> (max-z),
        so digit i is identical at every zoom ≥ i). Computing the trig
        (tan/cos/ln per row) once at max zoom and slicing prefixes
        replaces ~max² duplicated trig subtrees with exactly one."""
        if self.lat_field and self.lon_field:
            lat, lon = F.col(self.lat_field), F.col(self.lon_field)
        else:
            parts = F.split(F.col(self.data_field), ",")
            lat = parts.getItem(0).cast("double")
            lon = parts.getItem(1).cast("double")
        # Null/absent coordinates → null helper → every zoom's name is
        # null and the row is skipped, INCLUDING zoom 0 (whose quadkey
        # is the constant "" and would otherwise bin every row) — the
        # skip-absent-fields semantic of the reference binners, applied
        # uniformly across zoom levels and max_level=0.
        qk = F.when(
            lat.isNotNull() & lon.isNotNull(), quadkey(lon, lat, self.max_level)
        )
        return df.withColumn(self._qk_col, qk)

    def names(self, df: DataFrame) -> list[Column]:
        if self._qk_col not in df.columns:
            raise ValueError(
                f"GeoTileBinner {self.bin_name!r}: helper column "
                f"{self._qk_col!r} missing — names() requires prepare() "
                "to have been applied first (bin_records does this)"
            )
        qk = F.col(self._qk_col)
        return [
            F.concat(F.lit(f"{self.bin_name}.{z}."), F.substring(qk, 1, z))
            for z in range(self.max_level + 1)
        ]


@dataclass
class MergedBinner(BinnerConfig):
    """Cross-combination of previously-defined binners (:198-214).

    The cross product is taken over the component EXPRESSION LISTS at
    plan-build time (driver-side, config-static) — the result is again
    a flat list of concat expressions, so nothing interpreted runs per
    row. Order dependency mirrors the reference's binnersByName
    registry (:138,221-223; warn-on-forward-reference at :206).
    """

    components: list[str] = field(default_factory=list)
    registry: dict[str, BinnerConfig] = field(default_factory=dict)

    def names(self, df: DataFrame) -> list[Column]:
        missing = [c for c in self.components if c not in self.registry]
        if missing:
            raise ValueError(
                f"MergedBinner {self.bin_name!r}: components {missing} not yet "
                f"defined (reference warns at DataBinningProcessor.java:206)"
            )
        combos: list[Column] = self.registry[self.components[0]].names(df)
        for comp in self.components[1:]:
            combos = [
                F.concat(a, F.lit("|"), b)
                for a in combos
                for b in self.registry[comp].names(df)
            ]
        return [F.concat(F.lit(f"{self.bin_name}."), c) for c in combos]


def compile_binners(binner_cfgs: list[BinnerConfig]) -> list[BinnerConfig]:
    """Wire MergedBinner registries (config parsed once, driver-side —
    the analog of the reference's @OnScheduled setup :128-227)."""
    registry: dict[str, BinnerConfig] = {}
    for cfg in binner_cfgs:
        if isinstance(cfg, MergedBinner):
            cfg.registry = dict(registry)
        registry[cfg.bin_name] = cfg
    return binner_cfgs


def bin_records(
    df: DataFrame,
    binners: list[BinnerConfig],
    output_mode: str = OUTPUT_MODE_SINGLE,
    keep: list[str] | None = None,
) -> DataFrame:
    """Emit bin records for each input row.

    single → (*keep, name string) one row per non-null bin (explode).
    mulitple/multiple → one row per record with (*keep, bins array).
    A null field value yields a null name, dropped like the reference's
    binners skipping absent fields.
    """
    binners = compile_binners(binners)
    for b in binners:
        df = b.prepare(df)
    all_names = [n for b in binners for n in b.names(df)]
    keep_cols = [F.col(c) for c in (keep or [])]
    if output_mode.lower() in OUTPUT_MODES_MULTIPLE:
        # Array form keeps per-record grouping; nulls compacted.
        arr = F.array_compact(F.array(*all_names))
        return df.select(*keep_cols, arr.alias("bins"))
    if output_mode.lower() != OUTPUT_MODE_SINGLE:
        raise ValueError(f"unknown output mode {output_mode!r}")
    exploded = df.select(*keep_cols, F.explode(F.array(*all_names)).alias("name"))
    return exploded.filter(F.col("name").isNotNull())


def with_bin_metadata(
    recs: DataFrame,
    output_mode: str = OUTPUT_MODE_SINGLE,
    orig_filename_col: str | None = None,
) -> DataFrame:
    """Attach the reference's output FlowFile attributes as columns:
    `mime.type=application/json` (DataBinningProcessor.java:285,302)
    and the filename — `bin-<name>.json` per exploded bin in single
    mode (:284) or `bins-<original filename>.json` in "mulitple" mode
    (:301). Trivial concat expressions; declared §2.2 surface."""
    if output_mode.lower() in OUTPUT_MODES_MULTIPLE:
        if orig_filename_col is None:
            raise ValueError("mulitple-mode filenames need orig_filename_col")
        fname = F.concat(
            F.lit("bins-"), F.col(orig_filename_col), F.lit(".json")
        )
    else:
        fname = F.concat(F.lit("bin-"), F.col("name"), F.lit(".json"))
    return recs.withColumn("filename", fname).withColumn(
        "mime.type", F.lit("application/json")
    )


def bin_json_flowfiles(
    df: DataFrame,
    content_col: str,
    schema: str,
    binners: list[BinnerConfig],
    output_mode: str = OUTPUT_MODE_SINGLE,
    keep: list[str] | None = None,
):
    """The full FlowFile-shaped operator: JSON content → parse → bin,
    with the reference's three relationships (DataBinningProcessor.java:
    85-96): `bin` (the fan-out records), `original` (input passthrough,
    :308), `failure` (unparseable content, :316-318).

    Malformed documents are detected via from_json's corrupt-record
    column (PERMISSIVE mode fills FIELDS with null rather than nulling
    the struct, so a null-struct test alone misses garbage input) —
    the declarative analog of the reference's catch-and-route-per-
    record, evaluated vectorized instead of via per-row exceptions."""
    from .routing import Routed

    doc = F.from_json(
        F.col(content_col),
        schema + ", _corrupt_record string",
        {"columnNameOfCorruptRecord": "_corrupt_record"},
    )
    parsed = df.withColumn("_doc", doc)
    bad = F.col("_doc").isNull() | F.col("_doc._corrupt_record").isNotNull()
    failure = parsed.filter(bad).drop("_doc")
    flat = parsed.filter(~bad).select(*(keep or []), F.col("_doc.*")).drop(
        "_corrupt_record"
    )
    recs = bin_records(flat, binners, output_mode=output_mode, keep=keep)
    return Routed({"bin": recs, "original": df, "failure": failure})


def bin_count(df: DataFrame, binners: list[BinnerConfig]) -> DataFrame:
    """The full NiFi pattern: bin fan-out + downstream counter, fused.

    groupBy(name).count() gives map-side partial aggregation: the
    shuffle carries one row per (task, distinct bin), not one row per
    record-bin — the 100 TB-critical property.
    """
    return (
        bin_records(df, binners)
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("total"))
    )
