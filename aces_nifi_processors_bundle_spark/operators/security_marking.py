"""O2 — parse a raw security-classification marking into a struct.

Reference: ConvertSecurityMarkingAndAttrListIntoJson
(security/ConvertSecurityMarkingAndAttrListIntoJson.java:56; marking
parse :179-280, assembly :297-419; config POJO FlowAttrSecurityConfig
.java:14-23; output POJO Classification.java:16-24).

The processor does O1's typed projection PLUS parses a raw marking
string (e.g. "SECRET//COMP1//REL TO ABC//NOFORN") into
classification: struct<levels array<string>, compartments array<string>,
releasabilities array<string>, disseminationControls array<string>>.

Parse rules (exact, from the Java):
1. Level: a regex alternation of the receivable abbreviations + full
   names, suffixed by [A-Za-z<delim>]+ (:209-231), full-match with
   capture group 1 (:188-199); the captured token maps to a canonical
   level by FIRST-LETTER equality (:193-195). No match → "" (:180).
2. Compartments: marking contains delim+comp+delim (:233-243).
3. Releasabilities: marking contains delim+rel — no trailing delim, so
   end-of-string markings match (:245-256).
4. Dissemination controls: plain contains(dissem) (:258-266); FALLBACK:
   if none matched but any releasability substring is present, emit
   [disseminationControls[1]] — the SECOND configured control
   (:268-277).
5. Blank marking → IllegalStateException (:414-416) → failure route.

All pure string/array Column expressions — the per-record regex
rebuild in the reference (:188, an anti-optimization noted in SURVEY.md
§4) becomes a driver-side pattern build compiled once per task.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .routing import Routed, route_by


@dataclass
class SecurityMarkingConfig:
    """Mirror of FlowAttrSecurityConfig.java:14-23."""

    levels_to_convert_to: list[str] = field(default_factory=list)  # canonical
    levels_can_receive: list[str] = field(default_factory=list)  # full names
    level_abbrevs_can_receive: list[str] = field(default_factory=list)
    compartments: list[str] = field(default_factory=list)
    dissemination_controls: list[str] = field(default_factory=list)
    releasabilities: list[str] = field(default_factory=list)
    delimiter: str = "//"

    def level_pattern(self) -> str:
        """Alternation of abbrevs + full names with marking-suffix class
        (ConvertSecurityMarkingAndAttrListIntoJson.java:209-231)."""
        alts = "|".join(
            re.escape(a) for a in (self.level_abbrevs_can_receive + self.levels_can_receive)
        )
        # FAITHFUL to the Java (:226): '[A-Za-z' + dlm + ']+' — no
        # space in the class (a marking containing spaces does NOT
        # full-match, level stays ''), and '+' not '*' (a bare level
        # with no suffix does not match either — Matcher.matches()
        # requires at least one suffix char).
        suffix_class = "[A-Za-z" + re.escape(self.delimiter) + "]+"
        return f"^({alts}){suffix_class}$"


def classification_expr(marking: Column, cfg: SecurityMarkingConfig) -> Column:
    """Build the classification struct column from a raw marking column."""
    d = cfg.delimiter
    # the reference parses cleanRawMarking = rawSecurityMarking.trim()
    # (:402) — every converter sees the trimmed string
    marking = F.trim(marking)

    # 1. Level: full-match regex → captured token → first-letter map to canonical.
    captured = F.regexp_extract(marking, cfg.level_pattern(), 1)
    level = F.lit("")
    # Chain in reverse so earlier configured levels win (reference iterates
    # in order and takes the first first-letter match, :193-199).
    for canonical in reversed(cfg.levels_to_convert_to):
        level = F.when(
            (captured != "")
            & (F.substring(captured, 1, 1) == canonical[0]),
            F.lit(canonical),
        ).otherwise(level)
    levels = F.when(level != "", F.array(level)).otherwise(F.array().cast("array<string>"))

    # 2./3./4. contains-filters over the configured vocabularies. The
    # vocabularies are config-static, so each filter unrolls to a static
    # when-chain + array_compact — stays in whole-stage codegen (a
    # F.filter lambda would be interpreted per row per element).
    def _static_filter(values: list[str], probe) -> Column:
        return F.array_compact(
            F.array(*[F.when(probe(v), F.lit(v)) for v in values])
        ).cast("array<string>")

    compartments = _static_filter(
        cfg.compartments, lambda c: marking.contains(d + c + d)
    )
    rels = _static_filter(
        cfg.releasabilities, lambda r: marking.contains(d + r)
    )
    dissem_found = _static_filter(
        cfg.dissemination_controls, lambda x: marking.contains(x)
    )
    # Fallback rule (:268-277): none found + any releasability → 2nd
    # control. The Java fallback probes contains(rel) WITHOUT the
    # delimiter prefix (unlike the releasabilities parse above), so a
    # marking carrying a rel token in any position still triggers it.
    if len(cfg.dissemination_controls) > 1:
        rel_any = F.lit(False)
        for r in cfg.releasabilities:
            rel_any = rel_any | marking.contains(r)
        fallback = F.array(F.lit(cfg.dissemination_controls[1]))
        dissem = F.when(
            (F.size(dissem_found) == 0) & rel_any, fallback
        ).otherwise(dissem_found)
    else:
        dissem = dissem_found

    return F.struct(
        levels.alias("levels"),
        compartments.alias("compartments"),
        rels.alias("releasabilities"),
        dissem.alias("disseminationControls"),
    )


def convert_security_marking(
    df: DataFrame, marking_col: str, cfg: SecurityMarkingConfig
) -> Routed:
    """Attach the parsed ``classification`` struct; route blank markings
    to failure (IllegalStateException at :414-416)."""
    marking = F.col(marking_col)
    out = df.withColumn("classification", classification_expr(marking, cfg))
    blank = marking.isNull() | (F.trim(marking) == "")
    return route_by(
        out, F.when(blank, "failure").otherwise("success"), ["success", "failure"]
    )
