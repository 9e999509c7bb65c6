"""String-similarity join: all pairs within Levenshtein distance k,
without the all-pairs comparison.

Blocking is SymSpell-style symmetric deletion neighborhoods: if
ed(s, t) <= k, then deleting at most k characters from each side can
reach a common string (both can be reduced to a shared subsequence of
length >= max(|s|,|t|) - k), so the depth-k deletion neighborhoods of
s and t intersect. Candidates therefore come from an EQUI-join on
deletion variants — a banded hash join, never a cartesian product —
and every candidate is verified with the real `levenshtein()`
(JVM-side, with the early-exit threshold argument), so false
positives cost only the verify and false negatives cannot exist.

Scale design:

- Neighborhood size is C(len, <=k) ≈ len^k/k! variants per row — the
  fan-out is explode-only (no shuffle) and the paper-documented trade
  of SymSpell: keys should be SHORT (prefixes, titles, codes), not
  whole documents. For long-text near-dup use the MinHash/SimHash
  paths in pipeline/dedup.py; this operator is for the short-string
  regime those hashes are too coarse for.
- A popular variant (e.g. a template prefix shared by thousands of
  rows) floods its bucket quadratically — the same hot-bucket physics
  as SimHash bands. `max_bucket` drops variants whose row count
  exceeds the cap (drops are a documented recall trade, mirrored in
  the oracle only when set; default None keeps exactness).
- The variant join carries (id, s) through the shuffle so the verify
  runs inline on the join output — no second join back to the base
  frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _one_char_deletions(col):
    """Array of every string obtainable by deleting exactly one char.
    Interpreted higher-order function, but over per-row arrays bounded
    by the key length — the documented short-string regime."""
    n = F.length(col)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(F.substring(col, 1, i - 1), F.substr(col, i + 1)),
    )


def deletion_variants(
    df: DataFrame, id_col: str, str_col: str, k: int
) -> DataFrame:
    """(id, s, variant) — every string reachable from s by deleting at
    most k characters, deduplicated per row. k rounds of explode; no
    shuffle until the caller joins."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    out = df.select(
        F.col(id_col).alias("__id"),
        F.col(str_col).alias("__s"),
        F.array(F.col(str_col)).alias("__vars"),
    )
    for _ in range(k):
        out = out.select(
            "__id",
            "__s",
            F.array_distinct(
                F.flatten(
                    F.transform(
                        "__vars",
                        lambda v: F.array_append(_one_char_deletions(v), v),
                    )
                )
            ).alias("__vars"),
        )
    # __vars is already deduplicated by the loop's final array_distinct
    return out.select("__id", "__s", F.explode("__vars").alias("__var"))


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    k: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """Self-join: all (id_1, id_2, dist) pairs with id_1 < id_2 and
    levenshtein(s_1, s_2) <= k. Candidates from the deletion-variant
    equi-join, verified with the thresholded JVM levenshtein; the
    length-band |len1-len2| <= k prunes before the verify (a distance
    <= k cannot bridge a larger length gap).
    """
    # the k-round variant fan-out (the dominant cost) is consumed by
    # BOTH join sides — and a third time by the bucket-count aggregate
    # when max_bucket is set; without a lineage cut Spark re-executes
    # it per consumer (verified: no ReusedExchange is planned)
    v = deletion_variants(df, id_col, str_col, k).localCheckpoint(eager=False)
    if max_bucket is not None:
        counts = v.groupBy("__var").agg(F.count(F.lit(1)).alias("__bn"))
        v = (
            v.join(counts, "__var")
            .where(F.col("__bn") <= max_bucket)
            .drop("__bn")
        )
    a = v.select(
        F.col("__id").alias("id_1"),
        F.col("__s").alias("s_1"),
        F.col("__var").alias("__var"),
    )
    b = v.select(
        F.col("__id").alias("id_2"),
        F.col("__s").alias("s_2"),
        F.col("__var").alias("__var"),
    )
    return (
        a.join(b, "__var")
        .where(F.col("id_1") < F.col("id_2"))
        .where(
            F.abs(F.length("s_1") - F.length("s_2")) <= k
        )
        .select("id_1", "id_2", "s_1", "s_2")
        .dropDuplicates(["id_1", "id_2"])
        .withColumn("dist", F.levenshtein("s_1", "s_2", k))
        .where(F.col("dist") >= 0)  # thresholded form returns -1 above k
        .select("id_1", "id_2", "dist")
    )
