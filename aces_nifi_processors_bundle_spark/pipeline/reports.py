"""Corpus-analytics reports — the dataset-card numbers a curation run
publishes alongside the data (vocabulary richness, length profile,
cross-source duplication).

Same design rules as the rest of pipeline/: pure built-in expressions,
map-side-combined aggregates, nothing driver-side beyond the final
small report frames, and every expression mirrorable in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vocab_stats(
    df: DataFrame, text_col: str = "text", group_col: str = "lang"
) -> DataFrame:
    """Per-group vocabulary report: docs, token occurrences, distinct
    terms, and type-token ratio (distinct/total — the Heaps-law point
    estimate a corpus card quotes).

    One explode + one groupBy(group): token rows combine map-side into
    per-(group) partials; distinct terms use count_distinct (two-phase
    under the same shuffle)."""
    from .text import term_rows

    toks = term_rows(df, text_col, group_col)
    docs = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    terms = toks.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("term").alias("n_terms"),
    )
    # LEFT join: a group whose docs produce zero terms (empty texts, or
    # scripts outside the ASCII tokenizer) must still appear on the
    # card with n_tokens=0, not vanish.
    return docs.join(terms, group_col, "left").select(
        group_col,
        "n_docs",
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce("n_terms", F.lit(0)).cast("bigint").alias("n_terms"),
        F.when(
            F.coalesce("n_tokens", F.lit(0)) > 0,
            F.col("n_terms") / F.col("n_tokens").cast("double"),
        ).alias("type_token_ratio"),
    )


def length_histogram(
    df: DataFrame, text_col: str = "text", group_col: str = "lang"
) -> DataFrame:
    """Log2-binned word-count histogram per group — the length profile
    (bin b holds docs with floor(log2(n_words+1)) == b). Pure
    projection + one groupBy; bins are bounded (~40 for any corpus),
    so the report is tiny regardless of input size."""
    from .text import word_count

    n = word_count(F.col(text_col))
    return (
        df.select(
            F.col(group_col),
            F.floor(F.log2(n + F.lit(1))).cast("int").alias("len_bin"),
        )
        .groupBy(group_col, "len_bin")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def cross_source_dups(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source duplication matrix: for each source pair
    (source_a < source_b), how many distinct texts appear in BOTH —
    the dataset-card overlap table that decides which sources to
    dedup against each other first.

    Per text: the distinct source SET (bounded by |sources|, a small
    constant) collects in one groupBy, expands to in-array source
    pairs via double explode, and one count per pair follows. Pairs
    keep their text_hash through the expansion — unlike the dedup
    candidate generator, which distincts pairs globally — because the
    report counts texts PER pair, not mere pair existence."""
    srcs = (
        df.select(
            F.md5(F.col(text_col)).alias("text_hash"), F.col(source_col)
        )
        .groupBy("text_hash")
        .agg(F.sort_array(F.collect_set(source_col)).alias("_srcs"))
    )  # collect_set dedups — no pre-distinct shuffle needed
    pairs = (
        srcs.select("text_hash", F.explode("_srcs").alias("source_a"), "_srcs")
        .select("text_hash", "source_a", F.explode("_srcs").alias("source_b"))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    return pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_shared_texts")
    )
