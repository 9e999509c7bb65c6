"""Text-analysis operators for a large-scale training-data pipeline.

Beyond the reference's surface (BASELINE.json north star): language ID,
quality scoring, token counting, and document fingerprinting over a
`documents(doc_id, text, lang, source, n_chars)` table.

All pure Column expressions — no Python in the hot path. At 100 TB the
text column dominates scan cost, so every operator here is a single
projection over one pass of the data; the only shuffles are the final
small aggregations. Expressions are written to be exactly mirrorable
in ANSI SQL for the DuckDB oracle (regexp_* + length arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker vocabularies for the n-gram/stopword
# language-ID heuristic. Deliberately small and deterministic — a real
# deployment would swap in fastText/CLD3 behind the same transform.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of"],
    "es": ["el", "la", "de"],
    "fr": ["le", "la", "et"],
    "de": ["der", "die", "und"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def word_count(text: Column) -> Column:
    """Whitespace token count (single-space-delimited corpus)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.regexp_replace(t, " ", "")) + 1
    ).cast("bigint")


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token estimate: count word-piece boundaries with a regex
    (letters runs, digit runs, punctuation singles) — the standard
    ~len/4 pre-tokenizer approximation, computable engine-side."""
    pieces = F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    return pieces.cast("bigint")


def occurrences(text: Column, word: str) -> Column:
    """Count of whole-word occurrences (space-padded contains count)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return F.regexp_count(padded, F.lit(rf"\s{word}\s"))


def stopword_count(text: Column, stopwords: list[str] | None = None) -> Column:
    out = F.lit(0)
    for w in stopwords or STOPWORDS:
        out = out + occurrences(text, w)
    return out.cast("bigint")


def language_scores(text: Column) -> list[Column]:
    """Per-language marker-hit scores, aliased score_<lang>."""
    return [
        sum((occurrences(text, w) for w in words), F.lit(0)).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]


def predict_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker scores, 'und' if all zero.

    Ties break by language order (en, es, fr, de) — deterministic."""
    scored = df.select("*", *language_scores(F.col(text_col)))
    langs = list(LANG_MARKERS)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(langs):
        s = F.col(f"score_{lang}")
        # >= so earlier languages win ties (applied in reverse)
        cond = s > F.lit(0)
        better_than_later = [s >= F.col(f"score_{l2}") for l2 in langs if l2 != lang]
        for b in better_than_later:
            cond = cond & b
        best = F.when(cond, F.lit(lang)).otherwise(best)
    return scored.withColumn("pred_lang", best).drop(
        *[f"score_{lang}" for lang in langs]
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Per-document quality features (length / punct / stopword ratios).

    The classic cheap quality filters (Gopher/C4-style rules) as pure
    expressions; each is oracle-mirrorable.
    """
    n_chars = F.length(text).cast("bigint")
    n_words = word_count(text)
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]")).cast("bigint")
    n_stop = stopword_count(text)
    avg_word_len = F.when(n_words > 0, (n_chars - (n_words - 1)) / n_words).otherwise(
        F.lit(0.0)
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_punct": n_punct,
        "n_stopwords": n_stop,
        "avg_word_len": avg_word_len,
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0)),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: word-count band + stopword presence
    − punctuation excess. Weights are golden spec (no reference analog)."""
    f_ = quality_features(text)
    len_ok = (f_["n_words"] >= 10) & (f_["n_words"] <= 100000)
    return (
        F.when(len_ok, F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when(f_["stopword_ratio"] > 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(f_["punct_ratio"] < 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-gram shingle array; documents shorter than k words get one
    whole-text shingle. Built with split + static slice expressions
    where possible — but variable length forces one HOF here; it runs
    once per doc (not per shingle-pair), off the O(n²) path."""
    words = F.split(F.trim(text), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.get(words, i + j) for j in range(k)]
        ),
    )
    return F.when(n >= k, grams).otherwise(F.array(F.trim(text)))


def fingerprint(text: Column, k: int = 3) -> Column:
    """Document fingerprint: lexicographic-min MD5 over word k-gram
    shingles (winnowing-lite). Identical prefix-content docs collide →
    near-dup candidate key. md5 is available in both Spark and DuckDB,
    so the fingerprint is oracle-checkable byte-for-byte."""
    return F.array_min(F.transform(shingles(text, k), F.md5))
