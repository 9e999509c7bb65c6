"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification, and embedding-cosine near-dup.

Scale design (the 100 TB story):
- Exact dedup is a hash-groupBy: one shuffle on md5(text), partial agg
  map-side. Never a sort, never a cross join.
- Near-dup is the classic MinHash → banded LSH → bucket join pipeline:
  per-doc signatures (one projection), explode to (band_key, doc) —
  the only shuffle is on band buckets, and candidate verification runs
  per-bucket, so cost scales with collisions, not with n². Skewed
  buckets (boilerplate shingles) are handled by AQE skew-join split +
  an optional bucket-size cap.
- Hash function: lexicographic MIN of md5(seed || shingle) — md5 is
  deterministic, seedable by string prefix, and exists in DuckDB, so
  the whole pipeline (signatures included) is oracle-checkable. A
  production swap to xxhash64 is one line.

SimHash is Spark-only (bit-manipulation over md5 prefixes; no clean
ANSI mirror) and is checked by pytest unit tests instead of the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import shingles


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, n_dups, keeper).

    keeper = min id — the canonical survivor; at scale this is the
    standard one-shuffle hash-groupBy (no sort)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(F.col(id_col)).alias("keeper"),
        )
    )


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one doc per identical text (the min-id row)."""
    groups = exact_dup_groups(df, text_col, id_col).select(
        "text_hash", F.col("keeper").alias(id_col)
    )
    return df.join(
        groups,
        (F.md5(F.col(text_col)) == F.col("text_hash"))
        & (df[id_col] == groups[id_col]),
        "left_semi",
    )


def minhash_signature(text: Column, num_hashes: int, k: int = 3) -> list[Column]:
    """MinHash signature: h_i = min over shingles of md5(i || '|' || s).

    Lexicographic min over hex strings ≈ min over uniform 128-bit ints;
    collision probability Pr[h_i(A)=h_i(B)] = Jaccard(A,B) as usual."""
    sh = shingles(text, k)

    def _seeded(i: int):
        # one-arg lambda: a default arg would change the arity F.transform
        # sees and bind the seed to the element-index column instead
        return lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))

    return [
        F.array_min(F.transform(sh, _seeded(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band.

    bands = num_hashes/band_size buckets of concatenated hashes; docs
    agreeing on a full band collide. The self-join is per-bucket
    (groupBy band_key), so complexity is Σ|bucket|² — with 128-bit
    band keys, buckets are true near-dup clusters, not random load.
    """
    assert num_hashes % band_size == 0
    sigs = df.select(F.col(id_col), *minhash_signature(F.col(text_col), num_hashes, k))
    n_bands = num_hashes // band_size
    band_entries = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "#",
                        F.lit(str(b)),
                        *[F.col(f"mh_{b * band_size + j}") for j in range(band_size)],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band_key"),
    )
    a = band_entries.alias("a")
    b = band_entries.alias("b")
    return (
        a.join(b, "band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Exact Jaccard over word-k-gram shingle SETS for candidate pairs.

    Join the (small) candidate pair set back to the docs — two hash
    joins — then set arithmetic per pair. Verification cost scales with
    candidates, not corpus.
    """
    sh = df.select(
        F.col(id_col),
        F.array_distinct(shingles(F.col(text_col), k)).alias("sh"),
    )
    out = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return out.select(
        "id_a",
        "id_b",
        F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)).alias("jaccard"),
    )


def near_dup_pairs_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold."""
    cands = minhash_lsh_candidates(df, text_col, id_col, num_hashes, band_size, k)
    verified = ngram_jaccard(df, cands, text_col, id_col, k)
    return verified.filter(F.col("jaccard") >= threshold)


# --- SimHash (Spark-only; pytest-verified) -----------------------------

def simhash64(text: Column, k: int = 3) -> Column:
    """64-bit SimHash over word k-gram shingles.

    Bit j of the hash of each shingle (md5 prefix → bigint via conv)
    votes ±1; the sign of the total per bit forms the fingerprint.
    Near-dup docs differ in few bits (Hamming distance ≤ 3 typical).
    """
    sh = shingles(text, k)
    h = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
    )
    bits = F.sequence(F.lit(0), F.lit(59))  # 15 hex chars = 60 bits
    # Single pass over the shingle hashes with a 60-slot vote accumulator
    # (vs 60 separate aggregates, which blows up the expression tree).
    votes = F.aggregate(
        h,
        F.transform(bits, lambda b: F.lit(0).cast("bigint")),
        lambda acc, x: F.zip_with(
            acc,
            bits,
            # call_function: the python shiftright/shiftleft wrappers only
            # take an int shift, but the bit index is a lambda column here
            lambda a, b: a
            + F.when(
                F.call_function("shiftright", x, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            bits,
            lambda v, b: F.when(
                v > 0, F.call_function("shiftleft", F.lit(1).cast("bigint"), b)
            ).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    k: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash banding: split the 60-bit fingerprint
    into (max_hamming+1) segments — pigeonhole guarantees any pair
    within max_hamming agrees on ≥1 full segment → bucket-join on the
    segment value, verify Hamming distance on collision."""
    n_seg = max_hamming + 1
    seg_bits = 60 // n_seg
    fp = df.select(F.col(id_col), simhash64(F.col(text_col), k).alias("fp"))
    segs = fp.select(
        id_col,
        "fp",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "#",
                        F.lit(str(s)),
                        F.shiftright(F.col("fp"), s * seg_bits)
                        .bitwiseAND(F.lit((1 << seg_bits) - 1))
                        .cast("string"),
                    )
                    for s in range(n_seg)
                ]
            )
        ).alias("seg_key"),
    )
    a, b = segs.alias("a"), segs.alias("b")
    pairs = (
        a.join(b, "seg_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return pairs.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
