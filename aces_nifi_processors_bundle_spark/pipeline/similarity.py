"""Similarity search over an embedding column (array<float>).

Two paths, per the north star:
- Brute-force cosine top-k: exact baseline. The query set broadcasts
  (it's small); the corpus streams through one projection — no shuffle
  on the corpus side at all; per-query top-k via window row_number
  over (query partition). At 1000 executors this is embarrassingly
  parallel: each task scores its corpus slice against the broadcast
  queries and emits its local top-k; the final top-k merge shuffles
  only k rows per (query, task).
- LSH-bucketed ANN (random hyperplanes): sign-bit sketch per vector,
  bucket join on sketch prefix — the scale path when the query set is
  the whole corpus (all-pairs). Hyperplane components are derived from
  md5 so both engines could reproduce them; recall is pytest-checked
  against brute force rather than oracle-matched.

Dot products use F.aggregate over F.zip_with — sequential fold,
bit-identical to DuckDB's list_cosine_similarity on DOUBLE lists,
which is what makes the brute-force path oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double(a: Column) -> Column:
    return a.cast("array<double>")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, neighbor_id, cos) — k rows per query, ranked by
    (cos desc, neighbor_id asc); self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 —
    reproducible across engines and runs, no RNG state."""
    import hashlib

    comps = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}|{d}".encode()).hexdigest()
        comps.append(int(h[:8], 16) / float(0xFFFFFFFF) - 0.5)
    return comps


def lsh_sketch(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Sign-bit sketch: bit p = 1 iff vec · hyperplane_p > 0."""
    bits = []
    for p in range(n_planes):
        plane = _hyperplane(p, dim)
        d = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("bigint")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates share ≥1 sketch band; scored exactly.

    Recall < 1 by construction; pytest checks recall vs brute force.
    At all-pairs scale this replaces the n² cross join with a bucket
    join whose cost follows bucket occupancy (cosine-clustered)."""
    assert n_planes % n_bands == 0
    band_bits = n_planes // n_bands
    mask = (1 << band_bits) - 1

    def with_bands(df: DataFrame, prefix: str) -> DataFrame:
        sk = lsh_sketch(as_double(F.col(vec_col)), dim, n_planes)
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            as_double(F.col(vec_col)).alias(f"{prefix}v"),
            F.explode(
                F.array(
                    *[
                        F.concat_ws(
                            "#",
                            F.lit(str(b)),
                            F.shiftright(sk, b * band_bits)
                            .bitwiseAND(F.lit(mask))
                            .cast("string"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("band_key"),
        )

    qb = with_bands(queries, "query")
    cb = with_bands(corpus, "neighbor")
    cands = (
        qb.join(cb, "band_key")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "queryv", "neighborv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("queryv"), F.col("neighborv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def embedding_near_dups(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos ≥ threshold)
    via the LSH bucket join — the all-pairs dedup path."""
    banded = None
    sk = lsh_sketch(as_double(F.col(vec_col)), dim, n_planes)
    band_bits = n_planes // n_bands
    mask = (1 << band_bits) - 1
    banded = df.select(
        F.col(id_col).alias("vid"),
        as_double(F.col(vec_col)).alias("v"),
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "#",
                        F.lit(str(b)),
                        F.shiftright(sk, b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .cast("string"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band_key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, "band_key")
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.select(
        "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos")
    ).filter(F.col("cos") >= threshold)
