"""Similarity search over embedding columns (SURVEY §2.9 X4-X5 +
north-star ANN / near-dup).

The `embeddings` fixture carries `array<float>` vectors (the stand-in
for the reference's only array column, `instructions.accounts TEXT[]`,
``migrations/20251023000003_create_instructions.sql:18``). Cosine
similarity is a fold over `zip_with` products — built-in higher-order
functions, JVM-side, deterministic left-to-right summation (matches
DuckDB's sequential list loop bit-for-bit in double precision).

Scale posture:
- brute-force top-k to ONE query vector is a map + TakeOrderedAndProject
  — embarrassingly parallel, no shuffle; fine at any scale.
- all-pairs near-dup is O(n²) — `q_embed_near_dup` blocks by `label`
  (an IVF-style coarse quantizer: only same-cell pairs are compared);
  `q_ann_lsh` buckets by deterministic hyperplane signs (LSH) so
  candidate generation is a bucket-equijoin, the 100 TB-safe path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + left-fold — double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def q_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 to the vec_id=0 query vector (X4).

    The single query vector is collected driver-side (one row — the
    legitimate collect) and inlined as a literal so the scan side needs
    no join at all. Scale: map + top-k merge, no shuffle."""
    em = table(spark, sf_dir, "embeddings")
    qvec = em.where(F.col("vec_id") == 0).select("embedding").head()[0]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    return (
        em.select(
            "vec_id",
            (F.round(cosine(F.col("embedding"), qlit), 4) + 0.0).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (north star), blocked by
    `label` as an IVF-style coarse cell: pairs (a<b) in the same cell
    with cosine > 0.99.

    Scale: the blocking join shuffles on `label` only; within-cell
    pairing is quadratic per cell, bounded by cell size — the same
    contract as IVF probing. Salting applies if one cell dominates."""
    em = table(spark, sf_dir, "embeddings")
    a = em.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("la"), F.col("embedding").alias("ea")
    )
    b = em.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"), F.col("embedding").alias("eb")
    )
    pairs = a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("ea"), F.col("eb")), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") > 0.99)
    )


ORACLE: dict[str, str] = {
    "q_knn_topk": """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(
                 list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]), qe),
                                         p -> p[1] * p[2]))
                 / (sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))
                    * sqrt(list_sum(list_transform(qe, x -> x * x)))),
                 4) + 0.0 AS cos_sim
        FROM embeddings, q
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """,
    "q_embed_near_dup": """
        SELECT * FROM (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 round(
                   list_sum(list_transform(list_zip(CAST(a.embedding AS DOUBLE[]),
                                                    CAST(b.embedding AS DOUBLE[])),
                                           p -> p[1] * p[2]))
                   / (sqrt(list_sum(list_transform(CAST(a.embedding AS DOUBLE[]), x -> x * x)))
                      * sqrt(list_sum(list_transform(CAST(b.embedding AS DOUBLE[]), x -> x * x)))),
                   4) AS cos_sim
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id
        ) WHERE cos_sim > 0.99
    """,
}
