"""Composed training-data pipelines (north star): the individual
text/dedup operators wired into the end-to-end corpus-curation job a
large-scale LLM data pipeline runs — quality gate → exact dedup →
MinHash-LSH near-dup removal → token accounting.

Each stage is one of the engine's catalog operators
(:mod:`.functions.text`, :mod:`.functions.hashing`), so the pipeline
inherits their scale posture: every stage is a built-in-expression
DataFrame transform; the only shuffles are the exact-dedup window on
the text key and the LSH band groupBy — nothing quadratic in corpus
size, no Python in the hot path, and the whole pipeline is ONE
Catalyst plan (stages fuse; the corpus is scanned once per shuffle
boundary, not once per stage).

The reference has no such pipeline (its transform stage is per-tx
classification, ``src/etl/transform.rs:82-114``); this is the
BASELINE.json north-star extension, fully oracle-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import parallelize, table
from .functions.hashing import minhash_pairs, minhash_pairs_sql
from .functions.text import quality_score, quality_sql, token_count

QUALITY_MIN = 0.5
NEAR_DUP_SIM = 0.75  # >= 6 of 8 matching minhash components


def curate_corpus(docs: DataFrame) -> DataFrame:
    """Curate a (doc_id, lang, text) corpus for training:

    1. **quality gate** — keep docs with heuristic quality >= 0.5;
    2. **exact dedup** — one survivor per identical text (lowest
       doc_id wins; `row_number` window on the text key, the same
       last/first-wins shape as the reference's UPSERT S6/S7);
    3. **near-dup removal** — MinHash+LSH candidate pairs at estimated
       similarity >= 0.75; the higher doc_id of each pair is dropped
       (greedy keep-first — deterministic, order-free);
    4. **token accounting** — surviving docs sized for the training
       budget.

    Returns (doc_id, lang, n_tokens, quality).
    """
    scored = docs.select(
        "doc_id", "lang", "text", quality_score("text").alias("quality")
    ).where(F.col("quality") >= QUALITY_MIN)

    w = Window.partitionBy("text").orderBy("doc_id")
    uniq = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
        # Two consumers read uniq (the LSH pair branch and the anti-join
        # left side); without persist the scan+quality+dedup window runs
        # twice. At 100 TB this is where the curated corpus would be
        # checkpointed to storage anyway (stage outputs are the
        # pipeline's restart points).
        .persist()
    )

    dupes = (
        minhash_pairs(uniq.select("doc_id", "text"))
        .where(F.col("est_sim") >= NEAR_DUP_SIM)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )

    return uniq.join(dupes, "doc_id", "left_anti").select(
        "doc_id",
        "lang",
        token_count("text").alias("n_tokens"),
        "quality",
    )


def q_corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline over the documents fixture."""
    return curate_corpus(parallelize(table(spark, sf_dir, "documents"), spark))


ORACLE: dict[str, str] = {
    "q_corpus_curate": f"""
        WITH scored AS (
          SELECT * FROM ({quality_sql("documents")})
          WHERE quality >= {QUALITY_MIN}
        ), uniq AS (
          SELECT doc_id, lang, text, quality FROM (
            SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM scored
          ) WHERE rn = 1
        ), dupes AS (
          SELECT DISTINCT doc_b AS doc_id
          FROM ({minhash_pairs_sql("uniq")})
          WHERE est_sim >= {NEAR_DUP_SIM}
        )
        SELECT u.doc_id, u.lang,
               CAST(len(string_split(u.text, ' ')) AS BIGINT) AS n_tokens,
               u.quality
        FROM uniq u LEFT JOIN dupes d ON u.doc_id = d.doc_id
        WHERE d.doc_id IS NULL
    """,
}
