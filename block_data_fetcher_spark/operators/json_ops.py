"""JSON navigation + array operators (SURVEY §2.2 P1-P6, P11-P12).

The reference's parse path navigates untyped JSON per transaction
(``src/etl/extract.rs:74-163``) and handles arrays row-at-a-time; here
the same semantics are Catalyst expressions over the ``events.props``
JSON column and the ``embeddings.embedding`` / ``documents.text``
arrays — all JVM-side, whole-stage-codegen friendly, zero Python UDFs.

Scale: `get_json_object` / higher-order array functions run inside
codegen; at 100 TB the win over the reference's serde_json row loop is
vectorized evaluation plus column pruning (only ``props`` is read)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSON field extraction + typed cast + filter (reference P2:
    ``signature = signatures[0]``, ``fee = meta.fee`` —
    ``src/etl/extract.rs:74-113``)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_id", k.alias("k")).where(F.col("k") > 50)


def q_coalesce_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesce-across-paths + cast (reference P11 token amount:
    ``coalesce(info.amount, info.tokenAmount.amount)`` —
    ``src/etl/parsers/token.rs:16-59``)."""
    ev = table(spark, sf_dir, "events")
    v = F.coalesce(
        F.get_json_object("props", "$.missing"),
        F.get_json_object("props", "$.k"),
    ).cast("long")
    return ev.select("event_id", v.alias("k"))


def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten-with-index (reference P1: block → (tx, position) —
    ``src/etl/extract.rs:55-71``): posexplode the embedding array.

    Scale: generators run inside the scan stage — no shuffle; output
    partitioning inherits the input's."""
    em = table(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        # + 0.0 folds IEEE -0.0 to +0.0 (mirrored in the oracle)
        (F.round(F.col("val").cast("double"), 4) + 0.0).alias("val"),
    )


def q_array_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array sizes (reference P3 ``num_accounts = len(accountKeys)`` —
    ``src/etl/extract.rs:96-107``)."""
    em = table(spark, sf_dir, "embeddings")
    return em.select("vec_id", F.size("embedding").cast("long").alias("dim"))


def q_array_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-preserving distinct over an array (reference P4 program-id
    dedup, ``src/etl/extract.rs:116-163`` — an O(n²) ``contains`` loop
    there; hash-based ``array_distinct`` here)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.array_distinct(F.split("text", " "))).cast("long").alias("n_distinct"),
    )


def q_first_element(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First array element (reference P6 signer = accountKeys[0],
    ``src/etl/load.rs:221-236``)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.element_at(F.split("text", " "), 1).alias("first_tok")
    )


def q_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match-across-array (reference P12: first transfer-shaped
    instruction wins, ``src/etl/transform.rs:307-331``):
    ``element_at(filter(xs, pred), 1)`` — ``try_element_at`` because the
    filtered array may be empty (ANSI mode)."""
    em = table(spark, sf_dir, "embeddings")
    first = F.try_element_at(
        F.filter(F.col("embedding"), lambda x: x > F.lit(0.5)), F.lit(1)
    )
    return em.select(
        "vec_id", F.round(first.cast("double"), 4).alias("first_gt_half")
    )


def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured navigation through Spark 4's VARIANT type:
    ``parse_json`` once, typed ``try_variant_get`` paths after — the
    modern engine path for the reference's JSONB columns (SURVEY §1.2
    lists VariantType as the ``raw_data``/``data_decoded`` mapping).

    Versus per-path ``get_json_object`` re-parsing: VARIANT parses the
    document once into a binary encoding; each extraction is a
    pointer walk. With one hot path the win is modest, but the
    reference's raw_data is navigated by ad-hoc ``.get()`` chains
    (src/etl/extract.rs:89-107) — many paths per document at scale."""
    ev = table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.when(k > 50, 1)).alias("n_high"),
    )


ORACLE: dict[str, str] = {
    "q_json_variant": """
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               count(*) FILTER (
                 WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
               ) AS n_high
        FROM events GROUP BY event_type
    """,
    "q_json_extract": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    """,
    "q_coalesce_cast": """
        SELECT event_id,
               CAST(coalesce(json_extract_string(props, '$.missing'),
                             json_extract_string(props, '$.k')) AS BIGINT) AS k
        FROM events
    """,
    "q_explode": """
        SELECT vec_id,
               CAST(unnest(range(len(embedding))) AS BIGINT) AS pos,
               round(CAST(unnest(embedding) AS DOUBLE), 4) + 0.0 AS val
        FROM embeddings
    """,
    "q_array_size": """
        SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim FROM embeddings
    """,
    "q_array_distinct": """
        SELECT doc_id,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
        FROM documents
    """,
    "q_first_element": """
        SELECT doc_id, string_split(text, ' ')[1] AS first_tok FROM documents
    """,
    "q_first_match": """
        SELECT vec_id,
               round(CAST(list_filter(embedding, x -> x > 0.5)[1] AS DOUBLE), 4)
                 AS first_gt_half
        FROM embeddings
    """,
}
