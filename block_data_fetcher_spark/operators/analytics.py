"""Analytic query-layer completeness: running windows, lag/lead,
percentiles, cube, distinct counts, set operations.

The reference delegates ALL analytical queries to PostgreSQL
(SURVEY §3 entry point 3 — its migrations' index set documents the
intended workload); a user switching from the reference's Postgres
to this engine expects the standard analytic SQL surface. These
operators complete it Spark-first.

Scale notes: ranked/running windows shuffle once on the partition key;
percentiles aggregate with map-side partials; cube multiplies output
groups (4x here), not input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user aggregates ordered by event time — the
    account-activity rollup (reference A4) as an incremental view."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("run_cnt"),
        F.round(F.sum("value").over(w), 2).alias("run_sum"),
    )


def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user delta vs previous event (lag) — inter-arrival shapes."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.coalesce(prev, F.lit(0.0)), 2).alias("delta"),
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type (p50/p90)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5) + 1e-9, 4).alias("p50"),
        F.round(F.percentile("value", 0.9) + 1e-9, 4).alias("p90"),
    )


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (lang, source): all four grouping combinations."""
    docs = table(spark, sf_dir, "documents")
    return docs.cube("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (the reference's per-type
    distribution A2, deduplicated by actor)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT over derived key sets (absent from the
    reference — SURVEY §2.6 'not present'; added for query-layer
    completeness): buyers ∩ error-users, buyers ∖ error-users."""
    ev = table(spark, sf_dir, "events")
    buyers = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    err = ev.where(F.col("event_type") == "error").select("user_id").distinct()
    n_both = buyers.intersect(err).agg(F.count("*").alias("n_both"))
    n_only = buyers.exceptAll(err).agg(F.count("*").alias("n_buyers_only"))
    return n_both.crossJoin(n_only)


ORACLE: dict[str, str] = {
    "q_window_running": """
        SELECT event_id, user_id,
               count(*) OVER w AS run_cnt,
               round(sum(value) OVER w, 2) AS run_sum
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "q_window_lag": """
        SELECT event_id, user_id,
               round(value - coalesce(lag(value) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 2)
                 AS delta
        FROM events
    """,
    "q_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5) + 1e-9, 4) AS p50,
               round(quantile_cont(value, 0.9) + 1e-9, 4) AS p90
        FROM events GROUP BY event_type
    """,
    "q_cube": """
        SELECT lang, source, count(*) AS n_docs, sum(n_chars) AS total_chars
        FROM documents GROUP BY CUBE (lang, source)
    """,
    "q_count_distinct": """
        SELECT event_type, count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events GROUP BY event_type
    """,
    "q_set_ops": """
        WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
             err AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        SELECT
          (SELECT count(*) FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM err)) AS n_both,
          (SELECT count(*) FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM err)) AS n_buyers_only
    """,
}
