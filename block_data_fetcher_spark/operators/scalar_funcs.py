"""Scalar / aggregate function-family coverage: statistics, strings,
dates. The reference's query layer was full PostgreSQL (SURVEY §3
entry point 3), so a switching user expects the standard function
families beyond what the §2.10 operators already exercise.

All built-in expressions; oracle-parity notes inline where Spark and
DuckDB semantics could drift (rounding of order-dependent float
reductions, weekday conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table


def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family per event type: sample stddev /
    variance of value, and the value↔JSON-k correlation.

    Scale: all of these are algebraic (sum, sum-of-squares,
    cross-moments) — map-side partials, one shuffle of constant-size
    state per group. Rounded to 4 with the +1e-9 nudge on both sides:
    partial-merge order perturbs the last float bits."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value") + 1e-9, 4).alias("sd_value"),
        F.round(F.var_samp("value") + 1e-9, 4).alias("var_value"),
        F.round(F.corr(F.col("value"), k) + 1e-9, 4).alias("corr_value_k"),
    )


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over customer names: case mapping,
    substring, length, padding, reversal, edit distance to a fixed
    pattern. Pure per-row projections — codegen'd, shuffle-free."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).cast("long").alias(
            "seg_dist"
        ),
    )


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family over orders: parts, offsets, diffs,
    month ends — grouped by order month for a bounded result.

    dayofweek is EXCLUDED deliberately: Spark numbers Sunday=1,
    DuckDB Sunday=0 — a portability trap, not a capability gap; month
    arithmetic below is convention-free."""
    od = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        od.groupBy(
            F.year(d).cast("long").alias("o_year"),
            F.month(d).cast("long").alias("o_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.max(F.dayofmonth(d)).cast("long").alias("max_dom"),
            F.min(F.date_add(d.cast("date"), 30)).alias("min_due_date"),
            F.max(F.last_day(d)).alias("month_end"),
            F.max(F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")))
            .cast("long")
            .alias("max_days_to_2002"),
        )
    )


ORACLE: dict[str, str] = {
    "q_stats_agg": """
        SELECT event_type,
               round(stddev_samp(value) + 1e-9, 4) AS sd_value,
               round(var_samp(value) + 1e-9, 4) AS var_value,
               round(corr(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)) + 1e-9, 4)
                 AS corr_value_k
        FROM events GROUP BY event_type
    """,
    "q_string_funcs": """
        SELECT c_custkey,
               upper(c_name) AS name_upper,
               substring(c_name, 1, 8) AS name_prefix,
               CAST(length(c_name) AS BIGINT) AS name_len,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
               reverse(c_mktsegment) AS seg_rev,
               CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS seg_dist
        FROM customer
    """,
    "q_date_funcs": """
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(month(o_orderdate) AS BIGINT) AS o_month,
               count(*) AS n_orders,
               CAST(max(day(o_orderdate)) AS BIGINT) AS max_dom,
               min(CAST(o_orderdate AS DATE) + 30) AS min_due_date,
               max(last_day(CAST(o_orderdate AS DATE))) AS month_end,
               CAST(max(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')) AS BIGINT)
                 AS max_days_to_2002
        FROM orders GROUP BY 1, 2
    """,
}
