"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`block_data_fetcher_spark.api` — the real engine.
``entry`` runs the flagship query (the lineitem⋈orders revenue rollup,
the analog of the reference's transactions-per-block-with-fees report)
at sf0.001; ``queries``/``oracle_sql`` expose the full operator catalog
from SURVEY.md §2.10 plus the LLM-pipeline extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from block_data_fetcher_spark import api
from block_data_fetcher_spark.session import tune


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune(spark)
    return api.queries()["q_join_fk_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return api.queries()


def oracle_sql() -> dict[str, str]:
    return api.oracle_sql()
