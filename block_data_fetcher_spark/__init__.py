"""block_data_fetcher_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
pipeline ``0xfave/Block-Data-Fetcher`` (a Rust Solana block→Postgres
loader, surveyed in SURVEY.md) as an idiomatic Apache Spark engine:

- the reference's extract/transform/classify/load path becomes
  DataFrame transformations + Structured Streaming (``etl/``,
  ``streaming/``),
- its PostgreSQL query layer becomes Spark SQL over Parquet
  (``operators/``),
- LLM-training-data operators (dedup, similarity search, multimodal
  columns, text analysis) are first-class extensions (``functions/``).

Everything on the correctness path is built-in Catalyst expressions —
no row-at-a-time Python UDFs in any hot path.
"""

__version__ = "0.1.0"
