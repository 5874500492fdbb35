"""The reference's own ETL pipeline as catalog queries (rows-only):
RPC source (hermetic offline mode) → flatten → parse → classify →
rollup. The reference IS this pipeline (``src/pipeline.rs:121-167``);
exposing it through ``queries()`` puts the end-to-end path under the
driver's smoke gate, not just unit tests.

Rows-only because the input is the deterministic offline block
generator (:mod:`..sources.rpc`), which DuckDB cannot reproduce; the
field-level correctness of every stage is pinned by tests/test_etl.py
against the reference's own fixture shapes (FIXTURES.md §B).

Scale: the slot range partitions across executors (the parallel fetch
the reference lists as future work); everything downstream is the
shuffle-free expression chain of :mod:`..etl.extract`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..etl.extract import account_activity, extract_transactions
from ..sources.rpc import SolanaRpcDataSource

_SLOTS = (1000, 1049)  # 50 blocks x 4 txs in offline mode


def _raw_blocks(spark: SparkSession) -> DataFrame:
    try:
        spark.dataSource.register(SolanaRpcDataSource)
    except Exception:
        pass  # already registered in this session
    return (
        spark.read.format("solana_rpc")
        .option("start_slot", _SLOTS[0])
        .option("end_slot", _SLOTS[1])
        .option("mode", "offline")
        .load()
    )


def q_etl_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full extraction: blocks → classified, labeled, parsed
    transactions (reference extract.rs + transform.rs end to end)."""
    return extract_transactions(_raw_blocks(spark))


def q_etl_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The accounts rollup over the same block range — the table the
    reference declares but never populates (SURVEY §2.4 A4)."""
    return account_activity(_raw_blocks(spark))
