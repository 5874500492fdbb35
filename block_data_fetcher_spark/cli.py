"""CLI surface mirroring the reference's clap interface
(``src/cli.rs:12-83``): same flags, same validation rules (P13), same
end-slot derivation (P14) — so a user of the reference's binary can
switch invocation-for-invocation.

The run itself is the Spark pipeline: RPC source (offline by default;
pass --rpc-url for a live endpoint) → extract → classify → keyed
upsert to parquet. ``--continuous`` runs the Structured Streaming job
the reference's loop only stubbed (``src/main.rs:144-147``).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass


@dataclass
class Args:
    start_slot: int | None
    end_slot: int | None
    num_blocks: int | None
    rpc_url: str | None
    output: str
    batch_size: int
    max_retries: int
    retry_delay: int
    continuous: bool
    interval: int

    def validate(self) -> None:
        """Reference ``Cli::validate`` (cli.rs:56-72)."""
        if self.start_slot is not None and self.end_slot is not None:
            if self.start_slot > self.end_slot:
                raise ValueError(
                    f"Start slot ({self.start_slot}) must be less than or "
                    f"equal to end slot ({self.end_slot})"
                )
        if self.batch_size <= 0:
            raise ValueError("Batch size must be greater than 0")
        if self.max_retries <= 0:
            raise ValueError("Max retries must be greater than 0")

    def calculate_end_slot(self, start_slot: int) -> int:
        """Reference ``Cli::calculate_end_slot`` (cli.rs:75-83)."""
        if self.num_blocks is not None:
            return start_slot + self.num_blocks - 1
        if self.end_slot is not None:
            return self.end_slot
        return start_slot + 9  # default: 10 blocks


def parse_args(argv: list[str] | None = None) -> Args:
    p = argparse.ArgumentParser(
        prog="block-data-fetcher-spark",
        description="Extract, transform, and load Solana block data with Spark",
    )
    p.add_argument("-s", "--start-slot", type=int, default=None, metavar="SLOT")
    group = p.add_mutually_exclusive_group()
    group.add_argument("-e", "--end-slot", type=int, default=None, metavar="SLOT")
    group.add_argument("-n", "--num-blocks", type=int, default=None, metavar="COUNT")
    p.add_argument("-r", "--rpc-url", default=None, metavar="URL")
    p.add_argument("-o", "--output", default="./bdf_output", metavar="DIR")
    p.add_argument("-b", "--batch-size", type=int, default=10, metavar="SIZE")
    p.add_argument("--max-retries", type=int, default=3, metavar="COUNT")
    p.add_argument("--retry-delay", type=int, default=2, metavar="SECONDS")
    p.add_argument("-c", "--continuous", action="store_true")
    p.add_argument("--interval", type=int, default=10, metavar="SECONDS")
    ns = p.parse_args(argv)
    args = Args(
        start_slot=ns.start_slot,
        end_slot=ns.end_slot,
        num_blocks=ns.num_blocks,
        rpc_url=ns.rpc_url,
        output=ns.output,
        batch_size=ns.batch_size,
        max_retries=ns.max_retries,
        retry_delay=ns.retry_delay,
        continuous=ns.continuous,
        interval=ns.interval,
    )
    args.validate()
    return args


def format_number(n: int) -> str:
    """Thousands-separated integer display (P9) — behavioral parity
    with the reference's ``format_number`` (src/main.rs:156-168,
    tested at src/main.rs:180-185). Engine-side, the same formatting
    is one expression: ``F.format_number(col, 0)``."""
    return f"{int(n):,}"


def run(args: Args) -> dict:
    """Execute the pipeline (reference ``Pipeline::run``,
    ``src/pipeline.rs:121-167``): source → extract → upsert, then the
    A1/A3 stats report. Returns the stats dict."""
    from pyspark.sql import functions as F

    from .etl.extract import extract_transactions, extraction_stats, parse_blocks
    from .etl.load import stream_upsert, upsert_parquet
    from .session import get_spark
    from .sources.rpc import SolanaRpcDataSource

    spark = get_spark("block-data-fetcher-spark")
    spark.dataSource.register(SolanaRpcDataSource)
    mode = "rpc" if args.rpc_url else "offline"

    if args.continuous:
        # the intent of the reference's stubbed loop, done properly
        stream = (
            spark.readStream.format("solana_rpc")
            .option("start_slot", args.start_slot or 0)
            .option("mode", mode)
            .option("url", args.rpc_url or "")
            .option("max_slots_per_trigger", args.batch_size)
            .load()
        )
        txs = extract_transactions(stream).withColumn(
            "processed_at", F.current_timestamp()
        )
        q = stream_upsert(
            txs,
            f"{args.output}/transactions",
            ["signature"],
            ["processed_at"],
            trigger_available_now=False,
        )
        q.awaitTermination()
        return {}

    start = args.start_slot if args.start_slot is not None else 0
    end = args.calculate_end_slot(start)
    raw = (
        spark.read.format("solana_rpc")
        .option("start_slot", start)
        .option("end_slot", end)
        .option("batch_size", args.batch_size)
        .option("mode", mode)
        .option("url", args.rpc_url or "")
        .load()
    )
    blocks = parse_blocks(raw).withColumn("processed_at", F.current_timestamp())
    txs = extract_transactions(raw).withColumn(
        "processed_at", F.current_timestamp()
    )
    n_blocks = upsert_parquet(
        spark, blocks, f"{args.output}/blocks", ["slot"], ["processed_at"]
    )
    n_txs = upsert_parquet(
        spark,
        txs,
        f"{args.output}/transactions",
        ["signature"],
        ["processed_at"],
    )
    stats = extraction_stats(spark.read.parquet(f"{args.output}/transactions")).head()
    report = {
        "blocks_loaded": n_blocks,
        "transactions_loaded": n_txs,
        **{k: stats[k] for k in stats.asDict()},
    }
    for k, v in report.items():
        shown = (
            format_number(v)
            if isinstance(v, int) and not isinstance(v, bool)
            else v
        )
        print(f"{k}: {shown}")
    return report


def main(argv: list[str] | None = None) -> int:
    run(parse_args(argv))
    return 0
