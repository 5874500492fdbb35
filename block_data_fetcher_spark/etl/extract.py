"""Extract: raw block/transaction JSON → relational DataFrames
(reference ``src/etl/extract.rs`` re-expressed declaratively).

Input contract: a DataFrame ``(slot bigint, raw string)`` where ``raw``
is a `getBlock` JsonParsed response (the RPC source in
:mod:`..sources.rpc` produces exactly this; tests build it from the
reference's own fixture shapes).

Every step is a built-in expression: from_json → posexplode →
projections. Malformed rows don't kill the job: a failed parse yields
NULLs which are filtered — the declarative PERMISSIVE analog of the
reference's log-and-skip (``extract.rs:63-67``, ST5).

Scale: the flatten is a generator inside the scan stage (no shuffle);
blocks/transactions/instructions derive from one pass over the raw
data; classification is a map-literal lookup (zero shuffle). At 100 TB
the only exchanges are the ones the sinks need (partitioning by
date/slot-bucket at write).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .parsers import first_transfer_details
from .schema import BLOCK_JSON_SCHEMA, TX_JSON_SCHEMA
from .transform import classify_transaction, label_transaction


def normalize_account_keys(keys: Column) -> Column:
    """accountKeys elements are `{"pubkey": ...}` objects or bare
    strings; normalize to plain pubkeys (reference transform.rs:232-248).
    Object elements arrive as raw JSON strings from the array<string>
    parse, so `get_json_object($.pubkey)` + coalesce does the union."""
    return F.transform(
        keys, lambda k: F.coalesce(F.get_json_object(k, "$.pubkey"), k)
    )


def extract_program_ids(instructions: Column, account_keys: Column) -> Column:
    """Per-instruction program id with first-seen-order dedup
    (reference extract.rs:116-163): coalesce(programId, program,
    accountKeys[programIdIndex]); array_distinct preserves first
    occurrence (the reference's O(n²) contains-loop, hash-based)."""
    per_instr = F.transform(
        instructions,
        lambda i: F.coalesce(
            i["programId"],
            i["program"],
            F.try_element_at(account_keys, i["programIdIndex"] + 1),
        ),
    )
    return F.array_distinct(F.filter(per_instr, lambda p: p.isNotNull()))


def parse_blocks(raw_blocks: DataFrame) -> DataFrame:
    """(slot, raw) → blocks table (reference models.rs:12-18 /
    migrations/...create_blocks.sql)."""
    b = F.from_json("raw", BLOCK_JSON_SCHEMA)
    return raw_blocks.select(
        F.col("slot").cast("long").alias("slot"),
        b["blockhash"].alias("blockhash"),
        b["parentSlot"].alias("parent_slot"),
        F.timestamp_seconds(b["blockTime"]).alias("block_time"),
        b["blockHeight"].alias("block_height"),
        F.size(b["transactions"]).cast("int").alias("transaction_count"),
    ).where(F.col("blockhash").isNotNull())


def flatten_transactions(raw_blocks: DataFrame) -> DataFrame:
    """(slot, raw) → one row per transaction with its in-block index
    (reference P1, extract.rs:55-71): posexplode keeps
    transaction_index; unparseable txs are skipped (ST5)."""
    b = F.from_json("raw", BLOCK_JSON_SCHEMA)
    return raw_blocks.select(
        F.col("slot").cast("long").alias("block_slot"),
        F.posexplode(b["transactions"]).alias("transaction_index", "tx_raw"),
    )


def extract_transactions(raw_blocks: DataFrame) -> DataFrame:
    """The full tx-level extraction (reference extract.rs:74-163 +
    enrichment transform.rs:252-335): fields, classification, label,
    first transfer details."""
    flat = flatten_transactions(raw_blocks)
    tx = F.from_json("tx_raw", TX_JSON_SCHEMA)
    with_tx = flat.select("block_slot", "transaction_index", tx.alias("tx"))

    keys = normalize_account_keys(F.col("tx.message.accountKeys"))
    instrs = F.col("tx.message.instructions")
    pids = extract_program_ids(instrs, keys)
    details = first_transfer_details(instrs)

    out = with_tx.select(
        F.try_element_at(F.col("tx.signatures"), F.lit(1)).alias("signature"),
        "block_slot",
        "transaction_index",
        # success = meta.err IS NULL (extract.rs:79)
        F.col("tx.meta.err").isNull().alias("success"),
        F.coalesce(F.col("tx.meta.fee"), F.lit(0)).alias("fee"),
        pids.alias("program_ids"),
        classify_transaction(pids).alias("transaction_type"),
        label_transaction(pids).alias("transaction_label"),
        F.try_element_at(keys, F.lit(1)).alias("signer"),
        F.size(F.col("tx.message.accountKeys")).cast("int").alias("num_accounts"),
        F.size(instrs).cast("int").alias("num_instructions"),
        details["amount"].alias("amount"),
        details["token"].alias("token"),
        details["from_address"].alias("from_address"),
        details["to_address"].alias("to_address"),
    )
    # log-and-skip analog: a tx with no signature is unparseable
    return out.where(F.col("signature").isNotNull())


def extract_instructions(raw_blocks: DataFrame) -> DataFrame:
    """tx → one row per instruction (reference models.rs:36-43;
    instructions explode to their own table, SURVEY §1.1)."""
    flat = flatten_transactions(raw_blocks)
    tx = F.from_json("tx_raw", TX_JSON_SCHEMA)
    with_tx = flat.select("block_slot", "transaction_index", tx.alias("tx"))
    keys = normalize_account_keys(F.col("tx.message.accountKeys"))
    exploded = with_tx.select(
        F.try_element_at(F.col("tx.signatures"), F.lit(1)).alias("transaction_signature"),
        keys.alias("account_keys"),
        F.posexplode(F.col("tx.message.instructions")).alias("instruction_index", "instr"),
    )
    pid = F.coalesce(
        F.col("instr.programId"),
        F.col("instr.program"),
        F.try_element_at(F.col("account_keys"), F.col("instr.programIdIndex") + 1),
    )
    from .transform import name_map

    return exploded.select(
        "transaction_signature",
        "instruction_index",
        pid.alias("program_id"),
        F.element_at(name_map(), pid).alias("program_name"),
        F.col("instr.parsed.type").alias("instruction_type"),
        F.col("instr.accounts").alias("accounts"),
    ).where(F.col("transaction_signature").isNotNull())


def account_activity(raw_blocks: DataFrame) -> DataFrame:
    """Per-address activity rollup — the reference's 5th table,
    ``accounts`` (``migrations/20251023000004_create_accounts.sql:4-25``),
    which its Rust code DECLARES but never populates (SURVEY §1.1: no
    ``INSERT INTO accounts`` exists). The engine populates it:
    explode every transaction's account keys and aggregate
    first/last-seen slot, total appearances, and as-signer count
    (signer = first account key, ``load.rs:221-236``).

    ``as_writable`` from the reference's DDL is NOT derivable from the
    JsonParsed shape the pipeline stores (writability needs the message
    header), so it is intentionally absent rather than faked.

    Scale: explode is a generator in the scan stage; the rollup is one
    hash aggregate on address with map-side partials — state is
    O(|addresses|), the same bound as the reference's table."""
    flat = flatten_transactions(raw_blocks)
    tx = F.from_json("tx_raw", TX_JSON_SCHEMA)
    keys = normalize_account_keys(tx["message"]["accountKeys"])
    exploded = flat.select(
        "block_slot",
        F.posexplode(keys).alias("key_index", "address"),
    ).where(F.col("address").isNotNull())
    return exploded.groupBy("address").agg(
        F.min("block_slot").alias("first_seen_slot"),
        F.max("block_slot").alias("last_seen_slot"),
        F.count("*").alias("transaction_count"),
        F.count_if(F.col("key_index") == 0).alias("as_signer_count"),
    )


def observed_transactions(raw_blocks: DataFrame):
    """Attach in-flight pipeline metrics to the tx extraction — the
    reference's progress/stats counters (A5, ``extract.rs:224-239`` /
    ``pipeline.rs:30-54``) restated as ``df.observe()``: metrics ride
    the job that already runs (no second pass over the data), collected
    on the driver after any action.

    Returns ``(transactions_df, Observation)``; after an action on the
    DataFrame, ``observation.get`` yields the counters."""
    from pyspark.sql import Observation

    obs = Observation("extraction_stats")
    txs = extract_transactions(raw_blocks).observe(
        obs,
        F.count(F.lit(1)).alias("total_transactions"),
        F.count_if(F.col("success")).alias("successful_transactions"),
        F.sum("fee").alias("total_fees"),
    )
    return txs, obs


def extraction_stats(transactions: DataFrame) -> DataFrame:
    """Reference A1 ExtractionStats (extract.rs:38-52) + A3 rates
    (pipeline.rs:30-54) as one agg."""
    return transactions.agg(
        F.count("*").alias("total_transactions"),
        F.count_if(F.col("success")).alias("successful_transactions"),
        F.count_if(~F.col("success")).alias("failed_transactions"),
        F.sum("fee").alias("total_fees"),
        F.round(
            F.when(F.count("*") == 0, 0.0).otherwise(
                F.count_if(F.col("success")) * 100.0 / F.count("*")
            ),
            2,
        ).alias("success_rate"),
    )
