"""SparkSession factory tuned for this engine.

Scale posture: these configs are the local-mode analog of what we would
set on a 1000-executor cluster against ~100 TB:

- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast
  selection) — replaces hand-tuned shuffle partition counts.
- UTC session timezone — deterministic timestamp semantics across
  engines (the DuckDB oracle reads the same parquet files).
- Arrow enabled — any Pandas-UDF path (multimodal decode) is
  Arrow-batched, never row-at-a-time pickling.
- shuffle partitions sized to cores locally; on a real cluster AQE
  coalesces from a deliberately high initial number instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "block-data-fetcher-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local[N] runs driver+executors in ONE JVM: the heap must hold
        # shuffle/join working sets for every concurrent task. 12g OOMed
        # at the sf10 proof (60M-row SMJ after a 220-query session);
        # size to the box (128 GiB here), overridable for smaller hosts.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    return builder.getOrCreate()


def scoped(spark: SparkSession) -> SparkSession:
    """A session CLONE (shared SparkContext/cached data, fresh runtime
    conf) for queries that override optimizer confs (bloom-filter
    thresholds, autoBroadcastJoinThreshold). The returned DataFrame
    keeps a reference to the clone, so the override is live whenever
    that plan executes — and the caller's session conf is never
    touched, no matter how many queries are built before any runs
    (ADVICE r1: build-time conf sets leaked until the next tune())."""
    clone = spark.newSession()
    return tune(clone)


def tune(spark: SparkSession) -> SparkSession:
    """Apply engine session-level conf to an externally provided session
    (the driver passes its own SparkSession to ``entry``/``queries``).

    Only touches runtime-settable confs; static confs (master, memory)
    are left alone.
    """
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # Restore defaults that individual catalog queries override to
        # reproduce at-scale plan shapes on tiny fixtures
        # (q_bloom_join lowers the probe-side threshold and disables
        # auto-broadcast) — every catalog entry runs tune() first, so
        # overrides never leak across queries.
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    except Exception:
        pass  # conf may be immutable on some deployments; defaults are fine
    return spark
