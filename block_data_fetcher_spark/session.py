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


def _host_mem_bytes() -> int | None:
    """Smallest of physical RAM and any cgroup (v2 then v1) limit —
    what the JVM can actually claim inside a container."""
    limits: list[int] = []
    try:
        limits.append(os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES"))
    except (ValueError, OSError, AttributeError):
        pass
    for p in (
        "/sys/fs/cgroup/memory.max",
        "/sys/fs/cgroup/memory/memory.limit_in_bytes",
    ):
        try:
            with open(p) as f:
                v = f.read().strip()
            if v.isdigit():
                limits.append(int(v))
        except OSError:
            pass
    return min(limits) if limits else None


def default_driver_mem(host_bytes: int | None = None) -> str:
    """Driver-heap default sized to the HOST, not to one 128 GiB box
    (ADVICE r5: a flat 32g on a container with a smaller cgroup limit
    gets OOM-killed mid-query instead of failing fast): 60% of the
    detected host/cgroup memory, clamped to [2g, 32g]; 32g whenever
    detection fails or the box is big. SPARK_DRIVER_MEM always wins."""
    env = os.environ.get("SPARK_DRIVER_MEM")
    if env:
        return env
    if host_bytes is None:
        host_bytes = _host_mem_bytes()
    if host_bytes is None:
        return "32g"
    return f"{max(2, min(32, int(host_bytes * 0.6) >> 30))}g"


def _initial_shuffle_partitions(cores: int) -> int:
    """AQE initial shuffle-partition count sized to the active fixture
    (~1 per 32 MB of parquet under $SPARK_GRAFT_SF_DIR, clamped to
    [cores, 1024]): tiny fixtures keep core-count parallelism with
    zero extra shuffle-file overhead; sf100's ~15 GB yields ~480, so
    60 GB exchanges land ~128 MB partitions instead of spilling."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    total = 0
    try:
        for root, _dirs, files in os.walk(sf_dir):
            for f in files:
                if f.endswith(".parquet"):
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
    except OSError:
        pass
    return max(cores, min(1024, total // (32 << 20)))


def _fast_local_dir() -> str | None:
    """spark.local.dir placement for shuffle/blockmgr files (r15,
    guide §6): shuffle files are ephemeral and latency-critical, so
    they belong on the fastest local storage that can hold them — the
    cluster analog of pointing spark.local.dir at local NVMe instead
    of the OS volume. This sandbox's root disk sustains only
    ~15-40 MB/s buffered writes (measured r15), and writeback debt
    from one spilling query stalls unrelated queries; /dev/shm moves
    >1 GB/s. Gate (same policy as scratch.scratch_base): only when the
    active fixture is small enough that the whole shuffle footprint
    fits tmpfs with a wide margin — the sf100 decade pass (shuffle
    plateau measured in the tens of GB) stays on disk. A caller-set
    SPARK_LOCAL_DIRS always wins (Spark gives the env precedence over
    the conf anyway — returning None just keeps the conf unset)."""
    if os.environ.get("SPARK_LOCAL_DIRS"):
        return None
    from . import scratch

    try:
        if os.path.isdir("/dev/shm"):
            import shutil

            fixture = scratch._fixture_bytes()
            free = shutil.disk_usage("/dev/shm").free
            if (
                0 < fixture <= scratch._FAST_SCRATCH_MAX_FIXTURE
                and free >= 64 * fixture
            ):
                return "/dev/shm/bdf-local"
    except OSError:
        pass
    return None


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
        # Decouple max shuffle parallelism from the static partition
        # count: shuffles START at a count sized to the data under
        # $SPARK_GRAFT_SF_DIR and AQE coalesces down to the 64 MB
        # advisory size. The static 32 gave ~2 GB sort-merge
        # partitions at sf100's 60 GB lineitem exchanges — every join
        # spilled (q_tpch_q21 ran 26× its sf10 wall for 10× rows);
        # fresh-session A/B at sf100: q_tpch_q3 43.6 → 26.6 s with
        # ~500 initial partitions. But a blanket high count taxes
        # small fixtures ~2× per multi-exchange query (512-way
        # shuffle-file creation is pure overhead when the exchange is
        # kilobytes — measured on the sf0.1 graph family), so the
        # initial count tracks fixture bytes: ~1 partition per 32 MB,
        # clamped to [cores, 1024]. A real cluster sizes this from
        # table statistics the same way.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(_initial_shuffle_partitions(int(cpus))),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local[N] runs driver+executors in ONE JVM: the heap must hold
        # shuffle/join working sets for every concurrent task. 12g OOMed
        # at the sf10 proof (60M-row SMJ after a 220-query session);
        # sized to the detected host/cgroup memory, capped at 32g,
        # SPARK_DRIVER_MEM overrides (see default_driver_mem).
        .config("spark.driver.memory", default_driver_mem())
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Reliable checkpoints (iter_checkpoint's distributed path) are
        # per-RDD directories that otherwise accumulate for the app's
        # lifetime; with reference tracking they're GC'd when the
        # checkpointed frame goes out of scope — a long bench session
        # runs hundreds of iterative label frames through one dir
        # (ADVICE r9).
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        # The ContextCleaner only reclaims shuffle files after a JVM GC
        # collects their ShuffleDependency; a long catalog session
        # between heavy spillers can hold tens of GB of dead shuffle
        # files for the default 30 min periodic-GC interval (measured
        # in the r12 sf100 single pass: ~22 GB of stale files from
        # queries 10+ positions back). 5 min keeps the plateau bounded
        # without measurable CPU cost.
        .config("spark.cleaner.periodicGC.interval", "5min")
    )
    fast_local = _fast_local_dir()
    if fast_local:
        builder = builder.config("spark.local.dir", fast_local)
    # SPARK_GRAFT_EXTRA_JARS (os.pathsep-separated paths) feeds
    # spark.jars so the classpath gates in sources/formats.py and
    # lakehouse.py attest jars the session will actually load — not
    # merely that the operator set them. Only effective for the
    # process's FIRST session (getOrCreate ignores configs on an
    # existing one), same as every other builder conf above.
    extra_jars = [
        p
        for p in os.environ.get("SPARK_GRAFT_EXTRA_JARS", "").split(
            os.pathsep
        )
        if p
    ]
    # spark.jars is itself comma-separated, so a jar path containing a
    # comma cannot be expressed — reject loudly instead of silently
    # splitting it into two bogus classpath entries (ADVICE r12).
    bad = [p for p in extra_jars if "," in p]
    if bad:
        raise ValueError(
            f"SPARK_GRAFT_EXTRA_JARS paths may not contain ',' "
            f"(spark.jars is comma-delimited): {bad}"
        )
    if extra_jars:
        builder = builder.config("spark.jars", ",".join(extra_jars))
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
        # q_recursive_cte raises the cumulative-row recursion guard to
        # its fixture-sized bound; the conf must stay live until THAT
        # query's lazy plan executes (a try/finally inside the query
        # would restore it before the caller collects), so the reset
        # happens here — the next catalog entry built on the session
        # restores the 1M default before its own plan runs (ADVICE r9).
        spark.conf.unset("spark.sql.cteRecursionRowLimit")
    except Exception:
        pass  # conf may be immutable on some deployments; defaults are fine
    return spark
