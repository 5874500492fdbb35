"""Relational core: scans, filters, joins, aggregations, sort/limit, set ops.

Re-expresses SURVEY §2.2/§2.3/§2.4/§2.6 Spark-first. Each public
``q_*`` function is a correctness query from SURVEY §2.10: it takes
``(spark, sf_dir)``, builds a declarative DataFrame plan (Catalyst owns
predicate pushdown / column pruning / join strategy), and returns the
result DataFrame. ``ORACLE[name]`` is the equivalent DuckDB ANSI SQL.

Scale notes are inline per operator; the common rules:

- dims (region/nation/program-registry analog) are ``broadcast()``
  joined — no shuffle of the fact side (reference J1,
  ``src/etl/transform.rs:34-61``, resolved a HashMap per row; the
  broadcast hash join is the distributed restatement).
- fact⋈fact joins (lineitem⋈orders) shuffle on the join key once and
  aggregate partially map-side; at 100 TB these become sort-merge
  joins over co-bucketed tables.
- every ``limit`` sits above a total order with a unique tie-break so
  results are deterministic (SURVEY §2.10 rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table

# ---------------------------------------------------------------------------
# Scans / projections (S1/S4, P8, P10)
# ---------------------------------------------------------------------------


def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan+project+filter (reference S1/S4: fetch a slot range, keep a
    few fields — ``src/rpc/mod.rs:64-83``, ``src/etl/extract.rs:223-287``).

    Scale: filter + 4-column projection reach the parquet scan
    (PushedFilters / ReadSchema) — at 100 TB this reads only the
    row-groups whose min/max overlap 1996 and only 5 columns.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-then-project (reference P10 system-transfer parse shape:
    keep rows of one type, project a few fields —
    ``src/etl/parsers/system.rs:14-52``)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )


def q_arith_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic projection + group agg (reference P8 lamports→SOL,
    ``src/etl/extract.rs:300``). revenue = extendedprice*(1-discount).

    Scale: partial (map-side) aggregation before the exchange; only
    |distinct returnflag| rows shuffle."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def q_ts_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unix→timestamp→day bucketing (reference P7,
    ``src/etl/load.rs:169``): daily event counts."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Joins (J1/J2/J3)
# ---------------------------------------------------------------------------


def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension (registry-analog) join, reference J1
    (``src/etl/transform.rs:34-61``): customer ⋈ nation ⋈ region.

    Scale: both dims are broadcast — zero shuffle of the customer fact
    table; the plan is scan → two BroadcastHashJoins → partial agg →
    single exchange of ≤|regions| rows."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("num_customers"))
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence check as LEFT SEMI join (reference J2 parent-exists,
    ``src/etl/load.rs:172-182``): customers that have orders.

    Scale: semi join never materializes the right side's payload
    columns — only the key shuffles."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count("*").cast("long").alias("customers_with_orders"))
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-if-absent as LEFT ANTI join (reference S9 ``ON CONFLICT DO
    NOTHING``, ``migrations/20251023000006_add_kamino_drift.sql:3-6``)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def q_left_join_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN with NULL-side handling (reference J2: absent parent →
    NULL FK, ``src/etl/load.rs:172-182``)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .select(
            "o_orderkey",
            F.when(F.isnull("c_name"), F.lit("unknown")).otherwise(F.col("c_name")).alias("cust_name"),
        )
    )


def q_join_fk_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship fact⋈fact FK join + aggregate (reference J3:
    blocks⟕transactions on block_slot,
    ``migrations/...create_transactions.sql:10``): revenue per order
    priority.

    Scale: this is the one genuinely large join in the catalog — both
    sides shuffle on orderkey (sort-merge at 100 TB; AQE may pick
    shuffled-hash); revenue aggregates partially before the second
    exchange. With production tables we would bucket both tables by
    orderkey to eliminate the shuffle entirely."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def q_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self join on adjacent keys (reference J3: blocks self-join on
    parent_slot, ``migrations/...create_blocks.sql:18``): consecutive
    events by the same user."""
    ev = table(spark, sf_dir, "events")
    e1 = ev.alias("e1")
    e2 = ev.alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e2.event_id") == F.col("e1.event_id") + 1)
            & (F.col("e1.user_id") == F.col("e2.user_id")),
        )
        .select(
            F.col("e1.event_id").alias("event_id"),
            F.col("e1.user_id").alias("user_id"),
            F.col("e1.event_type").alias("et_first"),
            F.col("e2.event_type").alias("et_next"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregations (A1-A4)
# ---------------------------------------------------------------------------


def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global scalar aggregates (reference A1 extraction stats,
    ``src/etl/extract.rs:38-52``: counts, conditional counts, sums,
    and S2 max-offset discovery ``src/rpc/mod.rs:86-90``)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("cnt"),
        F.count_if(F.col("l_returnflag") == "R").alias("cnt_r"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.max("l_orderkey").alias("max_orderkey"),
    )


def q_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distribution (reference A2,
    ``src/etl/extract.rs:263-272``)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count("*").alias("cnt"))


def q_pivot_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Report-shaped conditional aggregation (reference A2 printed
    distribution, ``src/etl/extract.rs:303-309``): one count column per
    event type, per user.

    Scale: conditional aggregation (not ``pivot()``) — single pass,
    map-side partials, no second job to discover pivot values."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "click").alias("n_click"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchase"),
        F.count_if(F.col("event_type") == "error").alias("n_error"),
        F.count_if(F.col("event_type") == "signup").alias("n_signup"),
        F.count_if(F.col("event_type") == "view").alias("n_view"),
    )


def q_rate_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived rates with div-by-zero guard (reference A3 success_rate,
    ``src/pipeline.rs:30-54``)."""
    ev = table(spark, sf_dir, "events")
    # +1e-9 before round: p/q ratios can land exactly on a .00005
    # half-boundary where Spark's and DuckDB's round() disagree.
    return ev.groupBy("user_id").agg(
        F.round(
            F.count_if(F.col("event_type") == "error") * 100.0 / F.count("*") + 1e-9, 4
        ).alias("error_rate")
    )


def q_group_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-activity rollup (reference A4,
    ``migrations/20251023000004_create_accounts.sql:4-25``: per-address
    first/last seen, counts, conditional counts)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count("*").alias("cnt"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchase"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops (O1-O3)
# ---------------------------------------------------------------------------


def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with unique tie-break (reference O2 error top-5,
    ``src/pipeline.rs:303-308``; O1 sorted dim scan ``src/db/mod.rs:49``).

    Scale: Spark compiles orderBy+limit to TakeOrderedAndProject —
    per-partition top-k then a k-row merge on the driver; no global
    sort."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id").asc())
        .select("event_id", "value")
        .limit(5)
    )


def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union + key dedup (reference O3: continuous-mode batches
    appended through UPSERT, ``src/main.rs:123-148``). Two overlapping
    slices; count union-all vs union-distinct."""
    ev = table(spark, sf_dir, "events")
    a = ev.where(F.col("value") > 100.0).select("event_id", "user_id", "event_type", "value")
    b = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "event_type", "value"
    )
    cnt_all = a.unionByName(b).agg(F.count("*").alias("cnt_all"))
    cnt_distinct = a.unionByName(b).distinct().agg(F.count("*").alias("cnt_distinct"))
    return cnt_all.crossJoin(cnt_distinct)


def q_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe grouped aggregation via salting
    (:func:`..storage.salted_sum_count`): sum/count of value per event
    type, computed as partial aggregation on (key, salt) then exact
    re-combination.

    events has 5 event types over millions of rows — the hot-key
    shape where a plain groupBy sends a whole dominant key to one
    reducer. Salting bounds any reducer's input at |keys| × n_salts
    partial rows. AQE's skew handling only splits JOIN partitions;
    this is the aggregation-side answer. Results are bit-identical to
    the unsalted plan for algebraic aggregates (sum/count re-combine
    exactly over doubles' addition being reordered ONLY at the
    rounded output precision — hence round after the final stage,
    both sides)."""
    from ..storage import salted_sum_count

    ev = table(spark, sf_dir, "events")
    agg = salted_sum_count(
        ev, ["event_type"], "value", n_salts=8, entropy_col="event_id"
    )
    return agg.select(
        "event_type",
        F.round(F.col("sum_value"), 2).alias("sum_value"),
        "cnt",
    )


def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit (the deequ-style expectation report every
    landing pipeline runs before publishing a batch): null fraction,
    range-violation counts, duplicate-key count, and referential
    orphans, emitted as (metric, value) rows.

    One aggregation pass per table computes all same-table metrics
    (conditional count_if's fused into a single scan); the
    referential check is a LEFT ANTI join counting lineitem rows
    whose order vanished — the FK the reference enforces in Postgres
    (migrations create_transactions.sql:10), checked here at scan
    speed instead of insert time."""
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    li_metrics = li.agg(
        F.round(
            F.count_if(F.col("l_quantity") <= 0) / F.count("*") + 1e-9, 4
        ).alias("li_qty_nonpositive_frac"),
        F.count_if(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
        ).cast("double").alias("li_discount_out_of_range"),
        F.round(
            F.count_if(F.col("l_shipdate").isNull()) / F.count("*") + 1e-9, 4
        ).alias("li_shipdate_null_frac"),
    )
    od_metrics = od.agg(
        (F.count("*") - F.countDistinct("o_orderkey"))
        .cast("double")
        .alias("orders_duplicate_keys"),
        F.count_if(F.col("o_totalprice") <= 0)
        .cast("double")
        .alias("orders_nonpositive_total"),
    )
    orphans = (
        li.select("l_orderkey")
        .join(od.select("o_orderkey"), li.l_orderkey == od.o_orderkey, "left_anti")
        .agg(F.count("*").cast("double").alias("li_orphan_rows"))
    )
    wide = li_metrics.join(od_metrics).join(orphans)
    return wide.unpivot(
        ids=[],
        values=[
            "li_qty_nonpositive_frac",
            "li_discount_out_of_range",
            "li_shipdate_null_frac",
            "orders_duplicate_keys",
            "orders_nonpositive_total",
            "li_orphan_rows",
        ],
        variableColumnName="metric",
        valueColumnName="value",
    )


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact⋈dim equi join via salting
    (:func:`..storage.salted_join`): events joined to customer on
    user_id with the dim replicated 8 ways and the fact salted
    deterministically, then revenue per market segment.

    This is the join-side twin of q_skew_agg for the case AQE cannot
    fix: ONE key bigger than a reducer (AQE only splits partitions,
    never a single key). Broadcast is disabled in-query so the salted
    shuffle plan actually materializes at fixture scale (a dim this
    small would broadcast in production — the technique targets dims
    past broadcast range). The override lives on a session clone
    (:func:`..session.scoped`) that only this query's plan executes
    against, so it cannot leak into the caller's session. Results
    are identical to the plain join — salting only re-routes rows."""
    from ..session import scoped
    from ..storage import salted_join

    spark = scoped(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    cu = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        salted_join(ev, cu, "user_id", "c_custkey", 8, "event_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values: bucket = clamp(floor(
    value / 100), 0, 9) — the numeric-binning report every monitoring
    query layer offers. Map-side bucket id + one shuffle on ≤10 keys."""
    ev = table(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / 100), F.lit(0)), F.lit(9)
    ).cast("long")
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-Bloom-filtered fact⋈fact join: a selective order slice
    (one priority, one quarter) joined to lineitem, revenue per line
    status.

    Spark-first scale play: with
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` Catalyst
    builds a Bloom filter from the filtered (small) side's join keys
    at runtime and pushes it into the lineitem scan — rows that can't
    join are dropped BEFORE the shuffle. At 100 TB this is the
    difference between shuffling the full fact table and shuffling
    ~2% of it. The thresholds below exist only to make the same plan
    shape reproducible at fixture scale (the production defaults —
    10 GB probe-side scans — are already right on a real cluster);
    they are set on a session clone (:func:`..session.scoped`) bound
    to this query's plan, so they never leak into other catalog
    queries or the caller's session. Plan gate: tests/test_plans.py
    asserts the bloom_filter_agg build and the might_contain probe."""
    from ..session import scoped

    spark = scoped(spark)
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    od = table(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

ORACLE: dict[str, str] = {
    "q_expectations": """
        WITH li AS (
          SELECT round(count(*) FILTER (l_quantity <= 0) * 1.0
                       / count(*) + 1e-9, 4) AS li_qty_nonpositive_frac,
                 CAST(count(*) FILTER (l_discount < 0 OR l_discount > 1)
                      AS DOUBLE) AS li_discount_out_of_range,
                 round(count(*) FILTER (l_shipdate IS NULL) * 1.0
                       / count(*) + 1e-9, 4) AS li_shipdate_null_frac
          FROM lineitem
        ), od AS (
          SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS DOUBLE)
                   AS orders_duplicate_keys,
                 CAST(count(*) FILTER (o_totalprice <= 0) AS DOUBLE)
                   AS orders_nonpositive_total
          FROM orders
        ), orph AS (
          SELECT CAST(count(*) AS DOUBLE) AS li_orphan_rows
          FROM lineitem WHERE l_orderkey NOT IN
            (SELECT o_orderkey FROM orders)
        )
        SELECT 'li_qty_nonpositive_frac' AS metric,
               li_qty_nonpositive_frac AS value FROM li
        UNION ALL SELECT 'li_discount_out_of_range',
               li_discount_out_of_range FROM li
        UNION ALL SELECT 'li_shipdate_null_frac',
               li_shipdate_null_frac FROM li
        UNION ALL SELECT 'orders_duplicate_keys',
               orders_duplicate_keys FROM od
        UNION ALL SELECT 'orders_nonpositive_total',
               orders_nonpositive_total FROM od
        UNION ALL SELECT 'li_orphan_rows', li_orphan_rows FROM orph
    """,
    "q_salted_join": """
        SELECT c_mktsegment, count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
    """,
    "q_skew_agg": """
        SELECT event_type, round(sum(value), 2) AS sum_value,
               count(*) AS cnt
        FROM events GROUP BY event_type
    """,
    "q_histogram": """
        SELECT CAST(least(greatest(floor(value / 100), 0), 9) AS BIGINT)
                 AS bucket,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1
    """,
    "q_bloom_join": """
        SELECT l_linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_linestatus
    """,
    "q_scan_project": """
        SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
    """,
    "q_filter_project": """
        SELECT event_id, user_id, value
        FROM events WHERE event_type = 'purchase'
    """,
    "q_arith_expr": """
        SELECT l_returnflag,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_ts_convert": """
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1
    """,
    "q_broadcast_join": """
        SELECT r_name, count(*) AS num_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "q_semi_join": """
        SELECT count(*) AS customers_with_orders
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "q_anti_join": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "q_left_join_null": """
        SELECT o_orderkey,
               CASE WHEN c_name IS NULL THEN 'unknown' ELSE c_name END AS cust_name
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
    "q_join_fk_agg": """
        SELECT o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    "q_self_join": """
        SELECT e1.event_id AS event_id, e1.user_id AS user_id,
               e1.event_type AS et_first, e2.event_type AS et_next
        FROM events e1
        JOIN events e2
          ON e2.event_id = e1.event_id + 1 AND e1.user_id = e2.user_id
    """,
    "q_agg_global": """
        SELECT count(*) AS cnt,
               count(*) FILTER (WHERE l_returnflag = 'R') AS cnt_r,
               round(sum(l_quantity), 2) AS sum_qty,
               max(l_orderkey) AS max_orderkey
        FROM lineitem
    """,
    "q_group_count": """
        SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
    """,
    "q_pivot_types": """
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click')    AS n_click,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               count(*) FILTER (WHERE event_type = 'error')    AS n_error,
               count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
               count(*) FILTER (WHERE event_type = 'view')     AS n_view
        FROM events GROUP BY user_id
    """,
    "q_rate_derived": """
        SELECT user_id,
               round(count(*) FILTER (WHERE event_type = 'error') * 100.0
                     / count(*) + 1e-9, 4) AS error_rate
        FROM events GROUP BY user_id
    """,
    "q_group_minmax": """
        SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
               count(*) AS cnt,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               round(sum(value), 2) AS total_value
        FROM events GROUP BY user_id
    """,
    "q_orderby_limit": """
        SELECT event_id, value FROM events
        ORDER BY value DESC, event_id ASC LIMIT 5
    """,
    "q_union": """
        WITH a AS (SELECT event_id, user_id, event_type, value FROM events WHERE value > 100.0),
             b AS (SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'purchase')
        SELECT
          (SELECT count(*) FROM (SELECT * FROM a UNION ALL SELECT * FROM b)) AS cnt_all,
          (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS cnt_distinct
    """,
}
