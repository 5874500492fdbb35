"""TPC-H-shaped flagship analytics over the star fixtures.

The reference's query layer is PostgreSQL over a star-ish schema
(SURVEY §3 entry point 3 — its migrations' indexes encode time-range
scans, FK joins and per-type rollups). These classics exercise exactly
those access paths at benchmark shape: Q1 the wide scan + grouped
aggregate, Q3 the selective dim-filtered 3-way join + top-k, Q4 the
correlated EXISTS decorrelated to a semi join, Q5 the 6-table
snowflake join with two broadcast dims, Q6 the pure
scan-filter-aggregate, Q17 the correlated scalar subquery, Q18 the
HAVING-over-aggregate join-back. The second wave covers the rest of
the benchmark's shapes expressible over the fixture star (no
partsupp, no shipmode/phone columns — those shapes are adapted, see
each docstring; the partsupp-dependent Q2/Q11/Q20 derive the
part↔supplier relation from lineitem): Q8 conditional-ratio market
share, Q9 profit
rollup, Q10 returned-item top-k, Q12 priority split, Q13 outer-join
histogram, Q14 promo ratio, Q15 max-equality join-back, Q19
disjunctive residual predicate, Q21 double correlation, Q22
scalar-subquery + anti join.

Plan expectations at scale (asserted in tests/test_plans.py):
- Q1: filter pushed to the scan, map-side partial aggregation, ONE
  shuffle on the 4-group key;
- Q3: customer filter prunes before the join, top-10 compiles to
  TakeOrderedAndProject (never a global sort);
- Q5: region/nation broadcast; only fact⋈fact edges shuffle.

Dates are fixed literals inside the fixture ranges (shipdate
1995-01-02..2001-11-04, orderdate 1995-01-01..2001-08-01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape)."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity") + 1e-9, 4).alias("avg_qty"),
            F.round(F.avg("l_discount") + 1e-9, 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority top-10 (TPC-H Q3 shape): BUILDING-segment
    customers, orders before / lineitems after the cutoff."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cu = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    od = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): revenue per nation for
    orders whose customer and supplier share the nation, one region,
    one order-year. region/nation are broadcast dims (the
    program-registry analog, SURVEY J1).

    Scale note (same treatment as Q7's r11 rewrite): the region
    restriction reaches the plan only through the LAST dim join, so
    the fact⋈fact exchanges carried every region's rows. Deriving it
    first — region→nations→suppliers/customers — prunes both fact
    sides to the region's share BEFORE they exchange, and the in-ASIA
    supplier sliver broadcasts so lineitem's pruning costs no shuffle.
    The customer-nation == supplier-nation conjunct rides the final
    orderkey join unchanged (sf100: 82.5 s → 22.2 s)."""
    cu = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    su = table(spark, sf_dir, "supplier")
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    na2 = na.join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
    su2 = F.broadcast(
        su.join(
            F.broadcast(na2), su.s_nationkey == na2.n_nationkey
        ).select("s_suppkey", "s_nationkey", "n_name")
    )
    cu2 = cu.join(
        F.broadcast(na2.select(F.col("n_nationkey").alias("c_nk"))),
        cu.c_nationkey == F.col("c_nk"),
    ).select("c_custkey", "c_nationkey")
    li2 = li.join(su2, li.l_suppkey == su2.s_suppkey).select(
        "l_orderkey", "l_extendedprice", "l_discount",
        "s_nationkey", "n_name",
    )
    od2 = od.join(cu2, od.o_custkey == cu2.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    return (
        li2.join(
            od2,
            (li2.l_orderkey == od2.o_orderkey)
            & (li2.s_nationkey == od2.c_nationkey),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): orders in a quarter
    that have at least one returned lineitem, counted per priority.

    Spark-first: the correlated ``EXISTS`` decorrelates to a LEFT SEMI
    join — only the orderkey of the probe side shuffles, the lineitem
    payload columns never move (reference J2's parent-exists check,
    ``src/etl/load.rs:172-182``, at analytic shape)."""
    od = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        od.join(li, od.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting-revenue-change (TPC-H Q6 shape): pure
    scan→filter→global-agg, zero joins, zero shuffles past the partial
    agg.

    Scale: ALL three predicates and the 2-column projection push into
    the parquet scan (PushedFilters + ReadSchema — asserted in
    tests/test_plans.py); at 100 TB this reads only row-groups whose
    min/max stats overlap 1997 and only 3 columns of 11."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): lineitems of one
    brand whose quantity is below 20% of that part's average quantity.

    Spark-first decorrelation of the correlated scalar subquery
    (``l_quantity < 0.2 * (SELECT avg ... WHERE p_partkey = l_partkey)``):

    1. filter ``part`` to the brand (broadcast — dim-sized);
    2. semi-restrict lineitem to those parts BEFORE computing the
       per-part average — the aggregate runs over the selected brand's
       rows only, not the whole fact table;
    3. join the (tiny) per-part threshold back by partkey.

    The comparison is exact in both engines: quantities are
    integer-valued doubles, so the partial-sum order behind avg()
    cannot change the threshold bit pattern."""
    pa = F.broadcast(
        table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").join(
        pa, F.col("l_partkey") == F.col("p_partkey")
    )
    thresh = li.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(thresh), "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): orders whose total
    lineitem quantity exceeds 250, with customer attribution, top-10.

    Exercises HAVING (filter above a grouped aggregate) + join of an
    aggregate result back to facts. Scale: the HAVING filter reduces
    the orderkey set to ~1% before any wide row is assembled — the
    customer join sees only qualifying orders; top-10 compiles to
    TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        big.join(od, big.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (TPC-H Q7 shape): revenue flowing between two
    specific nations, per direction and per order year.

    Exercises a DISJUNCTIVE pair predicate over two dimension joins
    ((cust=A and supp=B) or (cust=B and supp=A)) plus year extraction
    and a 3-key aggregate.

    Scale note (the r11 sf100 post-mortem query — its exchanges peaked
    ~45 GB and ENOSPC'd the single pass): the disjunction only
    evaluates once BOTH nation names are present, but it IMPLIES
    cust_nation ∈ {A,B} AND supp_nation ∈ {A,B} — a conjunct Catalyst
    does not derive through two separate join paths. Applying it
    manually by filtering each broadcast nation dim to the two nations
    BEFORE the fact joins cuts both fact sides to 2/25 of their rows
    ahead of the fact⋈fact exchange: supplier⋈nation collapses to a
    broadcastable sliver (lineitem never shuffles for it), and the
    orderkey exchange carries ~8 % of lineitem instead of all of it.
    The residual ``pair`` filter then only removes the same-nation
    (A,A)/(B,B) combinations — semantics identical, oracle unchanged
    (sf100: 167.4 s → 20.6 s, peak spill ~12× smaller)."""
    n1, n2 = "NATION_3", "NATION_7"
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")
    su = table(spark, sf_dir, "supplier")
    nations = table(spark, sf_dir, "nation").where(
        F.col("n_name").isin(n1, n2)
    )
    cn = F.broadcast(
        nations.select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
        )
    )
    sn = F.broadcast(
        nations.select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    pair = (
        ((F.col("cust_nation") == n1) & (F.col("supp_nation") == n2))
        | ((F.col("cust_nation") == n2) & (F.col("supp_nation") == n1))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Two-nation supplier sliver: explicitly broadcast so the lineitem
    # side prunes map-side with NO exchange (2/25 of suppliers is a
    # few MB even at sf100).
    su2 = F.broadcast(
        su.join(sn, su.s_nationkey == sn.s_nk).select(
            "s_suppkey", "supp_nation"
        )
    )
    od2 = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(cn, cu.c_nationkey == cn.c_nk)
        .select("o_orderkey", "o_orderdate", "cust_nation")
    )
    li2 = li.join(su2, li.l_suppkey == su2.s_suppkey).select(
        "l_orderkey", "l_extendedprice", "l_discount", "supp_nation"
    )
    return (
        li2.join(od2, li2.l_orderkey == od2.o_orderkey)
        .where(pair)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape): how many distinct
    suppliers can ship parts of each (brand, type) bucket, excluding
    one brand and excluding suppliers that ever shipped late-returns.

    Exercises NOT-IN as a left-anti join against a derived exclusion
    set + a grouped COUNT DISTINCT. The exclusion set (suppliers in
    deficit — the fixture analog of Q16's complaints subquery) is
    dim-sized and broadcast, so the fact side never shuffles for the
    exclusion."""
    li = table(spark, sf_dir, "lineitem")
    pa = table(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#1")
    bad_supp = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(F.broadcast(bad_supp), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): the share of one
    supplier nation in the revenue sold into one region for one part
    type, per order year.

    Exercises a conditional-aggregate ratio over a snowflake join with
    TWO distinct roles for the nation dim (customer side restricts to
    the region; supplier side provides the share dimension). Both
    nation lookups and region broadcast; only fact⟷fact edges
    shuffle. The ratio divides two same-group sums, so the single
    grouped aggregate computes both numerator and denominator in one
    pass — no self-join, no second scan."""
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cu = table(spark, sf_dir, "customer")
    su = table(spark, sf_dir, "supplier")
    pa = F.broadcast(
        table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    )
    cn = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
        )
    )
    sn = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    re = F.broadcast(
        table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(cn, cu.c_nationkey == cn.c_nk)
        .join(re, cn.c_rk == re.r_regionkey)
        .join(sn, su.s_nationkey == sn.s_nk)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape, adapted — the fixture star
    has no partsupp, so supply cost is modeled as 10% of the part's
    retail price): profit per supplier nation per order year for parts
    whose name contains a color token.

    Exercises a LIKE-filtered dim join + multi-table join + 2-key agg
    with an arithmetic measure mixing fact and dim columns."""
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    su = table(spark, sf_dir, "supplier")
    pa = F.broadcast(
        table(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    )
    na = F.broadcast(table(spark, sf_dir, "nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(na, su.s_nationkey == na.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): top-20 customers by
    revenue lost to returns in one quarter.

    Exercises fact⋈fact⋈dim with a selective date filter, a 4-key
    grouped agg and a top-k that compiles to TakeOrderedAndProject —
    at 100 TB only the quarter's row groups are read (min/max
    pruning on o_orderdate) and the top-20 never sorts globally."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    od = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    cu = table(spark, sf_dir, "customer")
    na = F.broadcast(table(spark, sf_dir, "nation"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(na, cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode priority split (TPC-H Q12 shape; the fixture has
    no l_shipmode, so l_linestatus plays the mode bucket): per bucket,
    how many 1997-shipped lineitems belong to high- vs low-priority
    orders.

    Exercises a fact⋈fact join followed by conditional counts — the
    reference's per-type distribution report (SURVEY A2) at join
    shape."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    od = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): histogram
    of how many (non-low-priority) orders each customer has, including
    the zero bucket.

    Exercises LEFT OUTER join + double aggregation: the first groupBy
    preserves order-less customers as count 0 (count over a null
    column), the second buckets customers by that count. Two shuffles
    by design; the second input is customer-sized, not fact-sized."""
    cu = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    )
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (TPC-H Q14 shape): percentage of one month's
    revenue coming from PROMO-type parts.

    Exercises a scalar conditional-ratio aggregate over a broadcast
    dim join: numerator and denominator in one grouped pass, no
    self-join."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    pa = F.broadcast(table(spark, sf_dir, "part"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(pa, li.l_partkey == pa.p_partkey).agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
            / F.sum(vol),
            4,
        ).alias("promo_revenue")
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): the supplier(s) whose quarterly
    revenue equals the maximum.

    Spark-first handling of the `= (SELECT max(...))` correlation: the
    per-supplier revenue aggregate is supplier-sized, so its global
    max is computed once and broadcast back as a 1-row join — no
    window over a single partition, no second fact scan. Revenue is
    rounded to cents BEFORE the equality so both engines compare the
    same bit pattern."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    su = F.broadcast(table(spark, sf_dir, "supplier"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.max_revenue)
        .join(su, rev.l_suppkey == su.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted-revenue disjunction (TPC-H Q19 shape): revenue from
    three (brand, quantity-range, size-range) conjunct groups OR-ed
    together.

    Exercises a join whose residual predicate is a 3-way disjunction
    mixing fact and dim columns — Catalyst keeps the partkey equi-key
    for the (broadcast) hash join and evaluates the disjunction as a
    post-join filter; the common `p_size >= 1` conjunct is still
    pushed to the part scan."""
    li = table(spark, sf_dir, "lineitem")
    pa = F.broadcast(table(spark, sf_dir, "part"))
    pred = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .where(pred)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers-who-kept-orders-waiting (TPC-H Q21 shape, adapted —
    the fixture has no commit/receipt dates, so "late" is modeled as a
    returned lineitem): suppliers that were the ONLY supplier with a
    return inside a multi-supplier finished order.

    Exercises the classic EXISTS + NOT EXISTS double correlation.
    Spark-first decorrelation, restructured in r8 for the sf100
    spill profile (the r7 shape exchanged the FULL-WIDTH fact table
    for an orders pre-join, then Expand-doubled it through a double
    countDistinct — 60 GB of exchanges on one box):

    - the fact table is touched ONCE, map-reduced immediately to the
      (order, supplier, had-return) level — the only wide exchange
      carries three narrow columns, partially aggregated map-side;
    - both correlation counts come from a SECOND-level agg over that
      frame (no Expand: count + count_if replace the two distincts,
      exact because (order, supplier) is already unique);
    - the orders status filter joins at the per-ORDER level (key-only
      frames), not against fact rows;
    - the waiting supplier's ID is captured INSIDE the per-order
      aggregate (`max(has_ret ? supplier)` — exact because lone
      orders have exactly one returning supplier), so the fact table
      feeds ONE aggregation tree consumed once. A first r8 draft read
      the supplier back from the per-supplier frame instead; the two
      consumers picked up different pushed-down null filters, their
      subtrees no longer canonicalized equal, ReuseExchange didn't
      fire, and lineitem was scanned+aggregated twice — measurably
      slower than r7. Plan-gated: exactly one lineitem scan.

    No broadcast hint on the qualifying-orders side: it is
    order-cardinality (millions at sf100) and arrives hash-
    partitioned on the join key from its own aggregate, so the
    sort-merge join is exchange-free on that side; AQE may still
    elect a broadcast at small SF."""
    od_f = table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    per_supp = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.col("l_returnflag") == "R").alias("has_ret"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.count_if("has_ret").alias("n_ret_supp"),
        F.max(F.when(F.col("has_ret"), F.col("l_suppkey"))).alias("ret_supp"),
    )
    lone = (
        per_order.where((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
        .join(od_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "ret_supp")
    )
    su = F.broadcast(table(spark, sf_dir, "supplier"))
    return (
        lone.join(su, F.col("ret_supp") == su.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity (TPC-H Q22 shape; the 2-char customer
    "country code" is the tail of c_name since the fixture has no
    phone column): per code, count and total balance of
    above-average-balance customers with no order since mid-2000
    (every fixture customer has SOME order, so "dormant since" plays
    Q22's "never ordered").

    Exercises an uncorrelated scalar subquery (global average over
    positive balances, broadcast as a 1-row cross join) + LEFT ANTI
    join + grouped agg. The anti join's build side is the orders
    custkey projection — one column of the fact table, never the
    payload."""
    cu = table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring(F.col("c_name"), -2, 2)
    )
    avg_bal = cu.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    od_keys = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cu.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(od_keys, cu.c_custkey == od_keys.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape; the fixture has no
    partsupp, so the part↔supplier cost relation is derived from
    lineitem: supplycost(part, supp) = min unit price ever charged).
    For STANDARD parts and EUROPE suppliers, keep the supplier(s)
    charging each part's regional minimum, top-20 by balance.

    Exercises the correlated-min subquery decorrelated to a window.
    Two exchanges, each carrying the RIGHT data: the grouped cost
    aggregate keeps map-side partial aggregation, so its shuffle
    carries |distinct (part, supp) pairs|, not |lineitem rows| (an
    earlier variant pre-repartitioned raw lineitem on l_partkey to
    satisfy both the grouping and the window with one exchange — but
    that shuffles every raw row and forfeits the partial agg: at the
    sf10 proof it ran 11.7× the sf1 wall; this plan's first exchange
    shrinks with the combine and the window exchange moves only
    aggregated pairs). Broadcast dim spine, top-k output (gated in
    tests/test_plans.py). Reference analog: the registry's "best
    label per program" resolution (src/etl/transform.rs:34-61) at
    benchmark shape."""
    li = table(spark, sf_dir, "lineitem")
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "supplycost"
            )
        )
    )
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(na), F.col("s_nationkey") == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pa = (
        table(spark, sf_dir, "part")
        .where(F.col("p_type") == "STANDARD")
        .select("p_partkey", "p_name")
    )
    w = Window.partitionBy("l_partkey")
    return (
        cost.join(F.broadcast(eu), cost.l_suppkey == eu.s_suppkey)
        .withColumn("min_cost", F.min("supplycost").over(w))
        .where(F.col("supplycost") == F.col("min_cost"))
        .join(F.broadcast(pa), F.col("l_partkey") == pa.p_partkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round(F.col("supplycost") + 1e-9, 4).alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(20)
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification (TPC-H Q11 shape; partsupp value
    is replaced by per-part discounted revenue from one nation's
    suppliers). Keeps parts whose value exceeds 0.2% of the national
    total — the grouped-agg-vs-scalar-subquery-over-the-same-agg
    shape, decorrelated to a 1-row broadcast cross join so the value
    aggregate is computed once and consumed by both sides."""
    li = table(spark, sf_dir, "lineitem")
    na = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    su = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(na), F.col("s_nationkey") == na.n_nationkey)
        .select("s_suppkey")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    val = (
        li.join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(rev).alias("v"))
    )
    thr = val.agg((F.sum("v") * 0.002).alias("thr"))
    return (
        val.join(F.broadcast(thr))
        .where(F.col("v") > F.col("thr"))
        .select("l_partkey", F.round("v", 2).alias("value"))
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-concentration suppliers (TPC-H Q20 shape; availqty is
    replaced by shipped quantity, "excess stock" by 1997 shipment
    concentration). Suppliers in NATION_9 having some '%red%' part
    whose 1997 quantity exceeds half that pair's all-time quantity
    (pairs under 60 units total are noise and excluded).

    Exercises the nested-IN-with-aggregated-threshold: LIKE-filtered
    part dim broadcast into the fact, conditional pair-level agg, the
    qualifying-supplier set reduced then broadcast into a LEFT SEMI
    against the nation-filtered supplier dim. Quantities are
    integer-valued doubles, so the threshold compare is bit-exact
    cross-engine."""
    li = table(spark, sf_dir, "lineitem")
    red = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    in_1997 = (
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    qualifying = (
        li.join(F.broadcast(red), F.col("l_partkey") == red.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_1997, F.col("l_quantity")).otherwise(0.0)).alias(
                "qty_1997"
            ),
            F.sum("l_quantity").alias("qty_all"),
        )
        .where(
            (F.col("qty_all") >= 60)
            & (F.col("qty_1997") > 0.5 * F.col("qty_all"))
        )
        .select("l_suppkey")
    )
    na = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9")
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(na), F.col("s_nationkey") == na.n_nationkey)
        .join(
            qualifying, F.col("s_suppkey") == qualifying.l_suppkey, "left_semi"
        )
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


ORACLE: dict[str, str] = {
    "q_tpch_q2": """
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS supplycost
            FROM lineitem GROUP BY 1, 2
        ), elig AS (
            SELECT l_partkey, supplycost, s_name,
                   round(s_acctbal, 2) AS s_acctbal, n_name,
                   min(supplycost) OVER (PARTITION BY l_partkey) AS min_cost
            FROM cost
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               round(supplycost + 1e-9, 4) AS supplycost
        FROM elig JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'STANDARD' AND supplycost = min_cost
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 20
    """,
    "q_tpch_q11": """
        WITH val AS (
            SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS v
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
            GROUP BY 1
        )
        SELECT l_partkey, round(v, 2) AS value
        FROM val WHERE v > (SELECT sum(v) * 0.002 FROM val)
    """,
    "q_tpch_q20": """
        WITH agg AS (
            SELECT l_suppkey, l_partkey,
                   sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                             AND l_shipdate <  TIMESTAMP '1998-01-01'
                            THEN l_quantity ELSE 0.0 END) AS qty_1997,
                   sum(l_quantity) AS qty_all
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '%red%'
            GROUP BY 1, 2
        )
        SELECT s_name, round(s_acctbal, 2) AS s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_9'
          AND s_suppkey IN (SELECT l_suppkey FROM agg
                            WHERE qty_all >= 60
                              AND qty_1997 > 0.5 * qty_all)
    """,
    "q_tpch_q8": """
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               round(sum(CASE WHEN sn.n_name = 'NATION_3'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = 'STANDARD'
          AND r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY o_year
    """,
    "q_tpch_q9": """
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - 0.1 * p_retailprice * l_quantity), 2) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, o_year
    """,
    "q_tpch_q10": """
        SELECT c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-04-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
    "q_tpch_q12": """
        SELECT l_linestatus,
               count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
                   AS high_line_count,
               count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                   AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
    """,
    "q_tpch_q13": """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    "q_tpch_q14": """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    "q_tpch_q15": """
        WITH revenue AS (
          SELECT l_suppkey,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    "q_tpch_q19": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
               AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
               AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#3'  AND l_quantity BETWEEN 20 AND 30
               AND p_size BETWEEN 1 AND 15)
    """,
    "q_tpch_q21": """
        WITH li_f AS (
          SELECT l_orderkey, l_suppkey, l_returnflag
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
        ),
        per_order AS (
          SELECT l_orderkey,
                 count(DISTINCT l_suppkey) AS n_supp,
                 count(DISTINCT CASE WHEN l_returnflag = 'R'
                                     THEN l_suppkey END) AS n_ret_supp
          FROM li_f GROUP BY l_orderkey
        )
        SELECT s_name, count(DISTINCT li_f.l_orderkey) AS numwait
        FROM li_f
        JOIN per_order ON li_f.l_orderkey = per_order.l_orderkey
        JOIN supplier  ON li_f.l_suppkey = s_suppkey
        WHERE li_f.l_returnflag = 'R'
          AND n_supp > 1 AND n_ret_supp = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC LIMIT 10
    """,
    "q_tpch_q22": """
        SELECT substr(c_name, length(c_name) - 1, 2) AS cntrycode,
               count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-06-01')
        GROUP BY cntrycode
    """,
    "q_tpch_q7": """
        SELECT cust_nation, supp_nation, o_year,
               round(sum(volume), 2) AS revenue
        FROM (
          SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
                 CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          WHERE (cn.n_name = 'NATION_3' AND sn.n_name = 'NATION_7')
             OR (cn.n_name = 'NATION_7' AND sn.n_name = 'NATION_3')
        )
        GROUP BY cust_nation, supp_nation, o_year
    """,
    "q_tpch_q16": """
        SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type
    """,
    "q_tpch_q4": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
    "q_tpch_q6": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.02 AND 0.05
          AND l_quantity < 24
    """,
    "q_tpch_q17": """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#12'
          AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    "q_tpch_q18": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        FROM (
          SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 250
        ) big
        JOIN orders   ON o_orderkey = big.l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "q_tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity) + 1e-9, 4) AS avg_qty,
               round(avg(l_discount) + 1e-9, 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1999-12-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_tpch_q3": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """,
    "q_tpch_q5": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
}
