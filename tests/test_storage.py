"""Production layout checks: partition pruning, bucketed co-located
joins, and salted aggregation — plan-level evidence that the 100 TB
posture (storage.py) actually changes the physical plan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from block_data_fetcher_spark.catalog import table
from block_data_fetcher_spark.plans.explain import (
    count_exchanges,
    formatted_plan,
)
from block_data_fetcher_spark.storage import (
    salted_sum_count,
    with_event_date,
    write_bucketed,
    write_partitioned,
)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    ev = with_event_date(table(spark, sf_dir, "events"))
    path = str(tmp_path / "events_by_date")
    write_partitioned(ev, path, ["event_date"])

    back = spark.read.parquet(path)
    one_day = back.where(F.col("event_date") == "2024-01-05")
    plan = formatted_plan(one_day)
    # the filter lands as a directory-level PartitionFilter, not a row filter
    assert "PartitionFilters" in plan
    assert "2024-01-05" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    # and the data still round-trips
    want = ev.where(F.col("event_date") == "2024-01-05").count()
    assert one_day.count() == want and want > 0


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # managed tables land in the session warehouse dir; DROP TABLE in
    # the finally block removes their files
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 4)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        ["o_orderkey"],
        4,
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(
            spark.table("lineitem_b"), "o_orderkey"
        )
        # co-located: bucket layout satisfies both sides' distribution
        assert count_exchanges(joined) == 0
        assert joined.count() == orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_agg_matches_plain(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    salted = salted_sum_count(ev, ["user_id"], "value", 8, "event_id")
    plain = ev.groupBy("user_id").agg(
        F.sum("value").alias("sum_value"), F.count("*").alias("cnt")
    )
    got = {
        r["user_id"]: (round(r["sum_value"], 6), r["cnt"]) for r in salted.collect()
    }
    want = {
        r["user_id"]: (round(r["sum_value"], 6), r["cnt"]) for r in plain.collect()
    }
    assert got == want
    # two-stage: the salted plan carries an extra aggregation level
    assert formatted_plan(salted).count("HashAggregate") >= 4
