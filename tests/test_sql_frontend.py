"""SQL front-end parity: the reference's query surface is PostgreSQL
SQL (SURVEY §3 entry point 3), so a switching user writes SQL. The
engine serves the same catalog through ``spark.sql`` over the
registered views (catalog.load(register_views=True)); these tests pin
that an ANSI-SQL text and the DataFrame-API plan produce identical
results."""

from __future__ import annotations

import pytest

from block_data_fetcher_spark import api
from block_data_fetcher_spark.catalog import load

_Q = api.queries()

# Catalog oracles that are pure ANSI (run unchanged in Spark SQL —
# the rest use DuckDB-only idioms: list_* lambdas, FILTER (...) frame
# syntax, json_extract_string, CUBE alias quirks).
_ANSI_QUERIES = [
    "q_agg_global",
    "q_anti_join",
    "q_arith_expr",
    "q_asof_join",
    "q_bloom_join",
    "q_broadcast_join",
    "q_classify_case",
    "q_conditional_funcs",
    "q_count_distinct",
    "q_csv_roundtrip",
    "q_dedup_exact",
    "q_filter_project",
    "q_freq_items",
    "q_full_outer_join",
    "q_funnel",
    "q_group_count",
    "q_group_minmax",
    "q_histogram",
    "q_join_fk_agg",
    "q_jsonl_roundtrip",
    "q_label_concat",
    "q_last_wins_window",
    "q_left_join_null",
    "q_orderby_limit",
    "q_pivot_types",
    "q_rate_derived",
    "q_partitioned_sink",
    "q_salted_join",
    "q_scan_project",
    "q_scd2",
    "q_anomaly",
    "q_interval_overlap",
    "q_self_join",
    "q_semi_join",
    "q_set_ops",
    "q_skew_agg",
    "q_snapshot_diff",
    "q_text_stats",
    "q_topn_per_group",
    "q_ts_convert",
    "q_tumbling_window",
    "q_union",
    "q_unpivot",
    "q_window_first_last",
    "q_window_lag",
    "q_window_rank",
    "q_window_running",
    *[f"q_tpch_q{n}" for n in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10,
                               11, 12, 13, 14, 15, 16, 17, 18,
                               19, 20, 21, 22)],
]


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    load(spark, sf_dir, register_views=True)
    return spark


@pytest.mark.parametrize("name", _ANSI_QUERIES)
def test_sql_matches_dataframe_api(name, views, spark, sf_dir):
    sql_rows = sorted(
        tuple(r) for r in spark.sql(api.oracle_sql()[name]).collect()
    )
    df_rows = sorted(tuple(r) for r in _Q[name](spark, sf_dir).collect())
    assert sql_rows == df_rows, name


def test_sql_adhoc_over_views(views, spark):
    """Ad-hoc SQL a reference user would write against the loaded
    schema (the migrations' indexed access paths)."""
    top = spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY o_orderpriority
        ORDER BY n DESC, o_orderpriority LIMIT 3
        """
    ).collect()
    assert len(top) == 3
    assert all(r.n > 0 for r in top)
