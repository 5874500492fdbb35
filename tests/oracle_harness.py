"""Local replica of the driver's correctness gate: run a Spark query
and its DuckDB oracle on the same parquet tables and compare
row-count + column names + order-insensitive values.

Stricter than the driver on values (exact equality after per-cell
normalization) so that passing here strongly implies passing there.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from block_data_fetcher_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Cap the oracle engine: DuckDB runs IN-PROCESS, so one runaway
    # oracle plan otherwise grows the gate process until the kernel
    # OOM-kills the entire sweep (r10: the first sf0.1 gate died at
    # 97 GB anon RSS). With the cap the offending QUERY errors loudly
    # and the sweep records it; every legitimate oracle fits easily.
    con.execute("SET memory_limit='24GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact values expected — queries round explicitly; repr keeps
        # full precision so a real mismatch is caught.
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(round(float(v), 9))
    except Exception:
        pass
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out)


def compare(spark, query_fn, sql: str, sf_dir: str) -> None:
    sdf = query_fn(spark, sf_dir)
    # Driver-hasher constraint (CORRECTNESS_r01): oracle-backed queries
    # must emit only scalar columns — array/map/struct cells are
    # unhashable in the driver's pandas-based value hasher.
    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not complex_cols, (
        f"oracle-backed query returns complex-typed columns {complex_cols}; "
        "flatten to scalars (driver hasher can't hash list cells)"
    )
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    res = con.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns = _normalize(spark_rows, spark_cols)
    nd = _normalize(duck_rows, duck_cols)
    if ns != nd:
        diff_s = [r for r in ns if r not in nd][:5]
        diff_d = [r for r in nd if r not in ns][:5]
        raise AssertionError(
            f"value mismatch; spark-only={diff_s} duck-only={diff_d}"
        )
