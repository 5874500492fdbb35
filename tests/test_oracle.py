"""Run every catalog query against its DuckDB oracle — the local
replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from block_data_fetcher_spark import api
from tests.oracle_harness import compare

_QUERIES = api.queries()
_ORACLES = api.oracle_sql()

# Every query that declares an oracle gets a comparison test.
_WITH_ORACLE = sorted(set(_QUERIES) & set(_ORACLES))
_ROWS_ONLY = sorted(set(_QUERIES) - set(_ORACLES))


def test_every_oracle_has_query():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle(name, spark, sf_dir):
    compare(spark, _QUERIES[name], _ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
