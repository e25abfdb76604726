"""Every oracle-checkable catalog query must match DuckDB exactly at the test
scale factor — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from dampr_spark.plans import all_queries
from tests.oracle_utils import compare, duckdb_connection

_QUERIES = all_queries()
_ORACLE_NAMES = sorted(n for n, q in _QUERIES.items() if q.oracle is not None)
_ROWS_ONLY_NAMES = sorted(n for n, q in _QUERIES.items() if q.oracle is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_match(spark, sf_dir, con, name):
    q = _QUERIES[name]
    df = q.builder(spark, sf_dir)
    ok, msg = compare(df, con, q.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", _ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    q = _QUERIES[name]
    df = q.builder(spark, sf_dir)
    assert df.count() >= 0
