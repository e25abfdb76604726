"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full dampr_spark catalog (one entry per
implemented operator from SURVEY.md §2 plus the extension layer), which the
driver cross-checks against DuckDB at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dampr_spark.plans import oracle_map, query_map


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1 shape (group/aggregate over lineitem) — the canonical
    `a_group_by().reduce()` from the reference, as one Catalyst-planned
    partial+final aggregate.
    """
    from dampr_spark.plans.catalog import get_query

    return get_query("q1_pricing_summary").builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each oracle-checkable query."""
    return oracle_map()
