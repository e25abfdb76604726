"""Raw Spark-SQL surface.

The fluent API (``dampr_spark.api``) and the catalog plans are DataFrame
programs, but every table they read is equally usable from plain
``spark.sql`` — this module is the two-line bridge that registers the
testdata tables as temp views so ad-hoc SQL, BI tools, and the Spark SQL
CLI see the same data through the same reader (including the
TIMESTAMP(NANOS) handling in ``sources.readers.read_table``). At cluster
scale the equivalent is a real catalog (HMS/Unity/Glue); temp views are the
session-local stand-in with identical query semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dampr_spark.sources.readers import TABLES, read_table


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> list[str]:
    """Register each parquet table as a session temp view (idempotent —
    re-registration replaces). Returns the view names."""
    names = []
    for t in tables:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run a raw SQL query against the registered tables (registering them
    first). The declarative twin of the fluent API: everything Catalyst
    does for the DataFrame plans — pushdown, pruning, join selection, AQE —
    applies identically here."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
