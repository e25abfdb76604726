"""Raw-SQL surface: temp-view registration and SQL/DataFrame equivalence."""

from __future__ import annotations

from dampr_spark import sql as dsql
from dampr_spark.plans.catalog import get_query


def test_register_tables_lists_all(spark, sf_dir):
    names = dsql.register_tables(spark, sf_dir)
    assert "lineitem" in names and "documents" in names
    assert spark.sql("SELECT count(*) FROM lineitem").first()[0] > 0


def test_sql_matches_dataframe_q6(spark, sf_dir):
    got = dsql.sql(
        spark,
        sf_dir,
        """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """,
    ).first()
    want = get_query("q6_forecast_revenue").builder(spark, sf_dir).first()
    assert got["revenue"] == want["revenue"]


def test_sql_matches_dataframe_wordcount_topk(spark, sf_dir):
    got = dsql.sql(
        spark,
        sf_dir,
        """
        SELECT token, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT explode(split(text, ' ')) AS token FROM documents
              WHERE text IS NOT NULL)
        GROUP BY token ORDER BY cnt DESC, token LIMIT 5
        """,
    ).collect()
    from dampr_spark.operators.sketches import heavy_hitters
    from dampr_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    d = read_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select(F.explode(F.split("text", " ")).alias("item"))
    want = heavy_hitters(toks, "item", k=5, capacity=1024).collect()
    assert [(r.token, r.cnt) for r in got] == [(r.item, r.cnt) for r in want]
