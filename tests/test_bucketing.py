"""Bucketed co-location: write-time bucketing must elide read-time
exchanges — the repo's headline 100 TB join claim, asserted on real plans."""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from dampr_spark.operators import bucketing
from dampr_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


@contextlib.contextmanager
def no_broadcast(spark):
    """Force shuffle-join planning so the test exercises bucketing, not
    the broadcast path these tiny fixtures would otherwise take."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = read_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = read_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    bucketing.write_bucketed(
        orders, "b_orders", "o_orderkey", 8, path=str(base / "orders")
    )
    bucketing.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        8,
        path=str(base / "lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    with no_broadcast(spark):
        joined = bucketing.bucketed_join(spark, left, right, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_skips_sort(spark, bucketed_tables):
    # sortBy at write time + one file per bucket (write_bucketed's
    # repartition guarantees this): the SMJ's per-side Sort is satisfied by
    # the bucket files themselves. Spark 3+ only exposes bucket-file sort
    # order behind the legacy flag (SPARK-28595 removed it by default
    # because multi-file buckets broke it — exactly what the repartition
    # rules out), so pin it for the assertion.
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.legacy.bucketedTableScan.outputOrdering")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        with no_broadcast(spark):
            joined = bucketing.bucketed_join(spark, left, right, "o_orderkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", old)
    assert "Sort [" not in plan, plan
    assert "Exchange" not in plan, plan


def test_bucketed_groupby_no_exchange(spark, bucketed_tables):
    _, right = bucketed_tables
    with no_broadcast(spark):
        agg = (
            bucketing.read_bucketed(spark, right)
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    left, right = bucketed_tables
    expected = (
        read_table(spark, SF, "orders")
        .join(
            read_table(spark, SF, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert bucketing.bucketed_join(spark, left, right, "o_orderkey").count() == expected


def test_bucket_pruning_on_key_filter(spark, bucketed_tables):
    # equality filter on the bucket key must scan a 1/8 file subset.
    # autoBucketedScan turns bucketed reading off for plans with no
    # downstream distribution requirement — which also forfeits pruning —
    # so pin it on for the assertion.
    left, _ = bucketed_tables
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = bucketing.read_bucketed(spark, left).filter(F.col("o_orderkey") == 32)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", old)
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan
