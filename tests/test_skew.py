"""Skew operators: salted results must equal their unsalted equivalents on
a deliberately hot-keyed fixture (one key holding half the rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dampr_spark.operators import skew


@pytest.fixture(scope="module")
def hot(spark):
    # key 0 holds 500 of 1000 rows; keys 1..500 one row each
    rows = [(0, i) for i in range(500)] + [(k, k) for k in range(1, 501)]
    return spark.createDataFrame(rows, "k long, v long")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(k, f"name{k}") for k in range(0, 501)], "k long, name string"
    )


def test_salted_join_matches_plain_inner(hot, dim):
    plain = hot.join(dim, ["k"]).select("k", "v", "name")
    salted = skew.salted_join(hot, dim, ["k"], n_salts=8).select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_keeps_unmatched(hot, spark):
    small = spark.createDataFrame([(0, "zero")], "k long, name string")
    out = skew.salted_join(hot, small, ["k"], n_salts=4, how="left")
    assert out.count() == hot.count()
    assert out.filter(F.col("name").isNull()).count() == 500  # keys 1..500


def test_salted_collect_list_matches_plain(hot):
    plain = {
        r.k: sorted(r.vs)
        for r in hot.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
    }
    salted = {
        r.k: sorted(r["values"])
        for r in skew.salted_collect_list(hot, ["k"], "v", n_salts=8).collect()
    }
    assert salted == plain
    # phase-1 bound: no single (key, salt) group should hold the whole hot key
    per_salt = (
        hot.withColumn(
            "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8))
        )
        .groupBy("k", "_salt")
        .count()
    )
    assert per_salt.agg(F.max("count")).first()[0] < 500


def test_bucketed_range_window_matches_plain(spark):
    """bucketed_range_window == plain per-key RANGE window, including rows
    exactly on bucket boundaries and ties."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    H = 100  # "range" units; bucket width == range
    rows = [
        # key, ts: boundary values (0, 100, 200), in-bucket values, ties
        ("u1", 0), ("u1", 50), ("u1", 100), ("u1", 100), ("u1", 150),
        ("u1", 200), ("u1", 299), ("u1", 300),
        ("u2", 10), ("u2", 111),
    ]
    df = spark.createDataFrame(
        [(k, t, float(i)) for i, (k, t) in enumerate(rows)], "k string, t long, v double"
    )
    w = Window.partitionBy("k").orderBy("t").rangeBetween(-H, 0)
    plain = df.select(
        "k", "t", "v",
        F.count(F.lit(1)).over(w).alias("n"),
        F.round(F.avg("v").over(w), 6).alias("a"),
    )
    bucketed = skew.bucketed_range_window(
        df,
        keys=["k"],
        ts_us_col="t",
        range_us=H,
        cols_fn=lambda win: {
            "n": F.count(F.lit(1)).over(win),
            "a": F.round(F.avg("v").over(win), 6),
        },
    ).select("k", "t", "v", "n", "a")
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bucketed_range_window_emits_each_row_once(spark):
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("t"), F.lit(1.0).alias("v")
    )
    out = skew.bucketed_range_window(
        df, keys=["k"], ts_us_col="t", range_us=50,
        cols_fn=lambda w: {"n": F.count(F.lit(1)).over(w)},
    )
    assert out.count() == 1000
    assert out.select("k", "t").distinct().count() == 1000
