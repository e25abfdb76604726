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


def test_window_frame_audit_hand_computed(spark):
    """Tiny fixture with known bucket layout (range=10us):

    key a: ts 1,2,3 (bucket 0), 11 (bucket 1), 25 (bucket 2)
      buckets: (0, n=3, prev=0) (1, n=1, prev=3) (2, n=1, prev=1)
      key_rows=5, max_task=max(3, 4, 2)=4, frame=3*3 + 1*4 + 1*2 = 15
    key b: ts 5 (bucket 0)
      key_rows=1, max_task=1, frame=1
    """
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("a", 11), ("a", 25), ("b", 5),
         (None, 7)],
        "k string, us long",
    )
    r = skew.window_frame_audit(df, keys=["k"], ts_us_col="us", range_us=10).first()
    assert r.n_rows == 6  # NULL key dropped
    assert r.n_keys == 2
    assert r.max_key_rows == 5
    assert r.skew_ratio == round(5 / (6 / 2), 6)
    assert r.n_buckets == 4
    assert r.max_bucket_task_rows == 4
    assert r.est_frame_rows == 16


def test_window_frame_audit_bounds_the_bucketed_layout(spark, sf_dir):
    """On real events: the audit's max_bucket_task_rows must be a true
    upper bound for bucketed_range_window's realized partition sizes, and
    max_key_rows for the plain window's."""
    from dampr_spark.sources.readers import read_table

    e = read_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    ts = F.unix_micros(F.col("ts").cast("timestamp"))
    hour_us = 3_600_000_000
    r = skew.window_frame_audit(
        e, keys=["user_id"], ts_us_col=ts, range_us=hour_us
    ).first()
    plain_max = (
        e.groupBy("user_id").count().agg(F.max("count")).first()[0]
    )
    assert r.max_key_rows == plain_max
    # realized bucketed partitions: own rows + next-bucket context
    b = e.select("user_id", F.floor(ts / F.lit(hour_us)).alias("b"))
    own = b.groupBy("user_id", "b").count()
    nxt = own.select(
        "user_id", (F.col("b") + 1).alias("b"), F.col("count").alias("ctx")
    )
    merged = (
        own.join(nxt, ["user_id", "b"], "full_outer")
        .select(
            (F.coalesce("count", F.lit(0)) + F.coalesce("ctx", F.lit(0))).alias(
                "task_rows"
            ),
            F.coalesce("count", F.lit(0)).alias("own_rows"),
        )
    )
    realized = merged.filter(F.col("own_rows") > 0).agg(
        F.max("task_rows")
    ).first()[0]
    assert r.max_bucket_task_rows == realized


def test_window_frame_audit_scans_events_once(spark, sf_dir):
    """The instrument must not pay what it prices: one corpus scan, no
    row-level window, no join (same plan-lock style as the other sizing
    audits in test_plan_quality.py)."""
    from dampr_spark.plans import all_queries

    out = all_queries()["window_frame_audit"].builder(spark, sf_dir)
    plan = out._jdf.queryExecution().sparkPlan().toString()
    assert plan.count("events.parquet") == 1
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_floor_div_exact_past_double_precision(spark):
    """The bucket id must be exact integer floor division: a double
    divide corrupts past 2^53 (the grid-audit ADVICE lesson), and
    truncation differs from floor for negative timestamps."""
    from dampr_spark.operators.skew import _floor_div

    ns = 1_700_000_000_000_000_123  # ns-epoch magnitude, > 2^53
    df = spark.createDataFrame(
        [(ns,), (-7,), (-10,), (10,), (0,)], "v long"
    )
    got = {
        r.v: r.b
        for r in df.select("v", _floor_div("v", 10).alias("b")).collect()
    }
    assert got[ns] == ns // 10
    assert got[-7] == -1  # floor, not truncation (-7 div 10 == 0)
    assert got[-10] == -1
    assert got[10] == 1
    assert got[0] == 0
