"""Relational operator catalog: scans, row transforms, grouping/aggregation,
joins, set ops, sort/top-k — every batch-relational operator from
SURVEY.md §2.1-2.6, expressed as declarative DataFrame plans so Catalyst
supplies pushdown, pruning, partial aggregation and join selection.

Determinism rules (the oracle hash-compares values):
- per-row double arithmetic is left unrounded (IEEE ops are bit-deterministic
  when the expression tree matches the SQL);
- aggregated doubles are rounded identically on both sides (sum→2dp, avg→6dp)
  because Spark/DuckDB accumulate in different orders;
- every LIMIT/top-k query carries a unique-key tie-break.

Reference parity notes cite /root/reference file:line in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dampr_spark.operators.pinning import pin_once as _pin
from dampr_spark.plans.catalog import register
from dampr_spark.sources.readers import read_table as _t

# ---------------------------------------------------------------------------
# §2.3 map / filter / flat_map — projections and row transforms
# ---------------------------------------------------------------------------


@register(
    "map_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    """,
    tags=("map", "projection"),
)
def map_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`map` (dampr/dampr.py:277-288): v → f(v) as a narrow projection.
    Catalyst prunes the scan to 4 columns (check ReadSchema)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


@register(
    "filter_where",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_quantity > 45
    """,
    tags=("filter",),
)
def filter_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`filter` (dampr/dampr.py:343-356). The predicate reaches the parquet
    scan as PushedFilters — no Python in the hot path."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@register(
    "flat_map_tokens",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    """,
    tags=("flat_map",),
)
def flat_map_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`flat_map` (dampr/dampr.py:358-370): one row per token. JVM-side
    split+explode, no Python UDF (the reference benchmarks tokenize in
    Python lambdas, benchmarks/tf-idf-dampr.py:12-14)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))


@register(
    "map_tuple_fields",
    oracle="""
    SELECT o_orderkey AS key, upper(o_orderpriority) AS priority,
           o_totalprice * 0.9 AS discounted
    FROM orders
    """,
    tags=("map_values", "map_keys", "prefix", "suffix"),
)
def map_tuple_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`map_keys`/`map_values`/`prefix`/`suffix` (dampr/dampr.py:290-340) are
    all column rewrites once data is typed: key-by = select-as-key, value map
    = withColumn. One stage, fully fused by WholeStageCodegen."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("key"),
        F.upper("o_orderpriority").alias("priority"),
        (F.col("o_totalprice") * 0.9).alias("discounted"),
    )


@register("sample_rows", oracle=None, tags=("sample",))
def sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sample(prob)` (dampr/dampr.py:114-126), time-seeded in the reference;
    here seeded for reproducibility. No SQL oracle (sampling RNGs differ) —
    driver does a rows-only check; `sample_fraction_check` is the
    hash-checked twin."""
    li = _t(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber")


@register(
    "sample_fraction_check",
    oracle="""
    SELECT k BETWEEN CAST(0.08 * n AS BIGINT) AND CAST(0.12 * n AS BIGINT)
             AS within_bounds
    FROM (SELECT count(*) AS k
          FROM (SELECT * FROM lineitem USING SAMPLE 10 PERCENT (bernoulli))),
         (SELECT count(*) AS n FROM lineitem)
    """,
    tags=("sample", "extension"),
)
def sample_fraction_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable `sample(prob)` verification: each engine draws its OWN
    Bernoulli sample and asserts the draw count lands inside generous
    binomial bounds (±20% of the 10% mean is >5σ even at sf0.001's 6k
    rows). Sampled row sets can never match across engines; the boolean
    does — the same each-engine-asserts-its-own-randomness trick as
    approx_distinct_parts."""
    li = _t(spark, sf_dir, "lineitem")
    k = li.sample(fraction=0.1, seed=42).agg(F.count("*").alias("k"))
    n = li.agg(F.count("*").alias("n"))
    # broadcast one single-row side: BroadcastNestedLoopJoin instead of the
    # CartesianProduct the planner picks for unhinted cross joins.
    return k.crossJoin(F.broadcast(n)).select(
        (
            (F.col("k") >= 0.08 * F.col("n")) & (F.col("k") <= 0.12 * F.col("n"))
        ).alias("within_bounds")
    )


# ---------------------------------------------------------------------------
# §2.4 grouping & aggregation
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           CAST(count(*) AS BIGINT)                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("group_by", "reduce", "a_group_by", "sum", "mean", "count", "tpch"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the canonical `a_group_by(...).reduce/sum/mean`
    (dampr/dampr.py:386-404,661-708). Catalyst plans partial+final
    HashAggregate, the exact equivalent of the reference's map-side
    ReducedWriter combine (dampr/dataset.py:84-117)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "2000-01-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "group_count",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("count",),
)
def group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`count(key)` (dampr/dampr.py:439-448): (key,1) summed with combiner =
    partial+final count aggregate."""
    return _t(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(F.count("*").alias("cnt"))


@register(
    "wordcount",
    oracle="""
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
    tags=("flat_map", "count", "flagship"),
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference README's flagship word count (README.md:50-57,
    examples/wc.py): flat_map → count-with-combiner, all JVM-side."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "mean_by_key",
    oracle="""
    SELECT c_nationkey, round(avg(c_acctbal), 6) AS avg_acctbal,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
    tags=("mean",),
)
def mean_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mean` (dampr/dampr.py:450-467): the reference decomposes avg into
    associative (sum,count) pairs — identical to Spark's partial-agg plan
    for F.avg."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
        F.count("*").alias("n_customers"),
    )


@register(
    "fold_by_sum",
    oracle="""
    SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY l_suppkey
    """,
    tags=("fold_by", "a_group_by", "sum"),
)
def fold_by_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`fold_by(key, binop)` = `a_group_by(key).reduce(binop)`
    (dampr/dampr.py:406-410); associative binop → groupBy().sum with
    map-side combine."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))


@register(
    "count_total",
    oracle="SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem",
    tags=("len",),
)
def count_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`len()` (dampr/dampr.py:245-275): per-partition count + single merge;
    Spark's count() aggregate is exactly that (plus parquet row-group
    statistics when no filter — the scan never materializes rows)."""
    return _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("unique", "distinct"),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global distinct (reference only has per-group `unique`,
    dampr/dampr.py:727-746; global distinct via group-then-first). Spark
    plans partial+final HashAggregate — no full shuffle of duplicates."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "unique_per_group",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments
    FROM customer GROUP BY c_nationkey
    """,
    tags=("unique",),
)
def unique_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`PReduce.unique` (dampr/dampr.py:727-746): first-seen distinct values
    per group. Set semantics → collect_set, sorted for determinism; emitted
    as a comma-joined scalar (array columns are unsortable in the external
    driver's pandas canonicalizer — see tests/test_canon_guard.py)."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("c_mktsegment"))).alias(
            "segments"
        )
    )


@register(
    "topk_global",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey ASC
    LIMIT 10
    """,
    tags=("topk",),
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`topk(k)` (dampr/dampr.py:621-652): heap-per-partition then global
    merge. Spark's orderBy().limit(k) plans TakeOrderedAndProject — the
    same partial top-k, no global sort."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


@register(
    "sort_by",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 400000
    ORDER BY o_totalprice DESC
    """,
    tags=("sort_by",),
)
def sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sort_by(key)` (dampr/dampr.py:412-422): globally key-sorted output via
    sorted spill runs + k-way merge; Spark's orderBy is a range-partitioned
    sort — same result, sampled range boundaries instead of hash buckets."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice") > 400000).select("o_orderkey", "o_totalprice").orderBy(
        F.col("o_totalprice").desc()
    )


@register(
    "per_group_topk",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders)
    WHERE rn <= 2
    """,
    tags=("topk", "window", "extension"),
)
def per_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k — absent as a primitive in the reference (users
    hand-roll it via BlockMapper, tests/test_dampr.py:239-311); here a
    window row_number, one shuffle on the group key."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 2)
    )


@register(
    "rollup_revenue",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           round(sum(o_totalprice), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("rollup", "extension"),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals — absent in the reference (SURVEY §2.4 notes
    no grouping sets/cube/rollup); extension-layer, one pass with partial
    aggregation per grouping set."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )


@register(
    "stats_by_group",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           round(min(l_quantity), 2) AS min_qty,
           round(max(l_quantity), 2) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("stats", "extension"),
)
def stats_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust stats per group: sample stddev + interpolated median —
    absent in the reference (no median/percentile/stddev, SURVEY §2.4).
    Exact percentile is a sort-within-group; at 100 TB swap to
    approx_percentile and document the error bound."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
    )


# ---------------------------------------------------------------------------
# §2.5 joins
# ---------------------------------------------------------------------------


@register(
    "inner_join_agg",
    oracle="""
    SELECT o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("join", "inner"),
)
def inner_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`PJoin.reduce` inner co-group join (dampr/dampr.py:780-802,
    dampr/base.py:259-283). Equi-join on the fact tables' natural key —
    shuffle-hash/sort-merge chosen by Catalyst, skew handled by AQE."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "left_outer_join",
    oracle="""
    SELECT c.c_custkey,
           CAST(count(o.o_orderkey) AS BIGINT) AS num_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01') o
      ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join", "left"),
)
def left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`PJoin.left_reduce` (dampr/dampr.py:804-820, dampr/base.py:290-315):
    missing right side → empty iterator → zero counts here."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2001-01-01")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("num_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@register(
    "full_outer_join",
    oracle="""
    WITH s AS (SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_suppliers
               FROM supplier WHERE s_acctbal > 3000 GROUP BY s_nationkey),
         c AS (SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_customers
               FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey)
    SELECT coalesce(s.nk, c.nk) AS nationkey,
           coalesce(s.n_suppliers, 0) AS n_suppliers,
           coalesce(c.n_customers, 0) AS n_customers
    FROM s FULL OUTER JOIN c ON s.nk = c.nk
    """,
    tags=("join", "outer"),
)
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — the reference's OuterJoin is dead/buggy code
    (dampr/base.py:337-371, undefined var at :355); implemented correctly
    here as SURVEY §2.5 directs."""
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 3000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_customers"))
    )
    return s.join(c, s.nk == c.nk, "full").select(
        F.coalesce(s.nk, c.nk).alias("nationkey"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
    )


@register(
    "semi_join_by_count",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber
    FROM lineitem
    WHERE l_partkey IN (
        SELECT l_partkey FROM lineitem GROUP BY l_partkey HAVING count(*) >= 40)
    """,
    tags=("join", "semi", "filter_by_count"),
)
def semi_join_by_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`filter_by_count` (dampr/utils/common.py:2-15): count by key, filter
    counts, semi-join survivors back. left_semi keeps the probe side
    unduplicated; the counts side is tiny → AQE broadcasts it."""
    li = _t(spark, sf_dir, "lineitem")
    hot = li.groupBy("l_partkey").count().filter(F.col("count") >= 40).select("l_partkey")
    return li.join(hot, "l_partkey", "left_semi").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )


@register(
    "anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    """,
    tags=("join", "anti"),
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join — the reference builds it from left_reduce + empty-right
    filter (tests/test_dampr.py:118-130); first-class left_anti here."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2001-01-01")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "cross_join_broadcast",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    tags=("join", "cross", "broadcast"),
)
def cross_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`cross_left/cross_right(memory=True)` (dampr/dampr.py:541-588): map-side
    nested loop with the small side cached in RAM = BroadcastNestedLoopJoin."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name")


@register(
    "broadcast_dim_join",
    oracle="""
    SELECT n.n_name, r.r_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    tags=("join", "broadcast", "cross_set"),
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`cross_set` (dampr/dampr.py:590-619) materializes a whole small side to
    every row = broadcast variable. Spark-first: explicit F.broadcast on
    dimension tables so the fact table never shuffles."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# §2.6 set operations
# ---------------------------------------------------------------------------


@register(
    "union_all",
    oracle="""
    SELECT s_suppkey AS entity_id, 'supplier' AS side FROM supplier
    UNION ALL
    SELECT c_custkey AS entity_id, 'customer' AS side FROM customer
    """,
    tags=("union",),
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-input union (`Dampr.read_input(ds1, ds2, ...)` concatenation,
    dampr/dampr.py:857-877; the reference's `concat` is unimplemented,
    tests/test_dampr.py:464-473 — provided here as SURVEY §2.6 directs)."""
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"), F.lit("supplier").alias("side")
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"), F.lit("customer").alias("side")
    )
    return s.unionByName(c)


@register(
    "intersect_keys",
    oracle="""
    SELECT l_partkey AS partkey FROM lineitem
    INTERSECT
    SELECT p_partkey AS partkey FROM part WHERE p_size > 40
    """,
    tags=("intersect",),
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (absent in reference as a relational op — only the SQLite
    Indexer has set semantics, dampr/utils/indexer.py:72-125)."""
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("partkey"))
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") > 40)
        .select(F.col("p_partkey").alias("partkey"))
    )
    return li.intersect(p)


@register(
    "except_keys",
    oracle="""
    SELECT p_partkey AS partkey FROM part
    EXCEPT
    SELECT l_partkey AS partkey FROM lineitem
    """,
    tags=("except",),
)
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: parts never ordered. Plans as a left-anti aggregate —
    the relational form of the reference's anti-join idiom."""
    p = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("partkey"))
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("partkey"))
    return p.exceptAll(li.distinct()).distinct()


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join benchmarks (bench.py headliners)
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "tpch", "bench"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two joins → agg → top-k.
    customer side is small after the segment filter → broadcast."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
    tags=("join", "tpch", "bench"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join. Dimensions (region/nation/supplier/
    customer) broadcast; only the orders⋈lineitem join shuffles."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "sum", "tpch", "bench"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+agg — the pushdown/pruning probe.
    All four predicates reach the parquet reader."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "q4_priority_returns",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "group_by", "tpch"),
)
def q4_priority_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join then aggregate — orders with at
    least one returned lineitem, counted per priority. left_semi keeps
    orders unduplicated regardless of how many lineitems match; the filter
    on l_returnflag prunes the build side before the join."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li.select("l_orderkey"), o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q10_returned_revenue",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "group_by", "topk", "tpch"),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 3-table join → per-customer revenue on returned
    items → top 20. customer/orders broadcast under AQE at test scale; at
    100 TB the orders⋈lineitem equi-join shuffles on orderkey while the
    final top-k is TakeOrdered (heap per partition), never a global sort."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
           round(100 * sum(CASE WHEN p_type = 'PROMO'
                                THEN l_extendedprice * (1 - l_discount)
                                ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
    tags=("join", "broadcast", "group_by", "tpch"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregation ratio (promo revenue share
    per ship month). part is a dimension → explicit broadcast; one shuffle
    for the month aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month"))
        .agg(F.round(100 * F.sum(promo) / F.sum(disc), 6).alias("promo_share"))
    )


@register(
    "cube_revenue",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           round(sum(o_totalprice), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("cube", "extension"),
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — all 2^2 grouping sets in one pass
    (completes the grouping-sets family next to rollup_revenue; absent in
    the reference per SURVEY §2.4)."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )


@register(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
             <= 0.05 * count(DISTINCT l_partkey) AS approx_ok,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("approx", "extension"),
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-part estimate per return flag. Raw sketch
    estimates are engine-specific, so the hash-checked output carries the
    exact count plus `approx_ok` — each engine asserts its own HLL estimate
    lands within 5% of exact (rsd here is 2%, so the bound has slack). At
    100 TB the sketch is the only sane distinct-count: fixed-size state
    merges map-side instead of shuffling every key; the exact column exists
    for verification, not for the scale path."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", 0.02)
                - F.count_distinct("l_partkey")
            )
            <= 0.05 * F.count_distinct("l_partkey")
        ).alias("approx_ok"),
        F.count("*").alias("n_rows"),
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS F,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS O,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("pivot", "extension"),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order revenue as one column per order status. Values are
    enumerated explicitly — an un-enumerated pivot needs a driver-side
    distinct pass AND yields a data-dependent schema, both wrong at scale.
    Catalyst compiles this to the same single partial+final conditional
    aggregate as the CASE WHEN oracle."""
    o = _t(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .sum("o_totalprice")
    )
    return out.select(
        "o_orderpriority",
        *[F.round(F.coalesce(F.col(c), F.lit(0.0)), 2).alias(c) for c in ("F", "O", "P")],
    )


@register(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value
    FROM part
    """,
    tags=("unpivot", "extension"),
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide measure columns to (key, measure, value) rows —
    a narrow 1→N row transform (no shuffle; the inverse of pivot)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.col("p_size").cast("double").alias("p_size"), "p_retailprice"
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total,
           CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq
    FROM orders
    """,
    tags=("window", "analytics", "extension"),
)
def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions (absent in the reference, SURVEY §2.4 'no
    window functions'): per-customer running revenue + order sequence over
    an explicit ROWS frame with a unique (date, orderkey) ordering. One
    shuffle on the partition key; frames evaluate in a single sorted pass."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("running_total"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


@register(
    "first_order_per_customer",
    oracle="""
    WITH m AS (
        SELECT o_custkey,
               min({'d': o_orderdate, 'k': o_orderkey, 'p': o_totalprice}) AS f
        FROM orders GROUP BY o_custkey)
    SELECT o_custkey,
           (f).k AS first_orderkey,
           (f).d AS first_orderdate,
           round((f).p, 2) AS first_totalprice
    FROM m
    """,
    tags=("group_by", "first", "extension"),
)
def first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'first value per group': lexicographic min over a
    (date, orderkey, payload) struct — the oracle-checkable twin of the
    fluent ARReduce.first (dampr/dampr.py:693-699), whose first-seen
    semantics are nondeterministic across partitions in the reference too.
    One partial+final aggregate: no window, no sort, one shuffle."""
    o = _t(spark, sf_dir, "orders")
    first = F.min(F.struct("o_orderdate", "o_orderkey", "o_totalprice")).alias("f")
    return (
        o.groupBy("o_custkey")
        .agg(first)
        .select(
            "o_custkey",
            F.col("f.o_orderkey").alias("first_orderkey"),
            F.col("f.o_orderdate").alias("first_orderdate"),
            F.round(F.col("f.o_totalprice"), 2).alias("first_totalprice"),
        )
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "tpch", "extension"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): the deepest
    join tree in the catalog — fact-first join order, the two 25-row nation
    dims broadcast, the nation-pair predicate applied on the *dims* so the
    5-way join prunes before the big lineitem⋈orders shuffle. supplier /
    customer stay shuffle joins (at real scale they exceed the broadcast
    threshold; AQE converts them back when small)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = n.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    tags=("join", "tpch", "extension"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): the HAVING subquery becomes a
    left-semi join against the pre-aggregated order quantities — the
    aggregate runs ONCE and only surviving orderkeys flow into the 3-way
    join (at scale the semi-join side is tiny: 99th-percentile orders)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
    tags=("join", "tpch", "extension"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (OR-of-ANDs join predicate, adapted to this schema's
    columns): part is broadcast, and the disjunction stays a single codegen
    filter after the join rather than three unioned scans."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "order_gap_days",
    oracle="""
    SELECT o_orderkey, o_custkey,
           datediff('day',
                    lag(CAST(o_orderdate AS DATE)) OVER w,
                    CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "extension"),
)
def order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() window analytics: days since the same customer's previous
    order (NULL on the first). Deterministic via the (date, key) tie-break;
    one window shuffle on o_custkey, no join."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(d, F.lag(d).over(w)).cast("bigint").alias("gap_days"),
    )


# ---------------------------------------------------------------------------
# round 3: the remaining TPC-H query shapes, adapted to this schema
# (no partsupp table, no commit/receipt dates — each adaptation keeps the
# original query's structural challenge: correlated aggregates, exists /
# not-exists, distinct counts, group-vs-global HAVING)
# ---------------------------------------------------------------------------


@register(
    "q2_top_acctbal_supplier",
    oracle="""
    WITH sx AS (
        SELECT s_suppkey, s_name, round(s_acctbal, 2) AS bal, n_name, r_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey),
    mx AS (SELECT r_name, max(bal) AS mbal FROM sx GROUP BY r_name)
    SELECT sx.r_name, n_name, s_name, bal AS s_acctbal
    FROM sx JOIN mx ON sx.r_name = mx.r_name AND sx.bal = mx.mbal
    """,
    tags=("join", "tpch", "extension"),
)
def q2_top_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated max subquery; adapted — no partsupp, so the
    correlated aggregate runs over supplier acctbal per region instead of
    supply cost per part). Decorrelated the way an optimizer would: the
    per-region max is a 5-row aggregate that broadcasts back onto the
    supplier⋈nation⋈region join; both engines compare on the 2dp-rounded
    value so float ties cut identically."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    sx = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", "n_name", "s_name", F.round("s_acctbal", 2).alias("bal"))
    )
    mx = sx.groupBy(F.col("r_name").alias("_r")).agg(F.max("bal").alias("mbal"))
    return (
        sx.join(
            F.broadcast(mx),
            (sx.r_name == mx._r) & (sx.bal == mx.mbal),
        )
        .select("r_name", "n_name", "s_name", F.col("bal").alias("s_acctbal"))
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region  ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'PROMO')
    GROUP BY o_year
    """,
    tags=("join", "tpch", "extension"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): the widest join tree in the
    catalog — 7 relations. Fact-first: lineitem keeps only PROMO parts via a
    broadcast of the filtered part dim (1/6 of parts; at 100 TB this is the
    selective reduction that must happen before the orders shuffle), nation/
    region broadcast, customer-side region filter prunes before the
    customer⋈orders join. The share is a conditional-sum ratio in one
    aggregate pass — no second scan for the denominator."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = (
        n.join(F.broadcast(r.filter(F.col("r_name") == "AMERICA")),
               n.n_regionkey == r.r_regionkey)
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"), "left_semi")
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN orders   ON o_orderkey = l_orderkey
      WHERE p_name LIKE '%red%')
    GROUP BY nation, o_year
    """,
    tags=("join", "tpch", "extension"),
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit; adapted — no partsupp, so profit
    is discounted revenue without the supply-cost term). The LIKE filter
    lands on the part dim BEFORE its broadcast; lineitem⋈orders stays the
    one big shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_profit")
        )
    )


@register(
    "q11_revenue_concentration",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS r
        FROM lineitem GROUP BY l_suppkey)
    SELECT l_suppkey, round(r, 2) AS revenue
    FROM rev WHERE r > (SELECT 0.002 * sum(r) FROM rev)
    """,
    tags=("group_by", "tpch", "extension"),
)
def q11_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (group-sum vs global-sum HAVING; adapted — no
    partsupp, so supplier revenue stands in for stock value). The per-key
    aggregate is computed ONCE (eager local checkpoint — at 100 TB
    recomputing it for the global sum would re-shuffle the fact table); the
    1-row global total broadcasts back as a cross join. The threshold
    compares UNROUNDED sums on both sides (rounding only the emitted value)
    so boundary suppliers cut identically."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"))
        .transform(_pin)
    )
    total = rev.agg((F.sum("r") * 0.002).alias("_thresh"))
    return (
        rev.crossJoin(F.broadcast(total))
        .filter(F.col("r") > F.col("_thresh"))
        .select("l_suppkey", F.round("r", 2).alias("revenue"))
    )


@register(
    "q12_ship_lag_priority",
    oracle="""
    SELECT shipclass,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 90 DAY
                  THEN 'late' ELSE 'ontime' END AS shipclass,
             o_orderpriority
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    GROUP BY shipclass
    """,
    tags=("join", "tpch", "extension"),
)
def q12_ship_lag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (priority split by shipping class; adapted — no
    shipmode/commit/receipt columns, so the class is ship lag vs order
    date). One join + one conditional aggregate; the CASE runs in codegen,
    the 2-row result needs no sort."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.when(
                F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                "late",
            ).otherwise("ontime").alias("shipclass"),
            high.alias("_high"),
        )
        .groupBy("shipclass")
        .agg(
            F.sum(F.when(F.col("_high"), 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(F.col("_high"), 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
    tags=("join", "tpch", "extension"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): left outer join
    so zero-order customers survive with c_count=0 (count of a NULL column
    skips NULLs in both engines), then a histogram re-aggregate. The filter
    rides ON the join condition, not a WHERE (a WHERE would turn the outer
    join inner and drop the zero bucket)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    tags=("join", "tpch", "extension"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier by quarterly revenue): the revenue view
    is computed once (eager local checkpoint), its 1-row max broadcasts back,
    and only the winning supplier row(s) — usually one — join supplier. Both
    engines compare on the 2dp-rounded revenue so float ties resolve
    identically."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
        .transform(_pin)
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    top = (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .select("supplier_no", "total_revenue")
    )
    return (
        s.join(F.broadcast(top), s.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#11' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
    tags=("join", "tpch", "extension"),
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier variety per part group; adapted — lineitem
    stands in for the missing partsupp relation). The NOT IN becomes a
    broadcast anti-join against the (tiny) excluded-supplier list; the part
    predicate filters the dim before broadcast; distinct count is the one
    shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l1.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
    WHERE p_brand = 'Brand#23'
      AND l1.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l1.l_partkey)
    """,
    tags=("join", "tpch", "extension"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity revenue, correlated per-part avg):
    decorrelated into a single window aggregate over l_partkey AFTER the
    brand semi-join (the per-part avg only needs lineitems of Brand#23
    parts, because the correlation key determines the brand) — one shuffle,
    no self-join, no second scan of lineitem."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .withColumn("_avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q20_promo_part_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 50)
    """,
    tags=("join", "tpch", "extension"),
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with significant promo-part volume;
    adapted — lineitem stands in for partsupp/availqty). Nested semi-join
    chain: filtered part broadcasts into lineitem, the HAVING aggregate
    shrinks to qualifying suppkeys, and supplier is semi-joined against that
    (typically tiny) set."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    qualified = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(qualified), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q21_sole_late_shipper",
    oracle="""
    WITH ol AS (
        SELECT l_orderkey, l_suppkey, max(l_shipdate) AS sd
        FROM lineitem GROUP BY l_orderkey, l_suppkey)
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM (
      SELECT a.l_suppkey
      FROM ol a
      WHERE EXISTS (SELECT 1 FROM ol b
                    WHERE b.l_orderkey = a.l_orderkey
                      AND b.l_suppkey <> a.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM ol c
                        WHERE c.l_orderkey = a.l_orderkey
                          AND c.l_suppkey <> a.l_suppkey
                          AND c.sd >= a.sd)
    ) w JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    """,
    tags=("join", "tpch", "extension"),
)
def q21_sole_late_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting; adapted — no
    commit/receipt dates, so 'kept waiting' = sole strictly-latest shipper
    in a multi-supplier order). The EXISTS / NOT EXISTS pair decorrelates
    into ONE window pass over (order, supplier) max-shipdates: a supplier
    qualifies iff the order has >1 supplier, its shipdate equals the order
    max, and that max is unique — semantically identical to the correlated
    form, with no self-joins."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    ol = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("l_shipdate").alias("sd"))
    w = Window.partitionBy("l_orderkey")
    flagged = (
        ol.withColumn("_n", F.count(F.lit(1)).over(w))
        .withColumn("_mx", F.max("sd").over(w))
        .withColumn(
            "_nmx", F.sum(F.when(F.col("sd") == F.col("_mx"), 1).otherwise(0)).over(w)
        )
        .filter((F.col("_n") > 1) & (F.col("sd") == F.col("_mx")) & (F.col("_nmx") == 1))
    )
    return (
        flagged.join(F.broadcast(s), flagged.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


@register(
    "q22_idle_customers",
    oracle="""
    SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    """,
    tags=("join", "tpch", "extension"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (promising idle customers; adapted — nation stands in
    for the phone country code). Scalar avg subquery → 1-row broadcast cross
    join; NOT EXISTS → anti-join on the projected orders keys (at scale the
    anti-join is the one shuffle; everything else broadcasts)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    n = _t(spark, sf_dir, "nation")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "stratified_sample_check",
    oracle="""
    WITH f AS (
        SELECT l_returnflag,
               CASE l_returnflag WHEN 'A' THEN 0.05 WHEN 'N' THEN 0.15
                                 ELSE 0.25 END AS frac,
               count(*) AS n,
               count(*) FILTER (
                   WHERE random() < CASE l_returnflag WHEN 'A' THEN 0.05
                                    WHEN 'N' THEN 0.15 ELSE 0.25 END) AS k
        FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           k BETWEEN CAST(0.5 * frac * n AS BIGINT)
                 AND CAST(1.5 * frac * n AS BIGINT) AS within_bounds
    FROM f
    """,
    tags=("sample", "extension"),
)
def stratified_sample_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (`df.sampleBy` — per-stratum fractions, the tool
    for class-balanced training subsets), verified the same way as
    sample_fraction_check: sampled row sets can never match across engines,
    so each engine draws its OWN per-stratum Bernoulli sample and asserts
    the draw count lands inside generous binomial bounds (±50% of the mean
    is >5sigma at every stratum size the driver tests). The boolean per
    stratum is what hash-compares."""
    li = _t(spark, sf_dir, "lineitem")
    fracs = {"A": 0.05, "N": 0.15, "R": 0.25}
    sampled = (
        li.sampleBy("l_returnflag", fractions=fracs, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    totals = li.groupBy(F.col("l_returnflag").alias("_rf")).agg(
        F.count(F.lit(1)).alias("n")
    )
    frac = (
        F.when(F.col("l_returnflag") == "A", 0.05)
        .when(F.col("l_returnflag") == "N", 0.15)
        .otherwise(0.25)
    )
    return (
        sampled.join(F.broadcast(totals), sampled.l_returnflag == totals._rf)
        .select(
            "l_returnflag",
            (
                (F.col("k") >= (0.5 * frac * F.col("n")).cast("bigint"))
                & (F.col("k") <= (1.5 * frac * F.col("n")).cast("bigint"))
            ).alias("within_bounds"),
        )
    )


@register(
    "order_value_quantiles",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(o_totalprice, 0.5), 6)  AS p50,
           round(quantile_cont(o_totalprice, 0.95), 6) AS p95,
           round(quantile_cont(o_totalprice, 0.99), 6) AS p99
    FROM orders
    """,
    tags=("stats", "quantile", "extension", "bench"),
)
def order_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global exact order-value percentiles via
    operators/stats.exact_quantiles — the distributed rank-join selection
    (parallel range sort → global rank recovery → broadcast rank join), NOT
    the built-in percentile aggregate whose final merge buffers every value
    in one task. Identical quantile_cont semantics, oracle-checked; see
    conversion_lag_quantiles for the measured 100x contrast."""
    from dampr_spark.operators.stats import exact_quantiles

    o = _t(spark, sf_dir, "orders")
    q = exact_quantiles(o, "o_totalprice", [0.5, 0.95, 0.99])
    return q.select(
        "n",
        F.round("q_0", 6).alias("p50"),
        F.round("q_1", 6).alias("p95"),
        F.round("q_2", 6).alias("p99"),
    )


def _zorder_oracle() -> str:
    from dampr_spark.operators.layout import z_value_sql

    z = z_value_sql("o_custkey", "CAST(floor(o_totalprice) AS BIGINT)", bits=16)
    return f"""
    SELECT o_orderkey, {z} AS z
    FROM orders
    ORDER BY z ASC, o_orderkey ASC
    LIMIT 100
    """


@register(
    "zorder_curve_topk",
    oracle=_zorder_oracle(),
    tags=("layout", "extension"),
)
def zorder_curve_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve position of every order on the
    (customer, price) plane — the clustering key behind
    `operators/layout.zorder_by`, which range-partitions + sorts on this
    value so 2-D box queries prune files and row groups at scale. The
    query emits the first 100 curve positions (deterministic tie-break on
    orderkey); the oracle replays the identical bit-interleave arithmetic
    in SQL, externally verifying the curve math end to end. Pruning payoff
    is plan-locked in tests/test_layout.py."""
    from dampr_spark.operators.layout import z_value

    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            z_value(F.col("o_custkey"), F.floor("o_totalprice"), bits=16).alias("z"),
        )
        .orderBy(F.col("z").asc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "mom_revenue_growth",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             sum(o_totalprice) AS rev
      FROM orders GROUP BY 1)
    SELECT month,
           round(rev, 2) AS revenue,
           round(rev - lag(rev) OVER (ORDER BY month), 2) AS delta,
           round((rev - lag(rev) OVER (ORDER BY month))
                 / lag(rev) OVER (ORDER BY month) * 100, 4) AS growth_pct
    FROM m
    """,
    tags=("window", "analytics", "extension"),
)
def mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the lag-window reporting shape.
    The window runs over the AGGREGATED monthly table (≤ a few thousand
    rows at any corpus scale), so the unpartitioned ordering is bounded;
    the corpus-size work is the one month-keyed aggregate."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month")
    ).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("month")
    return m.select(
        "month",
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") - F.lag("rev").over(w), 2).alias("delta"),
        F.round(
            (F.col("rev") - F.lag("rev").over(w)) / F.lag("rev").over(w) * 100, 4
        ).alias("growth_pct"),
    )


@register(
    "revenue_share_by_nation",
    oracle="""
    WITH n AS (
      SELECT n.n_name AS nation, sum(o.o_totalprice) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name)
    SELECT nation,
           round(rev, 2) AS revenue,
           round(rev / sum(rev) OVER () * 100, 4) AS share_pct
    FROM n
    """,
    tags=("window", "analytics", "extension"),
)
def revenue_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of total revenue. The
    unpartitioned window sum runs over the 25-row nation aggregate, never
    the orders table — the corpus-size work is the orders⋈customer key
    shuffle join (customer outgrows any broadcast threshold at scale; at
    100 TB you'd bucket both on custkey — operators/bucketing) plus the
    broadcast nation dim and one aggregate."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    agg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.partitionBy()
    return agg.select(
        "nation",
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") / F.sum("rev").over(w) * 100, 4).alias("share_pct"),
    )


@register(
    "copurchase_brand_pairs",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON l_partkey = p_partkey)
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM ob a JOIN ob b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY brand_a, brand_b
    ORDER BY n_orders DESC, brand_a, brand_b
    LIMIT 20
    """,
    tags=("relational", "market-basket", "extension"),
)
def copurchase_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the 20 brand pairs most often bought in
    the SAME order — the association-mining prep shape (recommendations,
    assortment analysis). The brand dim broadcasts onto lineitem; distinct
    (order, brand) collapses line-level rows BEFORE pairing, so the
    self-join's per-order fan-out is C(brands-in-order, 2) — bounded by
    the brand vocabulary, never by order size in lines. One order-keyed
    shuffle for the pairing, a pair-keyed aggregate, heap top-20."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .transform(_pin)  # both sides of the self-join
    )
    a = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "brand_a", "brand_b")
        .limit(20)
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH base AS (
        SELECT o_custkey AS custkey,
               date_diff('day', max(o_orderdate), (SELECT max(o_orderdate) FROM orders)) AS recency,
               count(*) AS frequency,
               round(sum(o_totalprice), 2) AS monetary
        FROM orders GROUP BY o_custkey),
    scored AS (
        SELECT custkey, recency, frequency, monetary,
               ntile(4) OVER (ORDER BY recency DESC, custkey)   AS r,
               ntile(4) OVER (ORDER BY frequency, custkey)      AS f,
               ntile(4) OVER (ORDER BY monetary, custkey)       AS m
        FROM base)
    SELECT CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(avg(monetary), 6) AS avg_monetary
    FROM scored GROUP BY r, f, m
    """,
    tags=("relational", "segmentation", "extension"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic marketing-analytics cut:
    per customer Recency (days since last order, scored so quartile 4 =
    most recent), Frequency (order count), Monetary (total spend), each
    quartiled, then segment-level counts and average spend.

    All three quartile assignments use
    :func:`dampr_spark.operators.stats.distributed_ntile` — the range-sort
    rank-recovery rewrite — so NO global single-task ntile window ever
    runs over the customer table (bit-identical to the oracle's window
    form because every ORDER BY carries the custkey tiebreak). One
    customer-keyed aggregate feeds three scalar range sorts and a final
    64-row-max segment aggregate."""
    from dampr_spark.operators.stats import distributed_ntile

    o = _t(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("now"))
    base = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "custkey",
            F.datediff(F.col("now"), F.col("last_order")).alias("recency"),
            "frequency",
            "monetary",
        )
    )
    # negated recency orders DESC with the same total order as the oracle's
    # `ORDER BY recency DESC, custkey`
    scored = distributed_ntile(
        base.withColumn("_neg_r", -F.col("recency")), 4, ["_neg_r", "custkey"], "r"
    )
    scored = distributed_ntile(scored, 4, ["frequency", "custkey"], "f")
    scored = distributed_ntile(scored, 4, ["monetary", "custkey"], "m")
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("monetary"), 6).alias("avg_monetary"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter runtime join pruning (round 7)
# ---------------------------------------------------------------------------

_BLOOM_K = 5
_BLOOM_M = 4096


def _bloom_bit_sql(item_sql: str, j_sql: str) -> str:
    """DuckDB twin of operators/sketches.bloom_bit — the shared md5 bucket
    of the item salted with '#bloom<j>'."""
    from dampr_spark.functions.hashing import md5_uint_sql

    inner = f"{item_sql} || '#bloom' || CAST({j_sql} AS VARCHAR)"
    return f"({md5_uint_sql(inner, 4, little_endian=False)} % {_BLOOM_M})"


@register(
    "bloom_join_prune",
    oracle=f"""
    WITH dim AS (
        SELECT DISTINCT c_custkey AS k FROM customer
        WHERE c_mktsegment = 'BUILDING'),
    hs AS (SELECT unnest(range(0, {_BLOOM_K})) AS j),
    bits AS (
        SELECT DISTINCT {_bloom_bit_sql('CAST(k AS VARCHAR)', 'j')} AS bit
        FROM dim, hs),
    pk AS (SELECT o_custkey AS k, count(*) AS cnt FROM orders GROUP BY 1),
    ph AS (
        SELECT pk.k, pk.cnt, {_bloom_bit_sql('CAST(pk.k AS VARCHAR)', 'hs.j')} AS bit
        FROM pk CROSS JOIN hs),
    hits AS (
        SELECT k, cnt FROM ph JOIN bits USING (bit)
        GROUP BY k, cnt HAVING count(*) = {_BLOOM_K})
    SELECT CAST((SELECT count(*) FROM dim) AS BIGINT) AS n_keys,
           CAST((SELECT count(*) FROM bits) AS BIGINT) AS bits_set,
           CAST((SELECT coalesce(sum(cnt), 0) FROM pk) AS BIGINT) AS probe_rows,
           CAST((SELECT coalesce(sum(cnt), 0) FROM hits) AS BIGINT) AS passed_rows,
           CAST((SELECT coalesce(sum(cnt), 0) FROM pk
                 WHERE k IN (SELECT k FROM dim)) AS BIGINT) AS true_rows,
           CAST((SELECT coalesce(sum(cnt), 0) FROM hits) -
                (SELECT coalesce(sum(cnt), 0) FROM pk
                 WHERE k IN (SELECT k FROM dim)) AS BIGINT) AS false_positive_rows
    """,
    tags=("join", "sketch", "invariant", "extension"),
)
def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom-filter runtime join pruning with its own certificate:
    build a 5-hash / 4096-bit Bloom filter over the
    BUILDING-segment customer keys (md5 bit-hashes — the cross-engine
    hash, so the bit SET and every membership verdict replay bit-identical
    in DuckDB), pack it into a literal bitmap, and prune the orders probe
    side with a pure codegen predicate: zero shuffle, zero join, no UDF
    touches the probe scan.

    The one-row report is the certificate: ``passed_rows >= true_rows``
    always (no false negatives — the filter only prunes), and
    ``false_positive_rows`` exposes the collision mass the sizing formula
    predicts (~2% at m/n≈8, k=5). At 100 TB this is the explicit form of
    Spark's AQE runtime bloom filter — build once over the bounded dim
    side, persist the ≤m-row bit table, prune every future probe scan
    before its exchange instead of shuffling rows that cannot join."""
    from dampr_spark.operators.sketches import bloom_build, bloom_might_contain

    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    # The bitmap is collected once (bounded: ≤ m bits = one 32 KB literal)
    # — it is BOTH the probe predicate and bits_set, so no separate Spark
    # aggregate re-counts what the driver already holds.
    bits = sorted(
        r["bit"]
        for r in bloom_build(cust, "k", n_hashes=_BLOOM_K, n_bits=_BLOOM_M).collect()
    )
    pred = bloom_might_contain(bits, F.col("o_custkey"), _BLOOM_K, _BLOOM_M)
    # ONE orders scan: probe/passed/true counts are conditional sums over a
    # single broadcast-left-joined pass (round-8 verdict: the previous form
    # cross-joined three separate one-row orders aggregates, scanning the
    # probe side three times).
    orders = _t(spark, sf_dir, "orders")
    stats = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.k, "left")
        .agg(
            F.count(F.lit(1)).alias("probe_rows"),
            F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias("passed_rows"),
            F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("true_rows"),
        )
    )
    counts = (
        cust.agg(F.count(F.lit(1)).alias("n_keys"))
        .withColumn("bits_set", F.lit(len(bits)).cast("long"))
        .crossJoin(F.broadcast(stats))
    )
    return counts.select(
        "n_keys",
        "bits_set",
        "probe_rows",
        "passed_rows",
        "true_rows",
        (F.col("passed_rows") - F.col("true_rows")).alias("false_positive_rows"),
    )


_HQ_PROBS = [0.25, 0.5, 0.75, 0.9, 0.99]
_HQ_BINS = 256


@register(
    "histogram_quantile_sketch",
    oracle=f"""
    WITH v AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
               WHERE o_totalprice IS NOT NULL),
    b AS (SELECT min(x) AS lo, max(x) AS hi, count(*) AS n FROM v),
    h AS (SELECT least({_HQ_BINS - 1}, greatest(0,
              CAST(floor((x - lo) / (hi - lo) * {_HQ_BINS}) AS INT))) AS bucket,
          count(*) AS cnt
          FROM v, b GROUP BY 1),
    c AS (SELECT bucket, cnt, sum(cnt) OVER (ORDER BY bucket) AS cum FROM h),
    p AS (SELECT unnest([{", ".join(f"CAST({p} AS DOUBLE)" for p in _HQ_PROBS)}]) AS p),
    t AS (SELECT p.p,
                 least(CAST(n AS DOUBLE),
                       greatest(CAST(1.0 AS DOUBLE), p.p * n)) AS tr
          FROM p, b),
    sel AS (SELECT t.p, t.tr, min(c.bucket) AS bkt
            FROM t JOIN c ON c.cum >= t.tr GROUP BY 1, 2),
    est AS (SELECT sel.p,
                   round(lo + (hi - lo) / {_HQ_BINS}
                         * (sel.bkt + (sel.tr - (c.cum - c.cnt)) / c.cnt), 6) AS est
            FROM sel JOIN c ON c.bucket = sel.bkt, b),
    ex AS (SELECT unnest([{", ".join(f"CAST({p} AS DOUBLE)" for p in _HQ_PROBS)}]) AS p,
                  unnest(quantile_cont(x, [{", ".join(str(p) for p in _HQ_PROBS)}])) AS exact
           FROM v)
    SELECT est.p AS p, est.est AS est, round(ex.exact, 6) AS exact,
           round(abs(est.est - round(ex.exact, 6)), 6) AS abs_err
    FROM est JOIN ex ON ex.p = est.p
    """,
    tags=("stats", "quantile", "sketch", "invariant", "extension"),
)
def histogram_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explicit mergeable quantile sketch with its own certificate:
    256-bin histogram quantiles over order values
    (operators/stats.histogram_quantiles — bucket counts are the ENTIRE
    sketch state, ≤256 integer rows, merged across shards/streams by
    addition) side-by-side with the exact quantile_cont values from the
    distributed rank-recovery path. ``abs_err`` exposes the bin-width
    error bound (the true rank value lies inside the crossing bucket).

    Completes the cross-engine-replayable sketch quartet — CMS=frequency,
    HLL=distinct, Bloom=membership, histogram=quantiles: every arithmetic
    step (exact min/max/count grid fit, integer bucket counts, IEEE
    interpolation, 6dp display rounding) replays bit-identically in
    DuckDB, so unlike percentile_approx's engine-opaque t-digest this
    sketch hash-compares end-to-end. At 100 TB the corpus reduces to
    ≤256 counted rows per partition map-side; no range sort, no
    single-task percentile merge buffer."""
    from dampr_spark.operators.stats import exact_quantiles, histogram_quantiles

    o = _t(spark, sf_dir, "orders")
    est = histogram_quantiles(o, "o_totalprice", _HQ_PROBS, _HQ_BINS)
    eq = exact_quantiles(o, "o_totalprice", _HQ_PROBS)
    exact_rows = eq.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(p)).alias("p"),
                        F.round(F.col(f"q_{i}"), 6).alias("exact"),
                    )
                    for i, p in enumerate(_HQ_PROBS)
                ]
            )
        ).alias("s")
    ).select("s.p", "s.exact")
    return est.join(exact_rows, "p").select(
        "p",
        "est",
        "exact",
        F.round(F.abs(F.col("est") - F.col("exact")), 6).alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# HLL set algebra: audience overlap via inclusion-exclusion (round 7)
# ---------------------------------------------------------------------------

_HLLO_P = 9  # m = 512 registers, ~4.6% standard error


def _hll_overlap_oracle(p: int) -> str:
    """DuckDB twin of the explicit-HLL inclusion-exclusion overlap: the
    register layout, merge, and estimate replay eventops._hll_oracle_sql
    exactly; the union sketch is the register-max merge of the two
    audience sketches, and the intersection is est_a + est_b - est_union
    over the already-display-rounded estimates (both engines repeat the
    identical IEEE ops, so the derived numbers match bit-for-bit)."""
    from dampr_spark.functions.hashing import md5_uint_sql

    m = 1 << p
    u = md5_uint_sql("CAST(k AS VARCHAR)", 4, little_endian=False)
    amm = (0.7213 / (1.0 + 1.079 / m)) * m * m

    def est(cte: str) -> str:
        return f"""(SELECT round(CASE WHEN {amm!r} / (sp + ({m} - np)) <= {2.5 * m}
                             AND ({m} - np) > 0
                        THEN {float(m)!r} * ln({float(m)!r} / ({m} - np))
                        ELSE {amm!r} / (sp + ({m} - np)) END, 2)
          FROM (SELECT coalesce(sum(power(2.0, -rho)), 0) AS sp,
                       count(*) AS np FROM {cte}))"""

    return f"""
    WITH src AS (
        SELECT l_orderkey AS k, l_returnflag AS mode FROM lineitem
        WHERE l_returnflag IN ('R', 'A') AND l_orderkey IS NOT NULL),
    r AS (
        SELECT mode, u % {m} AS reg,
               CASE WHEN u // {m} = 0 THEN {32 - p + 1}
                    ELSE bit_count(((u // {m}) & -(u // {m})) - 1) + 1
               END AS rho
        FROM (SELECT mode, {u} AS u FROM src)),
    ra AS (SELECT reg, max(rho) AS rho FROM r WHERE mode = 'R' GROUP BY reg),
    rb AS (SELECT reg, max(rho) AS rho FROM r WHERE mode = 'A' GROUP BY reg),
    ru AS (SELECT reg, max(rho) AS rho FROM r GROUP BY reg),
    f AS (SELECT k,
                 max(CASE WHEN mode = 'R' THEN 1 ELSE 0 END) AS a,
                 max(CASE WHEN mode = 'A' THEN 1 ELSE 0 END) AS b
          FROM src GROUP BY k),
    x AS (SELECT CAST(sum(a) AS BIGINT) AS exact_returned,
                 CAST(sum(b) AS BIGINT) AS exact_acked,
                 CAST(count(*) AS BIGINT) AS exact_union,
                 CAST(sum(a * b) AS BIGINT) AS exact_inter
          FROM f),
    e AS (SELECT {est('ra')} AS est_returned,
                 {est('rb')} AS est_acked,
                 {est('ru')} AS est_union)
    SELECT x.exact_returned, e.est_returned, x.exact_acked, e.est_acked,
           x.exact_union, e.est_union, x.exact_inter,
           round(e.est_returned + e.est_acked - e.est_union, 2) AS est_inter,
           round(round(e.est_returned + e.est_acked - e.est_union, 2)
                 / e.est_union, 6) AS est_jaccard
    FROM x CROSS JOIN e
    """


@register(
    "hll_audience_overlap",
    oracle=_hll_overlap_oracle(_HLLO_P),
    tags=("join", "sketch", "distinct", "invariant", "extension"),
)
def hll_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL SET ALGEBRA — the audience-overlap pattern: estimate
    |A∪B| and |A∩B| for two distinct-key audiences (orders containing a
    returned (l_returnflag = 'R') line vs an acknowledged ('A') line) WITHOUT ever co-shuffling
    the raw keys. Each audience reduces to a 2^p-row explicit register
    table (operators/sketches.hll_register — exact integer arithmetic on
    the shared md5 hash, bit-identical in DuckDB); the union sketch is
    the register-max MERGE of the two audience sketches (the
    associative/idempotent op — never rescans the data), and the
    intersection falls out of inclusion-exclusion over the three
    estimates. Exact counts ride along as the certificate (one flags
    aggregate: a = in-A, b = in-B, a*b = in-both).

    At 100 TB this is the cross-shard / cross-day audience-overlap
    pattern: persist one 512-row sketch per segment, answer any
    pairwise (or k-way, by iterated merge) overlap question from
    sketches alone — the exact path is a distinct-key co-shuffle per
    PAIR, the sketch path is a one-off scan per segment. Inclusion-
    exclusion inherits ~1% of |A∪B| absolute error at p=9, so it is an
    audience-sizing tool, not a membership test (Bloom covers that).
    est_inter derives from the display-rounded estimates in BOTH engines
    so every reported digit replays bit-for-bit."""
    from dampr_spark.operators.sketches import hll_estimate, hll_register

    src = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_returnflag").isin("R", "A")
            & F.col("l_orderkey").isNotNull()
        )
        .select(F.col("l_orderkey").alias("k"), F.col("l_returnflag").alias("mode"))
    )
    reg, rho = hll_register(F.col("k"), _HLLO_P)
    per_mode = (
        src.select("mode", reg, rho)
        .groupBy("mode", "reg")
        .agg(F.max("rho").alias("rho"))
        .localCheckpoint(eager=True)  # bounded (mode x region rows); feeds 3 estimates + merge
    )
    ra = per_mode.filter(F.col("mode") == "R").select("reg", "rho")
    rb = per_mode.filter(F.col("mode") == "A").select("reg", "rho")
    ru = per_mode.groupBy("reg").agg(F.max("rho").alias("rho"))
    est_a = hll_estimate(ra, _HLLO_P).select(F.col("est_distinct").alias("est_returned"))
    est_b = hll_estimate(rb, _HLLO_P).select(F.col("est_distinct").alias("est_acked"))
    est_u = hll_estimate(ru, _HLLO_P).select(F.col("est_distinct").alias("est_union"))
    flags = src.groupBy("k").agg(
        F.max((F.col("mode") == "R").cast("int")).alias("a"),
        F.max((F.col("mode") == "A").cast("int")).alias("b"),
    )
    exact = flags.agg(
        F.sum("a").alias("exact_returned"),
        F.sum("b").alias("exact_acked"),
        F.count(F.lit(1)).alias("exact_union"),
        F.sum(F.col("a") * F.col("b")).alias("exact_inter"),
    )
    est_inter = F.round(
        F.col("est_returned") + F.col("est_acked") - F.col("est_union"), 2
    )
    return (
        exact.crossJoin(F.broadcast(est_a))
        .crossJoin(F.broadcast(est_b))
        .crossJoin(F.broadcast(est_u))
        .select(
            "exact_returned",
            "est_returned",
            "exact_acked",
            "est_acked",
            "exact_union",
            "est_union",
            "exact_inter",
            est_inter.alias("est_inter"),
            F.round(est_inter / F.col("est_union"), 6).alias("est_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Closed-form OLS revenue trend (round 7)
# ---------------------------------------------------------------------------

_OLS_SLOPE_D = "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
_OLS_DENX_D = "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
_OLS_DENY_D = "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"


@register(
    "segment_revenue_trend_ols",
    oracle=f"""
    WITH m AS (
        SELECT c_mktsegment,
               year(o_orderdate) * 12 + month(o_orderdate) AS x,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ym
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
    s AS (
        SELECT c_mktsegment, count(*) AS n,
               sum(x) AS sx, sum(x * x) AS sxx,
               sum(ym) AS sy, sum(x * ym) AS sxy,
               -- DECIMAL(19,2) factors: 19+19=38 fits DuckDB's cap; the
               -- DECIMAL(18,2)x(18,2) product overflows at sf>=0.1 sums
               sum(CAST(ym AS DECIMAL(19,2)) * CAST(ym AS DECIMAL(19,2))) AS syy
        FROM m GROUP BY 1)
    SELECT c_mktsegment, CAST(n AS BIGINT) AS n_months,
           round(CASE WHEN {_OLS_DENX_D} > 0
                 THEN {_OLS_SLOPE_D} / {_OLS_DENX_D} END, 6) AS slope,
           round(CASE WHEN {_OLS_DENX_D} > 0
                 THEN (CAST(sy AS DOUBLE)
                       - ({_OLS_SLOPE_D} / {_OLS_DENX_D}) * CAST(sx AS DOUBLE))
                      / CAST(n AS DOUBLE) END, 6) AS intercept,
           round(CASE WHEN {_OLS_DENX_D} > 0 AND {_OLS_DENY_D} > 0
                 THEN ({_OLS_SLOPE_D} * {_OLS_SLOPE_D}) / ({_OLS_DENX_D} * {_OLS_DENY_D})
                 END, 6) AS r2
    FROM s
    """,
    tags=("stats", "ml", "regression", "extension"),
)
def segment_revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment monthly-revenue TREND by closed-form OLS
    (operators/stats.grouped_ols) — the no-iteration counterpart of the
    GD logistic fit: squared-error regression reduces to five exact
    sufficient statistics per group, one map-side-combinable aggregate,
    zero gradient rounds.

    Determinism is the point: double summation is order-dependent, so
    the pipeline sums EXACTLY (monthly revenue as decimal(18,2); Σx, Σx²
    as integers; Σy, Σxy, Σy² as decimals — associative in any partition
    order) and only then evaluates the fixed IEEE closed-form expression
    both engines share, so slope/intercept/r² replay bit-for-bit with no
    tolerance band. x = absolute month number (year·12 + month);
    broadcast customer join supplies the segment.

    At 100 TB: stage 1 is an ordinary revenue rollup; stage 2 ships 5
    numbers per group — trend fitting costs the same as a sum. Compare
    `quality_logreg_fit` (iterative, one job per round): closed forms
    beat loops whenever the statistic admits one."""
    from dampr_spark.operators.stats import grouped_ols

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_mktsegment",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("x"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("ym")
        )
    )
    fit = grouped_ols(monthly, ["c_mktsegment"], "x", "ym")
    return fit.select(
        "c_mktsegment",
        F.col("n").alias("n_months"),
        "slope",
        "intercept",
        "r2",
    )


# ---------------------------------------------------------------------------
# CMS join-size estimation (round 7)
# ---------------------------------------------------------------------------

_CMSJ_DEPTH, _CMSJ_WIDTH = 4, 512


def _cmsj_bucket_sql(item_sql: str, row_sql: str) -> str:
    """DuckDB twin of operators/sketches.cms_bucket (same '#cms<r>' salt)."""
    from dampr_spark.functions.hashing import md5_uint_sql

    inner = f"{item_sql} || '#cms' || CAST({row_sql} AS VARCHAR)"
    return f"({md5_uint_sql(inner, 4, little_endian=False)} % {_CMSJ_WIDTH})"


@register(
    "cms_join_size_estimate",
    oracle=f"""
    WITH oa AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders
                WHERE o_custkey IS NOT NULL),
    cb AS (SELECT CAST(c_custkey AS VARCHAR) AS k FROM customer
           WHERE c_mktsegment = 'BUILDING' AND c_custkey IS NOT NULL),
    rr AS (SELECT unnest(range(0, {_CMSJ_DEPTH})) AS r),
    sa AS (SELECT r, {_cmsj_bucket_sql('k', 'r')} AS bucket, count(*) AS cnt
           FROM oa CROSS JOIN rr GROUP BY 1, 2),
    sb AS (SELECT r, {_cmsj_bucket_sql('k', 'r')} AS bucket, count(*) AS cnt
           FROM cb CROSS JOIN rr GROUP BY 1, 2),
    dots AS (SELECT sa.r, sum(sa.cnt * sb.cnt) AS dot
             FROM sa JOIN sb ON sa.r = sb.r AND sa.bucket = sb.bucket
             GROUP BY 1),
    e AS (SELECT CAST(coalesce(min(dot), 0) AS BIGINT) AS est FROM dots),
    x AS (SELECT CAST(count(*) AS BIGINT) AS exact FROM oa JOIN cb USING (k))
    SELECT x.exact AS exact_join_size, e.est AS est_join_size,
           e.est - x.exact AS overestimate
    FROM x CROSS JOIN e
    """,
    tags=("join", "sketch", "invariant", "extension"),
)
def cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-SIZE ESTIMATION from sketches (the CMS inner product,
    operators/sketches.cms_inner_product): estimate |orders ⋈
    BUILDING-customers| from two depth×width integer cell tables without
    running the join. Per hash row Σ cnt_a·cnt_b; min across rows. Every
    true key pairing lands in a shared cell and collisions only add, so
    ``est ≥ exact`` ALWAYS (the certificate column `overestimate` is
    provably ≥ 0) with expected slack Σf_A·Σf_B/width per row.

    The planner's pre-flight at 100 TB: each shard already maintains CMS
    cells (they merge by addition), so "how big is this join going to
    be" costs a depth×width cell join — choose broadcast vs shuffle, or
    veto a runaway join in CI, before touching the fact table. The exact
    join count rides along here as the verification anchor (it is the
    expensive thing the estimate replaces)."""
    from dampr_spark.operators.sketches import cms_build, cms_inner_product

    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull())
        .select(F.col("o_custkey").alias("k"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .filter(
            (F.col("c_mktsegment") == "BUILDING") & F.col("c_custkey").isNotNull()
        )
        .select(F.col("c_custkey").alias("k"))
    )
    est = cms_inner_product(
        cms_build(o, "k", _CMSJ_DEPTH, _CMSJ_WIDTH),
        cms_build(c, "k", _CMSJ_DEPTH, _CMSJ_WIDTH),
        _CMSJ_DEPTH,
    )
    exact = o.join(F.broadcast(c), "k").agg(
        F.count(F.lit(1)).alias("exact_join_size")
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_join_size",
        "est_join_size",
        (F.col("est_join_size") - F.col("exact_join_size")).alias("overestimate"),
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnosis (round 7)
# ---------------------------------------------------------------------------


@register(
    "join_key_skew_report",
    oracle="""
    WITH f AS (SELECT o_custkey AS k, count(*) AS c FROM orders
               WHERE o_custkey IS NOT NULL GROUP BY 1),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(sum(c) AS BIGINT) AS n_rows,
                 CAST(max(c) AS BIGINT) AS max_freq,
                 CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_singletons,
                 CAST(sum(c * c) AS BIGINT) AS sum_sq
          FROM f)
    SELECT n_keys, n_rows, max_freq, n_singletons,
           round(max_freq / (CAST(n_rows AS DOUBLE) / n_keys), 6)
             AS skew_ratio,
           round(CAST(sum_sq AS DOUBLE)
                 / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)), 6)
             AS collision_prob
    FROM s
    """,
    tags=("join", "skew", "stats", "invariant", "extension"),
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join SKEW diagnosis for a shuffle key (orders.o_custkey) — the
    one-row report that decides salting/AQE-skew-join BEFORE the join
    runs: ``max_freq`` (the biggest single-key task), ``skew_ratio``
    (max over mean frequency — 1.0 is perfectly flat; the salting
    trigger), ``n_singletons`` (keys a broadcast semi-join would serve),
    and ``collision_prob`` (Σc²/n² — the probability two random rows
    share a key; also the self-join size Σc² in normalized form, the
    same second moment the CMS inner product estimates).

    All exact integer aggregates off one key rollup — at 100 TB this is
    a map-side-combinable count, the cheapest possible look before an
    expensive shuffle; pairs with `cms_join_size_estimate` (how big) and
    `salted_join_agg` (the mitigation this report triggers)."""
    f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull())
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = f.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_freq"),
        F.sum((F.col("c") == 1).cast("long")).alias("n_singletons"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
    )
    return s.select(
        "n_keys",
        "n_rows",
        "max_freq",
        "n_singletons",
        F.round(
            F.col("max_freq")
            / (F.col("n_rows").cast("double") / F.col("n_keys")),
            6,
        ).alias("skew_ratio"),
        F.round(
            F.col("sum_sq").cast("double")
            / (F.col("n_rows").cast("double") * F.col("n_rows").cast("double")),
            6,
        ).alias("collision_prob"),
    )


@register(
    "winsorized_price_stats",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.05) AS lo,
             quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS hi
      FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY l_returnflag)
    SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
           round(b.lo, 6) AS p05, round(b.hi, 6) AS p95,
           round(avg(least(greatest(CAST(l_extendedprice AS DOUBLE), b.lo), b.hi)), 6)
               AS winsorized_mean,
           round(avg(CAST(l_extendedprice AS DOUBLE)), 6) AS raw_mean
    FROM lineitem l JOIN b USING (l_returnflag)
    WHERE l_extendedprice IS NOT NULL
    GROUP BY l.l_returnflag, b.lo, b.hi
    """,
    tags=("stats", "quantile", "robust", "extension"),
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clamped-tail) per-group price means — the robust-stats
    step a metrics pipeline applies before trending a mean that a few
    fat-finger rows would otherwise own. Per-group p05/p95 come from
    operators/stats.exact_group_quantiles (distributed rank recovery —
    identical quantile_cont semantics with no per-group single-task merge),
    broadcast back onto the fact table; the clamp + mean is one map-side-
    combinable aggregate. Two scans of the fact table total — inherent to
    winsorization (the bounds must exist before the clamp) — and the only
    corpus-keyed shuffle is the range sort inside the quantile pass.
    raw_mean rides along so the report shows what the clamp changed."""
    from dampr_spark.operators.stats import exact_group_quantiles

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice").isNotNull())
    li = li.select("l_returnflag", F.col("l_extendedprice").cast("double").alias("px"))
    b = exact_group_quantiles(li, ["l_returnflag"], "px", [0.05, 0.95]).select(
        F.col("l_returnflag").alias("_rf"),
        F.col("q_0").alias("lo"),
        F.col("q_1").alias("hi"),
    )
    return (
        li.join(F.broadcast(b), li.l_returnflag == F.col("_rf"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("lo"), 6).alias("p05"),
            F.round(F.first("hi"), 6).alias("p95"),
            F.round(F.avg(F.least(F.greatest(F.col("px"), F.col("lo")), F.col("hi"))), 6)
            .alias("winsorized_mean"),
            F.round(F.avg("px"), 6).alias("raw_mean"),
        )
    )
