"""Event-table catalog queries: windowed time aggregation and sessionization
in batch form. The reference has no streaming/window surface at all
(SURVEY §2.10); these are the extension layer, and the same window logic is
reused by ``dampr_spark.streaming`` for the Structured Streaming path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dampr_spark.operators.pinning import pin_once as _pin
from dampr_spark.plans.catalog import register
from dampr_spark.sources.readers import read_table as _t


@register(
    "events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "window", "extension"),
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch form): hourly counts/sums per
    event type. In streaming this is window(ts, '1 hour') + watermark —
    see dampr_spark.streaming."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "sessionization",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM flagged GROUP BY user_id
    """,
    tags=("events", "session", "extension"),
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag over a per-user
    window, flag gaps, count sessions. One shuffle on user_id; the same
    semantics stream via session_window(ts, '30 minutes') in
    dampr_spark.streaming."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@register(
    "top_users_by_value",
    oracle="""
    SELECT user_id, round(sum(value), 2) AS total_value,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    ORDER BY total_value DESC, user_id
    LIMIT 20
    """,
    tags=("events", "topk"),
)
def top_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter → agg → top-k on the events table."""
    e = _t(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.round(F.sum("value"), 2).alias("total_value"),
            F.count("*").alias("n_events"),
        )
        .orderBy(F.col("total_value").desc(), F.col("user_id"))
        .limit(20)
    )


@register(
    "json_props_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
    FROM events
    GROUP BY event_type
    """,
    tags=("events", "json", "extension"),
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column processing: extract a field from the JSON
    ``props`` string and aggregate. get_json_object evaluates JVM-side in
    the scan stage (the reference's JSON story is `text → json.loads` into
    opaque dicts, dampr/dampr.py:897-902 — here the extraction is a column
    expression Catalyst can prune around; for repeated multi-field access
    prefer from_json to a struct column so parsing happens once)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
    )


@register(
    "asof_last_click",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           c.event_id AS click_id,
           CAST(date_diff('microsecond', c.ts, p.ts) // 1000000 AS BIGINT)
             AS secs_since_click
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("events", "asof", "join", "extension"),
)
def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (absent in the reference, SURVEY §2.5 'no theta/range/
    as-of'): for each purchase, the most recent prior click by the same
    user. Implemented union+window (operators/temporal.py) — one
    shuffle+sort, no row explosion; the oracle is DuckDB's native ASOF
    LEFT JOIN."""
    from dampr_spark.operators.temporal import asof_join

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    out = asof_join(p, c, on=["user_id"], ts_col="ts", right_cols=["click_id"])
    return out.select(
        "purchase_id",
        "user_id",
        F.col("asof_click_id").alias("click_id"),
        F.expr("timestampdiff(SECOND, asof_ts, ts)").alias("secs_since_click"),
    )


@register(
    "range_join_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts > p.ts - INTERVAL 1 HOUR
    """,
    tags=("events", "range", "join", "extension"),
)
def range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-interval range join (absent in the reference): every
    click→purchase pair within a 1-hour attribution window per user.
    Equi-join on user_id with the interval as join predicate; output grows
    with the horizon — keep it tight at scale."""
    from dampr_spark.operators.temporal import range_join

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    return range_join(
        p, c, on=["user_id"], left_ts="p_ts", right_ts="c_ts", lower="INTERVAL 1 HOUR"
    ).select("purchase_id", "click_id", p["user_id"].alias("user_id"))


@register(
    "event_funnel",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        FROM events GROUP BY user_id)
    SELECT CAST(count(t_view) AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
               AS n_view_click,
           CAST(sum(CASE WHEN t_buy > t_click AND t_click > t_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM per_user
    """,
    tags=("events", "funnel", "extension"),
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): one conditional
    min-aggregate per user collapses the event stream to first-touch
    timestamps, then a single global aggregate counts strictly-ordered
    progressions. One shuffle on user_id; no self-joins (the naive funnel as
    a 3-way stream self-join explodes at scale). NULL comparisons drop
    non-converting users from the stricter stages in both engines."""
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    return per_user.agg(
        F.count("t_view").cast("long").alias("n_view"),
        F.sum(F.when(F.col("t_click") > F.col("t_view"), 1).otherwise(0))
        .cast("long")
        .alias("n_view_click"),
        F.sum(
            F.when(
                (F.col("t_buy") > F.col("t_click")) & (F.col("t_click") > F.col("t_view")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_full_funnel"),
    )


@register(
    "user_retention_cohort",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events)
    SELECT CAST(cohort_week AS DATE) AS cohort_week,
           CAST((epoch(act_week) - epoch(cohort_week)) / 604800 AS BIGINT)
               AS weeks_since,
           CAST(count(*) AS BIGINT) AS active_users
    FROM activity JOIN firsts USING (user_id)
    GROUP BY 1, weeks_since
    """,
    tags=("events", "cohort", "extension"),
)
def user_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week,
    counted in each subsequent active week. Two aggregates on user_id /
    (user, week) — the distinct-activity aggregate is the only pass over
    the full stream; the per-user firsts table is |users| rows and joins
    back keyed. Week arithmetic is integer epoch-seconds/604800 so both
    engines bucket identically (date_trunc('week') is ISO-Monday in both)."""
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").alias("act_week")
    ).distinct()
    weeks_since = (
        (F.unix_timestamp("act_week") - F.unix_timestamp("cohort_week")) / 604800
    ).cast("long")
    # cast to DATE on both sides: DuckDB's date_trunc('week') yields DATE,
    # Spark's yields TIMESTAMP — the hash compare needs one type.
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            weeks_since.alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
    )


@register(
    "events_dedup_exact",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_unique
    FROM (SELECT DISTINCT event_type, user_id, ts FROM events)
    GROUP BY event_type
    """,
    tags=("events", "dedup", "extension"),
)
def events_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact event dedup on the natural key (event_type, user_id, ts) —
    the at-least-once-delivery cleanup every event pipeline needs.
    dropDuplicates on the subset is one hash shuffle on the key; the
    per-type recount piggybacks on the same exchange (Catalyst reuses the
    partitioning). Streaming twin: dropDuplicates + watermark in
    dampr_spark.streaming."""
    e = _t(spark, sf_dir, "events")
    return (
        e.dropDuplicates(["event_type", "user_id", "ts"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_unique"))
    )


@register(
    "events_dedup_keep_latest",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM (
        SELECT *, row_number() OVER (
                  PARTITION BY user_id, event_type
                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
    WHERE rn = 1
    """,
    tags=("events", "dedup", "extension"),
)
def events_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup: one surviving row per (user_id, event_type) — the
    newest by event time, event_id as the total-order tie-break (micros-
    truncated timestamps can collide). The upsert/compaction primitive of
    every CDC or event-log pipeline.

    Scale shape: one shuffle on the dedup key; the rank window scans each
    partition once. At 100 TB this is exactly a max_by-style reduction —
    Spark's partial aggregation can't pre-merge across the window form, so
    for extreme keys use groupBy(key).agg(max_by(struct, (ts, event_id)));
    the window form is kept because it yields the full surviving row
    without a rebuild join."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@register(
    "late_event_accounting",
    oracle="""
    WITH w AS (
        SELECT ts,
               max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS UNBOUNDED PRECEDING) AS high
        FROM events)
    SELECT date_trunc('hour', ts) AS hour,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN ts < high - INTERVAL '10 minutes'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late
    FROM w
    GROUP BY 1
    """,
    tags=("events", "window", "watermark", "extension"),
)
def late_event_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-lateness audit (batch form): per event-time hour, how many
    events arrived more than 10 minutes behind the per-user high-water mark
    (running max event time in arrival order = event_id). This is the batch
    diagnostic for sizing a streaming ``withWatermark`` delay — the count of
    rows a given watermark would drop.

    Scale shape: the running max partitions by user_id, so lateness tracking
    parallelizes per key (a GLOBAL high-water mark would funnel the corpus
    through one ordered window task); the hourly rollup is one narrow
    aggregate. Streaming twin: watermark + window in dampr_spark.streaming."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    high = F.max("ts").over(w)
    late = F.col("ts") < high - F.expr("INTERVAL 10 MINUTES")
    return (
        e.select(F.date_trunc("hour", "ts").alias("hour"), late.alias("late"))
        .groupBy("hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("late").cast("int")).cast("long").alias("n_late"),
        )
    )


@register(
    "asof_next_signup",
    oracle="""
    SELECT c.event_id AS click_id, c.user_id,
           s.event_id AS signup_id,
           CAST(date_diff('microsecond', c.ts, s.ts) // 1000000 AS BIGINT)
             AS secs_until_signup
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON c.user_id = s.user_id AND c.ts <= s.ts
    """,
    tags=("events", "asof", "join", "extension"),
)
def asof_next_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each click, the earliest signup at-or-after
    it by the same user — conversion-lag attribution. Same union+window
    construction as the backward direction (operators/temporal.asof_join
    direction='forward'); the oracle is DuckDB's ASOF JOIN with the
    comparison reversed."""
    from dampr_spark.operators.temporal import asof_join

    e = _t(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    s = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id", "ts"
    )
    out = asof_join(
        c, s, on=["user_id"], ts_col="ts", right_cols=["signup_id"],
        direction="forward",
    )
    return out.select(
        "click_id",
        "user_id",
        F.col("asof_signup_id").alias("signup_id"),
        F.expr("timestampdiff(SECOND, ts, asof_ts)").alias("secs_until_signup"),
    )


@register(
    "rolling_event_value",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_trailing,
           round(avg(value) OVER w, 6) AS avg_trailing
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
    """,
    tags=("events", "window", "extension"),
)
def rolling_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour RANGE-frame window per user: for every event, the
    count and mean value of that user's events in [t−1h, t]. The
    time-interval frame the ROWS-frame queries (running_revenue) can't
    express — frames are defined by event-time distance, not row offsets,
    so ties and gaps behave correctly.

    Spark's rangeBetween needs a numeric ordering column: order by
    microsecond epoch (exact — a double epoch would round at 16 digits)
    with the interval as ±µs. One shuffle on user_id; the frame scan is
    a per-partition sliding aggregate. Size BEFORE running with
    `window_frame_audit` (hot-key partition mass + frame budget in one
    linear pass); a hot key needs `rolling_event_value_bucketed`."""
    e = _t(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-hour_us, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.round(F.avg("value").over(w), 6).alias("avg_trailing"),
    )


@register(
    "conversion_lag_quantiles",
    oracle="""
    WITH lags AS (
        SELECT p.user_id,
               date_diff('microsecond', c.ts, p.ts) / 1000000.0 AS lag_secs
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts)
    SELECT CAST(count(*) AS BIGINT) AS n_conversions,
           round(quantile_cont(lag_secs, 0.5), 6) AS p50_secs,
           round(quantile_cont(lag_secs, 0.9), 6) AS p90_secs,
           round(quantile_cont(lag_secs, 0.99), 6) AS p99_secs
    FROM lags
    """,
    tags=("events", "asof", "stats", "extension"),
)
def conversion_lag_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion-lag distribution: as-of join each purchase
    to its most recent prior click (inner: unconverted purchases drop),
    then exact p50/p90/p99 of the lag — the funnel-latency report.

    The quantiles come from operators.stats.exact_quantiles (distributed
    rank-join selection), NOT the built-in exact ``percentile`` aggregate:
    the built-in materializes every lag in ONE final merge buffer —
    measured on the 100x spot-proof as a 10.9 s single task inside an
    11.3 s query (the whole stage waits on one reducer; at corpus scale it
    OOMs). Same quantile_cont semantics, same oracle, no single-task
    bottleneck."""
    from dampr_spark.operators.stats import exact_quantiles
    from dampr_spark.operators.temporal import asof_join

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    lags = (
        asof_join(p, c, on=["user_id"], ts_col="ts", right_cols=["click_id"])
        .filter(F.col("asof_click_id").isNotNull())
        .select(
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("asof_ts").cast("timestamp"))
            ).cast("double").alias("us")
        )
        .select((F.col("us") / 1_000_000.0).alias("lag_secs"))
    )
    q = exact_quantiles(lags, "lag_secs", [0.5, 0.9, 0.99])
    return q.select(
        F.col("n").alias("n_conversions"),
        F.round("q_0", 6).alias("p50_secs"),
        F.round("q_1", 6).alias("p90_secs"),
        F.round("q_2", 6).alias("p99_secs"),
    )


@register(
    "rolling_event_value_bucketed",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_trailing,
           round(avg(value) OVER w, 6) AS avg_trailing
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
    """,
    tags=("events", "window", "skew", "extension"),
)
def rolling_event_value_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe twin of `rolling_event_value`: the SAME trailing 1-hour
    window computed through operators.skew.bucketed_range_window (two-phase
    time bucketing — per-(user, hour) partitions with context replication
    instead of one partition per user). The oracle is byte-identical to
    rolling_event_value's, so a hash-green row here is an external proof
    that the skew mitigation is semantics-preserving. Round-5 spot-proof:
    with one user holding ~9% of a 1.1M-row table, the hot partition shrinks
    14x (99k rows -> <=7k per hour bucket) and measured max task time drops
    1.8x at local[32] — the per-task fixed costs flooring that ratio shrink
    with scale, the partition bound does not (benchmarks/RESULTS.md).
    `window_frame_audit` prices exactly this trade before the run: its
    max_key_rows vs max_bucket_task_rows columns are the plain and
    bucketed layouts' task bounds side by side."""
    from dampr_spark.operators.skew import bucketed_range_window

    e = _t(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    return bucketed_range_window(
        e,
        keys=["user_id"],
        ts_us_col=F.unix_micros(F.col("ts").cast("timestamp")),
        range_us=hour_us,
        cols_fn=lambda w: {
            "n_trailing": F.count(F.lit(1)).over(w),
            "avg_trailing": F.round(F.avg("value").over(w), 6),
        },
    ).select("event_id", "user_id", "n_trailing", "avg_trailing")


@register(
    "window_frame_audit",
    oracle="""
    WITH b AS (
      SELECT user_id,
             -- exact integer floor division, mirroring the Spark side's
             -- _floor_div (never a double divide — a ns-scale column
             -- would exceed a double's 2^53 exact-integer range): the
             -- positive-mod adjustment makes the numerator an exact
             -- multiple, so // is exact floor at any magnitude.
             (epoch_us(ts)
              - (epoch_us(ts) % 3600000000 + 3600000000) % 3600000000)
             // 3600000000 AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
    p AS (
      SELECT user_id, n,
             CASE WHEN lag(bucket) OVER w = bucket - 1
                  THEN lag(n) OVER w ELSE 0 END AS prev
      FROM b WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
    k AS (
      SELECT user_id,
             sum(n) AS key_rows,
             count(*) AS key_buckets,
             max(n + prev) AS key_max_task,
             sum(n * (n + prev)) AS key_frame
      FROM p GROUP BY 1)
    SELECT CAST(sum(key_rows) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(key_rows) AS BIGINT) AS max_key_rows,
           round(max(key_rows)
                 / (CAST(sum(key_rows) AS DOUBLE) / count(*)), 6)
             AS skew_ratio,
           CAST(sum(key_buckets) AS BIGINT) AS n_buckets,
           CAST(max(key_max_task) AS BIGINT) AS max_bucket_task_rows,
           CAST(sum(key_frame) AS BIGINT) AS est_frame_rows
    FROM k
    """,
    tags=("events", "window", "skew", "audit", "extension"),
)
def window_frame_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window family's sizing instrument (round 10): price the
    trailing 1-hour per-user RANGE window (`rolling_event_value`) before
    running it — the same audit-then-run discipline as
    `grid_resolution_audit` / `lsh_band_audit` /
    `contamination_posting_audit`, aimed at the window family's two
    scale killers: hot-key PARTITION mass (one task per key; AQE cannot
    split a window partition) and sliding-FRAME mass (Spark re-aggregates
    the buffered range frame per row). One row: corpus shape,
    ``max_key_rows`` (the plain window's single-task floor, with
    ``skew_ratio``), ``max_bucket_task_rows`` (the task bound
    `rolling_event_value_bucketed`'s layout would buy), and
    ``est_frame_rows`` (Σ n·(n+prev) — the frame row-visit budget both
    layouts pay). Mechanics: one per-(user, hour-bucket) count rollup —
    linear, map-side-combinable, no row-level window, no join."""
    from dampr_spark.operators.skew import window_frame_audit as _audit

    e = _t(spark, sf_dir, "events")
    return _audit(
        e,
        keys=["user_id"],
        ts_us_col=F.unix_micros(F.col("ts").cast("timestamp")),
        range_us=3_600_000_000,
    )


@register(
    "event_type_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events)
    SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    tags=("events", "sequence", "extension"),
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: counts of consecutive
    (prev event type -> event type) steps per user timeline — the Markov
    input of path/journey analytics. One shuffle on user_id for the lag
    window, then a partial-aggregated count on a |types|^2-bounded key
    space; output size is independent of corpus size, so the plan is the
    same at 100 TB."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    return seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "session_stats",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, ts, event_type,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(date_diff('microsecond', min(ts), max(ts)) // 1000000 AS BIGINT)
             AS duration_secs,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_purchases
    FROM numbered GROUP BY user_id, session_id
    """,
    tags=("events", "session", "extension"),
)
def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session roll-up: gap-based session assignment (30-min
    inactivity, running sum of new-session flags) then size / duration /
    purchase count per (user, session). Both window passes share ONE
    shuffle+sort on (user_id; ts, event_id) — Catalyst assigns lag and the
    running sum to the same Window physical node — and the final groupBy
    re-uses the user_id partitioning. The streaming twin is
    session_window(ts, '30 minutes') in dampr_spark.streaming."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        "event_type",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    return numbered.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            (
                F.unix_micros(F.max("ts").cast("timestamp"))
                - F.unix_micros(F.min("ts").cast("timestamp"))
            )
            / 1_000_000
        )
        .cast("long")
        .alias("duration_secs"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
    )


@register(
    "hopping_event_counts",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', ts)
               + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                      ELSE INTERVAL 0 MINUTE END AS t30,
             event_type, value
      FROM events),
    x AS (
      SELECT unnest([t30, t30 - INTERVAL 30 MINUTE]) AS window_start,
             event_type, value
      FROM b)
    SELECT window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM x GROUP BY 1, 2
    """,
    tags=("events", "window", "extension"),
)
def hopping_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregation: 1-hour windows every 30
    minutes, so each event lands in exactly two overlapping windows —
    the smoothing shape dashboards use where tumbling windows alias. Uses
    Spark's native ``F.window(ts, '1 hour', '30 minutes')`` — the SAME
    operator Structured Streaming runs, so this batch query is the
    replayable twin of a streaming job. Cost at scale: the window
    assignment is a 2x row explode fused into the scan, then one
    partial-aggregated shuffle on (window, type) — bounded output,
    corpus-size-independent. The oracle derives both candidate starts per
    event arithmetically (both always qualify for a 2:1 window/slide
    ratio)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "hopping_unique_users",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', ts)
               + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                      ELSE INTERVAL 0 MINUTE END AS t30,
             user_id
      FROM events),
    x AS (
      SELECT unnest([t30, t30 - INTERVAL 30 MINUTE]) AS window_start, user_id
      FROM b)
    SELECT window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM x GROUP BY window_start
    """,
    tags=("events", "window", "distinct", "extension"),
)
def hopping_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window audience size: exact distinct users per overlapping
    1-hour window (every 30 min) — the reach metric dashboards chart.
    Catalyst expands count(DISTINCT) into a two-stage aggregate (partial
    distinct per (window, user) map-side, then the count), so no task holds
    a window's full user set as one buffer; at extreme cardinality swap in
    approx_count_distinct (HLL, mergeable — the approx_distinct_parts
    pattern)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("w.start").alias("window_start"), "n_users", "n_events")
    )


@register(
    "user_value_ewma",
    oracle="""
    WITH per AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             list(value ORDER BY ts, event_id) AS vals
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id)
    SELECT user_id, n_events,
           round(list_reduce(vals, (acc, x) -> acc * 0.5 + x * 0.5), 6) AS ewma
    FROM per
    """,
    tags=("events", "stateful", "extension"),
)
def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's event values
    (α = 0.5), the classic online-stateful metric, expressed as a
    DECLARATIVE left fold: per-user events collect into a (ts, event_id)-
    ordered array and ``F.aggregate`` folds e ← α·v + (1−α)·e seeded with
    the first value. Both engines execute the identical float operation
    sequence (DuckDB's list_reduce is the same first-element-seeded left
    fold), so the result is bit-reproducible and fully oracle-checked.

    Scale note: per-user arrays are bounded by per-user event counts (the
    same per-key skew envelope as sessionization); a pathological hot key
    takes the time-bucketed pre-fold of `rolling_event_value_bucketed`
    instead. The streaming twin is an `applyInPandasWithState` fold keeping
    one double per user."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    per = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))).alias(
            "evs"
        ),
    )
    vals = F.transform(F.col("evs"), lambda s: s.value)
    ewma = F.aggregate(
        F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5),
    )
    return per.select("user_id", "n_events", F.round(ewma, 6).alias("ewma"))


@register(
    "hll_sketch_rollup_check",
    oracle="""
    SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact_users,
           TRUE AS merged_est_ok
    FROM events
    """,
    tags=("events", "sketch", "invariant", "extension"),
)
def hll_sketch_rollup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup, the 100 TB distinct-count pattern: per-day
    HLL sketches (`hll_sketch_agg`) materialize once at ingest granularity,
    and ANY later rollup (here: all-time users) merges the fixed-size
    sketches (`hll_union_agg`) instead of re-scanning raw events — a
    sketch-table read replaces a corpus-wide distinct shuffle.

    External check follows the each-engine-asserts-own-estimate pattern:
    ``n_days`` / ``n_exact_users`` are exact values both engines compute and
    hash-compare; ``merged_est_ok`` asserts Spark-side that the merged
    estimate lands within 5% of exact (HLL's standard error at default
    lgConfigK=12 is ~1.6%, so 5% is a stable bound, not a tuned one)."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    rolled = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = e.agg(F.countDistinct("user_id").alias("n_exact_users"))
    return exact.crossJoin(F.broadcast(rolled)).select(
        "n_days",
        "n_exact_users",
        (
            F.abs(F.col("est") - F.col("n_exact_users"))
            <= 0.05 * F.col("n_exact_users")
        ).alias("merged_est_ok"),
    )


@register(
    "interval_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 5 MINUTE AS e FROM events),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  THEN 1 ELSE 0 END AS new_grp
      FROM iv),
    grp AS (
      SELECT user_id, s, e,
             sum(new_grp) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
      FROM marked),
    merged AS (
      SELECT user_id, g, min(s) AS ms, max(e) AS me
      FROM grp GROUP BY user_id, g)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(date_diff('second', ms, me)) AS BIGINT) AS covered_sec
    FROM merged GROUP BY user_id
    """,
    tags=("events", "window", "extension"),
)
def interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval coalescing — the classic cumulative-max chain
    algorithm (each user's 5-minute activity intervals merge wherever they
    overlap; report merged-interval count and covered seconds). One
    per-user window sort does everything: an interval starts a new merged
    group iff its start exceeds the running max end of all earlier
    intervals; the running sum of those flags numbers the groups. Same
    skew envelope as sessionization (per-user partitions); distinct from
    it algorithmically — coverage union, not gap splitting."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = e.withColumn(
        "new_grp",
        F.when(
            F.max("e").over(w_prev).isNull()
            | (F.col("s") > F.max("e").over(w_prev)),
            1,
        ).otherwise(0),
    )
    grp = marked.withColumn("g", F.sum("new_grp").over(w_run))
    merged = grp.groupBy("user_id", "g").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.unix_timestamp("me") - F.unix_timestamp("ms"))
        .cast("long")
        .alias("covered_sec"),
    )


@register(
    "value_outliers_by_type",
    oracle="""
    WITH stats AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type)
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN abs(e.value - s.mu) > 3 * s.sd
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type
    """,
    tags=("events", "quality", "analytics", "extension"),
)
def value_outliers_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outlier counts per event type — the anomaly-detection gate a
    metrics pipeline runs before trusting a day's drop. Two passes: a
    bounded per-type stats aggregate broadcast back against the stream
    (never a per-row window), then one counting aggregate. Both engines
    use SAMPLE stddev."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.abs(F.col("value") - F.col("mu")) > 3 * F.col("sd"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


@register(
    "robust_outliers_by_type",
    oracle="""
    WITH e AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL),
    med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m
      FROM e GROUP BY event_type),
    dev AS (
      SELECT e.event_type, round(abs(e.value - med.m), 6) AS adev, med.m
      FROM e JOIN med USING (event_type)),
    mad AS (
      SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad
      FROM dev GROUP BY event_type)
    SELECT dev.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(any_value(dev.m), 6) AS median_value,
           any_value(mad.mad) AS mad,
           CAST(sum(CASE WHEN dev.adev > 3 * 1.4826 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type
    """,
    tags=("events", "quality", "analytics", "extension"),
)
def robust_outliers_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier gate per event type — the
    heavy-tail-safe twin of `value_outliers_by_type` (mean/σ breaks down
    when the outliers themselves inflate σ; median and MAD have a 50%
    breakdown point). Built by REUSING the distributed exact-quantile
    machinery (operators/stats.exact_group_quantiles — parallel range
    sort, no single-reducer merge) twice: per-type median, then median of
    absolute deviations, both broadcast back against the stream. The MAD
    and deviations are rounded at 6dp on BOTH engines before the
    3·1.4826·MAD compare, so the interpolation's last-ulp differences
    can't flip a boundary row."""
    from dampr_spark.operators.stats import exact_group_quantiles

    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull()).select(
        "event_type", "value"
    )
    med = exact_group_quantiles(e, ["event_type"], "value", [0.5]).select(
        "event_type", F.col("q_0").alias("m")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.round(F.abs(F.col("value") - F.col("m")), 6).alias("adev"),
        "m",
    )
    mad = exact_group_quantiles(
        dev.select("event_type", F.col("adev").alias("v")), ["event_type"], "v", [0.5]
    ).select("event_type", F.round(F.col("q_0"), 6).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.any_value("m"), 6).alias("median_value"),
            F.any_value("mad").alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


@register(
    "incremental_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "incremental", "extension"),
)
def incremental_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the hourly rollup is kept
    as MERGEABLE partials (count + raw value sum per key) so a new shard
    never triggers a full recompute — yesterday's persisted partial and the
    shard's partial re-aggregate by key, and the presentation row (rounded
    sum) derives at read time. Here event_id % 5 == 4 plays the
    newly-landed shard; the ORACLE computes the rollup directly over all
    events, so the hash compare PROVES merge(partial_history, partial_new)
    == full recompute — the algebraic property (sum/count are commutative
    monoids) the whole pattern rests on. Rounding happens ONLY at
    presentation: rounding inside the stored partial would break
    mergeability (round(a)+round(b) != round(a+b)).

    At scale: partials live partitioned by hour (append = touch only new
    hours), the merge shuffles |keys| rows, and the same shape maintains
    any monoid aggregate (HLL sketches for distincts — see
    hll_sketch_rollup_check)."""
    e = _t(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),  # UNROUNDED: stays mergeable
        )

    history = partial(e.filter(F.col("event_id") % 5 != 4))
    shard = partial(e.filter(F.col("event_id") % 5 == 4))
    merged = (
        history.unionByName(shard)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
    )
    return merged.select(
        "hour", "event_type", "n_events", F.round("sum_value", 2).alias("total_value")
    )


@register(
    "salted_distinct_check",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    GROUP BY event_type
    """,
    tags=("events", "skew", "extension"),
)
def salted_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe distinct counting, externally proven: per-event-type
    distinct users via the SALTED two-phase plan. The salt is derived from
    the DISTINCT KEY itself (user_id % 8), so phase 1's
    (type, salt, user) dedup spreads a hot type's users over 8 reducers
    while guaranteeing each distinct user lands in exactly ONE salt group
    — phase 2 therefore just counts phase-1 rows per type (no cross-salt
    re-dedup needed). Hash-compared against the oracle's direct
    COUNT(DISTINCT): a single hot key (one event type owning most of a
    100 TB stream) funnels every (type, user) row through one reducer in
    the naive plan — distinct aggregates co-locate per group key even with
    partial aggregation, which is exactly what the salt breaks. NULL
    types/users excluded identically on both engines."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    phase1 = e.groupBy(
        "event_type", (F.col("user_id") % 8).alias("salt"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    return phase1.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").cast("long").alias("n_events"),
    )


@register(
    "activity_seasonality",
    oracle="""
    SELECT CAST(isodow(ts) - 1 AS INT) AS weekday,
           CAST(extract(hour FROM ts) AS INT) AS hour,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "window", "analytics", "extension"),
)
def activity_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile: events and distinct users per
    (ISO weekday, hour-of-day) cell — the capacity-planning heatmap every
    event pipeline reports. One bounded aggregate (≤168 keys), partial
    aggregation collapses the stream map-side. Weekday uses the ISO
    convention on BOTH engines (Spark `weekday` = Monday 0; DuckDB
    `isodow - 1`) — the cross-engine trap being that each engine's default
    `dayofweek` numbers Sunday differently."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.weekday("ts").cast("int").alias("weekday"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "user_inactivity",
    oracle="""
    WITH mx AS (SELECT max(ts) AS now FROM events),
    last AS (SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id)
    SELECT user_id, last_ts,
           CAST(date_diff('day', last_ts, mx.now) AS BIGINT) AS idle_days
    FROM last, mx
    ORDER BY idle_days DESC, user_id
    LIMIT 50
    """,
    tags=("events", "churn", "extension"),
)
def user_inactivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inactivity: days between each user's LAST event and the
    dataset's newest event, top-50 stalest users — the churn/retention
    screen every activity pipeline runs. One user-keyed max aggregate
    (map-side partials), a broadcast 1-row dataset-max, and a heap top-50;
    no window, no second scan of raw events."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts").transform(_pin)  # feeds the global max and the per-user max
    mx = ev.agg(F.max("ts").alias("now"))
    last = ev.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    return (
        last.crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            "last_ts",
            F.datediff(F.col("now"), F.col("last_ts")).cast("long").alias("idle_days"),
        )
        .orderBy(F.col("idle_days").desc(), "user_id")
        .limit(50)
    )


@register(
    "user_burstiness",
    oracle="""
    WITH g AS (
        SELECT user_id,
               (epoch_us(ts) - epoch_us(lag(ts) OVER w)) // 1000000 AS gap_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
        SELECT user_id,
               CAST(count(gap_s) AS BIGINT) AS n_gaps,
               CAST(sum(gap_s) AS BIGINT) AS sum_g,
               CAST(sum(gap_s * gap_s) AS BIGINT) AS sum_g2
        FROM g WHERE gap_s IS NOT NULL GROUP BY user_id)
    SELECT user_id, n_gaps,
           round((n_gaps * sum_g2 - sum_g * sum_g) * 1.0
                 / (n_gaps * sum_g), 6) AS fano
    FROM s
    WHERE n_gaps >= 5 AND sum_g > 0
    ORDER BY fano DESC, user_id
    LIMIT 50
    """,
    tags=("events", "temporal", "extension"),
)
def user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user BURSTINESS of event timing: the Fano factor
    (variance/mean) of whole-second inter-arrival gaps — >> 1 flags
    bot-like bursts, ~1 is Poisson, < 1 is metronome-regular; the
    behavioral screen abuse/quality pipelines run on activity logs.
    Top-50 burstiest users with >= 5 gaps.

    Numerically EXACT cross-engine: gaps are integer seconds (floor of
    the microsecond delta), and fano = (n*Σg² − (Σg)²) / (n*Σg) is pure
    BIGINT arithmetic until one final division — no float accumulation
    order to drift (variance aggregates would). One per-user window
    (keyed — no global sort), one user-keyed aggregate, heap top-50."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(F.col("ts")).over(w)
    gap = F.floor(
        (us - F.unix_micros(prev.cast("timestamp"))) / F.lit(1_000_000)
    ).cast("long")
    g = e.select("user_id", gap.alias("gap_s")).filter(F.col("gap_s").isNotNull())
    s = g.groupBy("user_id").agg(
        F.count("gap_s").alias("n_gaps"),
        F.sum("gap_s").alias("sum_g"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("sum_g2"),
    )
    return (
        s.filter((F.col("n_gaps") >= 5) & (F.col("sum_g") > 0))
        .select(
            "user_id",
            F.col("n_gaps").cast("long").alias("n_gaps"),
            F.round(
                (F.col("n_gaps") * F.col("sum_g2") - F.col("sum_g") * F.col("sum_g"))
                / (F.col("n_gaps") * F.col("sum_g")),
                6,
            ).alias("fano"),
        )
        .orderBy(F.col("fano").desc(), "user_id")
        .limit(50)
    )


@register(
    "user_state_history",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events),
    r AS (
        SELECT *, rn - row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) AS grp
        FROM e),
    runs AS (
        SELECT user_id, event_type AS state, min(ts) AS valid_from,
               CAST(count(*) AS BIGINT) AS n_events, min(rn) AS first_rn
        FROM r GROUP BY user_id, event_type, grp)
    SELECT user_id, state, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY first_rn) AS valid_to,
           n_events
    FROM runs
    """,
    tags=("events", "scd", "extension"),
)
def user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 state history: collapse each user's event stream into
    validity intervals — one row per RUN of consecutive equal states
    (event_type), with [valid_from, valid_to) bounds (valid_to NULL = the
    current open interval) and the run's event count. The
    gaps-and-islands → interval-table build every warehouse's dimension
    loader runs; sessionization's cousin where the break condition is a
    VALUE CHANGE, not a time gap.

    Plan shape for 100 TB: three per-user window passes (global rank,
    per-(user,state) rank for the island id, lead for the closing bound) —
    all partitioned by user_id, so each executor sorts only its users'
    bounded histories; no global sort, one hash shuffle reused by all
    three windows. Skew = the hottest user's history, same envelope as
    sessionization."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    runs = state_runs(e)
    w_seq = Window.partitionBy("user_id").orderBy("valid_from", "first_eid")
    return runs.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w_seq).alias("valid_to"),
        "n_events",
    )


def state_runs(e: DataFrame) -> DataFrame:
    """Collapse an event frame (user_id, event_type, ts, event_id) into
    per-user RUNS of consecutive equal states: (user_id, state,
    valid_from, first_eid, n_events). The gaps-and-islands core shared by
    the batch `user_state_history` query and the streaming SCD2 twin
    (``streaming.scd2_state_stream``) — ``first_eid`` is the run's first
    event id in (ts, event_id) order, carried as the deterministic
    ordering tiebreak for the close/extend merge. Runs start strictly
    after one another per user, so ordering by (valid_from, first_eid)
    equals ordering by event rank."""
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_state = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w_user))
        .withColumn("grp", F.col("rn") - F.row_number().over(w_state))
        .groupBy("user_id", F.col("event_type").alias("state"), "grp")
        .agg(
            F.min(F.struct("ts", "event_id")).alias("o"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            "state",
            F.col("o.ts").alias("valid_from"),
            F.col("o.event_id").alias("first_eid"),
            "n_events",
        )
    )


_HLL_P = 9  # m = 512 registers


def _hll_oracle_sql(p: int) -> str:
    from dampr_spark.functions.hashing import md5_uint_sql

    m = 1 << p
    u = md5_uint_sql("CAST(user_id AS VARCHAR)", 4, little_endian=False)
    alpha_mm = (0.7213 / (1.0 + 1.079 / m)) * m * m
    return f"""
    WITH r AS (
        SELECT u % {m} AS reg,
               CASE WHEN u // {m} = 0 THEN {32 - p + 1}
                    ELSE bit_count(((u // {m}) & -(u // {m})) - 1) + 1
               END AS rho
        FROM (SELECT {u} AS u FROM events WHERE user_id IS NOT NULL)),
    regs AS (SELECT reg, max(rho) AS rho FROM r GROUP BY reg),
    a AS (SELECT coalesce(sum(power(2.0, -rho)), 0) AS sp, count(*) AS np FROM regs),
    e AS (SELECT round(CASE WHEN {alpha_mm!r} / (sp + ({m} - np)) <= {2.5 * m}
                             AND ({m} - np) > 0
                        THEN {float(m)!r} * ln({float(m)!r} / ({m} - np))
                        ELSE {alpha_mm!r} / (sp + ({m} - np)) END, 2) AS est
          FROM a),
    x AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
          FROM events WHERE user_id IS NOT NULL)
    SELECT x.exact_users, e.est AS est_users,
           round(abs(e.est - x.exact_users) / x.exact_users * 100, 4) AS err_pct
    FROM e CROSS JOIN x
    """


@register(
    "hll_explicit_distinct_users",
    oracle=_hll_oracle_sql(_HLL_P),
    tags=("events", "sketch", "extension"),
)
def hll_explicit_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user cardinality via the EXPLICIT-register HyperLogLog
    (operators/sketches.hll_build/hll_estimate): per-event_type register
    tables merged by register max (the associative/idempotent merge that
    makes HLL the distributed distinct sketch), estimated with the classic
    alpha_m m²/Σ2^-rho formula + linear-counting small-range correction,
    reported next to the exact distinct count.

    Unlike `hll_sketch_rollup_check` (Spark's builtin, engine-opaque
    binary sketch — invariant-checked only), every register here is exact
    integer arithmetic on the shared cross-engine md5 hash, and the
    register sum is EXACT in any merge order (all addends are powers of
    two that fit one 53-bit mantissa) — so DuckDB replays the whole
    sketch bit-for-bit: build, merge, estimate.

    Plan shape for 100 TB: one scan → per-(type, reg) max (map-side
    partial collapses each partition to ≤ types × 2^p rows) → 2^p-row
    merge → one-row estimate; the exact count is the expensive
    count-distinct shuffle the sketch exists to replace — kept here as
    the verification anchor."""
    from dampr_spark.operators.sketches import hll_estimate, hll_register

    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    reg, rho = hll_register(F.col("user_id"), _HLL_P)
    per_type = (
        e.select("event_type", reg, rho)
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    merged = per_type.groupBy("reg").agg(F.max("rho").alias("rho"))
    est = hll_estimate(merged, _HLL_P)
    exact = e.agg(F.countDistinct("user_id").alias("exact_users"))
    return est.crossJoin(F.broadcast(exact)).select(
        "exact_users",
        F.col("est_distinct").alias("est_users"),
        F.round(
            F.abs(F.col("est_distinct") - F.col("exact_users"))
            / F.col("exact_users")
            * 100,
            4,
        ).alias("err_pct"),
    )


# ---------------------------------------------------------------------------
# Grouped histogram quantile sketch (round 7)
# ---------------------------------------------------------------------------

_GHQ_PROBS = [0.5, 0.9]
_GHQ_BINS = 256


@register(
    "event_value_quantiles_by_type",
    oracle=f"""
    WITH v AS (SELECT event_type, CAST(value AS DOUBLE) AS x FROM events
               WHERE value IS NOT NULL AND event_type IS NOT NULL),
    b AS (SELECT event_type, min(x) AS lo, max(x) AS hi, count(*) AS n
          FROM v GROUP BY 1),
    h AS (SELECT v.event_type,
                 least({_GHQ_BINS - 1}, greatest(0,
                     CAST(floor((x - lo) / (hi - lo) * {_GHQ_BINS}) AS INT))) AS bucket,
                 count(*) AS cnt
          FROM v JOIN b USING (event_type) WHERE hi > lo GROUP BY 1, 2),
    c AS (SELECT event_type, bucket, cnt,
                 sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum
          FROM h),
    p AS (SELECT unnest([{", ".join(f"CAST({p} AS DOUBLE)" for p in _GHQ_PROBS)}]) AS p),
    t AS (SELECT b.event_type, p.p, b.lo, b.hi,
                 least(CAST(n AS DOUBLE),
                       greatest(CAST(1.0 AS DOUBLE), p.p * n)) AS tr
          FROM b CROSS JOIN p WHERE hi > lo),
    sel AS (SELECT t.event_type, t.p, t.lo, t.hi, t.tr, min(c.bucket) AS bkt
            FROM t JOIN c ON c.event_type = t.event_type AND c.cum >= t.tr
            GROUP BY 1, 2, 3, 4, 5),
    est AS (SELECT sel.event_type, sel.p,
                   round(lo + (hi - lo) / {_GHQ_BINS}
                         * (sel.bkt + (sel.tr - (c.cum - c.cnt)) / c.cnt), 6) AS est
            FROM sel JOIN c ON c.event_type = sel.event_type AND c.bucket = sel.bkt),
    ex AS (SELECT event_type, p.p,
                  round(CASE WHEN p.p = 0.5 THEN quantile_cont(x, 0.5)
                        ELSE quantile_cont(x, 0.9) END, 6) AS exact
           FROM v CROSS JOIN p GROUP BY 1, 2)
    SELECT est.event_type, est.p, est.est, ex.exact,
           round(abs(est.est - ex.exact), 6) AS abs_err
    FROM est JOIN ex ON ex.event_type = est.event_type AND ex.p = est.p
    """,
    tags=("events", "stats", "quantile", "sketch", "invariant", "extension"),
)
def event_value_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-TYPE value quantiles from the grouped histogram sketch
    (operators/stats.grouped_histogram_quantiles) next to the exact
    rank-recovery answer (exact_group_quantiles) — the few-huge-groups
    shape where the built-in ``percentile`` concentrates each group's
    whole value set in one merge buffer. The sketch holds ≤256 integers
    per group no matter the group's row count, merges across shards by
    count addition, and every arithmetic step replays bit-for-bit in the
    oracle; ``abs_err`` certifies the ≤-one-bin-width bound per group."""
    from dampr_spark.operators.stats import (
        exact_group_quantiles,
        grouped_histogram_quantiles,
    )

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select("event_type", "value")
    )
    est = grouped_histogram_quantiles(
        e, ["event_type"], "value", _GHQ_PROBS, _GHQ_BINS
    )
    eq = exact_group_quantiles(e, ["event_type"], "value", _GHQ_PROBS)
    exact_rows = eq.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(p)).alias("p"),
                        F.round(F.col(f"q_{i}"), 6).alias("exact"),
                    )
                    for i, p in enumerate(_GHQ_PROBS)
                ]
            )
        ).alias("s"),
    ).select("event_type", "s.p", "s.exact")
    return est.join(exact_rows, ["event_type", "p"]).select(
        "event_type",
        "p",
        "est",
        "exact",
        F.round(F.abs(F.col("est") - F.col("exact")), 6).alias("abs_err"),
    )
