"""Skew-mitigation operators for hot keys at scale.

Where each tool applies (the 100 TB decision tree):

- **Associative group-by aggregation** (sum/count/min/...): nothing needed —
  Catalyst's partial aggregation collapses hot keys map-side before the
  shuffle.
- **Sort-merge join skew**: AQE's skew-join splitting
  (``spark.sql.adaptive.skewJoin.enabled``, on in our session defaults)
  splits oversized partitions at runtime.
- **Broadcastable small side**: ``F.broadcast`` — no shuffle at all.
- **Everything else** — a large⋈large join AQE can't fix (e.g. a
  broadcast-too-big build side concentrated on few keys), or a
  non-associative aggregation (collect_list/collect_set) whose hot-key
  groups OOM a reducer — needs *salting*, provided here:

:func:`salted_join` replicates each right row ``n_salts`` times and sprays
left rows across salts, turning one hot-key partition into ``n_salts``
even ones at the price of an ``n_salts``× blow-up of the right side (use on
a pre-filtered/projected right side).

:func:`salted_collect_list` runs collect in two phases: per (key, salt)
partial lists, then flatten per key — each reducer sees at most
``|hot key| / n_salts`` rows in phase 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys: left rows get a uniform salt in
    [0, n_salts); right rows are exploded to every salt, so each (key, salt)
    shuffle partition holds ~1/n_salts of a hot key's left rows. Result
    equals ``left.join(right, on, how)`` for 'inner'/'left' (row-for-row;
    the salt column is dropped).

    The salt is ``pmod(xxhash64(monotonically_increasing_id()), n)`` —
    deterministic within a run, uniform, and independent of the join keys
    (hash-of-key salting would re-concentrate the hot key)."""
    assert how in ("inner", "left"), "salted_join supports inner/left"
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(r_salted, [*on, "_salt"], how).drop("_salt")


def salted_collect_list(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase collect_list for hot keys: phase 1 collects per
    (key, salt) — bounding any single reducer's group to ~1/n_salts of the
    hot key — phase 2 flattens the partial lists per key. Output schema:
    key columns + ``values: array<value type>`` (order within the list is
    not defined, matching collect_list's own non-determinism)."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.collect_list(value_col).alias("_part"))
    )
    return (
        partial.groupBy(*key_cols)
        .agg(F.flatten(F.collect_list("_part")).alias("values"))
    )


def bucketed_range_window(
    df: DataFrame,
    keys: list[str],
    ts_us_col,
    range_us: int,
    cols_fn,
):
    """Skew-safe trailing RANGE-frame window: two-phase time bucketing for
    hot window-partition keys.

    ``Window.partitionBy(user)`` puts EVERY row of a hot user into one task
    — and unlike join skew, AQE cannot split a window partition at runtime
    (frames may span any split point), so one influencer-scale user bounds
    the whole stage (measured: 3.6x max-task blowup with one user holding
    9% of events — benchmarks/RESULTS.md round-5 spot-proof). This operator
    splits the partition by TIME instead, which is semantics-preserving for
    a trailing frame:

    - each row lands in bucket ``floor(ts/range_us)`` as an *own* row and is
      replicated into the NEXT bucket as a *context* row;
    - the window runs over ``(keys..., bucket)`` — a trailing frame of width
      ``range_us`` at any own row can only reach rows of its own and the
      previous bucket, all of which are present;
    - only own rows are emitted, so each input row appears exactly once.

    Cost: a bounded 2x row replication before the shuffle buys an upper
    bound of (events of one key in 2*range_us) per task, independent of how
    hot the key is. Use when a key can exceed ~10^5 rows; the plain window
    is cheaper otherwise.

    ``ts_us_col``: numeric (microsecond-epoch) ordering column expression.
    ``cols_fn(window)``: dict of output name -> Column over the provided
    window spec — the same aggregates you would put over the plain window.
    """
    from pyspark.sql.window import Window

    reserved = {"_ts_us", "_bucket", "_own"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"bucketed_range_window reserves columns {sorted(reserved)}; "
            "rename them on the input frame"
        )
    ts = ts_us_col if isinstance(ts_us_col, Column) else F.col(ts_us_col)
    own = df.withColumn("_ts_us", ts).withColumn(
        "_bucket", _floor_div("_ts_us", range_us)
    ).withColumn("_own", F.lit(True))
    ctx = df.withColumn("_ts_us", ts).withColumn(
        "_bucket", _floor_div("_ts_us", range_us) + 1
    ).withColumn("_own", F.lit(False))
    u = own.unionByName(ctx)
    w = (
        Window.partitionBy(*keys, "_bucket")
        .orderBy("_ts_us")
        .rangeBetween(-range_us, 0)
    )
    out = u.select(
        *df.columns,
        "_own",
        *[c.alias(n) for n, c in cols_fn(w).items()],
    )
    return out.filter(F.col("_own")).drop("_own")


def _floor_div(col_name: str, divisor: int) -> Column:
    """Exact integer floor division of a long column — never a double
    divide, which silently corrupts past 2^53 (the grid-audit lesson from
    round 10's ADVICE: a ns-epoch ordering column would overflow a double
    floor). pmod makes the numerator an exact nonnegative-remainder
    multiple, so SQL `div` (truncating) IS floor, including for negative
    timestamps. Valid domain: c > LONG_MIN + divisor — the `c - pmod`
    adjustment would wrap for values within `divisor` of Long.MIN_VALUE
    (never reachable for epoch timestamps at any supported unit)."""
    c = F.col(col_name)
    adj = c - F.pmod(c, F.lit(divisor))
    return (adj.cast("decimal(38,0)") / F.lit(divisor)).cast("long")


def window_frame_audit(
    df: DataFrame,
    keys: list[str],
    ts_us_col,
    range_us: int,
) -> DataFrame:
    """Price a trailing RANGE-frame window BEFORE running it — the window
    family's sizing instrument, completing the audit set
    (`grid_resolution_audit`, `lsh_band_audit`,
    `contamination_posting_audit`: every family with a saturation mode
    gets a one-linear-pass go/no-go report).

    A window's two scale killers are (1) PARTITION mass — ``Window
    .partitionBy(keys)`` puts every row of a hot key into ONE task, and
    AQE cannot split a window partition (frames may span any split
    point) — and (2) FRAME mass — Spark's sliding RANGE frame
    re-aggregates the buffered frame per row, so dense keys pay
    ~Σ |frame(i)| row-visits, quadratic in within-range density. Both
    are priced here from one per-(key, time-bucket) count rollup
    (bucket width = ``range_us``, the frame's own width — a trailing
    frame at any row reaches only its own and the previous bucket):

    - ``n_rows`` / ``n_keys`` — corpus shape;
    - ``max_key_rows`` — the plain window's largest partition (its
      single-task floor), with ``skew_ratio`` = max/mean;
    - ``n_buckets`` — occupied (key, bucket) pairs;
    - ``max_bucket_task_rows`` — max(own + previous-bucket context), the
      largest partition of :func:`bucketed_range_window`'s layout: what
      the remedy buys, BEFORE paying its 2x replication;
    - ``est_frame_rows`` — Σ n·(n + prev) over buckets, an upper bound
      on the plain layout's total frame row-visits. The bucketed layout
      additionally evaluates frames for the replicated context rows it
      later filters out, so its realized row-visits can exceed this
      bound (capped by the 2x replication); what bucketing buys is the
      per-TASK bound (``max_bucket_task_rows``), not total work.

    Mechanics mirror `join_key_skew_report` (one map-side-combinable
    count per key×bucket, then bounded rollups): linear in the corpus,
    no window over row-level data, no join. At 100 TB this costs one
    shuffle of bucket counts — the cheapest possible look before a
    window stage that a hot key would otherwise stall."""
    from pyspark.sql.window import Window

    ts = ts_us_col if isinstance(ts_us_col, Column) else F.col(ts_us_col)
    notnull = df
    for k in keys:
        notnull = notnull.filter(F.col(k).isNotNull())
    b = (
        notnull.select(*keys, ts.alias("_ts_us"))
        .select(*keys, _floor_div("_ts_us", range_us).alias("_bucket"))
        .groupBy(*keys, "_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(*keys).orderBy("_bucket")
    p = b.select(
        *keys,
        "n",
        F.when(
            F.lag("_bucket").over(w) == F.col("_bucket") - 1,
            F.lag("n").over(w),
        )
        .otherwise(F.lit(0))
        .alias("prev"),
    )
    per_key = p.groupBy(*keys).agg(
        F.sum("n").alias("key_rows"),
        F.count(F.lit(1)).alias("key_buckets"),
        F.max(F.col("n") + F.col("prev")).alias("key_max_task"),
        F.sum(F.col("n") * (F.col("n") + F.col("prev"))).alias("key_frame"),
    )
    return per_key.agg(
        F.sum("key_rows").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("key_rows").cast("long").alias("max_key_rows"),
        F.round(
            F.max("key_rows")
            / (F.sum("key_rows").cast("double") / F.count(F.lit(1))),
            6,
        ).alias("skew_ratio"),
        F.sum("key_buckets").cast("long").alias("n_buckets"),
        F.max("key_max_task").cast("long").alias("max_bucket_task_rows"),
        F.sum("key_frame").cast("long").alias("est_frame_rows"),
    )
