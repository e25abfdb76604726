"""Temporal join operators: as-of and range joins.

The reference supports equi-joins only (SURVEY §2.5 — "no theta/range/
as-of"); these are the extension layer for event-time analytics.

Scale design:

- :func:`asof_join` uses the union+window construction: tag both sides,
  union on (keys, ts), and per key take the running ``last`` right-side
  payload in time order. ONE shuffle+sort over left+right combined and no
  intermediate row explosion — unlike the naive range-join-then-argmax,
  whose intermediate size is |matches within horizon| (unbounded for slow
  keys). This is the standard large-scale as-of recipe (the same shape
  databases compile ASOF JOIN to when both sides are big).
- :func:`range_join` is the bounded-interval equi+range join: Spark
  executes it as a sort-merge/shuffled-hash join on the equi keys with the
  range as a post-join predicate; keep the interval tight — output (and at
  scale, skew) grows with the horizon.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the as-of matching right row per key —
    null columns when no match exists (left-outer semantics). The full
    pandas ``merge_asof`` direction surface:

    - ``backward`` (default): most recent right row with
      ``right.ts <= left.ts``;
    - ``forward``: earliest right row with ``right.ts >= left.ts``;
    - ``nearest``: whichever of the two is closer in time, ties preferring
      the backward match.

    ``tolerance`` (optional) bounds the match distance: a SQL interval
    string (timestamp ts) or a number (numeric ts); matches farther than
    the tolerance null out, preserving left-outer shape. All directions
    keep the union+window construction — ONE shuffle+sort per direction,
    no row explosion (``nearest`` costs a second window sort over the same
    partitioning, not a second shuffle).

    ``right_cols`` are the right-side columns to carry (default: all but
    keys/ts), emitted as ``{prefix}{col}`` plus ``{prefix}{ts_col}``.

    Tie-break and orderability contract: when several right rows share the
    same (key, ts), the winner is the MAXIMUM payload struct under Spark's
    struct ordering over ``(ts_col, *right_cols)`` — deterministic across
    partitionings and engines (this is what lets the DuckDB oracle hash-match;
    an arbitrary-winner tie-break would flake). The cost of that determinism
    is that every carried right column must be an orderable type: a map-typed
    (or other unorderable) column in ``right_cols`` raises AnalysisException
    at the window sort. Exclude such columns via ``right_cols``, or wrap them
    (e.g. ``to_json``) before the join, and the guarantee degrades only for
    exact (key, ts) ties.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*on, ts_col)]

    rpay = F.struct(
        F.col(ts_col).alias(ts_col), *[F.col(c).alias(c) for c in right_cols]
    )
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            right.select(rpay.alias("p")).schema["p"].dataType
        ).alias("_rpay"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        F.lit(0).alias("_side"),
        rpay.alias("_rpay"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c not in (*on, ts_col)
        ],
    ).select(l_tagged.columns)  # align column order for union

    # Right rows (_side=0) sort before left rows at equal ts → inclusive
    # (backward: right.ts <= left.ts; forward: right.ts >= left.ts under
    # the reversed ordering). The running `last` of the right payload is
    # the as-of match; one window sort per key, no row multiplication. The
    # trailing `_rpay` orders right rows that tie on (key, ts) by the full
    # payload struct, so the winner is deterministic across partitionings
    # (left rows carry a null payload; `_side` already separates them).
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction}")
    union = l_tagged.unionByName(r_tagged)
    frame = (Window.unboundedPreceding, Window.currentRow)
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col), F.col("_side"), F.col("_rpay"))
        .rowsBetween(*frame)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).desc(), F.col("_side"), F.col("_rpay"))
        .rowsBetween(*frame)
    )
    if direction == "backward":
        matched = union.withColumn(
            "_asof", F.last("_rpay", ignorenulls=True).over(w_back)
        )
    elif direction == "forward":
        matched = union.withColumn(
            "_asof", F.last("_rpay", ignorenulls=True).over(w_fwd)
        )
    else:  # nearest: both runs over the SAME partitioning, pick the closer
        matched = union.withColumn(
            "_b", F.last("_rpay", ignorenulls=True).over(w_back)
        ).withColumn("_f", F.last("_rpay", ignorenulls=True).over(w_fwd))
        d_b = F.col(ts_col) - F.col(f"_b.{ts_col}")
        d_f = F.col(f"_f.{ts_col}") - F.col(ts_col)
        take_fwd = F.col("_f").isNotNull() & (
            F.col("_b").isNull() | (d_f < d_b)
        )
        matched = matched.withColumn(
            "_asof", F.when(take_fwd, F.col("_f")).otherwise(F.col("_b"))
        )
    if tolerance is not None:
        tol = F.expr(tolerance) if isinstance(tolerance, str) else F.lit(tolerance)
        dist = F.abs(F.col(ts_col) - F.col(f"_asof.{ts_col}"))
        matched = matched.withColumn(
            "_asof", F.when(dist <= tol, F.col("_asof"))
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col(f"_asof.{ts_col}").alias(f"{prefix}{ts_col}"))
    out_cols.extend(F.col(f"_asof.{c}").alias(f"{prefix}{c}") for c in right_cols)
    return matched.filter(F.col("_side") == 1).select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "INTERVAL 1 HOUR",
    inclusive_upper: bool = True,
) -> DataFrame:
    """Equi+interval join: pairs where ``left_ts - lower < right_ts
    (<=|<) left_ts`` per key. Column name collisions are the caller's to
    manage (alias the sides first)."""
    lts, rts = F.col(left_ts), F.col(right_ts)
    upper_pred: Column = rts <= lts if inclusive_upper else rts < lts
    return left.join(
        right,
        [*(left[c] == right[c] for c in on), upper_pred, rts > lts - F.expr(lower)],
    )
