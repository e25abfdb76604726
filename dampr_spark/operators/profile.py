"""Dataset profiling: per-column statistics in ONE scan.

The Deequ/"data profiler" primitive every ingestion pipeline runs before
trusting a new drop: null rates, distinct counts, min/max, per column. The
naive form runs one aggregate per column (N scans of a 100 TB table); this
operator builds a single wide aggregate — every column's statistics as
struct-typed aggregate expressions in the same pass — then unpivots the one
result row into (column, stats) rows. Cost: exactly one scan and one
1-row-per-partition aggregate regardless of column count.

``approx`` distinct counts use HLL (mergeable, constant memory); ``exact``
uses count(distinct) which Spark plans as an expand + two-phase aggregate —
still one scan, but the expand multiplies rows by the column count, the
documented trade for exactness (and the DuckDB-oracle-checkable form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None, exact: bool = True) -> DataFrame:
    """One row per profiled column: ``column``, ``n_rows``, ``n_nulls``,
    ``n_distinct`` (exact or HLL-approximate), ``min_repr`` / ``max_repr``
    (string form — one schema for every column type).

    NULL semantics: min/max ignore NULLs (aggregate convention);
    ``n_distinct`` counts distinct non-null values; an all-NULL column
    yields NULL min/max and zero distinct."""
    cols = list(df.columns) if cols is None else cols
    if not cols:
        raise ValueError("cols must be None (all) or a non-empty list")
    n_distinct = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact
        # hll_sketch_agg accepts int/long/string/binary only — profile any
        # type by sketching the string form (distinct-count-preserving).
        else (lambda c: F.hll_sketch_estimate(F.hll_sketch_agg(F.col(c).cast("string"))))
    )
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.struct(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias("n_nulls"),
                n_distinct(c).cast("long").alias("n_distinct"),
                # min/max on the NATIVE type, cast after: casting first
                # would compare numerics lexicographically ("10" < "9").
                F.min(F.col(c)).cast("string").alias("min_repr"),
                F.max(F.col(c)).cast("string").alias("max_repr"),
            ).alias(f"_s_{i}")
            for i, c in enumerate(cols)
        ],
    )
    melted = agg.select(
        F.col("_n").alias("n_rows"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"), F.col(f"_s_{i}").alias("s")
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("kv"),
    )
    return melted.select(
        F.col("kv.column").alias("column"),
        "n_rows",
        F.col("kv.s.n_nulls").alias("n_nulls"),
        F.col("kv.s.n_distinct").alias("n_distinct"),
        F.col("kv.s.min_repr").alias("min_repr"),
        F.col("kv.s.max_repr").alias("max_repr"),
    )
