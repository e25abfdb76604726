"""Data-quality gates: declarative expectations evaluated as ONE aggregate
pass over the table — the validation step a production ingest runs before
anything downstream touches a shard.

No framework, just columns: an expectation is a boolean Column; ``validate``
folds any number of them into a single narrow aggregate row of violation
counts (plus total rows), so a 100 TB shard pays one scan with map-side
partial aggregation and shuffles a single row. Key-uniqueness — the one
check a row-local predicate can't express — is its own keyed aggregate
(:func:`duplicate_keys`).

Usage::

    report = validate(df, {
        "null_text": F.col("text").isNotNull(),
        "len_consistent": F.col("n_chars") == F.length("text"),
        "known_lang": F.col("lang").isin("en", "de", "fr"),
    })
    # -> one row: n_rows, v_null_text, v_len_consistent, v_known_lang

Gate semantics are the caller's: raise on any violation, or route violating
shards to quarantine with ``df.filter(~check)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One-row violation report: for each named expectation (a boolean
    Column that should be TRUE for every row), the count of rows violating
    it — NULL predicate results count as violations (an expectation that
    cannot be evaluated is not satisfied)."""
    aggs = [
        F.sum(
            F.when(F.coalesce(check, F.lit(False)), 0).otherwise(1)
        ).cast("long").alias(f"v_{name}")
        for name, check in checks.items()
    ]
    return df.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)


def duplicate_keys(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows whose key occurs more than once: (key cols..., n_copies).
    One shuffle on the key — the uniqueness expectation."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def quarantine(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Rows failing ANY expectation, tagged with the list of failed check
    names — the shard a gated ingest routes aside for inspection."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(check, F.lit(False)), F.lit(name))
                for name, check in checks.items()
            ]
        )
    )
    return df.withColumn("failed_checks", failed).filter(
        F.size("failed_checks") > 0
    )
