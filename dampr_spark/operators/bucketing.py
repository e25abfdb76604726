"""Bucketed-table co-location: pre-shuffle once at write time so repeated
joins and aggregations on the bucket key run with ZERO exchanges.

This is the 100 TB join strategy the rest of the repo's docstrings point at:
a fact table bucketed by its join key is hash-partitioned **on disk**, so
every subsequent join against another table bucketed the same way (same key,
same bucket count) satisfies both sides' distribution requirements from the
scan — no shuffle, no sort if ``sort_cols`` matched the join key at write
time. For a table joined N times per day, one write-time shuffle amortizes N
read-time shuffles of the full fact table.

The reference engine has no equivalent (its joins always re-partition both
sides — dampr/base.py:260-335); this is a capability Spark's storage layer
adds, exposed here as thin, explicit helpers.

Rules of thumb encoded below:
- bucket count is fixed at write time; pick it for the TARGET scale
  (``n_buckets ≈ table_size / 128 MB``) — too few buckets caps join
  parallelism at 100 TB, too many makes small files at 100 GB.
- both join sides must agree on (key, n_buckets) or Spark shuffles the
  mismatched side anyway; ``write_bucketed`` therefore takes the bucket
  count explicitly rather than guessing.
- bucket pruning: an equality filter on the bucket key scans 1/n_buckets of
  the files — free predicate pushdown at the file level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: str | list[str],
    n_buckets: int,
    sort_cols: str | list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed by ``keys``.

    ``sort_cols`` (default: the bucket keys) additionally sorts rows within
    each bucket file, which lets a later sort-merge join on the same key skip
    its Sort as well as its Exchange. ``path`` makes the table external
    (files live there; the metastore only records the location).

    The write repartitions on the bucket keys first — same Murmur3 hash as
    the bucket assignment — so each bucket lands in exactly ONE file. This
    matters twice over: P input partitions would otherwise write up to P
    files *per bucket* (the small-files explosion at 100 TB), and Spark only
    treats a bucket as pre-sorted (eliding the sort-merge join's Sort) when
    the bucket is a single file.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    sort_cols = (
        keys if sort_cols is None
        else [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    )
    writer = (
        df.repartition(n_buckets, *keys)
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *keys)
        .sortBy(*sort_cols)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table. The bucket spec travels with the catalog
    entry, so Catalyst knows the scan's output partitioning — that metadata
    (not this function) is what elides the exchanges downstream."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.

    Plain ``.join`` — the point is what's ABSENT from the physical plan:
    with both tables bucketed on ``on`` with equal bucket counts there is no
    Exchange on either side (locked by tests/test_bucketing.py). At 100 TB
    that's the difference between a join that moves 2×|fact| bytes over the
    network and one that moves zero."""
    return read_bucketed(spark, left).join(read_bucketed(spark, right), on, how)
