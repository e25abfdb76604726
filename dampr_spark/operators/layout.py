"""Data-layout operators: multi-dimensional clustering for scan pruning.

A 100 TB table is pruned, not scanned: partition pruning and parquet
row-group min/max skipping only help when rows that are queried together are
STORED together. Sorting by one column clusters one dimension and destroys
the other; the Z-order (Morton) curve interleaves the bits of several
columns so that rows close in ALL dimensions land close on the curve — the
layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``, re-expressed here
as plain Spark: compute ``z_value``, range-partition + sort by it, write.

Everything is exact integer bit arithmetic (no RNG, no hash seeds), so the
curve itself is DuckDB-oracle-checkable; the pruning payoff is plan-locked
in tests (a 2-D box query over a z-bucket-partitioned write reads a strict
subset of partitions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of the low ``bits`` bits of two non-negative
    integer columns: x's bit i lands at position 2i, y's at 2i+1. Bit fields
    are disjoint, so the OR-accumulation is a plain sum — one flat codegen
    expression of shifts and masks, no UDF."""
    x = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    y = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        out = out + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return out


def z_value_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical interleave as ANSI SQL (DuckDB oracle twin)."""
    xm = f"(CAST({x} AS BIGINT) & {(1 << bits) - 1})"
    ym = f"(CAST({y} AS BIGINT) & {(1 << bits) - 1})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xm} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ym} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_by(
    df: DataFrame, col_x: str, col_y: str, n_partitions: int, bits: int = 16
) -> DataFrame:
    """Cluster a DataFrame along the Z-curve of two columns: range-partition
    on the z-value (so each output file owns a contiguous curve segment —
    that is what gives every file a TIGHT min/max envelope in both
    dimensions) and sort within partitions (row-group-level skipping inside
    each file). Write the result with ``.write.parquet`` and 2-D box
    queries prune at file AND row-group granularity.

    The z column is kept (callers may drop it after writing); the shuffle is
    the one range exchange any clustering rewrite costs — paid once at
    write, repaid every scan."""
    with_z = df.withColumn("z", z_value(F.col(col_x), F.col(col_y), bits))
    return with_z.repartitionByRange(n_partitions, "z").sortWithinPartitions("z")


def z_bucket(x: Column, y: Column, bits: int = 16, bucket_bits: int = 8) -> Column:
    """Coarse curve segment id (the TOP ``bucket_bits`` of the z-value) for
    DIRECTORY partitioning: `partitionBy(z_bucket)` makes the 2-D locality
    visible to Spark's partition pruner, turning a box query into a
    partition-filter range scan over the few curve segments that intersect
    the box."""
    return F.shiftright(z_value(x, y, bits), 2 * bits - bucket_bits)


def compact_parquet(
    spark, path: str, target_mb: int = 128, sort_col: str | None = None
) -> int:
    """Small-file compaction — the table-maintenance pass every
    continuously-ingested 100 TB dataset needs (streaming sinks and
    per-batch appends leave thousands of KB-sized files; each costs a task,
    a footer read, and an open/close at every scan). Rewrites ``path`` to
    ceil(bytes / target_mb) files, optionally re-sorting by ``sort_col``
    (e.g. the z-value) so compaction re-establishes clustering instead of
    destroying it. Returns the new file count.

    Rewrite is write-new-then-swap: the live directory is never modified
    until the replacement is fully written, so a crash during the WRITE
    loses nothing. The swap itself is two renames — a crash in that narrow
    window leaves the complete old table at ``path + '.old'`` — and a
    re-run RECOVERS it automatically: on entry, if ``path`` is missing but
    ``.old`` exists (the mid-swap crash signature), ``.old`` is renamed
    back before anything is deleted. ``.old`` is only treated as stale
    (and removed) when ``path`` itself exists; ``.compact`` leftovers are
    always stale and cleared up front (a pre-existing ``.old`` would
    otherwise make ``shutil.move`` NEST the live table inside it instead
    of replacing it)."""
    import math
    import os
    import shutil

    out = path.rstrip("/") + ".compact"
    old = path.rstrip("/") + ".old"
    if not os.path.exists(path) and os.path.exists(old):
        # Crash landed between the two swap renames: the live table exists
        # only at .old. Restore it — deleting .old here would lose the data.
        shutil.move(old, path)
    if os.path.exists(out):
        shutil.rmtree(out)
    if os.path.exists(old) and os.path.exists(path):
        shutil.rmtree(old)
    df = spark.read.parquet(path)
    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / (target_mb * 1024 * 1024)))
    if sort_col is not None:
        df = df.repartitionByRange(n_files, sort_col).sortWithinPartitions(sort_col)
    else:
        df = df.coalesce(n_files)
    df.write.mode("overwrite").parquet(out)
    shutil.move(path, old)
    shutil.move(out, path)
    shutil.rmtree(old)
    return len(
        [f for dp, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")]
    )
