"""SparkSession factory with 100 TB-minded defaults.

The reference engine hand-tunes parallelism/partitions/spill via
``dampr/settings.py:5-27`` (CPU-count workers, 91 partitions, 512 MB
watermark).  On Spark all of that is the shuffle machinery + AQE; the only
knobs we own are the ones below.  They are chosen so the same code runs on
``local[32]`` for tests and on a 1000-executor cluster unchanged:

- AQE on (runtime partition coalescing, skew-join splitting) — replaces the
  reference's static 91-partition choice with runtime re-planning.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE coalesces
  down.  On a real cluster this should be ~2-3x total cores; at 100 TB you'd
  raise ``initialPartitionNum`` instead of this code changing.
- Arrow enabled so pandas-UDF operators (the custom-operator escape hatch) use
  vectorized batch transfer rather than row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "dampr-spark",
    cpus: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (the driver's contract) or
    ``local[*]``.  All configs are safe no-ops when an existing session is
    reused (Spark ignores conf on getOrCreate of a live session).
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime coalescing + skew-join handling. At 100 TB the skew
        # splitter is what keeps a hot join key from stalling a stage.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Initial shuffle parallelism; AQE coalesces small outputs.
        .config("spark.sql.shuffle.partitions", "64")
        # Deterministic timestamp semantics for the duckdb oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Vectorized Python<->JVM transfer for pandas UDF operators.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Keep broadcast joins aggressive: dimension tables (region, nation,
        # supplier, ...) stay far below this even at large SF.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
        # reader refuses; read as long and convert in the reader
        # (sources/readers.py) — DuckDB truncates nanos→micros the same way.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Reliable-checkpoint hygiene (operators/pinning.py): when the
        # spark.dampr.checkpointDir knob routes iterative pins through
        # DataFrame.checkpoint, let the ContextCleaner GC checkpoint
        # files of collected frames. Read ONCE at SparkContext
        # construction — it cannot be enabled later at runtime.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
