"""Iterative-chain pinning with a reliable-checkpoint knob (round 11,
VERDICT r10 #4).

Every fixpoint/iterative operator in this package pins its per-round
state so round N's plan doesn't nest N rounds of lineage. The default
pin is ``localCheckpoint(eager=True)`` — cheapest on a healthy cluster,
but its blocks live on EXECUTOR-LOCAL disk: under dynamic allocation or
an executor loss, a lost block is unrecoverable (the truncated lineage
cannot recompute it) and the job dies. SCALING.md lists this as a known
cliff for the long iterative chains (connected components, k-means,
PageRank/LPA/k-core/BFS, DSIR's eager ratio pin).

The knob: set either

- ``spark.conf.set("spark.dampr.checkpointDir", "<shared path>")``, or
- the ``DAMPR_SPARK_CHECKPOINT_DIR`` environment variable

and every iterative pin routes through RELIABLE ``DataFrame.checkpoint``
instead — blocks written to the configured directory (HDFS/S3/NFS on a
real cluster), survivable across executor loss, with the same
lineage-truncation semantics (round N reads round N-1's files, never
replays rounds 1..N-1 — pinned by tests/test_round11_fixes.py). Default
behavior is unchanged: no knob, no reliable store required, local pins.

Checkpoint-file hygiene: each round leaves one copy of round state in
the shared store. Spark's ContextCleaner deletes a collected frame's
checkpoint files only when
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` — a conf read
ONCE at SparkContext construction, so it must be set at session build
(``session.get_spark`` sets it by default); setting it later is a
no-op. Without it, a thousand-round fixpoint accumulates a thousand
round-state copies until the run directory is removed.

Deliberately NOT routed through this module: the bounded small-table
pins (audit stats tables, broadcast model frames — a few rows, rebuilt
in milliseconds if lost) where reliable-store round-trips would cost
more than recomputation. The knob targets the chains whose recompute is
the whole job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_CONF_KEY = "spark.dampr.checkpointDir"
_ENV_KEY = "DAMPR_SPARK_CHECKPOINT_DIR"


def reliable_checkpoint_dir(spark) -> str | None:
    """The configured reliable checkpoint dir, or None (default)."""
    try:
        d = spark.conf.get(_CONF_KEY, None)
    except Exception:
        d = None
    return d or os.environ.get(_ENV_KEY) or None


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Pin an iterative-chain frame: truncate lineage and materialize.

    Default: ``localCheckpoint`` (executor-local blocks). With the
    reliable-checkpoint knob set (see module docstring): reliable
    ``checkpoint`` into the configured directory — the SparkContext's
    checkpoint dir is set lazily on first use so sessions that never pin
    reliably never need the directory to exist."""
    spark = df.sparkSession
    d = reliable_checkpoint_dir(spark)
    if d is None:
        return df.localCheckpoint(eager=eager)
    sc = spark.sparkContext
    current = None
    try:
        current = sc.getCheckpointDir()
    except Exception:
        pass
    if not current or not str(current).startswith(str(d)):
        sc.setCheckpointDir(d)
    if eager:
        # checkpoint() RECOMPUTES the plan to write its files unless the
        # frame is cached — without this persist every fixpoint round
        # paid ~2x compute (ADVICE r11). The eager write drains from the
        # cache, after which the blocks are dead weight: unpersist.
        df = df.persist()
        try:
            return df.checkpoint(eager=True)
        finally:
            df.unpersist(False)
    return df.checkpoint(eager=False)
