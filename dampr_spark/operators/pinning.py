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


def pin_once(df: DataFrame, eager: bool = True) -> DataFrame:
    """One-shot pin for corpus-sized multi-consumer frames OUTSIDE
    fixpoint loops (the round-13 sweep: plans/ no longer calls raw
    ``localCheckpoint`` on corpus-sized frames, so the reliable-
    checkpoint knob covers the package's most expensive queries).

    Knob unset (default): plain ``localCheckpoint`` — ONE materialization
    pass, bit-identical behavior and cost to the raw call it replaces
    (measured: routing one-shot pins through :func:`pin`'s persist-first
    path cost a second full pass per site — 3.98x on
    ``source_similarity_cosine`` — for no benefit, because the stats
    snowball only compounds in loops and localCheckpoint doesn't
    recompute the plan the way reliable ``checkpoint`` does).

    Knob set: route through :func:`pin` — persist-first reliable
    ``checkpoint`` into the shared store; the extra materialization pass
    is the price of executor-loss survivability the caller asked for."""
    if reliable_checkpoint_dir(df.sparkSession) is None:
        return df.localCheckpoint(eager=eager)
    return pin(df, eager=eager)


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Pin an iterative-chain frame: truncate lineage and materialize.

    Default: ``localCheckpoint`` (executor-local blocks). With the
    reliable-checkpoint knob set (see module docstring): reliable
    ``checkpoint`` into the configured directory — the SparkContext's
    checkpoint dir is set lazily on first use so sessions that never pin
    reliably never need the directory to exist.

    BOTH eager paths persist + materialize BEFORE checkpointing, for two
    measured reasons:

    1. ``checkpoint()`` recomputes the plan to write its files unless
       the frame is cached (ADVICE r11) — without the persist every
       fixpoint round paid ~2x compute.
    2. **The Catalyst stats snowball (round 12, measured and fixed):**
       ``Dataset.checkpoint`` snapshots the origin plan's STATISTICS
       into the new leaf, and ``sizeInBytes`` of a join is the PRODUCT
       of its children's — so in a fixpoint whose round references the
       pinned frame k>=2 times (connected components references labels
       3x), each round's snapshot raises the previous round's
       BigInteger to the k-th power. The number's BIT LENGTH grows
       k-fold per round, and past ~18 rounds the driver spends its time
       in BigInteger.multiply (jstack-verified: 169 s of ToomCook3 in a
       71 s round; the 30-round CC fixpoint on a 50k-edge graph took
       20+ minutes and was still diverging). Materializing a cache
       first makes the snapshot read InMemoryRelation's REAL byte size
       — small and constant — so every round's leaf stats reset
       (measured: 7 digits forever, the same fixpoint in 26 s). The
       eager checkpoint then drains from the cache and the blocks are
       dead weight: unpersist.

    Already-persisted inputs (ADVICE r12): a caller pinning a frame it
    has ALREADY persisted for its own multi-consumer reuse must keep its
    cache — ``persist()`` on such a frame is a no-op on the existing
    entry, so an unconditional unpersist here would silently evict the
    caller's cache and force recompute downstream. When the input's
    storage level shows it is persisted, pin() only materializes
    (count) and checkpoints; the caller keeps ownership of its cache."""
    spark = df.sparkSession
    d = reliable_checkpoint_dir(spark)
    if not eager:
        # Lazy pins can't pre-materialize; they are only used for
        # frames consumed once, outside fixpoint loops.
        return (
            df.localCheckpoint(eager=False)
            if d is None
            else df.checkpoint(eager=False)
        )
    if d is not None:
        sc = spark.sparkContext
        current = None
        try:
            current = sc.getCheckpointDir()
        except Exception:
            pass
        if not current or not str(current).startswith(str(d)):
            sc.setCheckpointDir(d)
    lvl = df.storageLevel
    caller_owns_cache = bool(lvl.useMemory or lvl.useDisk)
    cached = df if caller_owns_cache else df.persist()
    try:
        cached.count()  # materialize: real InMemoryRelation stats + no
        # recompute during the checkpoint write
        return (
            cached.localCheckpoint(eager=True)
            if d is None
            else cached.checkpoint(eager=True)
        )
    finally:
        if not caller_owns_cache:
            cached.unpersist(False)
