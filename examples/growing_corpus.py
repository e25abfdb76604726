"""Growing-corpus maintenance — the day-2 operations story, end to end.

The reference is build-once (its SQLite Indexer has no append,
dampr/utils/indexer.py:35; its pipelines re-read raw outputs only via
``Dampr.from_dataset``). A real training-data corpus GROWS: every
arriving shard must be near-dup-checked against history BEFORE ingest,
indexes must absorb survivors without a rebuild over history, and the
blocking parameters that were right at last month's scale must be
re-audited at this month's. This example wires those pieces into one
runnable loop over a documents frame:

1. **day 0** — build the scored (BM25) index over the seed corpus and
   audit grid-dedup blocking resolution on the seed embeddings
   (``grid_resolution_audit``: the coarsest resolution whose densest
   cell fits the cap gets ``recommended``).
2. **a new shard arrives** — ``incremental_minhash_pairs`` screens it
   against HISTORY asymmetrically (new-bands ⋈ history-bands; history
   is never self-joined, so the check costs |new| x bucket-hit-rate).
   Docs with a historical near-dup are dropped at the door.
3. **ingest survivors** — ``Indexer.append_scored`` adds ONE immutable
   shard (the batch pays only its own tokenize+shuffle); BM25 search
   spans old+new immediately because corpus statistics aggregate over
   the sharded sidecar at query time.
4. **compact when fragmented** — ``Indexer.compact`` folds shards once
   enough small ones accumulate (full token re-shuffle — scheduled
   maintenance, never a correctness requirement).
5. **re-audit resolution at the grown scale** — the round-9 100x proof
   (benchmarks/grid_dedup_scale_proof_100x.py) measured a grid healthy
   at one scale SATURATING two decades up; the audit re-run is the
   cheap instrument that catches this before a dedup run drops work.
6. **feed a prior run's output into the next pipeline** —
   ``Dampr.from_dataset`` re-enters a ``run()`` handle, the reference's
   own between-runs idiom (dampr/dampr.py:904-912).

Scale notes: every step is bounded — the near-dup screen shuffles band
hashes (never documents), index appends shuffle one batch, compaction
is one full posting shuffle you schedule, and the audits aggregate a
<= buckets^dims-row cell table. Nothing in the loop re-touches history
except the deliberate compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dampr_spark.api import Dampr
from dampr_spark.operators.dedup import incremental_minhash_pairs
from dampr_spark.operators.indexer import Indexer
from dampr_spark.operators.similarity import grid_resolution_audit


def screen_new_shard(
    new_docs: DataFrame, history: DataFrame, **lsh_kwargs
) -> tuple[DataFrame, int]:
    """Drop arriving docs that near-dup anything in history; returns
    (survivors, n_dropped). The pair check is asymmetric LSH — history
    is never self-joined."""
    dup_ids = (
        incremental_minhash_pairs(new_docs, history, **lsh_kwargs)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    survivors = new_docs.join(dup_ids, "doc_id", "left_anti")
    return survivors, dup_ids.count()


def grow(
    spark: SparkSession,
    index_root: str,
    seed_docs: DataFrame,
    shards: list[DataFrame],
    compact_every: int = 4,
) -> dict:
    """Run the maintenance loop; returns a report dict the caller can
    assert on (and a human can read)."""
    ix = Indexer(index_root).build_scored(seed_docs)
    history = seed_docs
    report = {"ingested": [], "dropped": [], "compactions": 0}

    for i, shard in enumerate(shards):
        survivors, n_dropped = screen_new_shard(shard, history)
        n_in = survivors.count()
        if n_in:
            ix.append_scored(survivors)
        history = history.unionByName(survivors)
        report["ingested"].append(n_in)
        report["dropped"].append(n_dropped)
        # Maintenance compaction once small shards accumulate: lookups
        # stay correct either way; this bounds per-query shard fan-out.
        if len(ix._shard_ids(spark, index_root)) >= compact_every:
            ix.compact(spark)
            report["compactions"] += 1

    report["n_shards_final"] = len(ix._shard_ids(spark, index_root))
    report["history_docs"] = history.count()
    report["index"] = ix
    report["history"] = history
    return report


def resolution_checkpoint(embeddings: DataFrame) -> int | None:
    """The blocking-knob audit: returns the recommended dims (None when
    every candidate saturates — the signal to move to LSH blocking)."""
    rec = [
        r.dims
        for r in grid_resolution_audit(embeddings).collect()
        if r.recommended
    ]
    return int(rec[0]) if rec else None


def reenter_prior_run(values: list) -> list:
    """The reference's between-runs idiom via Dampr.from_dataset: a prior
    run()'s ValueEmitter feeds the next pipeline."""
    first = Dampr.memory(values).map(lambda v: v * 10).run()
    second = Dampr.from_dataset(first).map(lambda v: v + 1).run()
    return sorted(second.read())


def grow_vector_store(
    spark: SparkSession,
    store_root: str,
    seed_vecs: DataFrame,
    batches: list[DataFrame],
    n_lists: int = 8,
    nprobe: int = 3,
) -> dict:
    """The VECTOR-side maintenance loop (round 12 — the IVF twin of
    :func:`grow`): fit the coarse quantizer ONCE on the seed, init the
    shard store, then per arriving batch (a) append one immutable shard
    assigned to the frozen centroids (one Arrow pass over the batch,
    never a pass over history) and (b) re-price the accumulated list
    depths with ``ivf_store_audit`` — its ~sqrt(N) octave rule is the
    re-fit trigger, the exact signal the 100x proof's stale-config cliff
    showed up without. Searches over the store prune to the probed
    ``list_id`` directories across every shard."""
    from dampr_spark.operators.similarity import IVFIndex, ivf_store_audit

    ivf = IVFIndex(n_lists=n_lists, nprobe=nprobe).fit(seed_vecs)
    ivf.init_store(seed_vecs, store_root)
    report = {"appended": [], "refit_flags": []}
    for batch in batches:
        ivf.append_shard(batch, store_root)
        audit = ivf_store_audit(
            spark, store_root, n_lists=n_lists, nprobe=nprobe
        ).first()
        report["appended"].append(int(audit.n_vecs))
        report["refit_flags"].append(bool(audit.refit_recommended))
    report["n_shards"] = len(ivf.store_shard_ids(spark, store_root))
    report["ivf"] = ivf
    return report
