"""Round-13 regression pins for the r12 ADVICE fixes.

1. ``pin()`` no longer evicts a CALLER-owned cache: pinning an
   already-persisted frame materializes + checkpoints but leaves the
   caller's persist in place (ADVICE r12: the unconditional
   finally-unpersist silently evicted multi-consumer caches).
2. ``near_dup_clusters(iters="converge")`` runs min-label propagation to
   FIXPOINT (via graph.connected_components), exact on chain-shaped
   components of any diameter — the mode the oracle-replayed keep-best
   pipelines (`near_dedup_keep_best`, `curate_training_slice`) now use,
   because their DuckDB oracles compute the full recursive closure and a
   fixed iters=3 diverges on chains deeper than 3 hops (ADVICE r12).
3. ``_incr_store_root`` is per-process: concurrent runs at the same scale
   factor can no longer race one fixed store path (ADVICE r12).
4. ``streaming._checkpoint_loc`` strips trailing separators so the
   checkpoint dir is always the SIBLING ``<out>_checkpoint``, never a
   child of the sink that its readers would parse as data (ADVICE r12).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------------------
# 1. pin() preserves a caller-owned persist
# ---------------------------------------------------------------------------


def test_pin_keeps_caller_owned_cache(spark):
    from dampr_spark.operators.pinning import pin

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    df.persist()
    try:
        df.count()
        assert df.storageLevel.useMemory  # caller's cache is live
        pinned = pin(df)
        assert pinned.count() == 100
        # The caller's cache survives the pin (pre-fix: finally-unpersist
        # evicted it because persist() was a no-op on the existing entry).
        assert df.storageLevel.useMemory or df.storageLevel.useDisk
    finally:
        df.unpersist()


def test_pin_unpersists_its_own_cache(spark):
    from dampr_spark.operators.pinning import pin

    df = spark.range(50).withColumn("v", F.col("id") + 1)
    assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)
    pinned = pin(df)
    assert pinned.count() == 50
    # pin()'s internal persist is drained and released: the input frame
    # is not left cached behind the caller's back.
    assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)


# ---------------------------------------------------------------------------
# 2. converge mode: exact components on deep chains
# ---------------------------------------------------------------------------

_CHAIN = [(i, i + 1) for i in range(1, 7)]  # path 1-2-3-4-5-6-7, diameter 6


@pytest.mark.parametrize("max_driver_edges", [50_000, 0])
def test_near_dup_clusters_converge_deep_chain(spark, max_driver_edges):
    from dampr_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame(_CHAIN, "id_a long, id_b long")
    labels = {
        r.id: r.canonical
        for r in near_dup_clusters(
            pairs, iters="converge", max_driver_edges=max_driver_edges
        ).collect()
    }
    assert labels == {i: 1 for i in range(1, 8)}


def test_near_dup_clusters_fixed_iters_diverges_on_deep_chain(spark):
    # The latent gap converge mode closes: 3 propagation rounds cannot
    # reach across a diameter-6 path, so the far end keeps a non-min
    # label. If this ever starts passing with iters=3 the converge mode
    # is no longer load-bearing — re-evaluate before removing it.
    from dampr_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame(_CHAIN, "id_a long, id_b long")
    labels = {
        r.id: r.canonical
        for r in near_dup_clusters(pairs, iters=3).collect()
    }
    assert labels != {i: 1 for i in range(1, 8)}


def test_drop_near_dups_keep_best_converge_keeps_one_per_chain(spark):
    """Keep-best over a diameter-6 chain whose best-quality member sits at
    the far end: converge mode collapses the chain to exactly that one
    survivor (plus the unclustered singleton)."""
    from dampr_spark.operators.dedup import drop_near_dups_keep_best

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 8)] + [(99, 0.0)],
        "doc_id long, q double",
    )
    pairs = spark.createDataFrame(_CHAIN, "id_a long, id_b long")
    kept = sorted(
        r.doc_id
        for r in drop_near_dups_keep_best(
            df, pairs, F.col("q"), iters="converge"
        ).collect()
    )
    assert kept == [7, 99]  # q=7.0 wins the whole chain; 99 unclustered


# ---------------------------------------------------------------------------
# 2b. the pin() sweep (VERDICT r12 #1): corpus-sized frames in plans/ go
# through operators/pinning.pin so the reliable-checkpoint knob covers the
# package's most expensive one-shot queries; every REMAINING raw
# localCheckpoint site must self-document boundedness.
# ---------------------------------------------------------------------------


def test_plans_raw_localcheckpoint_sites_are_bounded():
    """Audit: any raw ``.localCheckpoint(`` left in plans/ must carry a
    ``bounded`` marker in a trailing comment within two lines — the
    module doctrine (pinning.py) exempts only bounded small-table pins
    from the reliable-checkpoint knob. Corpus-sized frames must route
    through ``pin()`` (``.transform(_pin)``)."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "dampr_spark", "plans")
    offenders = []
    for f in sorted(glob.glob(os.path.join(root, "*.py"))):
        lines = open(f).read().splitlines()
        for i, line in enumerate(lines):
            if ".localCheckpoint(" not in line:
                continue
            window = " ".join(lines[i : i + 3])
            if "bounded" not in window:
                offenders.append(f"{os.path.basename(f)}:{i + 1}")
    assert not offenders, (
        "raw localCheckpoint without a 'bounded' marker (route corpus-"
        f"sized pins through pinning.pin): {offenders}"
    )


def test_capstone_pin_writes_reliable_checkpoint_with_knob(spark, sf_dir, tmp_path):
    """With ``spark.dampr.checkpointDir`` set, the capstone's corpus-sized
    exact-survivor pin writes RELIABLE checkpoint files into the
    configured directory (pre-sweep it used raw localCheckpoint, which the
    knob could not reach — an executor loss at 100 TB killed the run)."""
    from dampr_spark.plans.pipelineops import curate_training_slice

    ckdir = str(tmp_path / "reliable_ck")
    spark.conf.set("spark.dampr.checkpointDir", ckdir)
    try:
        out = curate_training_slice(spark, sf_dir)
        assert out.count() > 0
        import glob

        written = glob.glob(ckdir + "/**/rdd-*", recursive=True)
        assert written, "no reliable checkpoint files written under the knob dir"
    finally:
        spark.conf.unset("spark.dampr.checkpointDir")


# ---------------------------------------------------------------------------
# 3. per-process incremental-store root
# ---------------------------------------------------------------------------


def test_incr_store_root_is_per_process():
    import os

    from dampr_spark.plans.vectorops import _incr_store_root

    root = _incr_store_root("/root/testdata/sf0.001", "x_store")
    assert f"pid{os.getpid()}" in root
    assert root.endswith("sf0.001")


# ---------------------------------------------------------------------------
# 4. checkpoint sibling naming
# ---------------------------------------------------------------------------


def test_checkpoint_loc_strips_trailing_separators():
    from dampr_spark.streaming.pipeline import _checkpoint_loc

    assert _checkpoint_loc("/tmp/out") == "/tmp/out_checkpoint"
    assert _checkpoint_loc("/tmp/out/") == "/tmp/out_checkpoint"
    assert _checkpoint_loc("/tmp/out//") == "/tmp/out_checkpoint"


# ---------------------------------------------------------------------------
# 5. semantic_dedup_stream out-of-order hardening (VERDICT r12 #5):
# measure the divergence, then repair it with the retraction pass.
# ---------------------------------------------------------------------------

_VEC_SCHEMA = "vec_id long, embedding array<float>"


def _dup_corpus(spark):
    """30 distinct unit vectors (ids 0..29) plus two exact-dup partners at
    high ids: 110 duplicates 10, 120 duplicates 20."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    vecs = {}
    for i in range(30):
        v = rng.standard_normal(16)
        v /= np.linalg.norm(v)
        vecs[i] = v
        rows.append((i, [float(x) for x in v]))
    for lo, hi in ((10, 110), (20, 120)):
        rows.append((hi, [float(x) for x in vecs[lo]]))
    return spark.createDataFrame(rows, _VEC_SCHEMA)


def _land_batches(spark, land, batches):
    import glob
    import os
    import shutil

    for i, chunk in enumerate(batches):
        spark.createDataFrame(chunk, _VEC_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(land / f"stage{i}"))
        f = glob.glob(str(land / f"stage{i}" / "*.parquet"))[0]
        dst = land / f"batch{i}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        shutil.rmtree(land / f"stage{i}")


def _run_semantic_stream(spark, land, out_root, ivf):
    from dampr_spark.streaming import pipeline as streaming

    stream = (
        spark.readStream.schema(_VEC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    q = streaming.semantic_dedup_stream(
        stream,
        ivf,
        str(out_root / "store"),
        str(out_root / "novel"),
        threshold=0.999,
    )
    q.awaitTermination()


def test_semantic_dedup_stream_out_of_order_divergence_measured(
    spark, tmp_path_factory
):
    """The documented caveat, MEASURED: replaying high ids BEFORE the low
    ids that dominate them emits false survivors (append-only sinks can't
    retract), while every true batch survivor is still emitted — the sink
    is batch-survivors plus exactly the early-arrived dominated ids."""
    from dampr_spark.operators.similarity import IVFIndex

    df = _dup_corpus(spark)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=100)
    expected = {
        r.vec_id
        for r in ivf.semantic_novelty(ivf.assign(df), threshold=0.999)
        .select("vec_id")
        .collect()
    }
    assert 110 not in expected and 120 not in expected  # dominated in batch

    rows = sorted(df.collect(), key=lambda r: r.vec_id)
    high = [(int(r.vec_id), list(map(float, r.embedding))) for r in rows if r.vec_id >= 100]
    low = [(int(r.vec_id), list(map(float, r.embedding))) for r in rows if r.vec_id < 100]
    land = tmp_path_factory.mktemp("ooo_land")
    out_root = tmp_path_factory.mktemp("ooo_out")
    _land_batches(spark, land, [high, low])  # dominated ids arrive FIRST
    _run_semantic_stream(spark, land, out_root, ivf)

    got = {
        r.vec_id
        for r in spark.read.parquet(str(out_root / "novel")).select("vec_id").collect()
    }
    false_survivors = got - expected
    assert expected <= got  # no true survivor is ever lost
    assert false_survivors == {110, 120}  # the measured divergence


def test_semantic_retractions_restore_batch_set_any_order(
    spark, tmp_path_factory
):
    """The repair: sink MINUS semantic_dedup_retractions == the batch
    operator's survivor set, on a shuffled replay (and the retraction set
    is empty on an id-ordered one)."""
    from dampr_spark.operators.similarity import IVFIndex
    from dampr_spark.streaming.pipeline import semantic_dedup_retractions

    df = _dup_corpus(spark)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=100)
    expected = sorted(
        r.vec_id
        for r in ivf.semantic_novelty(ivf.assign(df), threshold=0.999)
        .select("vec_id")
        .collect()
    )
    rows = sorted(df.collect(), key=lambda r: r.vec_id)
    pairs = [(int(r.vec_id), list(map(float, r.embedding))) for r in rows]
    # shuffled: high-id dups first, then an interleaved middle, then the rest
    batches = [pairs[30:], pairs[15:30], pairs[:15]]
    land = tmp_path_factory.mktemp("retr_land")
    out_root = tmp_path_factory.mktemp("retr_out")
    _land_batches(spark, land, batches)
    _run_semantic_stream(spark, land, out_root, ivf)

    retract = semantic_dedup_retractions(
        spark,
        ivf,
        str(out_root / "store"),
        str(out_root / "novel"),
        threshold=0.999,
    )
    retract_ids = {r.vec_id for r in retract.select("vec_id").collect()}
    sink = {
        r.vec_id
        for r in spark.read.parquet(str(out_root / "novel")).select("vec_id").collect()
    }
    assert sorted(sink - retract_ids) == expected
    assert retract_ids == {110, 120}


def test_semantic_retractions_empty_on_id_ordered_replay(
    spark, tmp_path_factory
):
    from dampr_spark.operators.similarity import IVFIndex
    from dampr_spark.streaming.pipeline import semantic_dedup_retractions

    df = _dup_corpus(spark)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=100)
    rows = sorted(df.collect(), key=lambda r: r.vec_id)
    pairs = [(int(r.vec_id), list(map(float, r.embedding))) for r in rows]
    land = tmp_path_factory.mktemp("ord_land")
    out_root = tmp_path_factory.mktemp("ord_out")
    _land_batches(spark, land, [pairs[:16], pairs[16:]])
    _run_semantic_stream(spark, land, out_root, ivf)
    retract = semantic_dedup_retractions(
        spark,
        ivf,
        str(out_root / "store"),
        str(out_root / "novel"),
        threshold=0.999,
    )
    assert retract.count() == 0


# ---------------------------------------------------------------------------
# 6. curate_training_slice_v2 (VERDICT r12 #6): the capstone extended with
# decontamination and DSIR selection, same shared-scan plan lock.
# ---------------------------------------------------------------------------


def test_curate_training_slice_v2_single_corpus_scan(spark):
    """v2 keeps the one-persisted-scan discipline with two MORE stages:
    the returned frame is the bounded pinned manifest (no corpus lineage,
    no parquet scan in the final plan), and its stage semantics hold."""
    from dampr_spark.plans.pipelineops import curate_training_slice_v2

    out = curate_training_slice_v2(spark, "/root/testdata/sf0.001")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in plan, plan  # fully behind the pin
    rows = out.collect()
    assert rows and all(r.n_docs > 0 for r in rows)
    assert {r.split for r in rows} <= {"train", "val", "test"}
    for r in rows:
        assert r.min_doc_id <= r.max_doc_id and r.n_tokens > 0
        assert 0.0 <= r.avg_quality <= 1.0
        # the DSIR gate kept only positive-log-weight docs, so every
        # group mean is strictly positive
        assert r.avg_log_weight > 0


def test_curate_v2_stage_semantics(spark):
    """The two NEW stages provably act: no surviving doc is a benchmark
    doc (doc_id % 97 == 0 excluded), and the selection gate shrinks or
    holds the v1 manifest's doc count (decontaminate + select can only
    remove docs relative to v1's dedup+quality chain)."""
    import pyspark.sql.functions as F  # noqa: F811

    from dampr_spark.plans.pipelineops import (
        curate_training_slice,
        curate_training_slice_v2,
    )

    sf_dir = "/root/testdata/sf0.001"
    v1 = curate_training_slice(spark, sf_dir)
    v2 = curate_training_slice_v2(spark, sf_dir)
    n1 = v1.agg(F.sum("n_docs")).first()[0]
    n2 = v2.agg(F.sum("n_docs")).first()[0]
    assert 0 < n2 < n1  # selection + decontamination really gate
