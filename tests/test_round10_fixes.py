"""Round-10 fixes, each pinned by the ADVICE.md / VERDICT.md item it
closes:

1. The six driver-side bounded-graph fixpoint loops are unified behind
   ``graph.pin_probe_edges`` + ``graph.driver_fixpoint`` (VERDICT r9
   "what's wrong" #2) — the probe-after-pin contract is now enforced by
   construction, and the dual-path equivalence contracts of
   tests/test_round9_fixes.py still hold (re-run there).
2. ``near_dup_clusters`` drops NULL-endpoint pairs on BOTH paths instead
   of the fast path raising TypeError while the join plan silently
   dropped them (ADVICE #1).
3. ``pagerank``'s fast path skips NULL weights exactly like ``F.sum``
   and raises a clear ArithmeticError on a zero out-weight sum, matching
   the distributed plan's ANSI DIVIDE_BY_ZERO failure class instead of
   ZeroDivisionError (ADVICE #2).
4. ``grid_resolution_audit``'s coarse rollup uses exact integer ``div``
   — Horner cell ids past 2^53 no longer corrupt under double division —
   and the long-overflow case fails loudly (ADVICE #3).
5. ``Indexer`` read paths self-heal the compact crash window by renaming
   a stranded ``root_precompact`` back into place (ADVICE #5).

(ADVICE #4 — the bench anchor gate's absolute floor — is covered by the
bench protocol change in bench.py, exercised per-round by the driver.)
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. the unified fixpoint helper
# ---------------------------------------------------------------------------


def test_pin_probe_edges_pins_then_probes(spark):
    from dampr_spark.operators.graph import pin_probe_edges

    df = spark.createDataFrame([(i, i + 1) for i in range(10)], "src int, dst int")
    pinned, small = pin_probe_edges(df, 50)
    assert small is not None and len(small) == 10
    # The returned frame is materialized (checkpointed lineage), usable by
    # the distributed path without re-running edge generation.
    assert pinned.count() == 10

    pinned2, none = pin_probe_edges(df, 5)
    assert none is None
    assert pinned2.count() == 10

    _, forced = pin_probe_edges(df, 0)
    assert forced is None  # max_edges=0 forces the distributed path


def test_driver_fixpoint_modes(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    from dampr_spark.operators.graph import driver_fixpoint

    schema = StructType([StructField("k", LongType()), StructField("v", LongType())])

    # Fixed-iteration mode runs exactly `iters` rounds.
    out = driver_fixpoint(
        spark, schema, {0: 0}, lambda s: ({0: s[0] + 1}, True),
        lambda s: [(0, s[0])], iters=4,
    )
    assert out.collect()[0].v == 4

    # Fixpoint mode stops when step reports no change...
    out = driver_fixpoint(
        spark, schema, {0: 0},
        lambda s: ({0: min(s[0] + 1, 3)}, s[0] < 3),
        lambda s: [(0, s[0])], max_iters=10,
    )
    assert out.collect()[0].v == 3

    # ...and raises the caller's message past max_iters.
    with pytest.raises(RuntimeError, match="custom fail msg"):
        driver_fixpoint(
            spark, schema, {0: 0}, lambda s: ({0: s[0] + 1}, True),
            lambda s: [(0, s[0])], max_iters=3, fail="custom fail msg",
        )


# ---------------------------------------------------------------------------
# 2. near_dup_clusters NULL endpoints (ADVICE #1)
# ---------------------------------------------------------------------------


def test_near_dup_clusters_null_ids_match_across_paths(spark):
    from dampr_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (None, 4), (5, None), (6, 7)],
        "id_a int, id_b int",
    )
    fast = {r.id: r.canonical for r in near_dup_clusters(pairs).collect()}
    slow = {
        r.id: r.canonical
        for r in near_dup_clusters(pairs, max_driver_edges=0).collect()
    }
    # NULL-endpoint pairs identify nothing: dropped on BOTH paths, so the
    # isolated 4 and 5 don't appear and nothing raises TypeError.
    assert fast == slow == {1: 1, 2: 1, 3: 1, 6: 6, 7: 6}


# ---------------------------------------------------------------------------
# 3. pagerank NULL weights + zero out-weight sums (ADVICE #2)
# ---------------------------------------------------------------------------


def test_pagerank_null_weights_match_across_paths(spark):
    from dampr_spark.operators.graph import pagerank

    edges = [
        (1, 2, 1.0),
        (1, 3, None),  # NULL weight: contributes nothing, endpoints remain
        (2, 3, 2.0),
        (3, 1, 1.0),
        (4, 5, None),  # vertex pair connected ONLY by a NULL-weight edge
    ]
    df = spark.createDataFrame(edges, "src int, dst int, w double")
    fast = {r.id: r.rank for r in pagerank(df, weight="w").collect()}
    slow = {
        r.id: r.rank
        for r in pagerank(df, weight="w", max_driver_edges=0).collect()
    }
    assert fast == slow
    assert set(fast) == {1, 2, 3, 4, 5}  # NULL-w endpoints still vertices


def test_pagerank_zero_outweight_raises_cleanly(spark):
    from dampr_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        [(1, 2, 1.0), (1, 3, -1.0), (2, 3, 1.0)], "src int, dst int, w double"
    )
    # Fast path: a clear ArithmeticError naming the vertex (previously an
    # unexplained ZeroDivisionError deep in the loop).
    with pytest.raises(ArithmeticError, match="out-weights summing to 0.0"):
        pagerank(df, weight="w")
    # Distributed path: the same failure class (ANSI DIVIDE_BY_ZERO) —
    # both paths refuse instead of one raising and one emitting NaNs.
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        pagerank(df, weight="w", max_driver_edges=0).collect()


# ---------------------------------------------------------------------------
# 4. grid_resolution_audit exact integer rollup (ADVICE #3)
# ---------------------------------------------------------------------------


def _vectors(spark, n: int, dims: int):
    import random

    random.seed(17)
    rows = [
        (i, [round(random.uniform(-1, 1), 6) for _ in range(dims)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_grid_audit_rollup_exact_past_double_precision(spark):
    """buckets=10, finest=16 → Horner cell ids up to 10^16-1 ≈ 2^53.15:
    the old F.floor(cell / q) double division rounds ids in that range, so
    the dims=15 rollup row must equal a DIRECT audit at finest=15 (whose
    ids never touch the rollup divide). Exact integer `div` makes it so."""
    from dampr_spark.operators.similarity import grid_resolution_audit

    df = _vectors(spark, 80, 16)
    rolled = {
        r.dims: (r.cells_ge2, r.cells_over_cap, r.raw_pair_budget)
        for r in grid_resolution_audit(
            df, dims_candidates=(15, 16), buckets=10, max_cell=4
        ).collect()
    }
    direct = {
        r.dims: (r.cells_ge2, r.cells_over_cap, r.raw_pair_budget)
        for r in grid_resolution_audit(
            df, dims_candidates=(15,), buckets=10, max_cell=4
        ).collect()
    }
    assert rolled[15] == direct[15]


def test_grid_audit_overflow_guard(spark):
    from dampr_spark.operators.similarity import grid_resolution_audit

    df = _vectors(spark, 5, 20)
    with pytest.raises(ValueError, match="overflows the long Horner cell id"):
        grid_resolution_audit(df, dims_candidates=(19,), buckets=10)


# ---------------------------------------------------------------------------
# 5. Indexer compact crash-window self-heal (ADVICE #5)
# ---------------------------------------------------------------------------


def test_indexer_recovers_stranded_precompact(spark, tmp_path):
    from dampr_spark.operators.indexer import Indexer

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "gamma delta")],
        "doc_id long, text string",
    )
    root = str(tmp_path / "idx")
    ix = Indexer(root).build(docs, "text", "doc_id")
    assert {r.doc_id for r in ix.union(spark, ["beta"]).collect()} == {1, 2}

    # Simulate a crash between compact's two renames: the only copy is
    # stranded at root_precompact and root is absent.
    shutil.move(root, root + "_precompact")
    assert not os.path.exists(root)

    # A reader self-heals: the stranded copy is renamed back into place.
    assert {r.doc_id for r in ix.union(spark, ["beta"]).collect()} == {1, 2}
    assert os.path.exists(root) and not os.path.exists(root + "_precompact")

    # The append path (_shard_ids) heals too, and keeps shard numbering.
    shutil.move(root, root + "_precompact")
    ix.append(
        spark.createDataFrame([(4, "delta epsilon")], "doc_id long, text string"),
        "text",
        "doc_id",
    )
    assert {r.doc_id for r in ix.union(spark, ["delta"]).collect()} == {3, 4}


# ---------------------------------------------------------------------------
# 6. lsh_band_audit — the banding sizing instrument (VERDICT r9 #3)
# ---------------------------------------------------------------------------


def _stamped_corpus(spark, n_template: int = 12, n_distinct: int = 30):
    """n_template identical 'template spam' docs + n_distinct organic ones
    — the hot-bucket failure mode the max_bucket cap exists for."""
    import random

    random.seed(23)
    words = [f"w{i:03d}" for i in range(400)]
    rows = [(i, "the quick template boilerplate stamped body repeated")
            for i in range(n_template)]
    rows += [
        (1000 + i, " ".join(random.sample(words, 18)))
        for i in range(n_distinct)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_band_audit_over_cap_accounting(spark):
    """With max_bucket below the template-group size, EVERY band of every
    config holds at least the template bucket over cap — the audit's
    dropped-mass columns must account for it, and no saturated config may
    be recommended (the no-go signal the instrument exists to give)."""
    from dampr_spark.operators.dedup import lsh_band_audit

    g = 12
    df = _stamped_corpus(spark, n_template=g)
    rows = lsh_band_audit(
        df, band_candidates=(8, 16), max_bucket=5, include_simhash=True
    ).collect()
    assert len(rows) == 3
    for r in rows:
        # The identical-text group shares every band's bucket: one
        # over-cap bucket (at least) per band.
        assert r.buckets_over_cap >= r.bands
        assert r.docs_over_cap >= g * r.bands
        assert r.pairs_dropped >= r.bands * (g * (g - 1) // 2)
        assert r.capped_pairs + r.pairs_dropped == r.raw_pairs
        assert not r.recommended  # every config saturates → explicit no-go
    # ...and raising the cap above the group clears the saturation.
    clear = lsh_band_audit(
        df, band_candidates=(8, 16), max_bucket=100, include_simhash=False
    ).collect()
    assert all(r.buckets_over_cap == 0 for r in clear)
    # recommended = MOST bands at zero over-cap (best recall, equal safety)
    assert [r.bands for r in clear if r.recommended] == [16]


def test_lsh_band_audit_bounds_generator_budget(spark):
    """The audit prices exactly what the production generator shuffles:
    minhash_lsh_candidates at the same (num_perm, bands, max_bucket) can
    never emit more distinct pairs than the audit's capped budget (the
    budget counts per-band slots; candidates dedup across bands)."""
    from dampr_spark.operators.dedup import lsh_band_audit, minhash_lsh_candidates

    df = _stamped_corpus(spark)
    for cap in (5, 1000):
        budget = {
            r.bands: r.capped_pairs
            for r in lsh_band_audit(
                df, band_candidates=(16,), max_bucket=cap, include_simhash=False
            ).collect()
        }
        n_cands = minhash_lsh_candidates(df, bands=16, max_bucket=cap).count()
        assert n_cands <= budget[16]

    def test_bad_candidates_raise():
        with pytest.raises(ValueError, match="does not divide"):
            lsh_band_audit(df, band_candidates=(7,))

    test_bad_candidates_raise()


def test_hot_grams_reuse_matches_max_df_path(spark):
    """The audit-then-run flow: a precomputed hot_bench_grams frame fed
    via hot_grams= must produce byte-identical results to the inline
    max_df path (same cap, same corpus) for BOTH contamination operators
    — the point is skipping the second frequency pass, not changing the
    answer."""
    from dampr_spark.operators.dedup import (
        fuzzy_contamination,
        hot_bench_grams,
        ngram_contamination,
    )

    df = _stamped_corpus(spark)
    corpus = df  # template docs + organic docs
    bench = df.filter(F.col("doc_id") < 1000)  # the 12 template docs
    hot = hot_bench_grams(corpus, bench, n=2, max_df=5)
    assert hot.count() > 0  # the template bigrams (corpus df 12) are over-cap

    a = sorted(map(tuple, ngram_contamination(corpus, bench, n=2, max_df=5).collect()))
    b = sorted(map(tuple, ngram_contamination(corpus, bench, n=2, hot_grams=hot).collect()))
    assert a == b and a

    fa = sorted(map(tuple, fuzzy_contamination(corpus, bench, n=2, tau=0.01, max_df=5).collect()))
    fb = sorted(map(tuple, fuzzy_contamination(corpus, bench, n=2, tau=0.01, hot_grams=hot).collect()))
    assert fa == fb

    # Width mismatch fails FAST (round-10 review): a bigram hot frame fed
    # to the trigram check would anti-join nothing and silently run
    # uncapped — the gram_width tag turns that into an error.
    with pytest.raises(ValueError, match="gram width 2 .* n=3"):
        ngram_contamination(corpus, bench, n=3, hot_grams=hot)


# ---------------------------------------------------------------------------
# 7. the anchor gate's decision logic (bench.py classify_anchors)
# ---------------------------------------------------------------------------


def test_anchor_gate_classification():
    """Pins the gate's semantics (ADVICE #4 + the v2/v3 postmortems):
    ratio breach + raw-seconds breach of the SCALED floor => regressed;
    ratio breach with flat-or-better seconds => watch (denominator
    artifact); sub-0.5s anchors are no longer exempt; no baseline =>
    silent."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    base = {
        "norm": {"slow": 10.0, "fast": 1.0, "faster_secs": 10.0, "new": None},
        "warm_sec": {"slow": 2.0, "fast": 0.15, "faster_secs": 1.7},
    }
    detail = {
        # 1.5x norm AND +1.5s raw: a real regression.
        "slow": {"norm": 15.0, "warm": 3.5},
        # The ADVICE #4 case: a 0.15s anchor tripling. Old flat 0.5s
        # floor suppressed it; scaled floor max(0.1, 0.075)=0.1 < +0.35.
        "fast": {"norm": 3.0, "warm": 0.5},
        # Ratio breach but raw seconds IMPROVED — the measured v2
        # denominator artifact: watch, never regressed.
        "faster_secs": {"norm": 13.5, "warm": 1.3},
        # No baseline entry: silent (first appearance).
        "new": {"norm": 5.0, "warm": 1.0},
    }
    # Protocol-3 baseline (no probe idles): the v4 gate degrades to v3 —
    # every breach is regressed/watch, hostwindow stays empty.
    regressed, hostwindow, watch = bench.classify_anchors(detail, base)
    assert sorted(regressed) == ["fast", "slow"]
    assert hostwindow == []
    assert watch == ["faster_secs"]
    assert detail["slow"]["baseline_norm"] == 10.0

    # Under-ratio anchors never flag regardless of seconds.
    r2, h2, w2 = bench.classify_anchors(
        {"ok": {"norm": 11.0, "warm": 9.9}}, {"norm": {"ok": 10.0}, "warm_sec": {"ok": 2.0}}
    )
    assert r2 == [] and h2 == [] and w2 == []


def test_compare_bench_flags():
    """benchmarks/compare_bench.py: normalized cross-round comparison with
    the anchor gate's ratio + scaled-floor rule."""
    import importlib.util
    import json
    import os
    import tempfile

    spec = importlib.util.spec_from_file_location(
        "compare_bench",
        os.path.join(
            os.path.dirname(__file__), "..", "benchmarks", "compare_bench.py"
        ),
    )
    cb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cb)

    old = {
        "calibration_sec": 0.4,
        "queries_warm": {"a": 2.0, "b": 0.2, "c": 3.0, "gone": 1.0},
    }
    # New run, cal 0.35: "a" regresses (norm 5.0 -> 11.4, +2.0s over the
    # 1.0s floor); "b" breaches the ratio (0.5 -> 0.8) but moves only
    # +0.08s, under its max(0.1, 0.1) floor -> watch; "c" improves
    # (7.5 -> 4.3 normalized).
    new = {
        "calibration_sec": 0.35,
        "queries_warm": {"a": 4.0, "b": 0.28, "c": 1.5, "fresh": 1.0},
    }
    with tempfile.TemporaryDirectory() as d:
        po, pn = f"{d}/old.json", f"{d}/new.json"
        json.dump(old, open(po, "w"))
        json.dump(new, open(pn, "w"))
        r = cb.compare(po, pn)
    assert r["regressed"] == ["a"]
    assert r["watch"] == ["b"]
    assert r["improved"] == ["c"]
    assert r["only_old"] == ["gone"] and r["only_new"] == ["fresh"]
