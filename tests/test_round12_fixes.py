"""Round-12 items. First block: the five ADVICE r11 fixes, each pinned:

1. (medium) ``IVFIndex.knn_graph``'s within-list top-k cut is now
   DETERMINISTIC under exact-cosine ties — argpartition runs over a
   composite int64 key (6dp-rounded sim, then lower nid via the
   ascending-nid column order), so the kept candidate set cannot depend
   on pandas-cogroup row order (shuffle fetch order). Duplicate vectors
   — the SemDeDup target workload — produce those ties in bulk.
   ``mutual_knn_clusters`` additionally pins the graph frame before the
   mutuality self-join, so the two references in one plan can never see
   two different evaluations.
2. (low) ``ivf_list_audit``'s hash-compared ``sqrt_n`` uses the repo's
   half-up rounding twin (``F.round`` / DuckDB ``round`` semantics), not
   builtin banker's ``round()``.
3. (low) ``ValueEmitter._merged_spill_pairs`` skips stale ``part-*.tmp``
   files a crashed/retried write task can leave behind — merging one
   would duplicate rows.
4. (low) the reliable pin path persists before ``checkpoint()`` so each
   fixpoint round's plan is computed ONCE (checkpoint otherwise
   recomputes the plan to write its files), and the session factory sets
   ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (read once
   at SparkContext construction) so collected frames' checkpoint files
   are GC'd.
5. (low) ``knn_graph`` no longer ``distinct()``s the candidate set: with
   single-assignment members a (qid, nid) pair can surface at most once,
   so the dedup was a corpus-scale shuffle for no effect. (The multi-
   assignment path added this round re-introduces a bounded per-pair
   dedup only when ``assign_m > 1`` — see block 2 below.)
"""

from __future__ import annotations

import math
import os
import pickle

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dampr_spark.operators.similarity import IVFIndex

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _tie_corpus(spark, dim=8, n_u=12, n_v=8, n_noise=20, seed=3):
    """Duplicate-heavy corpus: n_u exact copies of one unit vector
    (ids 0..n_u-1), n_v copies of an orthogonal one (ids 100..), plus
    noise vectors (ids 1000..) — exact-cosine ties in bulk, the ADVICE
    r11 scenario."""
    rng = np.random.default_rng(seed)
    u = np.zeros(dim)
    u[0] = 1.0
    v = np.zeros(dim)
    v[1] = 1.0
    rows = [(i, [float(x) for x in u]) for i in range(n_u)]
    rows += [(100 + i, [float(x) for x in v]) for i in range(n_v)]
    for i in range(n_noise):
        w = rng.standard_normal(dim)
        w /= np.linalg.norm(w)
        rows.append((1000 + i, [float(x) for x in w]))
    return spark.createDataFrame(rows, VEC_SCHEMA)


def test_knn_graph_tie_cut_keeps_lowest_ids(spark):
    """With >k exact-tie candidates in one list, the kept neighbors must
    be exactly the k lowest ids — the 6dp+id window discipline applied
    INSIDE the per-list cut, not just at the final window."""
    df = _tie_corpus(spark)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=100)
    g = ivf.knn_graph(ivf.assign(df), k=3)
    rows = g.collect()
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r.vec_id, []).append((r.rank, r.neighbor_id, r.cos_sim))
    # Every u-copy's top-3 are the 3 lowest OTHER u-copy ids, sim 1.0.
    for qid in range(12):
        got = sorted(by_qid[qid])
        want_ids = [i for i in range(12) if i != qid][:3]
        assert [n for _, n, _ in got] == want_ids, (qid, got)
        assert all(s == 1.0 for _, _, s in got)
    # Same for the v-copies.
    for qid in range(100, 108):
        got = sorted(by_qid[qid])
        want_ids = [100 + i for i in range(8) if 100 + i != qid][:3]
        assert [n for _, n, _ in got] == want_ids, (qid, got)


def test_knn_graph_two_evaluations_identical(spark):
    """The same plan evaluated twice yields the same frame — the cogroup
    row-order nondeterminism the composite-key cut removes."""
    df = _tie_corpus(spark, n_noise=40)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=100)
    assigned = ivf.assign(df).localCheckpoint(eager=True)
    g = ivf.knn_graph(assigned, k=4)
    a = sorted(map(tuple, g.collect()))
    b = sorted(map(tuple, g.collect()))
    assert a == b


def test_mutual_knn_clusters_conserve_on_tie_corpus(spark):
    """Duplicate-heavy corpus: clusters conserve members (Σ sizes == N)
    and every duplicate group lands in one cluster — exercises the
    pinned-graph mutuality self-join."""
    df = _tie_corpus(spark)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=100)
    clusters = ivf.mutual_knn_clusters(ivf.assign(df), k=3)
    rows = clusters.collect()
    assert len(rows) == df.count()  # one row per vector
    assert len({r.vec_id for r in rows}) == len(rows)
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, set()).add(r.vec_id)
    cluster_of = {r.vec_id: r.cluster for r in rows}
    # Deterministic lowest-id tie selection makes the mutual graph over a
    # d-duplicate group (d > k+1) EXACTLY a clique of the k+1 lowest ids
    # — every other copy points at the lowest ids, which don't point
    # back, so they are singletons. That fragmentation is the mutual-kNN
    # hub-killing contract applied to ties (raise k to widen groups);
    # what determinism buys is that it's the SAME fragmentation every
    # evaluation.
    assert by_cluster[cluster_of[0]] == {0, 1, 2, 3}
    for i in range(4, 12):
        assert by_cluster[cluster_of[i]] == {i}
    assert by_cluster[cluster_of[100]] == {100, 101, 102, 103}
    for i in range(104, 108):
        assert by_cluster[cluster_of[i]] == {i}


def test_knn_graph_plan_has_no_distinct_exchange(spark):
    """ADVICE r11 #5: the candidate-set distinct() was a corpus-scale
    shuffle for no effect (single-assignment members make (qid, nid)
    unique by construction). Plan-locked: no HashAggregate-for-distinct
    between the cogroup and the rank window — i.e. exactly ONE Exchange
    over the candidate output (the window's), not two."""
    df = _tie_corpus(spark)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=100)
    g = ivf.knn_graph(ivf.assign(df), k=3)
    plan = g._jdf.queryExecution().optimizedPlan().toString()
    assert "Deduplicate" not in plan, plan


def test_ivf_list_audit_sqrt_n_half_up(spark):
    """sqrt_n follows the repo's half-up rounding discipline (the value
    DuckDB's round() produces), not builtin banker's rounding."""
    from dampr_spark.operators.graph import _round_half_up
    from dampr_spark.operators.similarity import ivf_list_audit

    df = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(10)], VEC_SCHEMA
    )
    out = ivf_list_audit(df, n_lists_candidates=(2, 4), nprobe=2).collect()
    want = _round_half_up(math.sqrt(10), 6)
    assert all(r.sqrt_n == want for r in out)
    # And the twin itself rounds halves AWAY from zero where banker's
    # rounds to even — the cross-engine divergence the fix closes.
    assert _round_half_up(0.1234565, 6) == 0.123457
    assert round(0.1234565, 6) == 0.123456  # banker's, the old behavior


def test_spill_merge_ignores_stale_tmp(spark, tmp_path, monkeypatch):
    """A stale part-*.tmp (crashed/retried write task) next to the
    completed part file must not be merged — it would duplicate rows."""
    from dampr_spark.api import Dampr

    monkeypatch.setenv("DAMPR_SPARK_SPILL_DIR", str(tmp_path))
    em = (
        Dampr.memory([(i % 11, i) for i in range(800)])
        .group_by(lambda kv: kv[0])
        .reduce(lambda k, vs: sum(v[1] for v in vs))
        .run()
    )
    first = list(em.stream())  # materializes the spill dir
    assert len(first) == 11
    spill = [
        os.path.join(tmp_path, d)
        for d in os.listdir(tmp_path)
        if d.startswith("dampr_emitter_")
    ]
    assert len(spill) == 1
    # Plant a stale temp file containing rows that WOULD duplicate keys.
    with open(os.path.join(spill[0], "part-00000.tmp"), "wb") as f:
        pickle.dump(first, f, protocol=4)
    again = list(em.stream())
    assert again == first
    em.delete()


def test_reliable_pin_computes_plan_once(spark, tmp_path, monkeypatch):
    """ADVICE r11 #4: checkpoint() without a persist recomputes the plan
    to write its files (~2x compute per fixpoint round). The pin now
    persists first — the tapped source is evaluated exactly once."""
    import pandas as pd

    from dampr_spark.operators.pinning import pin

    monkeypatch.setenv(
        "DAMPR_SPARK_CHECKPOINT_DIR", str(tmp_path / "ckpt")
    )
    acc = spark.sparkContext.accumulator(0)

    def tap(batches):
        for b in batches:
            acc.add(len(b))
            yield b

    src = spark.range(100).selectExpr("id", "id * 3 AS v")
    tapped = src.mapInPandas(tap, src.schema)
    out = pin(tapped)
    assert acc.value == 100, f"plan evaluated {acc.value / 100:g}x"
    assert out.count() == 100
    assert acc.value == 100  # count() reads checkpoint files, no replay


def test_session_sets_checkpoint_cleaner_conf():
    """The ContextCleaner reads cleanCheckpoints ONCE at SparkContext
    construction; the session factory must bake it in."""
    from dampr_spark.session import get_spark

    spark = get_spark()
    assert (
        spark.conf.get("spark.cleaner.referenceTracking.cleanCheckpoints")
        == "true"
    )


# ---------------------------------------------------------------------------
# 2. anchor protocol v4 — the bench gate self-attributes (VERDICT r11 #1)
# ---------------------------------------------------------------------------


def _bench_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


def _v4_base():
    """The committed protocol-4 baseline (frozen probe idles + axis tags)."""
    import json

    with open(
        os.path.join(
            os.path.dirname(__file__),
            "..",
            "benchmarks",
            "frozen_anchor_baseline.json",
        )
    ) as f:
        return json.load(f)


def test_frozen_baseline_is_protocol_v4_with_unchanged_norms():
    base = _v4_base()
    assert base["protocol"] == 4
    assert base["cal_cpu_sec"] > 0 and base["cal_arrow_sec"] > 0
    assert set(base["axis"]) == set(base["norm"])
    assert set(base["axis"].values()) == {"cpu", "arrow"}
    # The never-regenerate rule: v4 carries the exact v3 norms.
    assert base["norm"]["heavy_hitter_ngrams"] == 7.913
    assert base["norm"]["q1_pricing_summary"] == 0.636


def test_anchor_v4_refiles_the_r11_false_positive_as_hostwindow():
    """Replays the ACTUAL BENCH_r11 heavy_hitter_ngrams measurement (the
    false anchor_regressed flag the manual worktree A/B refuted) through
    the v4 gate: arrow probe 3.2x idle while the cpu probe ran FASTER
    than idle -> the breach self-attributes to anchor_hostwindow, with
    the probe evidence inline in the detail record."""
    bench = _bench_module()
    base = _v4_base()
    detail = {
        "heavy_hitter_ngrams": {
            "norm": 12.298,
            "warm": 2.2669,
            "cal_adj": 0.1843,
            "cal_arrow_adj": 1.9536,
        }
    }
    regressed, hostwindow, watch = bench.classify_anchors(detail, base)
    assert regressed == [] and watch == []
    assert hostwindow == ["heavy_hitter_ngrams"]
    d = detail["heavy_hitter_ngrams"]
    assert d["axis"] == "arrow"
    assert d["probe_ratio_arrow"] > 3.0  # the degraded-window evidence
    assert d["probe_ratio_cpu"] < 1.0
    assert d["adjusted_norm"] <= 1.25 * base["norm"]["heavy_hitter_ngrams"]


def test_anchor_v4_plan_slowdown_flags_regressed_despite_degraded_probe():
    """The symmetric case the v3.1 instrument could NOT defend against:
    an artificial 2x plan slowdown (the interpreted-simhash-path
    magnitude) injected INSIDE a simulated 2x-degraded Arrow window must
    still flag regressed — the host factor only explains its own share,
    and the residual stays over the threshold."""
    bench = _bench_module()
    base = _v4_base()
    bw = base["warm_sec"]["simhash_dedup"]
    bn = base["norm"]["simhash_dedup"]
    plan_slowdown, window = 2.0, 2.0
    detail = {
        "simhash_dedup": {
            # warm carries BOTH the plan regression and the host window;
            # the cpu calibration is at its idle value (clean cpu axis).
            "warm": bw * plan_slowdown * window,
            "norm": round(
                bw * plan_slowdown * window / base["cal_cpu_sec"], 3
            ),
            "cal_adj": base["cal_cpu_sec"],
            "cal_arrow_adj": base["cal_arrow_sec"] * window,
        }
    }
    regressed, hostwindow, watch = bench.classify_anchors(detail, base)
    assert regressed == ["simhash_dedup"], (regressed, hostwindow, watch)
    d = detail["simhash_dedup"]
    assert d["host_factor"] == 2.0
    assert d["adjusted_norm"] > 1.25 * bn  # the residual = the plan


def test_anchor_v4_breach_with_clean_probes_is_regressed():
    """Breach + both probes at their idles -> regressed (no attribution
    available to excuse it)."""
    bench = _bench_module()
    base = _v4_base()
    bw = base["warm_sec"]["heavy_hitter_ngrams"]
    detail = {
        "heavy_hitter_ngrams": {
            "warm": bw * 2.0,
            "norm": round(bw * 2.0 / base["cal_cpu_sec"], 3),
            "cal_adj": base["cal_cpu_sec"],
            "cal_arrow_adj": base["cal_arrow_sec"],
        }
    }
    regressed, hostwindow, watch = bench.classify_anchors(detail, base)
    assert regressed == ["heavy_hitter_ngrams"]
    assert hostwindow == [] and watch == []


def test_anchor_v4_cpu_axis_anchor_never_excused_by_arrow_window():
    """A cpu-axis anchor (q1) breaching inside a degraded ARROW window
    stays regressed: its norm already normalizes by the cpu probe, so
    the arrow window explains none of its breach."""
    bench = _bench_module()
    base = _v4_base()
    bw = base["warm_sec"]["q1_pricing_summary"]
    detail = {
        "q1_pricing_summary": {
            "warm": bw * 2.0,
            "norm": round(bw * 2.0 / base["cal_cpu_sec"], 3),
            "cal_adj": base["cal_cpu_sec"],
            "cal_arrow_adj": base["cal_arrow_sec"] * 3.0,
        }
    }
    regressed, hostwindow, watch = bench.classify_anchors(detail, base)
    assert regressed == ["q1_pricing_summary"]
    assert hostwindow == []
    assert detail["q1_pricing_summary"]["host_factor"] == 1.0


# ---------------------------------------------------------------------------
# 3. incremental IVF shard store + member multi-assignment (VERDICT #2, #3)
# ---------------------------------------------------------------------------


def _clustered(spark, n_clusters=8, per_cluster=50, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_clusters):
        center = np.zeros(dim)
        center[c % dim] = 1.0
        for i in range(per_cluster):
            v = center + 0.05 * rng.standard_normal(dim)
            v /= np.linalg.norm(v)
            rows.append((c * per_cluster + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, VEC_SCHEMA)


def test_store_union_equals_same_centroid_full_rebuild(spark, tmp_path):
    """The incremental contract: init_store(half) + append_shard(half)
    searched over the shard union returns EXACTLY the rows a same-
    centroid full rebuild returns — frozen centroids make it an exact
    frame equality, not a recall statement."""
    df = _clustered(spark)
    ivf = IVFIndex(n_lists=8, nprobe=3, seed=42).fit(df, sample_size=400)
    root = str(tmp_path / "store")
    even = df.filter(F.col("vec_id") % 2 == 0)
    odd = df.filter(F.col("vec_id") % 2 == 1)
    ivf.init_store(even, root)
    assert ivf.append_shard(odd, root) == 1
    assert ivf.store_shard_ids(spark, root) == [0, 1]
    store = ivf.read_store(spark, root)
    assert store.count() == df.count()
    q = [1.0] + [0.0] * 15
    got = sorted(
        (r.vec_id, r.cos_sim)
        for r in ivf.search_store(spark, root, q, k=10).collect()
    )
    want = sorted(
        (r.vec_id, r.cos_sim)
        for r in ivf.query_topk(ivf.assign(df), q, k=10).collect()
    )
    assert got == want


def test_append_leaves_existing_shards_untouched(spark, tmp_path):
    df = _clustered(spark, n_clusters=4, per_cluster=20)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=200)
    root = str(tmp_path / "store")
    ivf.init_store(df.filter(F.col("vec_id") < 40), root)

    def snapshot():
        out = {}
        for dirpath, _, files in os.walk(os.path.join(root, "shard=0")):
            for f in files:
                p = os.path.join(dirpath, f)
                out[p] = os.stat(p).st_mtime_ns
        return out

    before = snapshot()
    assert before
    ivf.append_shard(df.filter(F.col("vec_id") >= 40), root)
    assert snapshot() == before  # shard 0 is immutable


def test_append_without_store_raises(spark, tmp_path):
    df = _clustered(spark, n_clusters=2, per_cluster=10)
    ivf = IVFIndex(n_lists=2, nprobe=1, seed=42).fit(df, sample_size=50)
    with pytest.raises(ValueError, match="init_store"):
        ivf.append_shard(df, str(tmp_path / "nope"))


def test_search_store_prunes_list_partitions_across_shards(spark, tmp_path):
    """Plan lock: the probes' list_id predicate must land in the scan's
    PartitionFilters over the whole shard union — the pruning that makes
    nprobe/n_lists real I/O savings survive appends."""
    df = _clustered(spark)
    ivf = IVFIndex(n_lists=8, nprobe=2, seed=42).fit(df, sample_size=400)
    root = str(tmp_path / "store")
    ivf.init_store(df.filter(F.col("vec_id") % 2 == 0), root)
    ivf.append_shard(df.filter(F.col("vec_id") % 2 == 1), root)
    q = ivf.search_store(spark, root, [1.0] + [0.0] * 15, k=5)
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan and any(
        "list_id" in l and "PartitionFilters: []" not in l for l in scan
    ), plan


def test_ivf_store_audit_depths_and_refit_rule(spark, tmp_path):
    from dampr_spark.operators.similarity import ivf_store_audit

    df = _clustered(spark)  # 400 vectors, sqrt = 20
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=400)
    root = str(tmp_path / "store")
    ivf.init_store(df.filter(F.col("vec_id") < 200), root)
    ivf.append_shard(df.filter(F.col("vec_id") >= 200), root)
    # n_lists=4 against sqrt(400)=20: a full octave under -> refit.
    r = ivf_store_audit(spark, root, n_lists=4, nprobe=2).collect()[0]
    assert r.n_shards == 2 and r.n_vecs == 400 and r.dim == 16
    assert 0 < r.occupied_lists <= 4
    assert r.max_list_depth <= 400 and r.probe_rows_worst >= r.max_list_depth
    assert r.probe_bytes_worst == r.probe_rows_worst * (4 * 16 + 8)
    assert r.sqrt_n == 20.0
    assert r.refit_recommended
    # n_lists=16 is within the octave band [sqrt/2, 2*sqrt] -> no refit.
    r16 = ivf_store_audit(spark, root, n_lists=16, nprobe=2).collect()[0]
    assert not r16.refit_recommended and r16.n_vecs == 400


def test_knn_graph_assign_m_recovers_boundary_neighbor(spark):
    """The deterministic boundary fixture: q (46 deg) quantizes to list 1,
    its true nearest neighbor b (44 deg) to list 0. At nprobe=1/assign_m=1
    the graph misses b; at assign_m=2 b is ALSO placed in list 1 and the
    exact same probe budget finds it — the standard member-side
    multi-assignment recall remedy, pinned without any sampling."""
    import math as m

    def vec(deg):
        return [float(m.cos(m.radians(deg))), float(m.sin(m.radians(deg)))]

    rows = [
        (1, vec(46)),   # q: nearest centroid c1=(0,1) (44 vs 46 deg)
        (2, vec(44)),   # b: nearest centroid c0=(1,0); q's true NN
        (3, vec(90)),   # in-list-1 distractor
        (4, vec(0)),    # in-list-0 filler
    ]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    ivf = IVFIndex(n_lists=2, nprobe=1, seed=0)
    ivf.centroids = np.asarray([[1.0, 0.0], [0.0, 1.0]])
    assigned = ivf.assign(df)
    n1 = {
        r.vec_id: r.neighbor_id
        for r in ivf.knn_graph(assigned, k=1).collect()
    }
    assert n1[1] == 3  # boundary neighbor missed at assign_m=1
    n2 = {
        r.vec_id: r.neighbor_id
        for r in ivf.knn_graph(assigned, k=1, assign_m=2).collect()
    }
    assert n2[1] == 2  # recovered at the SAME nprobe budget
    # And multi-assignment never duplicates a pair in the output.
    g2 = ivf.knn_graph(assigned, k=3, assign_m=2)
    pairs = [(r.vec_id, r.neighbor_id) for r in g2.collect()]
    assert len(pairs) == len(set(pairs))


def test_ivf_list_audit_prices_assign_m(spark):
    from dampr_spark.operators.similarity import ivf_list_audit

    df = _clustered(spark, n_clusters=4, per_cluster=25)
    out = ivf_list_audit(
        df, n_lists_candidates=(4, 16), nprobe=2, sample_size=200,
        assign_m=3,
    ).collect()
    for r in out:
        assert r.assign_m == 3
        assert r.member_rows_assigned == 3 * r.n_vecs
        assert r.member_bytes_assigned == 3 * r.n_vecs * (4 * r.dim + 8)


# ---------------------------------------------------------------------------
# 4. keep-novel semantic dedup: batch operator + streaming twin (VERDICT #5)
# ---------------------------------------------------------------------------


def test_semantic_novelty_first_wins_on_ties(spark):
    """Exact duplicates: only the lowest-id copy of each duplicate group
    survives (identical vectors always share lists and probe lists, so
    the dominance candidate generation cannot miss them)."""
    df = _tie_corpus(spark)  # 12 u-copies (0..11), 8 v-copies (100..107)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=100)
    kept = ivf.semantic_novelty(ivf.assign(df), threshold=0.999)
    ids = {r.vec_id for r in kept.select("vec_id").collect()}
    assert ids & set(range(12)) == {0}
    assert ids & set(range(100, 108)) == {100}
    # Global minimum id can never be dominated.
    assert min(r.vec_id for r in df.collect()) in ids


def test_semantic_novelty_threshold_gates_dominance(spark):
    """A threshold above every cross-vector cosine keeps everything."""
    df = _tie_corpus(spark, n_u=1, n_v=1, n_noise=30)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=100)
    kept = ivf.semantic_novelty(ivf.assign(df), threshold=1.0000001)
    assert kept.count() == df.count()


def test_semantic_dedup_stream_matches_batch(spark, tmp_path_factory):
    """Stream==batch: the corpus replayed in 3 id-ordered micro-batches
    emits EXACTLY the batch operator's survivor set, and the IVF shard
    store accumulates one shard per batch (composing with the round-12
    incremental store)."""
    import glob
    import shutil

    from dampr_spark.streaming import pipeline as streaming

    df = _tie_corpus(spark, n_u=9, n_v=6, n_noise=24)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=100)
    expected = sorted(
        r.vec_id
        for r in ivf.semantic_novelty(ivf.assign(df), threshold=0.999)
        .select("vec_id")
        .collect()
    )

    land = tmp_path_factory.mktemp("vec_land")
    out_root = tmp_path_factory.mktemp("semdedup_out")
    rows = sorted(df.collect(), key=lambda r: r.vec_id)
    third = (len(rows) + 2) // 3
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        spark.createDataFrame(
            [(int(r.vec_id), list(map(float, r.embedding))) for r in chunk],
            VEC_SCHEMA,
        ).coalesce(1).write.mode("overwrite").parquet(str(land / f"stage{i}"))
        f = glob.glob(str(land / f"stage{i}" / "*.parquet"))[0]
        dst = land / f"batch{i}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        shutil.rmtree(land / f"stage{i}")

    stream = (
        spark.readStream.schema(VEC_SCHEMA)
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

    got = sorted(
        r.vec_id
        for r in spark.read.parquet(str(out_root / "novel"))
        .select("vec_id")
        .collect()
    )
    assert got == expected
    assert ivf.store_shard_ids(spark, str(out_root / "store")) == [0, 1, 2]
    # The store holds EVERY arrival (dominance must see non-survivors too).
    assert (
        ivf.read_store(spark, str(out_root / "store")).count() == len(rows)
    )


# ---------------------------------------------------------------------------
# 5. curate_training_slice capstone: shared-scan plan lock (VERDICT #6)
# ---------------------------------------------------------------------------


def test_curate_training_slice_single_corpus_scan(spark):
    """The capstone's discipline: ONE persisted corpus text scan feeds
    every stage. Plan-locked two ways: (a) the returned frame is the
    bounded pinned manifest (no corpus lineage at all); (b) rebuilding
    the pipeline's pre-pin lineage still shows at most ONE parquet scan
    of documents — the persist dedupes the fingerprint/quality/gram
    consumers."""
    from dampr_spark.plans.pipelineops import curate_training_slice

    sf_dir = "/root/testdata/sf0.001"
    out = curate_training_slice(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in plan, plan  # fully behind the pin
    rows = out.collect()
    assert rows and all(r.n_docs > 0 for r in rows)
    splits = {r.split for r in rows}
    assert splits <= {"train", "val", "test"} and "train" in splits
    # Manifest sanity: id ranges are ordered, token sums positive.
    for r in rows:
        assert r.min_doc_id <= r.max_doc_id and r.n_tokens > 0
        assert 0.0 <= r.avg_quality <= 1.0


def test_curate_training_slice_stage_semantics(spark):
    """Composition semantics vs the stage operators it composes: the
    capstone's total kept docs equal near-dup-keep-best survivors of the
    exact-keep-best survivors, gated at q >= 0.6."""
    from dampr_spark.functions.text import fingerprint, quality_score
    from dampr_spark.operators import dedup
    from dampr_spark.plans.pipelineops import curate_training_slice
    from dampr_spark.sources.readers import read_table

    sf_dir = "/root/testdata/sf0.001"
    total = sum(
        r.n_docs for r in curate_training_slice(spark, sf_dir).collect()
    )
    d = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "text",
            fingerprint("text").alias("fp"),
            quality_score("text").alias("q"),
        )
    )
    exact = (
        d.groupBy("fp")
        .agg(
            F.max(
                F.struct("q", (-F.col("doc_id")).alias("negid"), F.col("text"))
            ).alias("m")
        )
        .select(
            (-F.col("m.negid")).alias("doc_id"),
            F.col("m.text").alias("text"),
            F.col("m.q").alias("q"),
        )
        .localCheckpoint(eager=True)
    )
    pairs = dedup.ngram_jaccard_pairs(
        exact, n=3, threshold=0.1, max_posting=64
    ).select("id_a", "id_b")
    expected = (
        dedup.drop_near_dups_keep_best(exact, pairs, F.col("q"))
        .filter(F.col("q") >= 0.6)
        .count()
    )
    assert total == expected


# ---------------------------------------------------------------------------
# 6. the Catalyst stats snowball in iterative pins (round-12 discovery)
# ---------------------------------------------------------------------------


def test_pin_resets_stats_no_bigint_snowball(spark):
    """Dataset.checkpoint snapshots the origin plan's statistics into the
    new leaf; a fixpoint whose round joins the pinned frame against
    itself SQUARES the sizeInBytes BigInteger every round (connected
    components cubes it), and past ~18 rounds the driver drowns in
    BigInteger.multiply — jstack-measured 169 s of ToomCook3 inside one
    71 s round before the fix. pin() now materializes a cache first so
    the snapshot reads the InMemoryRelation's REAL byte size: leaf stats
    stay constant-width forever. 10 self-join rounds would reach
    thousands of digits under the old behavior; assert they stay tiny."""
    from dampr_spark.operators.pinning import pin

    labels = pin(
        spark.range(2000).select(F.col("id"), F.col("id").alias("label"))
    )
    for _ in range(10):
        prev = labels.select(
            F.col("id").alias("jid"), F.col("label").alias("jlab")
        )
        nxt = labels.join(prev, labels.label == prev.jid, "left").select(
            "id",
            F.least("label", F.coalesce("jlab", "label")).alias("label"),
        )
        labels = pin(nxt)
    digits = len(
        str(
            labels._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    )
    assert digits < 30, f"stats snowball is back: {digits} digits"
    assert labels.count() == 2000


def test_semantic_keep_best_accepts_precomputed_clusters(spark):
    """keep_best(clusters=pinned_clustering) must equal the self-computed
    path — callers wanting both outputs shouldn't pay the graph twice."""
    df = _tie_corpus(spark)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=100)
    assigned = ivf.assign(df).localCheckpoint(eager=True)
    clusters = ivf.mutual_knn_clusters(assigned, k=3).localCheckpoint(
        eager=True
    )
    a = sorted(map(tuple, ivf.semantic_keep_best(assigned, k=3).collect()))
    b = sorted(
        map(
            tuple,
            ivf.semantic_keep_best(assigned, k=3, clusters=clusters).collect(),
        )
    )
    assert a == b
