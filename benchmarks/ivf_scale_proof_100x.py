"""ANN/IVF 100x budget proof (round 10): the similarity-search family
taken two decades up. The r7 10x proof (ivf_sq8_scale_proof.py) pinned
the mechanics — directory pruning is real I/O, SQ8 compresses 4x, recall
holds; the 100x question is the KNOB: IVF's inverted lists saturate by
DEPTH under a fixed ``n_lists``, exactly like the grid's fixed
resolution and simhash's fixed band space. At 100x data:

- **fixed n_lists=16** (the 10x setting): the pruning FRACTION stays
  nprobe/n_lists = 25%, but the absolute per-query scan is 100x deeper
  (~12.5k vectors per list) — constant-fraction pruning is NOT constant
  work; the knob must turn with the corpus.
- **re-tuned n_lists=400 (~sqrt N), nprobe=24**: per-list depth ~500,
  bytes/query ~6% of the layout — ~4x less I/O per query than the stale
  setting — at equal-or-better recall. The list-occupancy report
  (avg/max list rows — IVF's one-aggregate sizing look, printed for both
  configs) is what tells an operator the stale config saturated, BEFORE
  queries pay it.

Fixture: sf0.1 embeddings (2k vectors, 64-dim) grown 100x with the grid
proof's distance-preserving transform — copy i cyclically ROLLS each
vector by i%64 dims and NEGATES it for i>=64 (rotation permutes
coordinates, cosine(a,b)==cosine(-a,-b)), so every within-copy
neighborhood exists once per copy and NO artificial tie-cliques form
(verbatim replication would make every true top-k a 100-way tie and the
recall measurement meaningless). Ground truth is exact float brute-force
over the full 200k corpus per query.

Prints one JSON line; prose goes to benchmarks/RESULTS.md.

Usage: PYTHONPATH=/root/repo python benchmarks/ivf_scale_proof_100x.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.grid_dedup_scale_proof_100x import organic_100x  # noqa: E402
from benchmarks.ivf_sq8_scale_proof import dir_bytes  # noqa: E402
from dampr_spark.functions.vector import valid_vector  # noqa: E402
from dampr_spark.operators.similarity import (  # noqa: E402
    IVFIndex,
    ScalarQuantizer,
    brute_force_topk,
    ivf_list_audit,
)
from dampr_spark.session import get_spark  # noqa: E402
from dampr_spark.sources.readers import read_table  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_COPIES = 100
DIM = 64
K = 10
N_QUERIES = 20
CONFIGS = (
    {"label": "stale_10x_config", "n_lists": 16, "nprobe": 4},
    {"label": "retuned_low_io", "n_lists": 400, "nprobe": 24},
    {"label": "retuned_equal_io", "n_lists": 400, "nprobe": 96},
)


def main() -> int:
    spark = get_spark(app_name="ivf-scale-proof-100x")
    e1 = (
        read_table(spark, BASE, "embeddings")
        .filter(valid_vector("embedding"))
        .select("vec_id", "embedding", "label")
    )
    # The grid 100x proof's distance-preserving growth (imported, not
    # re-derived): roll by copy%64, negate the second pass of 64.
    big = (
        organic_100x(e1).select("vec_id", "embedding").localCheckpoint(eager=True)
    )
    out = {"metric": "ivf_scale_proof_100x", "corpus_vectors": big.count()}

    # Round 11: the sizing instrument this proof motivated. One corpus
    # pass prices every candidate; the recommendation must land on the
    # re-tuned config (sqrt(200k) ~ 447 -> nearest candidate 400), turning
    # the proof's manual re-tune into a priced, pre-run decision.
    if "--clusters-only" in sys.argv:
        audit = []  # the clusters leg measures the consumers, not the knob
    else:
        audit = ivf_list_audit(
            big, n_lists_candidates=(16, 100, 400, 1600), nprobe=24,
            sample_size=4096,
        ).collect()
    out["audit"] = [
        {
            "n_lists": r.n_lists,
            "max_list_depth": r.max_list_depth,
            "depth_skew": r.depth_skew,
            "probe_rows_worst": r.probe_rows_worst,
            "probe_mb_worst": round(r.probe_bytes_worst / 1e6, 2),
            "recommended": r.recommended,
        }
        for r in audit
    ]
    if audit:
        rec = [r.n_lists for r in audit if r.recommended]
        assert rec == [400], f"audit recommendation {rec} != the re-tuned 400"

    # Round 11: the corpus-wide kNN graph at two decades, at the audit's
    # recommended config. 200k probers x nprobe lists against sqrt(N)
    # lists is ~900M scored pairs — payable ONLY because the per-list
    # scoring is one Arrow cogroup matmul (the interpreted-cosine form
    # was measured watchdog-slow at a tenth of this scale). Invariants:
    # a full k rows for (almost) every vector, and spot recall against
    # exact brute force for 10 sampled vectors.
    if "--knn" in sys.argv or "--knn-only" in sys.argv:
        idx = IVFIndex(n_lists=400, nprobe=24).fit(big, sample_size=4096)
        assigned = idx.assign(big).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        g = idx.knn_graph(assigned, k=K).localCheckpoint(eager=True)
        n_rows = g.count()
        knn_sec = time.perf_counter() - t0
        full = (
            g.groupBy("vec_id").count().filter(F.col("count") == K).count()
        )
        sample_ids = [r.vec_id for r in big.orderBy("vec_id").limit(10).collect()]
        sample_vecs = {
            r.vec_id: [float(x) for x in r.embedding]
            for r in big.filter(F.col("vec_id").isin(sample_ids)).collect()
        }
        overlaps = []
        for vid in sample_ids:
            exact = {
                r.vec_id
                for r in brute_force_topk(
                    big.filter(F.col("vec_id") != vid), sample_vecs[vid], k=K
                ).collect()
            }
            got = {
                r.neighbor_id
                for r in g.filter(F.col("vec_id") == vid).collect()
            }
            overlaps.append(len(got & exact))
        out["knn_graph_200k"] = {
            "n_lists": 400,
            "nprobe": 24,
            "k": K,
            "wall_sec": round(knn_sec, 2),
            "rows": n_rows,
            "vectors_with_full_k": full,
            "corpus_vectors": 200000,
            "spot_overlap_of_10": sorted(overlaps),
        }
        # Round 12 (VERDICT r11 #3): member-side multi-assignment at the
        # SAME nprobe budget — each member vector lands in its 2 nearest
        # lists so near-boundary neighbors co-occur with their probers.
        # Cost is a clean linear x2 on the member side of the one
        # list_id shuffle (priced by ivf_list_audit's
        # member_rows_assigned column); the claim under measurement is
        # that spot recall rises at unchanged probe I/O.
        t0 = time.perf_counter()
        g2 = idx.knn_graph(assigned, k=K, assign_m=2).localCheckpoint(
            eager=True
        )
        knn2_sec = time.perf_counter() - t0
        overlaps2 = []
        for vid in sample_ids:
            exact = {
                r.vec_id
                for r in brute_force_topk(
                    big.filter(F.col("vec_id") != vid), sample_vecs[vid], k=K
                ).collect()
            }
            got = {
                r.neighbor_id
                for r in g2.filter(F.col("vec_id") == vid).collect()
            }
            overlaps2.append(len(got & exact))
        out["knn_graph_200k_assign_m2"] = {
            "n_lists": 400,
            "nprobe": 24,
            "k": K,
            "assign_m": 2,
            "wall_sec": round(knn2_sec, 2),
            "rows": g2.count(),
            "spot_overlap_of_10": sorted(overlaps2),
            "mean_overlap_m1": round(sum(overlaps) / len(overlaps), 2),
            "mean_overlap_m2": round(sum(overlaps2) / len(overlaps2), 2),
        }
        if "--knn-only" in sys.argv:
            print(json.dumps(out))
            return 0

    # Round 12 (VERDICT r11 #4): the graph's CONSUMERS at proof scale.
    # Their risks differ from the graph's own: (a) the component
    # fixpoint's ROUND COUNT under a giant near-dup cluster — a planted
    # 4096-vector 1-D manifold chain (angles i*0.45 deg in one 2-plane:
    # each member's top-k are its angular neighbors, so the mutual graph
    # is one long chain, diameter ~4k — the worst case pointer jumping
    # must compress) — and (b) hub behavior — a planted 512-spoke star
    # (spokes see the hub as top-1; the hub links back to only k of
    # them), the mega-cluster-by-hub-transitivity trap mutual-kNN exists
    # to kill; plus the (cluster, dim) centroid shuffle in keep-best
    # over those giant clusters.
    if "--clusters-only" in sys.argv:
        import math

        # Planted ids start at 500M — far above organic_100x's copy ids
        # (vec_id + copy*1e6, max ~99M); the first fixture version
        # planted at 10M/11M and COLLIDED with copies 10/11, breaking
        # conservation. The chain spans a quarter arc (1024 x 0.08 deg)
        # — the first version's 0.45 deg x 4096 wrapped the circle five
        # times, making i and i+800 EXACT twins whose 6dp ties fragment
        # under the deterministic cut; 0.08 deg keeps adjacent cosines
        # distinct at 6dp (cos 0.08deg = .999999 < 1.0) so the mutual
        # +-1/+-2 edges hold one 1024-member chain — the long-diameter
        # mega-cluster this leg exists to stress.
        chain_n, star_n = 1024, 512
        CHAIN_BASE, STAR_BASE = 500_000_000, 600_000_000
        chain = [
            (
                CHAIN_BASE + i,
                [
                    float(math.cos(math.radians(i * 0.08))),
                    float(math.sin(math.radians(i * 0.08))),
                ]
                + [0.0] * (DIM - 2),
            )
            for i in range(chain_n)
        ]
        # Star: hub along dim 2; spoke j tilted 8 deg toward its OWN
        # near-orthogonal direction u_j (seeded random sign vector over
        # dims 3..63, unit norm): every spoke's cos to the hub is
        # cos 8deg = .990 while spoke-spoke cosines are
        # cos^2 8deg + sin^2 8deg * (u_j . u_k) ~ .980 +- .01 — so the
        # hub tops EVERY spoke's list (512 appearances) but links back
        # to only its k, the exact hub shape mutual symmetrization must
        # keep from snowballing into a mega-cluster.
        eps = math.radians(8.0)
        rng = np.random.default_rng(12)
        hub = [0.0] * DIM
        hub[2] = 1.0
        star = [(STAR_BASE, [float(x) for x in hub])]
        for j in range(star_n):
            u = rng.choice([-1.0, 1.0], size=DIM - 3) / math.sqrt(DIM - 3)
            v = [0.0] * 3 + [float(math.sin(eps) * x) for x in u]
            v[2] = math.cos(eps)
            star.append((STAR_BASE + 1 + j, [float(x) for x in v]))
        planted = spark.createDataFrame(
            chain + star, "vec_id long, embedding array<float>"
        )
        corpus = big.unionByName(planted).localCheckpoint(eager=True)
        n_corpus = corpus.count()
        idx = IVFIndex(n_lists=400, nprobe=24).fit(corpus, sample_size=4096)
        assigned = idx.assign(corpus).localCheckpoint(eager=True)

        from dampr_spark.operators import graph as graph_mod

        t0 = time.perf_counter()
        clusters = idx.mutual_knn_clusters(assigned, k=5).localCheckpoint(
            eager=True
        )
        clusters_sec = time.perf_counter() - t0
        n_rows = clusters.count()
        sizes = clusters.groupBy("cluster").count()
        top_sizes = [
            (int(r.cluster), int(r["count"]))
            for r in sizes.orderBy(F.col("count").desc()).limit(3).collect()
        ]
        chain_cluster_size = (
            clusters.filter(
                (F.col("vec_id") >= CHAIN_BASE)
                & (F.col("vec_id") < CHAIN_BASE + chain_n)
            )
            .groupBy("cluster")
            .count()
            .orderBy(F.col("count").desc())
            .first()
        )
        hub_cluster = clusters.filter(F.col("vec_id") == STAR_BASE).first()
        hub_cluster_size = clusters.filter(
            F.col("cluster") == hub_cluster.cluster
        ).count()
        out["clusters_200k"] = {
            "corpus_vectors": n_corpus,
            "wall_sec": round(clusters_sec, 2),
            "cc_rounds": graph_mod.LAST_FIXPOINT_ROUNDS,
            "conserved": n_rows == n_corpus,
            "largest_clusters": top_sizes,
            "chain_largest_cluster_rows": int(chain_cluster_size["count"]),
            "hub_cluster_rows": int(hub_cluster_size),
        }

        t0 = time.perf_counter()
        # clusters= reuse (round 12): the keep-best wall below is the
        # INCREMENTAL cost over the clustering — centroids + max_by —
        # not a second full graph+components chain.
        reps = idx.semantic_keep_best(
            assigned, k=5, clusters=clusters
        ).localCheckpoint(eager=True)
        keep_sec = time.perf_counter() - t0
        member_sum = int(reps.agg(F.sum("n_members")).first()[0])
        dup_reps = (
            reps.groupBy("cluster").count().filter(F.col("count") > 1).count()
        )
        out["keep_best_200k"] = {
            "wall_sec": round(keep_sec, 2),
            "survivors": reps.count(),
            "member_sum_conserved": member_sum == n_corpus,
            "one_rep_per_cluster": dup_reps == 0,
            "largest_cluster_rep_cos": float(
                reps.orderBy(F.col("n_members").desc()).first().rep_cos
            ),
        }
        print(json.dumps(out))
        return 0

    if "--audit-only" in sys.argv:
        print(json.dumps(out))
        return 0

    qrows = e1.orderBy("vec_id").limit(N_QUERIES).collect()
    # Exact ground truth once per query (full 200k scan each).
    t0 = time.perf_counter()
    truth = []
    for r in qrows:
        qvec = [float(x) for x in r.embedding]
        truth.append(
            (qvec, {row.vec_id for row in brute_force_topk(big, qvec, k=K).collect()})
        )
    out["brute_force_sec_per_query"] = round(
        (time.perf_counter() - t0) / len(qrows), 3
    )

    for cfg in CONFIGS:
        n_lists, nprobe = cfg["n_lists"], cfg["nprobe"]
        t0 = time.perf_counter()
        idx = IVFIndex(n_lists=n_lists, nprobe=nprobe).fit(big, sample_size=4096)
        fit_sec = time.perf_counter() - t0
        sq = ScalarQuantizer().fit(big)
        assigned = idx.assign(big)
        # IVF's one-aggregate sizing look: list-depth occupancy.
        occ = assigned.groupBy("list_id").count().agg(
            F.count(F.lit(1)).alias("lists"),
            F.avg("count").alias("avg_rows"),
            F.max("count").alias("max_rows"),
        ).first()
        enc = sq.encode(assigned).select("vec_id", "list_id", "codes")
        work = tempfile.mkdtemp(prefix="ivf100x_")
        codes_path = os.path.join(work, "codes")
        idx.write_partitioned(enc, codes_path, lists_per_file=1)
        layout_bytes = dir_bytes(codes_path)
        stored = spark.read.parquet(codes_path)
        stored.count()  # warm listing

        recalls, fracs, times = [], [], []
        for qvec, exact in truth:
            q = np.asarray(qvec)
            q /= np.linalg.norm(q)
            probes = [int(p) for p in np.argsort(-(idx.centroids @ q))[:nprobe]]
            pruned = stored.filter(F.col("list_id").isin(probes))
            t0 = time.perf_counter()
            got = {row.vec_id for row in sq.topk(pruned, qvec, k=K).collect()}
            times.append(time.perf_counter() - t0)
            fracs.append(
                sum(
                    dir_bytes(os.path.join(codes_path, f"list_id={p}"))
                    for p in probes
                )
                / layout_bytes
            )
            recalls.append(len(got & exact) / K)
        out[cfg["label"]] = {
            "n_lists": n_lists,
            "nprobe": nprobe,
            "fit_sec": round(fit_sec, 3),
            "lists_occupied": int(occ.lists),
            "avg_list_rows": round(float(occ.avg_rows), 1),
            "max_list_rows": int(occ.max_rows),
            "layout_mb": round(layout_bytes / 1e6, 2),
            "expected_bytes_frac": round(nprobe / n_lists, 4),
            "probed_bytes_frac": round(sum(fracs) / len(fracs), 4),
            "recall_at_10": round(sum(recalls) / len(recalls), 3),
            "search_sec_per_query": round(sum(times) / len(times), 3),
        }
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
