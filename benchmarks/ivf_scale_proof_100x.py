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
        if "--knn-only" in sys.argv:
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
