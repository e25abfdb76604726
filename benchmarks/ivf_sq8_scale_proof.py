"""IVF + SQ8 10x scale spot-proof (round 7, VERDICT r6 next-7).

Question: at 10x the corpus, does the partitioned IVF layout still deliver
(a) bytes-read ~= nprobe/n_lists of the corpus (directory partition
pruning is real I/O, not a post-scan filter), (b) the 4x SQ8 storage
compression, and (c) recall vs the exact float brute-force search?

Corpus: sf0.1 embeddings (2k vectors) unioned 10x with shifted vec_ids
(20k vectors, same 64-dim distribution). The layout stores ONLY
(vec_id, codes) hive-partitioned by list_id — float vectors are never
written. Bytes are measured two ways: on-disk file bytes under the probed
directories vs the whole layout (what a scan must read), and the scan
node's own "size of files read" metric from the executed plan.

Prints one JSON line; a prose row goes into RESULTS.md.

Usage: PYTHONPATH=/root/repo python benchmarks/ivf_sq8_scale_proof.py
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import numpy as np
from pyspark.sql import functions as F

from dampr_spark.functions.vector import valid_vector
from dampr_spark.operators.similarity import IVFIndex, ScalarQuantizer, brute_force_topk
from dampr_spark.session import get_spark
from dampr_spark.sources.readers import read_table

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_LISTS, NPROBE, K = 16, 4, 10


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def scan_files_size(df) -> int:
    """The 'size of files read' metric off an ALREADY-COLLECTED DataFrame's
    executed plan — the engine's own account of what the (pruned) scan
    read. Must be called on the same Dataset object the action ran on
    (each new Dataset gets a fresh QueryExecution with zeroed metrics)."""
    plan = df._jdf.queryExecution().executedPlan()
    stack = [plan]
    while stack:
        node = stack.pop()
        if "Scan" in node.nodeName():
            m = node.metrics()
            if m.contains("filesSize"):
                return int(m.apply("filesSize").value())
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))
    return -1


def main() -> int:
    spark = get_spark(app_name="ivf-sq8-scale-proof")
    e1 = read_table(spark, BASE, "embeddings").filter(valid_vector("embedding"))
    e10 = e1
    for i in range(1, 10):
        e10 = e10.unionByName(
            e1.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        )
    e10 = e10.localCheckpoint(eager=True)
    n10 = e10.count()

    idx = IVFIndex(n_lists=N_LISTS, nprobe=NPROBE).fit(e10, sample_size=2048)
    sq = ScalarQuantizer().fit(e10)
    enc = sq.encode(idx.assign(e10)).select("vec_id", "list_id", "codes")

    work = tempfile.mkdtemp(prefix="ivf_sq8_")
    codes_path = os.path.join(work, "codes")
    float_path = os.path.join(work, "floats")
    idx.write_partitioned(enc, codes_path)
    idx.write_partitioned(idx.assign(e10).select("vec_id", "list_id", "embedding"), float_path)

    codes_bytes, float_bytes = dir_bytes(codes_path), dir_bytes(float_path)

    # 20 queries: the first 20 base vectors (same ids exist in the 10x frame)
    qrows = e1.orderBy("vec_id").limit(20).collect()
    stored = spark.read.parquet(codes_path)
    stored.count()  # warm page cache / file listing

    recalls, probed_fracs, metric_fracs, times = [], [], [], []
    for r in qrows:
        qvec = [float(x) for x in r.embedding]
        q = np.asarray(qvec)
        q /= np.linalg.norm(q)
        probes = [int(p) for p in np.argsort(-(idx.centroids @ q))[:NPROBE]]
        pruned = stored.filter(F.col("list_id").isin(probes))

        t0 = time.perf_counter()
        res_df = sq.topk(pruned, qvec, k=K)
        got = {row.vec_id for row in res_df.collect()}
        times.append(time.perf_counter() - t0)

        probed_fracs.append(
            sum(dir_bytes(os.path.join(codes_path, f"list_id={p}")) for p in probes)
            / codes_bytes
        )
        ms = scan_files_size(res_df)
        if ms > 0:
            metric_fracs.append(ms / codes_bytes)

        exact = {row.vec_id for row in brute_force_topk(e10, qvec, k=K).collect()}
        recalls.append(len(got & exact) / K)

    out = {
        "metric": "ivf_sq8_scale_proof",
        "corpus_vectors": n10,
        "n_lists": N_LISTS,
        "nprobe": NPROBE,
        "expected_bytes_frac": NPROBE / N_LISTS,
        "probed_dir_bytes_frac": round(sum(probed_fracs) / len(probed_fracs), 4),
        "scan_metric_bytes_frac": (
            round(sum(metric_fracs) / len(metric_fracs), 4) if metric_fracs else None
        ),
        "codes_layout_mb": round(codes_bytes / 1e6, 2),
        "float_layout_mb": round(float_bytes / 1e6, 2),
        "compression": round(float_bytes / codes_bytes, 2),
        "recall_at_10_vs_exact_float": round(sum(recalls) / len(recalls), 3),
        "avg_pruned_search_sec": round(sum(times) / len(times), 3),
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
