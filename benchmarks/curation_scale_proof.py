"""Curation-family 10x scale spot-proof (round 6).

Covers the round-6 text-curation flagships, whose scale risks differ:

- **fuzzy decontamination** — cost model is |corpus grams| x (bench docs
  sharing each gram). The honest 10x shape keeps the BENCHMARK side fixed
  (an eval suite does not grow with the training corpus) and grows only
  the corpus: cost must scale ~linearly. (Scaling the catalog query's
  %97 fixture would grow the bench 10x too and quadratic-blow by design —
  that is a fixture artifact, not the operator's scale behavior, so this
  proof drives the operator form `examples/corpus_prep.decontaminate`.)
- **n-gram novelty** — one gram-keyed min shuffle + join-back; hot grams
  (every gram appears in ~10x more docs in the copied corpus — the
  boilerplate shape) must collapse map-side, never concentrate a task.

Corpus: sf0.1 documents unioned 10x with shifted doc_ids (5k -> 50k docs;
every gram's posting list densifies ~10x — adversarially WORSE than an
organic 10x corpus, which also brings new grams).

For each operator: cold + warm wall-clock at 1x and 10x, plus the max
single-task duration of the heaviest stage from the Spark REST API — the
straggler evidence wall-clock hides at 32 cores.

Run: PYTHONPATH=/root/repo python benchmarks/curation_scale_proof.py
"""

from __future__ import annotations

import os
import sys
import time
import urllib.request
import json

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dampr_spark.operators.dedup import ngram_novelty_scores
from dampr_spark.session import get_spark
from dampr_spark.sources.readers import read_table

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))
from corpus_prep import decontaminate  # noqa: E402

BASE = "/root/testdata/sf0.1"


def max_task_sec(spark) -> float:
    """Largest single-task duration (sec) across the app's completed
    stages, via the per-stage /taskSummary quantiles endpoint (the same
    probe events_scale_proof.py uses)."""
    ui = spark.sparkContext.uiWebUrl
    if ui is None:  # UI disabled in this session config — no REST probe
        return float("nan")
    app = spark.sparkContext.applicationId

    def rest(path):
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}{path}", timeout=10
        ) as r:
            return json.load(r)

    worst = 0.0
    for s in rest("/stages?status=complete"):
        try:
            q = rest(f"/stages/{s['stageId']}/0/taskSummary?quantiles=1.0")
            worst = max(worst, q["duration"][-1] / 1000.0)
        except Exception:
            continue
    return worst


def release_new_checkpoints(keep_ids):
    """Unpersist checkpoint blocks created by the measured run, but never
    the fixture corpora (their localCheckpoint lineage is truncated —
    unpersisting them would make recompute impossible)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid, rdd in dict(jmap).items():
        if rid not in keep_ids:
            rdd.unpersist(True)


def run(label, fn):
    keep = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    cold = time.perf_counter() - t0
    release_new_checkpoints(keep)
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    warm = time.perf_counter() - t0
    release_new_checkpoints(keep)
    print(f"{label}: cold {cold:.2f}s warm {warm:.2f}s")
    return warm


def main() -> int:
    global spark
    spark = get_spark(app_name="curation-scale-proof", extra_conf={"spark.ui.enabled": "true"})
    docs = read_table(spark, BASE, "documents")
    n = docs.count()
    docs10 = docs
    for i in range(1, 10):
        docs10 = docs10.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        )
    docs10 = docs10.localCheckpoint(eager=True)
    print(f"docs 1x={n} 10x={docs10.count()}")

    bench = docs.filter(F.col("doc_id") % 97 == 0).localCheckpoint(eager=True)
    print(f"bench (fixed): {bench.count()} docs")

    w1 = run("decontaminate 1x", lambda: decontaminate(docs, bench, tau=0.05))
    w10 = run("decontaminate 10x", lambda: decontaminate(docs10, bench, tau=0.05))
    print(f"decontaminate scaling factor (warm, 10x data): {w10 / w1:.2f}x")

    n1 = run("novelty 1x", lambda: ngram_novelty_scores(docs))
    n10 = run("novelty 10x", lambda: ngram_novelty_scores(docs10))
    print(f"novelty scaling factor (warm, 10x data): {n10 / n1:.2f}x")
    worst = max_task_sec(spark)
    if worst == worst:  # not NaN
        print(f"max single-task sec across app: {worst:.2f}")
    else:
        print("max single-task probe skipped (spark.ui disabled)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
