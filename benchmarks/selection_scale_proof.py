"""Selection-family 10x scale spot-proof (round 7): DSIR importance
weights and bigram-LM perplexity at sf0.1 documents x10 (50k docs,
shifted ids). Replication densifies every bigram/bucket count ~10x while
the model tables stay bucket/vocabulary-sized — the expected shape is
near-linear wall growth dominated by the one pair-explode pass.

DSIR keeps the TARGET fixed (the 1x en slice — a target is an eval-side
artifact that does not grow with the raw corpus).

Prints one JSON line; a prose row goes into RESULTS.md.

Usage: PYTHONPATH=/root/repo python benchmarks/selection_scale_proof.py
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from dampr_spark.operators.selection import (
    bigram_doc_perplexity,
    dsir_importance_weights,
)
from dampr_spark.session import get_spark
from dampr_spark.sources.readers import read_table

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn):
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    warm = time.perf_counter() - t0
    return cold, warm


def main() -> int:
    spark = get_spark(app_name="selection-scale-proof")
    docs = read_table(spark, BASE, "documents")
    n1 = docs.count()
    d10 = docs
    for i in range(1, 10):
        d10 = d10.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        )
    d10 = d10.localCheckpoint(eager=True)
    n10 = d10.count()
    target = docs.filter(F.col("lang") == "en").localCheckpoint(eager=True)

    out = {"metric": "selection_scale_proof", "docs_1x": n1, "docs_10x": n10}

    c1, w1 = timed(lambda: dsir_importance_weights(docs, target))
    c10, w10 = timed(lambda: dsir_importance_weights(d10, target))
    out.update(
        dsir_cold_1x=round(c1, 2), dsir_warm_1x=round(w1, 2),
        dsir_cold_10x=round(c10, 2), dsir_warm_10x=round(w10, 2),
        dsir_warm_factor=round(w10 / w1, 2),
    )

    c1, w1 = timed(lambda: bigram_doc_perplexity(docs))
    c10, w10 = timed(lambda: bigram_doc_perplexity(d10))
    out.update(
        ppl_cold_1x=round(c1, 2), ppl_warm_1x=round(w1, 2),
        ppl_cold_10x=round(c10, 2), ppl_warm_10x=round(w10, 2),
        ppl_warm_factor=round(w10 / w1, 2),
    )

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
