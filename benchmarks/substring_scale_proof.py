"""Substring-dedup 10x scale spot-proof (round 7).

Corpus: sf0.1 documents (5k docs) unioned 10x with shifted doc_ids. NOTE
the workload is ADVERSARIALLY superlinear by construction: replication
makes every doc verbatim-identical to its 9 copies, so every anchor's
posting list densifies 10x and the TRUE answer itself grows ~C(10,2)x
(every cross-copy pair is a genuine full-doc span — exactly the
duplication mass the operator exists to find). An organic 10x corpus
brings new content instead. We therefore report wall-clock alongside the
output growth (spans found), the per-gram pair fan-out the cap admits,
and the hash_anchors variant (the 100 TB shuffle-key path).

Prints one JSON line; a prose row goes into RESULTS.md.

Usage: PYTHONPATH=/root/repo python benchmarks/substring_scale_proof.py
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from dampr_spark.operators.dedup import repeated_substring_spans, trim_repeated_spans
from dampr_spark.session import get_spark
from dampr_spark.sources.readers import read_table

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn):
    t0 = time.perf_counter()
    n = fn().write.format("noop").mode("overwrite").save()
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    warm = time.perf_counter() - t0
    return cold, warm


def main() -> int:
    spark = get_spark(app_name="substring-scale-proof")
    docs = read_table(spark, BASE, "documents")
    n1 = docs.count()
    d10 = docs
    for i in range(1, 10):
        d10 = d10.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        )
    d10 = d10.localCheckpoint(eager=True)
    n10 = d10.count()

    out = {"metric": "substring_scale_proof", "docs_1x": n1, "docs_10x": n10}

    c1, w1 = timed(lambda: repeated_substring_spans(docs, min_len=20, max_posting=64))
    c10, w10 = timed(lambda: repeated_substring_spans(d10, min_len=20, max_posting=64))
    s1 = repeated_substring_spans(docs, min_len=20, max_posting=64).count()
    s10 = repeated_substring_spans(d10, min_len=20, max_posting=64).count()
    out.update(
        spans_1x=s1, spans_10x=s10,
        spans_cold_1x=round(c1, 2), spans_warm_1x=round(w1, 2),
        spans_cold_10x=round(c10, 2), spans_warm_10x=round(w10, 2),
        spans_warm_factor=round(w10 / w1, 2),
        output_growth=round(s10 / max(s1, 1), 1),
    )

    hc10, hw10 = timed(
        lambda: repeated_substring_spans(
            d10, min_len=20, max_posting=64, hash_anchors=True
        )
    )
    out.update(hash_anchor_cold_10x=round(hc10, 2), hash_anchor_warm_10x=round(hw10, 2))

    tc10, tw10 = timed(lambda: trim_repeated_spans(d10, min_len=20, max_posting=64))
    out.update(trim_cold_10x=round(tc10, 2), trim_warm_10x=round(tw10, 2))

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
