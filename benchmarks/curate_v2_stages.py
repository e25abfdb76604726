#!/usr/bin/env python
"""Stage-level timing for curate_training_slice_v2 (round 15, VERDICT
r14 #3): where do its ~8-9 s at sf0.1 actually go?

Times cumulative pipeline prefixes (each in a fresh lineage, noop sink,
released checkpoints between runs) so stage cost = delta between
consecutive prefixes:

  P1 corpus scan + fp/q + exact keep-best pin
  P2 + ngram_jaccard_pairs
  P3 + drop_near_dups_keep_best (converge) + bench-mod split pin
  P4 + ngram_contamination + clean filter + gate pin
  P5 + DSIR weights + selection join
  P6 full query (manifest aggregate)

Usage: python benchmarks/curate_v2_stages.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dampr_spark.operators import dedup  # noqa: E402
from dampr_spark.operators.pinning import pin_once as _pin  # noqa: E402
from dampr_spark.operators.selection import (  # noqa: E402
    dsir_importance_weights_flagged,
)
from dampr_spark.plans import all_queries  # noqa: E402
from dampr_spark.plans.pipelineops import (  # noqa: E402
    _BENCH_MOD,
    _CURATE_CONTAM_MAX,
    _CURATE_Q_GATE,
    _DSIR_BUCKETS,
)
from dampr_spark.session import get_spark  # noqa: E402
from dampr_spark.sources.readers import read_table  # noqa: E402
from dampr_spark.functions import text as T  # noqa: E402


def build_prefix(spark, sf_dir, stage: int):
    d = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            "lang",
            "text",
            T.fingerprint("text").alias("fp"),
            T.quality_score("text").alias("q"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    exact_best = (
        d.groupBy("fp")
        .agg(
            F.max(
                F.struct(
                    F.col("q"),
                    (-F.col("doc_id")).alias("negid"),
                    F.col("text"),
                    F.col("lang"),
                )
            ).alias("m")
        )
        .select(
            (-F.col("m.negid")).alias("doc_id"),
            F.col("m.text").alias("text"),
            F.col("m.lang").alias("lang"),
            F.col("m.q").alias("q"),
        )
        .transform(_pin)
    )
    if stage == 1:
        return exact_best, d
    pairs = dedup.ngram_jaccard_pairs(
        exact_best, n=3, threshold=0.1, max_posting=64
    ).select("id_a", "id_b")
    if stage == 2:
        return pairs, d
    survivors = dedup.drop_near_dups_keep_best(
        exact_best, pairs, F.col("q"), iters="converge"
    )
    surv = survivors.filter(F.col("doc_id") % _BENCH_MOD != 0).transform(_pin)
    if stage == 3:
        return surv, d
    bench = d.filter(F.col("doc_id") % _BENCH_MOD == 0)
    contam = dedup.ngram_contamination(surv, bench, n=3)
    clean_ids = contam.filter(
        F.col("contamination") < _CURATE_CONTAM_MAX
    ).select("doc_id")
    gated = (
        surv.join(clean_ids, "doc_id")
        .filter(F.col("q") >= _CURATE_Q_GATE)
        .transform(_pin)
    )
    if stage == 4:
        return gated, d
    weights = dsir_importance_weights_flagged(
        gated, F.col("lang") == "en", n_buckets=_DSIR_BUCKETS
    )
    sel = gated.join(
        weights.filter(F.col("log_weight") > 0).select("doc_id", "log_weight"),
        "doc_id",
    )
    if stage == 5:
        return sel, d
    raise ValueError(stage)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="curate-v2-stages")
    catalog = all_queries()
    catalog["count_total"].builder(spark, sf_dir).collect()

    def release():
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(True)

    def timed(fn):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        release()
        return dt

    def run_stage(stage):
        def f():
            out, d = build_prefix(spark, sf_dir, stage)
            out.write.format("noop").mode("overwrite").save()
            d.unpersist()
        return f

    def run_full():
        def f():
            catalog["curate_training_slice_v2"].builder(
                spark, sf_dir
            ).write.format("noop").mode("overwrite").save()
        return f

    for label, fn in [
        ("P1 exact_best pin", run_stage(1)),
        ("P2 +jaccard pairs", run_stage(2)),
        ("P3 +keep_best converge+surv pin", run_stage(3)),
        ("P4 +contamination+gate pin", run_stage(4)),
        ("P5 +dsir select", run_stage(5)),
        ("P6 full query", run_full()),
    ]:
        ts = [timed(fn) for _ in range(reps)]
        print(f"{label:34s} {['%.2f' % t for t in ts]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
