#!/usr/bin/env python
"""Decompose the per-query session floor (round 15, VERDICT r14 #4).

For a handful of CHEAP bench queries (whose warm time IS mostly floor),
split each warm execution into:

- ``build``   — builder(spark, sf_dir) wall time (read_table listing +
  schema, Python plan construction, any eager pin jobs)
- ``action``  — the noop write (Catalyst analyze/optimize/plan + jobs)

and separately time ``read_table`` construction for each table, with and
without a warm repeat, so the parquet-listing share of the floor is
measured rather than guessed.

Usage: python benchmarks/floor_profile.py [query ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dampr_spark.plans import all_queries  # noqa: E402
from dampr_spark.session import get_spark  # noqa: E402

CHEAP = [
    "pack_token_budget",
    "wordcount",
    "events_hourly",
    "q6_forecast_revenue",
    "chunk_documents",
    "exact_dedup",
    "q1_pricing_summary",
    "sessionization",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or CHEAP
    spark = get_spark(app_name="floor-profile")
    catalog = all_queries()

    # Warm up JVM + workers.
    catalog["count_total"].builder(spark, sf_dir).collect()

    from dampr_spark.sources.readers import TABLES, read_table

    print("== read_table construction (3 reps each) ==")
    for t in ("lineitem", "documents", "events", "orders", "embeddings"):
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            read_table(spark, sf_dir, t)
            reps.append(time.perf_counter() - t0)
        print(f"  {t:12s} {['%.3f' % r for r in reps]}")

    def run(name: str) -> tuple[float, float]:
        t0 = time.perf_counter()
        df = catalog[name].builder(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(True)
        return t1 - t0, t2 - t1

    print("== per-query build vs action (cold + 3 warm) ==")
    for name in names:
        cold = run(name)
        warm = [run(name) for _ in range(3)]
        wb = sorted(w[0] for w in warm)[1]
        wa = sorted(w[1] for w in warm)[1]
        print(
            f"  {name:28s} cold build {cold[0]:.3f} action {cold[1]:.3f} | "
            f"warm build {wb:.3f} action {wa:.3f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
