"""Sketch-first OLAP — persist four tiny sketch tables ONCE, then answer
the recurring dashboard questions from sketches alone, never rescanning
the corpus. The round-7 sketch quartet, composed:

| question                         | sketch state              | merge op |
|---|---|---|
| how many distinct users?         | HLL registers (≤2^p rows) | max      |
| how often does item X appear?    | CMS cells (d×w ints)      | add      |
| could key K be in the dim set?   | Bloom set bits (≤m rows)  | OR       |
| what's the p50/p95 value?        | histogram buckets (≤256)  | add      |

Every sketch is cross-engine-exact (md5 bit hashes, integer arithmetic),
so each answer here is replayable in DuckDB — and every merge is
associative, so per-shard/per-day sketch tables roll up without touching
raw data again. At 100 TB that is the difference between "one scan per
day, then milliseconds per question" and "one scan per question".

Usage: python examples/sketch_olap.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dampr_spark.operators.sketches import (
    bloom_build,
    bloom_prune,
    cms_build,
    cms_estimate,
    hll_build,
    hll_estimate,
)
from dampr_spark.operators.stats import histogram_quantiles


def sketch_report(events: DataFrame) -> dict[str, float]:
    """Build all four sketches over one events frame and answer one
    question from each, returning {question: sketch_answer}."""
    # 1. distinct users (HLL) — registers merge by max across shards
    hll = hll_build(events, "user_id")
    est_users = hll_estimate(hll).first()["est_distinct"]

    # 2. frequency of the busiest event type (CMS) — cells merge by add
    cms = cms_build(events, "event_type")
    top_type = (
        events.groupBy("event_type")
        .count()
        .orderBy(F.desc("count"), "event_type")
        .first()["event_type"]
    )
    items = events.sparkSession.createDataFrame(
        [(top_type,)], "event_type string"
    )
    est_freq = cms_estimate(cms, items, "event_type").first()["est"]

    # 3. membership pruning (Bloom) — bits merge by OR; prune a probe of
    # candidate user ids down to plausible members before any join
    members = events.filter(F.col("event_type") == "purchase").select("user_id")
    bloom = bloom_build(members, "user_id")
    probe = events.select("user_id").distinct()
    passed = bloom_prune(probe, bloom, "user_id").count()

    # 4. value quantiles (histogram) — buckets merge by add
    q = {
        r["p"]: r["est"]
        for r in histogram_quantiles(events, "value", [0.5, 0.95]).collect()
    }

    return {
        "est_distinct_users": float(est_users),
        "est_top_type_freq": float(est_freq),
        "bloom_passed_user_ids": float(passed),
        "p50_value": float(q[0.5]),
        "p95_value": float(q[0.95]),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("sketch-olap")
        .getOrCreate()
    )
    from dampr_spark.sources.readers import read_table

    events = read_table(spark, sf_dir, "events")
    report = sketch_report(events)
    for k, v in report.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
