"""End-to-end skew-join proof (VERDICT r7 #6): measure the same skewed
join three ways — naive sort-merge with AQE off, AQE's runtime skew-split,
and operators/skew.salted_join — on a 90%-hot-key fixture, and record
when each wins.

Fixture: LEFT = fact rows where 90% share ONE key (the classic hot
customer/session) and the rest spread uniformly; RIGHT = a per-key dim
table too large to broadcast comfortably at real scale (broadcast is
forced OFF so the shuffle-join skew actually manifests, as it would when
the dim side is GBs on a cluster). Join multiplies each left row by its
key's dim rows (fanout > 1 makes the reduce-side work real, not just a
probe).

The interesting comparison is reduce-task balance: naive puts 90% of the
work in ONE task; AQE splits the hot partition's LEFT side at runtime
(OptimizeSkewedJoin); salting pre-spreads it at plan time. AQE needs no
code change but only engages past its size thresholds (lowered here to
match the fixture; at default 256 MB thresholds a skewed-but-small join
silently stays naive). Salting works at any size and under any planner,
at the cost of replicating the right side n_salts times.

Output: one JSON line with wall seconds per strategy + row counts (all
three must agree); also appended as a dated block to RESULTS.md by hand.

Usage: PYTHONPATH=/root/repo python benchmarks/skew_join_proof.py [scale]
  scale multiplies the default 2M-left-row fixture.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    n_left = int(2_000_000 * scale)
    n_keys = 10_000
    fanout = 8  # dim rows per key

    from pyspark.sql import functions as F

    from dampr_spark.operators.skew import salted_join
    from dampr_spark.session import get_spark

    spark = get_spark(app_name="skew-join-proof")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # 90% of left rows hit key 0; the rest uniform over the other keys.
    left = (
        spark.range(n_left)
        .select(
            F.when(F.pmod("id", 10) < 9, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys - 1)) + 1)
            .alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
    )
    right = (
        spark.range(n_keys)
        .select(F.col("id").alias("k"))
        .crossJoin(spark.range(fanout).select(F.col("id").alias("f")))
        .select("k", (F.col("k") * 17 + F.col("f")).cast("double").alias("w"))
    )
    left.write.mode("overwrite").parquet("/tmp/skew_left")
    right.write.mode("overwrite").parquet("/tmp/skew_right")
    left = spark.read.parquet("/tmp/skew_left")
    right = spark.read.parquet("/tmp/skew_right")

    def agg(j):
        return j.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
        )

    def run(tag: str, aqe: bool, skewjoin: bool, salted: bool) -> tuple[float, int]:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skewjoin).lower())
        # Engage AQE's splitter on this fixture's partition sizes (default
        # thresholds are 256 MB-class; the guidance below covers this).
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        j = (
            salted_join(left, right, ["k"])
            if salted
            else left.join(right, "k")
        )
        t0 = time.perf_counter()
        row = agg(j).collect()[0]
        dt = time.perf_counter() - t0
        print(f"# {tag}: {dt:.2f}s n={row['n']}", file=sys.stderr)
        return dt, row["n"]

    # Warm the scans out of the timings.
    left.count(), right.count()

    results = {}
    checks = set()
    for tag, cfg in {
        "naive_no_aqe": (False, False, False),
        "aqe_skew_split": (True, True, False),
        "salted_16": (True, False, True),
        "salted_no_aqe": (False, False, True),
    }.items():
        dt, n = run(tag, *cfg)
        results[tag] = round(dt, 2)
        checks.add(n)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    assert len(checks) == 1, f"strategies disagree on row count: {checks}"
    print(
        json.dumps(
            {
                "metric": "skew_join_proof",
                "n_left": n_left,
                "hot_share": 0.9,
                "fanout": fanout,
                "sec": results,
                "rows": checks.pop(),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
