"""Events-family 100x budget proof (round 10): the window / as-of /
sessionization family taken two decades up, with the family's new sizing
instrument (`window_frame_audit`) pricing every corpus BEFORE a window
run pays it — the same audit-then-run discipline as the grid, decontam,
and banded-LSH 100x proofs.

The family's scale axis is different from the dedup families': not pair
budgets but PER-KEY PARTITION MASS. `Window.partitionBy(user)` puts every
row of a user into one task, and AQE cannot split a window partition
(frames may span any split point) — so the question at 100x is which
GROWTH MODEL the corpus followed:

- **organic 100x** — 100 copies with NEW user ids per copy (10M rows,
  150k users, per-user mass unchanged at <=99 events). The audit must
  show max_key_rows flat and est_frame_rows ~100x; every query must
  scale ~linearly (more partitions, same partition size — the shape a
  1000-executor rollout absorbs by adding executors).
- **dense 100x** — 100 copies with the SAME user ids, +i s time shifts
  (10M rows, 1,500 users, per-user mass x100: max ~9,900 events over the
  same 30-day span ~ 14/hour-bucket). Partitions densify but stay small;
  the audit prices the new max task and the plain window remains a go.
- **dense 100x + hot user** — the densest user replicated to ~1M events
  (~9% of the table, ~1,400/hour-bucket). The audit must flag the plain
  rolling window as a no-go — max_key_rows ~1e6 in ONE unsplittable task
  with an est frame share of ~2.8e9 row-visits — WITHOUT paying it
  (pay-budget guard, like the LSH proof's adversarial leg), while the
  bucketed twin (`rolling_event_value_bucketed`, max task bounded by
  2x hot-user-rows-per-hour regardless of user heat) is paid and timed.
  Sessionization / as-of / lag-quantiles still run on the hot corpus:
  their per-row work is O(1) (lag / merge / rank-select), so a 1M-row
  sort task is tolerable where a sliding re-aggregation is not — the
  audit's two columns (partition mass vs frame mass) separate exactly
  these two failure classes.

Reuses the r5 spot-proof's REST straggler instrumentation
(benchmarks/events_scale_proof.py): per-query cold/warm wall plus max
single-task duration and peak task memory — the straggler evidence
wall-clock hides at local[32] but that dominates a real cluster stage.

Prints one JSON line; prose goes to benchmarks/RESULTS.md.

Run: PYTHONPATH=/root/repo python benchmarks/events_scale_proof_100x.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.events_scale_proof import run_query  # noqa: E402
from dampr_spark.operators.skew import window_frame_audit  # noqa: E402
from dampr_spark.session import get_spark  # noqa: E402
from dampr_spark.sources.readers import read_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
N_COPIES = 100
DIR_ORGANIC = "/tmp/events100x_organic"
DIR_DENSE = "/tmp/events100x_dense"
DIR_HOT = "/tmp/events100x_hot"
HOUR_US = 3_600_000_000

QUERIES = (
    "sessionization",
    "rolling_event_value",
    "asof_last_click",
    "conversion_lag_quantiles",
)
# Plain-window pay guards: a window stage is a no-go when one
# unsplittable key exceeds this many rows, or the total sliding-frame
# budget exceeds this many row-visits.
KEY_BUDGET = 100_000
FRAME_BUDGET = 2_000_000_000


def build_corpora(spark) -> None:
    e = read_table(spark, BASE, "events")
    copies = F.broadcast(
        spark.range(N_COPIES).select(F.col("id").alias("_copy"))
    )

    def stamped(user_expr):
        return e.crossJoin(copies).select(
            (F.col("event_id") + F.col("_copy") * 10_000_000).alias("event_id"),
            (
                F.col("ts").cast("timestamp")
                + F.make_interval(secs=F.col("_copy").cast("double"))
            ).alias("ts"),
            user_expr.alias("user_id"),
            "event_type",
            "value",
            "props",
        )

    for d in (DIR_ORGANIC, DIR_DENSE, DIR_HOT):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
    stamped(F.col("user_id") + F.col("_copy") * 1_000_000).write.mode(
        "overwrite"
    ).parquet(f"{DIR_ORGANIC}/events.parquet")
    dense = stamped(F.col("user_id"))
    dense.write.mode("overwrite").parquet(f"{DIR_DENSE}/events.parquet")

    dense = spark.read.parquet(f"{DIR_DENSE}/events.parquet")
    hot_user = (
        dense.groupBy("user_id").count().orderBy(F.desc("count")).first().user_id
    )
    hot_src = dense.filter(F.col("user_id") == hot_user)
    reps = F.broadcast(spark.range(100).select(F.col("id").alias("_rep")))
    hot_extra = hot_src.crossJoin(reps).select(
        (
            F.col("event_id") + 1_000_000_000 + F.col("_rep") * 10_000_000
        ).alias("event_id"),
        (
            F.col("ts").cast("timestamp")
            + F.make_interval(secs=(F.col("_rep") * 7).cast("double"))
        ).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    dense.unionByName(hot_extra).write.mode("overwrite").parquet(
        f"{DIR_HOT}/events.parquet"
    )


def audit(spark, sf_dir: str) -> dict:
    e = read_table(spark, sf_dir, "events")
    t0 = time.perf_counter()
    r = window_frame_audit(
        e,
        keys=["user_id"],
        ts_us_col=F.unix_micros(F.col("ts").cast("timestamp")),
        range_us=HOUR_US,
    ).first()
    d = dict(r.asDict())
    d["audit_sec"] = round(time.perf_counter() - t0, 3)
    return d


def main() -> int:
    spark = get_spark(
        app_name="events-scale-proof-100x",
        extra_conf={"spark.ui.enabled": "true"},
    )
    build_corpora(spark)
    out: dict[str, object] = {"metric": "events_scale_proof_100x"}

    for sf_dir, label in (
        (BASE, "1x"),
        (DIR_ORGANIC, "organic_100x"),
        (DIR_DENSE, "dense_100x"),
        (DIR_HOT, "dense_100x_hot"),
    ):
        a = audit(spark, sf_dir)
        out[f"audit@{label}"] = a
        plain_go = (
            a["max_key_rows"] <= KEY_BUDGET
            and a["est_frame_rows"] <= FRAME_BUDGET
        )
        out[f"plain_window_go@{label}"] = plain_go
        for q in QUERIES:
            if q == "rolling_event_value" and not plain_go:
                out[f"{q}@{label}"] = None  # priced no-go: not paid
                continue
            out[f"{q}@{label}"] = run_query(spark, q, sf_dir)
        # The remedy rides along wherever per-user mass grew.
        if label in ("dense_100x", "dense_100x_hot"):
            out[f"rolling_event_value_bucketed@{label}"] = run_query(
                spark, "rolling_event_value_bucketed", sf_dir
            )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
