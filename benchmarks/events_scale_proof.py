"""Events-table 10x scale spot-proof (round 5).

The dedup/curation families carry 10x proofs (RESULTS.md); this covers the
window / as-of / sessionization family, whose scale risk is different: the
per-user window partition. Two corpora, built from sf0.1 `events` (100k
rows, ~2k users, max ~100 events/user):

- **10x**: events unioned 10x with shifted event_ids and per-copy +1s ts
  offsets, SAME user_ids — per-user partitions densify 10x (max ~1k
  events/user), total 1M rows.
- **10x + hot user**: the 10x corpus plus one pathological user whose
  events are replicated until they hold ~9% of the whole table (~99k events
  in ONE window partition) — the one-hot-influencer shape AQE canNOT fix
  for window functions (windows are not joins; no runtime splitting).

For each corpus the four flagship event queries run twice (cold/warm) and
the max single-task duration + peak execution memory of every stage are
pulled from the Spark REST API — the straggler evidence wall-clock hides at
32 cores but that dominates a 1000-executor rollout.

Run: PYTHONPATH=/root/repo python benchmarks/events_scale_proof.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dampr_spark.plans import all_queries
from dampr_spark.session import get_spark
from dampr_spark.sources.readers import read_table

QUERIES = (
    "rolling_event_value",
    "sessionization",
    "asof_last_click",
    "conversion_lag_quantiles",
)

BASE = "/root/testdata/sf0.1"
DIR_10X = "/tmp/events10x"
DIR_HOT = "/tmp/events10x_hot"
HOT_USER = 342  # most active user at sf0.1 (~99 events -> ~990 at 10x)


def build_corpora(spark) -> None:
    e = read_table(spark, BASE, "events")
    copies = [
        e.select(
            (F.col("event_id") + i * 10_000_000).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {i} SECONDS")).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        for i in range(10)
    ]
    ten = copies[0]
    for c in copies[1:]:
        ten = ten.unionAll(c)
    for d in (DIR_10X, DIR_HOT):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
    ten.write.mode("overwrite").parquet(f"{DIR_10X}/events.parquet")

    ten = spark.read.parquet(f"{DIR_10X}/events.parquet")
    hot_src = ten.filter(F.col("user_id") == HOT_USER)
    hot_copies = [
        hot_src.select(
            (F.col("event_id") + 1_000_000_000 + i * 10_000_000).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {i * 7} SECONDS")).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        for i in range(100)
    ]
    hot = ten
    for c in hot_copies:
        hot = hot.unionAll(c)
    hot.write.mode("overwrite").parquet(f"{DIR_HOT}/events.parquet")


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}", timeout=10) as r:
        return json.load(r)


def _stage_extremes(spark, stage_ids) -> tuple[float, float]:
    """(max single-task duration sec, max task peak execution memory MiB)
    across the given stages, via /taskSummary quantiles."""
    max_dur = 0.0
    max_mem = 0.0
    for sid in stage_ids:
        try:
            s = _rest(spark, f"/stages/{sid}/0/taskSummary?quantiles=1.0")
            max_dur = max(max_dur, s["duration"][-1] / 1000.0)
            max_mem = max(max_mem, s["peakExecutionMemory"][-1] / 2**20)
        except Exception:
            continue
    return max_dur, max_mem


def run_query(spark, name: str, sf_dir: str):
    catalog = all_queries()
    sc = spark.sparkContext
    group = f"{name}@{os.path.basename(sf_dir)}"
    sc.setJobGroup(group, group)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        catalog[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        times.append(time.perf_counter() - t0)
    tracker = sc.statusTracker()
    stage_ids: set[int] = set()
    for jid in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(jid)
        if info:
            stage_ids.update(info.stageIds)
    sc.setJobGroup("", "")
    max_dur, max_mem = _stage_extremes(spark, stage_ids)
    return {
        "cold_sec": round(times[0], 3),
        "warm_sec": round(times[1], 3),
        "max_task_sec": round(max_dur, 3),
        "max_task_peak_mem_mib": round(max_mem, 1),
    }


def main() -> int:
    spark = get_spark(
        app_name="events-scale-proof", extra_conf={"spark.ui.enabled": "true"}
    )
    build_corpora(spark)
    n10 = spark.read.parquet(f"{DIR_10X}/events.parquet").count()
    nhot = spark.read.parquet(f"{DIR_HOT}/events.parquet").count()
    print(f"10x rows: {n10}  hot rows: {nhot}")

    out: dict[str, dict] = {}
    for sf_dir, label in ((BASE, "1x"), (DIR_10X, "10x"), (DIR_HOT, "10x_hot")):
        for q in QUERIES:
            r = run_query(spark, q, sf_dir)
            out[f"{q}@{label}"] = r
            print(f"{q}@{label}: {r}")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
