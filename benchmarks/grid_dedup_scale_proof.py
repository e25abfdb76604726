"""Grid-semantic-dedup 10x scale spot-proof (round 7): the blocking audit
and the capped pair stage at sf0.1 embeddings x10 (20k vectors, shifted
ids, vectors unchanged — every replica set collides in its cell, the
densest possible growth profile for a blocker).

What the numbers must show: the BLOCKING audit stays cheap at 10x (one
dims-row aggregate + a cell-keyed count, no pair expansion), its n_pairs
column prices the verify stage BEFORE it runs, and the capped pair stage's
work tracks the CAPPED budget, not the raw quadratic (cells driven past
max_cell by replication are dropped, exactly what the cap is for at
100 TB).

Prints one JSON line; a prose row goes into RESULTS.md.

Usage: PYTHONPATH=/root/repo python benchmarks/grid_dedup_scale_proof.py
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from dampr_spark.operators.similarity import grid_cells, semantic_grid_pairs
from dampr_spark.session import get_spark
from dampr_spark.sources.readers import read_table

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed_count(fn):
    t0 = time.perf_counter()
    n = fn().count()
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    fn().count()
    warm = time.perf_counter() - t0
    return n, cold, warm


def cell_audit(df) -> dict:
    cells = grid_cells(df)
    agg = (
        cells.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .agg(
            F.count(F.lit(1)).alias("cells_ge2"),
            F.sum(F.when(F.col("n") > 64, 1).otherwise(0)).alias("cells_over_cap"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("raw_pair_budget"),
            F.sum(
                F.when(F.col("n") <= 64, F.col("n") * (F.col("n") - 1) / 2).otherwise(0)
            ).cast("long").alias("capped_pair_budget"),
        )
        .first()
    )
    return dict(agg.asDict())


def main() -> int:
    spark = get_spark(app_name="grid-dedup-scale-proof")
    emb = read_table(spark, BASE, "embeddings")
    n1 = emb.count()
    e10 = emb
    for i in range(1, 10):
        e10 = e10.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        )
    e10 = e10.localCheckpoint(eager=True)
    n10 = e10.count()

    out = {"metric": "grid_dedup_scale_proof", "vecs_1x": n1, "vecs_10x": n10}

    t0 = time.perf_counter()
    a1 = cell_audit(emb)
    out["audit_1x_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    a10 = cell_audit(e10)
    out["audit_10x_sec"] = round(time.perf_counter() - t0, 3)
    out["audit_1x"] = a1
    out["audit_10x"] = a10

    p1, c1, w1 = timed_count(lambda: semantic_grid_pairs(emb, tau=0.30, max_cell=64))
    p10, c10, w10 = timed_count(lambda: semantic_grid_pairs(e10, tau=0.30, max_cell=64))
    out.update(
        pairs_1x=p1, pairs_1x_cold=round(c1, 3), pairs_1x_warm=round(w1, 3),
        pairs_10x=p10, pairs_10x_cold=round(c10, 3), pairs_10x_warm=round(w10, 3),
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
