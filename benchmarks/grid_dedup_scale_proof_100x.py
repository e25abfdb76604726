"""Grid-semantic-dedup 100x (sf10-equivalent) budget-discipline proof
(round 9, VERDICT r8 #7): show that the blocking audit's
``cells_over_cap`` / ``raw_pair_budget`` columns remain the go/no-go
signal TWO decades above the shipped sf0.1, and that the capped pair
stage's wall time tracks the CAPPED budget, not the raw quadratic.

Two 100x fixtures, because the two failure modes differ:

- **organic 100x** — copy ``i`` cyclically ROLLS the 64-dim vector by
  ``i % 64`` and NEGATES it on the second pass (``i >= 64``). Both
  transforms are distance-preserving within a copy (rotation permutes
  coordinates; cosine(a,b) == cosine(-a,-b)), so every organic near-dup
  pair exists once per copy — dup RATE constant, dup COUNT x100, the
  organic scaling model of benchmarks/gen_scale_data.py. The roll alone
  REPEATS at i=64 (dim is 64): copies i and i+64 would differ only by
  jitter at cos~1 — exactly the rejected artificial-clique fixture the
  10x generator documents — hence the sign flip, which puts same-roll
  copies at cosine -1 (antipodal: maximally NOT near-dups). All 100
  (roll, sign) combos are distinct below i=128, so no jitter is needed.
  Expected: audit stays go (over-cap cells scale ~linearly), capped
  budget ~x100, wall sub-linear vs x100 on fixed cores.

- **adversarial 100x** — plain replication with shifted ids (the 10x
  proof's deliberate worst case: every replica set collides in its
  cell). At x100 every original singleton cell holds 100 identical
  vectors (> max_cell 64), so the audit must flag SATURATION —
  cells_over_cap ~ all occupied cells — BEFORE any pair work runs.
  That is the discipline under test: the no-go is priced, not paid.

Measured refinement (first run of this script): at 100x even the ORGANIC
fixture saturates the DEFAULT dims=4 grid — 4^4 = 256 cells x cap 64 is
16k capacity against 200k vectors; capped budget fell BELOW the 1x value
(6,823 vs 12,845) while the raw budget hit 1.08e9. The audit said no-go
and the wall stayed capped (2.1 s — pricing, not paying, the 18,000x raw
growth). The correct 100 TB response is the RESOLUTION knob SemDeDup
turns with k: the script therefore also runs a dims=6 (4,096-cell) leg
at 1x and organic 100x, where the audit flips back to go and capped work
scales with the corpus — grid resolution is a scale PARAMETER, and the
audit is the instrument that tells you when to turn it.

Prints one JSON line; a prose table goes into benchmarks/RESULTS.md.

Usage: PYTHONPATH=/root/repo python benchmarks/grid_dedup_scale_proof_100x.py
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
N_COPIES = 100
MAX_CELL = 64


FINE_DIMS = 6  # 4^6 = 4096 cells: right-sized for the 200k-vector 100x


def cell_audit(df, dims: int = 4) -> dict:
    cells = grid_cells(df, dims=dims)
    agg = (
        cells.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .agg(
            F.count(F.lit(1)).alias("cells_ge2"),
            F.sum(F.when(F.col("n") > MAX_CELL, 1).otherwise(0)).alias(
                "cells_over_cap"
            ),
            F.sum(F.col("n") * (F.col("n") - 1) / 2)
            .cast("long")
            .alias("raw_pair_budget"),
            F.sum(
                F.when(
                    F.col("n") <= MAX_CELL, F.col("n") * (F.col("n") - 1) / 2
                ).otherwise(0)
            )
            .cast("long")
            .alias("capped_pair_budget"),
        )
        .first()
    )
    return dict(agg.asDict())


def organic_100x(emb):
    """Roll + second-pass sign flip + per-copy id offset; see module doc."""
    copies = []
    for i in range(N_COPIES):
        k = i % 64
        sign = -1.0 if i >= 64 else 1.0
        rolled = (
            F.concat(
                F.slice(F.col("embedding"), k + 1, 64 - k),
                F.slice(F.col("embedding"), 1, k),
            )
            if k
            else F.col("embedding")
        )
        vec = F.transform(rolled, lambda x: (x * F.lit(sign)).cast("float"))
        copies.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def adversarial_100x(emb):
    out = emb
    for i in range(1, N_COPIES):
        out = out.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        )
    return out


def timed_count(fn):
    t0 = time.perf_counter()
    n = fn().count()
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    fn().count()
    warm = time.perf_counter() - t0
    return n, cold, warm


def main() -> int:
    spark = get_spark(app_name="grid-dedup-scale-proof-100x")
    emb = read_table(spark, BASE, "embeddings")
    out = {"metric": "grid_dedup_scale_proof_100x", "vecs_1x": emb.count()}

    org = organic_100x(emb).localCheckpoint(eager=True)
    adv = adversarial_100x(emb).localCheckpoint(eager=True)
    out["vecs_100x"] = org.count()
    assert adv.count() == out["vecs_100x"]

    # Audits first: each must price its pair stage BEFORE any pair runs.
    t0 = time.perf_counter()
    out["audit_1x"] = cell_audit(emb)
    out["audit_1x_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    out["audit_organic_100x"] = cell_audit(org)
    out["audit_organic_100x_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    out["audit_adversarial_100x"] = cell_audit(adv)
    out["audit_adversarial_100x_sec"] = round(time.perf_counter() - t0, 3)
    # Resolution scale path: the finer grid the default-res audits above
    # say 100x needs.
    t0 = time.perf_counter()
    out["audit_1x_fine"] = cell_audit(emb, dims=FINE_DIMS)
    out["audit_1x_fine_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    out["audit_organic_100x_fine"] = cell_audit(org, dims=FINE_DIMS)
    out["audit_organic_100x_fine_sec"] = round(time.perf_counter() - t0, 3)

    # Pair stages: 1x baseline, organic 100x (the go case), adversarial
    # 100x (the audit said no-go; the cap makes running it anyway cheap —
    # saturated cells are DROPPED, which is the point).
    p1, c1, w1 = timed_count(
        lambda: semantic_grid_pairs(emb, tau=0.30, max_cell=MAX_CELL)
    )
    po, co, wo = timed_count(
        lambda: semantic_grid_pairs(org, tau=0.30, max_cell=MAX_CELL)
    )
    pa, ca, wa = timed_count(
        lambda: semantic_grid_pairs(adv, tau=0.30, max_cell=MAX_CELL)
    )
    pf1, cf1, wf1 = timed_count(
        lambda: semantic_grid_pairs(emb, dims=FINE_DIMS, tau=0.30, max_cell=MAX_CELL)
    )
    pfo, cfo, wfo = timed_count(
        lambda: semantic_grid_pairs(org, dims=FINE_DIMS, tau=0.30, max_cell=MAX_CELL)
    )
    out.update(
        pairs_1x=p1, pairs_1x_cold=round(c1, 3), pairs_1x_warm=round(w1, 3),
        pairs_organic_100x=po,
        pairs_organic_100x_cold=round(co, 3),
        pairs_organic_100x_warm=round(wo, 3),
        pairs_adversarial_100x=pa,
        pairs_adversarial_100x_cold=round(ca, 3),
        pairs_adversarial_100x_warm=round(wa, 3),
        pairs_1x_fine=pf1,
        pairs_1x_fine_cold=round(cf1, 3),
        pairs_1x_fine_warm=round(wf1, 3),
        pairs_organic_100x_fine=pfo,
        pairs_organic_100x_fine_cold=round(cfo, 3),
        pairs_organic_100x_fine_warm=round(wfo, 3),
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
