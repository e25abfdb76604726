"""Heavy-hitter sketch: Misra-Gries merge properties, exactness of the
two-pass plan, and the certified fallback on flat data."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from dampr_spark.operators.sketches import _mg_merge, heavy_hitters


def _exact_topk(items: list[str], k: int) -> list[tuple[str, int]]:
    c = Counter(items)
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_mg_merge_bound_and_coverage():
    """After merging arbitrary batches into a capacity-m summary, (a) the
    summary never exceeds m keys, and (b) any item with true count
    > N/(m+1) survives — the Misra-Gries guarantee the recount relies on."""
    rng = random.Random(7)
    m = 16
    items = [f"hot{i}" for i in range(4)] * 200 + [
        f"cold{rng.randrange(500)}" for _ in range(800)
    ]
    rng.shuffle(items)
    acc: dict[str, int] = {}
    for start in range(0, len(items), 97):  # uneven batch boundaries
        _mg_merge(acc, Counter(items[start : start + 97]), m)
        assert len(acc) <= m
    n = len(items)
    true = Counter(items)
    for item, cnt in true.items():
        if cnt > n / (m + 1):
            assert item in acc, f"{item} (count {cnt}) lost from summary"


def test_heavy_hitters_exact_skewed(spark):
    """Zipf-ish data where the sketch certifies: result equals the exact
    top-k with deterministic tie-break."""
    rng = random.Random(42)
    vals = []
    for i in range(40):
        vals += [f"w{i:03d}"] * (500 // (i + 1))
    vals += [f"rare{rng.randrange(2000)}" for _ in range(1500)]
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "item string").repartition(8)
    got = [(r.item, r.cnt) for r in heavy_hitters(df, "item", k=10, capacity=256).collect()]
    assert got == _exact_topk(vals, 10)


def test_heavy_hitters_fallback_flat(spark):
    """Near-flat data at tiny capacity: the bound cannot certify, the
    operator must fall back to the full aggregate and still be exact."""
    vals = [f"t{i % 97:02d}" for i in range(970)]  # every count == 10, ties
    df = spark.createDataFrame([(v,) for v in vals], "item string").repartition(4)
    got = [(r.item, r.cnt) for r in heavy_hitters(df, "item", k=5, capacity=8).collect()]
    assert got == _exact_topk(vals, 5)


def test_heavy_hitters_ignores_null(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "item string"
    )
    got = [(r.item, r.cnt) for r in heavy_hitters(df, "item", k=2, capacity=16).collect()]
    assert got == [("a", 2), ("b", 1)]


def test_heavy_hitters_recount_is_exact_not_estimate(spark):
    """The emitted counts are the exact recount, not the sketch weights:
    force heavy pruning (capacity barely above k) and check counts."""
    vals = ["x"] * 50 + ["y"] * 30 + ["z"] * 20 + [f"n{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "item string").repartition(6)
    got = dict(
        (r.item, r.cnt)
        for r in heavy_hitters(df, "item", k=3, capacity=5).collect()
    )
    assert got == {"x": 50, "y": 30, "z": 20}


def test_distributed_ntile_matches_window_ntile(spark):
    """distributed_ntile must be bit-identical to ntile() OVER (ORDER BY
    total order) for n % k != 0, n < k, and heavy-tie inputs."""
    from pyspark.sql.window import Window as W

    from dampr_spark.operators.stats import distributed_ntile

    for n, k in [(10, 4), (3, 4), (1, 4), (97, 8), (64, 8)]:
        rows = [(i, (i * 7919) % 5) for i in range(n)]  # heavy value ties
        df = spark.createDataFrame(rows, "id long, v long")
        got = {
            r.id: r.bucket
            for r in distributed_ntile(df, k, ["v", "id"]).collect()
        }
        want = {
            r.id: r.bucket
            for r in df.select(
                "id", F.ntile(k).over(W.orderBy("v", "id")).alias("bucket")
            ).collect()
        }
        assert got == want, f"n={n} k={k}"
