"""Graph operators over edge-list DataFrames.

The dedup pipeline's cluster step (``dedup.near_dup_clusters``) is a
special case of connected components with a fixed round count tuned for
near-clique LSH clusters. This module is the GENERAL primitive: min-label
propagation run to FIXPOINT — each round every vertex takes the minimum of
its own and its neighbors' labels, and the loop stops when a round changes
nothing (converges after `graph diameter` rounds; the per-round "did
anything change" check is one small aggregate — a bounded driver-side
scalar, the same contract as the catalog's query-vector lookups).

Everything is joins + groupBys: no driver-side union-find, no vertex set
ever collected, per-round state is one (id, label) table checkpointed so
round N never replays rounds 1..N-1 (the nested-lineage trap measured and
fixed in the dedup pipeline, commit 8147ae8). Scale envelope: each round
shuffles the edge list once — O(diameter × |E|) total traffic, the
standard large-graph CC shape (GraphFrames' AM-label propagation does the
same with hash-partitioned edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
) -> DataFrame:
    """(id, component) for every vertex appearing in ``edges``; component =
    the minimum vertex id of the connected component. Runs min-label
    propagation to fixpoint (bounded by ``max_iters``); isolated vertices
    (absent from edges) are by definition their own component and simply
    don't appear — union them in afterwards if needed.

    NULL endpoints are dropped (an edge to NULL identifies nothing)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    e = e.localCheckpoint(eager=True)
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = (
        sym.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        stepped = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.col("label").alias("old"),
            F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                "label"
            ),
        ).localCheckpoint(eager=True)
        n_changed = stepped.filter(F.col("old") != F.col("label")).count()
        labels = stepped.select("id", "label")
        if n_changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(component diameter exceeds max_iters); raise max_iters"
    )


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(id, degree) over the undirected view of the edge list — the
    hot-vertex (skew) probe run before any per-vertex iteration."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
