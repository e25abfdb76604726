"""Duplicate-graph triage — decide whether transitive collapse is safe
BEFORE deduplicating, using the three oracle-verified graph primitives:

1. pairs      — deterministic fuzzy-match pair graph
   (operators/dedup.fuzzy_prefix_pairs: blocked Levenshtein, hot-block
   cap — the bounded candidate generator);
2. components — min-label propagation to fixpoint
   (operators/graph.connected_components): the coarsest cut; one weak
   bridge edge merges two groups;
3. communities — fixed-round synchronous label propagation
   (operators/graph.label_propagation): the finer cut; a single bridge
   vote loses to in-clique majorities;
4. triangles  — per-vertex triangle participation
   (operators/graph.triangle_counts): near-clique density evidence.

The triage rule this example computes per component: if the component's
LPA communities agree with CC (one community) AND triangle density is
high, transitive collapse (keep one doc per component) is safe; if LPA
splits it or triangles are sparse, the component is a CHAIN of borderline
matches — collapse per-community instead, or route to review.

Every step is joins + groupBys over the edge list (no driver-side graph),
so the triage scales with |E|, which the pair generator's caps bound.

Usage: python examples/dup_graph_analysis.py [documents.parquet dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dampr_spark.operators.dedup import fuzzy_prefix_pairs
from dampr_spark.operators.graph import (
    connected_components,
    label_propagation,
    triangle_counts,
)


def dup_graph_triage(docs: DataFrame, max_distance: int = 25) -> DataFrame:
    """Per CC component: member count, LPA community count, triangle
    count, and the collapse verdict ('collapse' | 'split' | 'review')."""
    pairs = fuzzy_prefix_pairs(
        docs,
        block_tokens=2,
        prefix_chars=80,
        max_distance=max_distance,
        max_block=64,
    ).localCheckpoint(eager=True)  # feeds all three graph passes
    comp = connected_components(pairs, src="id_a", dst="id_b")
    lpa = label_propagation(pairs, src="id_a", dst="id_b", iters=3)
    tri = triangle_counts(pairs, src="id_a", dst="id_b")
    per_node = (
        comp.join(lpa, "id")
        .join(tri, "id", "left")
        .select(
            "id",
            "component",
            "label",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
        )
    )
    agg = per_node.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.countDistinct("label").alias("n_communities"),
        F.sum("triangles").alias("triangle_corners"),
    )
    # A clique of n members has n*(n-2)(n-1)/... corners; the cheap proxy:
    # any triangles at all per member above 1.0 reads as dense.
    density = F.col("triangle_corners") / F.col("n_members")
    return agg.select(
        "component",
        "n_members",
        "n_communities",
        "triangle_corners",
        F.when(F.col("n_communities") > 1, F.lit("split"))
        .when((F.col("n_members") <= 2) | (density >= 1.0), F.lit("collapse"))
        .otherwise(F.lit("review"))
        .alias("verdict"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("dup-graph-analysis")
        .getOrCreate()
    )
    from dampr_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    triage = dup_graph_triage(docs)
    triage.orderBy(F.col("n_members").desc(), "component").show(20, truncate=False)


if __name__ == "__main__":
    main()
