"""SemDeDup-style semantic deduplication — cluster embeddings, then find
near-duplicate pairs only WITHIN clusters:

0. whiten    — optional PCA whitening (operators/vectorprep): one
   sufficient-statistics pass + broadcast projection; decorrelated unit-
   variance axes sharpen both the k-means geometry and the LSH hyperplane
   cuts (the SemDeDup-paper preprocessing);
1. cluster   — fully-distributed Lloyd's k-means over the embedding column
   (operators/similarity.kmeans_fit_assign): broadcast centroids → cosine
   argmax → posexplode-avg recompute, deterministic first-k init;
2. pair gen  — hyperplane-LSH bucketed candidate pairs, bucket keys
   PREFIXED with the cluster id so no candidate pair ever crosses a
   cluster boundary (RandomHyperplaneLSH.bucketed_pairs over per-cluster
   frames);
3. verify    — exact cosine on candidate pairs only; keep pairs ≥ tau;
4. shrink    — min-label cluster propagation + anti-join
   (operators/dedup.near_dup_clusters machinery reused on vec ids).

Why cluster first: LSH alone bounds candidate generation but still hashes
the whole corpus into one bucket space; clustering first caps every
comparison to a semantic neighborhood, which (a) shrinks buckets, (b) lets
each cluster's pair generation run as an independent, perfectly parallel
unit — the property that matters at 10^9+ vectors.

Every step is a DataFrame op: the only shuffles are the k-means scalar
assignments, the (cluster, bucket) groupBy, and the pair aggregation —
embedding vectors themselves move only in the verify join, restricted to
candidate ids.

Usage: python examples/semantic_dedup.py [embeddings.parquet] [k] [tau]
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dampr_spark.operators.dedup import near_dup_clusters
from dampr_spark.operators.similarity import RandomHyperplaneLSH, kmeans_fit_assign


def semantic_dedup(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    kmeans_iters: int = 3,
    tau: float = 0.95,
    dim: int = 64,
    whiten_dims: int | None = None,
) -> DataFrame:
    """(id, canonical) for every vector in a semantic near-dup group —
    drop rows where id != canonical to shrink the corpus. With
    ``whiten_dims`` set, clustering/LSH run in the PCA-whitened space of
    that many axes (the verify cosine still scores ORIGINAL embeddings, so
    tau keeps its meaning)."""
    original = embeddings
    residual = None
    orig_dim = dim
    if whiten_dims is not None:
        from dampr_spark.functions.vector import valid_vector
        from dampr_spark.operators.vectorprep import pca_apply, pca_fit

        model = pca_fit(embeddings, vec_col=vec_col, k=whiten_dims)
        embeddings = (
            pca_apply(embeddings, model, vec_col=vec_col, out_col="_w", whiten=True)
            .drop(vec_col)
            .withColumnRenamed("_w", vec_col)
            .withColumn(vec_col, F.col(vec_col).cast("array<float>"))
        )
        dim = whiten_dims
        # Vectors valid in the ORIGINAL space can whiten to zero (exactly
        # at the corpus mean within the kept subspace) — the whitened
        # cluster/LSH stages would silently drop them, losing even exact
        # original-space duplicates. Route them through a raw-space LSH
        # pass and union the candidates.
        dropped_ids = (
            embeddings.filter(~valid_vector(vec_col))
            .select(id_col)
            .join(original.filter(valid_vector(vec_col)).select(id_col), id_col)
        )
        residual = original.join(dropped_ids, id_col, "left_semi")
    assigned = kmeans_fit_assign(
        embeddings, vec_col=vec_col, id_col=id_col, k=k, iters=kmeans_iters
    ).select(F.col("id").alias(id_col), "cluster")
    clustered = embeddings.join(assigned, id_col)

    # LSH pair generation with the cluster id joined into the bucket key:
    # pairs can only form inside a cluster, so bucket sizes shrink by ~k and
    # every cluster proceeds independently. bucketed_pairs verifies with
    # exact cosine on in-bucket candidates only.
    lsh = RandomHyperplaneLSH(dim=dim, n_planes=6, n_tables=8)
    if whiten_dims is None:
        pairs = lsh.bucketed_pairs(
            clustered,
            vec_col=vec_col,
            id_col=id_col,
            threshold=tau,
            extra_keys=("cluster",),
        )
    else:
        # Candidates form in whitened space; the exact-cosine verify runs
        # on the ORIGINAL embeddings (threshold=-1.0 keeps every in-bucket
        # candidate, then the original-space join applies tau).
        from dampr_spark.functions.vector import cosine

        cand = lsh.bucketed_pairs(
            clustered,
            vec_col=vec_col,
            id_col=id_col,
            threshold=-1.0,
            extra_keys=("cluster",),
        ).select("id_a", "id_b")
        oa = original.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        ob = original.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        pairs = (
            cand.join(oa, "id_a")
            .join(ob, "id_b")
            .filter(F.round(cosine(F.col("va"), F.col("vb")), 6) >= tau)
            .select("id_a", "id_b")
        )
        if residual is not None:
            # Residual vectors live in the ORIGINAL space — hyperplanes must
            # match the original dimensionality, not whiten_dims (ADVICE r5).
            raw_lsh = RandomHyperplaneLSH(dim=orig_dim, n_planes=6, n_tables=8)
            pairs = pairs.unionByName(
                raw_lsh.bucketed_pairs(
                    residual, vec_col=vec_col, id_col=id_col, threshold=tau
                ).select("id_a", "id_b")
            )
    return near_dup_clusters(pairs.select("id_a", "id_b"))


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01/embeddings.parquet"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    tau = float(sys.argv[3]) if len(sys.argv) > 3 else 0.95

    spark = SparkSession.builder.master("local[*]").appName("semantic-dedup").getOrCreate()
    e = spark.read.parquet(path)
    clusters = semantic_dedup(e, k=k, tau=tau)
    n_groups = clusters.select("canonical").distinct().count()
    n_dropped = clusters.filter(F.col("id") != F.col("canonical")).count()
    print(f"semantic near-dup groups: {n_groups}; rows dropped by dedup: {n_dropped}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
