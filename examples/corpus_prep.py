"""End-to-end LLM training-corpus preparation — the composition the
extension layer exists for, as one runnable pipeline over a documents
parquet:

1. quality gate      — codegen length/stopword/punctuation score
   (functions/text.py), keep docs with quality >= min_quality;
2. exact dedup       — md5-fingerprint groupBy, keep the min-id canonical
   (operators/dedup.drop_exact_dups);
3. near dedup        — MinHash-LSH candidate pairs verified with exact
   shingle Jaccard, min-label-propagation clustering, keep one canonical
   per cluster (operators/dedup.minhash_lsh_dedup / drop_near_dups);
4. boilerplate strip — fixed-chunk spans shared verbatim by >= boiler_docs
   surviving documents are accounted per doc
   (operators/dedup.remove_boilerplate_chunks);
5. token accounting  — per-doc and corpus-total token counts, plus the
   boilerplate accounting, for the training-budget report;
6. decontaminate     — (round 6, optional ``bench_docs``) drop surviving
   docs whose word-bigram Jaccard with any benchmark doc reaches
   ``contamination_tau`` (operators/dedup.ngram_jaccard machinery via the
   broadcast-bench join shape of the ``fuzzy_decontaminate`` catalog
   query);
7. shard + manifest  — salted-md5 shard assignment, write-ready, with a
   per-shard doc/token manifest (the ``training_shards_manifest`` shape).

Every stage is a declarative DataFrame transform: one scan feeds the
quality gate, dedup shuffles on 32-byte digests (never document bodies),
and the near-dup stage only re-materializes shingles for candidate ids.
The same composition hash-checks against DuckDB as the catalog query
``training_data_prep`` (exact-dedup half) plus the rows-only
``near_dedup_corpus`` (LSH half, RNG-free but hash-function-dependent).

Usage: python examples/corpus_prep.py [documents.parquet] [outdir]
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dampr_spark.functions import text as T
from dampr_spark.operators import dedup as D


def build(
    docs: DataFrame,
    min_quality: float = 0.5,
    min_tokens: int = 20,
    near_dup_threshold: float = 0.8,
    boiler_docs: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean_corpus, report) — the filtered/deduped corpus and a
    1-row accounting summary."""
    gated = docs.filter(
        (T.quality_score("text") >= min_quality)
        & (T.token_count("text") >= min_tokens)
    )
    exact = D.drop_exact_dups(gated)
    pairs = D.minhash_lsh_dedup(exact, threshold=near_dup_threshold)
    clean = D.drop_near_dups(exact, pairs)
    clean = clean.withColumn("n_tokens", T.token_count("text"))
    boiler = D.remove_boilerplate_chunks(clean, min_docs=boiler_docs).select(
        "doc_id", "n_removed", "n_tokens_after"
    )
    clean = clean.join(boiler, "doc_id", "left")
    report = clean.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
        F.sum("n_removed").alias("boiler_chunks_removed"),
        F.sum("n_tokens_after").alias("tokens_after_boiler_strip"),
    )
    return clean, report


def decontaminate(
    clean: DataFrame,
    bench_docs: DataFrame,
    tau: float = 0.05,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop surviving docs whose word-bigram Jaccard with ANY benchmark doc
    reaches ``tau`` — the fuzzy_decontaminate catalog shape as a pipeline
    stage: bench gram postings broadcast, candidates form only on shared
    grams, one doc-keyed aggregate, then an anti-join."""
    from dampr_spark.operators.dedup import word_ngrams

    cg = clean.select(
        F.col(id_col), F.explode(word_ngrams(text_col, 2)).alias("gram")
    )
    bg = (
        bench_docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("bench_id"),
            F.explode(word_ngrams(text_col, 2)).alias("gram"),
        )
    )
    sizes_c = clean.select(id_col, F.size(word_ngrams(text_col, 2)).alias("na"))
    sizes_b = bench_docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("bench_id"), F.size(word_ngrams(text_col, 2)).alias("nb")
    )
    flagged = (
        cg.join(F.broadcast(bg), "gram")
        .groupBy(id_col, "bench_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .join(sizes_c, id_col)
        .join(F.broadcast(sizes_b), "bench_id")
        .filter(
            F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
            >= F.lit(tau)
        )
        .select(id_col)
        .distinct()
    )
    return clean.join(flagged, id_col, "left_anti")


def trim_substrings(
    clean: DataFrame, min_len: int = 20, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Round-7 stage: ExactSubstr keep-first span trimming on the
    SURVIVORS — near-dup dedup drops whole documents, this removes the
    verbatim-shared passages that remain inside otherwise-distinct docs
    (operators/dedup.trim_repeated_spans, hash-anchor scale path). Text
    and n_tokens are replaced with the trimmed versions."""
    trimmed = D.trim_repeated_spans(
        clean, text_col=text_col, id_col=id_col, min_len=min_len,
        max_posting=64, hash_anchors=True,
    ).select(
        id_col,
        F.col("text").alias("_trimmed"),
        F.col("n_tokens_after").alias("_n_after"),
    )
    return (
        clean.drop("n_tokens")
        .join(trimmed, id_col)
        .withColumn(text_col, F.col("_trimmed"))
        .withColumn("n_tokens", F.col("_n_after"))
        .drop("_trimmed", "_n_after")
    )


def fluency_gate(
    clean: DataFrame, max_ppl: float, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Round-7 stage: drop docs whose perplexity under the corpus-fit
    bigram LM exceeds ``max_ppl`` (operators/selection.bigram_doc_perplexity
    — the CCNet-style fluency gate). Docs too short to carry a bigram pass
    through (no evidence either way)."""
    from dampr_spark.operators.selection import bigram_doc_perplexity

    bad = (
        bigram_doc_perplexity(clean, text_col=text_col, id_col=id_col)
        .filter(F.col("ppl") > max_ppl)
        .select(id_col)
    )
    return clean.join(bad, id_col, "left_anti")


def dsir_reweight(
    clean: DataFrame, target: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Round-7 stage: attach DSIR importance log-weights toward ``target``
    (operators/selection.dsir_importance_weights) — sample the final
    corpus proportional to exp(log_weight) to reshape it toward the
    target domain."""
    from dampr_spark.operators.selection import dsir_importance_weights

    w = dsir_importance_weights(clean, target, text_col=text_col, id_col=id_col)
    return clean.join(w.select(id_col, "log_weight"), id_col, "left")


def shard_manifest(
    clean: DataFrame, n_shards: int = 16, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """(sharded_corpus, manifest): deterministic salted-md5 shard ids plus
    the per-shard doc/token accounting — write the corpus with
    ``.write.partitionBy('shard_id')`` and hand the manifest to the
    dataloader."""
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":shard"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    ).cast("int")
    sharded = clean.withColumn("shard_id", shard)
    manifest = sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    return sharded, manifest


def main(argv: list[str]) -> int:
    src = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01/documents.parquet"
    out = argv[2] if len(argv) > 2 else None
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("corpus-prep")
        .getOrCreate()
    )
    docs = spark.read.parquet(src)
    clean, report = build(docs)
    if out:
        clean.write.mode("overwrite").parquet(out)
    for row in report.collect():
        print(dict(row.asDict()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
