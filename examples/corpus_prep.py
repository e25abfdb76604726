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
   boilerplate accounting, for the training-budget report.

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
