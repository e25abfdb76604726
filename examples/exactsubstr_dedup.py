"""ExactSubstr-style substring deduplication pipeline (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better") — the
suffix-array family re-expressed as distributed suffix RUNS:

1. detect  — operators/dedup.repeated_substring_spans: positional anchor
   windows → capped posting lists → diagonal gaps-and-islands runs; every
   repeated substring ≥ min_len tokens comes back as one maximal span
   (hash_anchors=True shuffles 8-byte keys — the 100 TB path);
2. triage  — operators/dedup.substring_dedup_report: per-doc UNION of its
   span intervals; docs whose duplicated fraction exceeds ``drop_frac``
   are dropped whole (they are mostly someone else's content);
3. trim    — operators/dedup.trim_repeated_spans on the survivors: every
   repeated span keeps only its first-by-id occurrence, later docs have
   the span cut and their text rebuilt JVM-side.

The output corpus contains every surviving doc exactly once, with zero
cross-doc repeated substrings ≥ min_len that the posting cap admitted.

Usage: python examples/exactsubstr_dedup.py [documents.parquet] [min_len]
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dampr_spark.operators.dedup import (
    repeated_substring_spans,
    substring_dedup_report,
    trim_repeated_spans,
)


def exactsubstr_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    anchor_tokens: int = 8,
    min_len: int = 20,
    drop_frac: float = 0.8,
    max_posting: int = 64,
    hash_anchors: bool = True,
) -> DataFrame:
    """(doc_id, text, n_tokens_before, n_tokens_after, action) for every
    surviving doc; action is 'kept' | 'trimmed'. Docs over ``drop_frac``
    duplicated are removed entirely."""
    report = substring_dedup_report(
        docs,
        text_col=text_col,
        id_col=id_col,
        anchor_tokens=anchor_tokens,
        min_len=min_len,
        max_posting=max_posting,
        hash_anchors=hash_anchors,
    )
    heavy = report.filter(F.col("dup_frac") > drop_frac).select(
        F.col("doc_id").alias(id_col)
    )
    survivors = docs.join(F.broadcast(heavy), id_col, "left_anti")
    trimmed = trim_repeated_spans(
        survivors,
        text_col=text_col,
        id_col=id_col,
        anchor_tokens=anchor_tokens,
        min_len=min_len,
        max_posting=max_posting,
        hash_anchors=hash_anchors,
    )
    return trimmed.select(
        "doc_id",
        "text",
        "n_tokens_before",
        "n_tokens_after",
        F.when(F.col("n_tokens_after") < F.col("n_tokens_before"), "trimmed")
        .otherwise("kept")
        .alias("action"),
    )


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01/documents.parquet"
    min_len = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("exactsubstr-dedup")
        .getOrCreate()
    )
    docs = spark.read.parquet(path)
    out = exactsubstr_dedup(docs, min_len=min_len)
    out.groupBy("action").agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens_before").alias("tokens_in"),
        F.sum("n_tokens_after").alias("tokens_out"),
    ).show()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
