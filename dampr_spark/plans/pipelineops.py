"""Training-corpus pipeline catalog queries — the data-curation steps a
large-scale LLM data pipeline runs BETWEEN dedup and training: benchmark
decontamination, repetition filtering, token-budget packing, and
deterministic domain mixing.

Each is expressed as declarative DataFrame ops with a DuckDB oracle; none
uses a UDF. The reference has no equivalents (its surface stops at
map/reduce/join — dampr/dampr.py); these extend the engine the way
SURVEY.md §7 step 6 extends text analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dampr_spark.functions import text as T
from dampr_spark.operators.dedup import word_ngrams
from dampr_spark.plans.catalog import register
from dampr_spark.sources.readers import read_table as _t

# Every ~97th doc plays the held-out benchmark/eval set. A real pipeline
# joins against the actual eval corpus; the modulus keeps the fixture
# deterministic at every sf.
_BENCH_MOD = 97

# DuckDB twin of operators.dedup.word_ngrams(col, 3): distinct word 3-grams.
_GRAMS_SQL = """
    list_distinct(list_transform(
        range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
        i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
"""


@register(
    "decontaminate_ngram",
    oracle=f"""
    WITH bench_grams AS (
        SELECT DISTINCT unnest({_GRAMS_SQL}) AS gram
        FROM documents WHERE doc_id % {_BENCH_MOD} = 0),
    corpus_grams AS (
        SELECT doc_id, unnest({_GRAMS_SQL}) AS gram
        FROM documents WHERE doc_id % {_BENCH_MOD} <> 0)
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(b.gram) AS BIGINT) AS n_shared,
           round(count(b.gram) * 1.0 / count(*), 6) AS contamination
    FROM corpus_grams c LEFT JOIN bench_grams b USING (gram)
    GROUP BY c.doc_id
    """,
    tags=("text", "pipeline", "decontamination", "extension"),
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per-document distinct word-3-gram overlap
    with a held-out benchmark set (the GPT-3/Llama-style n-gram
    contamination check).

    Plan shape for 100 TB: the benchmark side is an eval suite — thousands
    of documents, millions of n-grams at most — so its distinct gram set is
    BROADCAST; one scan explodes corpus grams and the broadcast hash join
    marks hits without moving them. The only corpus shuffle is the per-doc
    aggregate, and partial aggregation collapses the exploded grams map-side
    first, so the exchange carries one narrow (doc_id, counts) row per
    document — never gram-level rows.
    """
    d = _t(spark, sf_dir, "documents")
    bench_grams = (
        d.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode(word_ngrams("text", 3)).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    corpus = (
        d.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .select("doc_id", F.explode(word_ngrams("text", 3)).alias("gram"))
    )
    return (
        corpus.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_shared"),
            F.round(F.count("_hit") / F.count(F.lit(1)), 6).alias("contamination"),
        )
    )


@register(
    "repetition_filter",
    oracle="""
    SELECT doc_id,
           round(1.0 - len(list_distinct(string_split(text, ' ')))
                     / len(string_split(text, ' ')), 6) AS token_dup_ratio,
           round(1.0 - len(list_distinct(list_transform(
                     range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                     i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))))
                     / greatest(len(string_split(text, ' ')) - 2, 1), 6)
             AS gram_dup_ratio,
           (1.0 - len(list_distinct(list_transform(
                     range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                     i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))))
                     / greatest(len(string_split(text, ' ')) - 2, 1)) >= 0.2
             AS is_repetitive
    FROM documents
    """,
    tags=("text", "pipeline", "quality", "extension"),
)
def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/boilerplate detection (the Gopher-style duplicate-fraction
    quality filter): per-document duplicated-token and duplicated-3-gram
    ratios, flagged at gram_dup_ratio ≥ 0.2.

    ZERO-shuffle plan: both ratios are pure array expressions over the split
    column, so the whole filter fuses into the parquet scan — at 100 TB this
    is the cheapest possible quality gate (scan-rate bound, embarrassingly
    parallel, no state)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_tok - 2, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(3))),
    )
    gram_dup = 1.0 - F.size(F.array_distinct(grams)) / F.size(grams)
    return d.select(
        "doc_id",
        F.round(1.0 - F.size(F.array_distinct(toks)) / n_tok, 6).alias(
            "token_dup_ratio"
        ),
        F.round(gram_dup, 6).alias("gram_dup_ratio"),
        (gram_dup >= 0.2).alias("is_repetitive"),
    )


_PACK_BUDGET = 2048  # tokens per packed training sequence bin


@register(
    "pack_token_budget",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, source, {T.token_count_sql('text')} AS n_tokens
        FROM documents),
    binned AS (
        SELECT doc_id, source, n_tokens,
               CAST(floor((sum(n_tokens) OVER (
                     PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tokens)
                    / {_PACK_BUDGET}) AS BIGINT) AS bin_id
        FROM sized)
    SELECT source, bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM binned
    GROUP BY source, bin_id
    """,
    tags=("text", "pipeline", "packing", "extension"),
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget document packing: assign docs (in deterministic doc_id
    order, independently per source) to training-sequence bins by running
    token count — the greedy contiguous packing used to batch variable-length
    docs into fixed context windows.

    Scale shape: the window partitions by SOURCE, so packing parallelizes
    across sources/shards (one shuffle on source) instead of serializing the
    corpus through a single global cumsum — exactly how a 100 TB pipeline
    packs per input shard. The per-bin aggregate reuses the same
    partitioning, so AQE coalesces it without a second exchange."""
    d = _t(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", "source", T.token_count("text").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = sized.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_BUDGET),
    )
    return binned.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "domain_mix_sample",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <
                CASE CAST(substr(source, 4) AS INTEGER) % 4
                     WHEN 0 THEN '4' WHEN 1 THEN '8' WHEN 2 THEN 'c'
                     ELSE 'g' END
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           round(0.25 * (CAST(substr(source, 4) AS INTEGER) % 4 + 1), 2)
             AS target_rate
    FROM documents
    GROUP BY source
    """,
    tags=("text", "pipeline", "sampling", "extension"),
)
def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mix downsampling: each source keeps a per-domain
    fraction of documents (25/50/75/100% here) selected by content-stable
    hash, the standard way training mixes re-weight web/books/code domains.

    Hash-based, not rand(): ``md5(doc_id)`` makes the SAME docs survive on
    every run, engine, and retry — a reproducibility property rand() cannot
    give on a cluster. The first hex char is uniform over 16 values, so a
    lexicographic compare against '4'/'8'/'c'/'g' implements 25%-step rates
    identically in Spark and DuckDB (lowercase hex orders 0-9a-f). One
    aggregate keyed on source; the sample predicate itself is scan-fused,
    zero-shuffle when used as a filter."""
    d = _t(spark, sf_dir, "documents")
    src_band = F.substring("source", 4, 10).cast("int") % 4
    threshold = (
        F.when(src_band == 0, "4")
        .when(src_band == 1, "8")
        .when(src_band == 2, "c")
        .otherwise("g")
    )
    kept = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < threshold
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept.cast("int")).cast("long").alias("n_sampled"),
        )
        .withColumn("target_rate", F.round(0.25 * (src_band + 1), 2))
    )


@register(
    "corpus_mix_report",
    oracle=f"""
    WITH sized AS (
        SELECT source, lang, {T.token_count_sql('text')} AS n_tokens
        FROM documents)
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(sum(n_tokens) * 1.0 /
                 sum(sum(n_tokens)) OVER (), 6) AS token_share
    FROM sized
    GROUP BY source, lang
    """,
    tags=("text", "pipeline", "stats", "extension"),
)
def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture report: per (source, lang) document counts, token
    totals, and each cell's share of all training tokens — the table a
    mixture-weight decision is made from.

    Scale shape: ONE scan feeds an aggregate keyed on (source, lang) —
    map-side partials do the work, and the aggregate output is tiny
    (|sources| × |langs| cells) — then the corpus-total share is an
    unpartitioned window over those cells. Funneling the window through a
    single task is fine precisely because its input is the aggregate, not
    the corpus; the alternative (re-aggregate + broadcast join) would scan
    documents twice."""
    d = _t(spark, sf_dir, "documents")
    cells = (
        d.select("source", "lang", T.token_count("text").alias("n_tokens"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )
    return cells.select(
        "source",
        "lang",
        "n_docs",
        "total_tokens",
        F.round(
            F.col("total_tokens")
            / F.sum("total_tokens").over(Window.partitionBy()),
            6,
        ).alias("token_share"),
    )
