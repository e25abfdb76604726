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

from dampr_spark.operators.pinning import pin_once as _pin
from dampr_spark.functions import text as T
from dampr_spark.operators import dedup
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
        FROM documents WHERE doc_id % {_BENCH_MOD} = 0 AND text IS NOT NULL),
    corpus_grams AS (
        SELECT doc_id, unnest({_GRAMS_SQL}) AS gram
        FROM documents WHERE doc_id % {_BENCH_MOD} <> 0 AND text IS NOT NULL)
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

    Round 10: the plan is `operators/dedup.ngram_contamination` (this
    query binds corpus/bench to the doc_id % 97 split); the operator's
    `max_df` posting cap plus `dedup.contamination_posting_audit` are the
    saturation knob and sizing instrument — 100x budget proof in
    benchmarks/decontam_scale_proof_100x.py. NULL-text docs have no grams
    — dropped on both engines (NULL propagation through
    split/transform/distinct differs cross-engine)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.ngram_contamination(
        d.filter(F.col("doc_id") % _BENCH_MOD != 0),
        d.filter(F.col("doc_id") % _BENCH_MOD == 0),
        n=3,
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
    FROM documents WHERE text IS NOT NULL
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
    parallel, no state). NULL-text docs are dropped on both engines —
    repetition is undefined for absent text and NULL propagation through
    split/size differs cross-engine."""
    from dampr_spark.functions.text import word_ngram_strings

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    # O(n·len) trigram fold (round 14): the sequence+slice lambda shape
    # re-evaluated the split per element — quadratic in doc length.
    grams = word_ngram_strings("text", 3)
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


@register(
    "pii_redact",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail-' || CAST(doc_id % 7 AS VARCHAR) || '.com or +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
                    || CAST(doc_id % 250 AS VARCHAR) AS text
        FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           CAST({T.pii_counts_sql('text')[0]} AS BIGINT) AS n_emails,
           CAST({T.pii_counts_sql('text')[1]} AS BIGINT) AS n_phones,
           CAST({T.pii_counts_sql('text')[2]} AS BIGINT) AS n_ips,
           CAST(length({T.redact_pii_sql('text')}) AS BIGINT) AS n_redacted_chars,
           md5({T.redact_pii_sql('text')}) AS redacted_md5
    FROM aug
    """,
    tags=("text", "pipeline", "pii", "extension"),
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact emails / phone numbers / IPv4
    addresses per document. The synthetic corpus carries no organic PII, so
    the query first injects deterministic doc_id-derived PII strings — BOTH
    engines compute the same augmented text, making the redaction counts and
    the md5 of the scrubbed text a real value-level check.

    Scale shape: pure regexp expressions fused into the scan — zero shuffle,
    scan-rate bound, exactly how a 100 TB scrub pass should look. Patterns
    are in the Java-regex ∩ RE2 common subset (no lookaround/backrefs)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sid = F.col("doc_id").cast("string")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), sid,
        F.lit("@mail-"), (F.col("doc_id") % 7).cast("string"), F.lit(".com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."), (F.col("doc_id") % 256).cast("string"), F.lit(".0."),
        (F.col("doc_id") % 250).cast("string"),
    )
    a = d.select("doc_id", aug.alias("text"))
    n_emails, n_phones, n_ips = T.pii_counts("text")
    red = T.redact_pii("text")
    return a.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        n_ips.cast("long").alias("n_ips"),
        F.length(red).cast("long").alias("n_redacted_chars"),
        F.md5(red).alias("redacted_md5"),
    )


_CHUNK_TOKENS = 32  # tokens per training chunk
_CHUNK_STRIDE = 24  # stride (8-token overlap between consecutive chunks)


@register(
    "chunk_documents",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE text IS NOT NULL),
    s AS (
        SELECT doc_id, toks,
               unnest(range(1, len(toks) + 1, {_CHUNK_STRIDE})) AS st
        FROM t)
    SELECT doc_id,
           CAST((st - 1) // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(len(toks[st:st + {_CHUNK_TOKENS} - 1]) AS BIGINT) AS n_tokens,
           md5(array_to_string(toks[st:st + {_CHUNK_TOKENS} - 1], ' ')) AS chunk_md5
    FROM s
    """,
    tags=("text", "pipeline", "chunking", "extension"),
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: split each document into
    32-token chunks at a 24-token stride (8-token
    overlap) — the standard context-window chunker for embedding/RAG
    pipelines. Emits (doc_id, chunk_id, n_tokens, chunk_md5).

    Scale shape: per-row array expressions + one explode — no shuffle at
    all; chunk rows stream straight to the sink. The md5 digest (not the
    chunk text) is what downstream joins key on, keeping exchanges narrow."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.split("text", " ")
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(_CHUNK_STRIDE))
    # Split ONCE and carry the token array through the explode (round
    # 14): re-splitting the full text per chunk row made long docs pay
    # O(len/stride * len) — the adjacent-pairs quadratic in miniature.
    e = d.select(
        "doc_id",
        toks.alias("toks"),
        F.posexplode(starts).alias("pos", "st"),
    )
    chunk = F.slice(F.col("toks"), F.col("st"), F.lit(_CHUNK_TOKENS))
    return e.select(
        "doc_id",
        F.col("pos").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


@register(
    "lang_rebalance_weights",
    oracle=f"""
    WITH cells AS (
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum({T.token_count_sql('text')}) AS BIGINT) AS total_tokens
        FROM documents GROUP BY lang)
    SELECT lang, n_docs, total_tokens,
           round(total_tokens * 1.0 / sum(total_tokens) OVER (), 6) AS token_share,
           round((1.0 / count(*) OVER ())
                 / (total_tokens * 1.0 / sum(total_tokens) OVER ()), 6) AS sample_weight
    FROM cells
    """,
    tags=("text", "pipeline", "sampling", "extension"),
)
def lang_rebalance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix rebalancing: per-language token share and the sampling
    weight that would flatten the mix to uniform — the knob a multilingual
    training run turns to up-weight low-resource languages.

    Scale shape: one aggregate keyed on lang (map-side partials do the
    work), then unpartitioned windows over the tiny |langs|-row aggregate —
    same funnel-is-fine rationale as corpus_mix_report."""
    d = _t(spark, sf_dir, "documents")
    cells = (
        d.select("lang", T.token_count("text").alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )
    w = Window.partitionBy()
    share = F.col("total_tokens") / F.sum("total_tokens").over(w)
    return cells.select(
        "lang",
        "n_docs",
        "total_tokens",
        F.round(share, 6).alias("token_share"),
        F.round((F.lit(1.0) / F.count(F.lit(1)).over(w)) / share, 6).alias(
            "sample_weight"
        ),
    )


@register(
    "doc_length_quantiles",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_chars, 0.25), 6) AS p25,
           round(quantile_cont(n_chars, 0.50), 6) AS p50,
           round(quantile_cont(n_chars, 0.75), 6) AS p75,
           round(quantile_cont(n_chars, 0.90), 6) AS p90
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "pipeline", "stats", "extension"),
)
def doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact length quantiles per language (the distribution check behind
    truncation/filter thresholds). Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` both linearly interpolate, so values hash-match.

    Scale note: the built-in exact percentile materializes each GROUP's
    values in one merge buffer — fine when groups are many and small, a
    single-task bottleneck when a group holds a corpus-sized share (a
    handful of languages at 100 TB qualifies; measured 10.9 s single task
    on the global form at 100x events). For few-huge-group shapes use
    ``operators/stats.exact_quantiles`` per group or ``approx_percentile``
    (t-digest-style sketch, partial-aggregable); the catalog keeps the
    built-in form here because it is oracle-checkable at test scale and
    ``conversion_lag_quantiles`` demonstrates the distributed-exact path."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.round(F.percentile("n_chars", F.lit(p)), 6).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.50, 0.75, 0.90)
        ],
    )


_BUDGET_K = 10  # docs kept per source


@register(
    "budget_sample_per_source",
    oracle=f"""
    WITH ranked AS (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
    SELECT source, doc_id, CAST(rn AS BIGINT) AS sample_rank
    FROM ranked WHERE rn <= {_BUDGET_K}
    """,
    tags=("text", "pipeline", "sampling", "extension"),
)
def budget_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget per-source sampling: exactly 10 documents per
    source, chosen by content-stable hash order — the companion to
    domain_mix_sample (rate-based) when the mix calls for absolute budgets.
    Hash order, not rand(): the same docs survive on every engine and rerun.

    Scale shape: one shuffle on source; the rank window never materializes
    more than its partition. At extreme per-source row counts swap the full
    sort for a two-pass "sample top-k by hash prefix" refinement; the
    row_number form is the exact spec."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _BUDGET_K)
        .select("source", "doc_id", F.col("rn").cast("long").alias("sample_rank"))
    )


@register(
    "approx_quantile_check",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_chars, 0.5), 6) AS p50_exact,
           approx_quantile(n_chars, 0.5)
               BETWEEN quantile_cont(n_chars, 0.40) AND quantile_cont(n_chars, 0.60)
             AS approx_ok
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "pipeline", "sketch", "extension"),
)
def approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quantile verification: per language, the exact median
    (hash-compared across engines) plus each engine asserting ITS OWN
    approximate-quantile sketch lands inside the exact p40..p60 band — the
    same each-engine-asserts-own-estimate pattern as approx_distinct_parts,
    which keeps a sketch operator oracle-checkable.

    Scale note: this is the t-digest-style path for percentiles at 100 TB —
    percentile_approx partial-aggregates (mergeable sketch state per
    partition), unlike the exact form which shuffles every group value."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 6).alias("p50_exact"),
        # Band containment, not a relative-error bound: the sketch returns
        # an actual data value while quantile_cont interpolates, so a gap
        # in the distribution around the median can legitimately exceed any
        # fixed percentage (reproduced on an adversarial perturbed corpus).
        # Landing inside the exact p40..p60 band is gap-insensitive.
        F.percentile_approx("n_chars", F.lit(0.5), F.lit(10000))
        .between(
            F.percentile("n_chars", F.lit(0.40)),
            F.percentile("n_chars", F.lit(0.60)),
        )
        .alias("approx_ok"),
    )


@register(
    "quality_by_source",
    oracle=f"""
    WITH scored AS (
        SELECT source, {T.quality_score_sql('text')} AS q FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN q < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(sum(CASE WHEN q >= 0.5 AND q < 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_mid,
           CAST(sum(CASE WHEN q >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           round(avg(q), 6) AS avg_quality
    FROM scored
    GROUP BY source
    """,
    tags=("text", "pipeline", "quality", "extension"),
)
def quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-band histogram (low/mid/high at 0.5/0.8 cuts) —
    the calibration table for setting per-domain quality thresholds before
    a filtering pass. One scan, one aggregate keyed on source; the score is
    pure codegen expressions (functions/text.quality_score)."""
    d = _t(spark, sf_dir, "documents")
    q = T.quality_score("text")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((q < 0.5).cast("int")).cast("long").alias("n_low"),
        F.sum(((q >= 0.5) & (q < 0.8)).cast("int")).cast("long").alias("n_mid"),
        F.sum((q >= 0.8).cast("int")).cast("long").alias("n_high"),
        F.round(F.avg(q), 6).alias("avg_quality"),
    )


@register(
    "corpus_snapshot_diff",
    oracle="""
    WITH a AS (
        SELECT doc_id, md5(text) AS fp FROM documents),
    b AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END) AS fp
        FROM documents WHERE doc_id % 11 <> 0
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, md5(text || ' new') AS fp
        FROM documents WHERE doc_id % 17 = 0),
    j AS (
        SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
               CASE WHEN a.doc_id IS NULL THEN 'added'
                    WHEN b.doc_id IS NULL THEN 'removed'
                    WHEN a.fp IS DISTINCT FROM b.fp THEN 'changed'
                    ELSE 'unchanged' END AS change_type
        FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
    SELECT change_type, CAST(count(*) AS BIGINT) AS n_docs
    FROM j GROUP BY change_type
    """,
    tags=("pipeline", "versioning", "extension"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus version diff — added / removed / changed / unchanged counts
    between two snapshots by doc_id + content fingerprint (snapshot B is
    synthesized deterministically from the fixture: every 11th doc removed,
    every 13th edited, a shifted copy of every 17th added). The audit table
    a dataset-versioning workflow publishes per release.

    Scale shape: one full outer join keyed on doc_id carrying only
    (doc_id, 16-byte md5) — bodies never move — then a 4-row aggregate. At
    100 TB both snapshots are id-bucketed on disk, making the outer join
    exchange-free (operators/bucketing)."""
    d = _t(spark, sf_dir, "documents")
    # Presence markers, NOT fp nullness, decide added/removed — the oracle
    # keys on doc_id IS NULL, and md5(NULL text) would otherwise misclassify
    # a NULL-text row present in both snapshots as added+removed.
    a = d.select("doc_id", F.md5("text").alias("fp"), F.lit(True).alias("a_in"))
    b = (
        d.filter(F.col("doc_id") % 11 != 0)
        .select(
            "doc_id",
            F.md5(
                F.when(F.col("doc_id") % 13 == 0, F.concat("text", F.lit(" v2")))
                .otherwise(F.col("text"))
            ).alias("fp"),
        )
        .union(
            d.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.md5(F.concat("text", F.lit(" new"))).alias("fp"),
            )
        )
        .select("doc_id", "fp", F.lit(True).alias("b_in"))
    )
    j = a.alias("a").join(b.alias("b"), "doc_id", "full_outer").select(
        F.when(F.col("a.a_in").isNull(), "added")
        .when(F.col("b.b_in").isNull(), "removed")
        .when(~F.col("a.fp").eqNullSafe(F.col("b.fp")), "changed")
        .otherwise("unchanged")
        .alias("change_type")
    )
    return j.groupBy("change_type").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "validate_documents",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN text IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS v_text_present,
           CAST(sum(CASE WHEN n_chars = length(text) THEN 0 ELSE 1 END) AS BIGINT)
               AS v_len_consistent,
           CAST(sum(CASE WHEN n_chars BETWEEN 1 AND 1000000 THEN 0 ELSE 1 END) AS BIGINT)
               AS v_len_in_range,
           CAST(sum(CASE WHEN lang IN ('en','de','fr','es','zh') THEN 0 ELSE 1 END) AS BIGINT)
               AS v_known_lang,
           CAST((SELECT count(*) FROM (
                 SELECT doc_id FROM documents GROUP BY doc_id HAVING count(*) > 1))
               AS BIGINT) AS n_dup_ids
    FROM documents
    """,
    tags=("pipeline", "validation", "extension"),
)
def validate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-gate validation report: one aggregate row of expectation
    violations (text present, stored n_chars consistent with the text,
    length in range, language in the known set) plus duplicate-id count —
    the check a production pipeline runs on every landed shard before
    anything downstream reads it. One scan + one single-row shuffle; the
    uniqueness check is its own keyed aggregate
    (operators/expectations.duplicate_keys)."""
    from dampr_spark.operators.expectations import duplicate_keys, validate

    d = _t(spark, sf_dir, "documents")
    report = validate(
        d,
        {
            "text_present": F.col("text").isNotNull(),
            "len_consistent": F.col("n_chars") == F.length("text"),
            "len_in_range": F.col("n_chars").between(1, 1_000_000),
            "known_lang": F.col("lang").isin("en", "de", "fr", "es", "zh"),
        },
    )
    dups = duplicate_keys(d, ["doc_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_ids")
    )
    return report.crossJoin(F.broadcast(dups))


@register(
    "corpus_apply_updates",
    oracle="""
    WITH updates AS (
        SELECT doc_id, text || ' v2' AS text, 'changed' AS op
        FROM documents WHERE doc_id % 13 = 0 AND doc_id % 11 <> 0
        UNION ALL
        SELECT doc_id, NULL AS text, 'delete' AS op
        FROM documents WHERE doc_id % 11 = 0
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text || ' new' AS text, 'insert' AS op
        FROM documents WHERE doc_id % 17 = 0),
    merged AS (
        SELECT coalesce(u.doc_id, b.doc_id) AS doc_id,
               CASE WHEN u.op = 'delete' THEN NULL
                    WHEN u.op IS NOT NULL THEN u.text
                    ELSE b.text END AS text,
               CASE WHEN u.op = 'delete' THEN NULL
                    WHEN u.op IS NOT NULL THEN u.op
                    ELSE 'kept' END AS op
        FROM documents b FULL OUTER JOIN updates u ON b.doc_id = u.doc_id)
    SELECT op, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM merged WHERE op IS NOT NULL
    GROUP BY op
    """,
    tags=("pipeline", "versioning", "extension"),
)
def corpus_apply_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot MERGE (upsert/delete apply): a deterministic change set
    (every 13th doc updated, every 11th deleted, a shifted copy of every
    17th inserted) merges into the base corpus — matched rows update or
    delete, unmatched insert, untouched rows carry through. Output audits
    the merged snapshot per operation. The plain-parquet MERGE INTO: one
    full outer join on the id carrying (id, text, op) — the companion
    operator to corpus_snapshot_diff, together the versioned-dataset
    read/write cycle."""
    d = _t(spark, sf_dir, "documents")
    upd = (
        d.filter((F.col("doc_id") % 13 == 0) & (F.col("doc_id") % 11 != 0))
        .select("doc_id", F.concat("text", F.lit(" v2")).alias("u_text"), F.lit("changed").alias("op"))
        .union(
            d.filter(F.col("doc_id") % 11 == 0).select(
                "doc_id", F.lit(None).cast("string").alias("u_text"), F.lit("delete").alias("op")
            )
        )
        .union(
            d.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat("text", F.lit(" new")).alias("u_text"),
                F.lit("insert").alias("op"),
            )
        )
    )
    merged = (
        d.select("doc_id", "text")
        .join(upd, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.when(F.col("op") == "delete", F.lit(None))
            .when(F.col("op").isNotNull(), F.col("u_text"))
            .otherwise(F.col("text"))
            .alias("text"),
            F.when(F.col("op") == "delete", F.lit(None))
            .when(F.col("op").isNotNull(), F.col("op"))
            .otherwise(F.lit("kept"))
            .alias("op"),
        )
        .filter(F.col("op").isNotNull())
    )
    return merged.groupBy("op").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )


_MIX_TEMPERATURE = 0.7  # the multilingual-sampling temperature exponent


@register(
    "temperature_mix_weights",
    oracle=f"""
    WITH cells AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang),
    shares AS (
        SELECT lang, n_docs,
               n_docs * 1.0 / sum(n_docs) OVER () AS p
        FROM cells)
    SELECT lang, n_docs,
           round(p, 6) AS raw_share,
           round(pow(p, {_MIX_TEMPERATURE})
                 / sum(pow(p, {_MIX_TEMPERATURE})) OVER (), 6) AS temp_share,
           round((pow(p, {_MIX_TEMPERATURE})
                 / sum(pow(p, {_MIX_TEMPERATURE})) OVER ()) / p, 6) AS up_weight
    FROM shares
    """,
    tags=("text", "pipeline", "sampling", "extension"),
)
def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language sampling (the multilingual-training mix:
    sample language i with probability ∝ p_i^T, T=0.7): raw share,
    temperature-flattened share, and the per-doc up-weight each language
    gets. Same tiny-aggregate+window shape as lang_rebalance_weights —
    uniform is the T→0 limit, raw sampling is T=1."""
    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy()
    p = F.col("n_docs") / F.sum("n_docs").over(w)
    pt = F.pow(p, F.lit(_MIX_TEMPERATURE))
    temp_share = pt / F.sum(pt).over(w)
    return cells.select(
        "lang",
        "n_docs",
        F.round(p, 6).alias("raw_share"),
        F.round(temp_share, 6).alias("temp_share"),
        F.round(temp_share / p, 6).alias("up_weight"),
    )


@register(
    "doc_rarity_score",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        FROM documents WHERE text IS NOT NULL),
    dfreq AS (
        SELECT token, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_distinct_tokens,
           round(avg(ln(n.n_docs * 1.0 / d.df)), 6) AS rarity
    FROM tok t JOIN dfreq d USING (token) CROSS JOIN n
    GROUP BY t.doc_id
    """,
    tags=("text", "pipeline", "scoring", "extension"),
)
def doc_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document rarity scoring: mean IDF of a document's distinct tokens —
    the cheap self-information proxy that surfaces documents made of rare
    vocabulary (high) vs boilerplate (low), used to bias training mixes
    toward informative text.

    Scale shape: one explode feeds BOTH the per-token document frequencies
    (tiny: |vocab| rows, broadcast back) and the per-doc aggregate; the
    1-row corpus count broadcasts. Two narrow shuffles total."""
    d = _t(spark, sf_dir, "documents")
    tok = (
        d.filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token"))
    )
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tok.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.round(F.avg(F.log(F.col("n_docs") / F.col("df"))), 6).alias("rarity"),
        )
    )


@register(
    "train_val_test_split",
    oracle="""
    WITH tagged AS (
        SELECT source,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                    THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents)
    SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs
    FROM tagged GROUP BY source, split
    """,
    tags=("pipeline", "sampling", "extension"),
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content-stable
    hash (first md5 byte: < 0xcd → train ≈ 205/256, < 0xe6 → val ≈ 25/256,
    else test ≈ 26/256) — the split every supervised pipeline needs, stable
    across engines/reruns/shards so no document ever migrates between
    splits. Zero-shuffle as a tag; one aggregate for the per-source audit
    emitted here."""
    d = _t(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < "cd", "train").when(h2 < "e6", "val").otherwise("test")
    )
    return d.groupBy("source", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "gopher_rules_report",
    oracle="""
    WITH m AS (
      SELECT source,
             len(string_split(text, ' ')) AS wc,
             list_sum(list_transform(string_split(text, ' '), t -> len(t)))::DOUBLE
               / greatest(len(string_split(text, ' ')), 1) AS mwl,
             len(list_distinct(string_split(text, ' ')))::DOUBLE
               / greatest(len(string_split(text, ' ')), 1) AS distinct_ratio,
             len(list_intersect(list_distinct(string_split(text, ' ')),
                 ['the','a','an','of','and','to','in','is','it','that'])) AS n_stop
      FROM documents WHERE text IS NOT NULL)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN wc NOT BETWEEN 20 AND 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_wordcount,
           CAST(sum(CASE WHEN mwl NOT BETWEEN 3 AND 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_meanlen,
           CAST(sum(CASE WHEN n_stop < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stopword,
           CAST(sum(CASE WHEN distinct_ratio < 0.35 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_distinct,
           CAST(sum(CASE WHEN wc BETWEEN 20 AND 1000 AND mwl BETWEEN 3 AND 10
                          AND n_stop >= 2 AND distinct_ratio >= 0.35
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM m GROUP BY source
    """,
    tags=("text", "pipeline", "quality", "extension"),
)
def gopher_rules_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule gate (word-count bounds, mean-word-length
    band, required-stopword presence, distinct-token ratio — the rule
    families of the Gopher/MassiveText filter, thresholds fit to this
    corpus), reported as per-source violation counts plus the survivors.

    Plan: ONE scan — every rule is a codegen'd expression over the token
    array, the report is a single partial-aggregated groupBy on source.
    No UDFs, no second pass; at 100 TB this is the cheapest shape a
    multi-rule gate can take (rules are columns, not separate filters, so
    adding a rule costs zero extra I/O). The per-doc boolean columns are
    reusable as a keep-filter by composing the same exprs with
    ``df.filter`` — the report and the gate share one plan."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.split(F.col("text"), " ")
    wc = F.size(toks)
    mwl = F.aggregate(
        F.transform(toks, F.length), F.lit(0).cast("long"), lambda acc, x: acc + x
    ).cast("double") / F.greatest(wc, F.lit(1))
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        wc, F.lit(1)
    )
    sw = F.array(*[F.lit(w) for w in T.STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), sw))
    m = d.select(
        "source",
        wc.alias("wc"),
        mwl.alias("mwl"),
        distinct_ratio.alias("distinct_ratio"),
        n_stop.alias("n_stop"),
    )
    wc_ok = F.col("wc").between(20, 1000)
    mwl_ok = F.col("mwl").between(3, 10)
    stop_ok = F.col("n_stop") >= 2
    dr_ok = F.col("distinct_ratio") >= 0.35
    as_cnt = lambda c, n: F.sum(F.when(c, 1).otherwise(0)).cast("long").alias(n)  # noqa: E731
    return m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        as_cnt(~wc_ok, "n_fail_wordcount"),
        as_cnt(~mwl_ok, "n_fail_meanlen"),
        as_cnt(~stop_ok, "n_fail_stopword"),
        as_cnt(~dr_ok, "n_fail_distinct"),
        as_cnt(wc_ok & mwl_ok & stop_ok & dr_ok, "n_kept"),
    )


@register(
    "doc_length_quantiles_dist",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_chars, 0.25), 6) AS p25,
           round(quantile_cont(n_chars, 0.50), 6) AS p50,
           round(quantile_cont(n_chars, 0.75), 6) AS p75,
           round(quantile_cont(n_chars, 0.90), 6) AS p90
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "pipeline", "stats", "quantile", "extension"),
)
def doc_length_quantiles_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe twin of `doc_length_quantiles`: the SAME per-language exact
    quantiles computed via operators/stats.exact_group_quantiles — the
    range sort orders (lang, n_chars), so a corpus-dominating language
    spans range partitions instead of landing in one percentile merge
    buffer. The oracle is byte-identical to doc_length_quantiles', so a
    hash-green row externally proves the distributed selection equals the
    built-in aggregate on real data every round (same proof pattern as
    rolling_event_value_bucketed)."""
    from dampr_spark.operators.stats import exact_group_quantiles

    d = _t(spark, sf_dir, "documents")
    q = exact_group_quantiles(d, ["lang"], "n_chars", [0.25, 0.50, 0.75, 0.90])
    # n_docs counts ALL rows per lang (the oracle's count(*)), not the
    # non-NULL n_chars rows exact_group_quantiles' n reflects — on a corpus
    # with NULL lengths the two would diverge.
    n_docs = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return n_docs.join(q, "lang").select(
        "lang",
        "n_docs",
        F.round("q_0", 6).alias("p25"),
        F.round("q_1", 6).alias("p50"),
        F.round("q_2", 6).alias("p75"),
        F.round("q_3", 6).alias("p90"),
    )


_WS_K = 200  # sample size

# DuckDB twin of Spark's conv(substr(md5(id), 1, 8), 16, 10): big-endian
# uint32 of the first 4 digest bytes (shared hex-replay helper).
from dampr_spark.functions.hashing import md5_uint_sql as _md5_uint_sql  # noqa: E402

_WS_U_SQL = (
    f"({_md5_uint_sql('CAST(doc_id AS VARCHAR)', 4, little_endian=False)} + 1)"
    " / 4294967296.0"
)


@register(
    "weighted_sample_topk",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {T.token_count_sql('text')} AS n_tokens,
             {_WS_U_SQL} AS u
      FROM documents WHERE text IS NOT NULL)
    SELECT doc_id, n_tokens,
           round(ln(u) / n_tokens, 6) AS sample_key
    FROM s
    ORDER BY ln(u) / n_tokens DESC, doc_id
    LIMIT {_WS_K}
    """,
    tags=("pipeline", "sampling", "extension"),
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each document draws a uniform u from the
    md5 of its id and competes with key ln(u)/w (the monotone form of
    u^(1/w)); the global top-k IS a weighted sample — here weighted by
    token count, the 'sample long documents proportionally more' knob of
    training-data curation.

    Deterministic-by-hash instead of RNG-seeded, so BOTH engines draw the
    identical sample and the query is fully oracle-checked — unlike
    `sample_rows`, whose engine RNG makes it rows-only. Scale shape: one
    scan computing (u, key) as expressions, then TakeOrdered partial top-k
    per partition — no shuffle of the corpus, no global sort; per-group
    variants just add the group key to a row_number window
    (budget_sample_per_source is that shape)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 1
    ) / F.lit(4294967296.0)
    key = F.log(u) / T.token_count("text")
    return (
        d.select(
            "doc_id",
            T.token_count("text").alias("n_tokens"),
            key.alias("_key"),
        )
        .orderBy(F.col("_key").desc(), "doc_id")
        .limit(_WS_K)
        .select("doc_id", "n_tokens", F.round("_key", 6).alias("sample_key"))
    )


@register(
    "leakage_safe_split",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             md5(substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 80)) AS fp,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS naive_split
      FROM documents WHERE text IS NOT NULL),
    g AS (
      SELECT fp, min(doc_id) AS canonical,
             CAST(count(*) AS BIGINT) AS n_docs,
             count(DISTINCT naive_split) AS n_naive
      FROM d GROUP BY fp),
    gs AS (
      SELECT *, CASE WHEN substr(md5(CAST(canonical AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                     WHEN substr(md5(CAST(canonical AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                     ELSE 'test' END AS safe_split
      FROM g)
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_doc_groups,
           CAST(sum(CASE WHEN n_naive > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_groups_naive,
           CAST(sum(CASE WHEN safe_split = 'train' THEN n_docs ELSE 0 END) AS BIGINT) AS n_train_docs,
           CAST(sum(CASE WHEN safe_split = 'val' THEN n_docs ELSE 0 END) AS BIGINT) AS n_val_docs,
           CAST(sum(CASE WHEN safe_split = 'test' THEN n_docs ELSE 0 END) AS BIGINT) AS n_test_docs
    FROM gs
    """,
    tags=("pipeline", "sampling", "dedup", "extension"),
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val/test split: duplicate groups (80-char
    normalized-prefix fingerprint — the deterministic near-dup proxy; exact
    fingerprints find zero dups on this corpus) are assigned WHOLE to one split by hashing the group's
    canonical id — the leakage guard the per-document `train_val_test_split`
    cannot give (a doc and its duplicate landing in train and test is
    test-set contamination). The report quantifies exactly that:
    ``n_leaky_groups_naive`` counts dup-groups the naive per-doc hash split
    straddles across splits, and the safe per-split doc counts show the
    group-level assignment. One fingerprint shuffle + one bounded aggregate;
    near-dup (MinHash-cluster) grouping drops in by swapping the fp column
    for the cluster canonical (seeded → rows-only, so the registered form
    uses the exact grouping)."""
    from dampr_spark.functions.text import normalized_text

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # 80-char prefix fingerprint: the deterministic near-dup proxy (template
    # duplicates share long verbatim prefixes; exact-md5 grouping would be
    # degenerate on a corpus whose dups are near, not exact).
    fp = F.md5(F.substring(normalized_text("text"), 1, 80))
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    naive = F.when(h2 < "cd", "train").when(h2 < "e6", "val").otherwise("test")
    g = (
        d.select(fp.alias("fp"), "doc_id", naive.alias("naive_split"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical"),
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("naive_split").alias("n_naive"),
        )
    )
    hc = F.substring(F.md5(F.col("canonical").cast("string")), 1, 2)
    safe = F.when(hc < "cd", "train").when(hc < "e6", "val").otherwise("test")
    gs = g.withColumn("safe_split", safe)
    return gs.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).cast("long").alias("n_multi_doc_groups"),
        F.sum(F.when(F.col("n_naive") > 1, 1).otherwise(0)).cast("long").alias("n_leaky_groups_naive"),
        F.sum(F.when(F.col("safe_split") == "train", F.col("n_docs")).otherwise(0)).cast("long").alias("n_train_docs"),
        F.sum(F.when(F.col("safe_split") == "val", F.col("n_docs")).otherwise(0)).cast("long").alias("n_val_docs"),
        F.sum(F.when(F.col("safe_split") == "test", F.col("n_docs")).otherwise(0)).cast("long").alias("n_test_docs"),
    )


@register(
    "profile_orders",
    oracle="""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders)
    SELECT * FROM (
      SELECT 'o_orderkey' AS "column", n.n_rows,
             CAST((SELECT count(*) FROM orders WHERE o_orderkey IS NULL) AS BIGINT) AS n_nulls,
             CAST((SELECT count(DISTINCT o_orderkey) FROM orders) AS BIGINT) AS n_distinct,
             CAST((SELECT min(o_orderkey) FROM orders) AS VARCHAR) AS min_repr,
             CAST((SELECT max(o_orderkey) FROM orders) AS VARCHAR) AS max_repr
      FROM n
      UNION ALL
      SELECT 'o_custkey', n.n_rows,
             CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT),
             CAST((SELECT count(DISTINCT o_custkey) FROM orders) AS BIGINT),
             CAST((SELECT min(o_custkey) FROM orders) AS VARCHAR),
             CAST((SELECT max(o_custkey) FROM orders) AS VARCHAR)
      FROM n
      UNION ALL
      SELECT 'o_orderstatus', n.n_rows,
             CAST((SELECT count(*) FROM orders WHERE o_orderstatus IS NULL) AS BIGINT),
             CAST((SELECT count(DISTINCT o_orderstatus) FROM orders) AS BIGINT),
             (SELECT min(o_orderstatus) FROM orders),
             (SELECT max(o_orderstatus) FROM orders)
      FROM n
      UNION ALL
      SELECT 'o_orderpriority', n.n_rows,
             CAST((SELECT count(*) FROM orders WHERE o_orderpriority IS NULL) AS BIGINT),
             CAST((SELECT count(DISTINCT o_orderpriority) FROM orders) AS BIGINT),
             (SELECT min(o_orderpriority) FROM orders),
             (SELECT max(o_orderpriority) FROM orders)
      FROM n
      UNION ALL
      SELECT 'o_orderdate', n.n_rows,
             CAST((SELECT count(*) FROM orders WHERE o_orderdate IS NULL) AS BIGINT),
             CAST((SELECT count(DISTINCT o_orderdate) FROM orders) AS BIGINT),
             CAST((SELECT min(o_orderdate) FROM orders) AS VARCHAR),
             CAST((SELECT max(o_orderdate) FROM orders) AS VARCHAR)
      FROM n)
    """,
    tags=("pipeline", "quality", "extension"),
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan dataset profile of the orders table (Deequ-style): per
    column — null count, exact distinct count, min/max — computed as ONE
    wide aggregate then unpivoted (operators/profile.py), where the naive
    profiler scans once per column. Doubles are excluded from the REGISTERED
    column set only because double→string rendering differs across engines
    (the operator itself profiles any type); the oracle recomputes every
    cell independently."""
    from dampr_spark.operators.profile import profile

    return profile(
        _t(spark, sf_dir, "orders"),
        cols=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"],
    )


@register(
    "corpus_shuffle_order",
    oracle="""
    SELECT doc_id, source,
           CAST(row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':shuf42'), doc_id)
             AS BIGINT) AS shuffle_rank
    FROM documents
    ORDER BY shuffle_rank
    LIMIT 50
    """,
    tags=("pipeline", "sampling", "extension"),
)
def corpus_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every epoch pipeline
    needs the corpus in a reproducible pseudorandom order (same order on
    every engine, every rerun, every shard layout — never
    `ORDER BY rand()`, which breaks retries and lineage recomputation).
    Rank = position in md5(doc_id || salt) order; changing the salt gives an
    independent epoch permutation. The LIMIT keeps the catalog row bounded;
    the write path is `df.repartitionByRange(n, h).sortWithinPartitions(h)`
    on the same hash — a full range-partitioned sort, the TeraSort shape,
    with NO single-task collection point."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shuf42")))
    from pyspark.sql.window import Window

    # Heap top-50 FIRST (TakeOrderedAndProject — per-partition heaps, no
    # global sort), THEN rank the 50 survivors: a bare global row_number
    # would move the whole corpus through one WindowExec partition, the
    # exact single-task funnel this catalog bans.
    head = (
        d.select("doc_id", "source", h.alias("_h"))
        .orderBy(F.col("_h"), F.col("doc_id"))
        .limit(50)
    )
    w = Window.orderBy(F.col("_h"), F.col("doc_id"))
    return head.select(
        "doc_id", "source", F.row_number().over(w).cast("long").alias("shuffle_rank")
    )


# DuckDB twin of word_ngrams(col, 2): distinct word bigrams, used by the
# fuzzy decontamination + novelty queries (bigram-level overlap is the
# right granularity for this corpus's short synthetic docs; real pipelines
# tune n per tokenizer).
_BIGRAMS_SQL = """
    list_distinct(list_transform(
        range(1, greatest(len(string_split(text, ' ')) - 1, 1) + 1),
        i -> array_to_string(string_split(text, ' ')[i:i+1], ' ')))
"""

_FUZZY_TAU = 0.05  # bigram-Jaccard flag threshold


@register(
    "fuzzy_decontaminate",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_BIGRAMS_SQL} AS g
        FROM documents WHERE text IS NOT NULL),
    bench AS (
        SELECT doc_id AS bench_doc_id, unnest(g) AS gram
        FROM d WHERE doc_id % {_BENCH_MOD} = 0),
    corpus AS (
        SELECT doc_id, unnest(g) AS gram
        FROM d WHERE doc_id % {_BENCH_MOD} <> 0),
    sizes AS (SELECT doc_id, len(g) AS n FROM d),
    pairs AS (
        SELECT c.doc_id, b.bench_doc_id, count(*) AS shared
        FROM corpus c JOIN bench b USING (gram)
        GROUP BY c.doc_id, b.bench_doc_id),
    scored AS (
        SELECT p.doc_id, p.bench_doc_id,
               round(p.shared * 1.0 / (sa.n + sb.n - p.shared), 6) AS jaccard
        FROM pairs p
        JOIN sizes sa ON sa.doc_id = p.doc_id
        JOIN sizes sb ON sb.doc_id = p.bench_doc_id
        WHERE p.shared * 1.0 / (sa.n + sb.n - p.shared) >= {_FUZZY_TAU})
    SELECT doc_id, bench_doc_id, jaccard
    FROM (SELECT *, row_number() OVER (
              PARTITION BY doc_id
              ORDER BY jaccard DESC, bench_doc_id) AS rn
          FROM scored)
    WHERE rn = 1
    """,
    tags=("text", "pipeline", "decontamination", "fuzzy", "extension"),
)
def fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY benchmark decontamination — the near-duplicate complement of
    `decontaminate_ngram`'s exact-overlap check: a training document is
    flagged when its word-bigram Jaccard with ANY held-out benchmark doc
    reaches the threshold, reporting the worst-offending benchmark doc
    (ties -> lowest id). Catches paraphrased/lightly-edited eval leakage
    that exact n-gram containment misses.

    Plan shape for 100 TB: identical economics to `decontaminate_ngram` —
    the benchmark side is an eval suite (bounded), so its exploded gram
    postings BROADCAST; candidate pairs only form for docs sharing a gram
    with a bench doc (never corpus x bench), and the per-(doc, bench)
    shared-count aggregate collapses gram rows map-side before the single
    doc-keyed shuffle. The argmax is a groupBy max_by, not a window over
    the corpus.

    Round 10: the plan is `operators/dedup.fuzzy_contamination` (this
    query binds corpus/bench to the doc_id % 97 split); its `max_df`
    posting cap plus `dedup.contamination_posting_audit` are the
    stopword-gram saturation knob and sizing instrument — 100x budget
    proof in benchmarks/decontam_scale_proof_100x.py."""
    d = _t(spark, sf_dir, "documents")
    return dedup.fuzzy_contamination(
        d.filter(F.col("doc_id") % _BENCH_MOD != 0),
        d.filter(F.col("doc_id") % _BENCH_MOD == 0),
        n=2,
        tau=_FUZZY_TAU,
    )


@register(
    "contamination_posting_audit",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_BIGRAMS_SQL} AS g
        FROM documents WHERE text IS NOT NULL),
    cf AS (
        SELECT gram, CAST(count(*) AS BIGINT) AS cf
        FROM (SELECT doc_id, unnest(g) AS gram FROM d
              WHERE doc_id % {_BENCH_MOD} <> 0)
        GROUP BY gram),
    bf AS (
        SELECT gram, CAST(count(*) AS BIGINT) AS bf
        FROM (SELECT doc_id, unnest(g) AS gram FROM d
              WHERE doc_id % {_BENCH_MOD} = 0)
        GROUP BY gram),
    j AS (
        SELECT bf.gram, bf.bf, COALESCE(cf.cf, 0) AS cf
        FROM bf LEFT JOIN cf USING (gram))
    SELECT CAST(count(*) AS BIGINT)                            AS n_bench_grams,
           CAST(COALESCE(sum(CASE WHEN cf > 0 THEN 1 ELSE 0 END), 0)
                AS BIGINT)                                     AS grams_matched,
           CAST(COALESCE(sum(CASE WHEN cf > 50 THEN 1 ELSE 0 END), 0)
                AS BIGINT)                                     AS grams_over_cap,
           CAST(COALESCE(sum(cf * bf), 0) AS BIGINT)           AS raw_join_rows,
           CAST(COALESCE(sum(CASE WHEN cf <= 50 THEN cf * bf ELSE 0 END), 0)
                AS BIGINT)                                     AS capped_join_rows,
           CAST(COALESCE(sum(cf * bf), 0)
                - COALESCE(sum(CASE WHEN cf <= 50 THEN cf * bf ELSE 0 END), 0)
                AS BIGINT)                                     AS rows_dropped
    FROM j
    """,
    tags=("text", "pipeline", "decontamination", "audit", "extension"),
)
def contamination_posting_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine contract of `operators/dedup.contamination_posting_audit`
    — the decontamination sizing instrument (VERDICT r9 #4: the
    posting-list twin of `grid_resolution_audit` / `lsh_band_audit`):
    Σ cf(g)·bf(g) is EXACTLY the row count `fuzzy_decontaminate`'s gram
    join streams, computed here from two gram-frequency aggregates (the
    corpus one semi-joined to the broadcast bench gram set, so only
    bench-matching rows enter its exchange) before any pair forms,
    split into raw vs capped at corpus-df ≤ 50
    (the `max_df` knob that drops stopword-common, signal-free grams).
    Fully SQL-expressible — every column hash-compares against DuckDB for
    real. 100x budget proof: benchmarks/decontam_scale_proof_100x.py."""
    d = _t(spark, sf_dir, "documents")
    return dedup.contamination_posting_audit(
        d.filter(F.col("doc_id") % _BENCH_MOD != 0),
        d.filter(F.col("doc_id") % _BENCH_MOD == 0),
        n=2,
        max_df=50,
    )


@register(
    "ngram_novelty",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_GRAMS_SQL} AS g
        FROM documents WHERE text IS NOT NULL),
    grams AS (SELECT doc_id, unnest(g) AS gram FROM d),
    firsts AS (SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS novelty
    FROM grams g JOIN firsts f USING (gram)
    GROUP BY g.doc_id
    """,
    tags=("text", "pipeline", "novelty", "extension"),
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct word
    3-grams that appear for the FIRST time in the corpus in this doc
    (ingestion order = doc_id). The dedup-adjacent curation signal: a
    near-zero novelty tail is boilerplate/templated content even when no
    single pair crosses a dedup threshold; novelty-weighted sampling is a
    standard repetition-control knob.

    Plan shape for 100 TB: one explode -> groupBy(gram) min(doc_id) (the
    only gram-keyed shuffle; partial agg collapses repeats map-side), then
    a gram-keyed join back and a doc-keyed count aggregate. No windows, no
    per-doc state; hot grams cost one (gram, min) row each. Implemented by
    operators/dedup.ngram_novelty_scores (also the 10x scale-proof and
    streaming-twin surface)."""
    from dampr_spark.operators.dedup import ngram_novelty_scores

    return ngram_novelty_scores(_t(spark, sf_dir, "documents"), "text", "doc_id", 3)


@register(
    "class_weights",
    oracle="""
    WITH c AS (SELECT label, count(*) AS n FROM embeddings
               WHERE label IS NOT NULL GROUP BY label),
    t AS (SELECT sum(n) AS total, count(*) AS k FROM c)
    SELECT label, CAST(n AS BIGINT) AS n,
           round(total * 1.0 / (k * n), 6) AS weight
    FROM c, t
    """,
    tags=("pipeline", "labels", "extension"),
)
def class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights (sklearn's 'balanced' formula
    total/(k*n_c)) over the embeddings labels — what a training loop feeds
    its loss to counter class imbalance. NULL labels are excluded on both
    engines. One tiny aggregate; the per-class table broadcasts back over
    the 1-row total via crossJoin."""
    c = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("label").isNotNull())
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)  # bounded (one row per class label)
    )
    t = c.agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("k"))
    return c.crossJoin(F.broadcast(t)).select(
        "label",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("total") / (F.col("k") * F.col("n")), 6).alias("weight"),
    )


@register(
    "length_curriculum_buckets",
    oracle="""
    WITH b AS (
        SELECT doc_id, n_chars,
               ntile(4) OVER (ORDER BY n_chars, doc_id) AS bucket
        FROM documents WHERE n_chars IS NOT NULL)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           round(avg(n_chars), 6) AS avg_chars
    FROM b GROUP BY bucket
    """,
    tags=("pipeline", "curriculum", "extension"),
)
def length_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-quartile curriculum buckets: ntile(4) over (n_chars, doc_id)
    — the deterministic tie order makes the bucket CUT identical across
    engines — then per-bucket size and length stats. The batching prep for
    length-bucketed training (minimize padding) and shortest-first
    curricula.

    Scale shape: NOT a global ntile window (a single-task sort of the
    whole corpus) — the bucket comes from
    :func:`dampr_spark.operators.stats.distributed_ntile`: a parallel
    range sort + rank recovery (the exact-quantile recipe) and ntile's
    bucket arithmetic as a plain expression on the recovered rank. The
    (n_chars, doc_id) order is total, so the result is bit-identical to
    the window form the oracle runs."""
    from dampr_spark.operators.stats import distributed_ntile

    b = distributed_ntile(
        _t(spark, sf_dir, "documents")
        .filter(F.col("n_chars").isNotNull())
        .select("doc_id", "n_chars"),
        4,
        ["n_chars", "doc_id"],
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    ).select(F.col("bucket").cast("int").alias("bucket"), "n_docs", "min_chars", "max_chars", "avg_chars")


_N_SHARDS = 16


@register(
    "training_shards_manifest",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, n_chars,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'),
                                    1, 8))::BIGINT % {_N_SHARDS} AS INT) AS shard_id
        FROM documents WHERE text IS NOT NULL)
    SELECT shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM s GROUP BY shard_id
    """,
    tags=("pipeline", "shards", "extension"),
)
def training_shards_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard assignment + MANIFEST — the dataloader handoff step:
    every surviving document is assigned a shard by a salted md5 hash
    (deterministic: reruns, retries, and both engines agree; never
    ``rand()``), and the manifest reports per-shard doc/token counts and
    id ranges — what a loader needs to size epochs and what an auditor
    needs to prove the split is disjoint and complete.

    Plan shape for 100 TB: the hash is a codegen expression on the scan;
    the manifest is one shard-keyed aggregate (16..4096 rows) with map-side
    partials. The physical write is `df.write.partitionBy(shard_id)` or
    `repartition(n, shard_id)` + per-shard files — the same layout
    machinery as IVFIndex.write_partitioned; this query is the
    (oracle-checkable) assignment + accounting half."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    shard = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shard"))), 1, 8),
            16,
            10,
        ).cast("long")
        % _N_SHARDS
    ).cast("int")
    s = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        shard.alias("shard_id"),
    )
    return s.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
    )


@register(
    "dup_cluster_histogram",
    oracle="""
    WITH fp AS (
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
        FROM documents WHERE text IS NOT NULL),
    clusters AS (SELECT f, count(*) AS cluster_size FROM fp GROUP BY f)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM clusters GROUP BY cluster_size
    """,
    tags=("dedup", "audit", "extension"),
)
def dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster SIZE distribution — the dedup audit that tells you
    where the duplication mass lives (a million pairs could be one
    mega-cluster or a long tail; the removal strategy differs). Exact
    normalized-text fingerprints -> per-cluster size -> histogram: two
    digest-keyed aggregates, each with map-side partials; document bodies
    never shuffle."""
    fp = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(T.fingerprint("text").alias("f"))
    )
    clusters = fp.groupBy("f").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        clusters.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            (F.col("cluster_size") * F.col("n_clusters")).cast("long").alias("n_docs"),
        )
    )


@register(
    "token_entropy",
    oracle="""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents WHERE text IS NOT NULL),
    c AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word),
    n AS (SELECT doc_id, sum(cnt) AS n FROM c GROUP BY doc_id)
    SELECT c.doc_id,
           CAST(any_value(n.n) AS BIGINT) AS n_tokens,
           round(-sum((c.cnt * 1.0 / n.n) * ln(c.cnt * 1.0 / n.n)), 6)
               AS entropy
    FROM c JOIN n USING (doc_id)
    GROUP BY c.doc_id
    """,
    tags=("text", "quality", "extension"),
)
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram (Shannon) entropy in nats — the
    repetition-quality signal that catches low-diversity docs a
    duplicate-ratio filter misses (a doc alternating two words has dup
    ratio ~1 but near-zero entropy; keyboard-mash has high entropy). The
    Gopher-family filters threshold on exactly this.

    Plan shape for 100 TB: explode -> (doc, word) count -> per-doc total
    join (same doc-keyed co-partitioned shuffle — AQE coalesces) -> one
    aggregate. The entropy sum is a codegen expression; rounded 6dp so
    cross-engine libm `ln` drift cannot flip the hash (same discipline as
    the oracle-green TF-IDF log)."""
    w = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
    )
    c = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    n = c.groupBy("doc_id").agg(F.sum("cnt").alias("n"))
    p = F.col("cnt") / F.col("n")
    return (
        c.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.first("n").cast("long").alias("n_tokens"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


@register(
    "exact_dedup_keep_best",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source,
               {T.fingerprint_sql('text')} AS fp,
               {T.quality_score_sql('text')} AS q
        FROM documents WHERE text IS NOT NULL),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY fp ORDER BY q DESC, doc_id) AS rn
        FROM scored)
    SELECT doc_id, source, round(q, 6) AS quality
    FROM ranked WHERE rn = 1
    """,
    tags=("dedup", "pipeline", "extension"),
)
def exact_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with a KEEP-BEST policy: within each duplicate group
    keep the highest-quality copy (ties -> lowest doc_id) instead of the
    min-id canonical — the policy real pipelines actually want when dup
    groups mix clean and mangled copies of the same text.

    Plan shape: one fingerprint-keyed max_by aggregate (groupBy +
    max(struct(q, -doc_id, payload)) — partial aggregation keeps one
    candidate row per group per map task; no window over the corpus,
    document bodies shuffle once inside the struct)."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            T.fingerprint("text").alias("fp"),
            T.quality_score("text").alias("q"),
        )
    )
    best = d.groupBy("fp").agg(
        F.max(
            F.struct(
                F.col("q"), (-F.col("doc_id")).alias("negid"),
                F.col("source"),
            )
        ).alias("m")
    )
    return best.select(
        (-F.col("m.negid")).alias("doc_id"),
        F.col("m.source").alias("source"),
        F.round(F.col("m.q"), 6).alias("quality"),
    )


_PMI_MIN_COUNT = 5
_PMI_TOP = 50


@register(
    "bigram_pmi",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL),
    uni AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
    n1 AS (SELECT sum(c) AS n FROM uni),
    bg AS (
        SELECT unnest(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 1, 0) + 1),
                   i -> struct_pack(a := string_split(text, ' ')[i],
                                    b := string_split(text, ' ')[i+1]))) AS p
        FROM documents WHERE text IS NOT NULL),
    big AS (SELECT p.a AS a, p.b AS b, count(*) AS cab FROM bg GROUP BY p.a, p.b),
    n2 AS (SELECT sum(cab) AS n FROM big),
    scored AS (
        SELECT big.a, big.b, big.cab,
               round(ln((big.cab * 1.0 / n2.n)
                        / ((ua.c * 1.0 / n1.n) * (ub.c * 1.0 / n1.n))), 6) AS pmi
        FROM big, n1, n2
        JOIN uni ua ON ua.w = big.a
        JOIN uni ub ON ub.w = big.b
        WHERE big.cab >= {_PMI_MIN_COUNT})
    SELECT a, b, CAST(cab AS BIGINT) AS cab, pmi
    FROM scored
    ORDER BY pmi DESC, a, b
    LIMIT {_PMI_TOP}
    """,
    tags=("text", "collocation", "extension"),
)
def bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigram collocations by pointwise mutual information — the
    classic phrase-mining signal (PMI = ln p(ab)/(p(a)p(b)) over adjacent
    token pairs), used to decide which multi-word units a tokenizer or
    phrase table should treat atomically.

    Plan shape for 100 TB: two vocabulary-sized aggregates (unigram and
    adjacent-bigram counts, both with map-side partials), two broadcastable
    scalar totals, and two vocabulary-keyed joins of the bigram table
    against unigram counts; the final cut is a heap top-50 on the ROUNDED
    score (TakeOrdered, no global sort). The bigram total n2 is a
    sum-of-(len-1) over docs — NEVER a second pair-explode pass (the
    interpreted transform is the expensive part; round 6 measured the
    duplicate explode at ~2x query cost). Non-distinct n-grams — this
    deliberately shares no code with the distinct-set word_ngrams dedup
    helper."""
    from dampr_spark.operators.dedup import _ensure_parallelism

    d = _ensure_parallelism(
        _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    toks = F.split(F.col("text"), " ")
    uni = (
        d.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(_pin)  # joined twice (left and right word)
    )
    n1 = uni.agg(F.sum("c").alias("n1"))
    # Shared O(n) bigram expression (round 14): the old per-site
    # transform/element_at shape re-evaluated the split inside the
    # lambda — quadratic in doc length. Keeps the single-token guard
    # (F.sequence(1, 0) DESCENDS; caught by the adversarial fixture).
    pairs = T.adjacent_token_pairs("text")
    big = (
        d.select(F.explode(pairs).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= _PMI_MIN_COUNT)
    )
    # total adjacent pairs = Σ (len-1) per doc = Σ len − n_docs
    # = Σ unigram counts − n_docs (len >= 1 always: split of a non-null
    # string yields at least one token, so greatest(len-1, 0) = len-1).
    # Round 14: Σ len came from a third corpus TOKENIZE pass; the pinned
    # unigram table already holds it as sum(c), so the only corpus work
    # left is a tokenize-free row count. Exact same long on any input.
    n2 = (
        uni.agg(F.sum("c").alias("_s"))
        .crossJoin(F.broadcast(d.agg(F.count(F.lit(1)).alias("_nd"))))
        .select((F.col("_s") - F.col("_nd")).cast("long").alias("n2"))
    )
    ua = uni.select(F.col("w").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("w").alias("b"), F.col("c").alias("cb"))
    return (
        big.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "a",
            "b",
            F.col("cab").cast("long").alias("cab"),
            F.round(
                F.log(
                    (F.col("cab") / F.col("n2"))
                    / ((F.col("ca") / F.col("n1")) * (F.col("cb") / F.col("n1")))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "a", "b")
        .limit(_PMI_TOP)
    )


_PSI_BUCKETS = 10


@register(
    "value_drift_psi",
    oracle=f"""
    WITH v AS (
        SELECT event_id, value,
               CASE WHEN event_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS grp
        FROM events WHERE value IS NOT NULL),
    mm AS (SELECT min(value) AS lo, max(value) AS hi FROM v),
    b AS (
        SELECT grp,
               CASE WHEN mm.hi > mm.lo
                    THEN least({_PSI_BUCKETS - 1}, CAST(floor(
                        (value - mm.lo) / (mm.hi - mm.lo) * {_PSI_BUCKETS})
                        AS INT))
                    ELSE 0 END AS bucket
        FROM v, mm),
    c AS (
        SELECT bucket,
               sum(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS nr,
               sum(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS nc
        FROM b GROUP BY bucket),
    t AS (SELECT sum(nr) AS tr, sum(nc) AS tc FROM c)
    SELECT CAST(t.tr AS BIGINT) AS n_ref,
           CAST(t.tc AS BIGINT) AS n_cur,
           round(sum(
               ((c.nr + 1.0) / (t.tr + {_PSI_BUCKETS})
                - (c.nc + 1.0) / (t.tc + {_PSI_BUCKETS}))
               * ln(((c.nr + 1.0) / (t.tr + {_PSI_BUCKETS}))
                    / ((c.nc + 1.0) / (t.tc + {_PSI_BUCKETS})))), 6) AS psi
    FROM c, t
    GROUP BY t.tr, t.tc
    """,
    tags=("events", "drift", "quality", "extension"),
)
def value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two event-value samples — the
    standard ML-ops drift gate (PSI < 0.1 stable, > 0.25 drifted) a
    feature pipeline runs between a reference window and the current one.
    The fixture splits on event_id parity (deterministic at every sf); a
    real deployment splits on time windows — the plan is identical.

    Plan shape for 100 TB: one min/max aggregate (broadcast back as a
    1-row frame), one bucket-keyed count aggregate with map-side partials
    (10 result rows), and a driver-sized PSI fold; the events table is
    scanned twice (min/max + bucketing) or once if the caller supplies
    known bounds. Laplace +1 smoothing keeps empty buckets finite on both
    engines."""
    v = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "value",
            F.when(F.col("event_id") % 2 == 0, F.lit("ref"))
            .otherwise(F.lit("cur"))
            .alias("grp"),
        )
        .transform(_pin)  # feeds the min/max agg and bucketing
    )
    mm = v.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    b = v.crossJoin(F.broadcast(mm)).select(
        "grp",
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.lit(_PSI_BUCKETS - 1),
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * _PSI_BUCKETS
                ).cast("int"),
            ),
        )
        .otherwise(0)
        .alias("bucket"),
    )
    c = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("grp") == "ref", 1).otherwise(0)).alias("nr"),
        F.sum(F.when(F.col("grp") == "cur", 1).otherwise(0)).alias("nc"),
    ).localCheckpoint(eager=True)  # bounded (PSI buckets); feeds totals + fold
    t = c.agg(F.sum("nr").alias("tr"), F.sum("nc").alias("tc"))
    k = F.lit(float(_PSI_BUCKETS))
    pr = (F.col("nr") + 1.0) / (F.col("tr") + k)
    pc = (F.col("nc") + 1.0) / (F.col("tc") + k)
    return (
        c.crossJoin(F.broadcast(t))
        .groupBy("tr", "tc")
        .agg(F.round(F.sum((pr - pc) * F.log(pr / pc)), 6).alias("psi"))
        .select(
            F.col("tr").cast("long").alias("n_ref"),
            F.col("tc").cast("long").alias("n_cur"),
            "psi",
        )
    )


# ---------------------------------------------------------------------------
# data selection (round 7): DSIR importance weights + bigram-LM perplexity
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256
_DSIR_BUCKET_SQL = f"({_md5_uint_sql('gram', 4, little_endian=False)} % {_DSIR_BUCKETS})"


@register(
    "dsir_en_importance",
    oracle=f"""
WITH pairs AS (
  SELECT doc_id AS id, lang,
    unnest(list_transform(
      range(1, greatest(len(string_split(text, ' ')) - 1, 0) + 1),
      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
    )) AS gram
  FROM documents WHERE text IS NOT NULL),
feats AS (SELECT id, lang, {_DSIR_BUCKET_SQL} AS bucket FROM pairs),
db AS (SELECT id, bucket, count(*) AS k FROM feats GROUP BY 1, 2),
rc AS (SELECT bucket, sum(k) AS rc FROM db GROUP BY 1),
tg AS (SELECT bucket, count(*) AS tc FROM feats WHERE lang = 'en' GROUP BY 1),
tot AS (SELECT (SELECT sum(rc) FROM rc) AS rn, (SELECT sum(tc) FROM tg) AS tn),
lr AS (
  SELECT rc.bucket,
         ln((COALESCE(tg.tc, 0) + 1) * 1.0 / (tot.tn + {_DSIR_BUCKETS}))
       - ln((rc.rc + 1) * 1.0 / (tot.rn + {_DSIR_BUCKETS})) AS lr
  FROM rc LEFT JOIN tg USING (bucket), tot),
sc AS (
  SELECT id, CAST(sum(k) AS BIGINT) AS n_feats,
         round(sum(k * CAST(round(lr * 1000000000000, 0) AS BIGINT))
               / 1000000000000.0, 6) AS log_weight
  FROM db JOIN lr USING (bucket) GROUP BY id)
SELECT d.doc_id, COALESCE(sc.n_feats, 0) AS n_feats,
       COALESCE(sc.log_weight, 0.0) AS log_weight
FROM documents d LEFT JOIN sc ON sc.id = d.doc_id
WHERE d.text IS NOT NULL
""",
    tags=("curation", "selection", "extension"),
)
def dsir_en_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights toward the English slice of the corpus
    (Xie et al. 2023): per doc, the hashed-bigram log-likelihood ratio
    Σ k_f·[ln p_en(f) − ln p_raw(f)] with add-1 smoothing over 256
    md5-hashed word-bigram buckets (md5 = the cross-engine hash, so the
    feature space is oracle-replayable). Sampling ∝ exp(log_weight)
    reshapes the corpus toward the target domain; here en docs score high
    and zh/fr/de/es docs negative — the language split doubles as a
    verifiable domain boundary."""
    from dampr_spark.operators.selection import (
        dsir_importance_weights_flagged,
    )

    d = _t(spark, sf_dir, "documents")
    return dsir_importance_weights_flagged(
        d, F.col("lang") == "en", n_buckets=_DSIR_BUCKETS
    )


@register(
    "bigram_doc_perplexity",
    oracle="""
WITH p0 AS (
  SELECT doc_id AS id,
    unnest(list_transform(
      range(1, greatest(len(t) - 1, 0) + 1),
      i -> struct_pack(a := t[i], b := t[i+1]))) AS p
  FROM (SELECT doc_id, string_split(text, ' ') AS t
        FROM documents WHERE text IS NOT NULL)),
dp AS (SELECT id, p.a AS a, p.b AS b, count(*) AS k FROM p0 GROUP BY 1, 2, 3),
big AS (SELECT a, b, sum(k) AS cab FROM dp GROUP BY 1, 2),
ctx AS (SELECT a, sum(cab) AS ca FROM big GROUP BY 1),
v AS (SELECT count(DISTINCT w) AS v
      FROM (SELECT a AS w FROM dp UNION ALL SELECT b AS w FROM dp))
SELECT dp.id AS doc_id, CAST(sum(dp.k) AS BIGINT) AS n_bigrams,
       round(sum(dp.k * -ln((big.cab + 1.0) / (ctx.ca + v.v))) / sum(dp.k), 6)
           AS avg_nll,
       round(exp(sum(dp.k * -ln((big.cab + 1.0) / (ctx.ca + v.v))) / sum(dp.k)), 6)
           AS ppl
FROM dp JOIN big USING (a, b) JOIN ctx USING (a), v
GROUP BY dp.id
""",
    tags=("curation", "selection", "quality", "extension"),
)
def bigram_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under an add-1-smoothed bigram LM fit on
    the corpus itself — the CCNet/KenLM-style fluency gate: typical-text
    docs score low, off-distribution or shuffled docs high. The corpus
    pair-explodes ONCE into a pinned (doc, a, b) frame feeding both the
    model aggregates and the scoring join (the bigram_pmi duplicate-
    explode lesson)."""
    from dampr_spark.operators.selection import bigram_doc_perplexity as op

    return op(_t(spark, sf_dir, "documents"))


_TOKEN_DRIFT_BUCKETS = 128
_TOKEN_DRIFT_BUCKET_SQL = (
    f"({_md5_uint_sql('gram', 4, little_endian=False)} % {_TOKEN_DRIFT_BUCKETS})"
)


@register(
    "corpus_token_drift",
    oracle=f"""
WITH pairs AS (
  SELECT doc_id,
    unnest(list_transform(
      range(1, greatest(len(string_split(text, ' ')) - 1, 0) + 1),
      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
    )) AS gram
  FROM documents WHERE text IS NOT NULL),
b AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS grp,
         {_TOKEN_DRIFT_BUCKET_SQL} AS bucket
  FROM pairs),
c AS (
  SELECT bucket,
         sum(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END) AS nr,
         sum(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END) AS nc
  FROM b GROUP BY bucket),
t AS (SELECT sum(nr) AS tr, sum(nc) AS tc FROM c)
SELECT CAST(t.tr AS BIGINT) AS n_ref, CAST(t.tc AS BIGINT) AS n_cur,
       CAST(count(*) AS BIGINT) AS n_buckets,
       round(sum(
           ((c.nr + 1.0) / (t.tr + {_TOKEN_DRIFT_BUCKETS})
            - (c.nc + 1.0) / (t.tc + {_TOKEN_DRIFT_BUCKETS}))
           * ln(((c.nr + 1.0) / (t.tr + {_TOKEN_DRIFT_BUCKETS}))
                / ((c.nc + 1.0) / (t.tc + {_TOKEN_DRIFT_BUCKETS})))), 6) AS psi
FROM c, t
GROUP BY t.tr, t.tc
""",
    tags=("text", "drift", "curation", "extension"),
)
def corpus_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-distribution drift between two corpus slices — the text twin
    of `value_drift_psi` a data pipeline runs between corpus versions
    (re-crawl vs last crawl, new shard vs history): PSI over 128
    md5-hashed word-bigram buckets (the same cross-engine feature space
    as DSIR, so fully oracle-checked). The fixture splits on doc_id
    parity; a real pipeline feeds two corpus versions — plan unchanged.
    PSI < 0.1 stable, > 0.25 the new crawl's language has shifted.

    Plan shape for 100 TB: one pair-explode per slice into a 128-row
    bucket histogram (map-side partials), then driver-sized PSI
    arithmetic — corpora reduce to 2x128 cells."""
    from dampr_spark.functions.hashing import md5_bucket
    from dampr_spark.operators.dedup import _ensure_parallelism
    from dampr_spark.operators.selection import _adjacent_pairs

    B = _TOKEN_DRIFT_BUCKETS
    b = (
        _ensure_parallelism(
            _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
        )
        .select(
            F.when(F.col("doc_id") % 2 == 0, "ref").otherwise("cur").alias("grp"),
            F.explode(_adjacent_pairs("text")).alias("p"),
        )
        .select(
            "grp",
            md5_bucket(
                F.concat_ws(" ", F.col("p.a"), F.col("p.b")), B
            ).alias("bucket"),
        )
    )
    c = (
        b.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("grp") == "ref", 1).otherwise(0)).alias("nr"),
            F.sum(F.when(F.col("grp") == "cur", 1).otherwise(0)).alias("nc"),
        )
        .localCheckpoint(eager=True)  # bounded (128 rows); feeds totals AND fold
    )
    t = c.agg(F.sum("nr").alias("tr"), F.sum("nc").alias("tc"))
    pr = (F.col("nr") + 1.0) / (F.col("tr") + B)
    pc = (F.col("nc") + 1.0) / (F.col("tc") + B)
    return (
        c.crossJoin(F.broadcast(t))
        .agg(
            F.first("tr").cast("long").alias("n_ref"),
            F.first("tc").cast("long").alias("n_cur"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.round(F.sum((pr - pc) * F.log(pr / pc)), 6).alias("psi"),
        )
    )


@register(
    "corpus_density_report",
    oracle="""
    WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS doc_tokens,
             CAST(count(*) - count(DISTINCT text) AS BIGINT) AS exact_dup_rows
      FROM d),
    blk AS (
      SELECT array_to_string(string_split(text, ' ')[1:2], ' ') AS blk,
             count(*) AS n
      FROM d GROUP BY 1),
    bb AS (
      SELECT CAST(coalesce(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS dup_blocks,
             CAST(coalesce(sum(n * (n - 1) / 2), 0) AS BIGINT) AS block_pairs
      FROM blk)
    SELECT docs, doc_tokens, exact_dup_rows, dup_blocks, block_pairs
    FROM base, bb
    """,
    tags=("curation", "profiling", "provenance", "extension"),
)
def corpus_density_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus density certificate: doc/token counts, exact-dup
    rows, and the 2-token-prefix blocking mass (blocks with >= 2 members
    plus their raw candidate-pair count). These are precisely the knobs
    that move text/dedup query runtimes between corpus versions — the
    round-8 bench postmortem could not attribute a fleet-wide delta
    because nothing recorded them; ``bench.py`` now emits the same
    numbers per run and this query is the standalone, oracle-checked
    instrument (run it on each corpus version; if these moved, suspect
    the data before the plans).

    Plan shape for 100 TB: one corpus scan feeding a map-side-combinable
    base aggregate, and one blocking-key groupBy whose output is bounded
    by the distinct 2-token prefixes — the same pass any blocked dedup
    would pay anyway, priced here without running one."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.split(F.col("text"), " ")
    base = d.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size(toks)).cast("long").alias("doc_tokens"),
        (F.count(F.lit(1)) - F.count_distinct("text")).alias("exact_dup_rows"),
    )
    bb = (
        d.select(F.concat_ws(" ", F.slice(toks, 1, 2)).alias("blk"))
        .groupBy("blk")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("n") >= 2, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("dup_blocks"),
            F.coalesce(F.sum(F.col("n") * (F.col("n") - 1) / 2), F.lit(0))
            .cast("long")
            .alias("block_pairs"),
        )
    )
    return base.crossJoin(F.broadcast(bb)).select(
        "docs", "doc_tokens", "exact_dup_rows", "dup_blocks", "block_pairs"
    )


_RESAMPLE_K = 50
_GUMBEL_U_SQL = (
    f"(({_md5_uint_sql(chr(39) + 'g:' + chr(39) + ' || CAST(doc_id AS VARCHAR)', 4, little_endian=False)}"
    " + 1) / 4294967296.0)"
)


@register(
    "dsir_gumbel_resample",
    oracle=f"""
WITH pairs AS (
  SELECT doc_id AS id, lang,
    unnest(list_transform(
      range(1, greatest(len(string_split(text, ' ')) - 1, 0) + 1),
      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
    )) AS gram
  FROM documents WHERE text IS NOT NULL),
feats AS (SELECT id, lang, {_DSIR_BUCKET_SQL} AS bucket FROM pairs),
db AS (SELECT id, bucket, count(*) AS k FROM feats GROUP BY 1, 2),
rc AS (SELECT bucket, sum(k) AS rc FROM db GROUP BY 1),
tg AS (SELECT bucket, count(*) AS tc FROM feats WHERE lang = 'en' GROUP BY 1),
tot AS (SELECT (SELECT sum(rc) FROM rc) AS rn, (SELECT sum(tc) FROM tg) AS tn),
lr AS (
  SELECT rc.bucket,
         ln((COALESCE(tg.tc, 0) + 1) * 1.0 / (tot.tn + {_DSIR_BUCKETS}))
       - ln((rc.rc + 1) * 1.0 / (tot.rn + {_DSIR_BUCKETS})) AS lr
  FROM rc LEFT JOIN tg USING (bucket), tot),
sc AS (
  SELECT id, round(sum(k * CAST(round(lr * 1000000000000, 0) AS BIGINT))
               / 1000000000000.0, 6) AS log_weight
  FROM db JOIN lr USING (bucket) GROUP BY id),
keyed AS (
  SELECT d.doc_id,
         COALESCE(sc.log_weight, 0.0) AS log_weight,
         round(COALESCE(sc.log_weight, 0.0)
               + (-ln(-ln({_GUMBEL_U_SQL}))), 6) AS gumbel_key
  FROM documents d LEFT JOIN sc ON sc.id = d.doc_id
  WHERE d.text IS NOT NULL)
SELECT doc_id, log_weight, gumbel_key
FROM keyed ORDER BY gumbel_key DESC, doc_id LIMIT {_RESAMPLE_K}
""",
    tags=("curation", "selection", "sampling", "extension"),
)
def dsir_gumbel_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RESAMPLING half of DSIR (importance resampling via the
    Gumbel-top-k trick): each doc draws a deterministic md5 Gumbel
    ``g = -ln(-ln u)`` and competes with key ``log_weight + g`` — the
    global top-k IS a sample ∝ exp(log_weight), i.e. ∝ the importance
    weight toward the en target, without replacement and without an RNG
    (both engines draw identical noise, so the selected SET
    hash-compares). Ordering is on the 6dp-ROUNDED key (then doc_id) so
    cross-engine libm drift cannot flip the cut. Scale shape: the scored
    frame plus one TakeOrdered — no extra shuffle over DSIR scoring."""
    from dampr_spark.operators.selection import (
        dsir_importance_weights_flagged,
    )

    d = _t(spark, sf_dir, "documents")
    w = dsir_importance_weights_flagged(
        d, F.col("lang") == "en", n_buckets=_DSIR_BUCKETS
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("g:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 1
    ) / F.lit(4294967296.0)
    key = F.round(F.col("log_weight") + (-F.log(-F.log(u))), 6)
    return (
        w.select("doc_id", "log_weight", key.alias("gumbel_key"))
        .orderBy(F.col("gumbel_key").desc(), "doc_id")
        .limit(_RESAMPLE_K)
    )


_LOGREG_ITERS = 3
_LOGREG_LR = 1.0
_LOGREG_PREC = 8


def _logreg_oracle_sql(iters: int, lr: float, prec: int) -> str:
    """Unroll the fixed-iteration GD as chained CTEs — w{t} reproduces
    operators/selection.fit_logreg's update EXACTLY (same per-round
    rounding, same left-associated dot product, same averaged gradient
    moments), so DuckDB replays the gradient descent end-to-end."""
    feats = f"""
    f AS (SELECT {T.token_count_sql('text')} / 100.0 AS x1,
                 n_chars / ({T.token_count_sql('text')} * 10.0) AS x2,
                 {T.stopword_ratio_sql('text')} AS x3,
                 CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
          FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
    w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"""
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(f""",
    w{t} AS (
        SELECT round(min(b) - {lr} * avg(p - y), {prec}) AS b,
               round(min(w1) - {lr} * avg((p - y) * x1), {prec}) AS w1,
               round(min(w2) - {lr} * avg((p - y) * x2), {prec}) AS w2,
               round(min(w3) - {lr} * avg((p - y) * x3), {prec}) AS w3
        FROM (SELECT f.x1, f.x2, f.x3, f.y, w.b, w.w1, w.w2, w.w3,
                     1.0 / (1.0 + exp(-(w.b + w.w1 * f.x1 + w.w2 * f.x2
                                        + w.w3 * f.x3))) AS p
              FROM f CROSS JOIN w{t - 1} w))""")
    return f"""
    WITH {feats}{"".join(rounds)}
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM f) AS n,
           w.b AS bias, w.w1 AS w_len, w.w2 AS w_toklen, w.w3 AS w_stop,
           a.acc AS train_acc
    FROM w{iters} w CROSS JOIN
         (SELECT round(avg(CASE WHEN ((w.b + w.w1 * f.x1 + w.w2 * f.x2
                                       + w.w3 * f.x3) > 0) = (f.y > 0.5)
                           THEN 1.0 ELSE 0.0 END), 6) AS acc
          FROM f CROSS JOIN w{iters} w) a
    """


@register(
    "quality_logreg_fit",
    oracle=_logreg_oracle_sql(_LOGREG_ITERS, _LOGREG_LR, _LOGREG_PREC),
    tags=("selection", "ml", "extension"),
)
def quality_logreg_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression quality classifier (the
    CCNet/fastText curation recipe's model fit): predict lang='en' from
    three single-scan quality features (scaled token count, mean token
    length, stopword ratio), 3 rounds of full-batch gradient descent, plus
    the resulting in-sample decision accuracy. Externally verifies the
    ITERATIVE `operators/selection.fit_logreg` against a DuckDB oracle
    that unrolls the same 3 GD rounds as chained CTEs — the pagerank/
    fuzzy_dup_components two-evaluation-strategies discipline, applied to
    model training.

    Plan shape for 100 TB: a persisted narrow feature frame (4 doubles per
    doc) scanned iters+1 times; each GD round is ONE map-side-combinable
    aggregate producing 4 driver-side scalars (the kmeans centroid
    contract) — zero shuffles beyond the aggregate's 4-value merge.
    Cross-engine contract: every per-row feature is the IDENTICAL
    expression on both sides (x3 is 6-dp rounded in its helper; x1/x2
    are exact integer ratios, bit-equal unrounded), and the weights are
    8-dp rounded per round, so two engines' float sums can't diverge the
    fit."""
    from pyspark import StorageLevel

    from dampr_spark.operators.selection import fit_logreg, logreg_decision

    d = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    feats = d.select(
        (T.token_count("text") / F.lit(100.0)).alias("x1"),
        (F.col("n_chars") / (T.token_count("text") * F.lit(10.0))).alias("x2"),
        T.stopword_ratio("text").alias("x3"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    w = fit_logreg(
        feats, ["x1", "x2", "x3"], "y",
        iters=_LOGREG_ITERS, lr=_LOGREG_LR, prec=_LOGREG_PREC,
    )
    dec = logreg_decision(w, ["x1", "x2", "x3"])
    stats = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.avg(F.when(dec == (F.col("y") > 0.5), 1.0).otherwise(0.0)), 6
        ).alias("acc"),
    ).first()
    feats.unpersist()
    return spark.createDataFrame(
        [(stats["n"], w[0], w[1], w[2], w[3], stats["acc"])],
        "n bigint, bias double, w_len double, w_toklen double, "
        "w_stop double, train_acc double",
    )


def _logreg_gate_oracle_sql(iters: int, lr: float, prec: int) -> str:
    """The fit's unrolled CTEs (same w{t} chain as _logreg_oracle_sql)
    followed by a corpus-wide APPLY: per source, docs kept by the w·x>0
    decision. One oracle proves train AND apply end-to-end."""
    base = _logreg_oracle_sql(iters, lr, prec)
    # Reuse everything up to the fit's top-level SELECT (anchored on its
    # distinctive correlated-count prefix); swap in the gate aggregate.
    ctes = base[: base.index("SELECT (SELECT CAST(count(*)")]
    return f"""{ctes},
    zs AS (SELECT d.source,
                  w.b + w.w1 * d.x1 + w.w2 * d.x2 + w.w3 * d.x3 AS z
           FROM (SELECT source, {T.token_count_sql('text')} / 100.0 AS x1,
                        n_chars / ({T.token_count_sql('text')} * 10.0) AS x2,
                        {T.stopword_ratio_sql('text')} AS x3
                 FROM documents
                 WHERE text IS NOT NULL AND lang IS NOT NULL) d
           CROSS JOIN w{iters} w),
    mz AS (SELECT round(avg(z), 6) AS m FROM zs)
    SELECT zs.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN zs.z > mz.m THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           round(avg(CASE WHEN zs.z > mz.m THEN 1.0 ELSE 0.0 END), 6)
             AS keep_rate
    FROM zs CROSS JOIN mz
    GROUP BY zs.source, mz.m
    """


@register(
    "quality_classifier_gate",
    oracle=_logreg_gate_oracle_sql(_LOGREG_ITERS, _LOGREG_LR, _LOGREG_PREC),
    tags=("selection", "ml", "extension"),
)
def quality_classifier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of the classifier curation recipe: fit the
    logistic-regression quality model (same 3 GD rounds as
    `quality_logreg_fit`), then gate the WHOLE corpus with the exp-free
    w·x>0 decision and report per-source keep rates — the mix-shift
    report a curator reads before committing a filter. The oracle chains
    the fit's unrolled CTEs into the gate aggregate, so DuckDB replays
    train AND apply end-to-end.

    Plan shape for 100 TB: the fit is iters bounded-scalar aggregates
    over the persisted feature frame; the gate is ONE more scan with the
    weights folded in as literals (pure codegen comparison, no join) and
    a source-keyed aggregate."""
    from pyspark import StorageLevel

    from dampr_spark.operators.selection import fit_logreg, logreg_decision

    d = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    feats = d.select(
        "source",
        (T.token_count("text") / F.lit(100.0)).alias("x1"),
        (F.col("n_chars") / (T.token_count("text") * F.lit(10.0))).alias("x2"),
        T.stopword_ratio("text").alias("x3"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    w = fit_logreg(
        feats, ["x1", "x2", "x3"], "y",
        iters=_LOGREG_ITERS, lr=_LOGREG_LR, prec=_LOGREG_PREC,
    )
    z = (
        F.lit(w[0])
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
    )
    zs = feats.select("source", z.alias("z"))
    m = zs.agg(F.round(F.avg("z"), 6).alias("m"))
    dec = F.col("z") > F.col("m")
    out = (
        zs.crossJoin(F.broadcast(m))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(dec, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.round(F.avg(F.when(dec, 1.0).otherwise(0.0)), 6).alias("keep_rate"),
        )
        .localCheckpoint(eager=True)  # bounded (one row per source)
    )
    feats.unpersist()
    return out


def _logreg_fit_ctes(sfx: str, parity: int, iters: int, lr: float, prec: int) -> str:
    """One slice's unrolled GD chain (f{sfx}, w0{sfx}..w{iters}{sfx}) —
    the _logreg_oracle_sql round generator parameterized by CTE suffix
    and a doc_id-parity slice predicate, so two independent fits can
    coexist in one oracle."""
    feats = f"""
    f{sfx} AS (SELECT {T.token_count_sql('text')} / 100.0 AS x1,
                 n_chars / ({T.token_count_sql('text')} * 10.0) AS x2,
                 {T.stopword_ratio_sql('text')} AS x3,
                 CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
          FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
            AND doc_id % 2 = {parity}),
    w0{sfx} AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"""
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(f""",
    w{t}{sfx} AS (
        SELECT round(min(b) - {lr} * avg(p - y), {prec}) AS b,
               round(min(w1) - {lr} * avg((p - y) * x1), {prec}) AS w1,
               round(min(w2) - {lr} * avg((p - y) * x2), {prec}) AS w2,
               round(min(w3) - {lr} * avg((p - y) * x3), {prec}) AS w3
        FROM (SELECT f.x1, f.x2, f.x3, f.y, w.b, w.w1, w.w2, w.w3,
                     1.0 / (1.0 + exp(-(w.b + w.w1 * f.x1 + w.w2 * f.x2
                                        + w.w3 * f.x3))) AS p
              FROM f{sfx} f CROSS JOIN w{t - 1}{sfx} w))""")
    return feats + "".join(rounds)


def _refit_drift_oracle_sql(iters: int, lr: float, prec: int) -> str:
    wl = f"w{iters}"
    return f"""
    WITH {_logreg_fit_ctes('_o', 0, iters, lr, prec)},
    {_logreg_fit_ctes('_n', 1, iters, lr, prec).lstrip()},
    ap AS (SELECT source,
                  {T.token_count_sql('text')} / 100.0 AS x1,
                  n_chars / ({T.token_count_sql('text')} * 10.0) AS x2,
                  {T.stopword_ratio_sql('text')} AS x3
           FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
             AND doc_id % 2 = 1),
    z AS (SELECT ap.source,
                 wo.b + wo.w1 * ap.x1 + wo.w2 * ap.x2 + wo.w3 * ap.x3 AS zo,
                 wn.b + wn.w1 * ap.x1 + wn.w2 * ap.x2 + wn.w3 * ap.x3 AS zn
          FROM ap CROSS JOIN {wl}_o wo CROSS JOIN {wl}_n wn),
    mz AS (SELECT round(avg(zo), 6) AS mo, round(avg(zn), 6) AS mn FROM z),
    ks AS (SELECT z.source,
                  CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(CASE WHEN z.zo > mz.mo THEN 1 ELSE 0 END)
                       AS BIGINT) AS kept_old,
                  CAST(sum(CASE WHEN z.zn > mz.mn THEN 1 ELSE 0 END)
                       AS BIGINT) AS kept_new
           FROM z CROSS JOIN mz GROUP BY z.source, mz.mo, mz.mn),
    tt AS (SELECT sum(kept_old) AS t_old, sum(kept_new) AS t_new,
                  count(*) AS n_src
           FROM ks)
    SELECT ks.source,
           ks.n_docs,
           ks.kept_old,
           ks.kept_new,
           round(ks.kept_old * 1.0 / ks.n_docs, 6) AS keep_rate_old_gate,
           round(ks.kept_new * 1.0 / ks.n_docs, 6) AS keep_rate_new_gate,
           round((ks.kept_new - ks.kept_old) * 1.0 / ks.n_docs, 6)
             AS keep_drift,
           round(((ks.kept_new + 1.0) / (tt.t_new + tt.n_src)
                  - (ks.kept_old + 1.0) / (tt.t_old + tt.n_src))
                 * ln(((ks.kept_new + 1.0) / (tt.t_new + tt.n_src))
                      / ((ks.kept_old + 1.0) / (tt.t_old + tt.n_src))), 6)
             AS psi_term
    FROM ks CROSS JOIN tt
    ORDER BY ks.source
    """


@register(
    "quality_gate_refit_drift",
    oracle=_refit_drift_oracle_sql(_LOGREG_ITERS, _LOGREG_LR, _LOGREG_PREC),
    tags=("selection", "ml", "drift", "quality", "extension"),
)
def quality_gate_refit_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The re-crawl governance loop (round 11, VERDICT r10 #8 — a genuinely
    new pipeline SHAPE composed from proven pieces): when a new crawl
    slice lands, a production curation pipeline re-fits its quality gate
    on the new slice and reports, per source, how the keep decision
    DRIFTS against the incumbent gate — the report that decides whether
    the filter is re-certified or the mix shift is escalated.

    Composition: two independent `quality_logreg_fit` fits (gate_old on
    the doc_id%2=0 "previous crawl", gate_new on the %2=1 "re-crawl" —
    the same deterministic parity split `corpus_token_drift` uses), both
    applied to the NEW slice with `quality_classifier_gate`'s
    above-mean-z decision, then the `value_drift_psi` discipline on the
    outcome: per-source keep rates under each gate, their drift, and a
    Laplace-smoothed PSI term over the kept-mass source shares (the
    single-scalar mix-shift signal when summed).

    The oracle replays EVERYTHING — both unrolled 3-round GD chains, both
    gate applications, the drift/PSI arithmetic — so the whole governance
    loop is hash-compared end-to-end, not just its parts.

    Plan shape for 100 TB: ONE persisted narrow feature frame (source,
    slice flag, 4 doubles) feeds both fits (iters bounded-scalar
    aggregates each, filtered scans of the same persisted frame — no
    second corpus read) and the apply scan (both gates' z in one pass,
    weights folded as literals); the drift join is a broadcast of two
    bounded aggregates. Zero corpus-keyed shuffles beyond the
    source-keyed count rollup."""
    from pyspark import StorageLevel

    from dampr_spark.operators.selection import fit_logreg

    d = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    feats = d.select(
        "source",
        (F.col("doc_id") % 2 == 1).alias("is_new"),
        (T.token_count("text") / F.lit(100.0)).alias("x1"),
        (F.col("n_chars") / (T.token_count("text") * F.lit(10.0))).alias("x2"),
        T.stopword_ratio("text").alias("x3"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    xcols = ["x1", "x2", "x3"]
    w_old = fit_logreg(
        feats.filter(~F.col("is_new")), xcols, "y",
        iters=_LOGREG_ITERS, lr=_LOGREG_LR, prec=_LOGREG_PREC,
    )
    w_new = fit_logreg(
        feats.filter(F.col("is_new")), xcols, "y",
        iters=_LOGREG_ITERS, lr=_LOGREG_LR, prec=_LOGREG_PREC,
    )

    def _z(w):
        return (
            F.lit(w[0])
            + F.lit(w[1]) * F.col("x1")
            + F.lit(w[2]) * F.col("x2")
            + F.lit(w[3]) * F.col("x3")
        )

    z = feats.filter(F.col("is_new")).select(
        "source", _z(w_old).alias("zo"), _z(w_new).alias("zn")
    )
    mz = z.agg(
        F.round(F.avg("zo"), 6).alias("mo"), F.round(F.avg("zn"), 6).alias("mn")
    )
    ks = (
        z.crossJoin(F.broadcast(mz))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("zo") > F.col("mo"), 1).otherwise(0))
            .cast("long")
            .alias("kept_old"),
            F.sum(F.when(F.col("zn") > F.col("mn"), 1).otherwise(0))
            .cast("long")
            .alias("kept_new"),
        )
        .localCheckpoint(eager=True)  # bounded (one row per source);
        # feeds the totals aggregate AND the final select
    )
    tt = ks.agg(
        F.sum("kept_old").alias("t_old"),
        F.sum("kept_new").alias("t_new"),
        F.count(F.lit(1)).alias("n_src"),
    )
    share_old = (F.col("kept_old") + 1.0) / (F.col("t_old") + F.col("n_src"))
    share_new = (F.col("kept_new") + 1.0) / (F.col("t_new") + F.col("n_src"))
    out = (
        ks.crossJoin(F.broadcast(tt))
        .select(
            "source",
            "n_docs",
            "kept_old",
            "kept_new",
            F.round(F.col("kept_old") * 1.0 / F.col("n_docs"), 6).alias(
                "keep_rate_old_gate"
            ),
            F.round(F.col("kept_new") * 1.0 / F.col("n_docs"), 6).alias(
                "keep_rate_new_gate"
            ),
            F.round(
                (F.col("kept_new") - F.col("kept_old")) * 1.0 / F.col("n_docs"),
                6,
            ).alias("keep_drift"),
            F.round(
                (share_new - share_old) * F.log(share_new / share_old), 6
            ).alias("psi_term"),
        )
        .orderBy("source")
    )
    feats.unpersist()
    return out


_CURATE_Q_GATE = 0.6
_CURATE_ORACLE = f"""
WITH RECURSIVE
scored AS (
  SELECT doc_id, source, text,
         {T.fingerprint_sql('text')} AS fp,
         {T.quality_score_sql('text')} AS q
  FROM documents WHERE text IS NOT NULL),
exact_best AS (
  SELECT doc_id, source, text, q FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY q DESC, doc_id) AS rn
    FROM scored) WHERE rn = 1),
grams AS (
  SELECT doc_id AS id,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
             i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS gram
  FROM exact_best),
sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n_grams FROM grams GROUP BY id),
keep AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING count(*) BETWEEN 2 AND 64),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS inter
  FROM grams a JOIN keep USING (gram) JOIN grams b USING (gram)
  WHERE a.id < b.id GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b FROM shared
  JOIN sizes sa ON sa.id = shared.id_a
  JOIN sizes sb ON sb.id = shared.id_b
  WHERE inter / (sa.n_grams + sb.n_grams - inter) >= 0.1),
edges AS (SELECT id_a AS s, id_b AS d FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
comp AS (SELECT s AS id, least(s, min(d)) AS canonical FROM reach GROUP BY s),
winners AS (
  SELECT canonical, id AS keep_id FROM (
    SELECT comp.canonical, comp.id,
           row_number() OVER (PARTITION BY comp.canonical
                              ORDER BY eb.q DESC, comp.id) AS rn
    FROM comp JOIN exact_best eb ON eb.doc_id = comp.id) WHERE rn = 1),
losers AS (
  SELECT comp.id FROM comp JOIN winners USING (canonical)
  WHERE comp.id <> winners.keep_id),
gated AS (
  SELECT doc_id, text, q FROM exact_best
  WHERE doc_id NOT IN (SELECT id FROM losers) AND q >= {_CURATE_Q_GATE}),
tagged AS (
  SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
              ELSE 'test' END AS split,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'),
                              1, 8))::BIGINT % {_N_SHARDS} AS INT) AS shard_id,
         len(string_split(text, ' ')) AS n_tokens,
         doc_id, q
  FROM gated)
SELECT split, shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id,
       (sum(CAST(round(q * 1000000, 0) AS BIGINT)) // count(*))
           / 1000000.0 AS avg_quality
FROM tagged GROUP BY split, shard_id
"""


_CURATE_CONTAM_MAX = 0.8
_CURATE_V2_ORACLE = f"""
WITH RECURSIVE
scored AS (
  SELECT doc_id, source, lang, text,
         {T.fingerprint_sql('text')} AS fp,
         {T.quality_score_sql('text')} AS q
  FROM documents WHERE text IS NOT NULL),
exact_best AS (
  SELECT doc_id, lang, text, q FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY q DESC, doc_id) AS rn
    FROM scored) WHERE rn = 1),
grams AS (
  SELECT doc_id AS id,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
             i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS gram
  FROM exact_best),
sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n_grams FROM grams GROUP BY id),
keep AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING count(*) BETWEEN 2 AND 64),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS inter
  FROM grams a JOIN keep USING (gram) JOIN grams b USING (gram)
  WHERE a.id < b.id GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b FROM shared
  JOIN sizes sa ON sa.id = shared.id_a
  JOIN sizes sb ON sb.id = shared.id_b
  WHERE inter / (sa.n_grams + sb.n_grams - inter) >= 0.1),
edges AS (SELECT id_a AS s, id_b AS d FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
comp AS (SELECT s AS id, least(s, min(d)) AS canonical FROM reach GROUP BY s),
winners AS (
  SELECT canonical, id AS keep_id FROM (
    SELECT comp.canonical, comp.id,
           row_number() OVER (PARTITION BY comp.canonical
                              ORDER BY eb.q DESC, comp.id) AS rn
    FROM comp JOIN exact_best eb ON eb.doc_id = comp.id) WHERE rn = 1),
losers AS (
  SELECT comp.id FROM comp JOIN winners USING (canonical)
  WHERE comp.id <> winners.keep_id),
neardup AS (
  SELECT doc_id, lang, text, q FROM exact_best
  WHERE doc_id NOT IN (SELECT id FROM losers)),
bench_grams AS (
  SELECT DISTINCT unnest({_GRAMS_SQL}) AS gram
  FROM documents WHERE doc_id % {_BENCH_MOD} = 0 AND text IS NOT NULL),
decon AS (
  SELECT g.id AS doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(b.gram) AS BIGINT) AS n_shared
  FROM grams g
  JOIN neardup nd ON nd.doc_id = g.id
  LEFT JOIN bench_grams b USING (gram)
  GROUP BY g.id),
clean AS (
  SELECT nd.doc_id, nd.lang, nd.text, nd.q
  FROM neardup nd JOIN decon USING (doc_id)
  WHERE nd.doc_id % {_BENCH_MOD} <> 0
    AND round(decon.n_shared * 1.0 / decon.n_grams, 6) < {_CURATE_CONTAM_MAX}),
gated AS (SELECT doc_id, lang, text, q FROM clean WHERE q >= {_CURATE_Q_GATE}),
dpairs AS (
  SELECT doc_id AS id, lang,
    unnest(list_transform(
      range(1, greatest(len(string_split(text, ' ')) - 1, 0) + 1),
      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
    )) AS gram
  FROM gated),
feats AS (SELECT id, lang, {_DSIR_BUCKET_SQL} AS bucket FROM dpairs),
db AS (SELECT id, bucket, count(*) AS k FROM feats GROUP BY 1, 2),
rcounts AS (SELECT bucket, sum(k) AS rc FROM db GROUP BY 1),
tg AS (SELECT bucket, count(*) AS tc FROM feats WHERE lang = 'en' GROUP BY 1),
tot AS (SELECT (SELECT sum(rc) FROM rcounts) AS rn, (SELECT sum(tc) FROM tg) AS tn),
lr AS (
  SELECT rcounts.bucket,
         ln((COALESCE(tg.tc, 0) + 1) * 1.0 / (tot.tn + {_DSIR_BUCKETS}))
       - ln((rcounts.rc + 1) * 1.0 / (tot.rn + {_DSIR_BUCKETS})) AS lr
  FROM rcounts LEFT JOIN tg USING (bucket), tot),
sc AS (
  SELECT id, round(sum(k * CAST(round(lr * 1000000000000, 0) AS BIGINT))
               / 1000000000000.0, 6) AS log_weight
  FROM db JOIN lr USING (bucket) GROUP BY id),
selected AS (
  SELECT g.doc_id, g.text, g.q, COALESCE(sc.log_weight, 0.0) AS lw
  FROM gated g LEFT JOIN sc ON sc.id = g.doc_id
  WHERE COALESCE(sc.log_weight, 0.0) > 0),
tagged AS (
  SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
              ELSE 'test' END AS split,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'),
                              1, 8))::BIGINT % {_N_SHARDS} AS INT) AS shard_id,
         len(string_split(text, ' ')) AS n_tokens,
         doc_id, q, lw
  FROM selected)
SELECT split, shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id,
       (sum(CAST(round(q * 1000000, 0) AS BIGINT)) // count(*))
           / 1000000.0 AS avg_quality,
       (sum(CAST(round(lw * 1000000, 0) AS BIGINT)) // count(*))
           / 1000000.0 AS avg_log_weight
FROM tagged GROUP BY split, shard_id
"""


@register(
    "curate_training_slice",
    oracle=_CURATE_ORACLE,
    tags=("pipeline", "dedup", "curation", "capstone", "extension", "bench"),
)
def curate_training_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE capstone composition (round 12, VERDICT r11 #6) — the full
    curation pipeline every production training run executes, as ONE
    oracle-replayed query: exact dedup (keep-best) → n-gram-Jaccard
    near-dup collapse (keep-best) → quality gate → deterministic
    train/val/test split → shard packing → per-(split, shard) MANIFEST.
    Every stage is the already-oracle-green catalog operator
    (`exact_dedup_keep_best`, `near_dedup_keep_best`,
    `train_val_test_split`, `training_shards_manifest`), composed; the
    DuckDB oracle chains their SQL end-to-end including the recursive-CTE
    component closure.

    The discipline under test is the SHARED SCAN: the corpus text is
    read ONCE into a persisted (doc_id, source, text, fp, q) frame —
    fingerprint and quality are computed in that single pass — and every
    stage downstream consumes either that frame or the pinned
    exact-survivor frame (multi-consumer convention: the survivor frame
    feeds the gram explode, the pair join, the keep-best aggregate, and
    the gate, so it is localCheckpoint-pinned; plan-locked in
    tests/test_round12_fixes.py: the final plan contains NO parquet scan
    of documents — all lineage is behind the pin).

    Plan shape for 100 TB: one corpus scan + persist; one fp-keyed
    max_by (bodies shuffle once, inside the struct); the near-dup stage
    is the capped posting self-join (budget priced by
    `substring/lsh/contamination` audit siblings) over the ALREADY
    exact-deduped survivors (the order matters: exact dup groups would
    otherwise multiply the posting lists); gate/split/shard are pure
    codegen expressions on the pinned survivors; the manifest is one
    (split, shard)-keyed aggregate of ~3x{_N_SHARDS} rows."""
    from pyspark import StorageLevel

    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            "text",
            T.fingerprint("text").alias("fp"),
            T.quality_score("text").alias("q"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)  # the ONE corpus text scan
    )
    exact_best = (
        d.groupBy("fp")
        .agg(
            F.max(
                F.struct(
                    F.col("q"),
                    (-F.col("doc_id")).alias("negid"),
                    F.col("text"),
                )
            ).alias("m")
        )
        .select(
            (-F.col("m.negid")).alias("doc_id"),
            F.col("m.text").alias("text"),
            F.col("m.q").alias("q"),
        )
        .transform(_pin)  # feeds grams + pair join + keep-best
        # + gate: four consumers, one materialization
    )
    pairs = dedup.ngram_jaccard_pairs(
        exact_best, n=3, threshold=0.1, max_posting=64
    ).select("id_a", "id_b")
    survivors = dedup.drop_near_dups_keep_best(
        exact_best, pairs, F.col("q"), iters="converge"
    )  # converge: the oracle's recursive closure, exact at any chain
    # depth (ADVICE r12 — fixed iters=3 diverged on diameter>3 chains)
    gated = survivors.filter(F.col("q") >= _CURATE_Q_GATE)
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < "cd", "train").when(h2 < "e6", "val").otherwise("test")
    )
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shard"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _N_SHARDS
    ).cast("int")
    out = (
        gated.select(
            split.alias("split"),
            shard.alias("shard_id"),
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
            "doc_id",
            "q",
        )
        .groupBy("split", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
            # Tie-free exact mean: per-row q rounded to micro-units,
            # summed as longs, FLOOR-divided by the count (long `div`,
            # exact at any magnitude), then scaled back — a float avg()
            # grazes 6dp boundaries under merge-order ulp drift, and a
            # round()-ed exact mean LANDS ON a true .5 tie whenever the
            # micro-sum is odd over n=2 (Spark HALF_UP vs DuckDB
            # nearest-double disagreed at 1.0024045).
            F.sum(F.round(F.col("q") * 1e6, 0).cast("long")).alias("_qm"),
        )
        .select(
            "split",
            "shard_id",
            "n_docs",
            "n_tokens",
            "min_doc_id",
            "max_doc_id",
            (F.expr("div(_qm, n_docs)") / F.lit(1000000.0)).alias(
                "avg_quality"
            ),
        )
        .localCheckpoint(eager=True)  # bounded (<= 3 x n_shards rows);
        # lets the unpersist below not re-trigger the corpus scan
    )
    d.unpersist()
    return out


@register(
    "curate_training_slice_v2",
    oracle=_CURATE_V2_ORACLE,
    tags=(
        "pipeline",
        "dedup",
        "decontamination",
        "selection",
        "curation",
        "capstone",
        "extension",
        "bench",
    ),
)
def curate_training_slice_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL production curation pipeline (round 13, VERDICT r12 #6 —
    v1 plus the two selection stages a real training run also executes),
    as ONE oracle-replayed query. Gate order matters and is the
    production order: exact dedup (keep-best) → near-dup collapse
    (keep-best, components run to CONVERGENCE) → benchmark
    DECONTAMINATION (the eval slice is excluded and any training doc
    sharing ≥ {_CURATE_CONTAM_MAX:.0%} of its distinct 3-grams with it is
    dropped — decontaminate BEFORE quality, so a contaminated-but-clean-
    looking doc never reaches the gate) → quality gate → DSIR SELECTION
    toward the English target (hashed-bigram log-likelihood ratio fit on
    the gated survivors; docs with positive log-weight are kept — select
    BEFORE split, so split proportions describe the final corpus) →
    deterministic split → shard packing → per-(split, shard) manifest
    carrying avg quality AND avg DSIR log-weight. Every stage is the
    already-oracle-green catalog operator (`exact_dedup_keep_best`,
    `near_dedup_keep_best`, `decontaminate_ngram`, `dsir_en_importance`,
    `train_val_test_split`, `training_shards_manifest`); the DuckDB
    oracle chains their SQL end-to-end including the recursive component
    closure and the full DSIR model fit.

    Shared-scan discipline (the v1 plan lock, extended): the corpus text
    is read ONCE into the persisted (doc_id, source, lang, text, fp, q)
    frame; the exact-survivor, post-decontamination, and gated frames are
    pinned (pin_once — reliable under the checkpoint knob) because each
    feeds multiple consumers (gram explode + pair join + keep-best;
    contamination explode + semi-join; DSIR model fit + scoring + final
    join). The final plan contains NO parquet re-scan (plan-locked in
    tests/test_round13_fixes.py).

    Plan shape for 100 TB: v1's shapes plus (a) one broadcast of the
    bench slice's distinct grams into the contamination explode (the
    `decontaminate_ngram` economics — the only corpus shuffle is the
    per-doc count aggregate, collapsed map-side) and (b) DSIR's two
    pair-explodes over the ALREADY-GATED survivors with the 256-row
    ratio table broadcast — selection runs on the smallest frame the
    pipeline ever holds, never the raw corpus."""
    from pyspark import StorageLevel

    from dampr_spark.operators.selection import (
        dsir_importance_weights_flagged,
    )

    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            "lang",
            "text",
            T.fingerprint("text").alias("fp"),
            T.quality_score("text").alias("q"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)  # the ONE corpus text scan
    )
    exact_best = (
        d.groupBy("fp")
        .agg(
            F.max(
                F.struct(
                    F.col("q"),
                    (-F.col("doc_id")).alias("negid"),
                    F.col("text"),
                    F.col("lang"),
                )
            ).alias("m")
        )
        .select(
            (-F.col("m.negid")).alias("doc_id"),
            F.col("m.text").alias("text"),
            F.col("m.lang").alias("lang"),
            F.col("m.q").alias("q"),
        )
        .transform(_pin)  # feeds grams + pair join + keep-best + decon
    )
    pairs = dedup.ngram_jaccard_pairs(
        exact_best, n=3, threshold=0.1, max_posting=64
    ).select("id_a", "id_b")
    survivors = dedup.drop_near_dups_keep_best(
        exact_best, pairs, F.col("q"), iters="converge"
    )
    # Decontamination: the eval slice (doc_id % bench_mod == 0) is the
    # benchmark; training candidates are the OTHER near-dup survivors.
    surv = survivors.filter(F.col("doc_id") % _BENCH_MOD != 0).transform(
        _pin
    )  # feeds the contamination explode AND the gate join
    bench = d.filter(F.col("doc_id") % _BENCH_MOD == 0)
    contam = dedup.ngram_contamination(surv, bench, n=3)
    clean_ids = contam.filter(
        F.col("contamination") < _CURATE_CONTAM_MAX
    ).select("doc_id")
    gated = (
        surv.join(clean_ids, "doc_id")
        .filter(F.col("q") >= _CURATE_Q_GATE)
        .transform(_pin)  # feeds DSIR model + scoring + the final join
    )
    weights = dsir_importance_weights_flagged(
        gated, F.col("lang") == "en", n_buckets=_DSIR_BUCKETS
    )
    sel = gated.join(
        weights.filter(F.col("log_weight") > 0).select(
            "doc_id", "log_weight"
        ),
        "doc_id",
    )
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < "cd", "train").when(h2 < "e6", "val").otherwise("test")
    )
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shard"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _N_SHARDS
    ).cast("int")
    out = (
        sel.select(
            split.alias("split"),
            shard.alias("shard_id"),
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
            "doc_id",
            "q",
            "log_weight",
        )
        .groupBy("split", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
            # Tie-free exact means (see v1): micro-unit long sums,
            # exact long floor-division by the count, scale back.
            F.sum(F.round(F.col("q") * 1e6, 0).cast("long")).alias("_qm"),
            F.sum(
                F.round(F.col("log_weight") * 1e6, 0).cast("long")
            ).alias("_lwm"),
        )
        .select(
            "split",
            "shard_id",
            "n_docs",
            "n_tokens",
            "min_doc_id",
            "max_doc_id",
            (F.expr("div(_qm, n_docs)") / F.lit(1000000.0)).alias(
                "avg_quality"
            ),
            (F.expr("div(_lwm, n_docs)") / F.lit(1000000.0)).alias(
                "avg_log_weight"
            ),
        )
        .localCheckpoint(eager=True)  # bounded (<= 3 x n_shards rows);
        # lets the unpersist below not re-trigger the corpus scan
    )
    d.unpersist()
    return out
