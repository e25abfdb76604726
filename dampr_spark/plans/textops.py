"""Text-analysis & dedup catalog queries over the ``documents`` table —
the LLM-training-data extension layer (SURVEY §7 step 6): token counting,
language-ID, quality scoring, fingerprinting, exact dedup. Heavier near-dup
operators (MinHash LSH, SimHash, n-gram Jaccard) live in
``dampr_spark.operators.dedup`` and register their own catalog entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dampr_spark.operators.pinning import pin_once as _pin
from dampr_spark.functions import text as T
from dampr_spark.functions import vector as V
from dampr_spark.plans.catalog import register
from dampr_spark.sources.readers import read_table as _t


@register(
    "token_count",
    oracle=f"""
    SELECT doc_id, {T.token_count_sql('text')} AS n_tokens, n_chars
    FROM documents
    """,
    tags=("text", "extension"),
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting — pure projection, fuses into the scan."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.token_count("text").alias("n_tokens"), "n_chars")


@register(
    "lang_id",
    oracle=f"""
    SELECT doc_id, lang, {T.lang_id_sql('text')} AS pred_lang
    FROM documents
    """,
    tags=("text", "extension"),
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (marker-stopword argmax, deterministic
    tie-break) next to the labeled ``lang`` column."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", T.lang_id("text").alias("pred_lang"))


@register(
    "quality_score",
    oracle=f"""
    SELECT doc_id,
           {T.token_count_sql('text')} AS n_tokens,
           {T.stopword_ratio_sql('text')} AS stopword_ratio,
           {T.punct_ratio_sql('text')} AS punct_ratio,
           {T.quality_score_sql('text')} AS quality
    FROM documents
    """,
    tags=("text", "extension"),
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/stopword/punctuation composite in [0,1]."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.stopword_ratio("text").alias("stopword_ratio"),
        T.punct_ratio("text").alias("punct_ratio"),
        T.quality_score("text").alias("quality"),
    )


@register(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id, {T.fingerprint_sql('text')} AS fp
    FROM documents
    """,
    tags=("text", "dedup", "extension"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over normalized text (md5 agrees across
    engines, unlike hash()/xxhash64 — that's what makes dedup
    oracle-checkable)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.fingerprint("text").alias("fp"))


@register(
    "exact_dedup",
    oracle=f"""
    SELECT {T.fingerprint_sql('text')} AS fp,
           min(doc_id) AS canonical_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("text", "dedup", "extension"),
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication: hash-groupBy on the fingerprint, keep the lowest
    doc_id as canonical. At 100 TB this is one shuffle on a 32-byte key —
    partial aggregation collapses unique docs map-side."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", T.fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("n_copies"))
    )


_SEARCH_KEYS = ("spark", "window", "stream")


@register(
    "keyword_search_any",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE list_has_any(string_split(text, ' '),
                       [{", ".join(repr(k) for k in _SEARCH_KEYS)}])
    """,
    tags=("text", "indexer", "search"),
)
def keyword_search_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indexer.union parity (reference dampr/utils/indexer.py:72-92: SQLite
    inverted index, lines matching ANY key). Spark-first: an arrays_overlap
    predicate the scanner can evaluate — at 100 TB the precomputed-index
    equivalent is a bucketed token→doc posting table, but no side index is
    needed for predicate semantics."""
    d = _t(spark, sf_dir, "documents")
    keys = F.array(*[F.lit(k) for k in _SEARCH_KEYS])
    return d.filter(
        F.arrays_overlap(F.split(F.col("text"), " "), keys)
    ).select("doc_id", "lang")


@register(
    "keyword_search_min_match",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                   [{", ".join(repr(k) for k in _SEARCH_KEYS)}])) AS BIGINT)
             AS n_matched
    FROM documents
    WHERE len(list_intersect(list_distinct(string_split(text, ' ')),
              [{", ".join(repr(k) for k in _SEARCH_KEYS)}])) >= 2
    """,
    tags=("text", "indexer", "search"),
)
def keyword_search_min_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indexer.intersect parity (dampr/utils/indexer.py:94-125: lines
    matching ≥ min_match of the keys, SQL GROUP BY/HAVING over the index) —
    here a distinct-token intersection size filter."""
    d = _t(spark, sf_dir, "documents")
    keys = F.array(*[F.lit(k) for k in _SEARCH_KEYS])
    n_matched = F.size(
        F.array_intersect(F.array_distinct(F.split(F.col("text"), " ")), keys)
    ).cast("long")
    return (
        d.select("doc_id", n_matched.alias("n_matched"))
        .filter(F.col("n_matched") >= 2)
    )


@register(
    "incremental_index_search",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                   [{", ".join(repr(k) for k in _SEARCH_KEYS)}])) AS BIGINT)
             AS n_matched
    FROM documents
    WHERE len(list_intersect(list_distinct(string_split(text, ' ')),
              [{", ".join(repr(k) for k in _SEARCH_KEYS)}])) >= 2
    """,
    tags=("text", "indexer", "search", "extension"),
)
def incremental_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indexer.intersect driven by a 2-shard INCREMENTAL index: half the
    corpus indexed first, the other half appended as a second immutable
    shard (operators/indexer.py append — the growing-corpus path the
    reference's build-once SQLite indexer lacks, dampr/utils/indexer.py:35).
    The oracle is the same corpus-truth SQL as `keyword_search_min_match`,
    so this externally pins shard-union lookup = full-corpus semantics.

    Plan shape for 100 TB: each shard is token-hashed/token-sorted parquet,
    the `token IN` filter pushes into every shard's scan, and query cost
    scales with the keys' posting lists — appending a batch costs one pass
    over the batch, never a rebuild over history."""
    import os
    import tempfile

    from dampr_spark.operators.indexer import Indexer

    d = _t(spark, sf_dir, "documents")
    sf_tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    root = os.path.join(
        tempfile.gettempdir(), "dampr_spark_incr_idx", sf_tag
    )
    ix = Indexer(root).build(d.filter(F.col("doc_id") % 2 == 0), "text", "doc_id")
    ix.append(d.filter(F.col("doc_id") % 2 == 1), "text", "doc_id")
    return ix.intersect(spark, list(_SEARCH_KEYS), 2)


@register(
    "token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
             AS n_bpe_tokens
    FROM documents
    """,
    tags=("text", "tokenize", "extension"),
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: letter-runs, digit-runs, and single symbols —
    the pre-tokenizer split most BPE vocabularies assume. Pure regexp
    projection, fuses into the scan."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
            )
        )
        .cast("long")
        .alias("n_bpe_tokens"),
    )


@register(
    "training_data_prep",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {T.fingerprint_sql('text')} AS fp,
               {T.token_count_sql('text')} AS n_tokens,
               {T.quality_score_sql('text')} AS quality
        FROM documents),
    keep AS (
        SELECT *, min(doc_id) OVER (PARTITION BY fp) AS canonical
        FROM scored WHERE quality >= 0.5 AND n_tokens >= 20)
    SELECT doc_id, lang, n_tokens, quality
    FROM keep WHERE doc_id = canonical
    """,
    tags=("text", "pipeline", "flagship", "bench"),
)
def training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite LLM-training-data prep pipeline: quality-filter → exact
    dedup (keep canonical min-id per fingerprint) → emit metadata. One scan,
    one window shuffle on the fingerprint — the end-to-end shape a 100 TB
    corpus-cleaning job takes."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        T.fingerprint("text").alias("fp"),
        T.token_count("text").alias("n_tokens"),
        T.quality_score("text").alias("quality"),
    ).filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 20))
    w = Window.partitionBy("fp")
    return (
        scored.withColumn("canonical", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("canonical"))
        .select("doc_id", "lang", "n_tokens", "quality")
    )


@register(
    "doc_freq",
    oracle="""
    SELECT token, CAST(count(*) AS BIGINT) AS df
    FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents)
    GROUP BY token
    """,
    tags=("text", "tfidf", "bench"),
)
def doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency — first half of the reference's TF-IDF macro
    benchmark (benchmarks/tf-idf-dampr.py:13-15): per-doc distinct tokens,
    then count per token."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .distinct()
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )


@register(
    "tfidf",
    oracle="""
    WITH tokens AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    df AS (
        SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM tokens GROUP BY token),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
    SELECT token, df, round(ln(1 + n.n_docs / df), 6) AS idf
    FROM df CROSS JOIN n
    """,
    tags=("text", "tfidf", "bench"),
)
def tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's TF-IDF benchmark pipeline (benchmarks/tf-idf-dampr.py:
    13-21): doc-frequency + idf = ln(1 + N/df). The corpus size joins in as
    a broadcast of a 1-row aggregate — the Spark-native form of
    `cross_right(docs.len(), memory=True)`."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    df = toks.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    return df.crossJoin(F.broadcast(n)).select(
        "token", "df", F.round(F.log(1 + F.col("n_docs") / F.col("df")), 6).alias("idf")
    )


_BM25_QUERY_TERMS = ("spark", "query", "join")
_BM25_K1, _BM25_B = 1.2, 0.75


@register(
    "bm25_rank",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    stats AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_docs,
               avg(len(string_split(text, ' '))) AS avgdl
        FROM documents),
    dl AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        FROM documents),
    q AS (SELECT unnest(['spark', 'query', 'join']) AS token),
    df AS (
        SELECT token, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM toks JOIN q USING (token) GROUP BY token),
    tf AS (
        SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
        FROM toks JOIN q USING (token) GROUP BY 1, 2)
    SELECT doc_id,
           round(sum(
               ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({_BM25_K1} + 1)
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
           ), 6) AS bm25
    FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY doc_id
    ORDER BY round(bm25, 4) DESC, doc_id
    LIMIT 15
    """,
    tags=("text", "search", "extension"),
)
def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking for a literal keyword query — the classic lexical
    retrieval scorer, entirely in codegen expressions (no UDF).

    Plan shape for 100 TB: ONE pass over documents computes per-doc
    query-term frequencies and doc length together (tokens are filtered to
    the query terms right after explode, so the big aggregate state is
    |query| × matching docs, not the vocabulary); corpus stats (N, avgdl)
    and per-term document frequencies are 1-row/|query|-row aggregates that
    broadcast back. TakeOrdered top-k, no global sort.

    Cut stability: the top-15 cut orders by the score rounded to 4dp (then
    doc_id). Cross-engine float summation can drift the last bits, and at
    the emitted 6dp precision a boundary pair straddling rank 15 could order
    differently per engine; at 4dp near-equal scores collapse into ties that
    doc_id breaks identically in both engines, so the returned SET is stable
    while the emitted value keeps its 6dp precision."""
    d = _t(spark, sf_dir, "documents")
    k1, b = _BM25_K1, _BM25_B
    terms = list(_BM25_QUERY_TERMS)

    toks = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("double").alias("dl"),
        F.explode(F.split("text", " ")).alias("token"),
    ).filter(F.col("token").isin(terms))
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").cast("double").alias("tf"), F.first("dl").alias("dl")
    )
    df = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    stats = d.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size(F.split("text", " "))).alias("avgdl"),
    )
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    score = idf * F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(score), 6).alias("bm25"))
        .orderBy(F.round(F.col("bm25"), 4).desc(), F.col("doc_id"))
        .limit(15)
    )


@register(
    "dedup_rate_by_source",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
           round(1.0 - count(DISTINCT md5(text)) * 1.0 / count(*), 6) AS dup_rate
    FROM documents
    GROUP BY source
    """,
    tags=("text", "dedup", "extension"),
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health metric: per-source exact-duplicate rate via content
    hash — the triage view that decides WHICH sources feed exact_dedup
    before a training run. One aggregate keyed on source; the md5 distinct
    count shuffles digests, never document bodies."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct(F.md5("text")).cast("long").alias("n_unique"),
        F.round(
            1.0 - F.countDistinct(F.md5("text")) / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
    )


@register(
    "doc_length_histogram",
    oracle="""
    SELECT CAST(floor(n_chars / 100) * 100 AS BIGINT) AS length_bucket,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY length_bucket
    """,
    tags=("text", "stats", "extension"),
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution in 100-char buckets — the first plot
    anyone makes before setting corpus length filters. Integer bucket
    arithmetic (floor of a bigint division) so both engines bucket
    identically with no float edge cases."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(
        (F.floor(F.col("n_chars") / 100) * 100).cast("long").alias("length_bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))


@register(
    "token_freq_zipf",
    oracle="""
    SELECT token, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 50
    """,
    tags=("text", "stats", "extension"),
)
def token_freq_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 token frequencies (the Zipf head) — vocabulary triage for
    tokenizer and stopword decisions. Explode + count is one shuffle with
    map-side partial aggregation doing the heavy lifting (the exchange
    carries one row per distinct token per partition, not per occurrence);
    TakeOrdered cuts the head with the (freq, token) tie-break both engines
    share."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(50)
    )


_VOCAB_K = 100


@register(
    "oov_rate_by_lang",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE text IS NOT NULL),
    vocab AS (
      SELECT tok FROM tok GROUP BY tok
      ORDER BY count(*) DESC, tok LIMIT {_VOCAB_K}),
    per_doc AS (
      SELECT doc_id, any_value(lang) AS lang,
             count(*) AS n_toks,
             count(*) FILTER (tok IN (SELECT tok FROM vocab)) AS n_in
      FROM tok GROUP BY doc_id)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg((n_toks - n_in)::DOUBLE / n_toks), 6) AS avg_oov_frac,
           round(sum(n_toks - n_in)::DOUBLE / sum(n_toks), 6) AS oov_token_share
    FROM per_doc GROUP BY lang
    """,
    tags=("text", "vocab", "extension"),
)
def oov_rate_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency vocabulary build + out-of-vocabulary rate: the top
    ``_VOCAB_K`` tokens by corpus frequency (deterministic count-desc/token-asc
    tie-break) form the vocabulary; each document's OOV fraction aggregates
    per language — the coverage report run before committing to a tokenizer
    vocab.

    Plan shape at scale: the vocab is a partial-aggregated token count +
    TakeOrdered (no global sort), then BROADCASTS into the token stream —
    the per-token membership probe is a broadcast-hash left join, so the
    only real shuffles are the token count and the per-doc re-aggregation,
    both partial-aggregated map-side. A real 100 TB vocab build raises K to
    vocab size (~10^5, still broadcast-sized) and the plan is unchanged."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .orderBy(F.col("_cnt").desc(), F.col("tok"))
        .limit(_VOCAB_K)
        .select("tok", F.lit(1).alias("_in_vocab"))
    )
    per_doc = (
        tok.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_toks"),
            F.coalesce(F.sum("_in_vocab"), F.lit(0)).alias("n_in"),
        )
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.avg(
                (F.col("n_toks") - F.col("n_in")).cast("double") / F.col("n_toks")
            ),
            6,
        ).alias("avg_oov_frac"),
        F.round(
            F.sum(F.col("n_toks") - F.col("n_in")).cast("double")
            / F.sum("n_toks"),
            6,
        ).alias("oov_token_share"),
    )


@register(
    "char_entropy_by_source",
    oracle="""
    WITH ch AS (
      SELECT doc_id, source, unnest(string_split(text, '')) AS c
      FROM documents WHERE text IS NOT NULL AND length(text) > 0),
    counts AS (
      SELECT doc_id, any_value(source) AS source, c, count(*) AS n
      FROM ch GROUP BY doc_id, c),
    per_doc AS (
      -- H = log2(t) - sum(n*log2 n)/t : one aggregation pass, no doc-total
      -- side table (identical to -sum(p*log2 p) algebraically)
      SELECT doc_id, any_value(source) AS source,
             round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 6) AS ent
      FROM counts GROUP BY doc_id)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(ent), 6) AS avg_entropy,
           round(min(ent), 6) AS min_entropy
    FROM per_doc GROUP BY source
    """,
    tags=("text", "quality", "extension"),
)
def char_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document, rolled up per
    source — the junk detector orthogonal to the token-level rules: random
    bytes score high, repeated-template spam scores low, natural text sits
    in a narrow band. Plan: explode characters → (doc, char) counts →
    per-doc entropy via the identity H = log2(t) − Σ n·log2(n) / t (one
    aggregation pass — no doc-total window or side table) → per-source
    aggregate. The (doc, char)→doc re-aggregation reuses the doc-clustered
    partitioning; per-row cost is O(text length), corpus-size-independent."""
    d = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    ch = d.select(
        "doc_id", "source", F.explode(F.split(F.col("text"), "")).alias("c")
    )
    counts = ch.groupBy("doc_id", "c").agg(
        F.any_value("source").alias("source"), F.count(F.lit(1)).alias("n")
    )
    n = F.col("n").cast("double")
    per_doc = counts.groupBy("doc_id").agg(
        F.any_value("source").alias("source"),
        F.round(
            F.log2(F.sum(n)) - F.sum(n * F.log2(n)) / F.sum(n), 6
        ).alias("ent"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("ent"), 6).alias("avg_entropy"),
        F.round(F.min("ent"), 6).alias("min_entropy"),
    )


@register(
    "lang_confusion_matrix",
    oracle=f"""
    SELECT lang AS labeled, {T.lang_id_sql('text')} AS predicted,
           CAST(count(*) AS BIGINT) AS n
    FROM documents
    GROUP BY 1, 2
    """,
    tags=("text", "quality", "extension"),
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-audit confusion matrix: the language-ID heuristic's
    predictions against the labeled ``lang`` column, as (labeled,
    predicted, count) cells — the accuracy report run before trusting a
    lang filter at corpus scale. One scan + one bounded
    (|langs|²-key) aggregate."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(
        F.col("lang").alias("labeled"), T.lang_id("text").alias("predicted")
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "heavy_hitter_ngrams",
    oracle="""
    WITH g AS (
      SELECT unnest(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS item
      FROM documents WHERE text IS NOT NULL)
    SELECT item, CAST(count(*) AS BIGINT) AS cnt
    FROM g GROUP BY item
    ORDER BY cnt DESC, item ASC LIMIT 20
    """,
    tags=("text", "sketch", "extension"),
)
def heavy_hitter_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word-trigram heavy hitters via the two-pass Misra-Gries
    sketch-then-verify plan (operators/sketches.py): bounded per-partition
    summaries → broadcast candidate recount → certified exact top-k, falling
    back to the full aggregate when the sketch bound can't certify. At
    corpus scale the full-vocabulary shuffle this avoids is billions of
    distinct n-grams; the oracle is the plain exact aggregate — the two
    plans must agree bit-for-bit, which IS the sketch's exactness claim.
    All gram occurrences count (no per-doc dedup), ties break on the gram
    string, identically in both engines."""
    from dampr_spark.operators.dedup import _ensure_parallelism
    from dampr_spark.operators.sketches import heavy_hitters

    # Parallelize the DOC df, not the exploded grams: the n-gram transform
    # is the expensive step and must run after the exchange (a post-explode
    # repartition left it serial — measured 4s single-task at sf0.1).
    d = _ensure_parallelism(
        _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    # O(n·len) trigram fold (round 14): the sequence+slice lambda shape
    # re-evaluated the split per element — quadratic in doc length.
    from dampr_spark.functions.text import word_ngram_strings

    grams = d.select(
        F.explode(word_ngram_strings("text", 3)).alias("item")
    )
    # capacity 16384: the certification bound N/(m+1) must sit BELOW the
    # kth trigram count at every bench scale (sf0.1: N=261k -> bound 15.9
    # vs kth=22; 8192 put the bound at 31.8 and silently fell back to the
    # full aggregate - correct, but running both paths). Flat-vocabulary
    # corpora still certify or fall back per the operator contract.
    return heavy_hitters(grams, "item", k=20, capacity=16384)


@register(
    "next_token_probs",
    oracle="""
    WITH toks AS (
      SELECT string_split(text, ' ') AS t FROM documents WHERE text IS NOT NULL),
    bi AS (
      SELECT u['a'] AS a, u['b'] AS b FROM (
        SELECT unnest(list_transform(range(1, len(t)),
                                     i -> {'a': t[i], 'b': t[i+1]})) AS u
        FROM toks)),
    ctx AS (SELECT a, count(*) AS n_ctx FROM bi GROUP BY a),
    top_ctx AS (SELECT a, n_ctx FROM ctx ORDER BY n_ctx DESC, a LIMIT 5),
    pair AS (
      SELECT bi.a, bi.b, count(*) AS n FROM bi JOIN top_ctx USING (a)
      GROUP BY bi.a, bi.b),
    ranked AS (
      SELECT pair.a, pair.b, pair.n, top_ctx.n_ctx,
             row_number() OVER (PARTITION BY pair.a
                                ORDER BY pair.n DESC, pair.b) AS rn
      FROM pair JOIN top_ctx USING (a))
    SELECT a AS context, b AS next_token,
           CAST(n AS BIGINT) AS n_pair,
           round(n / n_ctx, 6) AS prob
    FROM ranked WHERE rn <= 3
    """,
    tags=("text", "lm", "extension"),
)
def next_token_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model table: for the 5 most frequent context tokens,
    the top-3 next tokens with MLE conditional probability — the n-gram LM
    / autocomplete analytics shape. Plan: one bigram explode (parallelized
    before the explode), context counts → broadcast top-5 probe (the bigram
    stream is filtered to 5 keys BEFORE the pair aggregate, so the second
    shuffle carries only the hot contexts), windowed top-3 per context over
    a ≤5-context key space."""
    from pyspark.sql.window import Window

    from dampr_spark.operators.dedup import _ensure_parallelism

    d = _ensure_parallelism(
        _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    from dampr_spark.functions.text import adjacent_token_pairs

    # Shared O(n) bigram expression (round 14): the old per-site
    # transform/element_at shape was quadratic in doc length.
    pairs = adjacent_token_pairs("text")
    bi = d.select(F.explode(pairs).alias("u")).select("u.a", "u.b")
    bi = bi.transform(_pin)  # two consumers: ctx counts + pair counts
    ctx = bi.groupBy("a").agg(F.count(F.lit(1)).alias("n_ctx"))
    top_ctx = ctx.orderBy(F.col("n_ctx").desc(), F.col("a").asc()).limit(5)
    pair = (
        bi.join(F.broadcast(top_ctx.select("a")), "a")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("a").orderBy(F.col("n").desc(), F.col("b").asc())
    ranked = (
        pair.join(F.broadcast(top_ctx), "a")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    return ranked.select(
        F.col("a").alias("context"),
        F.col("b").alias("next_token"),
        F.col("n").cast("long").alias("n_pair"),
        F.round(F.col("n") / F.col("n_ctx"), 6).alias("prob"),
    )


@register("bpe_merges", oracle=None, tags=("text", "tokenizer", "extension"))
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table (rank, sym_l, sym_r, weighted count) — 8
    merge rounds over the corpus's weighted word vocabulary
    (operators/bpe.py: one corpus-size shuffle for word counts, vocab-size
    iteration after). Deterministic (lexicographic tie-break) but the
    iterative symbol-array rewriting is not SQL-expressible → rows-only;
    round 1 is oracle-verified by `bpe_round1_check` and the full sequence
    is pinned against a pure-Python reference in tests/test_bpe.py."""
    from dampr_spark.operators.bpe import train_bpe

    merges = train_bpe(_t(spark, sf_dir, "documents"), n_merges=8)
    return spark.createDataFrame(
        [(i + 1, l, r, n) for i, (l, r, n) in enumerate(merges)],
        "rank long, sym_l string, sym_r string, n long",
    )


@register(
    "bpe_round1_check",
    oracle="""
    WITH wc AS (
      SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents WHERE text IS NOT NULL)
      WHERE len(word) > 0 GROUP BY word),
    pairs AS (
      SELECT u['l'] AS l, u['r'] AS r, cnt FROM (
        SELECT cnt, unnest(list_transform(range(1, len(word)),
                            i -> {'l': word[i], 'r': word[i+1]})) AS u
        FROM wc))
    SELECT l AS sym_l, r AS sym_r, CAST(sum(cnt) AS BIGINT) AS n
    FROM pairs GROUP BY l, r
    ORDER BY n DESC, sym_l ASC, sym_r ASC
    LIMIT 1
    """,
    tags=("text", "tokenizer", "invariant", "extension"),
)
def bpe_round1_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External verification of BPE training's first round: the top
    weighted character bigram over the word vocabulary (the pair the first
    merge MUST pick, tie-broken lexicographically) is SQL-expressible, so
    both engines compute it independently and hash-compare — anchoring the
    rows-only `bpe_merges` chain to an oracle-checked starting point."""
    from dampr_spark.operators.bpe import word_counts

    wc = word_counts(_t(spark, sf_dir, "documents"))
    pairs = wc.select(
        "cnt",
        F.explode(
            F.when(
                F.length("word") > 1,
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.struct(
                        F.col("word").substr(i, F.lit(1)).alias("l"),
                        F.col("word").substr(i + 1, F.lit(1)).alias("r"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        ).alias("p"),
    )
    return (
        pairs.groupBy(F.col("p.l").alias("sym_l"), F.col("p.r").alias("sym_r"))
        .agg(F.sum("cnt").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("sym_l").asc(), F.col("sym_r").asc())
        .limit(1)
    )


@register(
    "token_cooccurrence_topk",
    oracle="""
    WITH dt0 AS (
      SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents WHERE text IS NOT NULL),
    okdoc AS (
      SELECT doc_id FROM dt0 GROUP BY doc_id HAVING count(*) <= 200),
    dt AS (SELECT dt0.* FROM dt0 JOIN okdoc USING (doc_id)),
    ok AS (
      SELECT tok FROM dt GROUP BY tok HAVING count(*) <= 3000),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(count(*) AS BIGINT) AS support
      FROM dt a JOIN ok oa ON a.tok = oa.tok
      JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      JOIN ok ob ON b.tok = ob.tok
      GROUP BY a.tok, b.tok)
    SELECT tok_a, tok_b, support FROM pairs
    ORDER BY support DESC, tok_a, tok_b LIMIT 20
    """,
    tags=("text", "mining", "extension"),
)
def token_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-itemset mining at pair granularity: the 20 token pairs
    co-occurring in the most documents (support counts) — the
    market-basket/association primitive. Plan: distinct (doc, token)
    posting table → in-document pairing keyed by doc → support aggregate →
    heap top-20. The document-frequency cap (≤3000 docs, mirrored in the
    oracle's HAVING) is the apriori-style pruning that keeps in-doc pair
    fan-out away from stopword-like tokens at corpus scale, and the
    per-document distinct-token cap (≤200, also mirrored) bounds the
    doc-keyed self-join at C(200,2) pairs per document — the same
    cap-over-explode trade as every pair-generating family here. Both caps
    sit above every organic value, so they're no-ops on current data."""
    from dampr_spark.operators.dedup import _ensure_parallelism

    d = _ensure_parallelism(
        _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    dt = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok"),
    ).distinct().transform(_pin)  # feeds both caps + join sides
    okdoc = dt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ndt")).filter(
        F.col("ndt") <= 200
    ).select("doc_id")
    dt = dt.join(okdoc, "doc_id", "left_semi")
    ok = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= 3000
    ).select("tok")
    dtk = dt.join(F.broadcast(ok), "tok")
    a = dtk.select("doc_id", F.col("tok").alias("tok_a"))
    b = dtk.select("doc_id", F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return pairs.orderBy(
        F.col("support").desc(), F.col("tok_a").asc(), F.col("tok_b").asc()
    ).limit(20)


_RRF_K = 60
_RRF_POOL = 50  # per-modality candidate pool


@register(
    "hybrid_rrf_search",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        WHERE text IS NOT NULL),
    stats AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_docs,
               avg(len(string_split(text, ' '))) AS avgdl
        FROM documents WHERE text IS NOT NULL),
    dl AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        FROM documents WHERE text IS NOT NULL),
    q AS (SELECT unnest(['spark', 'query', 'join']) AS token),
    df AS (
        SELECT token, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM toks JOIN q USING (token) GROUP BY token),
    tf AS (
        SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
        FROM toks JOIN q USING (token) GROUP BY 1, 2),
    bm25 AS (
        SELECT doc_id,
               round(sum(
                   ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * ({_BM25_K1} + 1)
                   / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
               ), 6) AS bm25
        FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
        GROUP BY doc_id),
    lex AS (
        SELECT doc_id, CAST(row_number() OVER (
            ORDER BY round(bm25, 4) DESC, doc_id) AS BIGINT) AS r_lex
        FROM bm25
        ORDER BY round(bm25, 4) DESC, doc_id LIMIT {_RRF_POOL}),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE {V.valid_vector_sql('embedding')}),
    qv AS (SELECT e AS qe FROM v ORDER BY vec_id LIMIT 1),
    cos AS (
        SELECT vec_id AS doc_id,
               round({V.cosine_sql('e', 'qe')}, 6) AS cos_sim
        FROM v, qv),
    vec AS (
        SELECT doc_id, CAST(row_number() OVER (
            ORDER BY round(cos_sim, 4) DESC, doc_id) AS BIGINT) AS r_vec
        FROM cos
        ORDER BY round(cos_sim, 4) DESC, doc_id LIMIT {_RRF_POOL})
    SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
           round(COALESCE(1.0 / ({_RRF_K} + r_lex), 0)
                 + COALESCE(1.0 / ({_RRF_K} + r_vec), 0), 6) AS rrf
    FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    ORDER BY rrf DESC, doc_id
    LIMIT 20
    """,
    tags=("text", "vector", "search", "hybrid", "extension"),
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval: BM25 lexical ranking fused with embedding-cosine
    ranking by Reciprocal Rank Fusion (rrf = Σ 1/(60 + rank)) — the
    standard zero-tuning fusion behind modern RAG retrieval stacks
    (lexical catches exact terms, vectors catch paraphrase; RRF needs no
    score calibration because it only consumes RANKS).

    Cross-engine exactness: both per-modality rankings order by the
    4dp-ROUNDED score then doc_id (the bm25_rank cut-stability argument),
    so the integer ranks agree, and RRF on integer ranks is identical
    double math. Plan shape: the BM25 side is the oracle-green bm25_rank
    plan (one filtered-explode pass + broadcast stats); the vector side
    is a broadcast-query scan; each pool is a heap top-50 and the rank
    windows run over 50 rows, never the corpus; the fusion join is
    50x50."""
    from pyspark.sql.window import Window as W

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    k1, b = _BM25_K1, _BM25_B
    terms = list(_BM25_QUERY_TERMS)

    toks = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("double").alias("dl"),
        F.explode(F.split("text", " ")).alias("token"),
    ).filter(F.col("token").isin(terms))
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").cast("double").alias("tf"), F.first("dl").alias("dl")
    )
    dfreq = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    stats = d.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size(F.split("text", " "))).alias("avgdl"),
    )
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    score = idf * F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    bm25 = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(score), 6).alias("bm25"))
        .orderBy(F.round(F.col("bm25"), 4).desc(), F.col("doc_id"))
        .limit(_RRF_POOL)
        .localCheckpoint(eager=True)  # bounded (50 rows); feeds the rank window
    )
    lex = bm25.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.round(F.col("bm25"), 4).desc(), F.col("doc_id")))
        .cast("long")
        .alias("r_lex"),
    )

    v = (
        _t(spark, sf_dir, "embeddings")
        .filter(V.valid_vector("embedding"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .transform(_pin)  # feeds the query pick and the scan
    )
    qv = v.orderBy("vec_id").limit(1).select(F.col("e").alias("qe"))
    cos = (
        v.crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(V.cosine("e", "qe"), 6).alias("cos_sim"),
        )
        .orderBy(F.round(F.col("cos_sim"), 4).desc(), F.col("doc_id"))
        .limit(_RRF_POOL)
        .localCheckpoint(eager=True)  # bounded (50 rows); feeds the rank window
    )
    vec = cos.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.round(F.col("cos_sim"), 4).desc(), F.col("doc_id")))
        .cast("long")
        .alias("r_vec"),
    )

    return (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("r_vec")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (round 7)
# ---------------------------------------------------------------------------

_CMS_DEPTH, _CMS_WIDTH = 4, 512


def _cms_bucket_sql(item_sql: str, row_sql: str) -> str:
    from dampr_spark.functions.hashing import md5_uint_sql

    inner = f"{item_sql} || '#cms' || CAST({row_sql} AS VARCHAR)"
    return f"({md5_uint_sql(inner, 4, little_endian=False)} % {_CMS_WIDTH})"


@register(
    "cms_ngram_frequency",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM documents WHERE text IS NOT NULL),
grams AS (
  SELECT unnest(list_transform(
      range(1, greatest(len(t) - 2, 0) + 1),
      i -> array_to_string(t[i:i+2], ' '))) AS g
  FROM toks),
exact AS (
  SELECT g, CAST(count(*) AS BIGINT) AS exact
  FROM grams GROUP BY g ORDER BY exact DESC, g LIMIT 20),
rows_ AS (SELECT unnest(range(0, {_CMS_DEPTH})) AS r),
cells AS (
  SELECT r, {_cms_bucket_sql('g', 'r')} AS bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM grams, rows_ GROUP BY 1, 2),
probe AS (
  SELECT e.g, e.exact, min(c.cnt) AS est
  FROM exact e, rows_ rr
  JOIN cells c
    ON c.r = rr.r AND c.bucket = {_cms_bucket_sql('e.g', 'rr.r')}
  GROUP BY e.g, e.exact)
SELECT g AS gram, exact, CAST(est AS BIGINT) AS est,
       CAST(est - exact AS BIGINT) AS overestimate
FROM probe
""",
    tags=("text", "sketch", "invariant", "extension"),
)
def cms_ngram_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch demo with its own certificate: build a 4x512 CMS
    over every word-3-gram occurrence (md5 row-hashes — the cross-engine
    hash, so the sketch CELLS and therefore the estimates are
    bit-identical in DuckDB and the whole query hash-compares), then probe
    the exact top-20 grams. ``est >= exact`` always (CMS upper bound);
    ``overestimate`` shows the collision mass at ~23k distinct grams into
    512 buckets. Sketches merge by summing cells (the groupBy IS the
    merge), which is what makes CMS the shard-parallel frequency sketch at
    100 TB — the corpus reduces to depth x width cells per shard."""
    from dampr_spark.operators.dedup import _ensure_parallelism, positional_windows
    from dampr_spark.operators.sketches import cms_build, cms_estimate

    grams = (
        _ensure_parallelism(
            _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
        )
        .select(F.explode(positional_windows("text", 3)).alias("w"))
        .select(F.col("w.gram").alias("g"))
        .transform(_pin)  # feeds the exact ranking AND the sketch
    )
    exact = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("exact"))
        .orderBy(F.col("exact").desc(), "g")
        .limit(20)
        .localCheckpoint(eager=True)  # bounded (top-20 rows); feeds probe + final join
    )
    sketch = cms_build(grams, "g", depth=_CMS_DEPTH, width=_CMS_WIDTH)
    est = cms_estimate(
        sketch, exact.select("g"), "g", depth=_CMS_DEPTH, width=_CMS_WIDTH
    )
    return exact.join(est, "g").select(
        F.col("g").alias("gram"),
        "exact",
        "est",
        (F.col("est") - F.col("exact")).alias("overestimate"),
    )


_TEXTRANK_VOCAB = 150
_TEXTRANK_ITERS = 4
_TEXTRANK_TOP = 20


def _textrank_oracle_sql(vocab: int, iters: int, top: int) -> str:
    """Unroll the fixed-iteration PageRank as chained CTEs — one r{t} per
    round, each reproducing operators/graph.pagerank's update EXACTLY
    (same 10-dp per-round rounding, same (1-d)/N base, same w/outw
    normalization), so DuckDB replays the iterative algorithm end-to-end."""
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(f"""
    r{t} AS (SELECT nodes.id,
               round(0.15 / (SELECT n FROM nn)
                     + 0.85 * coalesce(sum(en.wn * p.r), 0), 10) AS r
        FROM nodes
        LEFT JOIN en ON en.dst = nodes.id
        LEFT JOIN r{t - 1} p ON p.id = en.src
        GROUP BY nodes.id)""")
    return f"""
    WITH toks AS (SELECT string_split(text, ' ') AS ts
                  FROM documents WHERE text IS NOT NULL),
    uc AS (SELECT w, count(*) AS c
           FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY w),
    vocab AS (SELECT w FROM uc ORDER BY c DESC, w LIMIT {vocab}),
    bg AS (SELECT unnest(list_transform(range(1, greatest(len(ts) - 1, 0) + 1),
                i -> struct_pack(a := ts[i], b := ts[i + 1]))) AS p
           FROM toks),
    pe AS (SELECT least(p.a, p.b) AS lo, greatest(p.a, p.b) AS hi,
                  count(*) AS w
           FROM bg
           WHERE p.a <> p.b
             AND p.a IN (SELECT w FROM vocab)
             AND p.b IN (SELECT w FROM vocab)
           GROUP BY 1, 2),
    ed AS (SELECT lo AS src, hi AS dst, w FROM pe
           UNION ALL
           SELECT hi, lo, w FROM pe),
    nodes AS (SELECT DISTINCT src AS id FROM ed),
    nn AS (SELECT count(*) AS n FROM nodes),
    ow AS (SELECT src, sum(w) AS outw FROM ed GROUP BY src),
    en AS (SELECT ed.src, ed.dst, ed.w * 1.0 / ow.outw AS wn
           FROM ed JOIN ow USING (src)),
    r0 AS (SELECT id, round(1.0 / (SELECT n FROM nn), 10) AS r FROM nodes),{",".join(rounds)}
    SELECT id AS token, round(r, 6) AS score
    FROM r{iters}
    ORDER BY score DESC, token
    LIMIT {top}
    """


def _textrank_pair_counts(d: DataFrame, vocab: DataFrame) -> DataFrame:
    """Vocab-filtered adjacent-pair co-occurrence counts as canonical
    (lo, hi, w) edges. Split out (pre-checkpoint) so the plan lock can see
    the join strategy: both vocab probes broadcast the ≤150-row
    vocabulary; the exploded pair stream only ever shuffles for the final
    (lo, hi) count aggregate."""
    # Shared O(n) bigram expression (round 14): the old per-site
    # transform/element_at shape was quadratic in doc length.
    pairs = T.adjacent_token_pairs("text")
    return (
        d.select(F.explode(pairs).alias("p"))
        .filter(F.col("p.a") != F.col("p.b"))
        .join(F.broadcast(vocab.withColumnRenamed("w", "a")), F.col("p.a") == F.col("a"))
        .join(F.broadcast(vocab.withColumnRenamed("w", "b")), F.col("p.b") == F.col("b"))
        .select(
            F.least("p.a", "p.b").alias("lo"), F.greatest("p.a", "p.b").alias("hi")
        )
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).alias("w"))
    )


@register(
    "textrank_keywords",
    oracle=_textrank_oracle_sql(_TEXTRANK_VOCAB, _TEXTRANK_ITERS, _TEXTRANK_TOP),
    tags=("text", "graph", "extension"),
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    the token co-occurrence graph — vocabulary = top-150 tokens by corpus
    frequency, edges = adjacent-token co-occurrence counts (symmetrized),
    4 power-iteration rounds, top-20 tokens by stationary score. This is
    the corpus-level keyword signal a curation pipeline uses to label
    shards and audit topic mix — and it externally verifies the ITERATIVE
    `operators/graph.pagerank` against a DuckDB oracle that unrolls the
    same 4 rounds as chained CTEs (two completely different evaluation
    strategies, identical ranks — the fuzzy_dup_components discipline
    applied to PageRank).

    Plan shape for 100 TB: two corpus-scan aggregates (unigram counts and
    vocab-filtered adjacent-pair counts, both map-side partial); the vocab
    cut is a heap top-150 (TakeOrdered, no global sort) broadcast into the
    pair filter; everything after the second aggregate operates on a
    ≤150-node graph — the iteration cost is independent of corpus size.
    Per-round 10-dp rounding makes the float sums merge-order-proof (the
    kmeans-centroid discipline)."""
    from dampr_spark.operators.dedup import _ensure_parallelism
    from dampr_spark.operators.graph import pagerank

    d = _ensure_parallelism(
        _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    vocab = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(_TEXTRANK_VOCAB)
        .select("w")
        .localCheckpoint(eager=True)  # bounded (vocab cap); probed twice (both pair endpoints)
    )
    pe = _textrank_pair_counts(d, vocab).localCheckpoint(
        eager=True
    )  # bounded (<= vocab^2 pair counts); read twice by the symmetrize union
    ed = pe.union(pe.select(F.col("hi").alias("lo"), F.col("lo").alias("hi"), "w"))
    pr = pagerank(ed, src="lo", dst="hi", weight="w", iters=_TEXTRANK_ITERS)
    return (
        pr.orderBy(F.round("rank", 6).desc(), "id")
        .limit(_TEXTRANK_TOP)
        .select(F.col("id").alias("token"), F.round("rank", 6).alias("score"))
    )


_VOCAB_CURVE_POINTS = (5, 15, 50)


@register(
    "vocab_coverage_curve",
    oracle=f"""
    WITH uc AS (
        SELECT w, count(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL)
        GROUP BY w),
    ranked AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk FROM uc),
    tot AS (SELECT sum(c) AS t, CAST(count(*) AS BIGINT) AS n_vocab FROM ranked)
    SELECT p.vocab_size,
           CAST(least(p.vocab_size, tot.n_vocab) AS BIGINT) AS n_types,
           round(sum(CASE WHEN rk <= p.vocab_size THEN c ELSE 0 END)
                 * 1.0 / tot.t, 6) AS coverage
    FROM ranked CROSS JOIN tot
    CROSS JOIN (VALUES {", ".join(f"({p})" for p in _VOCAB_CURVE_POINTS)})
         AS p(vocab_size)
    GROUP BY p.vocab_size, tot.t, tot.n_vocab
    """,
    tags=("text", "tokenizer", "extension"),
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer budget curve: for each candidate vocabulary size N, the
    fraction of all token OCCURRENCES covered by the top-N types (by
    corpus frequency, ties broken lexically). The first question a
    tokenizer/vocab decision asks of a corpus — where the Zipf mass
    saturates — answered in one scan.

    Plan shape for 100 TB: one vocabulary aggregate (map-side partial),
    one rank window over the VOCAB table (types, not occurrences — the
    corpus never sorts), then a 3-point conditional re-aggregate of that
    same vocab table; the curve points are literals, so the whole tail is
    vocabulary-sized."""
    from pyspark.sql.window import Window

    from dampr_spark.operators.dedup import _ensure_parallelism

    d = _ensure_parallelism(
        _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    uc = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = uc.select(
        "c", F.row_number().over(Window.orderBy(F.col("c").desc(), "w")).alias("rk")
    ).transform(_pin)  # feeds totals AND the per-point aggregate
    tot = ranked.agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("n_vocab")
    )
    points = spark.createDataFrame(
        [(p,) for p in _VOCAB_CURVE_POINTS], "vocab_size int"
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(points))
        .groupBy("vocab_size", "t", "n_vocab")
        .agg(
            F.round(
                F.sum(F.when(F.col("rk") <= F.col("vocab_size"), F.col("c")).otherwise(0))
                / F.first("t"),
                6,
            ).alias("coverage")
        )
        .select(
            "vocab_size",
            F.least(F.col("vocab_size").cast("bigint"), F.col("n_vocab")).alias("n_types"),
            "coverage",
        )
    )


# ---------------------------------------------------------------------------
# Positional phrase search (round 7)
# ---------------------------------------------------------------------------

_PHRASE = ["slow", "hash", "batch"]


@register(
    "phrase_search",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents
                  WHERE text IS NOT NULL),
    occ AS (
        SELECT doc_id,
               unnest(list_filter(range(1, greatest(len(ts) - {len(_PHRASE) - 1}, 0) + 1),
                      i -> {" AND ".join(f"ts[i + {j}] = {w!r}" for j, w in enumerate(_PHRASE))}))
                 AS i
        FROM toks)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(min(i) - 1 AS BIGINT) AS first_pos
    FROM occ GROUP BY doc_id
    """,
    tags=("text", "indexer", "search", "phrase", "extension"),
)
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-PHRASE search over positional postings — the capability the
    reference's SQLite indexer lacks entirely (dampr/utils/indexer.py
    stores key→line with no positions; union/intersect are bag-of-words).
    Slot-union plan (operators/indexer.Indexer.phrase is the persisted
    form): every occurrence of phrase word i nominates candidate
    ``start = pos - i``; a (doc, start) nominated by all three slots is an
    occurrence (positions are unique within a doc, so plain count ==
    distinct-slot count — repeated phrase words included). Overlapping
    occurrences count separately.

    One shuffle on (doc, start) over the three words' POSTING LISTS only —
    at 100 TB cost scales with term frequency, never corpus size, and
    against the persisted positional index the ``token IN (words)``
    filter prunes files + row groups before any exchange. The oracle is
    deliberately a DIFFERENT algorithm (direct windowed array scan), so
    the hash match cross-checks the postings join against a
    straight-line reference model."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    post = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
    ).filter(F.col("token").isin(_PHRASE))
    slots = None
    for i, w in enumerate(_PHRASE):
        s = post.filter(F.col("token") == w).select(
            "doc_id", (F.col("pos") - F.lit(i)).alias("start")
        )
        slots = s if slots is None else slots.unionAll(s)
    hits = (
        slots.filter(F.col("start") >= 0)
        .groupBy("doc_id", "start")
        .agg(F.count(F.lit(1)).alias("_k"))
        .filter(F.col("_k") == len(_PHRASE))
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("start").alias("first_pos"),
    )


# ---------------------------------------------------------------------------
# Corpus-level source similarity (round 7)
# ---------------------------------------------------------------------------


@register(
    "source_similarity_cosine",
    oracle="""
    WITH tf AS (
        SELECT source, w AS token, count(*) AS c
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL AND source IS NOT NULL)
        WHERE w <> '' GROUP BY 1, 2),
    nrm AS (SELECT source, sum(c * c) AS s2 FROM tf GROUP BY 1),
    dots AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_shared_tokens,
               sum(a.c * b.c) AS dot
        FROM tf a JOIN tf b ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2)
    SELECT source_a, source_b, n_shared_tokens,
           round(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(na.s2 AS DOUBLE)) * sqrt(CAST(nb.s2 AS DOUBLE))),
                 6) AS cosine
    FROM dots
    JOIN nrm na ON na.source = dots.source_a
    JOIN nrm nb ON nb.source = dots.source_b
    """,
    tags=("text", "pipeline", "stats", "extension"),
)
def source_similarity_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level SOURCE similarity — every pair of sources scored by
    the cosine of their term-frequency vectors, WITHOUT ever
    materializing a dense vocab-width vector: the dot products come from
    a token-keyed self-join of the (source, token, count) table (partial
    products combine map-side), norms from an exact Σc² per source. All
    arithmetic is exact integers until the final sqrt/divide — a fixed
    IEEE expression both engines share — so the scores hash-compare with
    no tolerance.

    The curation question this answers: which crawl sources are
    near-redundant (cosine → 1 ⇒ overlapping distributions ⇒ candidates
    for mix-weight collapse or source-level dedup) and which add novel
    mass. At 100 TB: tf is vocab-bounded per source (the corpus reduces
    before any join); the self-join shuffles (token, source, count)
    rows only, and each token contributes ≤ |sources|² partial products
    — with thousands of sources you'd band tokens by document frequency
    (the posting-list cap discipline) before pairing; with the catalog's
    20 sources the join is exact and uncapped."""
    d = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    tf = (
        d.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(_pin)  # feeds the self-join twice + norms
    )
    nrm = tf.groupBy("source").agg(F.sum(F.col("c") * F.col("c")).alias("s2"))
    a = tf.select(
        F.col("source").alias("source_a"), "token", F.col("c").alias("ca")
    )
    b = tf.select(
        F.col("source").alias("source_b"), "token", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "token")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared_tokens"),
            F.sum(F.col("ca") * F.col("cb")).alias("dot"),
        )
    )
    na = nrm.select(F.col("source").alias("source_a"), F.col("s2").alias("s2a"))
    nb = nrm.select(F.col("source").alias("source_b"), F.col("s2").alias("s2b"))
    return (
        dots.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared_tokens",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("s2a").cast("double"))
                    * F.sqrt(F.col("s2b").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )
