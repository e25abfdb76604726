"""Catalog entries for the dedup / similarity / multimodal operator family
(`dampr_spark.operators`). The exact strategies (n-gram Jaccard, brute-force
cosine) carry full DuckDB oracles; the approximate ones (MinHash LSH,
SimHash, hyperplane LSH) are engine-hash-dependent and register as rows-only
checks, with pytest recall tests against the exact baselines
(tests/test_dedup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dampr_spark.functions.vector import cosine_sql
from dampr_spark.operators import dedup, multimodal, similarity
from dampr_spark.plans.catalog import register
from dampr_spark.sources.readers import read_table as _t

# Hot-gram posting cap for the REGISTERED query: grams shared by more than
# this many docs are dropped before pairing on BOTH engines (the identical
# HAVING filter below), so the result stays hash-exact while the worst
# per-gram fan-out is bounded at C(64,2) pairs. 64 sits above the corpus's
# organic max posting (~25 in r4), so on current data the capped output
# equals the uncapped one — the cap only bites adversarial/stopword grams,
# which at 100 TB would otherwise emit k² pairs into a single task
# (operators/dedup.py:660 documents the skew math;
# tests/test_dedup.py::test_ngram_hot_gram_cap pins cap-above-max == no-op).
_NGRAM_MAX_POSTING = 64

_NGRAM_ORACLE = f"""
WITH grams AS (
  SELECT doc_id AS id,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
             i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS gram
  FROM documents
),
sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n_grams FROM grams GROUP BY id),
keep AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING count(*) BETWEEN 2 AND {_NGRAM_MAX_POSTING}),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS inter
  FROM grams a JOIN keep USING (gram) JOIN grams b USING (gram)
  WHERE a.id < b.id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(inter / (sa.n_grams + sb.n_grams - inter), 6) AS jaccard
FROM shared
JOIN sizes sa ON sa.id = shared.id_a
JOIN sizes sb ON sb.id = shared.id_b
WHERE inter / (sa.n_grams + sb.n_grams - inter) >= 0.1
"""


@register("ngram_jaccard_dups", oracle=_NGRAM_ORACLE, tags=("dedup", "extension"))
def ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (posting-list self-join) —
    the non-approximate dedup baseline, fully oracle-checked. Registered
    WITH the hot-gram posting cap (mirrored in the oracle's HAVING) so the
    flagship plan is the scale-safe one."""
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        n=3,
        threshold=0.1,
        max_posting=_NGRAM_MAX_POSTING,
    )


@register(
    "embedding_cosine_dups",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {cosine_sql('a.embedding', 'b.embedding')} >= 0.4
    """,
    tags=("dedup", "vector", "extension"),
)
def embedding_cosine_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine pairs at ≥ 0.4 — the ORACLE BASELINE for
    `embedding_near_dups`, kept oracle-checked because it is exactly
    SQL-expressible. The crossJoin is O(N²): do not reach for this form at
    corpus scale; the registered scale path is `embedding_near_dups`."""
    return dedup.embedding_cosine_dups(
        _t(spark, sf_dir, "embeddings"), threshold=0.4
    )


@register("embedding_near_dups", oracle=None, tags=("dedup", "vector", "extension"))
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH bucketing — the
    PRIMARY (scale-path) plan: only vectors sharing an (table, bucket) cell
    are compared, one shuffle keyed by bucket, hot buckets capped. Hash-based
    candidates → rows-only; recall ≥ 0.9 vs the brute-force baseline is
    pytest-checked (tests/test_dedup.py::test_bucketed_pairs_recall).

    The 0.4 threshold matches the test corpus (its densest cosine band);
    at 66° the per-plane collision probability is only ~0.63, hence few
    planes × many tables (3×12 → expected recall ≈ 0.97). Real near-dup
    thresholds (≥0.9) prune far harder with 8×4 tables."""
    lsh = similarity.RandomHyperplaneLSH(dim=64, n_planes=3, n_tables=12)
    return lsh.bucketed_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


@register("minhash_lsh_dedup", oracle=None, tags=("dedup", "extension"))
def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64 perms)+LSH(threshold-tuned 8 bands × 8 rows) candidates
    verified at char-5-shingle Jaccard ≥ 0.8. Hash-based → no cross-engine
    oracle; recall vs the exact baseline is pytest-checked
    (tests/test_dedup.py)."""
    return dedup.minhash_lsh_dedup(
        _t(spark, sf_dir, "documents"), threshold=0.8
    )


@register("simhash_dedup", oracle=None, tags=("dedup", "extension"))
def simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit, 4×16 bands) near-dup pairs at hamming ≤ 3."""
    return dedup.simhash_dedup(_t(spark, sf_dir, "documents"), max_hamming=3)


@register("lsh_ann_topk", oracle=None, tags=("vector", "ann", "extension"))
def lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH: probe only the
    query's buckets. Approximate → rows-only; recall vs brute force is
    pytest-checked."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter("vec_id = 0").select("embedding").first()
    lsh = similarity.RandomHyperplaneLSH(dim=64, n_planes=6, n_tables=8)
    bucketed = lsh.bucketize(e.filter("vec_id <> 0"))
    return lsh.query_topk(bucketed, list(q.embedding), k=20)


@register("near_dedup_corpus", oracle=None, tags=("dedup", "pipeline", "extension"))
def near_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-shrink pipeline: MinHash-LSH pairs → min-label
    cluster propagation → drop non-canonical rows. Hash-based candidates →
    rows-only; cluster/drop semantics are pytest-checked
    (tests/test_dedup.py)."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_dedup(d, threshold=0.8)
    return dedup.drop_near_dups(d, pairs).select("doc_id", "lang", "n_chars")


@register("ivf_ann_topk", oracle=None, tags=("vector", "ann", "extension"))
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via an IVF coarse quantizer (sampled
    spherical k-means → inverted lists → nprobe search). Approximate →
    rows-only; recall vs brute force is pytest-checked."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter("vec_id = 0").select("embedding").first()
    ivf = similarity.IVFIndex(n_lists=16, nprobe=6).fit(e.filter("vec_id <> 0"))
    assigned = ivf.assign(e.filter("vec_id <> 0"))
    return ivf.query_topk(assigned, list(q.embedding), k=20)


@register("multimodal_features", oracle=None, tags=("multimodal", "extension"))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column media pipeline: documents→fake media payloads→
    mapInPandas feature extraction (decode stubbed; plumbing real).

    The driver-facing projection digests the ``array<float>`` feature
    vector to a scalar (sum, rounded) — array columns are unsortable in the
    external driver's pandas canonicalizer. The array-returning operator
    (`multimodal.extract_features`) stays intact for pipeline use."""
    media = multimodal.documents_as_media(_t(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media, fake=True)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.round(
            F.aggregate(
                "features", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            6,
        ).alias("feat_sum"),
    )


@register(
    "common_substring_dups",
    oracle="""
    WITH g AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 7, 1) + 1),
                   i -> array_to_string(string_split(text, ' ')[i:i+7], ' ')))) AS gram
        FROM documents WHERE text IS NOT NULL),
    p AS (
        SELECT gram FROM g GROUP BY gram
        HAVING count(*) BETWEEN 2 AND 16)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM g a JOIN p USING (gram) JOIN g b USING (gram)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
    tags=("dedup", "text", "extension"),
)
def common_substring_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim-overlap pairs: documents sharing ≥2 distinct 8-token windows
    (the scalable proxy for suffix-array common-substring dedup). Exact and
    deterministic → full oracle; see operators/dedup.py:shared_window_pairs
    for the posting-list plan and the boilerplate-window skew cap."""
    return dedup.shared_window_pairs(
        _t(spark, sf_dir, "documents"), window_tokens=8, min_shared=2, max_posting=16
    )


@register("kmeans_clusters", oracle=None, tags=("vector", "clustering", "extension"))
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embeddings table: per-cluster
    size and mean centroid-cosine after 3 refinement rounds. Iterative
    float argmax → rows-only; determinism, refinement monotonicity, and
    label agreement are pytest-checked (tests/test_dedup.py)."""
    assigned = similarity.kmeans_fit_assign(
        _t(spark, sf_dir, "embeddings"), k=8, iters=3
    )
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("sim"), 4).alias("avg_sim"),
    )


_HIST_MOD = 5  # doc_id % 5 == 0 plays the already-ingested historical corpus


@register(
    "incremental_dedup",
    oracle=f"""
    WITH hist AS (
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents WHERE doc_id % {_HIST_MOD} = 0),
    fresh AS (
        SELECT doc_id, source,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents WHERE doc_id % {_HIST_MOD} <> 0),
    unseen AS (
        -- NOT EXISTS, not NOT IN: one NULL fingerprint in hist would make
        -- NOT IN never-true (three-valued logic), while Spark's left_anti
        -- keeps NULL-keyed rows; NOT EXISTS matches left_anti semantics.
        SELECT * FROM fresh f0
        WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = f0.fp)),
    keep AS (
        SELECT fp, min(doc_id) AS doc_id FROM unseen GROUP BY fp)
    SELECT f.source,
           CAST(count(*) AS BIGINT) AS n_kept
    FROM fresh f JOIN keep k ON f.doc_id = k.doc_id
    GROUP BY f.source
    """,
    tags=("dedup", "pipeline", "incremental", "extension"),
)
def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: documents with doc_id % 5 == 0 play the
    already-ingested historical corpus; the rest arrive as the new shard.
    New docs whose normalized-text fingerprint already exists in history are
    dropped, then within-shard dups collapse to the min-id canonical;
    output is survivors per source. See operators/dedup.drop_seen_exact —
    the continuous-ingestion shape where history is a persisted
    (fp-bucketed) fingerprint store, so the anti-join never re-shuffles
    history."""
    d = _t(spark, sf_dir, "documents")
    from dampr_spark.functions.text import fingerprint

    hist_fps = d.filter(F.col("doc_id") % _HIST_MOD == 0).select(
        fingerprint("text").alias("fp")
    )
    new = d.filter(F.col("doc_id") % _HIST_MOD != 0)
    kept = dedup.drop_seen_exact(new, hist_fps)
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
