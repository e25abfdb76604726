"""Catalog entries for the dedup / similarity / multimodal operator family
(`dampr_spark.operators`). The exact strategies (n-gram Jaccard, brute-force
cosine) carry full DuckDB oracles; the approximate ones (MinHash LSH,
SimHash, hyperplane LSH) are engine-hash-dependent and register as rows-only
checks, with pytest recall tests against the exact baselines
(tests/test_dedup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dampr_spark.operators.pinning import pin_once as _pin
from dampr_spark.functions import text as T
from dampr_spark.functions.vector import cosine_sql, valid_vector_sql
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
    WITH v AS (SELECT * FROM embeddings WHERE {valid_vector_sql('embedding')})
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    -- rounded predicate mirrors the Spark plan exactly: the builder filters
    -- on the ROUNDED cos_sim column, so a raw cosine in [0.3999995, 0.4)
    -- must be kept by both engines
    WHERE round({cosine_sql('a.embedding', 'b.embedding')}, 6) >= 0.4
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
    from dampr_spark.functions.vector import valid_vector

    e = _t(spark, sf_dir, "embeddings").filter(valid_vector("embedding"))
    q = e.orderBy("vec_id").limit(1).select("vec_id", "embedding").first()
    lsh = similarity.RandomHyperplaneLSH(dim=64, n_planes=6, n_tables=8)
    bucketed = lsh.bucketize(e.filter(F.col("vec_id") != q.vec_id))
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
    from dampr_spark.functions.vector import valid_vector

    e = _t(spark, sf_dir, "embeddings").filter(valid_vector("embedding"))
    q = e.orderBy("vec_id").limit(1).select("vec_id", "embedding").first()
    rest = e.filter(F.col("vec_id") != q.vec_id)
    ivf = similarity.IVFIndex(n_lists=16, nprobe=6).fit(rest)
    assigned = ivf.assign(rest)
    return ivf.query_topk(assigned, list(q.embedding), k=20)


def _fake_feat_sql(i: int) -> str:
    """DuckDB twin of one component of multimodal._fake_decode: float32 of
    little-endian-uint32(md5(utf8(text) || str(i))[0:4]) / 2^32."""
    from dampr_spark.functions.hashing import md5_uint_sql

    u32 = md5_uint_sql(f"coalesce(text, '') || '{i}'", 4, little_endian=True)
    return f"CAST({u32} / 4294967296.0 AS REAL)"


# Left-fold sum in the same order as the Spark plan's F.aggregate (double
# accumulator seeded 0.0), so the 16-term float addition is bit-identical.
_FAKE_FEAT_SUM = "CAST(0.0 AS DOUBLE)"
for _i in range(multimodal.FEATURE_DIM):
    _FAKE_FEAT_SUM = f"({_FAKE_FEAT_SUM} + {_fake_feat_sql(_i)})"


@register(
    "multimodal_features",
    oracle=f"""
    SELECT doc_id AS media_id,
           'image' AS kind,
           CAST(CASE WHEN text IS NULL THEN 0
                     ELSE octet_length(encode(text)) END AS BIGINT) AS n_bytes,
           round({_FAKE_FEAT_SUM}, 6) AS feat_sum
    FROM documents
    """,
    tags=("multimodal", "extension"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column media pipeline: documents→fake media payloads→
    mapInPandas feature extraction (decode deterministic-fake in this
    container; plumbing real).

    FULLY oracle-checked even though the decode is the stub: the fake
    decoder is exact md5 arithmetic (see multimodal._fake_decode), so the
    oracle replays it in SQL — hex-digest nibble parsing, little-endian
    uint32, /2^32, float32 narrowing, and the identical left-fold sum —
    which externally verifies the whole Arrow batch path: byte movement,
    null handling, schema, and per-row feature math.

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


# ---------------------------------------------------------------------------
# Hash-checkable invariant companions for the oracle-less approximate ops.
#
# The approximate dedup/ANN/clustering queries are hash-seed dependent, so
# their outputs can never hash-match a DuckDB oracle. These companions
# externalize their INVARIANTS instead, following the proven
# each-engine-asserts-its-own-estimate pattern of sample_fraction_check /
# approx_quantile_check: each query emits (a) exact values BOTH engines
# compute independently (hash-compared for real), and (b) booleans that
# assert the approximate operator's contract Spark-side — precision of the
# emitted pairs re-derived from scratch, recall against an exact brute-force
# audit, run-to-run label agreement — with the oracle pinning the expected
# outcome. A recall regression, a verify-step bug, or nondeterminism flips a
# boolean and fails the driver's hash compare.
#
# Scale note on the audit subsets: exact recall can't be computed on a full
# 100 TB corpus (that's why the LSH operators exist) — the standard
# production design is a bounded audit sample. Here the subset is
# `doc_id % 2 = 0 AND doc_id < 1000` (deterministic, cross-engine): the
# modulus sets the rate at test scale and the absolute id cap is the audit
# BUDGET — ≤500 docs at every sf, so the brute-force pair compare stays a
# bounded broadcast-join task set no matter how large the corpus grows
# (at sf0.01, ids 0-499, the cap is a no-op).
# ---------------------------------------------------------------------------


_MINHASH_AUDIT_ORACLE = """
WITH aud AS (
  SELECT doc_id AS id,
         list_distinct(list_transform(
            range(1, greatest(length(text) - 4, 1) + 1),
            i -> text[i:i+4])) AS sh
  FROM documents
  WHERE doc_id % 2 = 0 AND doc_id < 1000 AND text IS NOT NULL),
ex AS (
  -- size-band prefilter: J >= 0.8 implies |A|/|B| in [0.8, 1.25]
  -- (J <= min(|A|,|B|)/max(|A|,|B|)), so the band drops no true pair and
  -- spares the quadratic list_intersect on most of the N^2/2 candidates
  SELECT len(list_intersect(a.sh, b.sh))::DOUBLE
           / greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1)
           AS j
  FROM aud a JOIN aud b ON a.id < b.id
  WHERE len(a.sh) * 5 >= len(b.sh) * 4 AND len(b.sh) * 5 >= len(a.sh) * 4)
SELECT CAST(count(*) FILTER (j >= 0.8) AS BIGINT)  AS n_exact_pairs,
       CAST(count(*) FILTER (j >= 0.98) AS BIGINT) AS n_high_pairs,
       TRUE                                        AS high_recall_ok,
       CAST(0 AS BIGINT)                           AS n_violations
FROM ex
"""


@register(
    "minhash_audit_check",
    oracle=_MINHASH_AUDIT_ORACLE,
    tags=("dedup", "invariant", "extension"),
)
def minhash_audit_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Externally-verified invariants of `minhash_lsh_dedup` (whose own pair
    set is hash-seed dependent → rows-only):

    - ``n_exact_pairs`` / ``n_high_pairs`` — exact char-5-shingle Jaccard
      pair counts (≥0.8 / ≥0.98) on the deterministic bounded audit set
      (`doc_id % 2 = 0 AND doc_id < 1000` — ≤500 docs at any sf),
      brute-forced independently by BOTH engines and hash-compared for
      real.
    - ``high_recall_ok`` — every audit pair at J ≥ 0.98 appears in the
      MinHash output. The checked pipeline runs with the hot-bucket cap
      DISABLED so the assertion tests banding completeness (the
      mathematical property), not the production pruning policy — pruning
      is intentional and documented, and a capped run could legally drop a
      pair whose every bucket is template-hot. At J ≥ 0.98 the banding's
      per-pair miss probability is (1 − 0.98^r)^b ≈ 2.4e-7, negligible
      even across corpus regenerations (J=0.8 boundary pairs are counted
      but not asserted — their collision probability is ~0.77 by design of
      threshold-tuned banding).
    - ``n_violations`` — emitted pairs whose exact Jaccard, RE-DERIVED from
      the raw text (not the pipeline's own verify column), rounds below the
      threshold. Must be 0: the verify step makes emission exact.
    """
    d = _t(spark, sf_dir, "documents")
    mh = dedup.minhash_lsh_dedup(
        d, threshold=0.8, max_bucket=2**31
    ).transform(_pin)

    aud = d.filter(
        (F.col("doc_id") % 2 == 0)
        & (F.col("doc_id") < 1000)
        & F.col("text").isNotNull()
    )
    sh = aud.select(
        F.col("doc_id").alias("id"), dedup.char_shingles("text", 5).alias("sh")
    )
    a = sh.select(
        F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), F.size("sh").alias("na")
    )
    b = sh.select(
        F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), F.size("sh").alias("nb")
    )
    # Size-band prefilter mirrored in the oracle: J >= 0.8 implies
    # |A|/|B| in [0.8, 1.25], so the cheap size predicate drops no true
    # pair and spares the O(|A|+|B|) set intersection on most candidates.
    exact = (
        a.join(
            b,
            (F.col("id_a") < F.col("id_b"))
            & (F.col("na") * 5 >= F.col("nb") * 4)
            & (F.col("nb") * 5 >= F.col("na") * 4),
        )
        .select(
            "id_a", "id_b", dedup.jaccard(F.col("sh_a"), F.col("sh_b")).alias("j")
        )
        .filter(F.col("j") >= 0.8)
        .transform(_pin)
    )
    ex_agg = exact.agg(
        F.count(F.lit(1)).alias("n_exact_pairs"),
        # coalesce: SUM over zero rows is NULL, the oracle's filtered count is 0
        F.coalesce(F.sum(F.when(F.col("j") >= 0.98, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_high_pairs"),
    )
    missed = (
        exact.filter(F.col("j") >= 0.98)
        .join(mh, ["id_a", "id_b"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_missed"))
    )
    # Precision re-verification mirrors the emission predicate (rounded-6dp
    # Jaccard ≥ threshold) so a boundary pair like 0.7999996 — emitted
    # because it rounds to 0.8 — is not miscounted as a violation.
    full_sh = d.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("id"), dedup.char_shingles("text", 5).alias("sh")
    )
    rev = (
        mh.join(
            full_sh.select(F.col("id").alias("id_a"), F.col("sh").alias("va")), "id_a"
        )
        .join(
            full_sh.select(F.col("id").alias("id_b"), F.col("sh").alias("vb")), "id_b"
        )
        .agg(
            F.sum(
                F.when(
                    F.round(dedup.jaccard(F.col("va"), F.col("vb")), 6) < 0.8, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_violations")
        )
    )
    return (
        ex_agg.crossJoin(F.broadcast(missed))
        .crossJoin(F.broadcast(rev))
        .select(
            "n_exact_pairs",
            "n_high_pairs",
            (F.col("n_missed") == 0).alias("high_recall_ok"),
            F.coalesce(F.col("n_violations"), F.lit(0).cast("long")).alias(
                "n_violations"
            ),
        )
    )


@register(
    "embedding_lsh_check",
    oracle=f"""
    WITH v AS (SELECT * FROM embeddings WHERE {valid_vector_sql('embedding')})
    SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
           TRUE                     AS recall_ok,
           CAST(0 AS BIGINT)        AS n_violations
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE round({cosine_sql('a.embedding', 'b.embedding')}, 6) >= 0.4
    """,
    tags=("dedup", "vector", "invariant", "extension"),
)
def embedding_lsh_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Externally-verified invariants of `embedding_near_dups` (hyperplane
    LSH — hash-dependent pair set → rows-only):

    - ``n_exact_pairs`` — the brute-force cosine ≥ 0.4 pair count, computed
      exactly by both engines (the same predicate the hash-green
      `embedding_cosine_dups` already proves cross-engine).
    - ``recall_ok`` — the LSH pair set covers ≥ 90% of the exact pairs
      (expected recall ≈ 0.97 at 3 planes × 12 tables; the pytest floor).
    - ``n_violations`` — LSH-emitted pairs whose cosine, re-derived from the
      embeddings, rounds below 0.4. Must be 0 (in-bucket verify is exact).
    """
    from dampr_spark.functions.vector import cosine

    e = _t(spark, sf_dir, "embeddings")
    exact = dedup.embedding_cosine_dups(e, threshold=0.4).transform(_pin)
    lsh = similarity.RandomHyperplaneLSH(dim=64, n_planes=3, n_tables=12)
    lp = lsh.bucketed_pairs(e, threshold=0.4).transform(_pin)

    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_found = exact.join(lp, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_found")
    )
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    rev = (
        lp.join(ea, "id_a")
        .join(eb, "id_b")
        .agg(
            F.sum(
                F.when(F.round(cosine(F.col("va"), F.col("vb")), 6) < 0.4, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_violations")
        )
    )
    return (
        n_exact.crossJoin(F.broadcast(n_found))
        .crossJoin(F.broadcast(rev))
        .select(
            "n_exact_pairs",
            (F.col("n_found") >= 0.9 * F.col("n_exact_pairs")).alias("recall_ok"),
            F.coalesce(F.col("n_violations"), F.lit(0).cast("long")).alias(
                "n_violations"
            ),
        )
    )


@register(
    "simhash_audit_check",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs_audit,
           TRUE                     AS all_found_ok,
           CAST(0 AS BIGINT)        AS n_violations
    FROM documents
    WHERE doc_id % 2 = 0 AND doc_id < 1000 AND text IS NOT NULL
    """,
    tags=("dedup", "invariant", "extension"),
)
def simhash_audit_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Externally-verified invariants of `simhash_dedup` (seeded token
    hashing → rows-only). SimHash values exist only Spark-side, so the
    cross-engine hash-compared value is the audit-subset size; the booleans
    carry the contract:

    - ``all_found_ok`` — a brute-force all-pairs hamming scan over the
      bounded audit set (`doc_id % 2 = 0 AND doc_id < 1000` — the same
      ≤500-doc audit budget as minhash_audit_check) recomputes signatures
      independently and checks
      every pair at hamming ≤ 3 appears in the banded pipeline's output.
      This is the pigeonhole completeness guarantee (≤3 flipped bits over 4
      bands leave ≥1 band identical) — a banding or bucketing bug breaks it.
      The checked pipeline runs with the hot-band cap DISABLED: the
      production `simhash_dedup` deliberately prunes over-cap band buckets
      (an intentional, documented recall trade the pigeonhole argument does
      not survive — sf0.1's hottest band bucket already holds ~830 of the
      1000-doc cap, so a regenerated corpus could legally drop an audit
      pair and turn a capped check red without any bug).
    - ``n_violations`` — emitted pairs whose recomputed hamming exceeds the
      threshold. Must be 0.
    """
    d = _t(spark, sf_dir, "documents")
    emitted = dedup.simhash_dedup(
        d, max_hamming=3, max_bucket=2**31
    ).transform(_pin)

    n_bands = 4
    tok_hashes = F.transform(
        F.array_distinct(F.split(F.col("text"), " ")), lambda t: F.xxhash64(t)
    )
    aud = (
        d.filter(
            (F.col("doc_id") % 2 == 0)
            & (F.col("doc_id") < 1000)
            & F.col("text").isNotNull()
        )
        .select(
            F.col("doc_id").alias("id"),
            dedup.simhash_bands_udf()(tok_hashes).alias("sh"),
        )
        .select(
            "id", *[F.col("sh")[i].alias(f"b{i}") for i in range(n_bands)]
        )
        .transform(_pin)
    )
    a = aud.select(
        F.col("id").alias("id_a"), *[F.col(f"b{i}").alias(f"a_b{i}") for i in range(n_bands)]
    )
    c = aud.select(
        F.col("id").alias("id_b"), *[F.col(f"b{i}").alias(f"c_b{i}") for i in range(n_bands)]
    )
    hamming = sum(
        F.bit_count(F.col(f"a_b{i}").bitwiseXOR(F.col(f"c_b{i}")))
        for i in range(n_bands)
    )
    brute = (
        a.join(c, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("h"))
        .filter(F.col("h") <= 3)
    )
    n_audit = d.filter(
        (F.col("doc_id") % 2 == 0)
        & (F.col("doc_id") < 1000)
        & F.col("text").isNotNull()
    ).agg(F.count(F.lit(1)).alias("n_docs_audit"))
    missed = brute.join(emitted, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("n_missed")
    )
    # Re-verify emitted pairs against independently recomputed signatures
    # (full corpus, not just the audit half).
    full = (
        d.filter(F.col("text").isNotNull())
        .select(
            F.col("doc_id").alias("id"),
            dedup.simhash_bands_udf()(tok_hashes).alias("sh"),
        )
        .select("id", *[F.col("sh")[i].alias(f"b{i}") for i in range(n_bands)])
    )
    rev = (
        emitted.join(
            full.select(
                F.col("id").alias("id_a"),
                *[F.col(f"b{i}").alias(f"a_b{i}") for i in range(n_bands)],
            ),
            "id_a",
        )
        .join(
            full.select(
                F.col("id").alias("id_b"),
                *[F.col(f"b{i}").alias(f"c_b{i}") for i in range(n_bands)],
            ),
            "id_b",
        )
        .agg(
            F.sum(F.when(hamming > 3, 1).otherwise(0))
            .cast("long")
            .alias("n_violations")
        )
    )
    return (
        n_audit.crossJoin(F.broadcast(missed))
        .crossJoin(F.broadcast(rev))
        .select(
            "n_docs_audit",
            (F.col("n_missed") == 0).alias("all_found_ok"),
            F.coalesce(F.col("n_violations"), F.lit(0).cast("long")).alias(
                "n_violations"
            ),
        )
    )


@register(
    "kmeans_agreement_check",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
           TRUE                     AS all_assigned_ok,
           TRUE                     AS deterministic_ok
    FROM embeddings WHERE {valid_vector_sql('embedding')}
    """,
    tags=("vector", "clustering", "invariant", "extension"),
)
def kmeans_agreement_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Externally-verified invariants of `kmeans_clusters` (iterative float
    argmax → rows-only): two INDEPENDENT fit+assign runs over the embeddings
    must agree on every label (deterministic seeding + 6dp-rounded centroid
    recompute make Lloyd's iterations reproducible), and every vector must
    receive a label. ``n_vecs`` is the cross-engine hash-compared value.
    """
    from dampr_spark.functions.vector import valid_vector

    # Count the VALID (non-null, positive-norm) vectors — the population
    # kmeans_fit_assign actually clusters; mirrored in the oracle's WHERE.
    e = _t(spark, sf_dir, "embeddings").filter(valid_vector("embedding"))
    a1 = similarity.kmeans_fit_assign(e, k=8, iters=2)
    a2 = similarity.kmeans_fit_assign(e, k=8, iters=2)
    n_vecs = e.agg(F.count(F.lit(1)).alias("n_vecs"))
    joined = a1.select("id", F.col("cluster").alias("c1")).join(
        a2.select("id", F.col("cluster").alias("c2")), "id"
    )
    agg = joined.agg(
        F.count(F.lit(1)).alias("n_joined"),
        F.sum(F.when(F.col("c1") != F.col("c2"), 1).otherwise(0))
        .cast("long")
        .alias("n_disagree"),
    )
    return n_vecs.crossJoin(F.broadcast(agg)).select(
        "n_vecs",
        (F.coalesce(F.col("n_joined"), F.lit(0)) == F.col("n_vecs")).alias(
            "all_assigned_ok"
        ),
        (F.coalesce(F.col("n_disagree"), F.lit(0).cast("long")) == 0).alias(
            "deterministic_ok"
        ),
    )


@register(
    "cluster_consistency_check",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           TRUE                     AS pairs_same_cluster_ok,
           TRUE                     AS canonical_is_min_ok,
           TRUE                     AS labels_cover_pairs_ok
    FROM documents
    """,
    tags=("dedup", "clustering", "invariant", "extension"),
)
def cluster_consistency_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Externally-verified invariants of `near_dup_clusters` (input pair set
    is hash-seeded → rows-only). Run at iters=6 — double the pipeline
    default — so convergence holds even for chain-shaped clusters (min-label
    propagation covers graph diameter <= iters; LSH near-dup clusters are
    near-cliques, but the CHECK must not inherit that assumption):

    - ``pairs_same_cluster_ok`` — both endpoints of every emitted near-dup
      pair carry the same canonical label (= propagation converged).
    - ``canonical_is_min_ok`` — each cluster's canonical is its minimum
      member id (the documented keep-lowest-id contract drop_near_dups
      relies on).
    - ``labels_cover_pairs_ok`` — every id appearing in a pair received a
      label. ``n_docs`` is the cross-engine hash-compared value.
    """
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_dedup(d, threshold=0.8).transform(_pin)
    labels = dedup.near_dup_clusters(pairs, iters=6)

    la = labels.select(F.col("id").alias("id_a"), F.col("canonical").alias("ca"))
    lb = labels.select(F.col("id").alias("id_b"), F.col("canonical").alias("cb"))
    mismatch = (
        pairs.join(la, "id_a")
        .join(lb, "id_b")
        .agg(
            F.sum(F.when(F.col("ca") != F.col("cb"), 1).otherwise(0))
            .cast("long")
            .alias("n_mismatch")
        )
    )
    not_min = (
        labels.groupBy("canonical")
        .agg(F.min("id").alias("m"))
        .agg(
            F.sum(F.when(F.col("canonical") != F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("n_not_min")
        )
    )
    pair_ids = pairs.select(
        F.explode(F.array("id_a", "id_b")).alias("id")
    ).distinct()
    uncovered = pair_ids.join(labels, "id", "left_anti").agg(
        F.count(F.lit(1)).alias("n_uncovered")
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    z = F.lit(0).cast("long")
    return (
        n_docs.crossJoin(F.broadcast(mismatch))
        .crossJoin(F.broadcast(not_min))
        .crossJoin(F.broadcast(uncovered))
        .select(
            "n_docs",
            (F.coalesce(F.col("n_mismatch"), z) == 0).alias("pairs_same_cluster_ok"),
            (F.coalesce(F.col("n_not_min"), z) == 0).alias("canonical_is_min_ok"),
            (F.coalesce(F.col("n_uncovered"), z) == 0).alias("labels_cover_pairs_ok"),
        )
    )


_CHUNK_TOKENS = 10
_CHUNK_MIN_DOCS = 3

@register(
    "boilerplate_chunk_removal",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE text IS NOT NULL),
    c AS (
      SELECT doc_id, u['pos'] AS pos, u['chunk'] AS chunk FROM (
        SELECT doc_id, unnest(list_transform(
            range(1, CAST(ceil(len(toks) / {_CHUNK_TOKENS}.0) AS BIGINT) + 1),
            i -> {{'pos': i, 'chunk': array_to_string(
                      toks[(i-1)*{_CHUNK_TOKENS}+1:i*{_CHUNK_TOKENS}], ' ')}})) AS u
        FROM t)),
    hot AS (
      SELECT chunk FROM c GROUP BY chunk
      HAVING count(DISTINCT doc_id) >= {_CHUNK_MIN_DOCS}),
    kept AS (
      SELECT c.* FROM c LEFT JOIN hot USING (chunk) WHERE hot.chunk IS NULL),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_kept,
             CAST(coalesce(sum(len(string_split(chunk, ' '))), 0) AS BIGINT)
               AS n_tokens_after,
             md5(array_to_string(list(chunk ORDER BY pos), ' ')) AS clean_fp
      FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(ceil(len(t.toks) / {_CHUNK_TOKENS}.0) AS BIGINT) AS n_chunks,
           CAST(ceil(len(t.toks) / {_CHUNK_TOKENS}.0) AS BIGINT)
             - coalesce(a.n_kept, 0) AS n_removed,
           coalesce(a.n_tokens_after, CAST(0 AS BIGINT)) AS n_tokens_after,
           coalesce(a.clean_fp, md5('')) AS clean_fp
    FROM t LEFT JOIN agg a USING (doc_id)
    """,
    tags=("dedup", "pipeline", "extension"),
)
def boilerplate_chunk_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level boilerplate removal (RefinedWeb/CCNet line-dedup at
    fixed-chunk granularity): chunks shared verbatim by ≥3 documents are
    stripped from every document; per-doc output carries the removal
    accounting plus the md5 of the reassembled text, so the oracle verifies
    CONTENT, order included, not just counts. See
    operators/dedup.remove_boilerplate_chunks for the one-shuffle plan."""
    return dedup.remove_boilerplate_chunks(
        _t(spark, sf_dir, "documents"),
        chunk_tokens=_CHUNK_TOKENS,
        min_docs=_CHUNK_MIN_DOCS,
    )


@register(
    "fuzzy_match_pairs",
    oracle="""
    WITH d AS (
      SELECT doc_id AS id,
             array_to_string(string_split(text, ' ')[1:2], ' ') AS blk,
             left(text, 80) AS pre
      FROM documents WHERE text IS NOT NULL),
    ok AS (
      SELECT blk FROM d GROUP BY blk HAVING count(*) BETWEEN 2 AND 64)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.pre, b.pre) AS INT) AS lev
    FROM d a JOIN ok USING (blk) JOIN d b USING (blk)
    WHERE a.id < b.id AND levenshtein(a.pre, b.pre) <= 25
    """,
    tags=("dedup", "fuzzy", "extension"),
)
def fuzzy_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Levenshtein fuzzy matching: same-first-2-tokens blocking,
    edit distance over the 80-char prefix, pairs at distance ≤ 25 — the
    entity-resolution primitive with the hot-block cap making the in-block
    DP quadratic bounded. Exact → fully oracle-checked. See
    operators/dedup.fuzzy_prefix_pairs."""
    return dedup.fuzzy_prefix_pairs(
        _t(spark, sf_dir, "documents"),
        block_tokens=2,
        prefix_chars=80,
        max_distance=25,
        max_block=64,
    )


@register(
    "fuzzy_dup_components",
    oracle="""
    WITH RECURSIVE p AS (
      WITH d AS (
        SELECT doc_id AS id,
               array_to_string(string_split(text, ' ')[1:2], ' ') AS blk,
               left(text, 80) AS pre
        FROM documents WHERE text IS NOT NULL),
      ok AS (SELECT blk FROM d GROUP BY blk HAVING count(*) BETWEEN 2 AND 64)
      SELECT a.id AS id_a, b.id AS id_b
      FROM d a JOIN ok USING (blk) JOIN d b USING (blk)
      WHERE a.id < b.id AND levenshtein(a.pre, b.pre) <= 25),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM p UNION SELECT id_b, id_a FROM p),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
    comp AS (
      SELECT s AS id, least(s, min(d)) AS component FROM reach GROUP BY s)
    SELECT component, CAST(count(*) AS BIGINT) AS n_members
    FROM comp GROUP BY component
    """,
    tags=("dedup", "graph", "extension"),
)
def fuzzy_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the (deterministic, oracle-exact)
    fuzzy-match pair graph: per component, its min-id label and member
    count. This externally verifies the ITERATIVE fixpoint algorithm
    itself — `operators/graph.connected_components` (join-propagation, no
    driver union-find) against DuckDB's recursive-CTE transitive closure:
    two completely different evaluation strategies must produce identical
    components, every round, on regenerated data."""
    from dampr_spark.operators.graph import connected_components

    pairs = dedup.fuzzy_prefix_pairs(
        _t(spark, sf_dir, "documents"),
        block_tokens=2,
        prefix_chars=80,
        max_distance=25,
        max_block=64,
    )
    comp = connected_components(pairs, src="id_a", dst="id_b")
    return comp.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))


_CONTAIN_TAU = 0.3


@register(
    "ngram_containment_dups",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id AS id,
             unnest(list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS gram
      FROM documents WHERE text IS NOT NULL
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
           round(inter * 1.0 / least(sa.n_grams, sb.n_grams), 6) AS containment
    FROM shared
    JOIN sizes sa ON sa.id = shared.id_a
    JOIN sizes sb ON sb.id = shared.id_b
    WHERE round(inter * 1.0 / least(sa.n_grams, sb.n_grams), 6) >= {_CONTAIN_TAU}
    """,
    tags=("dedup", "containment", "extension"),
)
def ngram_containment_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram CONTAINMENT pairs (|A∩B| / min(|A|,|B|) >= 0.3) —
    Broder's asymmetric twin of `ngram_jaccard_dups`: catches a document
    embedded whole inside a much longer one (quote inclusion,
    chunk-of-document, page-within-crawl), which Jaccard scores near
    |A|/|B| and misses. Same posting-list plan and hot-gram cap; the
    threshold compares the ROUNDED score on both engines."""
    return dedup.ngram_containment_pairs(
        _t(spark, sf_dir, "documents"),
        n=3,
        threshold=_CONTAIN_TAU,
        max_posting=_NGRAM_MAX_POSTING,
    )


@register(
    "dup_graph_degree_stats",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id AS id,
             unnest(list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS gram
      FROM documents WHERE text IS NOT NULL
    ),
    sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n_grams FROM grams GROUP BY id),
    keep AS (
      SELECT gram FROM grams GROUP BY gram
      HAVING count(*) BETWEEN 2 AND {_NGRAM_MAX_POSTING}),
    shared AS (
      SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS inter
      FROM grams a JOIN keep USING (gram) JOIN grams b USING (gram)
      WHERE a.id < b.id
      GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM shared
      JOIN sizes sa ON sa.id = shared.id_a
      JOIN sizes sb ON sb.id = shared.id_b
      WHERE inter / (sa.n_grams + sb.n_grams - inter) >= 0.1),
    sym AS (
      SELECT id_a AS id FROM pairs UNION ALL SELECT id_b FROM pairs),
    deg AS (SELECT id, count(*) AS degree FROM sym GROUP BY id)
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM deg GROUP BY degree
    """,
    tags=("dedup", "graph", "audit", "extension"),
)
def dup_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-dup graph (word-3-gram Jaccard >=
    0.1 pairs) — the skew probe run BEFORE any per-vertex iteration
    (connected components, min-label collapse): a vertex with degree in
    the thousands is a template hub that would stall label propagation
    and should be capped or collapsed via exact dedup first. Reuses the
    oracle-green pair generation, then operators/graph.degrees + one
    histogram aggregate (both degree-keyed scalars)."""
    from dampr_spark.operators.graph import degrees

    pairs = dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        n=3,
        threshold=0.1,
        max_posting=_NGRAM_MAX_POSTING,
    ).select("id_a", "id_b")
    return (
        degrees(pairs, "id_a", "id_b")
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.col("degree").cast("long").alias("degree"), "n_docs")
    )


@register(
    "frame_sample_manifest",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id,
               greatest(n_chars * 10, 1) AS dur
        FROM documents WHERE n_chars IS NOT NULL),
    f AS (
        SELECT media_id, ((dur - 1) // 1000) + 1 AS nf FROM m)
    SELECT media_id,
           CAST(nf AS BIGINT) AS n_frames,
           CAST(1000 * nf * (nf - 1) / 2 AS BIGINT) AS sum_frame_ms,
           TRUE AS features_ok
    FROM f
    """,
    tags=("multimodal", "video", "extension"),
)
def frame_sample_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling PLUMBING, driver-checked end-to-end: documents
    play media clips (duration_ms = 10x n_chars), `multimodal.frame_sample`
    explodes each into one row per 1000 ms offset via mapInPandas (the
    deterministic fake decode in this container; PyAV when present), and
    the manifest verifies the flat-map structure — frame count =
    ceil(duration/1000), offsets sum to the arithmetic series, and every
    frame carries a 16-dim non-null feature vector (the TRUE column is
    recomputed, not assumed). The oracle replays the structure as pure
    duration arithmetic.

    Plan shape at scale: one Arrow flat-map pass (batch rows -> frame
    rows; no shuffle) + a media-keyed aggregate with map-side partials."""
    from dampr_spark.operators import multimodal

    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars").isNotNull())
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.greatest(F.col("n_chars") * 10, F.lit(1)).cast("long").alias("duration_ms"),
    )
    frames = multimodal.frame_sample(media, every_ms=1000, fake=True)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("frame_ms").cast("long").alias("sum_frame_ms"),
        (
            F.sum(
                F.when(
                    F.col("features").isNotNull()
                    & (F.size("features") == multimodal.FEATURE_DIM),
                    1,
                ).otherwise(0)
            )
            == F.count(F.lit(1))
        ).alias("features_ok"),
    )


@register(
    "audio_segments_manifest",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id,
               greatest(n_chars * 10, 1) AS dur,
               octet_length(encode(coalesce(text, ''))) AS nb
        FROM documents WHERE n_chars IS NOT NULL)
    SELECT media_id,
           CAST((dur + 4999) // 5000 AS BIGINT) AS n_segments,
           CAST(nb AS BIGINT) AS total_bytes,
           CAST(dur AS BIGINT) AS covered_ms,
           TRUE AS features_ok
    FROM m
    """,
    tags=("multimodal", "audio", "extension"),
)
def audio_segments_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio segmentation PLUMBING, driver-checked: clips (duration_ms =
    10x n_chars, payload = text bytes) explode into 5000 ms segments via
    `multimodal.audio_segments` (mapInPandas flat-map, deterministic fake
    decode here / PyAV when present); the manifest verifies segment count
    = ceil(duration/5000), the byte slices TILE the payload exactly
    (sum(n_bytes) == payload bytes — the nested floor-division slicing
    loses nothing), the time spans cover the full duration, and every
    segment carries a 16-dim feature vector. The oracle replays the
    structure as pure arithmetic on (n_chars, text bytes)."""
    from dampr_spark.operators import multimodal

    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars").isNotNull())
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.greatest(F.col("n_chars") * 10, F.lit(1)).cast("long").alias("duration_ms"),
    )
    segs = multimodal.audio_segments(media, segment_ms=5000, fake=True)
    return segs.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.sum(F.col("end_ms") - F.col("start_ms")).cast("long").alias("covered_ms"),
        (
            F.sum(
                F.when(
                    F.col("features").isNotNull()
                    & (F.size("features") == multimodal.FEATURE_DIM),
                    1,
                ).otherwise(0)
            )
            == F.count(F.lit(1))
        ).alias("features_ok"),
    )


# ---------------------------------------------------------------------------
# suffix-run substring dedup (round 7)
# ---------------------------------------------------------------------------

# Anchor-window posting cap for the registered substring queries. Same
# convention as _NGRAM_MAX_POSTING: 64 sits far above the corpus's organic
# max posting (3 in the r7 testdata), so on real data the capped result
# equals the uncapped one — the cap exists for the adversarial/boilerplate
# window that would otherwise emit k² diagonal pairs into one task.
_SUBSTR_MAX_POSTING = 64

# Shared oracle prefix: positional 8-token windows -> capped postings ->
# diagonal pairs -> gaps-and-islands runs -> maximal spans >= 20 tokens.
# (unnest(range)/unnest(list_transform) zip positionally in DuckDB — the
# lateral generate_series form does not accept column arguments.)
_SPANS_CTE = f"""
WITH toks AS (
  SELECT doc_id AS id, string_split(text, ' ') AS t
  FROM documents WHERE text IS NOT NULL),
pos AS (
  SELECT id,
    unnest(range(1, greatest(len(t)-7, 0)+1)) AS i,
    unnest(list_transform(range(1, greatest(len(t)-7, 0)+1),
                          i -> array_to_string(t[i:i+7], ' '))) AS gram
  FROM toks),
keep AS (
  SELECT gram FROM pos GROUP BY gram
  HAVING count(*) BETWEEN 2 AND {_SUBSTR_MAX_POSTING}),
pairs AS (
  SELECT a.id AS id_a, a.i AS pa, b.id AS id_b, b.i - a.i AS off
  FROM pos a JOIN keep USING (gram) JOIN pos b USING (gram)
  WHERE a.id < b.id),
runs AS (
  SELECT id_a, id_b, off, pa,
         pa - row_number() OVER (PARTITION BY id_a, id_b, off ORDER BY pa) AS isl
  FROM pairs),
spans AS (
  SELECT id_a, min(pa) AS start_a, id_b, min(pa) + off AS start_b,
         count(*) + 7 AS match_len
  FROM runs GROUP BY id_a, id_b, off, isl
  HAVING count(*) + 7 >= 20)
"""


@register(
    "repeated_substrings",
    oracle=_SPANS_CTE
    + """
SELECT id_a, CAST(start_a AS BIGINT) AS start_a, id_b,
       CAST(start_b AS BIGINT) AS start_b, CAST(match_len AS BIGINT) AS match_len
FROM spans
""",
    tags=("dedup", "substring", "extension"),
)
def repeated_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document repeated substrings ≥ 20 tokens (Lee et al.
    suffix-array dedup, re-expressed as the distributed suffix-run plan:
    positional 8-token anchors → capped posting lists → diagonal-keyed
    gaps-and-islands runs). Exact — a 93-token planted run comes back as
    one (start_a, start_b, 93) span, fully oracle-checked. The registered
    form shuffles anchor STRINGS for oracle parity; at corpus scale pass
    hash_anchors=True and the same plan shuffles 8-byte xxhash64 keys."""
    return dedup.repeated_substring_spans(
        _t(spark, sf_dir, "documents"),
        anchor_tokens=8,
        min_len=20,
        max_posting=_SUBSTR_MAX_POSTING,
    )


@register(
    "substring_dedup_report",
    oracle=_SPANS_CTE
    + """
, sides AS (
  SELECT id_a AS id, id_b AS partner, start_a AS s,
         start_a + match_len - 1 AS e, match_len FROM spans
  UNION ALL
  SELECT id_b AS id, id_a AS partner, start_b AS s,
         start_b + match_len - 1 AS e, match_len FROM spans),
isl AS (
  SELECT id, s, e,
    sum(CASE WHEN prev_e IS NULL OR s > prev_e THEN 1 ELSE 0 END)
      OVER (PARTITION BY id ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  -- DISTINCT first: duplicate (s,e) intervals would make the (s,e) order
  -- non-total and the two window passes could tie-break differently,
  -- splitting an island (operators/dedup.py:_interval_union_tokens)
  FROM (SELECT id, s, e,
          max(e) OVER (PARTITION BY id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
        FROM (SELECT DISTINCT id, s, e FROM sides))),
cov AS (
  SELECT id, CAST(sum(covered) AS BIGINT) AS dup_tokens
  FROM (SELECT id, g, max(e) - min(s) + 1 AS covered FROM isl GROUP BY id, g)
  GROUP BY id),
stats AS (
  SELECT id, CAST(count(DISTINCT partner) AS BIGINT) AS n_partners,
         CAST(max(match_len) AS BIGINT) AS max_match_len
  FROM sides GROUP BY id),
tc AS (
  SELECT doc_id AS id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL)
SELECT stats.id AS doc_id, n_partners, max_match_len, dup_tokens, n_tokens,
       round(dup_tokens / n_tokens, 6) AS dup_frac
FROM stats JOIN cov ON stats.id = cov.id JOIN tc ON stats.id = tc.id
""",
    tags=("dedup", "substring", "curation", "extension"),
)
def substring_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document verbatim-sharing exposure: for every doc touched by a
    ≥20-token cross-doc span, the partner count, longest span, and the
    UNION of its span intervals as a token count + fraction (overlapping
    spans counted once — interval merge via gaps-and-islands). The curation
    gate form: "drop docs with dup_frac > X" reads straight off this."""
    return dedup.substring_dedup_report(
        _t(spark, sf_dir, "documents"),
        anchor_tokens=8,
        min_len=20,
        max_posting=_SUBSTR_MAX_POSTING,
    )


@register(
    "substring_posting_audit",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id AS id, string_split(text, ' ') AS t
      FROM documents WHERE text IS NOT NULL),
    pos AS (
      SELECT id,
        unnest(range(1, greatest(len(t)-7, 0)+1)) AS i,
        unnest(list_transform(range(1, greatest(len(t)-7, 0)+1),
                              i -> array_to_string(t[i:i+7], ' '))) AS gram
      FROM toks),
    c AS (SELECT gram, CAST(count(*) AS BIGINT) AS n FROM pos GROUP BY gram)
    SELECT CAST(sum(n) AS BIGINT) AS anchor_positions,
           CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS anchors_ge2,
           CAST(max(n) AS BIGINT) AS max_posting_sz,
           CAST(sum(CASE WHEN n > {_SUBSTR_MAX_POSTING} THEN 1 ELSE 0 END)
                AS BIGINT) AS anchors_over_cap,
           CAST(sum(CASE WHEN n > {_SUBSTR_MAX_POSTING} THEN n ELSE 0 END)
                AS BIGINT) AS positions_over_cap,
           CAST(sum(n * (n - 1) // 2) AS BIGINT) AS raw_pairs,
           CAST(sum(CASE WHEN n <= {_SUBSTR_MAX_POSTING}
                         THEN n * (n - 1) // 2 ELSE 0 END) AS BIGINT)
             AS capped_pairs,
           CAST(sum(n * (n - 1) // 2)
                - sum(CASE WHEN n <= {_SUBSTR_MAX_POSTING}
                           THEN n * (n - 1) // 2 ELSE 0 END) AS BIGINT)
             AS pairs_dropped
    FROM c
    """,
    tags=("dedup", "substring", "skew", "audit", "extension"),
)
def substring_posting_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The substring family's sizing instrument: price the suffix-run
    posting stage (`repeated_substrings` / `substring_dedup_report` /
    `substring_trim_dedup` — positional 8-token anchors, occurrence cap
    64 = _SUBSTR_MAX_POSTING) from ONE anchor pass, before any diagonal pair
    forms. Columns: posting-shuffle volume (anchor_positions), occupancy
    (anchors_ge2 / max_posting_sz), the cap's dropped mass
    (anchors_over_cap / positions_over_cap — recall silently lost to
    boilerplate windows), and the diagonal-pair budget raw vs capped.
    Pair arithmetic shared with the banded-LSH audit
    (operators/dedup.band_occupancy_stats — exact integer div)."""
    return dedup.substring_posting_audit(
        _t(spark, sf_dir, "documents"),
        anchor_tokens=8,
        max_posting=_SUBSTR_MAX_POSTING,
    )


@register(
    "duplicate_ngram_coverage",
    oracle="""
WITH toks AS (
  SELECT doc_id AS id, string_split(text, ' ') AS t
  FROM documents WHERE text IS NOT NULL),
pos AS (
  SELECT id,
    unnest(range(1, greatest(len(t)-2, 0)+1)) AS i,
    unnest(list_transform(range(1, greatest(len(t)-2, 0)+1),
                          i -> array_to_string(t[i:i+2], ' '))) AS gram
  FROM toks),
dup AS (
  SELECT id, i AS s, i + 2 AS e FROM pos
  QUALIFY count(*) OVER (PARTITION BY id, gram) >= 2),
isl AS (
  SELECT id, s, e,
    sum(CASE WHEN prev_e IS NULL OR s > prev_e THEN 1 ELSE 0 END)
      OVER (PARTITION BY id ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM (SELECT id, s, e,
          max(e) OVER (PARTITION BY id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
        FROM (SELECT DISTINCT id, s, e FROM dup))),
cov AS (
  SELECT id, CAST(sum(covered) AS BIGINT) AS dup_tokens
  FROM (SELECT id, g, max(e) - min(s) + 1 AS covered FROM isl GROUP BY id, g)
  GROUP BY id),
tc AS (
  SELECT doc_id AS id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL)
SELECT tc.id AS doc_id, n_tokens, CAST(COALESCE(dup_tokens, 0) AS BIGINT) AS dup_tokens,
       round(COALESCE(dup_tokens, 0) / greatest(n_tokens, 1), 6) AS dup_frac
FROM tc LEFT JOIN cov ON tc.id = cov.id
""",
    tags=("dedup", "quality", "extension"),
)
def duplicate_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style WITHIN-document duplication score for every doc: the
    fraction of tokens covered by word 3-grams occurring more than once in
    the same document (interval-union coverage, clean docs score 0.0).
    Catches looping/degenerate text that cross-doc dedup cannot see."""
    return dedup.duplicate_ngram_coverage(_t(spark, sf_dir, "documents"), n=3)


@register(
    "substring_trim_dedup",
    oracle=_SPANS_CTE
    + """
, cuts0 AS (
  SELECT id_b AS id, start_b AS s, start_b + match_len - 1 AS e FROM spans),
merged AS (
  SELECT id, g, min(s) AS ms, max(e) AS me FROM (
    SELECT id, s, e,
      sum(CASE WHEN prev_e IS NULL OR s > prev_e THEN 1 ELSE 0 END)
        OVER (PARTITION BY id ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
    FROM (SELECT id, s, e,
            max(e) OVER (PARTITION BY id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
          FROM (SELECT DISTINCT id, s, e FROM cuts0)))
  GROUP BY id, g),
tokpos AS (
  SELECT id, unnest(range(1, len(t)+1)) AS i, unnest(t) AS tok FROM toks),
kept AS (
  SELECT p.id, CAST(count(*) AS BIGINT) AS n_after,
         string_agg(p.tok, ' ' ORDER BY p.i) AS new_text
  FROM tokpos p
  WHERE NOT EXISTS (
    SELECT 1 FROM merged m WHERE m.id = p.id AND p.i BETWEEN m.ms AND m.me)
  GROUP BY p.id)
SELECT toks.id AS doc_id,
       CAST(len(toks.t) AS BIGINT) AS n_tokens_before,
       COALESCE(kept.n_after, 0) AS n_tokens_after,
       COALESCE(kept.new_text, '') AS text
FROM toks LEFT JOIN kept ON toks.id = kept.id
""",
    tags=("dedup", "substring", "curation", "extension"),
)
def substring_trim_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The substring-dedup ACTION (Lee et al. ExactSubstr keep-first):
    every ≥20-token repeated span keeps only its lowest-doc_id occurrence;
    later docs get that span CUT (interval-merged, then a JVM token-filter
    expression rebuilds the text — no corpus explode on the rebuild side).
    The oracle hash-compares the FULL rebuilt text of all 500 docs, so the
    cut positions must match token-for-token across engines."""
    return dedup.trim_repeated_spans(
        _t(spark, sf_dir, "documents"),
        anchor_tokens=8,
        min_len=20,
        max_posting=_SUBSTR_MAX_POSTING,
    )


@register(
    "self_repetition_trim",
    oracle=f"""
WITH toks AS (
  SELECT doc_id AS id, string_split(text, ' ') AS t
  FROM documents WHERE text IS NOT NULL),
pos AS (
  SELECT id,
    unnest(range(1, greatest(len(t)-2, 0)+1)) AS i,
    unnest(list_transform(range(1, greatest(len(t)-2, 0)+1),
                          i -> array_to_string(t[i:i+2], ' '))) AS gram
  FROM toks),
keep AS (
  SELECT gram FROM pos GROUP BY gram
  HAVING count(*) BETWEEN 2 AND {_SUBSTR_MAX_POSTING}),
pairs AS (
  SELECT a.id AS id, a.i AS pa, b.i - a.i AS off
  FROM pos a JOIN keep USING (gram) JOIN pos b USING (gram)
  WHERE a.id = b.id AND a.i < b.i),
runs AS (
  SELECT id, off, pa,
         pa - row_number() OVER (PARTITION BY id, off ORDER BY pa) AS isl
  FROM pairs),
spans AS (
  SELECT id, min(pa) + off AS start_b, count(*) + 2 AS match_len
  FROM runs GROUP BY id, off, isl),
cuts0 AS (
  SELECT id, start_b AS s, start_b + match_len - 1 AS e FROM spans),
merged AS (
  SELECT id, g, min(s) AS ms, max(e) AS me FROM (
    SELECT id, s, e,
      sum(CASE WHEN prev_e IS NULL OR s > prev_e THEN 1 ELSE 0 END)
        OVER (PARTITION BY id ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
    FROM (SELECT id, s, e,
            max(e) OVER (PARTITION BY id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
          FROM (SELECT DISTINCT id, s, e FROM cuts0)))
  GROUP BY id, g),
tokpos AS (
  SELECT id, unnest(range(1, len(t)+1)) AS i, unnest(t) AS tok FROM toks),
kept AS (
  SELECT p.id, CAST(count(*) AS BIGINT) AS n_after,
         string_agg(p.tok, ' ' ORDER BY p.i) AS new_text
  FROM tokpos p
  WHERE NOT EXISTS (
    SELECT 1 FROM merged m WHERE m.id = p.id AND p.i BETWEEN m.ms AND m.me)
  GROUP BY p.id)
SELECT toks.id AS doc_id,
       CAST(len(toks.t) AS BIGINT) AS n_tokens_before,
       COALESCE(kept.n_after, 0) AS n_tokens_after,
       COALESCE(kept.new_text, '') AS text
FROM toks LEFT JOIN kept ON toks.id = kept.id
""",
    tags=("dedup", "substring", "quality", "curation", "extension"),
)
def self_repetition_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repetition trimming — the ACTION form of the Gopher
    duplication score: every repeated run of ≥ 3 tokens inside one doc
    keeps only its first occurrence (periodic/looping text collapses to a
    single period). Same suffix-run machinery on the within-doc diagonal
    (3-token anchors so short loops are caught); the oracle hash-compares
    the full rebuilt text of all 500 docs."""
    return dedup.trim_repeated_spans(
        _t(spark, sf_dir, "documents"),
        anchor_tokens=3,
        min_len=3,
        max_posting=_SUBSTR_MAX_POSTING,
        within_doc=True,
    )


@register(
    "near_dedup_keep_best",
    oracle=f"""
WITH RECURSIVE grams AS (
  SELECT doc_id AS id,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
             i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS gram
  FROM documents WHERE text IS NOT NULL),
sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n_grams FROM grams GROUP BY id),
keep AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING count(*) BETWEEN 2 AND {_NGRAM_MAX_POSTING}),
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
q AS (
  SELECT doc_id AS id, {T.quality_score_sql('text')} AS q
  FROM documents WHERE text IS NOT NULL),
winners AS (
  SELECT canonical, id AS keep_id FROM (
    SELECT comp.canonical, comp.id,
           row_number() OVER (PARTITION BY comp.canonical
                              ORDER BY q.q DESC, comp.id) AS rn
    FROM comp JOIN q USING (id)) WHERE rn = 1),
losers AS (
  SELECT comp.id FROM comp JOIN winners USING (canonical)
  WHERE comp.id <> winners.keep_id)
SELECT d.doc_id, d.source, round({T.quality_score_sql('d.text')}, 6) AS quality
FROM documents d
WHERE d.text IS NOT NULL
  AND d.doc_id NOT IN (SELECT id FROM losers)
""",
    tags=("dedup", "curation", "graph", "extension"),
)
def near_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware NEAR-dup collapse, fully oracle-checked end-to-end:
    exact 3-gram-Jaccard pairs (the oracle-green `ngram_jaccard_dups`
    graph) → min-label components run to FIXPOINT (``iters="converge"``
    — exact vs DuckDB's recursive-CTE closure at ANY chain depth; the
    old fixed iters=3 silently diverged on components deeper than 3
    hops, ADVICE r12) → per-cluster keep-best by the codegen quality
    score (max_by, no window) → anti-join. The near-dup twin of `exact_dedup_keep_best`:
    of several mangled crawl copies, the cleanest survives — min-id keep
    is arbitrary."""
    from dampr_spark.functions.text import quality_score

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    pairs = dedup.ngram_jaccard_pairs(
        d, n=3, threshold=0.1, max_posting=_NGRAM_MAX_POSTING
    ).select("id_a", "id_b")
    out = dedup.drop_near_dups_keep_best(
        d, pairs, quality_score("text"), iters="converge"
    )  # converge: matches the oracle's recursive closure at any depth
    return out.select(
        "doc_id", "source", F.round(quality_score("text"), 6).alias("quality")
    )


@register(
    "dup_graph_triangles",
    oracle="""
    WITH d AS (
        SELECT doc_id AS id,
               array_to_string(string_split(text, ' ')[1:2], ' ') AS blk,
               left(text, 80) AS pre
        FROM documents WHERE text IS NOT NULL),
    ok AS (SELECT blk FROM d GROUP BY blk HAVING count(*) BETWEEN 2 AND 64),
    e AS (
        SELECT DISTINCT a.id AS lo, b.id AS hi
        FROM d a JOIN ok USING (blk) JOIN d b USING (blk)
        WHERE a.id < b.id AND levenshtein(a.pre, b.pre) <= 25),
    w AS (
        SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
        FROM e e1 JOIN e e2 ON e1.lo = e2.lo AND e1.hi < e2.hi),
    t AS (SELECT a, b, c FROM w JOIN e ON e.lo = w.b AND e.hi = w.c),
    corners AS (
        SELECT a AS id FROM t
        UNION ALL SELECT b FROM t
        UNION ALL SELECT c FROM t)
    SELECT id, CAST(count(*) AS BIGINT) AS triangles
    FROM corners GROUP BY id
    """,
    tags=("dedup", "graph", "extension"),
)
def dup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle participation over the fuzzy-duplicate pair
    graph — the clustering-coefficient numerator. Triangle density is the
    standard near-clique audit for LSH/fuzzy dup graphs: true duplicate
    groups triangulate heavily, chains of borderline matches don't, so a
    curator reading this knows whether transitive collapse
    (fuzzy_dup_components) is safe or will over-merge.

    Externally verifies `operators/graph.triangle_counts` — the wedge-join
    MapReduce shape (canonicalize lo<hi, wedge at the min corner, probe the
    closing edge; every triangle found exactly once) — against DuckDB's
    direct three-way self-join. Exact integer counts, no float tolerance.

    Plan shape for 100 TB: the pair graph is the expensive input (bounded
    by the fuzzy blocker's per-block cap); the triangle pass is three
    |E|-keyed hash joins, skew-capped by the same blocker. Per-vertex
    credit is a union + one aggregate."""
    from dampr_spark.operators.graph import triangle_counts

    pairs = dedup.fuzzy_prefix_pairs(
        _t(spark, sf_dir, "documents"),
        block_tokens=2,
        prefix_chars=80,
        max_distance=25,
        max_block=64,
    )
    return triangle_counts(pairs, src="id_a", dst="id_b")


_KCORE_ROUNDS = 8


_KCORE_PAIRS_SQL = """
    WITH d AS (
        SELECT doc_id AS id,
               array_to_string(string_split(text, ' ')[1:2], ' ') AS blk,
               left(text, 80) AS pre
        FROM documents WHERE text IS NOT NULL),
    ok AS (SELECT blk FROM d GROUP BY blk HAVING count(*) BETWEEN 2 AND 64)
    SELECT a.id AS id_a, b.id AS id_b
    FROM d a JOIN ok USING (blk) JOIN d b USING (blk)
    WHERE a.id < b.id AND levenshtein(a.pre, b.pre) <= 25"""


def _kcore_oracle_sql(k: int, rounds: int, pairs_sql: str = _KCORE_PAIRS_SQL) -> str:
    """Unroll the synchronous Matula–Beck peel as chained CTEs — the
    `_lpa_oracle_sql` pattern. Each live{t} holds the FULL live vertex set
    after round t: the vertices whose degree among live{t-1} is ≥ k. This
    carries complete state across rounds (a recursive-CTE `NOT IN removed`
    formulation cannot: the recursive term only sees the previous
    iteration's rows, so removals from non-consecutive rounds leak back
    into degree counts). At fixpoint live{t} = live{t-1}, so every extra
    unrolled round is idempotent — `rounds` only needs to EXCEED the
    graph's peel depth (measured: 1 shrinking round at sf0.01 and sf0.1;
    8 gives 7 rounds of margin at negligible DuckDB cost).

    ``pairs_sql`` must yield (id_a, id_b) undirected pair rows; the
    default is the fuzzy-prefix dup-pair generation over `documents`.
    Tests swap in an adversarial in-memory graph to pin this exact
    generated SQL against the Spark peel."""
    # Every live{t} is referenced 2-3 times (both sides of the next round's
    # degree join, plus the fixpoint probe on the last two) — MATERIALIZED
    # stops DuckDB from inlining the chain, which would duplicate the
    # pair-generation subplan exponentially in `rounds` (observed: fd
    # exhaustion from hundreds of cloned parquet scans at rounds=8).
    parts = [
        f"""
    WITH p AS MATERIALIZED ({pairs_sql}),
    sym AS MATERIALIZED (
        SELECT id_a AS s, id_b AS d FROM p UNION SELECT id_b, id_a FROM p),
    live0 AS MATERIALIZED (SELECT DISTINCT s AS id FROM sym)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(f""",
    live{t} AS MATERIALIZED (
        SELECT e.s AS id FROM sym e
        JOIN live{t - 1} a ON a.id = e.s
        JOIN live{t - 1} b ON b.id = e.d
        GROUP BY e.s HAVING count(*) >= {k})""")
    # Fixpoint guard: if live{rounds} still shrank vs live{rounds-1}, the
    # unroll depth was too shallow — fail LOUDLY as "oracle unconverged"
    # (a runtime cast error naming the cause) instead of surfacing as a
    # mysterious plan-vs-oracle hash mismatch. The cast's input is a column
    # of the probe row (not a literal), so DuckDB cannot constant-fold it;
    # when the counts agree the probe row is filtered out and the cast
    # never evaluates.
    parts.append(f""",
    fixpoint AS (
        SELECT (SELECT count(*) FROM live{rounds}) AS n_last,
               (SELECT count(*) FROM live{rounds - 1}) AS n_prev)
    SELECT e.s AS doc_id, CAST(count(*) AS BIGINT) AS core_degree
    FROM sym e
    JOIN live{rounds} a ON a.id = e.s
    JOIN live{rounds} b ON b.id = e.d
    GROUP BY e.s
    UNION ALL
    SELECT CAST('kcore ORACLE UNCONVERGED at rounds={rounds}; raise '
                '_KCORE_ROUNDS (live shrank ' || CAST(n_prev AS VARCHAR)
                || '->' || CAST(n_last AS VARCHAR) || ')' AS BIGINT),
           CAST(-1 AS BIGINT)
    FROM fixpoint WHERE n_last <> n_prev
    """)
    return "".join(parts)


@register(
    "dup_graph_kcore",
    oracle=_kcore_oracle_sql(2, _KCORE_ROUNDS),
    tags=("dedup", "graph", "kcore", "extension"),
)
def dup_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 2-CORE of the fuzzy-duplicate pair graph — documents whose
    duplicate neighborhood is cyclically redundant (each with its degree
    within the core). This is the template-family separator that
    components and triangles both miss half of: a chain A~B~C and a
    triangle are one component either way, and a vertex can triangulate
    zero times yet still sit in a dense 2-core cycle; the k-core peel
    (operators/graph.kcore — synchronous Matula–Beck peel to fixpoint,
    confluent so drop order is irrelevant) keeps exactly the subgraph
    where every member has ≥ k surviving duplicate partners. A curator
    reads the 2-core as "safe to transitively collapse"; peeled chain
    links are the borderline matches worth human review.

    Externally verifies the ITERATIVE peel against a DuckDB oracle that
    UNROLLS the synchronous peel as chained CTEs, each carrying the full
    live vertex set (the `_lpa_oracle_sql` pattern) — two different
    fixpoint evaluation strategies, one answer. Unrolled rather than a
    recursive CTE because standard recursive-CTE semantics give the
    recursive term only the PREVIOUS iteration's rows, so a `NOT IN
    removed` formulation silently forgets removals from non-consecutive
    rounds; extra unrolled rounds past fixpoint are idempotent, so the
    depth only needs to exceed the peel depth. Exact integer degrees, no
    tolerance.

    Plan shape for 100 TB: per peel round one degree aggregate + two
    anti-joins over the live edge list, state checkpointed per round —
    O(rounds × |E|) traffic with rounds bounded by the graph's degeneracy
    depth (tiny on capped dup graphs)."""
    from dampr_spark.operators.graph import kcore

    pairs = dedup.fuzzy_prefix_pairs(
        _t(spark, sf_dir, "documents"),
        block_tokens=2,
        prefix_chars=80,
        max_distance=25,
        max_block=64,
    )
    return kcore(pairs, k=2, src="id_a", dst="id_b").select(
        F.col("id").alias("doc_id"), "core_degree"
    )


_LPA_ITERS = 3


def _lpa_oracle_sql(iters: int) -> str:
    """Unroll synchronous label propagation as chained CTEs — each l{t}
    reproduces operators/graph.label_propagation's update EXACTLY (most
    frequent label among neighbors PLUS the vertex's own — the
    self-preference variant — ties to the smallest). Pure integer
    arithmetic: no rounding discipline needed at all."""
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(f""",
    l{t} AS (
        SELECT l.id, coalesce(b.lab, l.lab) AS lab
        FROM l{t - 1} l LEFT JOIN (
            SELECT src, lab FROM (
                SELECT v.src, v.lab, count(*) AS n,
                       row_number() OVER (PARTITION BY v.src
                                          ORDER BY count(*) DESC, v.lab) AS rn
                FROM (SELECT e.src, p.lab
                      FROM ed e JOIN l{t - 1} p ON p.id = e.dst
                      UNION ALL
                      SELECT id AS src, lab FROM l{t - 1}) v(src, lab)
                GROUP BY v.src, v.lab)
            WHERE rn = 1) b ON b.src = l.id)""")
    return f"""
    WITH d AS (
        SELECT doc_id AS id,
               array_to_string(string_split(text, ' ')[1:2], ' ') AS blk,
               left(text, 80) AS pre
        FROM documents WHERE text IS NOT NULL),
    ok AS (SELECT blk FROM d GROUP BY blk HAVING count(*) BETWEEN 2 AND 64),
    pe AS (
        SELECT DISTINCT a.id AS lo, b.id AS hi
        FROM d a JOIN ok USING (blk) JOIN d b USING (blk)
        WHERE a.id < b.id AND levenshtein(a.pre, b.pre) <= 25),
    ed AS (SELECT lo AS src, hi AS dst FROM pe
           UNION ALL SELECT hi, lo FROM pe),
    l0 AS (SELECT DISTINCT src AS id, src AS lab FROM ed){"".join(rounds)}
    SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_members
    FROM l{iters} GROUP BY lab
    """


@register(
    "dup_graph_communities",
    oracle=_lpa_oracle_sql(_LPA_ITERS),
    tags=("dedup", "graph", "extension"),
)
def dup_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities over the fuzzy-duplicate pair graph:
    per community, its label and member count after 3 synchronous LPA
    rounds. The third iterative graph algorithm externally verified
    against an unrolled-CTE DuckDB oracle (after `fuzzy_dup_components`'s
    fixpoint CC and `textrank_keywords`' PageRank) — and the easiest of
    the three to trust: the update is PURE integer arithmetic (neighbor
    label counts, ties to the smallest label), so there is no rounding
    discipline at all, just two evaluation strategies that must agree
    exactly. On near-clique dup graphs LPA and CC agree; where they
    differ, LPA is the finer cut (it won't chain borderline matches
    through a weak bridge — compare against `dup_graph_triangles`' density
    audit)."""
    from dampr_spark.operators.graph import label_propagation

    pairs = dedup.fuzzy_prefix_pairs(
        _t(spark, sf_dir, "documents"),
        block_tokens=2,
        prefix_chars=80,
        max_distance=25,
        max_block=64,
    )
    labels = label_propagation(pairs, src="id_a", dst="id_b", iters=_LPA_ITERS)
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


@register(
    "dup_canonical_distance_histogram",
    oracle="""
    WITH RECURSIVE d AS (
        SELECT doc_id AS id,
               array_to_string(string_split(text, ' ')[1:2], ' ') AS blk,
               left(text, 80) AS pre
        FROM documents WHERE text IS NOT NULL),
    ok AS (SELECT blk FROM d GROUP BY blk HAVING count(*) BETWEEN 2 AND 64),
    pe AS (
        SELECT DISTINCT a.id AS lo, b.id AS hi
        FROM d a JOIN ok USING (blk) JOIN d b USING (blk)
        WHERE a.id < b.id AND levenshtein(a.pre, b.pre) <= 25),
    ed AS (SELECT lo AS src, hi AS dst FROM pe
           UNION ALL SELECT hi, lo FROM pe),
    reach(s, t) AS (
        SELECT src, dst FROM ed
        UNION
        SELECT r.s, e.dst FROM reach r JOIN ed e ON r.t = e.src),
    comp AS (SELECT s AS id, least(s, min(t)) AS canonical
             FROM reach GROUP BY s),
    roots AS (SELECT DISTINCT canonical AS id FROM comp),
    walk(id, dist) AS (
        SELECT id, 0 FROM roots
        UNION
        SELECT e.dst, w.dist + 1
        FROM walk w JOIN ed e ON e.src = w.id
        WHERE w.dist < 100),
    best AS (SELECT id, min(dist) AS dist FROM walk GROUP BY id)
    SELECT dist, CAST(count(*) AS BIGINT) AS n_docs
    FROM best GROUP BY dist
    """,
    tags=("dedup", "graph", "extension"),
)
def dup_canonical_distance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How far duplicate-graph members sit from their canonical doc:
    multi-source BFS (operators/graph.bfs_distances) seeded at every
    component's min-id canonical, reported as a hop-distance histogram.
    dist=1 members matched the canonical directly; dist≥2 members are
    TRANSITIVE merges that never directly matched it — the count a
    curator checks before trusting component-collapse dedup (large
    dist mass = chain-merging, compare `dup_graph_communities`).

    The FIFTH iterative graph algorithm externally verified here (CC
    fixpoint, PageRank, LPA, triangles, now SSSP): the join-relaxation
    loop vs DuckDB's recursive-CTE walk — pure integer hops, exact
    comparison. Seeds come from the CC pass, so the query exercises two
    chained fixpoint algorithms end-to-end."""
    from dampr_spark.operators.graph import bfs_distances, connected_components

    pairs = dedup.fuzzy_prefix_pairs(
        _t(spark, sf_dir, "documents"),
        block_tokens=2,
        prefix_chars=80,
        max_distance=25,
        max_block=64,
    ).transform(_pin)  # feeds CC and the BFS relaxation
    comp = connected_components(pairs, src="id_a", dst="id_b")
    roots = comp.select(F.col("component")).distinct()
    dists = bfs_distances(pairs, roots, src="id_a", dst="id_b")
    return dists.groupBy("dist").agg(F.count(F.lit(1)).alias("n_docs"))


# ---------------------------------------------------------------------------
# Prefix-filtered exact Jaccard (round 7)
# ---------------------------------------------------------------------------


@register(
    "prefix_jaccard_dups",
    oracle="""
    WITH grams AS (
      SELECT doc_id AS id,
             unnest(list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS gram
      FROM documents WHERE text IS NOT NULL
    ),
    sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n_grams FROM grams GROUP BY id),
    shared AS (
      SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS inter
      FROM grams a JOIN grams b USING (gram)
      WHERE a.id < b.id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(inter / (sa.n_grams + sb.n_grams - inter), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.id = shared.id_a
    JOIN sizes sb ON sb.id = shared.id_b
    WHERE round(inter / (sa.n_grams + sb.n_grams - inter), 6) >= 0.5
    """,
    tags=("dedup", "extension"),
)
def prefix_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard ≥ 0.5 pairs via PPJoin-style prefix
    filtering (operators/dedup.prefix_filtered_jaccard_pairs) — the
    LOSSLESS alternative to `ngram_jaccard_dups`'s hot-gram cap: docs
    only pair when they collide on a gram inside their rarest-first
    prefix (|X| − ⌈t|X|⌉ + 1 grams), which a Jaccard ≥ t pair provably
    must, so the oracle is the full UNCAPPED exact pair set — no recall
    trade anywhere. The stopword grams that force caps in the plain
    posting join fall outside every doc's prefix and never generate a
    candidate. Verification is one array_intersect per surviving
    candidate."""
    return dedup.prefix_filtered_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.5
    )


@register(
    "sorted_neighborhood_dups",
    oracle="""
    WITH d AS (
      SELECT doc_id AS id, substr(text, 1, 40) AS key,
             substr(text, 1, 80) AS pfx
      FROM documents WHERE text IS NOT NULL),
    r AS (SELECT id, pfx, row_number() OVER (ORDER BY key, id) AS rn FROM d),
    c AS (
      SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
             levenshtein(a.pfx, b.pfx) AS lev
      FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3)
    SELECT id_a, id_b, CAST(lev AS INT) AS lev
    FROM c WHERE lev <= 25
    """,
    tags=("dedup", "fuzzy", "extension"),
)
def sorted_neighborhood_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood fuzzy dedup
    (operators/dedup.sorted_neighborhood_pairs): sort by the first-40-char
    key, Levenshtein-verify each doc against its next 3 neighbors — the
    skew-immune complement of `fuzzy_match_pairs`' hash blocking (every
    record scores exactly ≤ window successors; no block can explode, no
    hot-block cap, no recall trade from one). Distributed with the exact
    global-rank recovery recipe (range sort + broadcast partition
    offsets + successor-rank equi-join), so the plan is bit-identical to
    the oracle's single window without any single-task sort."""
    return dedup.sorted_neighborhood_pairs(
        _t(spark, sf_dir, "documents"),
        key_chars=40,
        window=3,
        prefix_chars=80,
        max_distance=25,
    )


_LSH_BAND_AUDIT_ORACLE = """
WITH floor_t AS (
  SELECT CAST(COALESCE(SUM((g * (g - 1)) // 2), 0) AS BIGINT) AS fl
  FROM (SELECT count(*) AS g FROM documents
        WHERE text IS NOT NULL GROUP BY text) t
  WHERE g >= 2),
nd AS (SELECT CAST(count(*) AS BIGINT)    AS all_docs,
              CAST(count(text) AS BIGINT) AS nonnull_docs FROM documents),
cfg(family, bands, band_width) AS (
  VALUES ('minhash', 8, 8), ('minhash', 16, 4), ('minhash', 32, 2),
         ('simhash', 4, 16), ('simhash', 4, 24))
SELECT family,
       CAST(bands AS BIGINT)      AS bands,
       CAST(band_width AS BIGINT) AS band_width,
       CASE WHEN family = 'minhash' THEN all_docs ELSE nonnull_docs END
           AS n_docs,
       fl                         AS exdup_pair_floor,
       TRUE                       AS raw_ge_floor_ok,
       TRUE                       AS capped_le_raw_ok
FROM cfg, floor_t, nd
ORDER BY family, bands, band_width
"""


@register(
    "lsh_band_audit",
    oracle=_LSH_BAND_AUDIT_ORACLE,
    tags=("dedup", "invariant", "audit", "extension"),
)
def lsh_band_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine contract of `operators/dedup.lsh_band_audit` — the
    banding sizing instrument (VERDICT r9 #3: the minhash/simhash twin of
    `grid_resolution_audit`, pricing per-config bucket occupancy and the
    `max_bucket` cap's dropped pair/doc mass BEFORE the pair join runs).

    The audit's occupancy numbers are xxhash-dependent (deterministic but
    not SQL-expressible), so the externally hash-compared columns are the
    quantities BOTH engines derive independently, following
    `minhash_audit_check`'s invariant-companion pattern:

    - ``n_docs`` — Spark emits the audit's OWN band-row conservation
      quotient (Σ bucket sizes ÷ bands); DuckDB emits plain doc counts
      (all docs for minhash — NULL text still gets a sentinel signature;
      non-NULL for both simhash geometries, whose banding drops NULL
      fingerprints). A lost or duplicated band row anywhere in the
      explode/groupBy breaks the hash compare for real. Since round 11
      the instrument prices TWO simhash geometries side by side — the
      default 4x16 and the wider 4x24 (bits=96) remedy for the 16-bit
      pigeonhole floor — so the re-geometry decision is driver-checked,
      not just unit-tested.
    - ``exdup_pair_floor`` — Σ C(g,2) over identical-(non-NULL)-text
      groups, recomputed from raw text on both sides: identical text ⇒
      identical signature ⇒ same bucket in EVERY band.
    - ``raw_ge_floor_ok`` — each config's raw pair budget ≥ bands × the
      floor (the pigeonhole lower bound the banding can never undercut).
    - ``capped_le_raw_ok`` — the cap only removes budget.

    The full instrument (occupancy, over-cap mass, raw-vs-capped budgets,
    the recommended config) is the operator's own output, exercised with
    a forced over-cap corpus in tests/test_round10_fixes.py."""
    d = _t(spark, sf_dir, "documents")
    audit = dedup.lsh_band_audit(
        d, simhash_configs=((64, 4), (96, 4))
    ).localCheckpoint(eager=True)  # bounded (<= 5 rows)
    floor = (
        d.filter(F.col("text").isNotNull())
        .groupBy("text")
        .agg(F.count(F.lit(1)).alias("g"))
        .filter(F.col("g") >= 2)
        .agg(
            F.coalesce(F.sum(F.expr("(g * (g - 1)) div 2")), F.lit(0))
            .cast("long")
            .alias("fl")
        )
    )
    return (
        audit.crossJoin(F.broadcast(floor))
        .select(
            "family",
            "bands",
            "band_width",
            "n_docs",
            F.col("fl").alias("exdup_pair_floor"),
            (F.col("raw_pairs") >= F.col("bands") * F.col("fl")).alias(
                "raw_ge_floor_ok"
            ),
            (F.col("capped_pairs") <= F.col("raw_pairs")).alias(
                "capped_le_raw_ok"
            ),
        )
        .orderBy("family", "bands", "band_width")
    )
