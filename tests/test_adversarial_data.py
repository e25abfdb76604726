"""Regeneration-robustness gate: the driver REBUILDS testdata every round
and its shape has already shifted between rounds (events ts unit, embedding
dup structure). This module replays the catalog's oracle parity against a
deterministic ADVERSARIAL variant of the tables — NULL texts, empty
strings, NULL embeddings, a zero vector, NULL labels/values/types, planted
exact dups — so a query that silently relies on "no nulls, no zero norms,
vec_id 0 exists" fails here first, not in a future round's CORRECTNESS
file. (Round-5 hardening: 16 queries failed this gate when it was first
written; all are pinned green now.)"""

from __future__ import annotations

import pytest

from dampr_spark.plans import all_queries
from tests.oracle_utils import compare, duckdb_connection

# The queries that were data-fragile when this gate was introduced, plus
# the rows-only operators that crashed outright — the permanent watchlist.
_HARDENED = [
    "ann_batch_topk",
    "ann_cosine_topk",
    "ann_recall_check",
    "approx_quantile_check",
    "decontaminate_ngram",
    "embedding_cosine_dups",
    "embedding_lsh_check",
    "embedding_norms",
    "kmeans_agreement_check",
    "label_centroids",
    "nearest_centroid_assign",
    "repetition_filter",
    "simhash_audit_check",
    # events-table perturbations (NULL type/value/props) — these queries
    # filter/propagate nulls identically on both engines and keep the
    # fixture's events block exercised
    "user_value_ewma",
    "value_outliers_by_type",
    "robust_outliers_by_type",
    "events_hourly",
    # round-6 additions: text queries drop NULL texts at entry, vector
    # queries filter valid_vector, class_weights drops NULL labels,
    # length buckets drop NULL n_chars — all mirrored in their oracles
    "fuzzy_decontaminate",
    "ngram_novelty",
    "class_weights",
    "length_curriculum_buckets",
    "embedding_centroid_outliers",
    "cosine_range_search",
    "training_shards_manifest",
    "dup_cluster_histogram",
    "token_entropy",
    "exact_dedup_keep_best",
    "bigram_pmi",
    "value_drift_psi",
    "lang_embedding_centroids",
    "ngram_containment_dups",
    "user_inactivity",
    "copurchase_brand_pairs",
    "embedding_int8_quantize_report",
    "dup_graph_degree_stats",
    "quantized_ann_recall_check",
    "customer_rfm_segments",
    "user_burstiness",
    "hybrid_rrf_search",
    "frame_sample_manifest",
    "audio_segments_manifest",
    # round-9 additions: the resolution audit filters valid vectors at
    # entry (NULL/zero-vector rows invisible on both engines); the density
    # report drops NULL texts and counts planted exact dups identically
    "grid_resolution_audit",
    "corpus_density_report",
    # round-7 additions: the substring family drops NULL texts at entry
    # and the adversarial fixture's whole-doc duplicates become full-length
    # spans — exercised on both engines
    "repeated_substrings",
    "substring_dedup_report",
    "duplicate_ngram_coverage",
    "substring_trim_dedup",
    # round-10 additions: both sizing instruments drop NULLs at entry
    # (NULL text for the anchor pass, NULL user_id for the key rollup);
    # the fixture's planted whole-doc duplicates shift the substring
    # audit's posting occupancy identically on both engines
    "substring_posting_audit",
    "window_frame_audit",
    "dsir_en_importance",
    "bigram_doc_perplexity",
    "pq_recall_check",
    "self_repetition_trim",
    "cms_ngram_frequency",
    "near_dedup_keep_best",
    "hard_negative_triplets",
    "corpus_token_drift",
    "dsir_gumbel_resample",
    # round-7b additions: textrank/logreg/graph queries drop NULL texts
    # (and logreg NULL langs) at entry; user_state_history propagates the
    # NULL event_type as its own state identically in both engines; HLL
    # filters NULL user_ids before hashing
    "textrank_keywords",
    "user_state_history",
    "dup_graph_triangles",
    "dup_graph_communities",
    "quality_logreg_fit",
    "hll_explicit_distinct_users",
    "quality_classifier_gate",
    "vocab_coverage_curve",
    "dup_graph_communities",
    "dup_canonical_distance_histogram",
    # round-7c: bloom drops NULL keys at build (isNotNull) and NULL probe
    # keys hash to NULL -> filter drops them; the oracle's md5(NULL) join
    # misses identically
    "bloom_join_prune",
    # histogram sketch drops NULL values at entry on both engines; the
    # perturbed orders keep hi > lo so the normal branch runs
    "histogram_quantile_sketch",
    # hll overlap: NULL keys and non-R/A flags filtered at entry on both
    # engines; duplicated rows are invisible to a distinct sketch
    "hll_audience_overlap",
    # phrase search: NULL text filtered at entry on both engines; dup rows
    # double occurrence counts identically in the postings and the scan
    "phrase_search",
    # OLS: NULL dates/prices are skipped by sum and counted by count(*)
    # identically in both engines; all sums exact (int/decimal) so the
    # closed form stays bit-deterministic on perturbed data
    "segment_revenue_trend_ols",
    # source cosine: NULL text/source filtered at entry on both engines;
    # dup rows scale counts identically through the exact-integer math
    "source_similarity_cosine",
    # prefix jaccard: NULL texts dropped at entry on both engines; planted
    # whole-doc duplicates become jaccard-1.0 pairs through the lossless
    # prefix filter exactly as through the oracle's full join
    "prefix_jaccard_dups",
    # grouped histogram sketch: NULL event_type/value dropped at entry on
    # both engines; perturbed values keep hi > lo per surviving type
    "event_value_quantiles_by_type",
    # sorted neighborhood: NULL texts dropped at entry; planted dup docs
    # sort adjacent and pair at lev 0 identically in both engines
    "sorted_neighborhood_dups",
    # cms join estimate: NULL keys filtered at entry on both engines;
    # integer cells keep est >= exact on any perturbed frequency profile
    "cms_join_size_estimate",
    # skew report: NULL keys filtered at entry; exact integer aggregates
    # respond identically to perturbed frequency profiles
    "join_key_skew_report",
    # grid semantic dedup: NULL and zero-vector embeddings fail
    # valid_vector at entry on both engines; grid bounds and cells are
    # recomputed on the surviving set identically
    "semantic_grid_blocking",
    "semantic_grid_dedup",
    "semantic_grid_survivors",
    "semantic_grid_probe_pairs",
    # round-11 addition: the IVF sizing instrument filters valid_vector
    # at entry on both engines (NULL embeddings and the planted zero
    # vector invisible to assignment AND to the oracle's count), and its
    # hash-compared columns are recomputed from the surviving set
    "ivf_list_audit",
    # round-11 addition: the re-fit drift loop drops NULL text/lang at
    # entry exactly like quality_logreg_fit (both fits, both slices, the
    # apply scan) and every downstream count/PSI is integer-exact on the
    # surviving set
    "quality_gate_refit_drift",
    # round-11 addition: the banding instrument's hash-compared columns
    # recompute from raw text on both engines (all-docs vs non-null-docs
    # conservation quotients, the exact-dup pair floor over identical
    # non-NULL texts) — NULL/empty texts and planted whole-doc dups are
    # the exact perturbations its contract must absorb
    "lsh_band_audit",
    # round-11 addition: embedding drift PSI filters valid_vector at
    # entry (NULL embeddings and the planted zero vector invisible on
    # both engines); grid bounds and cells recompute on the surviving
    # set identically, and the smoothed PSI fold is the value_drift_psi
    # arithmetic over integer counts
    "embedding_drift_psi",
    # round-11 addition: the batch-IVF companion picks its 4 queries from
    # the SURVIVING valid vectors (ORDER BY vec_id over the filtered set,
    # identical on both engines) and its exact kth-sim/count columns
    # recompute under the perturbation
    "ivf_batch_recall_check",
    # round-12 additions: the capstone pipeline composes four text
    # stages over NULL/empty texts and planted dup ids (every stage
    # filters text IS NOT NULL at entry, matching the oracle chain);
    # the incremental-store and novelty companions derive their
    # conservation counts from the SURVIVING valid vectors on both
    # engines, and the zero vector / NULL embeddings drop at the
    # valid_vector gate before any store write or dominance test
    "curate_training_slice",
    "incremental_ann_check",
    "semantic_novelty_check",
    # round-13 addition: the compact-lifecycle companion derives every
    # hash-compared count from the SURVIVING valid vectors on both
    # engines (NULL embeddings and the planted zero vector drop at the
    # valid_vector gate before any store write, audit, or top-k)
    "ivf_compact_check",
    # round-13 addition: the sq8-codec companion counts/sizes from the
    # surviving valid vectors on both engines (encode drops invalid rows
    # at the same gate); dim audits the codes column whose length equals
    # the raw embedding length DuckDB reads
    "quantized_store_check",
    # round-13 addition: the v2 capstone chains six text stages over
    # NULL/empty texts and planted dup ids (every stage filters
    # text IS NOT NULL at entry, matching the oracle chain; the
    # decontamination and DSIR stages recompute their gram/bucket
    # models from the surviving set identically on both engines)
    "curate_training_slice_v2",
    # round-14 addition: the maintenance-cadence composition check
    # derives every hash-compared count from the SURVIVING valid
    # vectors (the fixture's NULL embeddings and zero vector drop at
    # the valid_vector gate before landing-batch writes, store appends,
    # compaction, or the retraction pass; the fixture's planted exact
    # dups just join the check's own planted partners as additional
    # dominated rows on both engines)
    "stream_maintenance_check",
]
_HARDENED_ROWS_ONLY = [
    "pq_ann_topk",
    "embedding_near_dups",
    "incremental_ann_search",
    "semantic_novelty_dedup",
    "ivf_ann_topk",
    "kmeans_clusters",
    "lsh_ann_topk",
    "simhash_dedup",
]


@pytest.fixture(scope="module")
def adv_dir(sf_dir, tmp_path_factory) -> str:
    import shutil

    import duckdb

    d = tmp_path_factory.mktemp("adversarial_sf")
    con = duckdb.connect()
    con.sql(f"""
    COPY (
      SELECT doc_id,
             CASE WHEN doc_id % 23 = 0 THEN NULL
                  WHEN doc_id % 29 = 0 THEN '' ELSE text END AS text,
             lang, source, n_chars
      FROM read_parquet('{sf_dir}/documents.parquet')
      UNION ALL
      SELECT doc_id + 100000, text, lang, source, n_chars
      FROM read_parquet('{sf_dir}/documents.parquet') WHERE doc_id % 17 = 0
    ) TO '{d}/documents.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
    COPY (
      SELECT event_id, ts, user_id,
             CASE WHEN event_id % 31 = 0 THEN NULL ELSE event_type END AS event_type,
             CASE WHEN event_id % 19 = 0 THEN NULL ELSE value END AS value,
             CASE WHEN event_id % 13 = 0 THEN NULL ELSE props END AS props
      FROM read_parquet('{sf_dir}/events.parquet')
    ) TO '{d}/events.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
    COPY (
      SELECT vec_id,
             CASE WHEN vec_id % 37 = 0 THEN NULL
                  WHEN vec_id = 123 THEN CAST(list_transform(range(64), x -> 0.0) AS FLOAT[])
                  ELSE embedding END AS embedding,
             CASE WHEN vec_id % 41 = 0 THEN NULL ELSE label END AS label
      FROM read_parquet('{sf_dir}/embeddings.parquet')
    ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)""")
    con.close()
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return str(d)


@pytest.fixture(scope="module")
def adv_con(adv_dir):
    c = duckdb_connection(adv_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _HARDENED)
def test_hardened_oracle_parity_on_adversarial_data(spark, adv_dir, adv_con, name):
    q = all_queries()[name]
    ok, msg = compare(q.builder(spark, adv_dir), adv_con, q.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", _HARDENED_ROWS_ONLY)
def test_hardened_rows_only_runs_on_adversarial_data(spark, adv_dir, name):
    q = all_queries()[name]
    assert q.builder(spark, adv_dir).count() >= 0
