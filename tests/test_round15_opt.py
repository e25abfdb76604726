"""Round-15 optimization locks (see OPTIMIZATION_r15.md).

Each test pins an equivalence the round's performance changes rely on:

1. simhash_dedup's triangle-salted hot-band pair generation emits the
   EXACT pair set of the unsalted join (salt_bucket == max_bucket is the
   built-in control arm that restores the old single-join shape).
2. dsir_importance_weights_flagged's single combined bucket aggregate
   matches the retired two-aggregate shape bit-for-bit.
3. read_table's schema cache returns the same schema/data as a fresh
   inference read (metadata memo only — never results).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dampr_spark.operators.dedup import simhash_dedup
from dampr_spark.sources.readers import read_table


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def test_simhash_salted_pairs_match_unsalted(spark, sf_dir):
    d = _docs(spark, sf_dir)
    salted = simhash_dedup(d, max_hamming=3, salt_bucket=8)
    plain = simhash_dedup(d, max_hamming=3, salt_bucket=1000)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    assert salted.count() > 0  # fixture sanity: the lock compared something


def test_simhash_salted_pairs_on_forced_hot_bucket(spark):
    # 60 near-identical docs (one token differs) share every simhash band
    # -> one bucket of 60 in each of 4 bands; salt_bucket=16 forces the
    # triangle-salted path with nc=4 chunks while max_bucket keeps the
    # bucket under the cap. The salted pair set must equal the unsalted
    # one (C(60,2) pairs at hamming 0/1, minus nothing).
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, f"{base} tok{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    salted = simhash_dedup(df, max_hamming=3, max_bucket=100, salt_bucket=16)
    plain = simhash_dedup(df, max_hamming=3, max_bucket=100, salt_bucket=100)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    assert salted.count() > 100  # the hot bucket really paired


def test_simhash_salt_clamped_keeps_hot_cap(spark):
    # salt_bucket ABOVE max_bucket must not disable the over-cap drop:
    # 30 identical docs with max_bucket=10 -> every band bucket is over
    # cap -> zero pairs, regardless of salt_bucket.
    rows = [(i, "same text for every document here") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = simhash_dedup(df, max_hamming=3, max_bucket=10, salt_bucket=10**9)
    assert out.count() == 0


def test_minhash_chunked_pairs_match_unchunked(spark, sf_dir):
    from dampr_spark.operators.dedup import minhash_lsh_candidates

    d = _docs(spark, sf_dir)
    chunked = minhash_lsh_candidates(d, salt_bucket=2)
    plain = minhash_lsh_candidates(d, salt_bucket=10**6)
    assert chunked.exceptAll(plain).count() == 0
    assert plain.exceptAll(chunked).count() == 0


def test_minhash_chunked_pairs_on_forced_hot_bucket(spark):
    from dampr_spark.operators.dedup import minhash_lsh_candidates

    # 50 identical docs share every band -> buckets of 50; salt_bucket=8
    # forces nc=7 chunks. Pair set must equal the unchunked C(50,2) per
    # band (deduped across bands by the trailing distinct).
    rows = [(i, "the same shingled text body for every document") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunked = minhash_lsh_candidates(df, max_bucket=100, salt_bucket=8)
    plain = minhash_lsh_candidates(df, max_bucket=100, salt_bucket=100)
    assert chunked.exceptAll(plain).count() == 0
    assert plain.exceptAll(chunked).count() == 0
    assert chunked.count() == 50 * 49 // 2


def test_dsir_flagged_matches_two_aggregate_shape(spark, sf_dir):
    from dampr_spark.operators.dedup import _ensure_parallelism
    from dampr_spark.operators.selection import (
        _adjacent_pairs,
        _pico_weight_sum,
        _pin_once,
        dsir_importance_weights_flagged,
        hashed_feature_bucket,
    )

    def old_flagged(df, is_target, n_buckets=256):
        base = df.filter(F.col("text").isNotNull())
        doc_buckets = (
            _ensure_parallelism(base)
            .select(
                F.col("doc_id").alias("id"),
                is_target.alias("tgt"),
                F.explode(_adjacent_pairs("text")).alias("p"),
            )
            .select(
                "id",
                "tgt",
                hashed_feature_bucket(
                    F.concat_ws(" ", F.col("p.a"), F.col("p.b")), n_buckets
                ).alias("bucket"),
            )
            .groupBy("id", "tgt", "bucket")
            .agg(F.count(F.lit(1)).alias("k"))
            .transform(_pin_once)
        )
        raw_counts = (
            doc_buckets.groupBy("bucket")
            .agg(F.sum("k").alias("rc"))
            .localCheckpoint(eager=True)
        )
        tgt_counts = (
            doc_buckets.filter(F.col("tgt"))
            .groupBy("bucket")
            .agg(F.sum("k").alias("tc"))
            .localCheckpoint(eager=True)
        )
        ratios = (
            raw_counts.join(tgt_counts, "bucket", "left")
            .withColumn("tc", F.coalesce(F.col("tc"), F.lit(0)))
            .crossJoin(
                F.broadcast(
                    raw_counts.agg(F.sum("rc").alias("rn")).crossJoin(
                        tgt_counts.agg(F.sum("tc").alias("tn"))
                    )
                )
            )
            .select(
                "bucket",
                (
                    F.log((F.col("tc") + 1) / (F.col("tn") + n_buckets))
                    - F.log((F.col("rc") + 1) / (F.col("rn") + n_buckets))
                ).alias("lr"),
            )
        )
        scored = (
            doc_buckets.join(F.broadcast(ratios), "bucket")
            .groupBy("id")
            .agg(
                F.sum("k").cast("long").alias("n_feats"),
                _pico_weight_sum().alias("log_weight"),
            )
        )
        return (
            base.select(F.col("doc_id").alias("id"))
            .join(scored, "id", "left")
            .select(
                F.col("id").alias("doc_id"),
                F.coalesce(F.col("n_feats"), F.lit(0))
                .cast("long")
                .alias("n_feats"),
                F.coalesce(F.col("log_weight"), F.lit(0.0)).alias(
                    "log_weight"
                ),
            )
        )

    d = _docs(spark, sf_dir)
    tgt = F.col("lang") == "en"
    new = dsir_importance_weights_flagged(d, tgt)
    old = old_flagged(d, tgt)
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_read_table_schema_cache_matches_inference(spark, sf_dir):
    for name in ("documents", "events"):
        first = read_table(spark, sf_dir, name)  # populates / uses cache
        again = read_table(spark, sf_dir, name)  # cached-schema read
        fresh = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and dict(fresh.dtypes).get("ts") == "bigint":
            fresh = fresh.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast(
                    "timestamp_ntz"
                ),
            )
        assert again.schema == fresh.schema
        assert first.schema == again.schema
        # Data still comes from the files, not any cache.
        assert again.count() == fresh.count()
