"""Round-14 optimization locks: every operator whose INTERNALS changed
this round keeps its outputs bit-identical to the shape it replaced,
and the plan properties the optimizations bought stay bought.

Covered (see OPTIMIZATION_r14.md for the measurements):
1. word_ngram_strings == the quadratic transform/sequence shape.
2. _sorted_struct_pairs == the capture-in-lambda shape (incl. NULL/[]).
3. lsh_band_audit's single-exchange rollup == per-leg occupancy stats,
   and the multi-geometry simhash UDF == per-geometry simhash_bands_udf.
4. histogram_quantiles scans its input twice, not four times.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _old_word_ngrams(col: str, n: int = 3):
    """The retired quadratic shape, kept here as the oracle."""
    toks = F.split(F.col(col), " ")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), cnt)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


EDGE_TEXTS = [
    (1, "a"),
    (2, "a b"),
    (3, "a b c"),
    (4, ""),
    (5, "a  b"),
    (6, "x y z w v"),
    (7, "a a a a a"),
    (8, "one two three four five six seven eight nine ten"),
]


def test_word_ngrams_matches_quadratic_shape(spark, sf_dir):
    from dampr_spark.operators.dedup import word_ngrams
    from dampr_spark.sources.readers import read_table

    edge = spark.createDataFrame(EDGE_TEXTS, "id long, text string")
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    for df in (edge, docs):
        for n in (2, 3, 5):
            assert (
                df.select(
                    _old_word_ngrams("text", n).alias("o"),
                    word_ngrams("text", n).alias("nw"),
                )
                .filter(F.col("o") != F.col("nw"))
                .count()
                == 0
            )
    # NULL text → [] — a DELIBERATE r14 behavior change (the retired
    # transform shape returned [''] on NULL text via size(NULL) = -1;
    # ADVICE r14 verified that empirically). [] is kept because every
    # caller filters text IS NOT NULL before building grams, and the ''
    # gram would spuriously pair NULL-text docs with empty-text docs.
    row = (
        spark.createDataFrame([(9, None)], "id long, text string")
        .select(word_ngrams("text", 3).alias("g"))
        .first()
    )
    assert row["g"] == []


def test_positional_windows_matches_sequence_shape(spark):
    from dampr_spark.operators.dedup import positional_windows

    df = spark.createDataFrame(EDGE_TEXTS, "id long, text string")
    toks = F.split(F.col("text"), " ")
    n = 3
    cnt = F.size(toks) - (n - 1)
    idx = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)).otherwise(
        F.array().cast("array<int>")
    )
    old = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("pos"), F.concat_ws(" ", F.slice(toks, i, n)).alias("gram")
        ),
    )
    assert (
        df.select(old.alias("o"), positional_windows("text", n).alias("nw"))
        .filter(F.col("o") != F.col("nw"))
        .count()
        == 0
    )


def test_sorted_struct_pairs_matches_capture_shape(spark):
    from dampr_spark.operators.dedup import _sorted_struct_pairs

    def old_pairs(docs):
        s = F.array_sort(docs)
        return F.flatten(
            F.transform(
                s,
                lambda a, i: F.transform(
                    F.slice(s, i + 2, F.greatest(F.size(s) - i - 1, F.lit(0))),
                    lambda b: F.struct(a.alias("a"), b.alias("b")),
                ),
            )
        )

    df = spark.createDataFrame(
        [
            (1, []),
            (2, None),
            (3, [(1, "x")]),
            (4, [(2, "b"), (1, "a")]),
            (5, [(3, "c"), (1, "a"), (2, "b"), (4, "d")]),
        ],
        "id long, docs array<struct<id:long,t:string>>",
    )
    rows = df.select(
        old_pairs(F.col("docs")).alias("o"),
        _sorted_struct_pairs(F.col("docs")).alias("nw"),
    ).collect()
    for r in rows:
        assert r["o"] == r["nw"]


def test_simhash_multi_bands_matches_single_geometry(spark, sf_dir):
    from dampr_spark.operators.dedup import (
        simhash_bands_udf,
        simhash_multi_bands_udf,
    )
    from dampr_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").limit(300)
    tok_hashes = F.transform(
        F.array_distinct(F.split(F.col("text"), " ")),
        lambda t: F.xxhash64(t),
    )
    cfgs = ((64, 4), (96, 4))
    out = docs.select(
        simhash_multi_bands_udf(cfgs)(tok_hashes).alias("m"),
        simhash_bands_udf(64, 4)(tok_hashes).alias("s0"),
        simhash_bands_udf(96, 4)(tok_hashes).alias("s1"),
    )
    bad = out.filter(
        (F.get("m", 0) != F.col("s0"))
        | (F.get("m", 1) != F.col("s1"))
        | (F.col("m").isNull() != F.col("s0").isNull())
    ).count()
    assert bad == 0
    # NULL text -> NULL fingerprint on both paths (posexplode drops it).
    nrow = (
        spark.createDataFrame([(1, None)], "id long, text string")
        .select(simhash_multi_bands_udf(cfgs)(tok_hashes).alias("m"))
        .first()
    )
    assert nrow["m"] is None


def test_lsh_band_audit_matches_per_leg_stats(spark, sf_dir):
    from dampr_spark.operators.dedup import (
        _band_hashes,
        _ensure_parallelism,
        band_occupancy_stats,
        lsh_band_audit,
        minhash_text_signature_udf,
        simhash_bands_udf,
    )
    from dampr_spark.sources.readers import read_table

    df = read_table(spark, sf_dir, "documents")
    got = sorted(
        tuple(r)
        for r in lsh_band_audit(df, simhash_configs=((64, 4),)).collect()
    )
    num_perm = 64
    sig = (
        _ensure_parallelism(df)
        .select(
            F.col("doc_id").alias("id"),
            minhash_text_signature_udf(num_perm, 5)(F.col("text")).alias(
                "sig"
            ),
        )
        .localCheckpoint(eager=True)
    )
    ref = []
    for b in (8, 16, 32):
        banded = sig.select(
            "id",
            F.posexplode(_band_hashes("sig", num_perm, b)).alias(
                "band", "band_hash"
            ),
        )
        r = band_occupancy_stats(banded, 1000).collect()[0]
        ref.append(("minhash", b, num_perm // b, r["band_rows"] // b) + tuple(r))
    tok_hashes = F.transform(
        F.array_distinct(F.split(F.col("text"), " ")),
        lambda t: F.xxhash64(t),
    )
    banded = _ensure_parallelism(df).select(
        F.col("doc_id").alias("id"),
        F.posexplode(simhash_bands_udf(64, 4)(tok_hashes)).alias(
            "band", "band_hash"
        ),
    )
    r = band_occupancy_stats(banded, 1000).collect()[0]
    ref.append(("simhash", 4, 16, r["band_rows"] // 4) + tuple(r))
    best = max(
        (x[1] for x in ref if x[0] == "minhash" and x[7] == 0), default=None
    )
    ref_full = sorted(
        x + (x[0] == "minhash" and x[1] == best,) for x in ref
    )
    assert got == ref_full


def test_lsh_band_audit_rejects_duplicate_configs(spark, sf_dir):
    from dampr_spark.operators.dedup import lsh_band_audit
    from dampr_spark.sources.readers import read_table

    df = read_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="duplicate banding configs"):
        lsh_band_audit(df, simhash_configs=((64, 4), (64, 4)))


def test_histogram_quantiles_scans_input_twice(spark, sf_dir):
    """The round-14 bounds pin: the before-plan re-ran the min/max/count
    corpus scan once per consumer (4 scans); with the 1-row pin the
    final plan holds exactly ONE parquet scan (the bucket pass — the
    grid-fit scan already ran inside the pin)."""
    from dampr_spark.operators.stats import histogram_quantiles
    from dampr_spark.sources.readers import read_table

    o = read_table(spark, sf_dir, "orders")
    est = histogram_quantiles(o, "o_totalprice", [0.5, 0.9], 64)
    plan = est._jdf.queryExecution().sparkPlan().toString()
    assert plan.count("orders.parquet") == 1, plan


def test_exact_quantiles_derived_n_edge_cases(spark):
    """Change #9 derives n from the per-partition counts table instead of
    a third pass over the pinned frame. The identity n = sum(cnt) must
    hold on the shapes the hypothesis suite skips: empty input (n=0,
    NULL quantiles — the coalesce(sum, 0) leg), all-NULL values, and a
    NULL group key forming its own group."""
    from dampr_spark.operators.stats import exact_group_quantiles, exact_quantiles

    empty = spark.createDataFrame([], "x double")
    r = exact_quantiles(empty, "x", [0.5, 0.9]).first()
    assert r["n"] == 0 and r["q_0"] is None and r["q_1"] is None

    all_null = spark.createDataFrame([(None,), (None,)], "x double")
    r = exact_quantiles(all_null, "x", [0.5]).first()
    assert r["n"] == 0 and r["q_0"] is None

    rows = [("a", 1.0), ("a", 3.0), (None, 5.0), (None, 7.0), (None, 9.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {r["g"]: r for r in exact_group_quantiles(df, ["g"], "x", [0.5]).collect()}
    assert got["a"]["n"] == 2 and got["a"]["q_0"] == 2.0
    assert got[None]["n"] == 3 and got[None]["q_0"] == 7.0
