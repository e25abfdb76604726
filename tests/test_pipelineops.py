"""Invariant tests for the corpus-pipeline queries (plans/pipelineops.py) —
properties the DuckDB oracle can't express: bin-budget bounds, sampling-rate
bounds, decontamination set semantics on planted fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from dampr_spark.plans import all_queries

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return all_queries()[name].builder(spark, SF)


def test_pack_bins_respect_budget(spark):
    # a bin only exceeds the 2048-token budget by (at most) its final doc:
    # the running-sum EXCLUSIVE of the current doc decides the bin, so
    # bin_tokens < budget + max_doc_tokens, and every bin except the last
    # per source is at least full-ish (>= budget - max_doc_tokens + 1 would
    # be the greedy bound; assert the weaker but exact invariant that
    # removing the last doc of a bin leaves it under budget).
    rows = _run(spark, "pack_token_budget").collect()
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "source",
            "doc_id",
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .collect()
    )
    tok = {(r.source, r.doc_id): r.n_tokens for r in docs}
    for r in rows:
        last_doc_tokens = tok[(r.source, r.last_doc)]
        assert r.bin_tokens - last_doc_tokens < 2048, r
        assert r.n_docs >= 1 and r.first_doc <= r.last_doc


def test_pack_partitions_docs_exactly_once(spark):
    rows = _run(spark, "pack_token_budget").collect()
    n_docs_packed = sum(r.n_docs for r in rows)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert n_docs_packed == n_docs


def test_domain_mix_sample_rates_within_binomial_bounds(spark):
    # the md5-based keep decision is uniform: observed rate must sit within
    # 4 sigma of the target (n>=25 per source in every sf fixture)
    for r in _run(spark, "domain_mix_sample").collect():
        sigma = (r.target_rate * (1 - r.target_rate) / r.n_docs) ** 0.5
        assert abs(r.n_sampled / r.n_docs - r.target_rate) <= max(
            4 * sigma, 1.0 / r.n_docs
        ), r


def test_decontaminate_planted_contamination(spark):
    # a doc that IS a benchmark doc's text must report contamination 1.0;
    # build a tiny corpus in-memory and run the same builder logic via a
    # temp parquet copy
    import tempfile

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, bench_text, "en", "src0", len(bench_text)),  # benchmark (0 % 97 == 0)
        (1, bench_text, "en", "src1", len(bench_text)),  # fully contaminated
        (2, "one two three four five six seven eight", "en", "src2", 40),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        out = {
            r.doc_id: r
            for r in all_queries()["decontaminate_ngram"].builder(spark, d).collect()
        }
    assert out[1].contamination == 1.0
    assert out[2].contamination == 0.0
    assert 0 not in out  # benchmark docs are not scored


def test_repetition_filter_flags_planted_boilerplate(spark):
    import tempfile

    rows = [
        (1, "spam " * 50, "en", "src1", 250),        # one token repeated
        (2, " ".join(f"w{i}" for i in range(50)), "en", "src2", 150),  # all unique
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t.strip(), l, s, n) for i, t, l, s, n in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        out = {
            r.doc_id: r
            for r in all_queries()["repetition_filter"].builder(spark, d).collect()
        }
    assert out[1].is_repetitive and out[1].gram_dup_ratio > 0.9
    assert not out[2].is_repetitive and out[2].token_dup_ratio == 0.0


def test_corpus_mix_report_shares_sum_to_one(spark):
    shares = [r.token_share for r in _run(spark, "corpus_mix_report").collect()]
    assert abs(sum(shares) - 1.0) < 1e-3


def test_expectations_operators(spark):
    """validate counts NULL-predicate rows as violations; quarantine tags
    rows with every failed check; duplicate_keys finds multi-copy keys."""
    from pyspark.sql import functions as F

    from dampr_spark.operators.expectations import (
        duplicate_keys,
        quarantine,
        validate,
    )

    df = spark.createDataFrame(
        [(1, "ok", 2), (2, None, 4), (3, "bad-len", 99), (3, "dup", 3)],
        "id long, text string, n long",
    )
    checks = {
        "text_present": F.col("text").isNotNull(),
        "len_ok": F.col("n") == F.length("text"),  # NULL text -> NULL -> violation
    }
    r = validate(df, checks).first()
    assert (r.n_rows, r.v_text_present, r.v_len_ok) == (4, 1, 2)

    q = {r.id: sorted(r.failed_checks) for r in quarantine(df, checks).collect()}
    assert q == {2: ["len_ok", "text_present"], 3: ["len_ok"]}

    d = {(r.id,): r.n_copies for r in duplicate_keys(df, ["id"]).collect()}
    assert d == {(3,): 2}


def test_profile_operator_semantics(spark):
    """Null counting, exact distincts, native-type min/max (not
    lexicographic), all-NULL column edges — in one scan."""
    from dampr_spark.operators.profile import profile

    rows = [
        (1, 9.5, "a", None),
        (2, 100.0, None, None),
        (10, None, "b", None),
    ]
    df = spark.createDataFrame(rows, "k long, v double, s string, z string")
    got = {r.column: r for r in profile(df).collect()}
    assert got["k"].n_rows == 3 and got["k"].n_nulls == 0 and got["k"].n_distinct == 3
    # native-type ordering: min 1, max 10 (lexicographic would say max "9.5"-style)
    assert (got["k"].min_repr, got["k"].max_repr) == ("1", "10")
    assert (got["v"].n_nulls, got["v"].n_distinct) == (1, 2)
    assert got["v"].max_repr == "100.0"
    assert (got["s"].n_nulls, got["s"].min_repr, got["s"].max_repr) == (1, "a", "b")
    assert (got["z"].n_nulls, got["z"].n_distinct) == (3, 0)
    assert got["z"].min_repr is None and got["z"].max_repr is None


def test_profile_is_single_scan(spark, sf_dir):
    """The wide-aggregate plan must contain exactly one scan of the input
    (the whole point vs one-aggregate-per-column)."""
    from dampr_spark.operators.profile import profile
    from dampr_spark.sources.readers import read_table

    df = profile(read_table(spark, sf_dir, "orders"), cols=["o_orderkey", "o_custkey"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
