"""Data-selection operators (operators/selection.py): DSIR importance
weights and bigram-LM perplexity — planted-domain separation and fluency
ranking semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from dampr_spark.operators.selection import (
    bigram_doc_perplexity,
    dsir_importance_weights,
)


def _doc(words, n):
    return " ".join(words[i % len(words)] for i in range(n))


def test_dsir_separates_planted_domains(spark):
    legal = ["whereas", "party", "herein", "clause", "liability", "shall"]
    chat = ["lol", "omg", "haha", "yeah", "nope", "hmm"]
    rows = [(i, _doc(legal, 30)) for i in range(10)]
    rows += [(100 + i, _doc(chat, 30)) for i in range(10)]
    rows += [(200, "solo")]  # single token: no bigram features
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = raw.filter(F.col("doc_id") < 10)  # the legal domain

    w = {r.doc_id: r for r in dsir_importance_weights(raw, target).collect()}
    legal_scores = [w[i].log_weight for i in range(10)]
    chat_scores = [w[100 + i].log_weight for i in range(10)]
    # every legal doc outranks every chat doc toward the legal target
    assert min(legal_scores) > max(chat_scores)
    # toward-target mass is positive, away-from-target negative
    assert all(s > 0 for s in legal_scores)
    assert all(s < 0 for s in chat_scores)
    # featureless doc present, scored 0 with 0 features
    assert w[200].n_feats == 0 and w[200].log_weight == 0.0
    assert len(w) == 21


def test_dsir_en_target_separates_languages(spark, sf_dir):
    from dampr_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents")
    w = dsir_importance_weights(d, d.filter(F.col("lang") == "en"))
    j = w.join(d.select("doc_id", "lang"), "doc_id")
    means = {
        r.lang: r.m
        for r in j.groupBy("lang").agg(F.avg("log_weight").alias("m")).collect()
    }
    assert means["en"] > 0
    for lang, m in means.items():
        if lang != "en":
            assert means["en"] > m, f"en should outrank {lang}"


def test_bigram_perplexity_ranks_fluency(spark):
    # 20 docs of the SAME repeated phrase (the LM memorizes it) + 1 doc of
    # entirely novel constructions -> the novel doc is the perplexity max
    common = "the cat sat on the mat and then " * 4
    rows = [(i, common.strip()) for i in range(20)]
    rows.append((99, " ".join(f"zq{i} xv{i}" for i in range(16))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ppl = {r.doc_id: r for r in bigram_doc_perplexity(df).collect()}
    worst = max(ppl, key=lambda k: ppl[k].ppl)
    assert worst == 99
    assert ppl[99].ppl > 2 * ppl[0].ppl
    # ppl is exp(avg_nll) (both rounded independently at 6dp)
    import math

    assert abs(ppl[0].ppl - math.exp(ppl[0].avg_nll)) < 1e-3
    # identical docs score identically
    assert ppl[0].avg_nll == ppl[1].avg_nll
    # single-token / empty docs carry no bigrams and are absent
    df2 = spark.createDataFrame([(1, "a b a b"), (2, "x")], "doc_id long, text string")
    out = bigram_doc_perplexity(df2).collect()
    assert [r.doc_id for r in out] == [1]


def test_gumbel_resample_tracks_weights(spark):
    """Gumbel-top-k sampling must be biased toward high-log-weight docs:
    with two planted domains and target = domain A, the top half of the
    resample should be overwhelmingly domain-A docs — and a repeat run is
    identical (deterministic md5 noise)."""
    from pyspark.sql import functions as F

    from dampr_spark.operators.selection import dsir_importance_weights

    legal = ["whereas", "party", "herein", "clause", "liability", "shall"]
    chat = ["lol", "omg", "haha", "yeah", "nope", "hmm"]
    rows = [(i, _doc(legal, 30)) for i in range(40)]
    rows += [(100 + i, _doc(chat, 30)) for i in range(40)]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    w = dsir_importance_weights(raw, raw.filter(F.col("doc_id") < 40))

    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("g:"), F.col("doc_id").cast("string"))), 1, 8),
            16, 10,
        ).cast("double") + 1
    ) / F.lit(4294967296.0)
    key = F.round(F.col("log_weight") + (-F.log(-F.log(u))), 6)
    pick = lambda: [
        r.doc_id
        for r in w.select("doc_id", key.alias("k"))
        .orderBy(F.col("k").desc(), "doc_id")
        .limit(20)
        .collect()
    ]
    first = pick()
    assert pick() == first  # deterministic
    n_legal = sum(1 for d in first if d < 40)
    assert n_legal >= 18, f"resample not weight-biased: {n_legal}/20 legal"


def test_fit_logreg_matches_direct_model(spark):
    """The distributed GD fit must equal a local numpy replay of the same
    fixed-iteration, fixed-rounding update — and the decision expression
    must agree with the sign of the numpy dot product."""
    import numpy as np

    from dampr_spark.operators.selection import fit_logreg, logreg_decision

    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 2)).round(3)
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float)
    rows = [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    got = fit_logreg(df, ["x1", "x2"], "y", iters=4, lr=1.0, prec=8)

    from dampr_spark.operators.selection import _round_half_up

    w = np.zeros(3)
    Xb = np.hstack([np.ones((len(X), 1)), X])
    for _ in range(4):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        g = Xb.T @ (p - y) / len(X)
        w = np.array([_round_half_up(float(v), 8) for v in (w - g)])
    assert got == [float(v) for v in w], (got, w)

    # Decision expression: sign agreement with the numpy margins.
    pred = [r["p"] for r in df.select(
        logreg_decision(got, ["x1", "x2"]).alias("p")).collect()]
    want = (Xb @ np.array(got)) > 0
    assert pred == [bool(v) for v in want]
    # And the fit actually learned the separating direction.
    acc = float(np.mean((Xb @ np.array(got) > 0) == (y > 0.5)))
    assert acc > 0.9, acc
