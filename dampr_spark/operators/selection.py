"""Data-selection operators for training-corpus curation: score documents
by how much they look like a TARGET distribution (DSIR) or how fluent they
are under a corpus-fit n-gram LM (perplexity filtering) — the two classic
pre-training selection signals (Xie et al. 2023 "Data Selection for
Language Models via Importance Resampling"; CCNet/KenLM-style perplexity
gates). Reference scope: the engine has no selection layer; this is
extension surface.

Everything is a declarative DataFrame plan: hashed features and log
probabilities are JVM expressions (md5-derived buckets, the one hash both
Spark and DuckDB compute identically, so both operators carry full SQL
oracles). Scale shape: bucket/vocabulary-sized aggregates with map-side
partials, broadcastable ratio tables, gram- or bucket-keyed joins — the
corpus text itself is exploded exactly once per operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dampr_spark.operators.pinning import pin as _pin
from dampr_spark.operators.pinning import pin_once as _pin_once

from dampr_spark.operators.dedup import _ensure_parallelism


def _adjacent_pairs(text_col: str) -> Column:
    """Non-distinct adjacent token pairs — delegates to the shared O(n)
    ``functions.text.adjacent_token_pairs`` (round 14: the per-site
    transform/element_at shape re-evaluated the split inside the lambda,
    making DSIR feature extraction QUADRATIC in doc length)."""
    from dampr_spark.functions.text import adjacent_token_pairs

    return adjacent_token_pairs(text_col)


def hashed_feature_bucket(gram: Column, n_buckets: int) -> Column:
    """Stable cross-engine feature hash — the single shared definition
    lives in functions/hashing.md5_bucket (md5 is the one hash Spark and
    DuckDB agree on; xxhash64/hash() are engine-seeded)."""
    from dampr_spark.functions.hashing import md5_bucket

    return md5_bucket(gram, n_buckets)


def dsir_log_ratios(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """The DSIR MODEL: ``(bucket, lr)`` log-likelihood-ratio table between
    the ``target`` and raw (``df``) hashed-bigram distributions, add-1
    smoothed. ``n_buckets`` rows — broadcastable, reusable across scoring
    runs (and the unit of state for the streaming scorer)."""
    raw_counts = (
        _ensure_parallelism(df.filter(F.col(text_col).isNotNull()))
        .select(F.explode(_adjacent_pairs(text_col)).alias("p"))
        .select(
            hashed_feature_bucket(
                F.concat_ws(" ", F.col("p.a"), F.col("p.b")), n_buckets
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("rc"))
        .localCheckpoint(eager=True)  # feeds the join AND the scalar total
    )
    tgt_counts = (
        _ensure_parallelism(target.filter(F.col(text_col).isNotNull()))
        .select(F.explode(_adjacent_pairs(text_col)).alias("p"))
        .select(
            hashed_feature_bucket(
                F.concat_ws(" ", F.col("p.a"), F.col("p.b")), n_buckets
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("tc"))
        .localCheckpoint(eager=True)
    )
    return (
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


def _pico_weight_sum() -> Column:
    """The DSIR ``log_weight`` aggregate: ``Σ k·round(lr·1e12)``
    accumulated in decimal(38,0), divided once, rounded to 6dp.

    Exact for ANY document size (round 14, ADVICE r13): the long-typed
    accumulator silently wrapped once a doc exceeded ~6e5 bigrams at
    |lr|~15 — and |lr| grows with corpus size via the ln(rn+buckets)
    term, shrinking that bound exactly at the scale this module targets.
    decimal(38,0) holds ~1e38: even a 1e12-bigram doc at pico-|lr| 1e14
    sums to ~1e26, so overflow is structurally unreachable (and Spark
    yields NULL, never a wrapped value, if it ever were). Cross-engine
    equality is preserved with the DuckDB oracles UNCHANGED: DuckDB's
    sum(BIGINT) accumulates in int128, so both engines compute the
    identical exact integer before the single divide, and the exact
    integer → double conversion rounds identically in both."""
    prod = F.col("k").cast("decimal(19,0)") * F.round(
        F.col("lr") * 1e12, 0
    ).cast("long").cast("decimal(19,0)")
    return F.round(
        F.sum(prod).cast("double") / F.lit(1_000_000_000_000.0), 6
    )


def dsir_score(
    df: DataFrame,
    ratios: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Score documents against a FIXED ``(bucket, lr)`` ratio table
    (:func:`dsir_log_ratios`): one pair-explode into per-doc bucket
    counts, broadcast-join the table, per-doc weighted sum. Buckets
    absent from the table contribute 0 (they carry no evidence under the
    fitted model).

    Exact-integer weighted sum (round 13): the per-doc
    ``Σ k·lr`` is computed over PICO-scaled ratios summed exactly —
    ``round(Σ k·round(lr·1e12) / 1e12, 6)`` — because a float sum's
    merge order differs between Spark's partial-aggregate tree and a
    sequential engine, and the trailing-ulp drift flipped a 6dp-rounded
    ``log_weight`` on one adversarial-fixture doc (1.002405 vs
    1.002404). The accumulator is decimal(38,0), not long (round 14,
    ADVICE r13): a long sum silently wrapped past ~6e5 bigrams at
    |lr|~15, and |lr| grows with corpus size — see
    :func:`_pico_weight_sum` for the cross-engine argument."""
    doc_buckets = (
        _ensure_parallelism(df.filter(F.col(text_col).isNotNull()))
        .select(
            F.col(id_col).alias("id"),
            F.explode(_adjacent_pairs(text_col)).alias("p"),
        )
        .select(
            "id",
            hashed_feature_bucket(
                F.concat_ws(" ", F.col("p.a"), F.col("p.b")), n_buckets
            ).alias("bucket"),
        )
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    scored = (
        doc_buckets.join(F.broadcast(ratios), "bucket")
        .groupBy("id")
        .agg(
            F.sum("k").cast("long").alias("n_feats"),
            _pico_weight_sum().alias("log_weight"),
        )
    )
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id")
    )
    return base.join(scored, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
    )


def dsir_importance_weights_flagged(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """:func:`dsir_importance_weights` for the common shape where the
    TARGET is a subset of the raw corpus selected by a row predicate
    (``is_target``, e.g. ``F.col("lang") == "en"``) — the
    `dsir_en_importance` / capstone shape. Numerically IDENTICAL output
    (same integer bucket counts → same lr doubles → same pico-summed
    log_weights, so the shared DuckDB oracles hold unchanged), but the
    corpus text is pair-exploded ONCE instead of three times: the
    per-(doc, bucket) count frame is pinned and feeds the raw
    distribution (Σk), the target distribution (Σk over flagged docs),
    AND the scoring join. Measured at sf0.1: `dsir_en_importance`
    3.78 s → see RESULTS.md round-13 note.

    Scale shape: one explode + ONE (id, bucket)-keyed shuffle with
    map-side partials; the n_buckets-row ratio table broadcasts back.
    The pinned frame is (id, bucket, k, flag) — corpus-scaled rows but
    four narrow columns, far smaller than the exploded grams it
    replaces."""
    base = df.filter(F.col(text_col).isNotNull())
    doc_buckets = (
        _ensure_parallelism(base)
        .select(
            F.col(id_col).alias("id"),
            is_target.alias("tgt"),
            F.explode(_adjacent_pairs(text_col)).alias("p"),
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
        .transform(_pin_once)  # one-shot multi-consumer pin: feeds raw
        # counts + target counts + scoring (pin_once = single
        # materialization; reliable under the checkpoint knob)
    )
    # ONE grouped aggregate for BOTH distributions (round 15, §2.4): the
    # raw and target bucket counts previously ran as two separate
    # aggregate passes over the pinned frame (two eager pin jobs); a
    # conditional sum folds them into one. Identical values: tc was the
    # flagged-docs Σk left-joined with coalesce(tc, 0), which is exactly
    # Σ when(tgt, k, 0) per bucket (NULL flags fall to 0 on both
    # shapes), and tn gains only zero-valued rows.
    bucket_counts = (
        doc_buckets.groupBy("bucket")
        .agg(
            F.sum("k").alias("rc"),
            F.sum(
                F.when(F.col("tgt"), F.col("k")).otherwise(F.lit(0))
            ).alias("tc"),
        )
        .localCheckpoint(eager=True)  # bounded (n_buckets rows); feeds
        # the ratio join AND the scalar totals
    )
    ratios = (
        bucket_counts.crossJoin(
            F.broadcast(
                bucket_counts.agg(
                    F.sum("rc").alias("rn"), F.sum("tc").alias("tn")
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
        base.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_feats"), F.lit(0))
            .cast("long")
            .alias("n_feats"),
            F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_importance_weights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """DSIR importance weights: per raw document, the hashed-bigram
    log-likelihood ratio toward the ``target`` corpus —
    ``log w(doc) = Σ_f k_f(doc) · [ln p_target(bucket_f) − ln p_raw(bucket_f)]``
    with add-1 smoothing over ``n_buckets`` hashed word-bigram features
    (Xie et al. 2023). Sampling ∝ exp(log_weight) reshapes the raw corpus
    toward the target domain. Returns ``(doc_id, n_feats, log_weight)``
    for every non-null raw doc (featureless docs score 0.0). Composition
    of :func:`dsir_log_ratios` (the model) and :func:`dsir_score`.

    Sizing note: the target should carry at least ~``n_buckets`` bigram
    tokens — on a much smaller target the add-1 smoothing mass dominates
    p_target and every doc scores "unlike the target", flattening (or
    inverting) the ranking. Shrink ``n_buckets`` for tiny targets.

    Scale shape: one pair-explode over the raw corpus for the model's
    bucket distribution and one for scoring (each pinned/bounded), one
    over the (usually far smaller) target; the ``n_buckets``-row ratio
    table broadcasts into the scoring join. No corpus-keyed shuffle ever
    carries text."""
    ratios = dsir_log_ratios(
        df, target, text_col=text_col, n_buckets=n_buckets
    ).transform(_pin)  # honors the reliable-checkpoint knob (pinning.pin)
    return dsir_score(
        df, ratios, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    )


def bigram_doc_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document perplexity under an add-1-smoothed bigram LM fit on the
    corpus itself — the CCNet/KenLM-style fluency gate (typical-text docs
    score low; rare-construction, shuffled, or off-distribution docs score
    high). ``p(b|a) = (c(a,b)+1) / (c(a·)+V)`` with V = distinct tokens in
    bigram positions; returns ``(doc_id, n_bigrams, avg_nll, ppl)`` for
    every doc with ≥ 1 bigram, ``ppl = exp(avg_nll)``.

    Scale shape: the corpus pair-explodes ONCE into a pinned (doc, a, b)
    count frame that feeds the model aggregates AND the scoring join (the
    bigram_pmi lesson: the interpreted pair transform dominates, never run
    it twice); the model tables are vocabulary-sized with map-side
    partials; scoring is one gram-keyed join plus a doc aggregate. Rounded
    6dp so cross-engine libm/summation-order drift cannot flip the hash
    (same discipline as token_entropy)."""
    dp = (
        _ensure_parallelism(df.filter(F.col(text_col).isNotNull()))
        .select(
            F.col(id_col).alias("id"),
            F.explode(_adjacent_pairs(text_col)).alias("p"),
        )
        .groupBy("id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=True)  # feeds model AND scoring
    )
    big = dp.groupBy("a", "b").agg(F.sum("k").alias("cab"))
    ctx = big.groupBy("a").agg(F.sum("cab").alias("ca"))
    vocab = (
        dp.select(F.col("a").alias("w"))
        .unionByName(dp.select(F.col("b").alias("w")))
        .agg(F.countDistinct("w").alias("v"))
    )
    nll = -F.log((F.col("cab") + 1) / (F.col("ca") + F.col("v")))
    return (
        dp.join(big, ["a", "b"])
        .join(ctx, "a")
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(F.col("k") * nll) / F.sum("k"), 6
            ).alias("avg_nll"),
            F.round(
                F.exp(F.sum(F.col("k") * nll) / F.sum("k")), 6
            ).alias("ppl"),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "avg_nll", "ppl")
    )


def fit_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
    lr: float = 1.0,
    prec: int = 8,
) -> list[float]:
    """Full-batch gradient-descent logistic regression with a FIXED
    iteration count — returns ``[bias, w_1, .., w_d]`` after ``iters``
    rounds. The quality-classifier fit of the CCNet/fastText curation
    recipe, reduced to its verifiable core: each round is ONE distributed
    aggregate (d+1 averaged gradient moments, map-side partial), the
    weight vector lives driver-side as d+1 bounded scalars (the kmeans
    centroid contract), and weights are ROUNDED to ``prec`` decimals per
    round so float-sum merge order can't leak into the result — which
    lets a SQL oracle unroll the identical iterations as chained CTEs
    (the pagerank discipline applied to gradient descent).

    Update: w ← round(w − lr · avg((σ(w·x) − y) · x), prec) with x
    bias-augmented. At 100 TB: iters scans of a persisted narrow feature
    frame (callers persist; the catalog query does), zero shuffles — a
    gradient is a pure map-side-combinable average."""
    xs = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    w = [0.0] * (len(xs) + 1)
    for _ in range(iters):
        z = F.lit(w[0])
        for wj, xj in zip(w[1:], xs):
            z = z + F.lit(wj) * xj
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        grads = [F.avg(p - y)] + [F.avg((p - y) * xj) for xj in xs]
        row = df.agg(*[g.alias(f"g{i}") for i, g in enumerate(grads)]).first()
        if row["g0"] is None:
            raise ValueError(
                "fit_logreg: empty input frame — cannot average a gradient "
                "over zero rows (the fit_value_histogram empty-input contract)"
            )
        w = [
            _round_half_up(wj - lr * row[f"g{i}"], prec)
            for i, wj in enumerate(w)
        ]
    return w


def _round_half_up(x: float, prec: int) -> float:
    """Half-AWAY-from-zero rounding of a double, matching Spark F.round
    and DuckDB round() — NOT Python's builtin round (banker's half-even),
    whose tie behavior would diverge from the SQL oracle exactly at the
    per-round rounding boundaries the discipline exists to pin."""
    import decimal

    q = decimal.Decimal(1).scaleb(-prec)
    return float(
        decimal.Decimal(x).quantize(q, rounding=decimal.ROUND_HALF_UP)
    )


def logreg_decision(weights: list[float], feature_cols: list[str]) -> Column:
    """w·x > 0 decision expression (σ(z) > 0.5 ⇔ z > 0 — no exp needed,
    so the comparison is exact given the rounded weights)."""
    z = F.lit(weights[0])
    for wj, c in zip(weights[1:], feature_cols):
        z = z + F.lit(wj) * F.col(c).cast("double")
    return z > 0
