"""Text-analysis functions for large-scale training-data pipelines.

The reference has no scalar function library (SURVEY §2.3 — all scalar compute
is user lambdas); this module is the extension layer: language-ID, quality
scoring, token counting, fingerprinting — each as a *JVM-side column
expression* (no Python UDF in the hot path) with a matching DuckDB SQL
generator so every function is oracle-checkable.

Design note for 100 TB: every function here is a pure projection — it fuses
into whatever scan/filter stage precedes it under WholeStageCodegen, adds no
shuffle, and vectorizes. A Python UDF doing the same work would add a
serialize→python→deserialize hop per batch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/keyword language-ID heuristic.
# Deterministic tie-break: first language in this tuple wins ties.
LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "a", "of", "and", "to", "is")),
    ("de", ("der", "die", "das", "und", "ist", "nicht")),
    ("fr", ("le", "la", "et", "les", "des", "est")),
    ("es", ("el", "los", "las", "es", "una", "que")),
    ("zh", ("的", "是", "了", "在", "我", "有")),
)

STOPWORDS: tuple[str, ...] = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

PUNCT_CLASS = r"[.,!?;:]"


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization as an array column."""
    return F.split(F.col(col), " ")


def token_count(col: str = "text") -> Column:
    """Token count (whitespace tokenizer), as BIGINT."""
    return F.size(tokens(col)).cast("long")


def adjacent_token_pairs(col: str = "text") -> Column:
    """Non-distinct adjacent token pairs (whitespace tokenizer) as
    ``array<struct<a,b>>``, empty for docs under 2 tokens — THE shared
    bigram expression (DSIR features, PMI, context n-grams).

    O(n) in document length (round 14): the previous per-site
    ``transform(sequence(1, n-1), i -> element_at(toks, i) ...)`` shape
    re-evaluated the SPLIT inside the lambda for every element
    (subexpression elimination does not reach into higher-order-function
    bodies), making every bigram pass quadratic — measured 45 s for ONE
    20k-token document, i.e. hours for a single long web doc at corpus
    scale. ``zip_with`` over two slices binds both arrays once and
    iterates.

    The ``when`` guard stays required: ``F.sequence(1, 0)`` DESCENDS and
    a single-token doc would index out of bounds under ANSI (the
    bigram_pmi lesson) — here it also keeps slice lengths non-negative."""
    toks = tokens(col)
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def word_ngram_strings(col: str | Column, n: int) -> Column:
    """Non-distinct word ``n``-grams in positional order as
    ``array<string>`` — THE shared n-gram string expression (Jaccard
    postings, contamination grams, heavy-hitter counting, repetition
    scoring). ``greatest(len-(n-1), 1)`` semantics: a doc shorter than
    ``n`` tokens yields ONE truncated gram (the whole doc).

    O(n·len), the :func:`adjacent_token_pairs` discipline generalized
    (round 14): the previous per-site
    ``transform(sequence(1, cnt), i -> concat_ws(' ', slice(toks, i, n)))``
    re-evaluated the SPLIT inside the lambda for every element
    (subexpression elimination does not reach into higher-order-function
    bodies), making every n-gram pass QUADRATIC in document length —
    measured 5-7× at 200-token docs and unboundedly worse for single
    long web documents at corpus scale. Here each of the ``n`` offset
    slices binds the tokens array once; ``zip_with`` folds them into
    gram strings. ``zip_with`` pads the shorter slice with NULL and
    ``concat_ws`` skips NULLs, which reproduces ``slice``'s
    end-of-array truncation exactly (the short-doc gram).

    NULL input text propagates as a NULL array (callers either filter
    NULLs first or coalesce — :func:`~dampr_spark.operators.dedup.word_ngrams`
    preserves its historical NULL→[] contract that way)."""
    toks = F.split(col if isinstance(col, Column) else F.col(col), " ")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    g = F.slice(toks, 1, cnt)
    for k in range(1, n):
        g = F.zip_with(
            g,
            F.slice(toks, k + 1, cnt),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return g


def token_count_sql(col: str = "text") -> str:
    return f"CAST(len(string_split({col}, ' ')) AS BIGINT)"


def _marker_score(col: str, markers: tuple[str, ...]) -> Column:
    toks = tokens(col)
    in_set = F.array([F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(in_set, t))).cast("long")


def _marker_score_sql(col: str, markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"CAST(len(list_filter(string_split({col}, ' '), t -> t IN ({lst}))) AS BIGINT)"


def lang_id(col: str = "text") -> Column:
    """Language-ID heuristic: count marker-stopword hits per language, argmax
    with deterministic tie-break (LANG_MARKERS order); no hits → 'unknown'.

    At scale this is one pass over the token array per language — constant
    column work, no shuffle. Swap in a real classifier via mapInPandas if a
    model is available; the pipeline shape doesn't change.
    """
    scores = [(lang, _marker_score(col, m)) for lang, m in LANG_MARKERS]
    best = None
    # Build CASE WHEN s_i > 0 AND s_i >= all-later-and-strictly-greater-than-
    # earlier... simpler: fold left keeping (best_lang, best_score); earlier
    # languages win ties because we use strict > for replacement.
    best_lang, best_score = F.lit(LANG_MARKERS[0][0]), scores[0][1]
    for lang, s in scores[1:]:
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    best = F.when(best_score > 0, best_lang).otherwise(F.lit("unknown"))
    return best


def lang_id_sql(col: str = "text") -> str:
    """DuckDB SQL mirroring :func:`lang_id` exactly (same fold, same
    tie-break)."""
    score_exprs = {lang: _marker_score_sql(col, m) for lang, m in LANG_MARKERS}
    # Fold as nested CASE; strict > replacement == first-wins ties.
    langs = [lang for lang, _ in LANG_MARKERS]
    best_lang = f"'{langs[0]}'"
    best_score = score_exprs[langs[0]]
    for lang in langs[1:]:
        s = score_exprs[lang]
        best_lang = f"CASE WHEN {s} > {best_score} THEN '{lang}' ELSE {best_lang} END"
        best_score = f"CASE WHEN {s} > {best_score} THEN {s} ELSE {best_score} END"
    return f"CASE WHEN {best_score} > 0 THEN {best_lang} ELSE 'unknown' END"


def stopword_ratio(col: str = "text") -> Column:
    toks = tokens(col)
    sw = F.array([F.lit(w) for w in STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.round(n_sw / F.greatest(F.size(toks), F.lit(1)), 6)


def stopword_ratio_sql(col: str = "text") -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS)
    toks = f"string_split({col}, ' ')"
    return (
        f"round(len(list_filter({toks}, t -> t IN ({lst})))"
        f" / greatest(len({toks}), 1), 6)"
    )


def punct_ratio(col: str = "text") -> Column:
    n_punct = F.length(F.regexp_replace(F.col(col), r"[^.,!?;:]", ""))
    return F.round(n_punct / F.greatest(F.length(F.col(col)), F.lit(1)), 6)


def punct_ratio_sql(col: str = "text") -> str:
    return (
        f"round(length(regexp_replace({col}, '[^.,!?;:]', '', 'g'))"
        f" / greatest(length({col}), 1), 6)"
    )


def quality_score(col: str = "text") -> Column:
    """Composite quality heuristic in [0, 1]: rewards medium-length docs,
    penalizes punctuation soup and stopword-free (non-linguistic) text.
    Deterministic arithmetic only — oracle-checkable."""
    n_tok = F.size(tokens(col))
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    sw = stopword_ratio(col)
    sw_score = F.least(sw * 5, F.lit(1.0))
    p_score = F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0))
    return F.round((len_score + sw_score + p_score) / 3, 6)


def quality_score_sql(col: str = "text") -> str:
    n_tok = f"len(string_split({col}, ' '))"
    len_score = f"least({n_tok} / 50.0, 1.0)"
    sw_score = f"least({stopword_ratio_sql(col)} * 5, 1.0)"
    p_score = f"1.0 - least({punct_ratio_sql(col)} * 5, 1.0)"
    return f"round(({len_score} + {sw_score} + {p_score}) / 3, 6)"


def normalized_text(col: str = "text") -> Column:
    """Normalization for fingerprinting: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(F.col(col)), r"\s+", " "))


def normalized_text_sql(col: str = "text") -> str:
    return f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"


def fingerprint(col: str = "text") -> Column:
    """Document fingerprint: md5 of normalized text. md5 is identical across
    Spark and DuckDB, so exact-dedup keys are oracle-checkable (unlike
    engine-specific hash()/xxhash64)."""
    return F.md5(normalized_text(col))


def fingerprint_sql(col: str = "text") -> str:
    return f"md5({normalized_text_sql(col)})"


# --- PII detection / redaction ---------------------------------------------
#
# Patterns are written in the common subset of Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repeats, alternation — no lookaround,
# no backreferences, so BOTH engines compile them identically. At 100 TB the
# Spark side is a codegen'd regexp_replace per row — scan-rate bound, no
# shuffle, the cheapest possible scrubbing pass.

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
PII_IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def pii_counts(col: str = "text") -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) occurrence counts per row."""
    c = F.col(col)
    return (
        F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), F.lit(0))),
        F.size(F.regexp_extract_all(c, F.lit(PII_PHONE_RE), F.lit(0))),
        F.size(F.regexp_extract_all(c, F.lit(PII_IPV4_RE), F.lit(0))),
    )


def redact_pii(col: str = "text") -> Column:
    """Replace emails → [EMAIL], phones → [PHONE], IPv4 → [IP]. Email first:
    a phone-like digit run inside an email local part must not be clobbered
    before the email pattern sees it."""
    c = F.regexp_replace(F.col(col), PII_EMAIL_RE, "[EMAIL]")
    c = F.regexp_replace(c, PII_PHONE_RE, "[PHONE]")
    return F.regexp_replace(c, PII_IPV4_RE, "[IP]")


def pii_counts_sql(col: str = "text") -> tuple[str, str, str]:
    return (
        f"len(regexp_extract_all({col}, '{PII_EMAIL_RE}'))",
        f"len(regexp_extract_all({col}, '{PII_PHONE_RE}'))",
        f"len(regexp_extract_all({col}, '{PII_IPV4_RE}'))",
    )


def redact_pii_sql(col: str = "text") -> str:
    inner = f"regexp_replace({col}, '{PII_EMAIL_RE}', '[EMAIL]', 'g')"
    inner = f"regexp_replace({inner}, '{PII_PHONE_RE}', '[PHONE]', 'g')"
    return f"regexp_replace({inner}, '{PII_IPV4_RE}', '[IP]', 'g')"
