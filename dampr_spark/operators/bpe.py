"""Distributed BPE tokenizer training.

Byte-pair encoding is THE tokenizer-training workload of an LLM data
platform, and its scalable formulation is not "iterate over the corpus":
one corpus-size scan builds the weighted word vocabulary, and every merge
round after that operates on the VOCABULARY (distinct words × their symbol
sequences, weighted by count) — millions of rows at web scale, not
billions. That is how production trainers (e.g. the HuggingFace tokenizers
design) stay tractable, re-expressed here as Spark plans:

1. ``word_counts`` — explode + groupBy: the only corpus-size shuffle.
2. per merge round — pair counts are a vocab-size explode + aggregate; the
   winning pair is a 1-row TakeOrdered (count desc, then lexicographic —
   fully deterministic); the merge itself rewrites each word's symbol
   array in an Arrow-batched pandas pass (per-word loop, vocab-side only).
   Each round eagerly checkpoints the vocab so round N never replays
   rounds 1..N-1.
3. ``apply_bpe`` — tokenizing the corpus afterwards is a broadcast join on
   the word, NOT a re-run of the merge logic per document.

Deterministic (no RNG, no hash seeds) but iterative list rewriting is not
SQL-expressible, so the catalog registers the merge table rows-only; the
first round IS expressible and `bpe_round1_check` oracle-verifies it, and
tests/test_bpe.py pins the full merge sequence against a pure-Python
reference implementation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VOCAB_SCHEMA = "word string, cnt long, syms array<string>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace tokens — the one corpus-size pass."""
    from dampr_spark.operators.dedup import _ensure_parallelism

    d = _ensure_parallelism(df.filter(F.col(text_col).isNotNull()))
    return (
        d.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_word(syms: list[str], left: str, right: str) -> list[str]:
    """One merge applied to one symbol sequence — shared by training
    (_merge_pass) and application (apply_bpe) so the two can never
    desynchronize on edge handling."""
    i, new = 0, []
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            new.append(left + right)
            i += 2
        else:
            new.append(syms[i])
            i += 1
    return new


def _train_local(
    wc: dict[str, int], n_merges: int, min_pair_count: int
) -> list[tuple[str, str, int]]:
    """Driver-side merge loop over a collected weighted vocab — identical
    semantics to the distributed rounds (same counting, same
    (count desc, pair asc) selection, same _merge_word)."""
    vocab = {w: list(w) for w in wc}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            n = wc[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        if not pc:
            break
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((left, right, cnt))
        for w in vocab:
            vocab[w] = _merge_word(vocab[w], left, right)
    return merges


def _merge_pass(left: str, right: str):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["syms"] = [_merge_word(list(s), left, right) for s in pdf["syms"]]
            yield pdf

    return run


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_pair_count: int = 2,
    local_vocab_limit: int = 100_000,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list [(left, right, weighted_count), ...]. Stops early
    when the best remaining pair's weighted count drops below
    ``min_pair_count``. Ties break lexicographically on (left, right) —
    deterministic across runs, partitionings, and engines.

    Fast path: when the distinct-word vocabulary fits under
    ``local_vocab_limit`` rows, the weighted vocab is collected ONCE and
    the merge loop runs driver-side — the production trainer design (the
    corpus is scanned exactly once either way; a web-scale vocab is
    millions of rows, a few hundred MB — far under driver memory, while
    per-round Spark jobs cost ~1s each × thousands of merges). Vocabs over
    the limit take the fully-distributed per-round path. Both paths apply
    the identical ``_merge_word`` and tie-break, so the learned sequence is
    THE SAME (pinned by tests/test_bpe.py)."""
    # ONE eager materialization serves the routing count, the local-path
    # collect, and the distributed rounds alike.
    vocab = (
        word_counts(df, text_col)
        .select("word", "cnt", F.split(F.col("word"), "").alias("syms"))
        .localCheckpoint(eager=True)
    )
    if vocab.count() <= local_vocab_limit:
        rows = vocab.select("word", "cnt").collect()
        return _train_local(
            {r["word"]: int(r["cnt"]) for r in rows}, n_merges, min_pair_count
        )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = vocab.select(
            "cnt",
            F.explode(
                F.when(
                    F.size("syms") > 1,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("l"),
                            F.element_at("syms", i + 1).alias("r"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        left, right, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((left, right, n))
        vocab = vocab.mapInPandas(
            _merge_pass(left, right), schema=_VOCAB_SCHEMA
        ).localCheckpoint(eager=True)
    return merges


def apply_bpe(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Tokenize one word with a learned merge list (reference application;
    corpus tokenization joins the vocab table instead of calling this per
    document)."""
    syms = list(word)
    for left, right, _ in merges:
        syms = _merge_word(syms, left, right)
    return syms


def tokenize_corpus(
    df: DataFrame, merges: list[tuple[str, str, int]], text_col: str = "text"
) -> DataFrame:
    """(word, cnt, tokens) for the corpus vocabulary under the learned
    merges — the broadcast-join tokenization path: documents join this
    table on the word; no per-document merge loops ever run."""
    wc = word_counts(df, text_col)
    m = merges

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["tokens"] = [apply_bpe(w, m) for w in pdf["word"]]
            yield pdf

    return wc.mapInPandas(run, schema="word string, cnt long, tokens array<string>")
