"""BPE training: full merge-sequence agreement with a pure-Python reference,
determinism, and the vocab-join tokenization path."""

from __future__ import annotations

from collections import Counter

from dampr_spark.operators.bpe import apply_bpe, tokenize_corpus, train_bpe


def _ref_bpe(texts, n_merges, min_count=2):
    wc = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        # count desc, then lexicographic on (left, right)
        (left, right), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((left, right, n))
        for w, syms in vocab.items():
            i, new = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    new.append(left + right)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[w] = new
    return merges, vocab


TEXTS = [
    "lower lower lowest newer newer newer wider wide widen",
    "low low low lowly newly news widest wide er er",
    "single",
]


def test_train_bpe_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = train_bpe(df, n_merges=6)
    want, _ = _ref_bpe(TEXTS, 6)
    assert got == want


def test_train_bpe_deterministic_across_partitionings(spark):
    df1 = spark.createDataFrame([(t,) for t in TEXTS], "text string").repartition(1)
    df8 = spark.createDataFrame([(t,) for t in TEXTS], "text string").repartition(8)
    assert train_bpe(df1, n_merges=5) == train_bpe(df8, n_merges=5)


def test_apply_bpe_matches_trained_vocab(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = train_bpe(df, n_merges=6)
    _, ref_vocab = _ref_bpe(TEXTS, 6)
    for w, syms in ref_vocab.items():
        assert apply_bpe(w, merges) == syms, w


def test_tokenize_corpus_join_path(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = train_bpe(df, n_merges=6)
    tok = {r.word: list(r.tokens) for r in tokenize_corpus(df, merges).collect()}
    _, ref_vocab = _ref_bpe(TEXTS, 6)
    assert tok == ref_vocab


def test_min_pair_count_stops_early(spark):
    df = spark.createDataFrame([("ab cd",)], "text string")
    # every pair occurs once -> below min_pair_count=2 -> no merges
    assert train_bpe(df, n_merges=5, min_pair_count=2) == []


def test_local_and_distributed_paths_agree(spark):
    """Forcing the distributed per-round path (local_vocab_limit=0) must
    learn the identical merge sequence as the driver-side fast path."""
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    local = train_bpe(df, n_merges=6)  # vocab far under the default limit
    dist = train_bpe(df, n_merges=6, local_vocab_limit=0)
    assert local == dist
