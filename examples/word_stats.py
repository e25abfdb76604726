"""Word stats — port of the reference example (examples/word-stats.py): a
multi-output DAG sharing one root (the tokenized stream), with counts,
totals, a character-length histogram, and an average computed via join.

The reference's "best single real query" (SURVEY §5): it exercises shared
subgraphs, fold_bys, sort_by, and a join in one program.

Usage: python examples/word_stats.py <textfile-or-dir>
"""

import sys

from dampr_spark.api import Dampr


def build(fname: str):
    """Return the four pipelines (total_count, top_words, word_lengths,
    avg_word_lengths) so tests can run them without printing."""
    words = Dampr.text(fname).flat_map(lambda line: line.split())

    # Most frequent words; .checkpoint() persists the shared root so the
    # four consumers don't re-tokenize (same user-facing rule as the
    # reference's checkpoint, dampr/dampr.py:128-153).
    top_words = words.count(lambda x: x).checkpoint().sort_by(
        lambda word_count: -word_count[1]
    )

    total_count = top_words.fold_by(
        key=lambda _word: 1, value=lambda x: x[1], binop=lambda x, y: x + y
    )

    word_lengths = top_words.fold_by(
        lambda tc: len(tc[0]), value=lambda tc: tc[1], binop=lambda x, y: x + y
    ).sort_by(lambda cl: cl[0])

    avg_word_lengths = (
        word_lengths.map(lambda wl: wl[0] * wl[1])
        .a_group_by(lambda _x: 1)
        .sum()
        .join(total_count)
        .reduce(lambda awl, tc: next(awl)[1] / float(next(tc)[1]))
    )
    return total_count, top_words, word_lengths, avg_word_lengths


def main(fname: str) -> None:
    total_count, top_words, word_lengths, avg_word_lengths = build(fname)
    tc, tw, wl, awl = Dampr.run(
        total_count, top_words, word_lengths, avg_word_lengths
    )

    print()
    print("*" * 10)
    print("Word Stats")
    print("*" * 10)
    print("Total Words Found: ", tc.read(1)[0][1])

    print("\nTop 10 words")
    for word, count in tw.read(10):
        print(word, count)

    print("\nCharacter histogram")
    for cl, length in wl.read(20):
        print(cl, length)

    print("\nAverage Word Length: ", awl.read(1)[0][1])


if __name__ == "__main__":
    main(sys.argv[1])
