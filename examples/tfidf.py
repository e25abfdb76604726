"""TF-IDF macro-benchmark — port of the reference benchmark
(benchmarks/tf-idf-dampr.py) onto the Spark-backed fluent API:
read → flat_map(per-line distinct words) → count (map-side combine via
reduceByKey) → broadcast cross with the corpus line count → sink TSV.

BASELINE.md lists this pipeline as the macro-benchmark target. The
DataFrame-native equivalent (one declarative plan, whole-stage codegen)
is the catalog query ``tfidf`` (dampr_spark/plans/textops.py).

Usage: python examples/tfidf.py <textfile> [outdir]
"""

import math
import re
import sys

from dampr_spark.api import Dampr

RX = re.compile(r"[^\w]+")


def build(fname: str):
    docs = Dampr.text(fname)

    doc_freq = docs.flat_map(lambda x: set(RX.split(x.lower()))).count()

    idf = doc_freq.cross_right(
        docs.len(),
        lambda df, total: (df[0], df[1], math.log(1 + (float(total) / df[1]))),
        memory=True,  # broadcast the (single-row) corpus length
    )
    return idf


def main(fname: str, outdir: str = "/tmp/idfs") -> None:
    build(fname).sink_tsv(outdir).run()


if __name__ == "__main__":
    main(*sys.argv[1:])
