"""Word count — port of the reference example (examples/wc.py) onto the
Spark-backed fluent API. Same pipeline shape: text → flat_map(split) →
fold_by(+1) → sort_by(-count).

Usage: python examples/wc.py <textfile-or-dir>
"""

import sys

from dampr_spark.api import Dampr


def main(fname: str) -> None:
    wc = (
        Dampr.text(fname)
        .flat_map(lambda x: x.split())
        .fold_by(lambda x: x, value=lambda _x: 1, binop=lambda x, y: x + y)
        .sort_by(lambda wc_pair: -wc_pair[1])
    )

    results = wc.run("word-count")
    for k, v in results:
        print(f"{k}: {v}")

    results.delete()


if __name__ == "__main__":
    main(sys.argv[1])
