#!/usr/bin/env python
"""Capture .explain("formatted") for bench queries into plans/<round>/.

Usage: python benchmarks/capture_plans.py <suffix> [query ...]
With no query names, captures every BENCH_QUERIES entry. Builders with
eager pins execute their pin jobs during build; the captured plan is the
final (post-pin) plan — the same artifact the round-12/13 plan locks
assert against.

Round dir defaults to plans/r15; override with $SPARK_GRAFT_PLAN_DIR.
The capture uses the PUBLIC ``df.explain("formatted")`` (stdout
redirect) instead of the private ``PythonSQLUtils.explainString`` JVM
path (ADVICE r14: the private path does not exist under Spark Connect
and can shift across pyspark versions).
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import BENCH_QUERIES  # noqa: E402

from dampr_spark.plans import all_queries  # noqa: E402
from dampr_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    """Public-API plan capture: redirect df.explain's stdout."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__.strip().splitlines()[2], file=sys.stderr)
        return 2
    suffix = sys.argv[1]
    names = sys.argv[2:] or list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLAN_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r15",
        ),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    catalog = all_queries()
    for name in names:
        try:
            df = catalog[name].builder(spark, sf_dir)
            plan = explain_formatted(df)
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name}_{suffix}", file=sys.stderr)
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
