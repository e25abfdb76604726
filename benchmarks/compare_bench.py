"""Cross-round bench-record comparator: per-query calibration-normalized
warm deltas between two verbose bench records (last_bench_verbose.json /
bench_sf1_r{N}.json / any SPARK_GRAFT_BENCH_OUT file).

The sf1.0 record exists so regressions are detectable at the next decade
too (VERDICT r9 #5); this is the reader for it. Normalization: each
query's warm median divides by its run's whole-run ``calibration_sec``
(comparable across rounds — the run-level sandwich workload has been
50M rows since round 6), so host drift cancels to first order. Flags:

- ``ratio`` = norm_new / norm_old; > --flag-ratio (default 1.5) AND an
  absolute warm delta > max(0.1, 0.5 * old_warm) prints as REGRESSED
  (the anchor gate's scaled-floor rule — sub-floor breaches print as
  watch), < 1/flag-ratio prints as improved.
- Queries present in only one record are listed separately (catalog
  growth is expected round-over-round).

Usage:
  PYTHONPATH=/root/repo python benchmarks/compare_bench.py OLD.json NEW.json
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os


def _gate_class():
    """bench.gate_class — the ONE flagging predicate, imported by path so
    this comparator can never drift from the per-run anchor gate
    (round-10 review finding: the rule was duplicated here)."""
    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench.gate_class


def load(path: str) -> tuple[dict, float]:
    with open(path) as f:
        v = json.load(f)
    return v["queries_warm"], float(v["calibration_sec"])


def compare(old_path: str, new_path: str, flag_ratio: float = 1.5) -> dict:
    gate = _gate_class()
    old_w, old_cal = load(old_path)
    new_w, new_cal = load(new_path)
    shared = sorted(set(old_w) & set(new_w))
    regressed, watch, improved = [], [], []
    rows = []
    for q in shared:
        no, nn = old_w[q] / old_cal, new_w[q] / new_cal
        ratio = nn / no if no > 0 else float("inf")
        rows.append((q, old_w[q], new_w[q], round(ratio, 2)))
        cls = gate(no, nn, old_w[q], new_w[q], ratio=flag_ratio)
        if cls == "regressed":
            regressed.append(q)
        elif cls == "watch":
            watch.append(q)
        elif ratio < 1.0 / flag_ratio:
            improved.append(q)
    return {
        "old": old_path,
        "new": new_path,
        "old_cal": old_cal,
        "new_cal": new_cal,
        "n_shared": len(shared),
        "regressed": regressed,
        "watch": watch,
        "improved": improved,
        "only_old": sorted(set(old_w) - set(new_w)),
        "only_new": sorted(set(new_w) - set(old_w)),
        "rows": rows,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--flag-ratio", type=float, default=1.5)
    ap.add_argument("--full", action="store_true", help="print every row")
    args = ap.parse_args()
    r = compare(args.old, args.new, args.flag_ratio)
    print(
        f"{r['n_shared']} shared queries; calibration {r['old_cal']:.3f} -> "
        f"{r['new_cal']:.3f}"
    )
    for label in ("regressed", "watch", "improved", "only_old", "only_new"):
        if r[label]:
            print(f"{label}: {r[label]}")
    if args.full:
        for q, ow, nw, ratio in sorted(r["rows"], key=lambda t: -t[3]):
            print(f"  {q}: {ow:.2f} -> {nw:.2f}  (norm ratio {ratio})")
    return 1 if r["regressed"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
