"""Round-15 fixes — pure-logic tests (no Spark session needed).

1. bench.py's compact-line shed order: the driver's PERF per-query
   comparison was blind in r14 because the 72-query compact line shed the
   NAMED ``queries`` map down to the nameless ``queries_v`` array. The
   round-15 shed order drops verbose-duplicated provenance extras first
   and keeps the names (the bench contract's ``{"queries": {name: sec}}``)
   whenever they can possibly fit in the driver's 2000-char tail capture.
"""

from __future__ import annotations

import json

from bench import BENCH_QUERIES, shed_compact_line


def _compact(cold: dict, **extra) -> dict:
    c = {
        "metric": "dampr_spark_bench_total",
        "value": round(sum(cold.values()), 4),
        "unit": "sec",
        "n_queries": len(cold),
        "queries": {q: round(t, 2) for q, t in cold.items()},
        "warm_total": 91.2738,
        "cold_total_r3_queryset": 30.9642,
        "warm_total_r3_queryset": 20.948,
        "calibration_sec": 0.3774,
        "corpus": [5000, 270704, 8, 14002, 2000, 100000, 600000],
        "anchor_norm": 34.967,
        "sf": 0.1,
    }
    c.update(extra)
    return c


def _typical_cold() -> dict:
    # Realistic per-query spread: mostly ~1s, a few heavies >= 10s.
    cold = {q: 1.27 for q in BENCH_QUERIES}
    cold["curate_training_slice_v2"] = 15.31
    cold["lsh_band_audit"] = 8.02
    return cold


def test_named_queries_survive_at_full_query_count():
    cold = _typical_cold()
    line = shed_compact_line(
        _compact(cold, anchor_watch=["bloom_join_prune"]),
        cold,
        [],
        [],
    )
    assert len(line) <= 1990
    d = json.loads(line)
    # The bench contract keys.
    assert d["metric"] == "dampr_spark_bench_total"
    assert d["unit"] == "sec"
    assert d["sf"] == 0.1
    # The r15 fix: every query appears BY NAME.
    assert set(d["queries"]) == set(BENCH_QUERIES)
    assert "queries_v" not in d
    # 1-decimal shed keeps values meaningful.
    assert d["queries"]["curate_training_slice_v2"] in (15.3, 15.31)


def test_shed_drops_provenance_before_names():
    cold = _typical_cold()
    line = shed_compact_line(_compact(cold), cold, [], [])
    d = json.loads(line)
    # corpus/anchor_norm/r3-subtotals shed before the named map does;
    # whatever was dropped here must still exist in the verbose payload
    # (bench.py writes them there unconditionally).
    assert "queries" in d
    assert "corpus" not in d  # first to shed at this width


def test_small_record_sheds_nothing():
    cold = {q: 1.0 for q in list(BENCH_QUERIES)[:5]}
    compact = _compact(cold)
    line = shed_compact_line(dict(compact), cold, [], [])
    assert json.loads(line) == compact


def test_anchor_names_collapse_to_counts_when_tight():
    cold = _typical_cold()
    regressed = [f"anchor_query_with_a_long_name_{i}" for i in range(6)]
    line = shed_compact_line(
        _compact(cold, anchor_regressed=list(regressed)),
        cold,
        regressed,
        [],
    )
    assert len(line) <= 1990
    d = json.loads(line)
    # Names fit only once the anchor list collapses to its count.
    assert d["anchor_regressed"] == 6
    assert set(d["queries"]) == set(BENCH_QUERIES)


def test_pathological_width_still_emits_parseable_line():
    # Force the last-resort path with absurdly long names.
    names = [f"q_{'x' * 120}_{i}" for i in range(72)]
    cold = {n: 1.0 for n in names}
    line = shed_compact_line(_compact(cold), cold, [], [])
    assert len(line) <= 1990
    d = json.loads(line)
    assert d["metric"] == "dampr_spark_bench_total"
    # Named map cannot fit; the nameless array is the documented fallback.
    assert "queries" not in d and "queries_v" in d
