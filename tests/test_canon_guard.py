"""Guard against the driver-canonicalization failure mode seen in round 1:
the external correctness driver canonicalizes query output with a pandas
``sort_values`` over every column, which throws ``TypeError: unhashable
type: 'list'`` on array/map-typed columns (CORRECTNESS_r01:
unique_per_group, multimodal_features). Every catalog query's *registered*
output must therefore be scalar-only — array-returning operators stay
available in the library, but the catalog projection must digest them.

Two layers:
1. static — no ArrayType/MapType/StructType in any catalog output schema;
2. empirical — a sample of real rows survives the driver's canon shape
   (``pdf.sort_values(list(pdf.columns))``).
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from dampr_spark.plans import all_queries

_QUERIES = all_queries()
_NAMES = sorted(_QUERIES)

_UNSORTABLE = (ArrayType, MapType, StructType)


@pytest.mark.parametrize("name", _NAMES)
def test_catalog_output_is_driver_canonicalizable(spark, sf_dir, name):
    df = _QUERIES[name].builder(spark, sf_dir)

    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, _UNSORTABLE)]
    assert not bad, (
        f"{name}: columns {bad} are array/map/struct-typed — the driver's "
        "pandas canonicalizer cannot sort them; emit a scalar digest "
        "(concat_ws / aggregate-sum) in the catalog projection instead"
    )

    pdf = df.limit(20).toPandas()
    # The driver's canon: lexicographic sort over every column. If this
    # throws, the driver's correctness check ERRs for this query.
    pdf.sort_values(list(pdf.columns))


def test_window_ordering_prefers_unchecked_oracles():
    """The driver checks only the first 50 queries: every oracle-backed
    query WITHOUT a recorded driver-green row must outrank every
    previously-green one, and rows-only queries must never occupy a
    hash-checkable slot ahead of an oracle-backed one — EXCEPT the TWO
    rotated rows-only entries at slots 49-50 (round 7 bumped the rotation
    from one to two per round now the oracle-backed backlog is empty;
    VERDICT r6 next-round #3)."""
    from dampr_spark.plans.catalog import (
        _DRIVER_WINDOW,
        _driver_green_history,
        all_queries,
    )

    qs = list(all_queries().values())
    hist = _driver_green_history()

    def rank(q):
        if q.oracle is None:
            return 2
        return 1 if q.name in hist else 0

    ranks = [rank(q) for q in qs]
    for slot in (_DRIVER_WINDOW - 1, _DRIVER_WINDOW - 2):
        assert qs[slot].oracle is None, "slots 49-50 must hold rotated rows-only"
        del ranks[slot]
    assert ranks == sorted(ranks), "catalog order must be rank-sorted"
    # History parsing actually found the driver's recorded rounds.
    assert len(hist) >= 92


def test_merge_green_rounds_keeps_latest_round():
    """Synthetic history: the merge keeps the LATEST hash-green round per
    name, ignores non-green rows, and seeds static-only names at round 0
    (maximally stale)."""
    from dampr_spark.plans.catalog import _merge_green_rounds

    rounds = {
        1: {"a": {"hash_match": True}, "b": {"hash_match": True}},
        3: {"b": {"hash_match": True}, "c": {"hash_match": True}},
        4: {"c": {"hash_match": False}, "d": {"hash_match": True}},
    }
    hist = _merge_green_rounds(rounds, seed=frozenset({"e", "a"}))
    assert hist == {"a": 1, "b": 3, "c": 3, "d": 4, "e": 0}


def test_window_refill_orders_stalest_green_first():
    """Within the previously-green rank, refill slots go to the
    longest-unchecked queries first: testdata regenerates every round, so a
    green from r1 is the likeliest to have silently rotted. The catalog
    order must be non-decreasing in last-green round across rank 1."""
    from dampr_spark.plans.catalog import _driver_green_history, all_queries

    qs = list(all_queries().values())
    hist = _driver_green_history()
    green_rounds = [
        hist[q.name] for q in qs if q.oracle is not None and q.name in hist
    ]  # the rotated rows-only slot-50 entry has oracle None, so it drops out
    assert green_rounds == sorted(green_rounds), (
        "rank-1 refill must be staleness-ordered (oldest last-green first)"
    )
    # With the real CORRECTNESS_r*.json history this test has teeth: greens
    # span multiple rounds, so a registration-ordered refill would fail.
    assert len(set(green_rounds)) >= 2
