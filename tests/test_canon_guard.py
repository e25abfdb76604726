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
    hash-checkable slot ahead of an oracle-backed one."""
    from dampr_spark.plans.catalog import (
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
    assert ranks == sorted(ranks), "catalog order must be rank-sorted"
    # History parsing actually found the driver's recorded rounds.
    assert len(hist) >= 92
