"""Repo-wide PLAN quality gate: every registered catalog query's physical
plan must be free of the two classic scale killers —

1. ``CartesianProduct`` — an unbroadcast cross join materializes |A|·|B|
   rows through a shuffle; at corpus scale that is a non-starter. Cross
   joins against one-row/bounded frames compile to
   ``BroadcastNestedLoopJoin`` instead, which is fine and NOT flagged.
2. ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan means
   per-row pickle round-trips (~10-100× slower than Arrow). The allowed
   Python escape hatches are the vectorized ones (``ArrowEvalPython``,
   ``MapInPandas`` / ``FlatMapGroupsInPandas``), which this gate
   deliberately permits.

The gate builds each query at the test scale and inspects the pre-AQE
physical plan (``sparkPlan``) — builders that execute driver-side steps
(k-means fit, BPE rounds) run them at sf0.001-class cost, so the whole
sweep stays cheap. A deliberate O(N²) baseline must be whitelisted here
WITH its justification; an empty whitelist is the goal state.
"""

from __future__ import annotations

import pytest

from dampr_spark.plans import all_queries

# name -> why a CartesianProduct is acceptable there (test-scale oracle
# anchors only; the scale path for each is a different registered query)
_CARTESIAN_OK: dict[str, str] = {}

_ALL = sorted(all_queries())


@pytest.mark.parametrize("name", _ALL)
def test_plan_has_no_cartesian_or_rowwise_python(spark, sf_dir, name):
    q = all_queries()[name]
    df = q.builder(spark, sf_dir)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    if "CartesianProduct" in plan and name not in _CARTESIAN_OK:
        pytest.fail(f"{name}: CartesianProduct in physical plan")
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
