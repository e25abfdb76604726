"""Connected components: fixpoint convergence on adversarial shapes (chains,
stars, disjoint unions) and agreement with a Python union-find model."""

from __future__ import annotations

import random

from dampr_spark.operators.graph import connected_components, degrees


def _dsu_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_chain_converges_past_fixed_rounds(spark):
    """A 12-node path has diameter 11 — far past the dedup pipeline's
    3-round default; the fixpoint loop must still collapse it to one
    component labeled by the minimum id."""
    edges = [(i, i + 1) for i in range(11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(12)}


def test_star_and_disjoint_components(spark):
    edges = [(100, i) for i in range(101, 106)] + [(7, 8), (8, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert all(got[i] == 100 for i in range(100, 106))
    assert got[7] == got[8] == got[9] == 7


def test_random_graph_matches_union_find(spark):
    rng = random.Random(9)
    nodes = list(range(60))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    want = _dsu_components(edges)
    assert got == want


def test_null_endpoints_dropped_and_degrees(spark):
    edges = [(1, 2), (2, 3), (None, 4), (5, None)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}
    deg = {r.id: r.degree for r in degrees(df).collect()}
    assert deg == {1: 1, 2: 2, 3: 1}


def test_non_convergence_raises(spark):
    import pytest as _pytest

    edges = [(i, i + 1) for i in range(11)]  # diameter 11 > max_iters 3
    df = spark.createDataFrame(edges, "src long, dst long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iters=3)
