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


def _numpy_pagerank(edges, iters=4, damping=0.85, prec=10):
    """Direct dense-matrix model of the fixed-iteration update."""
    nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outw = {}
    for a, _, w in edges:
        outw[a] = outw.get(a, 0.0) + w
    r = {v: round(1.0 / n, prec) for v in nodes}
    for _ in range(iters):
        nxt = {v: 0.0 for v in nodes}
        for a, b, w in edges:
            nxt[b] += w / outw[a] * r[a]
        r = {v: round((1.0 - damping) / n + damping * nxt[v], prec) for v in nodes}
    return r


def test_pagerank_matches_direct_model(spark):
    from dampr_spark.operators.graph import pagerank

    edges = [(1, 2, 1.0), (2, 1, 1.0), (2, 3, 2.0), (3, 1, 1.0), (3, 2, 1.0),
             (4, 1, 3.0), (1, 4, 1.0)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {r.id: r.rank for r in pagerank(df, weight="w").collect()}
    want = _numpy_pagerank(edges)
    assert got.keys() == want.keys()
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_pagerank_uniform_on_symmetric_clique(spark):
    """On a clique with equal weights the stationary ranks are uniform —
    every iteration preserves 1/n exactly."""
    from dampr_spark.operators.graph import pagerank

    nodes = list(range(4))
    edges = [(a, b) for a in nodes for b in nodes if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = {r.id: r.rank for r in pagerank(df).collect()}
    assert all(abs(v - 0.25) < 1e-9 for v in ranks.values()), ranks


def test_pagerank_dangling_mass_leaks_documented(spark):
    """1 -> 2 with no out-edge from 2: node 2's mass is dropped (not
    redistributed), so total rank < 1 — the documented contract."""
    from dampr_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    ranks = {r.id: r.rank for r in pagerank(df, iters=2).collect()}
    assert set(ranks) == {1, 2}
    assert sum(ranks.values()) < 1.0
    assert ranks[2] > ranks[1]  # 2 receives 1's mass plus base


def test_triangle_counts_exact(spark):
    from dampr_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4}: every vertex is in C(3,2)=3 triangles; plus a
    # pendant edge (4,5) and a separate triangle-free path 6-7-8.
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges += [(4, 5), (6, 7), (7, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.triangles for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_collapses_dup_and_reversed_edges(spark):
    from dampr_spark.operators.graph import triangle_counts

    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (3, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.triangles for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_label_propagation_two_cliques_with_bridge(spark):
    """Two 4-cliques joined by one bridge edge: LPA must keep them as two
    communities labeled by each clique's min id (the bridge's single vote
    loses to 3 in-clique votes), where CC would merge them."""
    from dampr_spark.operators.graph import connected_components, label_propagation

    c1 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    c2 = [(a, b) for a in range(11, 15) for b in range(11, 15) if a < b]
    edges = c1 + c2 + [(4, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.label for r in label_propagation(df, iters=3).collect()}
    assert {got[i] for i in range(1, 5)} == {1}
    assert {got[i] for i in range(11, 15)} == {11}
    comp = {r.component for r in connected_components(df).collect()}
    assert comp == {1}  # CC merges through the bridge; LPA does not


def test_label_propagation_matches_direct_model(spark):
    """Synchronous-update python replay on a random graph: identical labels
    after the same number of rounds (count-desc, min-label tie-break)."""
    import random

    from dampr_spark.operators.graph import label_propagation

    rng = random.Random(3)
    edges = list({tuple(sorted(rng.sample(range(30), 2))) for _ in range(60)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.label for r in label_propagation(df, iters=3).collect()}

    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {v: v for v in adj}
    for _ in range(3):
        nxt = {}
        for v, ns in adj.items():
            cnt = {lab[v]: 1}  # self-preference vote
            for u in ns:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            nxt[v] = min(cnt, key=lambda l: (-cnt[l], l))
        lab = nxt
    assert got == lab


def test_bfs_distances_path_and_multisource(spark):
    from dampr_spark.operators.graph import bfs_distances

    # Path 0-1-2-3-4 plus a disjoint edge (10, 11).
    edges = [(i, i + 1) for i in range(4)] + [(10, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    one = spark.createDataFrame([(0,)], "id long")
    got = {r.id: r.dist for r in bfs_distances(df, one).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}  # 10, 11 unreachable -> absent

    multi = spark.createDataFrame([(0,), (4,), (10,)], "id long")
    got = {r.id: r.dist for r in bfs_distances(df, multi).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 0, 10: 0, 11: 1}


def test_bfs_distances_non_convergence_raises(spark):
    import pytest

    from dampr_spark.operators.graph import bfs_distances

    edges = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    src_df = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        bfs_distances(df, src_df, max_iters=2)


def _py_kcore(edges, k):
    """Reference peel: iteratively remove vertices with live degree < k;
    return {id: degree within the core}."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a is None or b is None or a == b:
            continue
        adj[a].add(b)
        adj[b].add(a)
    live = set(adj)
    while True:
        drop = {v for v in live if len(adj[v] & live) < k}
        if not drop:
            break
        live -= drop
    return {v: len(adj[v] & live) for v in live}


def test_kcore_chain_peels_clique_survives(spark):
    """Chain 0..5 bridged to a 4-clique: the chain needs MULTIPLE peel
    rounds (each round only exposes the next endpoint), the clique
    survives with in-core degree 3 — and the bridge edge into the clique
    must not count toward core degrees."""
    from dampr_spark.operators.graph import kcore

    clique = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    edges = [(i, i + 1) for i in range(5)] + [(5, 10)] + clique
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.core_degree for r in kcore(df, k=2).collect()}
    assert got == {10: 3, 11: 3, 12: 3, 13: 3}
    got3 = {r.id: r.core_degree for r in kcore(df, k=3).collect()}
    assert got3 == {10: 3, 11: 3, 12: 3, 13: 3}
    assert kcore(df, k=4).count() == 0  # a 4-clique has no 4-core


def test_kcore_matches_python_peel_on_random_graph(spark):
    import random

    from dampr_spark.operators.graph import kcore

    rng = random.Random(17)
    nodes = list(range(40))
    edges = list(
        {(min(a, b), max(a, b)) for a, b in
         ((rng.choice(nodes), rng.choice(nodes)) for _ in range(120)) if a != b}
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    for k in (2, 3, 4):
        got = {r.id: r.core_degree for r in kcore(df, k=k).collect()}
        assert got == _py_kcore(edges, k), f"k={k}"


def test_kcore_collapses_dup_reversed_and_self_edges(spark):
    """A triangle listed with duplicates, reversals, and a self-loop is
    still just a triangle: 2-core degrees are all 2, not inflated."""
    from dampr_spark.operators.graph import kcore

    edges = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1), (None, 2), (3, None)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.core_degree for r in kcore(df, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_validates_k_and_raises_past_max_iters(spark):
    import pytest

    from dampr_spark.operators.graph import kcore

    df = spark.createDataFrame([(i, i + 1) for i in range(6)], "src long, dst long")
    with pytest.raises(ValueError, match="k must be positive"):
        kcore(df, k=0)
    # A 7-node path needs 3 synchronous peel rounds for k=2.
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(df, k=2, max_iters=1)


def test_kcore_oracle_sql_faithful_on_cross_round_peel(spark):
    """Regression for the round-7 advisory: the old recursive-CTE oracle
    lost removals from non-consecutive peel rounds, so a hub whose
    neighbors die in rounds 0 AND 3 wrongly survived with core_degree 1.
    The unrolled-CTE oracle must agree with the Spark peel (and the
    Python reference) on exactly that adversarial shape: hub H -> leaf L
    (dies round 0) and H -> chain end C3 (dies round 3), plus a triangle
    that must survive."""
    import duckdb

    from dampr_spark.operators.graph import kcore
    from dampr_spark.plans.dedupops import _kcore_oracle_sql

    edges = [
        ("H", "L"), ("H", "C3"),
        ("C0", "C1"), ("C1", "C2"), ("C2", "C3"),
        ("T1", "T2"), ("T2", "T3"), ("T1", "T3"),
    ]
    expected = _py_kcore(edges, 2)
    assert expected == {"T1": 2, "T2": 2, "T3": 2}  # hub must peel

    df = spark.createDataFrame(edges, "src string, dst string")
    got_spark = {r.id: r.core_degree for r in kcore(df, k=2).collect()}
    assert got_spark == expected

    con = duckdb.connect()
    con.execute("CREATE TABLE adv(id_a VARCHAR, id_b VARCHAR)")
    con.executemany("INSERT INTO adv VALUES (?, ?)", edges)
    sql = _kcore_oracle_sql(2, 8, pairs_sql="SELECT id_a, id_b FROM adv")
    got_oracle = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got_oracle == expected
