"""Round-9 regression tests for the round-8 advisory findings:

1. minicodec PNM header parsing must not strip whitespace-VALUED leading
   pixel bytes (values 9-13, 32) off the payload.
2. The gzip ``len()`` fast path must count lines with the same
   universal-newline semantics as the text-mode reader it replaces.
3. ``Indexer.build*`` must clear a stale ``_stats`` sidecar; ``append*``
   must refuse to mix shard schemas under one root; ``compact`` must never
   delete the live root before the replacement is in place.
4. The unrolled k-core oracle must fail LOUDLY ("oracle unconverged") when
   the peel depth exceeds the unroll depth, instead of silently returning a
   non-fixpoint that would surface as a plan-vs-oracle mismatch.
"""

from __future__ import annotations

import gzip
import io

import numpy as np
import pytest


# -- 1. minicodec PNM positional header parse -------------------------------


def test_pnm_whitespace_valued_leading_pixels():
    from dampr_spark.operators import minicodec as mc

    # First pixel byte is 32 (space): bytes.split-based parsing used to eat
    # it and report truncated pixel data.
    payload = b"P5 2 2 255\n" + bytes([32, 65, 66, 67])
    arr = np.asarray(mc.image.open(io.BytesIO(payload)))
    assert arr.tolist() == [[32, 65], [66, 67]]

    # Round-trip with ALL the whitespace byte values leading an RGB image.
    rgb = np.array(
        [[[9, 10, 11], [13, 32, 12]], [[1, 2, 3], [4, 5, 6]]], dtype=np.uint8
    )
    back = np.asarray(mc.image.open(io.BytesIO(mc.encode_pnm(rgb))))
    assert np.array_equal(back, rgb)


def test_pnm_truncated_inputs_still_raise():
    from dampr_spark.operators import minicodec as mc

    for bad in (b"P5", b"P5 2", b"P5 2 2 255", b"P6 1 1 255"):
        with pytest.raises(ValueError):
            mc.image.open(io.BytesIO(bad))
    with pytest.raises(ValueError, match="truncated pixel"):
        mc.image.open(io.BytesIO(b"P5 2 2 255\nAB"))


# -- 2. gzip len() fast path: universal-newline parity -----------------------


@pytest.mark.parametrize(
    "raw",
    [
        b"a\nb\nc\n",
        b"a\r\nb\r\nc\r\n",  # CRLF
        b"a\rb\rc\r",  # lone CR
        b"a\r\nb",  # no trailing break
        b"",
        b"x",
        b"a\rb\nc\r\nd",  # mixed
        b"x" * ((1 << 20) - 1) + b"\r\n" + b"tail",  # CRLF straddles blocks
    ],
    ids=["lf", "crlf", "cr", "no-trail", "empty", "one", "mixed", "straddle"],
)
def test_gzip_fast_count_matches_text_mode_reader(tmp_path, raw):
    from dampr_spark.api import _count_lines_in_split

    p = tmp_path / "z.gz"
    p.write_bytes(gzip.compress(raw))
    with gzip.open(p, "rt", encoding="utf-8", errors="replace") as f:
        want = sum(1 for _ in f)
    assert _count_lines_in_split((str(p), 0, -1)) == want


def test_gzip_len_end_to_end_crlf(tmp_path, spark):
    from dampr_spark.api import Dampr

    Dampr.use_session(spark)
    g = tmp_path / "crlf.txt.gz"
    with gzip.open(g, "wb") as f:
        f.write(b"r1\r\nr2\r\nr3")
    assert Dampr.text(str(g), chunk_size=1024).len().run().read() == [3]


# -- 3. Indexer sidecar clearing / shard-type guard / compact safety --------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boolean_build_clears_stale_stats_sidecar(spark, tmp_path):
    import os

    from dampr_spark.operators.indexer import Indexer

    root = str(tmp_path / "idx")
    d = _docs(spark, [(1, "alpha beta"), (2, "beta gamma")])
    ix = Indexer(root).build_scored(d)
    assert os.path.exists(root + "_stats")
    ix.build(d)  # boolean rebuild over a previously scored index
    assert not os.path.exists(root + "_stats"), (
        "stale BM25 stats sidecar survived a boolean rebuild"
    )


def test_append_refuses_mixed_shard_types(spark, tmp_path):
    from dampr_spark.operators.indexer import Indexer

    d = _docs(spark, [(1, "alpha beta"), (2, "beta gamma")])
    more = _docs(spark, [(3, "delta beta")])

    ix = Indexer(str(tmp_path / "bool_idx")).build(d)
    with pytest.raises(ValueError, match="mix index types"):
        ix.append_scored(more)
    with pytest.raises(ValueError, match="mix index types"):
        ix.append_positional(more)

    ix2 = Indexer(str(tmp_path / "scored_idx")).build_scored(d)
    with pytest.raises(ValueError, match="mix index types"):
        ix2.append(more)
    # same-type appends still work
    ix.append(more)
    assert {r.doc_id for r in ix.union(spark, ["beta"]).collect()} == {1, 2, 3}
    ix2.append_scored(more)
    assert ix2.search_bm25(spark, ["beta"], k=5).count() == 3


def test_compact_moves_live_root_aside_not_delete_first(spark, tmp_path):
    """The swap order is rename-aside -> rename-in -> delete-old: at no
    point is the only copy of the index deleted. Verified by behavior (the
    compacted index answers identically) plus cleanup of the transient
    roots; the delete-before-rename bug is structurally impossible now
    because _clear(root) is gone from the success path."""
    import os

    from dampr_spark.operators.indexer import Indexer

    root = str(tmp_path / "cidx")
    ix = Indexer(root).build(_docs(spark, [(1, "alpha beta"), (2, "beta gamma")]))
    ix.append(_docs(spark, [(3, "gamma delta")]))
    before = {r.doc_id for r in ix.intersect(spark, ["beta", "gamma"], 1).collect()}
    ix.compact(spark)
    after = {r.doc_id for r in ix.intersect(spark, ["beta", "gamma"], 1).collect()}
    assert before == after == {1, 2, 3}
    assert ix._shard_ids(spark, root) == [0]
    assert not os.path.exists(root + "_precompact")
    assert not os.path.exists(root + "_compacting")


# -- 3b. Dampr.from_dataset name-compat (round-8 verdict missing item) ------


def test_from_dataset_reads_chunker_and_value_emitter(spark):
    from dampr_spark.api import Dampr, Dataset

    Dampr.use_session(spark)

    class TwoChunk(Dataset):
        def __init__(self, base):
            self.base = base

        def read(self):
            for i in range(3):
                yield (i, self.base + i)

    got = sorted(Dampr.from_dataset(TwoChunk(100)).run().read())
    assert got == [100, 101, 102]

    # Reference use case: a prior run's output re-enters the next pipeline.
    out = Dampr.memory([3, 1, 2]).map(lambda v: v * 10).run()
    again = sorted(Dampr.from_dataset(out).map(lambda v: v + 1).run().read())
    assert again == [11, 21, 31]

    with pytest.raises(TypeError, match="from_dataset"):
        Dampr.from_dataset([1, 2, 3])  # reference asserts Chunker


def test_reference_dsl_public_method_parity():
    """Every public method on the reference DSL classes exists on ours —
    the diff the round-8 verdict ran by hand, pinned as a test. Skipped
    when the read-only reference checkout isn't present."""
    import ast
    import os

    ref = "/root/reference/dampr/dampr.py"
    if not os.path.exists(ref):
        pytest.skip("reference checkout not available")

    import dampr_spark.api as api

    tree = ast.parse(open(ref).read())
    missing = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.ClassDef):
            continue
        ours = getattr(api, node.name, None)
        if ours is None:
            missing.append(f"class {node.name}")
            continue
        for item in node.body:
            if (
                isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef))
                and not item.name.startswith("_")
                and not hasattr(ours, item.name)
            ):
                missing.append(f"{node.name}.{item.name}")
    assert not missing, f"reference DSL surface not covered: {missing}"


# -- 5. bounded-graph driver-side iteration fast paths ------------------------


def test_pagerank_driver_fast_path_matches_distributed(spark):
    """pagerank's bounded-graph fast path (collect + driver iteration with
    bit-compatible HALF_UP rounding) must return EXACTLY the distributed
    plan's ranks — int and string vertex ids, weighted and unweighted."""
    import random

    from dampr_spark.operators.graph import pagerank

    random.seed(7)
    edges = [
        (random.randint(0, 60), random.randint(0, 60), round(random.uniform(0.5, 3), 3))
        for _ in range(300)
    ]
    edges = [(a, b, w) for a, b, w in edges if a != b]
    df = spark.createDataFrame(edges, "src int, dst int, w double")
    sdf = spark.createDataFrame(
        [(f"t{a}", f"t{b}", w) for a, b, w in edges], "src string, dst string, w double"
    )
    for frame, wcol in ((df, "w"), (df, None), (sdf, "w")):
        fast = {r.id: r.rank for r in pagerank(frame, weight=wcol).collect()}
        slow = {
            r.id: r.rank
            for r in pagerank(frame, weight=wcol, max_driver_edges=0).collect()
        }
        assert fast == slow and fast


def test_label_propagation_driver_fast_path_matches_distributed(spark):
    import random

    from dampr_spark.operators.graph import label_propagation

    random.seed(11)
    edges = [(random.randint(0, 60), random.randint(0, 60)) for _ in range(250)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src int, dst int")
    fast = {r.id: r.label for r in label_propagation(df).collect()}
    slow = {
        r.id: r.label for r in label_propagation(df, max_driver_edges=0).collect()
    }
    assert fast == slow and fast


def test_cc_kcore_bfs_driver_fast_paths_match_distributed(spark):
    """connected_components / kcore / bfs_distances run their exact
    synchronous rounds driver-side on bounded graphs — results AND the
    max_iters round-count contract must match the join plans."""
    import random

    from pyspark.sql import functions as F  # noqa: F401

    from dampr_spark.operators.graph import (
        bfs_distances,
        connected_components,
        kcore,
    )

    random.seed(99)
    edges = [(random.randint(0, 120), random.randint(0, 120)) for _ in range(350)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src int, dst int")

    cc_f = {r.id: r.component for r in connected_components(df).collect()}
    cc_s = {
        r.id: r.component
        for r in connected_components(df, max_driver_edges=0).collect()
    }
    assert cc_f == cc_s and cc_f

    for k in (2, 3):
        kc_f = {r.id: r.core_degree for r in kcore(df, k=k).collect()}
        kc_s = {
            r.id: r.core_degree
            for r in kcore(df, k=k, max_driver_edges=0).collect()
        }
        assert kc_f == kc_s

    srcs = spark.createDataFrame([(0,), (50,)], "id int")
    bf_f = {r.id: r.dist for r in bfs_distances(df, srcs).collect()}
    bf_s = {
        r.id: r.dist
        for r in bfs_distances(df, srcs, max_driver_edges=0).collect()
    }
    assert bf_f == bf_s and bf_f

    # max_iters raise parity on a diameter-11 path, both paths.
    path = spark.createDataFrame([(i, i + 1) for i in range(11)], "src long, dst long")
    one = spark.createDataFrame([(0,)], "id long")
    for mde in (50_000, 0):
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(path, max_iters=3, max_driver_edges=mde)
        with pytest.raises(RuntimeError, match="did not converge"):
            kcore(path, k=2, max_iters=1, max_driver_edges=mde)
        with pytest.raises(RuntimeError, match="did not converge"):
            bfs_distances(path, one, max_iters=3, max_driver_edges=mde)


def test_round_half_up_matches_spark_round(spark):
    """The driver-side rounding twin vs F.round on adversarial values —
    exact .5 boundaries at the target precision and values whose shortest
    repr carries >prec digits."""
    from pyspark.sql import functions as F

    from dampr_spark.operators.graph import _round_half_up

    vals = [
        0.00000000005,  # exactly .5 at 1e-10 in decimal-string form
        0.00000000015,
        0.1 + 0.2,  # 0.30000000000000004
        1.0 / 3.0,
        0.0066666666666666671,
        (1.0 - 0.85) / 150.0,
        0.123456789049999,
        2.5e-10,
        1.5e-10,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.y for r in df.select(F.round("x", 10).alias("y")).collect()]
    want = [_round_half_up(v, 10) for v in vals]
    assert got == want


# -- 6. grid_resolution_audit: Horner-prefix rollup exactness ----------------


def test_grid_resolution_rollup_matches_direct_audit(spark):
    """The multi-resolution audit derives coarse-grid stats by integer
    division of the finest grid's cell ids. That shortcut must EQUAL a
    direct audit run at each resolution (per-dim bounds fit independently,
    so digit prefixes are exact) — pinned here against grid_cells at each
    dims."""
    from pyspark.sql import functions as F

    from dampr_spark.operators.similarity import grid_cells, grid_resolution_audit
    from dampr_spark.sources.readers import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    audit = {
        r.dims: (r.cells_ge2, r.cells_over_cap, r.raw_pair_budget, r.capped_pair_budget)
        for r in grid_resolution_audit(emb, dims_candidates=(2, 4, 6)).collect()
    }
    for d in (2, 4, 6):
        direct = (
            grid_cells(emb, dims=d)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 2)
            .agg(
                F.count(F.lit(1)).alias("g2"),
                F.coalesce(
                    F.sum(F.when(F.col("n") > 64, 1).otherwise(0)), F.lit(0)
                ).alias("oc"),
                F.coalesce(F.sum(F.col("n") * (F.col("n") - 1) / 2), F.lit(0))
                .cast("long")
                .alias("raw"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("n") <= 64, F.col("n") * (F.col("n") - 1) / 2
                        ).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("cap"),
            )
            .first()
        )
        assert audit[d] == (direct.g2, direct.oc, direct.raw, direct.cap), d


def test_grid_resolution_recommended_is_coarsest_safe(spark):
    from dampr_spark.operators.similarity import grid_resolution_audit
    from dampr_spark.sources.readers import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = grid_resolution_audit(emb, dims_candidates=(2, 4, 6)).collect()
    safe = [r.dims for r in rows if r.cells_over_cap == 0]
    rec = [r.dims for r in rows if r.recommended]
    assert rec == ([min(safe)] if safe else [])


# -- 4. k-core oracle fixpoint guard -----------------------------------------


def test_kcore_oracle_unconverged_fails_loudly():
    import duckdb

    from dampr_spark.plans.dedupops import _kcore_oracle_sql

    con = duckdb.connect()
    # A 10-vertex path peels one endpoint layer per synchronous round:
    # rounds=2 cannot reach the (empty) 2-core fixpoint.
    pairs = "SELECT i AS id_a, i + 1 AS id_b FROM range(10) t(i)"
    with pytest.raises(Exception, match="ORACLE UNCONVERGED"):
        con.execute(_kcore_oracle_sql(2, 2, pairs_sql=pairs)).fetchall()
    # Deep enough unrolling converges quietly to the empty core.
    assert con.execute(_kcore_oracle_sql(2, 12, pairs_sql=pairs)).fetchall() == []


def test_kcore_oracle_converged_has_no_sentinel_row():
    import duckdb

    from dampr_spark.plans.dedupops import _kcore_oracle_sql

    con = duckdb.connect()
    # Triangle: already a fixpoint after round 1; guard must stay silent.
    pairs = (
        "SELECT * FROM (VALUES (1, 2), (2, 3), (1, 3)) v(id_a, id_b)"
    )
    rows = con.execute(_kcore_oracle_sql(2, 3, pairs_sql=pairs)).fetchall()
    assert sorted(rows) == [(1, 2), (2, 2), (3, 2)]
