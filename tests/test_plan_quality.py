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


def test_bloom_join_prune_scans_orders_once(spark, sf_dir):
    """Round-9 regression lock (VERDICT r8 #2): the certificate's
    probe/passed/true counts must be conditional sums over ONE orders
    scan — the previous shape cross-joined three separate one-row orders
    aggregates, scanning the probe side three times."""
    df = all_queries()["bloom_join_prune"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    n_orders_scans = plan.count("orders.parquet")
    assert n_orders_scans == 1, f"orders scanned {n_orders_scans}x:\n{plan}"


def test_grid_resolution_audit_corpus_cost_is_candidate_independent(spark, sf_dir):
    """The multi-resolution audit's whole point: corpus cost must not grow
    with the number of candidate resolutions. The finest-grid blocking
    plan touches the corpus exactly twice (grid_cells' bounds-fit
    aggregate + the cell-assignment pass — its documented shape), and the
    audit RESULT plan reads only the pinned cell table, never the corpus:
    candidating more resolutions adds rollups of a <= buckets^finest-row
    frame, zero further scans."""
    from pyspark.sql import functions as F

    from dampr_spark.operators.similarity import grid_cells, grid_resolution_audit
    from dampr_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    fine = grid_cells(emb, dims=6).groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    fine_plan = fine._jdf.queryExecution().sparkPlan().toString()
    assert fine_plan.count("embeddings.parquet") == 2  # bounds fit + assign
    out_plan = (
        grid_resolution_audit(emb)._jdf.queryExecution().sparkPlan().toString()
    )
    assert "embeddings.parquet" not in out_plan, (
        "audit result plan re-reads the corpus instead of the pinned cells"
    )


def test_lsh_band_audit_candidates_read_pinned_signatures_only(spark, sf_dir):
    """The banding audit's whole point (round 10): candidate band counts
    must re-slice ONE pinned signature pass, never re-pay the Arrow
    signature UDF per candidate. With the simhash leg off, the audit
    RESULT plan reads only checkpoint blocks — zero corpus scans no
    matter how many candidates are priced (the grid audit's
    candidate-independence lock, mirrored to banding)."""
    from dampr_spark.operators.dedup import lsh_band_audit
    from dampr_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents")
    out = lsh_band_audit(d, band_candidates=(8, 16, 32), include_simhash=False)
    plan = out._jdf.queryExecution().sparkPlan().toString()
    assert "documents.parquet" not in plan, (
        "band-audit result plan re-reads the corpus instead of the pinned "
        "signatures"
    )
    # With the simhash leg ON (the catalog/bench shape), the <= k+1-row
    # stats table is pinned before the `recommended` self-reference — the
    # round-10 review caught the unpinned union executing every occupancy
    # aggregate (including the simhash corpus scan) twice per action.
    out2 = lsh_band_audit(d, band_candidates=(8, 16), include_simhash=True)
    plan2 = out2._jdf.queryExecution().sparkPlan().toString()
    assert "documents.parquet" not in plan2, (
        "band-audit stats table not pinned: the result plan re-executes "
        "the occupancy aggregates (simhash corpus scan included) twice"
    )


def test_contamination_posting_audit_aggregates_before_joining(spark, sf_dir):
    """The posting audit prices the join WITHOUT performing it: the
    bounded bench gram frequencies pin (eager checkpoint, read twice),
    the corpus is scanned exactly ONCE — its gram rows semi-join the
    broadcast bench set before the frequency exchange, so only
    bench-matching rows shuffle — and the only join above the aggregates
    is gram-distinct cf x bf rows. More corpus scans or a posting-level
    join would mean the audit pays what it exists to price."""
    from pyspark.sql import functions as F

    from dampr_spark.operators.dedup import contamination_posting_audit
    from dampr_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents")
    out = contamination_posting_audit(
        d.filter(F.col("doc_id") % 97 != 0),
        d.filter(F.col("doc_id") % 97 == 0),
        n=2,
        max_df=50,
    )
    plan = out._jdf.queryExecution().sparkPlan().toString()
    n_scans = plan.count("documents.parquet")
    assert n_scans == 1, f"documents scanned {n_scans}x (want corpus cf only)"


def test_fuzzy_decontaminate_scans_each_side_once(spark, sf_dir):
    """Round-10 plan fix: gram-set sizes ride along the explode (the
    ngram_jaccard_pairs discipline), so the query reads documents exactly
    twice (corpus side + bench side) — the previous shape checkpointed
    the corpus gram arrays AND shuffled a corpus-sized (doc_id, n) frame
    back into the scoring join (sf1.0 warm measured 14.4 -> 3.0 s)."""
    df = all_queries()["fuzzy_decontaminate"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    n = plan.count("documents.parquet")
    assert n == 2, f"documents scanned {n}x (want corpus + bench only)"
    assert "Checkpoint" not in plan


def test_ngram_novelty_no_gram_level_join_back(spark, sf_dir):
    """Round-10 plan fix: novel counts aggregate from the gram-min table
    directly (credit each gram to its first_doc), and n_grams is a pure
    scan expression — so the corpus is scanned twice with NO checkpoint
    and no corpus-sized gram exchange for a join-back (sf1.0 warm
    measured 13.5 -> 6.3 s)."""
    df = all_queries()["ngram_novelty"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    n = plan.count("documents.parquet")
    assert n == 2, f"documents scanned {n}x (want per-doc sizes + grams)"
    assert "Checkpoint" not in plan


def test_substring_posting_audit_prices_without_pairing(spark, sf_dir):
    """The substring audit scans the corpus once and never forms diagonal
    pairs; its capped budget must equal the pair count the production
    posting stage ACTUALLY streams (same anchors, same cap), pinning the
    audit to the plan it prices."""
    from pyspark.sql import functions as F

    from dampr_spark.operators.dedup import (
        positional_anchor_rows,
        substring_posting_audit,
    )
    from dampr_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents")
    out = substring_posting_audit(d, anchor_tokens=8, max_posting=16)
    plan = out._jdf.queryExecution().sparkPlan().toString()
    assert plan.count("documents.parquet") == 1
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan

    row = out.first()
    streamed = (
        positional_anchor_rows(d, anchor_tokens=8)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 2) & (F.col("n") <= 16))
        .agg(F.sum(F.expr("(n * (n - 1)) div 2")))
        .first()[0]
    ) or 0
    assert row.capped_pairs == streamed
    assert row.raw_pairs >= row.capped_pairs
    assert row.pairs_dropped == row.raw_pairs - row.capped_pairs


def test_quality_gate_refit_drift_result_reads_bounded_pin_only(spark, sf_dir):
    """Round-11 composition lock: after the two fits and the dual-gate
    apply, the RESULT plan must read only the pinned per-source rollup
    (<= n_sources rows) plus its broadcast totals — never the documents
    corpus again. A corpus scan here would mean the drift join re-derived
    the keep decisions instead of reusing the one apply pass."""
    df = all_queries()["quality_gate_refit_drift"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "documents" not in plan, f"corpus scan in result plan:\n{plan}"


def test_embedding_drift_psi_result_reads_bounded_pin_only(spark, sf_dir):
    """Same discipline for the embedding drift gate: the PSI fold reads
    the pinned (<= buckets^dims row) cell-count table, not the embeddings
    corpus."""
    df = all_queries()["embedding_drift_psi"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "embeddings" not in plan, f"corpus scan in result plan:\n{plan}"
