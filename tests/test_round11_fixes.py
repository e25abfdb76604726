"""Round-11 items, each pinned by the VERDICT.md r10 next-round entry it
closes:

1. ``similarity.ivf_list_audit`` — the ANN family's sizing instrument
   (VERDICT #1, closing the audit-instrument set): one corpus assignment
   pass at the finest candidate prices every ``n_lists`` candidate via
   nested-quantizer rollups. Pinned here: depth conservation across every
   candidate, the worst>=ideal probe bound, the nearest-sqrt(N)
   ties-to-larger recommendation rule, the bytes pricing arithmetic, and
   occupancy sanity on a deliberately clustered corpus.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dampr_spark.operators.similarity import IVFIndex, ivf_list_audit


VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _clustered_corpus(spark, n_clusters=8, per_cluster=50, dim=16, seed=7):
    """Well-separated unit clusters: axis-aligned centers + small noise.
    Deterministic, so every assertion below is stable."""
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_clusters):
        center = np.zeros(dim)
        center[c % dim] = 1.0
        for i in range(per_cluster):
            v = center + 0.05 * rng.standard_normal(dim)
            v /= np.linalg.norm(v)
            rows.append((c * per_cluster + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, VEC_SCHEMA)


def test_ivf_list_audit_conservation_and_bounds(spark):
    df = _clustered_corpus(spark)
    out = ivf_list_audit(
        df, n_lists_candidates=(2, 4, 8, 16), nprobe=3, sample_size=400
    ).collect()
    assert [r.n_lists for r in out] == [2, 4, 8, 16]
    n = 8 * 50
    for r in out:
        # Conservation: every candidate's rolled-up depths sum to the
        # valid-vector count — the catalog query's cross-engine contract.
        assert r.n_vecs == n and r.depths_conserved_ok
        assert r.dim == 16
        assert r.nprobe == min(3, r.n_lists)
        assert 0 < r.occupied_lists <= r.n_lists and r.occupied_le_lists_ok
        assert r.probe_rows_ideal == r.nprobe * n // r.n_lists
        assert r.probe_rows_worst >= r.probe_rows_ideal and r.worst_ge_ideal_ok
        assert r.probe_bytes_ideal == r.probe_rows_ideal * (4 * 16 + 8)
        assert r.probe_bytes_worst == r.probe_rows_worst * (4 * 16 + 8)
        assert r.max_list_depth <= n
        assert r.sqrt_n == round(math.sqrt(n), 6)


def test_ivf_list_audit_recommends_nearest_sqrt_n(spark):
    df = _clustered_corpus(spark)  # n = 400, sqrt = 20
    out = ivf_list_audit(
        df, n_lists_candidates=(2, 4, 8, 16, 64), nprobe=2, sample_size=400
    ).collect()
    rec = [r.n_lists for r in out if r.recommended]
    assert rec == [16]  # |16-20| = 4 beats |64-20| = 44 and |8-20| = 12


def test_ivf_list_audit_tie_goes_to_larger(spark):
    # 36 vectors -> sqrt = 6; candidates 4 and 8 are both at distance 2:
    # the rule resolves ties to the LARGER candidate (more pruning at
    # equal distance), mirrored exactly by the catalog oracle's max(k).
    df = _clustered_corpus(spark, n_clusters=6, per_cluster=6)
    out = ivf_list_audit(
        df, n_lists_candidates=(4, 8), nprobe=1, sample_size=100
    ).collect()
    assert [r.n_lists for r in out if r.recommended] == [8]


def test_ivf_list_audit_clustered_occupancy_saturates_coarse(spark):
    """On 8 well-separated clusters, the audit's depth numbers must show
    the saturation story the 100x proof measured: a 2-list quantizer packs
    ~4 clusters per list (max depth ~200), while 8+ lists split them
    (max depth ~50-100). This is the signal the instrument exists for."""
    df = _clustered_corpus(spark)
    rows = {
        r.n_lists: r
        for r in ivf_list_audit(
            df, n_lists_candidates=(2, 8), nprobe=1, sample_size=400
        ).collect()
    }
    assert rows[2].max_list_depth >= 150
    assert rows[8].max_list_depth <= 120
    assert rows[8].probe_rows_worst < rows[2].probe_rows_worst


def test_ivf_list_audit_nested_rollup_matches_direct_assignment(spark):
    """The finest candidate's depth row must equal a direct
    IVFIndex.assign groupBy — the audit's one corpus pass IS the
    production assignment, not a parallel estimate."""
    df = _clustered_corpus(spark)
    out = {
        r.n_lists: r
        for r in ivf_list_audit(
            df, n_lists_candidates=(8,), nprobe=1, sample_size=400
        ).collect()
    }
    idx = IVFIndex(n_lists=8, nprobe=1, seed=42).fit(
        df, sample_size=400, iters=10
    )
    direct = (
        idx.assign(df)
        .groupBy("list_id")
        .count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("s"))
        .first()
    )
    assert out[8].max_list_depth == direct.mx
    assert out[8].n_vecs == direct.s


def test_ivf_list_audit_validates_candidates(spark):
    df = _clustered_corpus(spark, n_clusters=1, per_cluster=4)
    with pytest.raises(ValueError, match="positive"):
        ivf_list_audit(df, n_lists_candidates=())
    with pytest.raises(ValueError, match="positive"):
        ivf_list_audit(df, n_lists_candidates=(0, 4))
    with pytest.raises(ValueError, match="65536"):
        ivf_list_audit(df, n_lists_candidates=(1 << 17,))


def test_ivf_list_audit_invalid_vectors_excluded(spark):
    """NULL and zero vectors fail valid_vector at entry — n_vecs counts
    only the survivors (the adversarial-gate contract)."""
    good = _clustered_corpus(spark, n_clusters=2, per_cluster=10)
    bad = spark.createDataFrame(
        [(1000, None), (1001, [0.0] * 16)], VEC_SCHEMA
    )
    out = ivf_list_audit(
        good.unionByName(bad), n_lists_candidates=(2, 4), nprobe=1,
        sample_size=100,
    ).collect()
    assert all(r.n_vecs == 20 and r.depths_conserved_ok for r in out)
