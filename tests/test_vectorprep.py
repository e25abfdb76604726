"""Distributed PCA: agreement with a numpy reference fit, projection
invariants, and the whitening contract."""

from __future__ import annotations

import numpy as np
import pytest

from dampr_spark.operators.vectorprep import pca_apply, pca_fit


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from dampr_spark.sources.readers import read_table

    return read_table(spark, sf_dir, "embeddings").cache()


def _numpy_ref(X, k):
    mean = X.mean(axis=0)
    cov = (X - mean).T @ (X - mean) / len(X)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    return mean, v[:, order].T, w[order]


def test_pca_fit_matches_numpy(emb):
    X = np.array([r.embedding for r in emb.select("embedding").collect()], dtype=np.float64)
    model = pca_fit(emb, k=6)
    mean, comps, var = _numpy_ref(X, 6)
    assert np.allclose(model.mean, mean, atol=1e-6)
    assert np.allclose(model.variances, var, rtol=1e-6)
    # eigenvectors defined up to sign: compare |cosine| per axis
    for a, b in zip(model.components, comps):
        assert abs(float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))) > 1 - 1e-8


def test_components_orthonormal_and_variance_sorted(emb):
    m = pca_fit(emb, k=8)
    gram = m.components @ m.components.T
    assert np.allclose(gram, np.eye(8), atol=1e-8)
    assert all(a >= b - 1e-12 for a, b in zip(m.variances, m.variances[1:]))


def test_pca_apply_matches_model_projection(emb):
    m = pca_fit(emb, k=4)
    got = {
        r.vec_id: np.array(r.pca)
        for r in pca_apply(emb, m, out_col="pca").select("vec_id", "pca").collect()
    }
    X = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    for vid, x in list(X.items())[:25]:
        assert np.allclose(got[vid], m.project(x), atol=1e-9)


def test_whitening_unit_variance(emb):
    m = pca_fit(emb, k=4)
    rows = pca_apply(emb, m, out_col="w", whiten=True).select("w").collect()
    Y = np.array([r.w for r in rows])
    # whitened projections have ~unit variance along every kept axis
    assert np.allclose(Y.var(axis=0), 1.0, atol=1e-2)


def test_null_vectors_pass_through(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0]), (4, [5.0, 0.0])],
        "id long, embedding array<float>",
    )
    m = pca_fit(df, k=1)
    got = {r.id: r.p for r in pca_apply(df, m, out_col="p").collect()}
    assert got[2] is None and got[1] is not None
