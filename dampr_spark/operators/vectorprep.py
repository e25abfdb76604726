"""Embedding preprocessing: distributed PCA fit + broadcast projection.

SemDeDup-style semantic dedup and most ANN indexes work markedly better on
whitened/reduced embeddings; the fit is a textbook distributed computation:

- ONE aggregation pass computes the exact sufficient statistics — per-dim
  sums and the d×d outer-product sum (``n``, ``Σv``, ``ΣvvT``) — as plain
  Spark ``sum`` aggregates over posexploded components; for d=64 that is
  4160 scalar aggregates, map-side combined, shuffling one partial row per
  partition. NO row ever leaves the executors.
- the d×d covariance eigendecomposition happens driver-side with numpy on
  a 32 KB matrix — the legitimate driver-side step (the model is tiny; the
  data stayed distributed).
- ``pca_apply`` broadcasts the projection matrix and maps Arrow batches
  through one numpy matmul — the embarrassingly-parallel apply path.

Float caveat: executor-side partial sums reduce in nondeterministic order,
so covariance entries can differ in the last ulps between runs —
eigenvectors are stable only up to sign and near-degenerate rotations.
The catalog therefore registers the projection rows-only and oracle-checks
INVARIANTS (orthonormality, explained-variance ordering, reconstruction
error) instead of raw components — tests/test_vectorprep.py pins the same
properties plus agreement with a numpy reference fit.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PCAModel:
    def __init__(self, mean: np.ndarray, components: np.ndarray, variances: np.ndarray):
        self.mean = mean              # (d,)
        self.components = components  # (k, d) rows = principal axes
        self.variances = variances    # (k,) explained variance per axis

    def project(self, x: np.ndarray, whiten: bool = False) -> np.ndarray:
        y = (x - self.mean) @ self.components.T
        if whiten:
            y = y / np.sqrt(np.maximum(self.variances, 1e-12))
        return y


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8) -> PCAModel:
    """Exact-statistics PCA over an ``array<float>`` column: one
    aggregation pass for (n, Σv, ΣvvT), driver-side eigh of the d×d
    covariance. NULL vectors are skipped."""
    d = len(df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()[0])
    v = F.col(vec_col)
    sums = [F.sum(v[i].cast("double")).alias(f"s_{i}") for i in range(d)]
    prods = [
        F.sum((v[i] * v[j]).cast("double")).alias(f"p_{i}_{j}")
        for i in range(d)
        for j in range(i, d)
    ]
    row = (
        df.filter(F.col(vec_col).isNotNull())
        .agg(F.count(F.lit(1)).alias("n"), *sums, *prods)
        .first()
    )
    n = row["n"]
    if n < 2:
        raise ValueError("pca_fit needs at least 2 vectors")
    s = np.array([row[f"s_{i}"] for i in range(d)])
    mean = s / n
    cov = np.empty((d, d))
    for i in range(d):
        for j in range(i, d):
            e_ij = row[f"p_{i}_{j}"] / n
            cov[i, j] = cov[j, i] = e_ij - mean[i] * mean[j]
    w, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    return PCAModel(mean=mean, components=vecs[:, order].T, variances=w[order])


def pca_apply(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
) -> DataFrame:
    """Project every vector through the (broadcast) model in Arrow batches —
    one numpy matmul per batch, no shuffle, NULL vectors pass through as
    NULL projections."""
    spark = df.sparkSession
    b = spark.sparkContext.broadcast(
        (model.mean, model.components, model.variances, whiten)
    )
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, {out_col} array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mean, comps, var, wh = b.value
        for pdf in batches:
            out = []
            for vec in pdf[vec_col]:
                if vec is None:
                    out.append(None)
                    continue
                y = (np.asarray(vec, dtype=np.float64) - mean) @ comps.T
                if wh:
                    y = y / np.sqrt(np.maximum(var, 1e-12))
                out.append(y.tolist())
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(run, schema=schema)
