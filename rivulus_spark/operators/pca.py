"""Embedding spectrum analysis — distributed PCA over a vector column.

The pipeline questions this answers at 100 TB: how many effective
dimensions do the embeddings carry (sets the IVF/LSH bit budget and
the int8-quantization error floor), is a cheap linear projection
enough before ANN, and did an embedding-model swap change the
geometry (spectrum diff between snapshots).

Scale shape — one corpus pass, k-row barrier:

- **Partial moments per Arrow batch**: a ``mapInPandas`` stage
  computes ``[count, sum(x), upper(X^T X)]`` per batch with one numpy
  matmul — the same BLAS-beats-codegen judgment as the blocked-cosine
  operator (64x64 covariance is 2080 accumulators: far past the
  useful whole-stage-codegen width, exactly right for ``X.T @ X``).
- **Element-wise reduction**: each batch emits ONE packed
  ``array<double>`` row (length 1 + d + d(d+1)/2); posexplode +
  groupBy(slot) sums them — thousands of 16-byte rows per batch,
  never vectors.
- **Driver barrier**: the packed moment vector (d=64: 2145 doubles)
  is the only thing collected; the d x d eigendecomposition runs on
  the driver — same justified k-row barrier as k-means centroids.

Exactness: moments are order-independent up to float addition
(~1e-12); eigenvalues of the symmetric covariance perturb by at most
the matrix drift (Weyl), so floor-truncating to 6 decimals is
oracle-stable against an independent numpy reference.

The reference engine has no vector surface; north-star operator.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(vec_col).alias("d")).first()
    if row is None:
        raise ValueError("cannot infer vector dim from an empty frame")
    return row["d"]


def moment_frame(df: DataFrame, vec_col: str = "embedding",
                 d: int | None = None) -> DataFrame:
    """The pre-collect moment plan: ``(slot, v)`` rows of the packed
    ``[n, sum_0..d-1, upper-triangular XX]`` reduction — exposed so
    plan tests can assert the Arrow-map + slot-agg shape."""
    if d is None:
        d = _dim(df, vec_col)
    iu = np.triu_indices(d)

    def part(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            xx = (X.T @ X)[iu]
            packed = np.concatenate(([float(len(X))], X.sum(axis=0), xx))
            yield pd.DataFrame({"m": [packed.tolist()]})

    return (df.select(vec_col)
            .mapInPandas(part, schema="m array<double>")
            .select(F.posexplode("m").alias("slot", "v"))
            .groupBy("slot").agg(F.sum("v").alias("v")))


def moment_vector(df: DataFrame, vec_col: str = "embedding") -> np.ndarray:
    """Packed ``[n, sum_0..d-1, upper-triangular XX]`` over the corpus
    — one pass, one numpy matmul per Arrow batch, slot-keyed sums."""
    d = _dim(df, vec_col)
    slots = moment_frame(df, vec_col, d).collect()
    out = np.zeros(1 + d + d * (d + 1) // 2)
    for r in slots:
        out[r["slot"]] = r["v"]
    return out


def pca_spectrum(df: DataFrame, vec_col: str = "embedding",
                 k: int = 16) -> DataFrame:
    """Top-``k`` principal eigenvalues of the population covariance,
    with explained-variance fractions — floor-truncated to 6 decimals
    (cross-engine convention; drift budget ~1e-12 « 1e-6)."""
    m = moment_vector(df, vec_col)
    n = m[0]
    if n == 0:
        raise ValueError("pca_spectrum on an empty frame")
    d = int((-3 + np.sqrt(9 + 8 * (len(m) - 1))) // 2)
    mu = m[1:1 + d] / n
    cov = np.zeros((d, d))
    iu = np.triu_indices(d)
    cov[iu] = m[1 + d:]
    cov = cov + cov.T - np.diag(np.diag(cov))
    cov = cov / n - np.outer(mu, mu)
    eig = np.linalg.eigvalsh(cov)[::-1]
    tot = eig.sum()
    k = min(k, d)
    rows = [(i + 1,
             float(np.floor(eig[i] * 1e6) / 1e6),
             float(np.floor(eig[i] / tot * 1e6) / 1e6))
            for i in range(k)]
    spark = df.sparkSession
    return spark.createDataFrame(
        rows, "component int, eigenvalue double, explained_frac double")
