"""Distributed k-means (spherical / cosine) for embedding columns.

Trains the centroid set that ``similarity.ivf_ann_topk`` probes: the
deterministic-sample centroids it defaults to keep the oracle contract
exact, but a real IVF index wants trained centroids — swapping them in
changes only the ``centroids`` input of ``ivf_assign_cells``, not any
plan shape (similarity.py docstring contract).

Scale design, per Lloyd iteration:
- **assignment** reuses :func:`similarity.ivf_assign_cells` — a
  vectorized ``mapInPandas`` sweep over the broadcast centroid matrix
  (linear in corpus, map-side, no shuffle).
- **update** is two-level: each Arrow batch emits ONE partial
  (cell, count, component-sum) row per cell it saw — the classic
  map-side combine — so the only shuffle of the iteration carries
  ~k rows per partition, never the corpus. The final elementwise
  merge folds k·partitions tiny arrays; the interpreted
  ``zip_with``/``aggregate`` cost is O(k · partitions · dim),
  independent of corpus size.
- **empty cells** keep their previous centroid (standard Lloyd
  degeneracy handling; deterministic).

The iteration count is a driver-side loop (k-means is inherently
iterative — SURVEY §2 has no counterpart; this is a north-star
training-pipeline operator). Each iteration materializes only the
k-row centroid table; the corpus is re-scanned, not cached, because
at 100 TB the scan is cheaper than caching the working set — callers
with cluster memory to spare can persist the input beforehand.

Float caveat: partial sums merge in partition order, so centroid
components are deterministic only up to float addition order — unlike
the similarity operators this op has no bit-exact SQL-oracle contract
(the driver records a rows-only check for it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _as_double, ivf_assign_cells


def _partial_sums(assigned: DataFrame) -> DataFrame:
    """(cell, n, sums) partials: one row per (Arrow batch, cell); the
    vector width is taken from the data itself."""

    def _sums(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            cells = pdf["cell"].to_numpy()
            X = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf["vec"]])
            uniq = np.unique(cells)
            rows = []
            for c in uniq:
                m = cells == c
                rows.append((int(c), int(m.sum()), X[m].sum(axis=0).tolist()))
            yield pd.DataFrame(rows, columns=["cell", "n", "sums"])

    return assigned.mapInPandas(_sums, "cell long, n long, sums array<double>")


def kmeans_train(df: DataFrame, init_centroids: DataFrame, dim: int,
                 n_iters: int = 5, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Lloyd-iterate ``init_centroids`` against ``df``; returns the
    trained (cid, cvec) centroid table (k rows, same schema contract
    ``ivf_assign_cells`` consumes). Assignment metric is cosine
    (spherical k-means) — the update mean is not re-normalized because
    cosine is scale-invariant."""
    cents = init_centroids.select(
        F.col(id_col).cast("long").alias("cid"),
        _as_double(F.col(vec_col)).alias("cvec"))
    zero = F.array(*[F.lit(0.0) for _ in range(dim)])
    for _ in range(n_iters):
        assigned = ivf_assign_cells(
            df,
            cents.select(F.col("cid").alias(id_col),
                         F.col("cvec").alias(vec_col)),
            id_col=id_col, vec_col=vec_col)
        merged = (
            _partial_sums(assigned)
            .groupBy("cell")
            .agg(F.sum("n").alias("n"),
                 F.aggregate(F.collect_list("sums"), zero,
                             lambda acc, x: F.zip_with(
                                 acc, x, lambda a, b: a + b)).alias("s"))
            .select(F.col("cell").alias("cid"),
                    F.transform(F.col("s"),
                                lambda x: x / F.col("n")).alias("cvec")))
        # empty cells keep their previous centroid
        cents = (cents.alias("old")
                 .join(merged.alias("new"), "cid", "left")
                 .select("cid", F.coalesce(F.col("new.cvec"),
                                           F.col("old.cvec")).alias("cvec")))
        # k rows: materialize per iteration so the lineage (and the
        # broadcast inside the next assignment) stays flat
        cents = df.sparkSession.createDataFrame(
            cents.collect(), "cid long, cvec array<double>")
    return cents


def kmeans_cluster_sizes(df: DataFrame, init_centroids: DataFrame, dim: int,
                         n_iters: int = 3, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Train + final assignment, reduced to (cell, n_members) — the
    workload-facing summary (centroid components are float-order
    dependent; membership counts are the stable observable)."""
    cents = kmeans_train(df, init_centroids, dim, n_iters, id_col, vec_col)
    return (ivf_assign_cells(
                df,
                cents.select(F.col("cid").alias(id_col),
                             F.col("cvec").alias(vec_col)),
                id_col=id_col, vec_col=vec_col)
            .groupBy("cell")
            .agg(F.count("*").alias("n_members")))
