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

from .similarity import centroid_pairs, ivf_assign_cells


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


def kmeans_train_pairs(df: DataFrame, init_centroids, dim: int,
                       n_iters: int = 5, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> list:
    """Lloyd-iterate ``init_centroids`` (DataFrame — eager, or a
    ``(cid, vector)`` pair list — lazy start) against ``df``; returns
    the trained centroids as a sorted pair list, the form
    ``ivf_assign_cells`` consumes without running a job.

    Each iteration is one Spark job (assignment sweep + tiny partial-
    sum aggregate collected to the driver — k rows, the inherent Lloyd
    barrier); centroid state between iterations lives driver-side as
    plain pairs, so no per-iteration createDataFrame/collect round-
    trips and exactly one broadcast per iteration. Assignment metric is
    cosine (spherical k-means) — the update mean is not re-normalized
    because cosine is scale-invariant."""
    cents = dict(centroid_pairs(init_centroids, id_col, vec_col))
    zero = F.array(*[F.lit(0.0) for _ in range(dim)])
    sc = df.sparkSession.sparkContext
    for _ in range(n_iters):
        bc = sc.broadcast(sorted(cents.items()))
        assigned = ivf_assign_cells(df, bc, id_col=id_col, vec_col=vec_col)
        merged = (
            _partial_sums(assigned)
            .groupBy("cell")
            .agg(F.sum("n").alias("n"),
                 F.aggregate(F.collect_list("sums"), zero,
                             lambda acc, x: F.zip_with(
                                 acc, x, lambda a, b: a + b)).alias("s"))
            .collect())  # k tiny rows: the Lloyd iteration barrier
        # the collect() barrier fully materialized this iteration's
        # job, so its broadcast can be dropped immediately — without
        # this a long-lived session leaks one block per iteration
        bc.unpersist()
        # mean update; empty cells keep their previous centroid
        for r in merged:
            cents[r.cell] = [s / r.n for s in r.s]
    return sorted(cents.items())


def kmeans_train(df: DataFrame, init_centroids, dim: int,
                 n_iters: int = 5, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """DataFrame-facing wrapper over :func:`kmeans_train_pairs`:
    returns the trained (cid, cvec) centroid table (k rows, the schema
    contract ``ivf_assign_cells``'s DataFrame path consumes).
    EAGER by nature — k-means is iterative, so building the result
    runs ``n_iters`` Spark jobs."""
    pairs = kmeans_train_pairs(df, init_centroids, dim, n_iters,
                               id_col, vec_col)
    return df.sparkSession.createDataFrame(
        [(c, v) for c, v in pairs], "cid long, cvec array<double>")


def kmeans_cluster_sizes(df: DataFrame, init_centroids, dim: int,
                         n_iters: int = 3, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Train + final assignment, reduced to (cell, n_members) — the
    workload-facing summary (centroid components are float-order
    dependent; membership counts are the stable observable)."""
    pairs = kmeans_train_pairs(df, init_centroids, dim, n_iters,
                               id_col, vec_col)
    return (ivf_assign_cells(df, pairs, id_col=id_col, vec_col=vec_col)
            .groupBy("cell")
            .agg(F.count("*").alias("n_members")))


def semantic_dedup_pairs(df: DataFrame, centroids, threshold: float,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al.
    2023, "SemDeDup: Data-efficient learning at web-scale through
    semantic deduplication"): assign every vector to its nearest
    centroid, then compute EXACT cosine only over pairs sharing a
    cell. Output (id_a, id_b, cell, sim), id_a < id_b, sim rounded to
    6 at ``sim >= threshold`` — the pair list a survivorship policy
    (keep one representative per semantic group) consumes, same
    contract as the LSH near-dup path.

    Versus hyperplane LSH (cosine_neardup_pairs_lsh): the cell
    structure is LEARNED (or deterministic-sample) rather than random,
    which is the SemDeDup premise — semantic duplicates concentrate in
    the same cluster, so within-cell comparison reaches pairs random
    hyperplane bands can miss at equal candidate budget. The trade is
    recall loss at cell BOUNDARIES (a pair split across cells is never
    compared — inherent to the method).

    Scale shape: assignment is the broadcast-centroids mapInPandas
    sweep (linear, no shuffle); the pair stage is ONE equi-join on the
    cell id; candidate volume is sum(cell_size^2)/2, so the centroid
    COUNT is the knob — size k proportional to the corpus (e.g. the
    stride-sampled init: k = n/stride keeps cells ~stride and
    candidates ~(stride/2)*n, linear in n). Oversized cells are the
    skew case: split them by raising k or running the LSH path within
    the heavy cell. The float contract (ascending-dimension dot fold,
    6-decimal round, min-cid tie-break) is ivf_assign_cells', so the
    whole operator — including the approximation — is exactly
    SQL-oracle-checkable."""
    from .. import cache
    from .similarity import dot

    assigned = cache.persist(
        ivf_assign_cells(df, centroids, id_col=id_col, vec_col=vec_col)
        .withColumn("nrm", F.sqrt(dot(F.col("vec"), F.col("vec")))))
    a, b = assigned.alias("a"), assigned.alias("b")
    sim = F.round(dot(F.col("a.vec"), F.col("b.vec"))
                  / (F.col("a.nrm") * F.col("b.nrm")), 6)
    return (a.join(b, (F.col("a.cell") == F.col("b.cell"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.col("a.cell").alias("cell"),
                    sim.alias("sim"))
            .filter(F.col("sim") >= threshold))
