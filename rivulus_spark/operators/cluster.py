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
    sweep (linear, no shuffle); the pair stage is ONE applyInPandas
    grouped on the cell id — each cell computes its full pair-sim
    matrix as a numpy sweep with SEQUENTIAL-dimension accumulation
    (the ivf_assign_cells trick: bit-identical to the ascending dot
    fold, so the SQL oracle stays exact, while running ~100x faster
    than evaluating the interpreted fold per pair — the r7 measured
    gap on 2.5M sf1 pairs). Candidate volume is sum(cell_size^2)/2, so
    the centroid COUNT is the knob — size k proportional to the corpus
    (stride-sampled init: k = n/stride keeps cells ~stride and
    candidates ~(stride/2)*n, linear in n); memory per task is
    row-blocked (BLOCK x cell_size sims at a time), so even a
    pathological heavy cell streams instead of materializing n_cell^2.
    The float contract (ascending-dimension accumulation, 6-decimal
    round-half-away-from-zero, min-cid tie-break) is
    ivf_assign_cells', so the whole operator — including the
    approximation — is exactly SQL-oracle-checkable."""

    def gen(key, pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cell": [],
                                 "sim": []}).astype(
                {"id_a": "int64", "id_b": "int64",
                 "cell": "int64", "sim": "float64"})
        X = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in pdf["vec"]])
        dim = X.shape[1]
        nrm = np.zeros(n)
        for d in range(dim):                    # sequential fold
            nrm = nrm + X[:, d] * X[:, d]
        nrm = np.sqrt(nrm)
        cell = int(key[0])
        out_a, out_b, out_s = [], [], []
        block = 1024
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            S = np.zeros((hi - lo, n))
            for d in range(dim):                # sequential fold
                S = S + X[lo:hi, d:d + 1] * X[None, :, d]
            sim = S / (nrm[lo:hi, None] * nrm[None, :])
            r6 = np.copysign(
                np.floor(np.abs(sim) * 1e6 + 0.5) / 1e6, sim)
            # upper triangle by sorted-id position: a before b
            ii, jj = np.nonzero(r6 >= threshold)
            keep = (ii + lo) < jj
            out_a.append(ids[ii[keep] + lo])
            out_b.append(ids[jj[keep]])
            out_s.append(r6[ii[keep], jj[keep]])
        a = np.concatenate(out_a) if out_a else np.array([], dtype=np.int64)
        b = np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)
        s = np.concatenate(out_s) if out_s else np.array([])
        return pd.DataFrame({"id_a": a, "id_b": b,
                             "cell": np.full(len(a), cell,
                                             dtype=np.int64),
                             "sim": s})

    assigned = ivf_assign_cells(df, centroids, id_col=id_col,
                                vec_col=vec_col)
    return (assigned.groupBy("cell")
            .applyInPandas(gen,
                           "id_a long, id_b long, cell long, sim double"))
