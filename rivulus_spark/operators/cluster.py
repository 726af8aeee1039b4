"""Distributed k-means (spherical / cosine) for embedding columns.

Trains the centroid set that ``similarity.ivf_ann_topk`` probes: the
deterministic-sample centroids it defaults to keep the oracle contract
exact, but a real IVF index wants trained centroids — swapping them in
changes only the ``centroids`` input of ``ivf_assign_cells``, not any
plan shape (similarity.py docstring contract).

Scale design, per Lloyd iteration (r8 rework — the r7 two-stage form
shipped (id, vec, cell) back through the JVM between two Python
stages and folded partials with interpreted ``zip_with``; the fused
form below measured sf10 22.7→5.0s on kmeans_cluster_sizes,
sf1→sf10 ratio 7.99→1.98):
- **assignment + update are FUSED** in :func:`_train_partials`: one
  ``mapInPandas`` pass does a dgemm against the broadcast centroid
  matrix and scatter-adds each batch into a dense per-partition
  (k, dim) accumulator — training needs no bit-exact dot-product
  fold because centroids are float-order dependent by contract
  (the parity-checked single assignments keep
  ``ivf_assign_cells(exact=True)``).
- the iteration's ONLY shuffle carries ≤ partitions·k partial rows,
  never the corpus; a numpy ``applyInPandas`` merge reduces them to
  the k-row centroid update (the Lloyd barrier).
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

from .similarity import (_nearest_cols, centroid_pairs,
                         ivf_assign_cells, ivf_assign_cells_2level)


def _train_partials(df: DataFrame, bc, vec_col: str) -> DataFrame:
    """Fused Lloyd map stage: assign + partial-sum in ONE Python pass.

    Per Arrow batch: one dgemm against the broadcast centroid matrix
    (training needs no bit-exact fold — centroids are float-order
    dependent by contract), then a scatter-add into a dense
    per-PARTITION (k, dim) accumulator. Yields once per partition —
    at most k rows, however many rows the partition held — so the
    iteration's only shuffle carries ≤ partitions·k tiny rows and the
    corpus vectors never round-trip back through the JVM (the old
    two-stage form shipped (id, vec, cell) out of the assignment
    mapInPandas only to re-read it in a second Python stage)."""
    from .similarity import _as_double

    src = df.select(_as_double(F.col(vec_col)).alias("vec"))

    def _sums(batches):
        import numpy as np
        import pandas as pd

        prs = sorted(bc.value, key=lambda p: p[0])
        cids = np.asarray([p[0] for p in prs], dtype=np.int64)
        C = np.asarray([p[1] for p in prs], dtype=np.float64)
        cnrm = np.sqrt((C * C).sum(axis=1))
        k = C.shape[0]
        acc_n = np.zeros(k, dtype=np.int64)
        acc_s = np.zeros((k, C.shape[1]), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf["vec"]])
            idx = _nearest_cols(X, C, cnrm, exact=False)
            acc_n += np.bincount(idx, minlength=k)
            np.add.at(acc_s, idx, X)
        seen = np.flatnonzero(acc_n)
        if len(seen):
            yield pd.DataFrame({"cell": cids[seen], "n": acc_n[seen],
                                "sums": [acc_s[i].tolist() for i in seen]})

    return src.mapInPandas(_sums, "cell long, n long, sums array<double>")


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
    because cosine is scale-invariant. ``dim`` is kept for signature
    stability only: the r7 interpreted zip_with merge needed the
    width; the numpy merge reads it from the data."""
    from ..partitioning import driver_loop_conf

    cents = dict(centroid_pairs(init_centroids, id_col, vec_col))
    sc = df.sparkSession.sparkContext

    def _merge(pdf):
        import numpy as np
        import pandas as pd

        return pd.DataFrame({
            "cell": [int(pdf["cell"].iloc[0])],
            "n": [int(pdf["n"].sum())],
            "s": [np.vstack([np.asarray(v) for v in pdf["sums"]])
                  .sum(axis=0).tolist()]})

    # AQE off across the Lloyd rounds (driver_loop_conf): each round
    # reduces to k tiny rows — the stage-per-exchange materialization
    # AQE adds per round buys nothing here
    with driver_loop_conf(df.sparkSession):
        for _ in range(n_iters):
            bc = sc.broadcast(sorted(cents.items()))
            merged = (
                _train_partials(df, bc, vec_col)
                .groupBy("cell")
                .applyInPandas(_merge, "cell long, n long, s array<double>")
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
                         vec_col: str = "embedding",
                         train_df: DataFrame | None = None) -> DataFrame:
    """Train + final assignment, reduced to (cell, n_members) — the
    workload-facing summary (centroid components are float-order
    dependent; membership counts are the stable observable).

    ``train_df`` (default: ``df`` itself) is the set the Lloyd
    iterations sweep; the FINAL assignment always covers all of
    ``df``. Passing a deterministic sample here is the standard IVF
    training recipe (faiss trains coarse quantizers on a bounded
    sample — tens of points per centroid suffice for centroid
    convergence): with a deterministic-stride init (k ∝ n/256) a
    fixed mod-s sample keeps the TRAINING points-per-centroid
    constant at every corpus size, so the n_iters training sweeps
    cost n/s·k each instead of n·k and the full n·k sweep happens
    exactly once. Sampled training changes the trained centroids and
    hence the actual membership counts (approximately unchanged when
    the sample is representative — the faiss recipe's premise, not a
    guarantee); only the invariant summary — sizes sum to n, cells ⊆
    init ids — is unchanged exactly (ADVICE r8)."""
    pairs = kmeans_train_pairs(train_df if train_df is not None else df,
                               init_centroids, dim, n_iters,
                               id_col, vec_col)
    # counts-only consumer: dgemm assignment (no bit-exact contract —
    # the trained centroids are already float-order dependent) and no
    # vector column shipped back through Arrow
    return (ivf_assign_cells(df, pairs, id_col=id_col, vec_col=vec_col,
                             exact=False, keep_vec=False)
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
    assigned = ivf_assign_cells(df, centroids, id_col=id_col,
                                vec_col=vec_col)
    return (assigned.groupBy("cell")
            .applyInPandas(_cell_pairs_gen(threshold),
                           "id_a long, id_b long, cell long, sim double"))


def _cell_pairs_gen(threshold: float):
    """The within-cell exact pair sweep shared by the one- and
    two-level SemDeDup paths (applyInPandas body; see
    semantic_dedup_pairs for the float contract and blocking)."""

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
                # in-place += keeps the identical addition order
                S += X[lo:hi, d:d + 1] * X[None, :, d]
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

    return gen


def semantic_dedup_pairs_2level(df: DataFrame, fine, coarse,
                                threshold: float,
                                id_col: str = "vec_id",
                                vec_col: str = "embedding") -> DataFrame:
    """SemDeDup with a corpus-proportional cell count, made affordable
    by two-level (coarse → fine) assignment — the shape the method
    actually runs at web scale.

    Single-level :func:`semantic_dedup_pairs` pays n·k for assignment,
    so growing k with the corpus (the linear-pair-volume requirement)
    turns the sweep quadratic. This variant assigns through
    :func:`similarity.ivf_assign_cells_2level` — n·(g + k/g) ≈ n·2√k —
    then runs the IDENTICAL within-cell exact pair sweep. Both the
    hierarchical assignment (including its boundary error: a vector
    may land in a near-best fine cell when its true best sits in
    another coarse group) and the pairing are replicated exactly by
    the SQL oracle, so the whole approximation is parity-checked.
    Boundary-recall trade versus one level is second-order: SemDeDup's
    recall loss is already dominated by pairs straddling FINE cells,
    and the coarse level only re-routes vectors near coarse
    boundaries."""
    assigned = ivf_assign_cells_2level(df, fine, coarse, id_col=id_col,
                                       vec_col=vec_col)
    return (assigned.groupBy("cell")
            .applyInPandas(_cell_pairs_gen(threshold),
                           "id_a long, id_b long, cell long, sim double"))


def kcenter_select(df: DataFrame, k: int, dim: int,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Greedy k-center (Gonzalez 1985) coreset selection over an
    embedding column — the farthest-point traversal data-pruning uses
    to pick a maximally-spread representative subset (Sener &
    Savarese 2018's core-set active learning; 2-approximation of the
    optimal k-center cover). Output: one row per selected vector,
    ``(round, vec_id, radius_q)`` — ``round`` 0..k-1 in selection
    order, ``radius_q`` the point's min squared L2 distance to the
    PREVIOUSLY selected set at selection time (floor-truncated at 6
    decimals; 0.0 for the round-0 seed). radius_q is monotonically
    non-increasing and ``radius_q[k]`` bounds the cover radius of the
    whole corpus — the number a curator reads to size k.

    Deterministic: the seed is the lowest id; each round picks the
    max-min-distance point with ties broken by LOWEST id; distances
    fold per dimension in ascending order from a 0.0 seed — exactly
    DuckDB's ``list_dot_product(diff, diff)`` (squares are
    non-negative, so the zero-seed signed-zero corner cannot arise) —
    making every selection decision bit-checkable against the SQL
    oracle, k rounds deep.

    Scale shape: k-1 rounds; each round is ONE corpus scan updating a
    running (id, vec, mind) state — ``least(mind, d2(new_center))``
    with the center as a broadcast literal array — folded into a
    1-row ``max_by`` aggregate that carries the winner's VECTOR out
    with its (mind, -id) argmax key (opt r11: the former
    ``filter(id == winner).head()`` vector fetch was a SECOND full
    corpus scan per round; max_by returns the payload in the same
    scan, halving per-round corpus passes at any scale), collected to
    the driver: a documented k-row driver barrier, the kmeans-loop
    pattern. State is lazily localCheckpointed each round (the next
    round's aggregate materializes it — no separate checkpoint job),
    so round r's plan never contains round r-1's fold chain (the
    connected-components lineage lesson); the loop runs under
    driver_loop_conf (AQE off: a global 1-row aggregate gains nothing
    from stage re-planning). Total cost k scans, never k²·n distance
    work and never a corpus × corpus stage."""
    if k < 1:
        raise ValueError(f"kcenter_select: k must be >= 1, got {k}")
    from .similarity import _as_double

    from .. import partitioning

    # each round folds a dim-length zip_with over every row (an
    # interpreted per-row cost): an under-split parquet source would
    # run every scan in one task (measured 100s on the single-row-
    # group sf0.1 file vs 12s on the 10x-bigger 10-file sf1 dir, r9)
    state = partitioning.spread(
        df.select(F.col(id_col).cast("long").alias("id"),
                  _as_double(F.col(vec_col)).alias("vec")))
    seed = state.agg(F.min("id")).head()[0]
    if seed is None:
        raise ValueError("kcenter_select: empty or all-null-id input")
    rows = state.filter(F.col("id") == seed).head(2)
    if len(rows) > 1:
        raise ValueError(f"kcenter_select: duplicate id {seed}")
    selected = [(0, seed, 0.0)]
    center = list(rows[0].vec)

    def d2(center_vals: list[float]):
        carr = F.array(*[F.lit(float(v)) for v in center_vals])
        return F.aggregate(
            F.zip_with(F.col("vec"), carr,
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)

    import math

    spark = df.sparkSession
    # max_by ordering struct(mind, -id) == the former
    # max(struct(mind, -id)) argmax: ids are unique, so the ordering
    # key never ties and the returned payload row is deterministic
    argmax_key = F.struct(F.col("mind"), (-F.col("id")).alias("nid"))
    with partitioning.driver_loop_conf(spark):
        state = (state.withColumn("mind", d2(center))
                 .localCheckpoint(eager=False))
        for rnd in range(1, k):
            far = (state.agg(
                F.max_by(F.struct("mind", "id", "vec"), argmax_key)
                .alias("m")).select("m.*").head())
            radius = float(far.mind)
            if radius <= 0.0:
                break  # every remaining point duplicates a center
            nxt = int(far.id)
            center = list(far.vec)
            selected.append((rnd, nxt,
                             math.floor(radius * 1_000_000) / 1_000_000))
            state = (state.withColumn(
                "mind", F.least(F.col("mind"), d2(center)))
                .localCheckpoint(eager=False))
    return spark.createDataFrame(
        selected, "round long, vec_id long, radius_q double")
