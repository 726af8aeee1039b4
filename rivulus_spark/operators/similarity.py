"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: a broadcast join of the
(small) query set against the corpus — each executor scans its corpus
partitions once, computes dot products inside whole-stage codegen via
higher-order array functions (no Python), and a per-query top-k window
keeps the result tiny. Linear in corpus size, embarrassingly parallel,
no shuffle except the final per-query top-k (k rows per query).

The scale path is LSH bucketing (random hyperplane signs), which turns
the cross join into an equi-join on bucket signatures — the same
banding pattern as MinHash dedup.

All float math is done in DOUBLE with a sequential left-fold, which is
bit-identical to DuckDB's list_dot_product on DOUBLE[] (verified) — so
results are oracle-checkable without tolerance hacks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product of two array columns."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def dot_unrolled(a: str, b: str, dim: int) -> Column:
    """Dot product of two named double-array columns, unrolled to a
    flat ``a[0]*b[0] + a[1]*b[1] + ...`` SQL expression. Equal to the
    ``dot()`` fold under IEEE ``==`` (same left-to-right summation
    order), and bit-identical except one corner: the fold's ``0.0``
    seed turns a leading ``-0.0`` product into ``+0.0`` (``0.0 + -0.0
    = +0.0``), where the unrolled form can keep ``-0.0`` — invisible
    to ``==`` since ``+0.0 == -0.0``.

    MEASURED SLOWER than the fold on verify-stage volumes — do not use
    in hot paths. At dim=64 the 129-node expression tree exceeds what
    whole-stage codegen keeps in one method, and the fallback
    evaluates each GetArrayItem/Multiply node individually (r6 bisect:
    16.6s vs 10.1s on the sf1 LSH verify; 33s when the missing
    pre-verify distinct let it run inside a larger fused stage). The
    fold iterates the unsafe array once in a tight interpreted loop
    and wins despite not being codegen'd. Kept for small dims and as
    the documented negative result."""
    return F.expr(
        "(" + " + ".join(f"{a}[{k}] * {b}[{k}]" for k in range(dim)) + ")")


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(c: Column) -> Column:
    return c.cast("array<double>")


def normalize(df: DataFrame, id_col: str, vec_col: str,
              out_id: str = "id", out_vec: str = "nvec") -> DataFrame:
    """Project (id, unit-normalized double vector). Normalizing ONCE per
    vector turns every pairwise cosine into a single dot product —
    higher-order-function folds are interpreted (not codegen'd), so at
    n^2 pair counts the 3x dot-product saving dominates the runtime.
    The norm is materialized through a shuffle-free two-step projection."""
    v = _as_double(F.col(vec_col))
    with_norm = df.select(F.col(id_col).alias(out_id), v.alias("__v"),
                          l2_norm(v).alias("__n"))
    return with_norm.select(
        out_id,
        F.transform(F.col("__v"), lambda x: x / F.col("__n")).alias(out_vec))


def with_norm(df: DataFrame, id_col: str, vec_col: str,
              out_id: str, out_vec: str, out_norm: str) -> DataFrame:
    """Project (id, raw double vector, l2 norm). Computing the norm ONCE
    per row (instead of once per pair) keeps the pairwise sim down to a
    single interpreted fold, and ``dot(a,b)/(na*nb)`` is the EXACT
    expression the DuckDB oracles evaluate — bit-identical, including
    fold order, unlike pre-normalized vectors (where the per-element
    division reassociates the error)."""
    v = _as_double(F.col(vec_col))
    return df.select(F.col(id_col).alias(out_id), v.alias(out_vec),
                     l2_norm(v).alias(out_norm))


def knn_cosine(corpus: DataFrame, queries: DataFrame, k: int,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, rank, sim) with sim rounded to 6
    decimals; rank ordered by (sim desc, neighbor_id) for determinism.
    The query side is broadcast — the corpus is scanned exactly once.
    Sim is dot(a,b)/(|a|*|b|) on the raw vectors with per-row
    materialized norms: one fold per pair, and exactly the oracle's
    float expression (ADVICE r1: the normalize-first form was not
    bit-identical to the oracle)."""
    c = with_norm(corpus, id_col, vec_col, "n_id", "n_vec", "n_nrm")
    q = with_norm(queries, id_col, vec_col, "q_id", "q_vec", "q_nrm")
    sim = dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_nrm") * F.col("n_nrm"))
    pairs = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", F.round(sim, 6).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "n_id", "rank", "sim"))


def cosine_neardup_pairs(df: DataFrame, threshold: float,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """All pairs with cosine >= threshold (exact, O(n^2) — the LSH
    variant buckets by hyperplane signature first). Output
    (id_a, id_b, sim) with id_a < id_b, sim rounded to 6."""
    base = normalize(df, id_col, vec_col, "id", "vec")
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.round(dot(F.col("a.vec"), F.col("b.vec")), 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def cosine_neardup_pairs_blocked(df: DataFrame, threshold: float,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding",
                                 n_blocks: int = 8) -> DataFrame:
    """Exact all-pairs cosine >= threshold via block-pair matrix
    multiplication — same output contract as cosine_neardup_pairs,
    ~50x faster on corpus-scale inputs.

    Plan shape: normalize (projection) -> pack vectors into n_blocks
    row-groups, persisted once (one shuffle, one computation for both
    join sides) -> map-side explode of each pack into the unordered
    block-pair ids it participates in -> ONE shuffle-hash EQUI-join on
    pair_id that brings exactly two packs together per output row ->
    one numpy A @ B.T per pair inside Arrow-batched mapInPandas.

    Scale properties (the round-1 plan failed all three):
    - no broadcast: both join sides are shuffled by pair_id; the plan
      contains no BroadcastExchange of packed data (asserted in
      tests/test_plans.py). Shuffle volume is sum over pairs of
      |A|+|B| ~ corpus * (n_blocks+1) — bounded and independent of
      executor count, unlike a corpus broadcast.
    - parallelism == pair count: the matmul stage is already
      partitioned by pair_id (nb*(nb+1)/2 keys), no round-robin
      repartition of heavy payloads.
    - bounded rows: a packed row holds corpus/n_blocks vectors; pick
      n_blocks so block_bytes ~ N*dim*8/nb fits an aggregation buffer
      and stays far under the 2 GB single-field ceiling. Pair count
      grows as nb^2/2 while per-pair work shrinks as 1/nb^2 — total
      sims are O(N^2) regardless; past ~1e7 vectors use
      ann_cosine_lsh instead.

    Float contract: sims are numpy float64 dot products of the
    Spark-normalized vectors, rounded/filtered JVM-side with F.round —
    agrees with the sequential-fold path to the last ulp, far inside
    the 6-decimal rounding the output carries. The numpy prefilter
    uses slack 1e-6 (> half the 6-decimal rounding granularity) so it
    is strictly looser than the exact rounded JVM filter.
    """
    from ..cache import persist

    base = normalize(df, id_col, vec_col, "id", "vec")
    packed = persist(
        base.withColumn("blk", F.pmod(F.col("id"), F.lit(n_blocks)).cast("int"))
        .groupBy("blk")
        .agg(F.collect_list("id").alias("ids"),
             F.collect_list("vec").alias("vecs")))
    # Pack p is side A of pairs (p, j) for j >= p and side B of pairs
    # (i, p) for i <= p; pair_id = i * n_blocks + j. The explode is
    # map-side (no shuffle of its own); the payload is shuffled once,
    # keyed by pair_id.
    a = packed.select(
        F.explode(F.transform(F.sequence(F.col("blk"), F.lit(n_blocks - 1)),
                              lambda j: F.col("blk") * n_blocks + j))
        .alias("pair_id"),
        F.col("blk").alias("blk_a"), F.col("ids").alias("ids_a"),
        F.col("vecs").alias("vecs_a"))
    b = packed.select(
        F.explode(F.transform(F.sequence(F.lit(0), F.col("blk")),
                              lambda i: i * n_blocks + F.col("blk")))
        .alias("pair_id"),
        F.col("blk").alias("blk_b"), F.col("ids").alias("ids_b"),
        F.col("vecs").alias("vecs_b"))
    pairs = a.hint("shuffle_hash").join(b, "pair_id")
    # numpy prefilter slack: strictly looser than round(sim, 6) >= thr
    slack = 1e-6

    def _mm(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                A = np.vstack([np.asarray(v, dtype=np.float64)
                               for v in row.vecs_a])
                B = np.vstack([np.asarray(v, dtype=np.float64)
                               for v in row.vecs_b])
                S = A @ B.T
                mask = S >= threshold - slack
                if row.blk_a == row.blk_b:
                    # same block appears once: emit each unordered pair
                    # once via the id ordering
                    mask &= ids_a[:, None] < ids_b[None, :]
                ii, jj = np.nonzero(mask)
                ia, ib = ids_a[ii], ids_b[jj]
                yield pd.DataFrame({"id_a": np.minimum(ia, ib),
                                    "id_b": np.maximum(ia, ib),
                                    "sim_raw": S[ii, jj]})

    out = pairs.mapInPandas(_mm, "id_a long, id_b long, sim_raw double")
    return (out.select("id_a", "id_b",
                       F.round(F.col("sim_raw"), 6).alias("sim"))
            .filter(F.col("sim") >= threshold))


def band_widths(n_planes: int, n_bands: int) -> list[int]:
    """Per-band bit widths: the first ``n_planes % n_bands`` bands get
    ``floor + 1`` bits, the rest ``floor`` — the same remainder
    distribution simhash_pairs uses, so no band is ever empty for
    n_planes >= n_bands. Shared by the Spark operator and the SQL
    oracle generator (workload._neardup_lsh_oracle) — the two MUST
    band identically for oracle parity, so neither hardcodes the
    formula. Band j's planes start at sum(widths[:j])."""
    if n_planes < n_bands:
        raise ValueError(
            f"n_planes={n_planes} < n_bands={n_bands}: a zero-bit band "
            f"would be a constant join key whose self-join degenerates "
            f"to the O(n^2) cross product")
    base, rem = divmod(n_planes, n_bands)
    return [base + 1 if j < rem else base for j in range(n_bands)]


def adaptive_lsh_params(n_rows: int, base_width: int = 4,
                        base_bands: int = 4, target_occupancy: int = 8,
                        design_sim: float = 0.9,
                        max_bands: int = 16) -> tuple[int, int]:
    """(n_planes, n_bands) sized to the corpus so candidate volume
    stays linear in n as the corpus grows.

    With FIXED bits per band, expected bucket occupancy grows linearly
    with n and intra-bucket candidate pairs quadratically — measured as
    a 22x time ratio on 10x rows in the r3 scale audit. Two axes adapt:

    - width (bits/band) tracks log2(n / target_occupancy)
      FRACTIONALLY (r7, the occupancy-sawtooth fix): the integer rule
      "smallest w with n/2^w <= target" let expected occupancy — and
      with it candidate volume — swing 2x between width steps
      (measured 9.8 at sf1 vs 12.2 at sf10 ⇒ 15.1x candidates on 10x
      rows, the 12.98x sf10 curve point). Instead the fractional part
      f of log2(n/target) is realized by giving k ≈
      2*bands*(1 - 2^-f) of the bands one extra bit (remainder
      distribution, band_widths), which holds the MEAN per-band
      occupancy at exactly target_occupancy for every n: candidate
      volume is smooth and truly linear in n, no sawtooth. Width caps
      at 15 (32k buckets/band; int64 band values forever safe).
    - n_bands grows to compensate the recall the extra bits cost: a
      pair at design_sim collides per-plane with prob p =
      1-acos(s)/pi, per band p^width_j, overall 1 - prod_j
      (1-p^width_j). Bands increase until the miss rate at the
      blended widths is back to the base (4 bits x 4 bands) design
      point, capped at max_bands — past the cap recall decays slowly
      with corpus size, the standard LSH trade (multiprobe is the
      next rung, out of scope).
    - target_occupancy dropped 16 -> 8 (r7): one extra bit halves
      per-band candidates; the bands loop buys the recall back, and
      the blended miss rate stays at or below the historical design
      point wherever bands are under the cap.

    Deterministic in n_rows alone, so the SQL oracle generator derives
    bit-identical parameters from the same row count. Returns
    (n_planes, n_bands); per-band widths follow from
    band_widths(n_planes, n_bands)."""
    import math

    if n_rows <= (target_occupancy << base_width):
        x = float(base_width)
    else:
        x = min(15.0, math.log2(n_rows / target_occupancy))
    w = int(x)
    f = x - w
    p = 1.0 - math.acos(design_sim) / math.pi
    target_miss = (1.0 - p ** base_width) ** base_bands

    def extra_bit_bands(bands: int) -> int:
        # k of the bands carry w+1 bits; k/bands chosen so the mean
        # occupancy (n/2^w)*(bands-k + k/2)/bands equals the target
        return min(bands, round(2 * bands * (1.0 - 2.0 ** -f)))

    def miss(bands: int) -> float:
        k = extra_bit_bands(bands)
        return ((1.0 - p ** (w + 1)) ** k
                * (1.0 - p ** w) ** (bands - k))

    bands = base_bands
    while miss(bands) > target_miss and bands < max_bands:
        bands += 1
    return w * bands + extra_bit_bands(bands), bands


def cosine_neardup_pairs_lsh(df: DataFrame, threshold: float, dim: int,
                             n_planes: int = 16, n_bands: int = 4,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             edge_mode: str = "pairs") -> DataFrame:
    """All-pairs cosine near-duplicates via hyperplane-LSH banding —
    the 100 TB path for the blocked-matmul contract. Output
    (id_a, id_b, sim), id_a < id_b, sim rounded to 6, exact-verified
    (no false positives); pairs whose signatures share no band are
    missed (recall < 1, tunable via n_planes/n_bands — more bands of
    fewer bits raise recall and candidate volume).

    Scale shape (same banding pattern as MinHash dedup): one codegen'd
    projection computes the n_planes-bit signature, a map-side explode
    emits (band_idx, band_value) keys, and candidates come from an
    equi-join on the band key — a hash shuffle whose output is ~the
    number of true near-dups, never corpus². Verification re-joins the
    candidate ids to the (vec, norm) table and computes the exact
    rounded sim JVM-side, so every emitted pair carries the same sim
    the exact operators produce. Total cost is linear in corpus +
    candidates; no O(n^2) stage anywhere, unlike cosine_neardup_pairs
    (pair enumeration) and cosine_neardup_pairs_blocked (O(n^2) sims
    inside linear tasks).

    Deterministic planes (plane_component) are shared with the SQL
    oracle generator, so the approximation itself is oracle-checkable.

    Band values are computed per band (bit i of band j = sign of plane
    offsets[j]+i), not packed into one int64 signature — identical
    buckets to the historical packed form for n_planes <= 63, but with
    no cap on total planes, which adaptive_lsh_params needs at large
    corpus sizes. Per-band widths come from band_widths (remainder-
    distributed floor/floor+1 — the blended layout adaptive_lsh_params
    uses to hold mean occupancy at its target for every corpus size;
    no band is ever empty, so no constant-key cross-join degeneration).

    Band rows always come from ONE Arrow mapInPandas stage
    (_band_rows_numpy) whose sequential-fold accumulation is
    bit-identical to the SQL oracle's list_dot_product — never from
    unrolled per-plane codegen expressions. The historical codegen
    path (_bands_array_expr, kept as the parity-test reference)
    inlined n_planes x dim multiply-add terms into the Generate
    stage's one doConsume method; Janino's 64 KB method cap made it
    SILENTLY fall back to interpreted row-at-a-time eval at just
    16 planes x 64 dims (VERDICT r8 #1) — the worst of both: compile
    time burned per query, then the slow path anyway. The Arrow fold
    is bucket-bit-equal AND vectorized at any plane count;
    tests/test_plans.py pins no-fallback by running the realistic
    shape under spark.sql.codegen.fallback=false.

    ``edge_mode="star"`` (cluster consumers only): emit verified
    (bucket-min, member) star edges instead of all bucket pairs —
    O(occupancy) per band bucket, the hot-bucket-safe form for
    connected-components consumers on mass-duplicated corpora; see
    dedup.lsh_candidate_edges_star for the contract and caveat.
    """
    widths = band_widths(n_planes, n_bands)
    # deliberately NOT persisted (ADVICE r10): Spark's cache manager
    # substitutes a persisted plan back into ANY frame with the same
    # logical plan, and a cached child (TableCacheQueryStage) defeats
    # AQE's exchange-reuse canonicalization — so persisting here made
    # the verify probes broadcast the vector table TWICE. Unpersisted,
    # the band self-join shares one shuffle exchange (both sides
    # canonically identical) and the two verify probes share one
    # broadcast/shuffle of `base` (ReusedExchange, plan-pinned below),
    # so the norm projection still computes exactly twice (band side +
    # one shared verify side) — and a 100 TB vector table was never
    # cacheable anyway.
    base = with_norm(df, id_col, vec_col, "id", "vec", "nrm")
    e = _band_rows_numpy(base.select("id", "vec"), dim, widths)
    if edge_mode == "star":
        # hot-bucket-safe banding for CLUSTER consumers (VERDICT r10
        # #3, same contract as dedup.lsh_candidate_edges_star): per
        # (bi, bv) bucket link every member to the bucket MINIMUM —
        # identical candidate-graph connected components, O(occupancy)
        # instead of O(occupancy²) edges on a mass-duplicated corpus;
        # after exact verification components match the pair path
        # whenever bucket co-members are mutually near-dup (the
        # boilerplate case the mode exists for — see the dedup twin's
        # docstring for the precise caveat)
        # bucket-min via a WINDOW over one (bi, bv) exchange, not a
        # min-agg + join-back: the agg side's exchange child is a
        # partial aggregate, so the join form's two exchanges never
        # canonicalize and _band_rows_numpy (the expensive Arrow
        # projection pass) evaluated TWICE — see
        # dedup.lsh_candidate_edges_star for the measured A/B
        from pyspark.sql import Window

        mid = F.min("id").over(Window.partitionBy("bi", "bv"))
        cands = (e.select(mid.alias("mid"), "id")
                 .filter(F.col("id") != F.col("mid"))
                 .select(F.col("mid").alias("id_a"),
                         F.col("id").alias("id_b"))
                 .distinct())
    elif edge_mode == "pairs":
        l, r = e.alias("l"), e.alias("r")
        # shuffle_hash (r10): the band self-join reuses one exchange of
        # the band-row table for both sides; hash-building it avoids the
        # SMJ's sort of every band row — pure win, the key is hash-equi
        cands = (l.hint("shuffle_hash")
                 .join(r, (F.col("l.bi") == F.col("r.bi"))
                       & (F.col("l.bv") == F.col("r.bv"))
                       & (F.col("l.id") < F.col("r.id")))
                 .select(F.col("l.id").alias("id_a"),
                         F.col("r.id").alias("id_b"))
                 .distinct())
    else:
        raise ValueError(f"edge_mode must be 'pairs' or 'star', got "
                         f"{edge_mode!r}")
    # ONE shared (id, vec, nrm) projection feeds BOTH verify probes
    # (ADVICE r10): the two sides previously projected per-side aliased
    # columns, so their BroadcastExchange subtrees were not sameResult
    # and the vector table was broadcast (or shuffled) TWICE. With an
    # identical child plan on both joins, ReuseExchange collapses them
    # into one physical broadcast/exchange (see the no-persist note on
    # `base` above for why the child must stay uncached).
    shared = base
    # verify stays the JVM interpreted fold — a MEASURED negative
    # result for the Arrow alternative (r9): a numpy sequential-fold
    # verify stage (bit-equal sims, 0 set difference on the sf10
    # 22.8M-candidate corpus) measured jvm 16.6s / arrow 17.2s at
    # threshold 0.4 and jvm 10.3s / arrow 16.8s at 0.5 (fresh-session
    # best-of-2 A/B, full chain, noop sink): shipping every candidate's
    # two 64-dim vectors through Arrow (~23 GB at sf10) costs more
    # than the interpreted fold saves. An isolated probe that
    # suggested 11x the other way was a session-state artifact —
    # trust the clean A/B.
    sim = (dot(F.col("sa.vec"), F.col("sb.vec"))
           / (F.col("sa.nrm") * F.col("sb.nrm")))
    # Verify-join physical strategy (r10). Without intervention both
    # re-join steps planned as SortMergeJoin, and the id_b-side sort
    # of candidate rows CARRYING va (pairs x ~550 bytes, ~12 GB at
    # sf10's 22.8M candidates) dominated the whole chain in
    # UnsafeExternalSorter.insertRecord/copyMemory with wildly
    # unstable spill + shuffle-file-cleanup behavior — measured
    # 74-700s for the sf10 verify across IDENTICAL reps (jstack: all
    # 32 threads in the sorter, not the sim eval; the r9 scale-curve
    # rows for this family under-recorded exactly this). Two paths:
    # - under the gate (vector-table source <= 128 MB on disk, read
    #   from file metadata only): BROADCAST the shared (id, vec, nrm)
    #   table into both probes — the pair stream never shuffles its
    #   attached vectors at all, the single biggest disk-churn source
    #   in the chain. The gate compares COMPRESSED parquet bytes
    #   against a deserialized in-memory build side that is typically
    #   2-4x larger (ADVICE r10), so 128 MB on disk bounds the one
    #   reused broadcast at ~0.5 GB deserialized — inside a default
    #   executor, same documented-threshold pattern as
    #   connected_components' driver gate.
    # - above the gate (real-cluster corpus): shuffle_hash on the
    #   vector side — same shuffles as SMJ, hash build instead of
    #   sort, no broadcast assumption; the identical vector-side
    #   exchange is likewise reused across the two probes.
    from ..partitioning import estimated_input_bytes
    src_bytes = estimated_input_bytes(df)
    if src_bytes is not None and src_bytes <= (128 << 20):
        shared = F.broadcast(shared)
    else:
        shared = shared.hint("shuffle_hash")
    sa, sb = shared.alias("sa"), shared.alias("sb")
    return (cands.join(sa, F.col("id_a") == F.col("sa.id"))
            .join(sb, F.col("id_b") == F.col("sb.id"))
            .select("id_a", "id_b", F.round(sim, 6).alias("sim"))
            .filter(F.col("sim") >= threshold))


def _plane_dot_sql(col_name: str, p: int, dim: int) -> str:
    """Unrolled SQL dot product of a named double-array column with
    deterministic plane ``p`` — same left-to-right summation order and
    promotions as the ``dot()`` fold, so sign decisions (and with them
    buckets) are bit-identical; ``repr(float)`` round-trips the exact
    double through the SQL parser."""
    return "(" + " + ".join(
        f"{col_name}[{k}] * {plane_component(p, k)!r}"
        for k in range(dim)) + ")"


def _bands_array_expr(col_name: str, dim: int, widths: list[int]) -> Column:
    """JVM-expression array<struct<bi,bv>> of band values: bit i of
    band j = sign of plane offsets[j]+i, widths from band_widths.
    PARITY-TEST REFERENCE ONLY — no production caller since r9: the
    n_planes x dim terms land in ONE Generate doConsume method, which
    blows Janino's 64 KB cap at realistic shapes (16 planes x 64 dims)
    and silently drops the stage to interpreted eval (VERDICT r8 #1).
    _band_rows_numpy is the production path; the cross-engine tests
    keep this form to prove bucket bit-equality at small dims where it
    still compiles."""
    structs = []
    off = 0
    for j, w in enumerate(widths):
        terms = [
            f"IF({_plane_dot_sql(col_name, off + i, dim)} >= 0, {1 << i}, 0)"
            for i in range(w)]
        off += w
        bv = "CAST(" + " + ".join(terms) + " AS BIGINT)"
        structs.append(f"struct({j} AS bi, {bv} AS bv)")
    return F.expr("array(" + ", ".join(structs) + ")")


def _band_rows_numpy(df_id_vec: DataFrame, dim: int,
                     widths: list[int]) -> DataFrame:
    """(id, bi, bv) band rows via one vectorized Arrow stage — the
    production band path at ANY plane count (r9; see
    cosine_neardup_pairs_lsh). Sign decisions accumulate
    dimension-by-dimension in ascending order — one broadcasted
    multiply-add per dimension, the exact summation order of the SQL
    oracle's list_dot_product and the historical unrolled-expression
    fold — so bucket keys are BIT-IDENTICAL across the Arrow path, the
    expression path, and DuckDB (the same float contract
    ivf_assign_cells pins; a dgemm `mat @ planes` reorders the sum and
    can flip a sign within ~1 ulp of zero). Cost: the fold kernel is
    ~10-50x slower than one dgemm in isolation (measured 33ms vs 0.6ms
    per 10k x 64 x 16 batch), but the band stage is a small slice of
    the query — end-to-end embedding_neardup_lsh at sf0.1 measured
    fold 2.08/1.71s vs dgemm 2.38/2.47s warm, within run-to-run noise
    — and the fold buys the bit-exact oracle seam at every scale.
    Band j covers planes [offsets[j], offsets[j]+widths[j]) — the same
    blended-width layout as _bands_array_expr."""
    import numpy as np
    import pandas as pd

    n_bands = len(widths)
    n_planes = sum(widths)
    offsets = [sum(widths[:j]) for j in range(n_bands)]
    planes = np.array([[plane_component(p, k) for k in range(dim)]
                       for p in range(n_planes)], dtype=np.float64).T

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray(list(pdf["vec"]), dtype=np.float64)
            acc = np.zeros((len(pdf), n_planes))
            for k in range(dim):                       # sequential fold
                acc += mat[:, k:k + 1] * planes[k]
            signs = acc >= 0
            bvs = np.zeros((len(pdf), n_bands), dtype=np.int64)
            for j in range(n_bands):
                lo, hi = offsets[j], offsets[j] + widths[j]
                w = (1 << np.arange(hi - lo, dtype=np.int64))
                bvs[:, j] = signs[:, lo:hi] @ w
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame({
                "id": np.repeat(ids, n_bands),
                "bi": np.tile(np.arange(n_bands, dtype=np.int32),
                              len(pdf)),
                "bv": bvs.reshape(-1),
            })

    return df_id_vec.mapInPandas(gen, schema="id long, bi int, bv long")


# ----------------------------------------------------------------------
# LSH-bucketed approximate variant (the 100 TB path)
# ----------------------------------------------------------------------

def plane_component(p: int, i: int) -> float:
    """Component i of deterministic pseudo-random hyperplane p, in
    [-0.5, 0.5). Shared by the Spark operator and the SQL oracle
    generator so both engines see bit-identical planes.

    splitmix64-style avalanche of (p, i): the historical affine form
    (``(p*1e6+3 + i*7919 + c) * knuth % 1e6``) made plane p+1 a
    near-constant translate of plane p mod 1 — adjacent planes up to
    |cos| = 0.9998, so band bits were correlated, effective band width
    collapsed, and sf1 bucket occupancy hit ~400 vs the ~10 the
    adaptive sizing targets (13.3M raw candidates for 14k true pairs,
    the r5 +59% bench regression and the 8.27x curve point). A full
    bit-mix keeps every (p, i) cell independent: measured max |cos|
    between planes drops to ~0.4 at dim=64 (random-matrix range) and
    sf1 candidates to ~1/5th."""
    h = (p * 0x9E3779B97F4A7C15 + i * 0xC2B2AE3D27D4EB4F
         + 0x165667B19E3779F9) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 33
    return h / 2.0 ** 64 - 0.5


def hyperplane_signature(vec: str | Column, dim: int,
                         n_planes: int = 16) -> Column:
    """Random-hyperplane LSH signature: sign pattern of dot products
    with n_planes deterministic pseudo-random hyperplanes. Cosine-close
    vectors collide with high probability.

    Pass the COLUMN NAME (of an array<double> column) for the fast
    path — the whole signature parses as one JVM-side SQL expression.
    A Column argument still works via the historical fold composition
    (identical values, ~n_planes x dim py4j calls to build)."""
    if isinstance(vec, str):
        terms = [f"IF({_plane_dot_sql(vec, p, dim)} >= 0, {2 ** p}, 0)"
                 for p in range(n_planes)]
        return F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)")
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(plane_component(p, i)) for i in range(dim)])
        bits.append(F.when(dot(vec, plane) >= 0,
                           F.lit(2 ** p).cast("long")).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def centroid_pairs(centroids, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> list:
    """Normalize a centroid input — a DataFrame (EAGER: collects one
    job, the documented convenience path) or a plain ``(cid, vector)``
    iterable — to a sorted pair list, the lazy form ivf_assign_cells
    and the k-means trainer consume without running a job. The single
    normalization point for both modules, so the cast/sort contract
    (long ids, float64 vectors, ascending cid) cannot drift."""
    if isinstance(centroids, DataFrame):
        rows = (centroids
                .select(F.col(id_col).cast("long").alias("cid"),
                        _as_double(F.col(vec_col)).alias("cvec"))
                .collect())
        return sorted((r.cid, list(r.cvec)) for r in rows)
    return sorted((int(c), list(v)) for c, v in centroids)


def ivf_assign_cells(df: DataFrame, centroids, id_col: str = "vec_id",
                     vec_col: str = "embedding", exact: bool = True,
                     keep_vec: bool = True) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine, 6-decimal
    rounded, centroid-id tie-break). Returns (id, vec, cell) with the
    RAW double vector.

    ``centroids`` may be:

    - a ``DataFrame`` with (id_col, vec_col) — convenience path.
      **EAGER**: building the plan collects the centroid table (one
      Spark job) so it can broadcast; fine interactively, but a lazily
      composed pipeline should pre-collect instead.
    - a plain ``list`` of ``(cid, vector)`` pairs — fully lazy, no job
      at plan-construction time.
    - a SparkContext ``Broadcast`` whose value is such a pair list —
      lazy, and reuses one broadcast across many operator calls (the
      k-means training loop does this each iteration).

    Scale shape: the centroid matrix (an IVF list count is ~sqrt(N),
    always tiny next to the corpus) is broadcast to a ``mapInPandas``
    scoring pass — one vectorized numpy sweep per Arrow batch, NO
    join, NO shuffle, no per-vector interpreted folds (the round-1
    broadcast-join + F.aggregate form was O(N*nlist*dim) in the
    interpreted expression evaluator — the one superlinear interpreted
    pass in the repo, per VERDICT r1 #4). Output is one row per input
    row, pipelined map-side.

    Float contract (keeps the DuckDB oracle bit-green): dot products
    accumulate dimension-by-dimension in ascending order — the same
    summation order as DuckDB's list_dot_product and Spark's
    sequential F.aggregate fold, which BLAS dgemm would not preserve —
    sims are dot(x,c)/(|x|*|c|) exactly as the oracle writes it, and
    rounding replicates round-half-away-from-zero on the raw double
    (DuckDB/Spark ROUND) rather than numpy's banker's rounding. The
    argmax tie-break is lowest centroid id: columns are sorted by cid,
    so np.argmax's first-maximum rule is exactly the oracle's
    ``ORDER BY sim DESC, cid`` rank-1 row.

    ``exact=False`` swaps the sequential fold for ONE BLAS dgemm
    (``X @ C.T``) — ~64x less memory traffic at dim 64, same rounding
    and tie-break, but dot products may differ from the oracle's fold
    in the last ulp (which can flip a 6-decimal boundary case).
    Consumers WITHOUT a bit-exact assignment contract — the k-means
    training loop, whose centroids are float-order-dependent anyway —
    should pass False; parity-checked queries (kmeans_assign_sizes,
    semantic_dedup, the IVF ANN probes) keep the default.
    ``keep_vec=False`` drops the vector from the output schema so the
    Arrow transfer back to the JVM carries (id, cell) only — column
    pruning cannot reach inside a mapInPandas yield, so callers that
    only count members (kmeans_cluster_sizes) skip shipping the
    corpus twice."""
    from pyspark.broadcast import Broadcast

    if isinstance(centroids, Broadcast):
        # resolved worker-side from the caller's broadcast; the
        # driver-side copy is cheap to inspect for the empty guard
        if not centroids.value:
            raise ValueError(
                "ivf_assign_cells: centroid broadcast is empty (check "
                "the stride/init selection against the corpus id space)")
        bc = centroids
    else:
        pairs = centroid_pairs(centroids, id_col, vec_col)
        if not pairs:
            raise ValueError(
                "ivf_assign_cells: centroid set is empty (check the "
                "stride/init selection against the corpus id space)")
        bc = df.sparkSession.sparkContext.broadcast(pairs)

    src = df.select(F.col(id_col).cast("long").alias("id"),
                    _as_double(F.col(vec_col)).alias("vec"))

    def _assign(batches):
        import numpy as np
        import pandas as pd

        prs = sorted(bc.value, key=lambda p: p[0])
        cids_l = [p[0] for p in prs]
        C_l = [p[1] for p in prs]
        cids = np.asarray(cids_l, dtype=np.int64)
        C = np.asarray(C_l, dtype=np.float64)          # (nlist, dim)
        dim = C.shape[1]
        if exact:
            cnrm = np.zeros(C.shape[0])
            for d in range(dim):                       # sequential fold
                cnrm = cnrm + C[:, d] * C[:, d]
            cnrm = np.sqrt(cnrm)
        else:
            cnrm = np.sqrt((C * C).sum(axis=1))
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf["vec"]])       # (n, dim)
            # one copy of the round/tie-break semantics for both paths
            cell = cids[_nearest_cols(X, C, cnrm, exact)]
            if keep_vec:
                yield pd.DataFrame({"id": pdf["id"].to_numpy(),
                                    "vec": pdf["vec"],
                                    "cell": cell})
            else:
                yield pd.DataFrame({"id": pdf["id"].to_numpy(),
                                    "cell": cell})

    schema = ("id long, vec array<double>, cell long" if keep_vec
              else "id long, cell long")
    return src.mapInPandas(_assign, schema)


def _nearest_cols(X, C, cnrm, exact):
    """Column-index argmax-cosine — the ONE copy of the shared
    rounding/tie-break semantics (6-decimal round-half-away-from-zero
    on the raw double, first maximum = lowest column): ``exact=True``
    accumulates dot products dimension-by-dimension ascending (the
    SQL-oracle float contract), ``exact=False`` uses one dgemm (for
    consumers without a bit-exact contract — k-means training, whose
    centroids are float-order dependent anyway)."""
    import numpy as np

    dim = C.shape[1]
    if exact:
        S = np.zeros((X.shape[0], C.shape[0]))
        xnrm = np.zeros(X.shape[0])
        for d in range(dim):                           # sequential fold
            S += X[:, d:d + 1] * C[None, :, d]
            xnrm += X[:, d] * X[:, d]
    else:
        S = X @ C.T
        xnrm = (X * X).sum(axis=1)
    sim = S / (np.sqrt(xnrm)[:, None] * cnrm[None, :])
    r6 = np.copysign(np.floor(np.abs(sim) * 1e6 + 0.5) / 1e6, sim)
    return np.argmax(r6, axis=1)


def _exact_nearest(X, cids, C, cnrm=None):
    """numpy argmax-cosine under the ivf_assign_cells float contract
    (see _nearest_cols). Shared by the single- and two-level
    assignment workers and the tiny driver-side fine→coarse mapping
    so the contract cannot drift between levels."""
    import numpy as np

    if cnrm is None:
        cnrm = np.zeros(C.shape[0])
        for d in range(C.shape[1]):                    # sequential fold
            cnrm += C[:, d] * C[:, d]
        cnrm = np.sqrt(cnrm)
    return cids[_nearest_cols(X, C, cnrm, exact=True)]


def ivf_assign_cells_2level(df: DataFrame, fine, coarse,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            keep_vec: bool = True) -> DataFrame:
    """Two-level (coarse → fine) IVF assignment — the scan shape that
    keeps a corpus-proportional cell count affordable.

    Single-level assignment against k cells costs n·k dot products;
    SemDeDup-style dedup WANTS k ∝ n (bounded cells ⇒ linear pair
    volume), which makes the single-level sweep quadratic in corpus
    size. The standard fix (faiss IMI / coarse quantizer; the same
    shape SemDeDup uses at web scale) is hierarchical: first assign to
    one of g ≪ k COARSE centroids, then to the nearest FINE centroid
    within that coarse group only — n·(g + k/g) work, minimized at
    g = √k, i.e. n·2√k instead of n·k. The trade is boundary error: a
    vector whose true nearest fine centroid sits in a *different*
    coarse group is assigned to its within-group best instead —
    inherent to every multi-level quantizer, and exactly replicated by
    the SQL oracle, so the approximation itself is parity-checked.

    Mechanics: a tiny driver-side pass maps each fine centroid to its
    nearest coarse centroid (k·g work on ≤k rows — never the corpus);
    the broadcast carries the coarse matrix plus one (fids, F) block
    per coarse group; ONE ``mapInPandas`` sweep then does both levels
    per Arrow batch, vectorized per group. Every comparison at both
    levels follows the ivf_assign_cells float contract
    (ascending-dimension fold, 6-decimal round, min-id tie-break) so a
    two-stage ``row_number`` SQL replica matches bit-for-bit. Coarse
    ids MUST be a subset of the fine ids (stride-multiple init;
    validated) so groups are non-empty in the generic case — and
    because a coarse centroid can still lose its own fine twin to a
    6-decimal tie with a near-identical coarse sibling, vectors route
    only through COVERED groups (those that won at least one fine
    centroid; the SQL replica restricts identically)."""
    import numpy as np

    fine_pairs = centroid_pairs(fine, id_col, vec_col)
    coarse_pairs = centroid_pairs(coarse, id_col, vec_col)
    if not fine_pairs or not coarse_pairs:
        raise ValueError(
            "ivf_assign_cells_2level: empty fine or coarse centroid set "
            "(check the stride/init selection against the corpus id space)")
    if not {c for c, _ in coarse_pairs} <= {f for f, _ in fine_pairs}:
        # with coarse ⊄ fine a coarse group can be empty while still
        # winning a vector's argmax — fail loudly instead of letting
        # the worker hit a missing group
        raise ValueError(
            "ivf_assign_cells_2level: coarse centroid ids must be a "
            "subset of the fine ids (stride-multiple init) so every "
            "routable group is non-empty")

    gids_all = np.asarray([p[0] for p in coarse_pairs], dtype=np.int64)
    G_all = np.asarray([p[1] for p in coarse_pairs], dtype=np.float64)
    fids = np.asarray([p[0] for p in fine_pairs], dtype=np.int64)
    Fm = np.asarray([p[1] for p in fine_pairs], dtype=np.float64)
    # driver-side fine→coarse map: k·g on k rows, never the corpus
    fine_group = _exact_nearest(Fm, gids_all, G_all)
    groups = {int(g): (fids[fine_group == g], Fm[fine_group == g])
              for g in np.unique(fine_group)}
    # vectors route only through COVERED groups (a coarse centroid can
    # lose its own fine twin to a 6-decimal tie with a near-identical
    # coarse sibling; the SQL oracle restricts the same way)
    covered = np.asarray(sorted(groups), dtype=np.int64)
    keep = np.isin(gids_all, covered)
    bc = df.sparkSession.sparkContext.broadcast(
        (gids_all[keep], G_all[keep], groups))

    src = df.select(F.col(id_col).cast("long").alias("id"),
                    _as_double(F.col(vec_col)).alias("vec"))

    def _assign2(batches):
        import numpy as np
        import pandas as pd

        gids_w, G_w, groups_w = bc.value
        # norms once per worker, not per batch/group (exact fold —
        # the same order _exact_nearest uses internally)
        dim = G_w.shape[1]

        def _fold_norms(M):
            nrm = np.zeros(M.shape[0])
            for d in range(dim):                       # sequential fold
                nrm = nrm + M[:, d] * M[:, d]
            return np.sqrt(nrm)

        gnrm = _fold_norms(G_w)
        fnrm = {g: _fold_norms(M) for g, (_, M) in groups_w.items()}
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf["vec"]])
            cg = _exact_nearest(X, gids_w, G_w, gnrm)
            cell = np.empty(len(X), dtype=np.int64)
            for g in np.unique(cg):
                m = cg == g
                f_ids, f_mat = groups_w[int(g)]
                cell[m] = _exact_nearest(X[m], f_ids, f_mat,
                                         fnrm[int(g)])
            if keep_vec:
                yield pd.DataFrame({"id": pdf["id"].to_numpy(),
                                    "vec": pdf["vec"], "cell": cell})
            else:
                yield pd.DataFrame({"id": pdf["id"].to_numpy(),
                                    "cell": cell})

    schema = ("id long, vec array<double>, cell long" if keep_vec
              else "id long, cell long")
    return src.mapInPandas(_assign2, schema)


def ivf_ann_topk(corpus: DataFrame, queries: DataFrame, k: int,
                 stride: int = 16, nprobe: int = 2,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k via IVF (inverted-file) cells: partition the
    corpus into Voronoi cells around centroid vectors, probe only the
    ``nprobe`` nearest cells per query, rank exactly within the probed
    subset. Same output contract as knn_cosine: (q_id, n_id, rank, sim).

    Centroid selection here is a deterministic corpus sample
    (``id % stride == 0``) so the result is exactly reproducible in the
    SQL oracle; swapping in trained k-means centroids changes only the
    ``centroids`` input of ivf_assign_cells, not the plan shape. The
    100 TB behavior: one broadcast of the centroid set, a per-vector
    map-side assignment, then an equi-join on cell id — probe cost is
    nprobe/nlist of the corpus instead of all of it."""
    cents = corpus.filter((F.col(id_col) % stride) == 0)
    cells = (ivf_assign_cells(corpus, cents, id_col, vec_col)
             .withColumn("n_nrm", l2_norm(F.col("vec"))))

    qc = with_norm(cents, id_col, vec_col, "cid", "cvec", "c_nrm")
    q = with_norm(queries, id_col, vec_col, "q_id", "q_vec", "q_nrm")
    qsim = F.round(dot(F.col("q_vec"), F.col("cvec"))
                   / (F.col("q_nrm") * F.col("c_nrm")), 6)
    wq = Window.partitionBy("q_id").orderBy(F.col("csim").desc(), F.col("cid"))
    probes = (q.join(F.broadcast(qc))
              .select("q_id", "q_vec", "q_nrm", "cid", qsim.alias("csim"))
              .withColumn("prn", F.row_number().over(wq))
              .filter(F.col("prn") <= nprobe)
              .select("q_id", "q_vec", "q_nrm", F.col("cid").alias("cell")))

    sim = (dot(F.col("q_vec"), F.col("vec"))
           / (F.col("q_nrm") * F.col("n_nrm")))
    pairs = (cells.join(F.broadcast(probes),
                        (F.col("q_id") != F.col("id"))
                        & (cells.cell == probes.cell))
             .select("q_id", F.col("id").alias("n_id"),
                     F.round(sim, 6).alias("sim")))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "n_id", "rank", "sim"))


def _hamming_le(n_bits: int, p_disagree: float, radius: int) -> float:
    """P(Binomial(n_bits, p_disagree) <= radius) — the multiprobe
    recall model: random hyperplanes disagree independently on a pair
    at angle θ with probability θ/π, so a neighbor is reached iff at
    most ``radius`` of its signature bits differ from the query's."""
    import math

    q = 1.0 - p_disagree
    return sum(math.comb(n_bits, i)
               * p_disagree ** i * q ** (n_bits - i)
               for i in range(min(radius, n_bits) + 1))


def adaptive_ann_params(n_rows: int, target_occupancy: int = 16,
                        design_sim: float = 0.85,
                        target_recall: float = 0.9,
                        max_masks: int = 600) -> tuple[int, int]:
    """(n_planes, probe_radius) for single-band ANN bucketing, sized to
    the corpus: bits grow with log2(n) so bucket occupancy — and with
    it per-query candidate volume — stays ~target_occupancy instead of
    growing linearly with the corpus; the probe RADIUS then comes from
    the multiprobe recall model (Lv et al., VLDB 2007): smallest r
    with P(Binomial(bits, acos(design_sim)/pi) <= r) >= target_recall,
    i.e. a neighbor at the design similarity is reached with >= 90%
    probability through the Hamming ball. The ball is capped at
    ``max_masks`` probes (cost guard: per-query candidates stay
    ~masks x occupancy, size-independent); past the cap — bits >= 14,
    i.e. corpora >= ~2.6e5 at the default occupancy — design-point
    recall decays slowly and deliberately (b=14 r=3 models 0.86
    at sim 0.85 vs 0.95 for the budget-busting r=4). The budget is
    600, not 512, so radius 3 still fits at the 15-bit width cap
    (1+15+105+455 = 576 masks) — a 512 budget would snap radius back
    to 2 exactly at the largest corpora, a parameter sawtooth of the
    kind the blended-width LSH work exists to avoid.

    The r8 redesign (radius was previously hardcoded 1-2, leaving
    measured mid-similarity recall@5 at 0.48/0.22/0.20/0.12 across
    sf0.01/0.1/1/10): the model pins recall at a HIGH-similarity
    design point because that is the regime hyperplane LSH prunes
    well. For this corpus's UNSTRUCTURED top-5 neighbors (exact top-5
    sits at cos ~0.5, barely above the random-pair bulk — measured via
    the ann_recall audit), no sublinear index holds recall: the LSH
    exponent rho = ln(1/p1)/ln(1/p2) -> 1 as the target similarity
    approaches the bulk, and the r8 sweep measured BOTH families
    agreeing (multiprobe 0.12-0.48, IVF at fixed probe fraction
    0.12-0.46, decaying together with n). Radius-3 probing lifts the
    measured mid-sim floor (sf10 0.12 -> 0.32 at 470 probes/query)
    and the design-sim model holds >= 0.86 everywhere; callers who
    need exact mid-sim top-k on unstructured vectors should use
    knn_cosine (one broadcast scan) — that trade is fundamental, not
    an implementation gap. Deterministic in n_rows alone, so the SQL
    oracle generator derives identical parameters."""
    import math

    bits = 4
    while (n_rows >> bits) > target_occupancy and bits < 15:
        bits += 1
    p_dis = math.acos(design_sim) / math.pi
    radius, n_masks = 1, 1 + bits
    while (_hamming_le(bits, p_dis, radius) < target_recall
           and radius < bits):
        nxt = n_masks + math.comb(bits, radius + 1)
        if nxt > max_masks:
            break
        radius, n_masks = radius + 1, nxt
    return bits, radius


def probe_masks(n_planes: int, radius: int) -> list[int]:
    """XOR masks of the Hamming ball of the given radius: the query's
    own bucket, then every i-bit flip for i = 1..radius (general
    radius since r8 — the old hand-rolled version silently capped at
    2-bit flips, so adaptive_ann_params' radius model had no effect
    past r=2). Deterministic order (flip count, then combination
    order) — shared with the SQL oracle. Probe count is
    sum_{i<=r} C(b, i); adaptive_ann_params budgets it."""
    from itertools import combinations

    masks = [0]
    for r in range(1, radius + 1):
        for idxs in combinations(range(n_planes), r):
            m = 0
            for i in idxs:
                m |= 1 << i
            masks.append(m)
    return masks


def adaptive_ivf_params(n_rows: int, probe_frac: int = 16) -> tuple[int, int]:
    """(stride, nprobe) for the deterministic-sample IVF index:
    stride ~ sqrt(n) puts the cell count nlist = n/stride near
    sqrt(n) — the standard IVF sizing balancing the O(n·nlist)
    assignment pass against O(n/nlist) per-probe cost — and nprobe =
    max(2, nlist/probe_frac) holds the PROBED FRACTION of the corpus
    (~1/probe_frac) constant as the corpus grows. The r7 fixed
    (stride=64, nprobe=2) shrank the probed fraction linearly with n
    (2 of n/64 cells), which measured as recall@5 decaying 0.46 ->
    0.12 from sf0.01 to sf1; with the probed fraction pinned, recall
    tracks the data's cluster structure instead of the corpus size
    (on unstructured vectors it tracks ~probed fraction — see
    adaptive_ann_params for why that bound is fundamental).
    Deterministic in n_rows alone; shared with the SQL oracle."""
    import math

    stride = max(16, int(math.isqrt(max(1, n_rows))))
    nlist = max(1, n_rows // stride)
    return stride, max(2, nlist // probe_frac)


def ann_cosine_lsh_multiprobe(corpus: DataFrame, queries: DataFrame,
                              k: int, dim: int, n_planes: int = 8,
                              radius: int = 1, id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k with multiprobe LSH: each query scans its own
    bucket plus every bucket within Hamming distance ``radius`` of its
    signature. Compared to exact-bucket ann_cosine_lsh this multiplies
    the probed volume by |probe_masks| (still a tiny, size-independent
    slice of the corpus when bits track adaptive_ann_params) and lifts
    recall from p^b to P(Hamming(sig_q, sig_n) <= radius) — the
    standard way to keep recall while growing the bucket space with
    the corpus.

    Plan shape: the probe set is a map-side explode of the (small,
    broadcast) query side — corpus rows still see ONE equi-join on
    signature, no nested loop. Each corpus vector matches at most one
    probe mask per query (probe signatures are distinct), so no
    dedup stage is needed."""
    c = with_norm(corpus, id_col, vec_col, "n_id", "n_vec", "n_nrm")
    c = c.withColumn("sig", hyperplane_signature("n_vec", dim, n_planes))
    q = with_norm(queries, id_col, vec_col, "q_id", "q_vec", "q_nrm")
    q = q.withColumn("sig", hyperplane_signature("q_vec", dim, n_planes))
    masks = probe_masks(n_planes, radius)
    probes = (q.select(
        "q_id", "q_vec", "q_nrm", "sig",
        F.explode(F.expr(
            "array(" + ",".join(str(m) for m in masks) + ")")).alias("m"))
        .select("q_id", "q_vec", "q_nrm",
                F.col("sig").bitwiseXOR(F.col("m")).alias("psig")))
    sim = dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_nrm") * F.col("n_nrm"))
    pairs = (
        c.join(F.broadcast(probes), (F.col("q_id") != F.col("n_id"))
               & (c.sig == probes.psig))
        .select("q_id", "n_id", F.round(sim, 6).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "n_id", "rank", "sim"))


def ann_cosine_lsh(corpus: DataFrame, queries: DataFrame, k: int,
                   dim: int, n_planes: int = 8,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: bucket corpus and queries by hyperplane
    signature, rank only within matching buckets. Trades recall for a
    bucket-local equi-join instead of a full cross join."""
    c = with_norm(corpus, id_col, vec_col, "n_id", "n_vec", "n_nrm")
    c = c.withColumn("sig", hyperplane_signature("n_vec", dim, n_planes))
    q = with_norm(queries, id_col, vec_col, "q_id", "q_vec", "q_nrm")
    q = q.withColumn("sig", hyperplane_signature("q_vec", dim, n_planes))
    sim = dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_nrm") * F.col("n_nrm"))
    pairs = (
        c.join(F.broadcast(q), (F.col("q_id") != F.col("n_id"))
               & (c.sig == q.sig))
        .select("q_id", "n_id", F.round(sim, 6).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "n_id", "rank", "sim"))


def pool_chunk_embeddings(df: DataFrame, doc_col, dim: int,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Mean-pool CHUNK embeddings into DOCUMENT embeddings — the glue
    between how embedding tables are actually produced (one vector
    per context-window chunk, text_chunking's output) and the
    doc-level consumers here (semantic dedup, ANN, drift): one row
    per ``doc_col`` value with ``n_chunks`` and the 6-decimal-rounded
    mean vector ``pooled``.

    Float contract (hash-checkable): chunks fold in ascending
    ``id_col`` order SEEDED WITH THE FIRST CHUNK, the tail aggregated
    onto it — exactly DuckDB's init-less ``list_reduce`` over
    ``list(v ORDER BY id)`` (ADVICE r8: the historical zero-array seed
    turned an all ``-0.0`` component into ``+0.0`` via ``0.0 + -0.0``
    where list_reduce preserves ``-0.0``; the seed fix removes that
    fold divergence). Components divide by the chunk count and round
    half-away-from-zero at 6 decimals — fully deterministic, no
    partial-agg float-order dependence (the naive per-dimension
    ``avg`` would shuffle-order the additions). One corner survives in
    ROUND itself, not the fold: Spark's BigDecimal round maps ``-0.0``
    to ``+0.0`` while DuckDB's keeps ``-0.0`` (verified on both
    engines), so an exactly-(-0.0) mean component still prints
    differently — invisible to IEEE ``==`` (the driver compare) and
    unreachable for real embeddings, stated for exactness.

    Scale shape: ONE hash exchange keyed on the doc id carrying each
    chunk vector exactly once — pooling is inherently a reassembly
    shuffle (chunks of a doc are scattered); writing chunk tables
    bucketed on the doc id (sources/bucketed.py) makes it
    exchange-free. The fold is interpreted zip_with but totals
    n·dim adds corpus-wide (groups are chunk-count sized), map-side
    nothing — JVM-only, no Python stage."""
    doc = F.col(doc_col) if isinstance(doc_col, str) else doc_col
    g = (df.select(doc.cast("long").alias("doc_id"),
                   F.col(id_col).cast("long").alias("id"),
                   _as_double(F.col(vec_col)).alias("v"))
         .groupBy("doc_id")
         .agg(F.count("*").alias("n_chunks"),
              F.array_sort(F.collect_list(F.struct("id", "v")))
              .alias("chunks")))
    vs = F.transform(F.col("chunks"), lambda c: c["v"])
    # groups always have >= 1 row, so element_at(vs, 1) is total; the
    # tail slice is empty at n=1 and the fold returns the seed
    summed = F.aggregate(
        F.slice(vs, F.lit(2), F.size(vs) - 1), F.element_at(vs, 1),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b))
    n = F.col("n_chunks").cast("double")
    return g.select(
        "doc_id", F.col("n_chunks").cast("long").alias("n_chunks"),
        F.transform(summed, lambda s: F.round(s / n, 6)).alias("pooled"))


def centroid_drift(old: DataFrame, new: DataFrame,
                   group_col: str = "label",
                   vec_col: str = "embedding") -> DataFrame:
    """Per-group embedding-space drift between two snapshots: cosine
    similarity of each group's MEAN vector across releases —
    ``(group, n_old, n_new, centroid_cos)``, rounded to 4 decimals
    (the embedding-aggregate convention, see embedding_label_stats).
    The release audit an ANN/IVF index owner runs before deciding
    whether to rebuild: a re-embedded or drifted corpus moves the
    per-cluster centroids, and cos < ~0.99 on any cell means the
    trained centroids/quantizers no longer match the data. Groups
    present in only one snapshot emit null cos (nothing to compare;
    the n_old/n_new columns carry the vanished/appeared signal).

    Scale shape: ONE posexplode per snapshot folding to (group, slot)
    slot-mean tables — the only corpus-sized stages, map-side
    partial-combined, shuffle rows ≤ groups × dim — then a
    (groups × dim)-row join and a dim-row-per-group reduction to the
    cosine. No Python, no windows, no driver state."""
    def slot_means(df: DataFrame, tag: str) -> DataFrame:
        # per-(group, slot) row count rides the same aggregation: with
        # fixed-dim vectors every slot of a group sees exactly the
        # group's vector count, so no second corpus scan is needed for
        # n_old/n_new (r8 review — the separate counts() pass doubled
        # the scan cost the docstring claims this operator doesn't pay)
        return (df.select(F.col(group_col).alias("g"),
                          F.posexplode(_as_double(F.col(vec_col)))
                          .alias("slot", "v"))
                .groupBy("g", "slot")
                .agg(F.avg("v").alias(f"m_{tag}"),
                     F.count("*").alias(f"cnt_{tag}")))

    j = (slot_means(old, "old").join(slot_means(new, "new"),
                                     ["g", "slot"], "full_outer"))
    per_group = (j.groupBy("g")
                 .agg(F.sum(F.col("m_old") * F.col("m_new")).alias("ab"),
                      F.sum(F.col("m_old") * F.col("m_old")).alias("aa"),
                      F.sum(F.col("m_new") * F.col("m_new")).alias("bb"),
                      F.max("cnt_old").alias("n_old_raw"),
                      F.max("cnt_new").alias("n_new_raw"),
                      F.max(F.col("m_old").isNull().cast("int"))
                      .alias("miss_old"),
                      F.max(F.col("m_new").isNull().cast("int"))
                      .alias("miss_new")))
    cos = F.when((F.col("miss_old") == 0) & (F.col("miss_new") == 0)
                 & (F.col("aa") > 0) & (F.col("bb") > 0),
                 F.round(F.col("ab")
                         / (F.sqrt("aa") * F.sqrt("bb")), 4))
    return per_group.select(
        F.col("g").alias(group_col),
        F.coalesce("n_old_raw", F.lit(0)).alias("n_old"),
        F.coalesce("n_new_raw", F.lit(0)).alias("n_new"),
        cos.alias("centroid_cos"))


def hard_negatives(corpus: DataFrame, anchors: DataFrame, k: int,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label") -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    vector, the top-k most cosine-similar corpus vectors carrying a
    DIFFERENT label — the "looks like a positive, isn't one" examples
    embedding-model training pipelines mine at corpus scale
    (sentence-transformers / DPR / SimCSE hard negatives). Output
    ``(q_id, n_id, n_label, rank, sim)`` with sim rounded at 6
    decimals and rank ordered by (sim desc, n_id) — the knn_cosine
    determinism contract.

    The label-mismatch predicate rides IN the join condition (never a
    post-top-k filter, which would under-fill k whenever the true
    neighbors share the anchor's label — the exact case hard-negative
    mining exists for).

    Scale shape: identical to knn_cosine — the anchor side (a
    training batch / sampled seed set, k-bounded by contract) is
    broadcast with its labels and the corpus is scanned exactly ONCE;
    per-anchor top-k via a q_id-partitioned window over candidate
    rows. For anchor sets too large to broadcast, route through
    ivf_assign_cells first (the ann_ivf_topk composition) — same
    output contract, cell-restricted scan."""
    # with_norm's projection, widened with the label inline — a re-join
    # to fetch labels would be a second corpus exchange
    v = _as_double(F.col(vec_col))
    c = corpus.select(F.col(id_col).alias("n_id"),
                      F.col(label_col).alias("n_label"),
                      v.alias("n_vec"), l2_norm(v).alias("n_nrm"))
    q = anchors.select(F.col(id_col).alias("q_id"),
                       F.col(label_col).alias("q_label"),
                       v.alias("q_vec"), l2_norm(v).alias("q_nrm"))
    sim = dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_nrm") * F.col("n_nrm"))
    pairs = (
        c.join(F.broadcast(q), (F.col("q_label") != F.col("n_label"))
               & (F.col("q_id") != F.col("n_id")))
        .select("q_id", "n_id", "n_label",
                F.round(sim, 6).alias("sim")))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "n_id",
                    F.col("n_label").cast("long").alias("n_label"),
                    F.col("rank").cast("long").alias("rank"), "sim"))
