"""Deterministic sampling for training-data mixture construction.

``Dataset.sample`` / ``sampleBy`` draw from a per-partition RNG: the
result changes with partitioning, retries, and cluster layout — useless
for reproducible corpus mixes or for an independent oracle. These
operators sample on a CONTENT-derived hash instead: a row is kept iff
its key's MD5 bucket falls under the stratum's rate, so the same row
set survives on any cluster, any partitioning, any engine (the bucket
expression is replicable in SQL: ``('0x' || substring(md5(k),1,15))
::BIGINT % 1_000_000``).

Scale shape: the predicate is a pure projection over each row — no
shuffle, no state, pushes through column pruning, and composes with
any downstream plan. Changing ``seed`` re-draws an independent sample
(the seed is concatenated into the hashed key).

Reference: no sampling surface exists in the reference engine; this is
a north-star training-pipeline operator (mixture weighting is how a
100 TB corpus becomes a token-budgeted training mix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import word_hash

#: bucket space; rates are resolved to integer thresholds out of this
N_BUCKETS = 1_000_000


def hash_bucket(key: Column, seed: str = "") -> Column:
    """Deterministic bucket in [0, N_BUCKETS) from the MD5 of the
    stringified key (prefixed with ``seed``)."""
    return word_hash(F.concat(F.lit(seed), key.cast("string"))) % N_BUCKETS


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sampling rate must be in [0, 1], got {rate}")
    return int(rate * N_BUCKETS)


def hash_sample(df: DataFrame, rate: float, key_col: str,
                seed: str = "") -> DataFrame:
    """Keep ~``rate`` of rows, chosen deterministically by key hash."""
    return df.filter(hash_bucket(F.col(key_col), seed) < _threshold(rate))


def stratified_hash_sample(df: DataFrame, strata_col: str,
                           rates: dict[str, float], key_col: str,
                           default_rate: float = 0.0,
                           seed: str = "") -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its
    own rate (unlisted strata fall back to ``default_rate``). The rate
    lookup compiles to a CASE chain — still a pure projection."""
    thr: Column = F.lit(_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value,
                     F.lit(_threshold(rate))).otherwise(thr)
    return df.filter(hash_bucket(F.col(key_col), seed) < thr)


def token_budget_plan(df: DataFrame, strata_col: str, weight_col: str,
                      budget: int) -> DataFrame:
    """Mixture plan for a token budget: WATERFILL ``budget`` across
    strata — every stratum gets an equal share of the budget except
    those with less than the waterline, which contribute everything
    they have (their leftover raises the line for the rest). This is
    the balanced-mix allocation (a giant web crawl must not drown the
    small curated sources, which proportional sampling would do).

    Closed relational form (no driver loop): sort strata by available
    mass ascending; with prefix sums S_{i-1} and position i of k, the
    waterline is  L = max_i (budget - S_{i-1}) / (k - i + 1)  and
    alloc_i = min(avail_i, floor(L)). The candidate sequence rises
    past every exhausted stratum and falls afterwards, so its max is
    the exact level; when budget >= total it exceeds every avail and
    the plan returns the whole corpus.

    Cost: one partial-aggregated corpus scan to (stratum, mass), then
    windows over the k-row stratum table — the global sort orders k
    rows, not the corpus. Output per stratum:
    (stratum, avail_tokens, alloc_tokens, rate) where ``rate`` is
    floor(alloc/avail, 6 dp) — feed it to
    :func:`stratified_hash_sample` to materialize the mix."""
    from pyspark.sql import Window

    per = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.sum(weight_col).cast("long").alias("avail_tokens"))
    w_ord = Window.orderBy("avail_tokens", "stratum")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    cum_prev = F.coalesce(F.sum("avail_tokens").over(w_prev), F.lit(0))
    i = F.row_number().over(w_ord)
    k = F.count("*").over(w_all)
    cand = (F.lit(float(budget)) - cum_prev) / (k - i + 1)
    staged = per.select("stratum", "avail_tokens",
                        cand.alias("__cand"))
    level = F.max("__cand").over(w_all)
    alloc = F.least(F.col("avail_tokens"), F.floor(level).cast("long"))
    rate = F.floor(alloc.cast("double") / F.col("avail_tokens")
                   * 1_000_000) / 1_000_000
    return staged.select(
        "stratum", "avail_tokens", alloc.alias("alloc_tokens"),
        F.when(F.col("avail_tokens") > 0, rate).otherwise(F.lit(0.0))
        .alias("rate"))


def temperature_mix_plan(df: DataFrame, strata_col: str, weight_col: str,
                         budget: int, alpha: float = 0.5) -> DataFrame:
    """Temperature-weighted mixture plan: allocate ``budget`` across
    strata with targets proportional to ``avail^alpha``, capped by
    availability, the excess from capped strata absorbed by the
    uncapped ones via the shared water level. Allocations floor to
    whole tokens, so sum(alloc) can undershoot ``budget`` by up to
    k-1 tokens (one sub-token crumb per unexhausted stratum, r7
    ADVICE) — kept, not redistributed: the SQL oracle floors
    identically, and a crumb pass would re-rank strata for at most
    k-1 tokens of budget fidelity. ``alpha=1`` is
    proportional sampling (big crawls dominate), ``alpha=0`` the
    equal-share waterfill (:func:`token_budget_plan`); the interior is
    the multilingual-training mixture rule (mT5/XLM-R sample languages
    at temperature ~0.3-0.7) that upweights small sources without
    letting them starve the large ones.

    Closed relational form, generalizing token_budget_plan's: with
    integer weights w_i = floor(avail_i^alpha) (truncation keeps every
    prefix/suffix sum EXACT in int64 on both engines — the float error
    is < 0.1% of a weight at corpus scales, the cross-engine
    portability is absolute), strata sorted by exhaustion order — the
    exact ratio avail_i/w_i ascending (NOT avail: flooring makes
    avail/floor(avail^alpha) non-monotone at weight steps) — with
    prefix avail sums S_{i-1} and suffix weight sums W_i, the water
    level is  λ = max_i (budget - S_{i-1}) / W_i  and
    alloc_i = min(avail_i, floor(λ·w_i)) — the same candidate-max
    argument as the waterfill with the suffix stratum COUNT
    generalized to suffix weight MASS (property-tested against an
    independent greedy waterline solver). alpha=0.5 computes weights
    via IEEE-exact sqrt — the bit-portable, oracle-checked setting;
    other alphas go through libm pow (deterministic within an engine;
    floor at a perfect power could differ across engines by 1).

    Cost: one partial-aggregated corpus scan to (stratum, mass), then
    windows over the k-row stratum table. Output per stratum:
    (stratum, avail_tokens, weight, alloc_tokens, rate)."""
    from pyspark.sql import Window

    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    per = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.sum(weight_col).cast("long").alias("avail_tokens"))
    av = F.col("avail_tokens").cast("double")
    if alpha == 0.5:
        wt = F.floor(F.sqrt(av))
    elif alpha == 0.0:
        wt = F.when(F.col("avail_tokens") > 0, F.lit(1)).otherwise(0)
    elif alpha == 1.0:
        wt = F.col("avail_tokens")
    else:
        wt = F.floor(F.pow(av, F.lit(float(alpha))))
    per = per.withColumn("weight", wt.cast("long"))
    # exhaustion order is the exact ratio avail/w, NOT avail: floored
    # weights invert the avail-order at weight steps (avail 15/w 3 =
    # 5.0 but avail 16/w 4 = 4.0). Zero-weight (= zero-avail) strata
    # exhaust immediately and sort first. One IEEE division — both
    # engines order identically.
    ratio = F.when(F.col("weight") > 0,
                   F.col("avail_tokens").cast("double")
                   / F.col("weight")).otherwise(F.lit(-1.0))
    per = per.withColumn("__ratio", ratio)
    w_ord = Window.orderBy("__ratio", "stratum")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    s_prev = F.coalesce(F.sum("avail_tokens").over(w_prev), F.lit(0))
    # suffix weight mass as total - exclusive prefix: every sum is an
    # exact int64, so both engines agree bit-for-bit
    wt_suffix = (F.sum("weight").over(w_all)
                 - F.coalesce(F.sum("weight").over(w_prev), F.lit(0)))
    cand = F.when(wt_suffix > 0,
                  (F.lit(float(budget)) - s_prev) / wt_suffix)
    staged = per.select("stratum", "avail_tokens", "weight", "__ratio",
                        cand.alias("__cand"))
    level = F.max("__cand").over(w_all)
    alloc = F.least(F.col("avail_tokens"),
                    F.floor(level * F.col("weight")).cast("long"))
    rate = (F.floor(alloc.cast("double") / F.col("avail_tokens")
                    * 1_000_000) / 1_000_000)
    return staged.select(
        "stratum", "avail_tokens", "weight",
        F.coalesce(alloc, F.lit(0)).alias("alloc_tokens"),
        F.when(F.col("avail_tokens") > 0, rate).otherwise(F.lit(0.0))
        .alias("rate"))


def split_expr(key: Column, splits: dict[str, float],
               seed: str = "") -> Column:
    """The split-assignment CASE of :func:`assign_splits` as a pure
    column over an ARBITRARY key expression. Because the assignment is
    content-addressed, any point in a plan that has the key can
    re-derive the row's split without joining the assignment table —
    this is what lets a consumer push a cross-split restriction below
    an expensive verify stage (q_split_leakage_neardup passes it as a
    ``cand_filter``: candidate pairs whose endpoints hash into the
    same split can never appear in the leak report, so verifying them
    is discarded work). Same null semantics as assign_splits: a null
    key falls through to the LAST split."""
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    b = hash_bucket(key, seed)
    names = list(splits)
    expr = F.lit(names[-1])  # catch-all: last split owns the tail range
    cum = 0.0
    bounds: list[tuple[str, int]] = []
    for name in names[:-1]:
        cum += splits[name]
        bounds.append((name, int(cum * N_BUCKETS)))
    for name, bound in reversed(bounds):
        expr = F.when(b < bound, F.lit(name)).otherwise(expr)
    return expr


def assign_splits(df: DataFrame, splits: dict[str, float], key_col: str,
                  seed: str = "") -> DataFrame:
    """Deterministic train/val/test assignment: each row gets the split
    whose cumulative bucket range its key hash falls into. Fractions
    must sum to 1; the last split absorbs the final bucket range
    exactly, so every row is assigned. Content-addressed like
    ``hash_sample``: re-runs, repartitions, and other engines agree on
    every row's split — the property that keeps eval rows out of train
    across pipeline versions. Pure projection, no shuffle
    (:func:`split_expr` is the underlying column).

    Null keys: a null ``key_col`` hashes to null, whose comparisons are
    null, so the CASE falls through to the LAST split — deterministic
    and identical in the SQL oracle (DuckDB's CASE behaves the same),
    but it concentrates every malformed row in that split. Note the
    asymmetry with ``hash_sample``, which DROPS null keys; filter or
    repair null keys before splitting if that matters for your eval
    set."""
    return df.withColumn("split", split_expr(F.col(key_col), splits, seed))


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    key_col: str, seed: str = "") -> DataFrame:
    """Weighted sampling WITHOUT replacement, size ``k``, inclusion
    probability ∝ ``weight_col`` — Efraimidis & Spirakis (2006) A-Res:
    every row draws a deterministic uniform u from its content hash and
    competes on the key ``ln(u) / w`` (the log form of u^(1/w));
    the k LARGEST keys win. One distributed top-k, which is exactly
    the token-proportional draw a pretraining mixture makes (sample
    documents ∝ token count so the TOKEN mix, not the document mix,
    matches the target). Content-addressed like every sampler here:
    re-runs, repartitions, and other engines pick the same rows;
    ``seed`` re-draws independently.

    Rows with weight <= 0 or null are EXCLUDED (a zero-weight row has
    inclusion probability 0 by contract; a negative weight is a
    caller bug surfaced by absence, the hash_sample null-key
    convention). The sample key floor-truncates to 1e-9 and the rank
    tie-breaks on ``key_col``, so the cut is deterministic
    cross-engine. The one cross-engine seam is ln itself (JVM
    Math.log vs the oracle's libm): a 1-ulp disagreement moves
    ln(u)/w by ~1e-16/w absolute, i.e. ~1e-9 of the 1e-9 floor grid
    at w~1000 — a per-row flip probability of ~1e-9, and only the k
    OUTPUT rows can surface one, so the expected oracle impact is
    ~k*1e-9 per run (the same accepted seam as pmi_collocations,
    quantified). Scale shape: pure projection + Catalyst group-limit
    top-k (TakeOrderedAndProject below the rank window) — no global
    sort, no state."""
    from pyspark.sql import Window

    u = ((word_hash(F.concat(F.lit(seed),
                             F.col(key_col).cast("string"))) + 1)
         .cast("double") / float((1 << 60) + 1))
    w = F.col(weight_col).cast("double")
    skey = F.floor(F.log(u) / w * 1_000_000_000) / 1_000_000_000
    ranked = (df.filter(w > 0)
              .withColumn("skey", skey)
              .withColumn("rank", F.row_number().over(
                  Window.orderBy(F.col("skey").desc(),
                                 F.col(key_col).asc())))
              .filter(F.col("rank") <= k))
    return ranked.withColumn("rank", F.col("rank").cast("long"))


def split_leakage_audit(df: DataFrame, splits: dict[str, float],
                        key_col: str = "doc_id", seed: str = "",
                        text_col: str = "text") -> DataFrame:
    """Eval-contamination audit of a split assignment: exact-duplicate
    content groups whose copies land in MORE THAN ONE split — the
    failure mode :func:`assign_splits`' content-addressing cannot
    prevent, because it keys on ``key_col``, and re-crawled or
    re-ingested duplicates carry fresh ids. Any group it reports is a
    train→eval leak: the eval copies measure memorization, not
    generalization. One row per leaking split combination
    (``leak_pair``, e.g. ``'train|val'``) with the number of duplicate
    groups and total documents involved; an empty result is the
    passing audit.

    Scale shape: documents reduce to (16-byte MD5 fingerprint, split)
    at the scan; one fingerprint-keyed aggregation (map-side partial),
    then a split-combination group-by over only the leaking groups —
    at most 2^n_splits combinations. No text shuffled, no windows, no
    Python. Near-duplicate leakage (the stricter audit) composes the
    same way from minhash_clusters' (id, cluster) output instead of
    the fingerprint."""
    assigned = assign_splits(df, splits, key_col, seed)
    groups = (assigned
              .select(F.md5(F.col(text_col)).alias("fp"), "split")
              .groupBy("fp")
              .agg(F.countDistinct("split").alias("n_splits"),
                   F.count("*").alias("n_copies"),
                   F.array_join(F.array_sort(F.collect_set("split")),
                                "|").alias("leak_pair")))
    return (groups.filter(F.col("n_splits") >= 2)
            .groupBy("leak_pair")
            .agg(F.count("*").alias("n_groups"),
                 F.sum("n_copies").cast("long").alias("n_docs")))


def split_leakage_pairs(pairs: DataFrame, assigned: DataFrame,
                        a_col: str = "doc_a", b_col: str = "doc_b",
                        id_col: str = "doc_id",
                        split_col: str = "split") -> DataFrame:
    """The near-duplicate form of :func:`split_leakage_audit`: given a
    verified near-dup PAIR table (minhash_lsh_dedup / simhash output)
    and a split assignment, report every pair whose endpoints sit in
    different splits, grouped by the unordered split combination —
    ``(leak_pair, n_pairs, max_jacc)``. This is the audit eval-set
    hygiene actually requires: exact-dup leakage is rare after an
    exact dedup pass, while near-duplicate train→eval leakage
    (re-crawls, paraphrases, boilerplate variants) is the one that
    inflates benchmarks.

    Scale shape: the pair table is ∝ near-dup incidence (already
    LSH-bounded upstream); two id-keyed equi-joins against the
    (id, split) projection, then a group-by over <= C(n_splits, 2)
    keys. ``max_jacc`` is rounded to 3 decimals (cross-engine max of
    per-pair exact Jaccards). Pairs with a jacc column keep it;
    otherwise pass a pairs frame with a literal."""
    sp = assigned.select(F.col(id_col), F.col(split_col))
    sa = sp.select(F.col(id_col).alias(a_col),
                   F.col(split_col).alias("__split_a"))
    sb = sp.select(F.col(id_col).alias(b_col),
                   F.col(split_col).alias("__split_b"))
    leak = (pairs.join(sa, a_col).join(sb, b_col)
            .filter(F.col("__split_a") != F.col("__split_b")))
    pair_key = F.array_join(
        F.array_sort(F.array("__split_a", "__split_b")), "|")
    return (leak.groupBy(pair_key.alias("leak_pair"))
            .agg(F.count("*").alias("n_pairs"),
                 F.round(F.max("jacc"), 3).alias("max_jacc")))


def repair_split_leakage(assigned: DataFrame, clusters: DataFrame,
                         id_col: str = "doc_id",
                         split_col: str = "split",
                         quarantine: str = "train") -> DataFrame:
    """REPAIR the leakage :func:`split_leakage_audit` /
    :func:`split_leakage_pairs` report: every duplicate cluster whose
    members straddle two or more splits moves WHOLE into the
    ``quarantine`` split (default ``train``) — the fixpoint-clean
    policy. Moving only the minority endpoints of each leaking pair
    would chase transitive chains (a re-homed doc creates new
    cross-split pairs within its cluster); quarantining the entire
    connected component terminates in one pass and leaves ZERO
    cross-split duplicate pairs by construction, at the price of
    shrinking eval sets by their contaminated share — which is the
    point: those eval docs were measuring memorization.

    Inputs: ``assigned`` is (id, split) (:func:`assign_splits` or any
    assignment); ``clusters`` is connected_components' (node, cluster)
    over the near-dup pair graph. Docs absent from ``clusters`` are
    singletons and keep their split. Returns the per-split summary
    ``(split, n_before, n_after, n_moved_in, n_moved_out)`` — the
    repaired per-doc assignment is the obvious intermediate, but the
    summary is the engine-portable observable (and what a curation
    report shows).

    Scale shape: one id-keyed left join of the assignment to the
    cluster labels (cluster table ∝ docs touched by any pair, never
    the corpus), a cluster-keyed distinct-split aggregate over the
    same, a semi-join marking leaky clusters, and two k-row split
    aggregates. No windows, no Python, nothing corpus²."""
    lab = clusters.select(F.col("node").alias(id_col),
                          F.col("cluster"))
    a = (assigned.select(F.col(id_col),
                         F.col(split_col).alias("__before"))
         .join(lab, id_col, "left")
         .withColumn("cluster", F.coalesce(F.col("cluster"),
                                           F.col(id_col))))
    leaky = (a.groupBy("cluster")
             .agg(F.countDistinct("__before").alias("__ns"))
             .filter(F.col("__ns") >= 2)
             .select("cluster"))
    rep = (a.join(leaky.withColumn("__leak", F.lit(True)),
                  "cluster", "left")
           .withColumn("__after",
                       F.when(F.col("__leak").isNotNull(),
                              F.lit(quarantine))
                       .otherwise(F.col("__before"))))
    moved = (F.col("__before") != F.col("__after")).cast("long")
    before = (rep.groupBy(F.col("__before").alias(split_col))
              .agg(F.count("*").alias("n_before"),
                   F.sum(moved).alias("n_moved_out")))
    after = (rep.groupBy(F.col("__after").alias(split_col))
             .agg(F.count("*").alias("n_after"),
                  F.sum(moved).alias("n_moved_in")))
    return (before.join(after, split_col, "full")
            .select(split_col,
                    F.coalesce("n_before", F.lit(0)).cast("long")
                    .alias("n_before"),
                    F.coalesce("n_after", F.lit(0)).cast("long")
                    .alias("n_after"),
                    F.coalesce("n_moved_in", F.lit(0)).cast("long")
                    .alias("n_moved_in"),
                    F.coalesce("n_moved_out", F.lit(0)).cast("long")
                    .alias("n_moved_out")))


def quota_cap(df: DataFrame, strata_col: str, n: int, key_col: str,
              seed: str = "") -> DataFrame:
    """Cap each stratum at ``n`` rows, chosen deterministically: rows
    are ranked inside their stratum by content hash (then key, for
    total order) and the first ``n`` survive. The domain-quota pass of
    web-corpus curation — no single source may dominate the mix — with
    the same engine-portable determinism as ``hash_sample``.

    PRECONDITION: ``key_col`` must be unique within each stratum — the
    (hash, key) sort is a total order only then. Rows tied on a
    duplicated key are ordered by physical row order, so which of them
    survives the cap would vary across runs/partitionings and no SQL
    oracle could reproduce the selection.

    Scale shape: one hash exchange on the stratum column, then a
    per-stratum rank that Spark executes as a group-limit (each
    partition keeps a bounded heap per stratum, no global sort). Skewed
    strata are exactly the point: the group-limit discards a hot
    stratum's overflow map-side."""
    from pyspark.sql import Window

    w = (Window.partitionBy(strata_col)
         .orderBy(hash_bucket_raw(F.col(key_col), seed), F.col(key_col)))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n).drop("__rn"))


def hash_bucket_raw(key: Column, seed: str = "") -> Column:
    """The full 60-bit MD5 hash (no modulus) — a finer-grained
    deterministic ordering key than :func:`hash_bucket`."""
    return word_hash(F.concat(F.lit(seed), key.cast("string")))


def global_shuffle(df: DataFrame, key_col: str, n_shards: int,
                   seed: str = "") -> DataFrame:
    """Deterministic global shuffle + balanced shard layout: every row
    gets ``(shard_id, pos_in_shard)`` from its 0-based global position
    in MD5-of-key order, striped round-robin across ``n_shards``.

    This is the "shuffle the corpus once, write N shards, stream them
    in order" layout step of a pre-training data loader. Requirements
    it meets that ``ORDER BY rand()`` cannot: (a) DETERMINISTIC — the
    permutation is a pure function of (seed, key), identical on any
    cluster, any partitioning, any retry, and replicable by an
    independent engine for audit; (b) *re-drawable* — a new seed is an
    independent permutation (epoch reshuffles are seed bumps, not new
    jobs); (c) BALANCED — round-robin striping makes shard sizes differ
    by at most 1 with no size skew from the key distribution.

    Scale shape: the global position comes from rank.global_row_number
    — two distributed passes bucketed on the hash's 60-bit numeric
    prefix (uniform by construction, so buckets are balanced) with no
    single-partition window; shard/pos are then row-local arithmetic.
    The hex digest tie-breaks its own numeric prefix, and ``key_col``
    (unique by contract) tie-breaks full-digest collisions, so the
    order is total and the ranks exact.

    ``key_col`` must be unique (it is the identity of the row in the
    permutation); duplicate keys would make the layout ambiguous."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.md5(F.concat(F.lit(seed + "|"),
                         F.col(key_col).cast("string")))
    from .rank import global_row_number

    # numeric prefix OF THE DIGEST ITSELF (not a re-hash): equal-length
    # lowercase hex sorts identically as string and as value, so
    # ordering by (prefix, digest) IS ordering by the digest — the
    # prefix only exists because range-bucketing needs a numeric lead
    keyed = df.withColumn("__k", key).withColumn(
        "__kn", F.conv(F.substring(F.col("__k"), 1, 15), 16, 10)
        .cast("long"))
    ranked = global_row_number(keyed, ["__kn", "__k", key_col],
                               rank_col="__rank")
    rn = F.col("__rank") - 1
    return (ranked
            .withColumn("shard_id", (rn % n_shards).cast("long"))
            .withColumn("pos_in_shard",
                        F.floor(rn / n_shards).cast("long"))
            .drop("__k", "__kn", "__rank"))
