"""Model-in-the-loop curation: distributed logistic-regression
training and corpus filtering.

The classic pipeline component this implements: train a small linear
quality/domain classifier on cheap per-document features, then score
the whole corpus and keep what passes — the CCNet / GPT-3-style
"quality filter" step, where the model is fit ON the corpus it then
curates. The reference engine has no model surface at all; this is a
north-star operator built to the repo's exactness discipline: every
arithmetic step is chosen so an independent single-threaded
implementation reproduces the weights to ~1e-12, making the trained
model itself oracle-checkable (floored to 6 decimals).

Scale design — why this survives 100 TB:

- **Features are JVM projections** (`text.quality_features`: counts
  and floor-truncated ratios — one codegen scan, no shuffle).
- **Full-batch gradient descent, one aggregation per iteration.** The
  gradient of logistic loss is sum((sigmoid(w·x) - y) · x) — d+1
  partial-aggregated sums over the persisted standardized feature
  table. Each iteration is ONE whole-stage-codegen agg job whose
  result is d+1 doubles: the same k-row driver barrier as k-means
  centroids (cluster.py) and BPE's per-round argmax (bpe.py). No
  Python workers anywhere — the sigmoid is `F.exp` inside codegen,
  re-parameterized each round with the current weights as literals.
- **Standardization is one extra stats pass** (mean/stddev_pop per
  feature, a 1-row agg) that bounds z = w·x so fixed-step GD
  converges without line search; weights are reported in standardized
  space (the oracle replays the identical recipe).
- **Iteration count is fixed** (not convergence-tested) so the job
  count is known and the result deterministic.

Determinism note: partial-sum order differs across partitionings, so
weights drift at the last-ulp level between runs/engines; outputs are
floor-truncated to 6 decimals (floor, not round — the repo-wide
cross-engine convention), far above the ~1e-12 drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import cache


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_fit(
    df: DataFrame, feature_cols: list[str], label_col: str,
    n_iters: int = 20, lr: float = 1.0,
) -> tuple[dict[str, float], list[float], list[float]]:
    """Fit logistic regression by full-batch gradient descent; returns
    ``({"intercept": w0, feature: w_i, ...}, means, stds)`` with
    weights in STANDARDIZED feature space (z-scored with population
    stddev — the means/stds are what :func:`logreg_score` needs to
    apply them). ``label_col`` must be boolean/0-1. ``lr`` is the
    step on the MEAN gradient.

    One stats job + ``n_iters`` aggregation jobs, each collecting
    d+1 doubles — nothing row-sized ever reaches the driver."""
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    from ..partitioning import driver_loop_conf

    feats = cache.persist(df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y")))
    with driver_loop_conf(df.sparkSession):
        return _logreg_fit_loop(feats, feature_cols, n_iters, lr)


def _logreg_fit_loop(feats: DataFrame, feature_cols: list[str],
                     n_iters: int, lr: float):
    """logreg_fit's driver loop, run under driver_loop_conf (AQE off:
    each round is one global aggregation to d+1 doubles — one job, not
    an AQE stage pair; see partitioning.driver_loop_conf)."""
    d = len(feature_cols)
    stats = feats.agg(
        *[F.avg(c).alias(f"m{i}") for i, c in enumerate(feature_cols)],
        *[F.stddev_pop(c).alias(f"s{i}")
          for i, c in enumerate(feature_cols)],
        F.count("*").alias("n")).first()
    means = [stats[f"m{i}"] for i in range(d)]
    # constant features carry no signal; std=1 keeps them harmlessly 0
    stds = [stats[f"s{i}"] or 1.0 for i in range(d)]
    stds = [s if s > 0.0 else 1.0 for s in stds]
    n = stats["n"]
    if n == 0:
        raise ValueError("cannot fit on an empty DataFrame")

    # Pre-compute the z-scored features ONCE into the persisted frame
    # and give the residual a NAME in a projection before the gradient
    # sums consume it. Numerically identical (same ops, same
    # left-to-right order), but the per-round analyzed tree shrinks
    # ~5x: the old form re-derived (x-m)/s inside every sum and
    # inlined a copy of the sigmoid-residual into each of the d+1
    # gradient expressions, and at 12 rounds that analysis overhead —
    # not codegen, not the job itself — was most of the round cost
    # (measured at sf0.1: a trivial same-shape agg round is ~100 ms,
    # a logreg round was ~230 ms; literal-vs-cached-plan A/B showed
    # codegen caching contributes nothing).
    zfeats = cache.persist(feats.select(
        *[((F.col(c) - F.lit(means[i])) / F.lit(stds[i])).alias(f"__z{i}")
          for i, c in enumerate(feature_cols)],
        F.col("__y")))
    w = [0.0] * (d + 1)  # [intercept, w_1..w_d]
    for _ in range(n_iters):
        z = F.lit(w[0])
        for i in range(d):
            z = z + F.lit(w[i + 1]) * F.col(f"__z{i}")
        r = _sigmoid(z) - F.col("__y")
        g = (zfeats
             .select(r.alias("__r"),
                     *[F.col(f"__z{i}") for i in range(d)])
             .agg(F.sum("__r").alias("g0"),
                  *[F.sum(F.col("__r") * F.col(f"__z{i}"))
                    .alias(f"g{i + 1}") for i in range(d)])).first()
        for j in range(d + 1):
            w[j] -= lr * g[f"g{j}"] / n
    out = {"intercept": w[0]}
    for i, c in enumerate(feature_cols):
        out[c] = w[i + 1]
    return out, means, stds


def logreg_score(df: DataFrame, feature_cols: list[str],
                 weights: dict[str, float], means: list[float],
                 stds: list[float],
                 score_col: str = "score") -> DataFrame:
    """Append the fitted probability — a pure codegen projection (the
    corpus-scoring pass is a scan, exactly like the feature pass)."""
    z = F.lit(weights["intercept"])
    for i, c in enumerate(feature_cols):
        z = z + F.lit(weights[c]) * (
            (F.col(c) - F.lit(means[i])) / F.lit(stds[i]))
    return df.withColumn(score_col, _sigmoid(z))


def score_auc(df: DataFrame, score_col: str, label_col: str | Column,
              ) -> DataFrame:
    """ROC-AUC of a per-document score against a boolean label — the
    calibration audit a pipeline runs on its quality classifier
    before trusting it to gate a corpus (CCNet's "does the LM score
    actually separate wiki from crawl" check). Output: ONE row
    ``(n_pos, n_neg, auc_q)`` with ``auc_q`` the Mann-Whitney AUC
    (probability a random positive outscores a random negative, ties
    counted half) floor-truncated at 6 decimals; NULL when either
    class is empty (SQL division semantics — the caller's signal that
    the audit is degenerate, not a fabricated 0.5).

    Exactness: AUC = (2·P + T) / (2·n_pos·n_neg) with P = #(pos,neg)
    pairs where pos scores strictly higher and T = #tied pairs — an
    ALL-INTEGER numerator. P and T accumulate in decimal(38,0)
    (pos·cum_neg products overflow int64 once n_pos·n_neg passes
    ~9e18, i.e. precisely at the corpus scale this engine targets);
    the one float operation is the final division, written as the
    same left-associated expression in the SQL oracle.

    Scale shape (why there is no corpus-sized sort): scores arriving
    here are the repo's floor-quantized ratios (3–6 decimals), so the
    groupBy collapses the corpus to a SCORE-CARDINALITY-bounded table
    (≤ 10^q + 1 rows regardless of corpus size). The pair counts then
    come from one cumulative window over those groups — an
    unpartitioned window justified bounded-key, the pattern the plan
    audit (tests/test_plans.py) requires named — never a per-row rank
    over the corpus. One shuffle (the groupBy), one k-row window, one
    1-row agg.

    The two stages are exposed separately (score_class_counts /
    auc_from_score_counts) because the counts table is an
    order-insensitive, MERGEABLE state — exactly what a streaming
    aggregation carries — so the in-stream AUC monitor
    (stream_score_auc) drains its state table through the identical
    tail and matches this batch result bit for bit."""
    return auc_from_score_counts(
        score_class_counts(df, score_col, label_col))


def score_class_counts(df: DataFrame, score_col: str,
                       label_col: str | Column) -> DataFrame:
    """Per-distinct-score (pos, neg) class counts — score_auc's first
    stage and the bounded mergeable state a streaming AUC carries
    (keyspace = score cardinality, <= 10^q + 1 for a q-decimal
    quantized score, at any corpus size).

    NULL scores are EXCLUDED (ADVICE r9): the repo's score ops return
    NULL on degenerate input (punct_ratio on whitespace-only text) by
    contract, and a NULL score has no rank — counting it into
    n_pos/n_neg would inflate the class totals, and carrying it into
    the cumulative window would diverge across engines (Spark orders
    NULLS FIRST, ANSI/DuckDB NULLS LAST). The SQL oracles filter
    identically."""
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    return (df.filter(F.col(score_col).isNotNull())
            .groupBy(F.col(score_col).alias("s"))
            .agg(F.sum(F.when(lab, F.lit(1)).otherwise(F.lit(0)))
                 .cast("long").alias("pos"),
                 F.sum(F.when(lab, F.lit(0)).otherwise(F.lit(1)))
                 .cast("long").alias("neg")))


def auc_from_score_counts(g: DataFrame) -> DataFrame:
    """score_auc's tail: Mann-Whitney AUC from a ``(s, pos, neg)``
    class-count table (see score_auc for the float/overflow
    contract)."""
    from pyspark.sql import Window

    w = (Window.orderBy("s")
         .rowsBetween(Window.unboundedPreceding, -1))
    dec = "decimal(38,0)"
    cum = g.withColumn(
        "cum_neg", F.coalesce(F.sum("neg").over(w), F.lit(0)))
    agg = cum.agg(
        F.sum(F.col("pos").cast(dec) * F.col("cum_neg").cast(dec))
        .alias("p_gt"),
        F.sum(F.col("pos").cast(dec) * F.col("neg").cast(dec))
        .alias("p_tie"),
        F.sum("pos").alias("n_pos"), F.sum("neg").alias("n_neg"))
    auc = ((F.lit(2).cast(dec) * F.col("p_gt") + F.col("p_tie"))
           .cast("double")
           / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")))
    # explicit NULL guard: a one-class input makes the denominator 0,
    # and ANSI floor(Infinity) throws rather than propagating null
    auc_q = F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                   F.floor(auc * 1_000_000) / 1_000_000)
    return agg.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        auc_q.alias("auc_q"))


def score_calibration(df: DataFrame, score_col: str,
                      label_col: str | Column, n_bins: int = 10,
                      scale: int = 1000) -> DataFrame:
    """Reliability table for a [0,1] classifier score — the
    calibration audit next to score_auc's ranking audit: AUC says the
    score ORDERS documents correctly; this says whether 0.8 MEANS
    80%. Output: one row per non-empty fixed-width bin,
    ``(bin, n, n_pos, mean_score_q, pos_rate_q, gap_q)`` — bin =
    min(floor(score·n_bins), n_bins−1), gap_q = |pos_rate −
    mean_score| floor-truncated at 6 decimals (like the two rates).
    Expected Calibration Error = Σ (n/total)·gap over the rows — left
    to the reader because the per-bin table is what a curator
    inspects (which score REGION is miscalibrated).

    Exactness contract: ``scale`` declares the score's quantization —
    the repo's ratios are floor-quantized at 3–6 decimals, so
    round(score·scale) recovers an EXACT integer per row and
    mean_score sums integers (no order-dependent float accumulation);
    the two divisions per bin are the only float ops, written
    identically in the SQL oracle.

    Dirty-input contract (ADVICE r9): NULL scores are dropped (same
    exclusion, and same reason, as score_class_counts — the repo's
    score ops return NULL on degenerate input by contract), and the
    bin index is clamped on BOTH edges — greatest(…, 0) mirrors the
    existing least(…, n_bins−1) so a score outside [0,1] lands in the
    edge bin it exceeds instead of minting a phantom negative bin.
    The SQL oracle applies the identical filter and clamp.

    Scale shape: one map-side-combined groupBy over an n_bins-bounded
    key — a single tiny shuffle, no window, no driver state."""
    if n_bins < 1:
        raise ValueError(f"score_calibration: n_bins must be >= 1, "
                         f"got {n_bins}")
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    s = F.col(score_col)
    b = F.greatest(F.least(F.floor(s * n_bins), F.lit(n_bins - 1)),
                   F.lit(0)).cast("long")
    g = (df.filter(s.isNotNull())
         .select(b.alias("bin"),
                 F.round(s * scale).cast("long").alias("s_int"),
                 F.when(lab, F.lit(1)).otherwise(F.lit(0)).alias("y"))
         .groupBy("bin")
         .agg(F.count("*").alias("n"),
              F.sum("y").cast("long").alias("n_pos"),
              F.sum("s_int").alias("s_sum")))
    mean_s = (F.col("s_sum").cast("double")
              / (F.lit(float(scale)) * F.col("n")))
    pos_rate = F.col("n_pos").cast("double") / F.col("n")
    q = lambda c: F.floor(c * 1_000_000) / 1_000_000  # noqa: E731
    return g.select("bin", F.col("n").cast("long").alias("n"), "n_pos",
                    q(mean_s).alias("mean_score_q"),
                    q(pos_rate).alias("pos_rate_q"),
                    q(F.abs(pos_rate - mean_s)).alias("gap_q"))
