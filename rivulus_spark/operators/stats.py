"""Distribution analytics for corpus curation: histograms and
percentile clipping.

A curation pipeline's first question about any numeric column (doc
length, quality score, perplexity) is "what does the distribution look
like, and where do I cut?". Both operators here are single-pass,
shuffle-light, and oracle-exact:

- :func:`histogram` is one map-side binning projection + one bounded
  group-by (≤ ``n_bins`` rows cross the shuffle, never the corpus).
- :func:`percentile_clip` computes the exact interpolated percentiles
  (Spark ``percentile``, the same linear-interpolation definition as
  DuckDB ``quantile_cont``) as a 1-row aggregate, broadcasts the two
  boundary values back, and filters — the corpus is scanned twice but
  never shuffled. At 100 TB swap ``exact=False`` to use
  ``percentile_approx`` (single-digit-KB sketch merge instead of the
  exact aggregate's per-partition sorted buffers); the plan shape is
  identical.

Reference parity: the reference engine has no aggregate surface at all
(SURVEY.md §2.6) — these are north-star superset operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def histogram(df: DataFrame, col: str | Column, lo: float, hi: float,
              n_bins: int = 20) -> DataFrame:
    """Fixed-width histogram of ``col`` over ``[lo, hi)``: returns
    ``(bin, bin_lo, bin_hi, n)`` with out-of-range values clamped into
    the edge bins (so counts always total the non-null, non-NaN row
    count). NaN is excluded like null — floor(NaN) would otherwise
    silently land it in bin 0, inflating the lowest bin with values
    that are not small but undefined. Bin arithmetic is plain
    floor/least/greatest — portable to any SQL oracle, no
    ``width_bucket`` dependency."""
    if not n_bins > 0:
        raise ValueError("n_bins must be positive")
    if not hi > lo:
        raise ValueError("hi must be > lo")
    c = _c(col).cast("double")
    w = (hi - lo) / n_bins
    bin_ = F.least(F.greatest(F.floor((c - F.lit(lo)) / F.lit(w)),
                              F.lit(0)),
                   F.lit(n_bins - 1)).cast("long")
    return (df.where(c.isNotNull() & ~F.isnan(c))
            .select(bin_.alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").alias("n"))
            .select("bin",
                    (F.lit(lo) + F.col("bin") * F.lit(w)).alias("bin_lo"),
                    (F.lit(lo) + (F.col("bin") + 1) * F.lit(w))
                    .alias("bin_hi"),
                    "n"))


def percentile_clip(df: DataFrame, col: str | Column,
                    p_lo: float = 0.05, p_hi: float = 0.95,
                    exact: bool = True,
                    accuracy: int = 10_000) -> DataFrame:
    """Keep rows whose ``col`` lies within the ``[p_lo, p_hi]``
    percentile band — the standard outlier cut before training-data
    statistics (drop the empty docs and the megabyte pathologies in
    one declarative step). Appends nothing; returns the filtered frame
    with the original schema.

    ``exact=True`` uses Spark's exact interpolated ``percentile``
    (bit-matches DuckDB ``quantile_cont``); ``exact=False`` uses the
    ``percentile_approx`` sketch, the 100 TB default.

    Rows with null ``col`` are always dropped (they are inside no
    band); if the column is entirely null the percentiles themselves
    are null and the result is empty."""
    if not 0.0 <= p_lo <= p_hi <= 1.0:
        raise ValueError("need 0 <= p_lo <= p_hi <= 1")
    c = _c(col)
    fn = "percentile" if exact else "percentile_approx"
    extra = "" if exact else f", {accuracy}"
    bounds = df.select(c.alias("__pc_x")).agg(
        F.expr(f"{fn}(__pc_x, array({p_lo}D, {p_hi}D){extra})")
        .alias("__pc_b"))
    bounds = bounds.select(F.col("__pc_b")[0].alias("__pc_lo"),
                           F.col("__pc_b")[1].alias("__pc_hi"))
    return (df.crossJoin(F.broadcast(bounds))
            .where((c >= F.col("__pc_lo")) & (c <= F.col("__pc_hi")))
            .drop("__pc_lo", "__pc_hi"))


def group_percentile_clip(df: DataFrame, col: str | Column,
                          group_cols: list[str],
                          p_lo: float = 0.05, p_hi: float = 0.95,
                          exact: bool = True,
                          accuracy: int = 10_000) -> DataFrame:
    """Per-GROUP percentile band cut — the calibration form of
    :func:`percentile_clip`: each group (source, language, domain)
    gets its OWN ``[p_lo, p_hi]`` bounds. A single global band over a
    mixed corpus clips whole sub-corpora — a verbose domain's healthy
    median can sit above a terse domain's p95 — so per-domain quality
    thresholds are the standard curation practice this encodes.

    Scale shape: the bound table is one partial-aggregated groupBy
    (one row per group — map-side combined percentile state), joined
    back with a broadcast hint since group counts (domains, languages)
    are tiny next to the corpus; drop the hint via a pre-computed
    bounds join if a pathological group space ever outgrows broadcast.
    ``exact=False`` swaps the per-group exact ``percentile`` for the
    mergeable ``percentile_approx`` sketch, the 100 TB default, with
    an identical plan shape. Null ``col`` rows are always dropped; an
    all-null group clips to empty."""
    if not 0.0 <= p_lo <= p_hi <= 1.0:
        raise ValueError("need 0 <= p_lo <= p_hi <= 1")
    if not group_cols:
        raise ValueError("group_cols must be non-empty; use "
                         "percentile_clip for the global band")
    c = _c(col)
    fn = "percentile" if exact else "percentile_approx"
    extra = "" if exact else f", {accuracy}"
    bounds = (df.select(*group_cols, c.alias("__pc_x"))
              .groupBy(*group_cols)
              .agg(F.expr(f"{fn}(__pc_x, array({p_lo}D, {p_hi}D){extra})")
                   .alias("__pc_b"))
              .select(*group_cols,
                      F.col("__pc_b")[0].alias("__pc_lo"),
                      F.col("__pc_b")[1].alias("__pc_hi")))
    return (df.join(F.broadcast(bounds), group_cols)
            .where((c >= F.col("__pc_lo")) & (c <= F.col("__pc_hi")))
            .drop("__pc_lo", "__pc_hi"))


def rate_anomalies(df, ts_col: str = "ts", group_col: str = "event_type",
                   z_threshold: float = 3.0):
    """Per-group hourly-rate anomaly flags: hours whose event count
    sits more than ``z_threshold`` population-z-scores from the
    group's own mean hourly rate — the volume-anomaly telemetry a
    pipeline runs on every ingest (a crawler stuck in a loop, a bot
    burst, an hour at a tenth of normal volume). Hours with ZERO
    events emit no row at all and therefore cannot be flagged here —
    detecting a source gone fully dark needs a dense hour spine
    (see timeseries.resample's date-spine pattern) before the stats
    pass; this operator flags anomalies among observed hours.

    Scale shape: the corpus-sized stage is ONE partial-aggregated
    groupBy (group, hour) — everything after runs on the tiny hourly
    table (groups x hours rows): per-group mean/stddev is a second
    k-row aggregate broadcast back into the final filter. z is
    floor-truncated to 3 decimals (the hourly table's float sums are
    order-dependent at the last ulp; 1e-3 buckets absorb that)."""
    from pyspark.sql import functions as F

    hours = (df.groupBy(F.col(group_col).alias("grp"),
                        F.date_format(F.date_trunc("hour", F.col(ts_col)),
                                      "yyyy-MM-dd HH:00").alias("hour"))
             .agg(F.count("*").alias("n_events")))
    stats = (hours.groupBy("grp")
             .agg(F.avg("n_events").alias("mu"),
                  F.stddev_pop("n_events").alias("sigma")))
    # guard the division itself: Spark 4 runs ANSI mode, where
    # double/0 THROWS — relying on the sigma>0 conjunct being
    # evaluated first would make correctness a predicate-pushdown
    # artifact (same hazard as clean.punct_ratio's guard)
    z = F.when(F.col("sigma") > 0,
               (F.col("n_events") - F.col("mu")) / F.col("sigma"))
    return (hours.join(stats, "grp")
            .filter(F.abs(z) > F.lit(z_threshold))
            .select(F.col("grp").alias(group_col), "hour", "n_events",
                    (F.floor(z * 1000) / 1000).alias("z_score")))


def zipf_slope(df: DataFrame, k: int = 100, text_col: str = "text",
               group_col: str = "source") -> DataFrame:
    """Per-group Zipf power-law fit — the corpus-health audit that
    catches machine-generated and template-spam sources: natural text
    follows c(rank) ∝ rank^s with s ≈ -1 (Zipf's law), so each
    group's OLS slope of ln(count) on ln(rank) over its top-``k``
    terms is a one-number fingerprint of "does this source read like
    language". Output ``(group, n_terms, zipf_slope)``: slopes far
    above -1 (flat — a bot cycling a fixed vocabulary uniformly) or
    far below (one token dominating everything) both flag the source
    for triage. Slope floor-truncates to 3 decimals; groups with
    fewer than 2 distinct terms emit a null slope (the OLS
    denominator is zero, and the unguarded divide would raise under
    ANSI — same seam class as the PSI empty-side fix).

    Scale shape: ONE corpus-sized (group, term) count (map-side
    partial combine) — everything after runs on k-row tables: the
    per-group rank is a PARTITIONED group-limit window (count desc,
    term tie-break, deterministic), and the OLS reduces each group to
    five aggregates in one pass. No Python, no driver math."""
    from pyspark.sql import Window

    from .text import tokens

    counts = (df.select(F.col(group_col).alias("grp"),
                        F.explode(tokens(text_col)).alias("term"))
              .groupBy("grp", "term").agg(F.count("*").alias("c")))
    w = Window.partitionBy("grp").orderBy(F.col("c").desc(),
                                          F.col("term").asc())
    top = (counts.select("grp", "c",
                         F.row_number().over(w).alias("r"))
           .filter(F.col("r") <= k))
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("c").cast("double"))
    agg = (top.groupBy("grp")
           .agg(F.count("*").cast("double").alias("n"),
                F.sum(x).alias("sx"), F.sum(y).alias("sy"),
                F.sum(x * y).alias("sxy"), F.sum(x * x).alias("sxx")))
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / denom)
    return (agg.select(F.col("grp").alias(group_col),
                       F.col("n").cast("long").alias("n_terms"),
                       F.when(denom > 0,
                              F.floor(slope * 1000) / 1000)
                       .alias("zipf_slope")))
