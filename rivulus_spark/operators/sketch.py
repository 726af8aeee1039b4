"""Sketch / approximate-aggregation operators.

At 100 TB exact global statistics are often unaffordable or unnecessary;
these operators trade bounded error for one-pass, fixed-memory,
partially-aggregatable plans. All of them compile to Spark's built-in
sketch aggregates (JVM-side, mergeable across partitions — the sketch
merges in the combine step, so the shuffle carries one small sketch per
partition, never raw values).

Exactness contract for the oracle layer: the *approximate* operators
(HLL distinct, approximate percentiles) are inherently engine-specific
and ship without a SQL oracle (driver records the weaker rows-only
check); the *exact* formulations (percentile with interpolation, exact
heavy hitters) are deterministic and fully oracle-checked.

The reference has no aggregation surface at all (SURVEY §2.6) — this
module is north-star superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, cols: list[str],
                    rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct counts, one output row, one column per
    input column. Fixed memory (~1.5/rsd^2 bytes per sketch) regardless
    of cardinality; sketches merge map-side so the shuffle is one row
    per partition."""
    return df.agg(*[
        F.approx_count_distinct(c, rsd=rsd).alias(f"approx_distinct_{c}")
        for c in cols
    ])


def approx_distinct_audit(df: DataFrame, cols: list[str],
                          rsd: float = 0.05,
                          tol: float = 3.0) -> DataFrame:
    """Bounds-checked HLL: per column ``(column, n_exact,
    hll_within_bounds)`` where the boolean asserts the HLL++ estimate
    lands within ``tol * rsd`` (default 3 standard errors) of the exact
    distinct count. This is the *verification harness* for the sketch —
    it pays the exact count(distinct) the sketch exists to avoid, so
    run it at validation scale, not on the 100 TB table. Both the HLL
    estimate and the exact count are deterministic for a fixed input,
    so the boolean is a stable, oracle-checkable observable (the raw
    estimate is engine-specific and is not emitted).

    Plan shape: the HLL estimates come from ONE Expand-free aggregate
    scan; each exact count is its own single-column two-stage distinct
    aggregate over a column-pruned scan, crossJoined in as a 1-row
    frame. Mixing several count_distinct(col_i) into one agg makes
    Catalyst plan an Expand that duplicates every input row once per
    distinct aggregate — measured ~9x slower than the narrow per-column
    scans at sf0.1."""
    wide = df.agg(*[
        F.approx_count_distinct(c, rsd=rsd).alias(f"{c}__approx")
        for c in cols
    ])
    for c in cols:
        wide = wide.crossJoin(
            df.agg(F.count_distinct(F.col(c)).alias(f"{c}__exact")))
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__exact").alias("n_exact"),
            (F.abs(F.col(f"{c}__approx") - F.col(f"{c}__exact"))
             <= tol * rsd * F.col(f"{c}__exact")).alias("hll_within_bounds"))
        for c in cols
    ]
    return (wide.select(F.explode(F.array(*per_col)).alias("p"))
            .select("p.column", "p.n_exact", "p.hll_within_bounds"))


def exact_quantiles(df: DataFrame, value_col: str, probs: list[float],
                    by: list[str] | None = None) -> DataFrame:
    """Exact linear-interpolated percentiles (PERCENTILE_CONT
    semantics — matches DuckDB's quantile_cont, so it is fully
    oracle-checkable). Exact percentiles need the values of each group
    co-located: one shuffle on ``by``. For a global percentile at
    corpus scale prefer ``approx_quantiles``.

    Rounding: round(x, 4), NOT the floor-truncation other observables
    use — floor mangles every non-representable decimal (9.1 would
    emit as 9.0999), while round's known cross-engine divergence
    (Spark rounds the shortest decimal repr, DuckDB the raw double) is
    confined to interpolated values whose repr terminates in an exact
    half at the 4th decimal — vanishingly rare for real data, and the
    matching SQL oracle must use round(...,4) identically."""
    aggs = [
        F.round(F.percentile(F.col(value_col), F.lit(p)), 4)
        .alias(f"p{str(p).replace('.', '')}")
        for p in probs
    ]
    if by:
        return df.groupBy(*by).agg(*aggs)
    return df.agg(*aggs)


def approx_quantiles(df: DataFrame, value_col: str, probs: list[float],
                     accuracy: int = 10_000,
                     by: list[str] | None = None) -> DataFrame:
    """Greenwald-Khanna approximate percentiles: one pass, bounded
    memory, mergeable — the scale path for global quantiles. Error is
    <= 1/accuracy of the rank. Engine-specific result (no SQL oracle)."""
    aggs = [
        F.approx_percentile(F.col(value_col), F.lit(p), F.lit(accuracy))
        .alias(f"p{str(p).replace('.', '')}")
        for p in probs
    ]
    if by:
        return df.groupBy(*by).agg(*aggs)
    return df.agg(*aggs)


def heavy_hitters(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Exact top-k most frequent values of ``key_col``:
    (value, n, rank), rank ordered by (n desc, value) for determinism.

    Plan shape: partial-aggregated count (map-side combine collapses
    each partition to its distinct keys) then a single top-k — Catalyst
    executes the sort+limit as TakeOrderedAndProject, a per-partition
    heap + one merge, so nothing resembling a global sort happens. For
    skew-proof estimation when even the distinct-key set is huge, a
    count-min sketch (F.count_min_sketch) bounds memory instead."""
    counted = (df.groupBy(F.col(key_col).alias("value"))
               .agg(F.count("*").alias("n")))
    w = Window.orderBy(F.col("n").desc(), F.col("value"))
    return (counted.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass data-profiling summary: per column — non-null count,
    approx distinct, min/max — as one narrow output row per column.
    The whole profile is a single aggregate scan (all sketches merge),
    which is how you profile a 100 TB table without N passes."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.approx_count_distinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    per_col = [
        F.struct(F.lit(c).alias("column"),
                 F.col(f"{c}__n").alias("n_non_null"),
                 F.col(f"{c}__distinct").alias("approx_distinct"),
                 F.col(f"{c}__min").alias("min_str"),
                 F.col(f"{c}__max").alias("max_str"))
        for c in cols
    ]
    return (wide.select(F.explode(F.array(*per_col)).alias("p"))
            .select("p.column", "p.n_non_null", "p.approx_distinct",
                    "p.min_str", "p.max_str"))


def profile_audit(df: DataFrame, cols: list[str], rsd: float = 0.05,
                  tol: float = 3.0) -> DataFrame:
    """``column_profile`` with the approximate-distinct column replaced
    by a bounds check against the exact count: per column
    ``(column, n_non_null, min_str, max_str, distinct_ok)``. Like
    :func:`approx_distinct_audit` this is the validation-scale harness
    for the sketch — every emitted value is deterministic and
    SQL-reproducible, which is what makes the profile oracle-checkable
    end to end. Counts/min/max/HLL come from ONE Expand-free aggregate
    scan; the exact distinct counts join in as per-column 1-row
    aggregates over column-pruned scans (see approx_distinct_audit —
    the mixed-distinct Expand plan measured ~9x slower at sf0.1)."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.approx_count_distinct(c, rsd=rsd).alias(f"{c}__approx"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    for c in cols:
        wide = wide.crossJoin(
            df.agg(F.count_distinct(F.col(c)).alias(f"{c}__exact")))
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n_non_null"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
            (F.abs(F.col(f"{c}__approx") - F.col(f"{c}__exact"))
             <= tol * rsd * F.col(f"{c}__exact")).alias("distinct_ok"))
        for c in cols
    ]
    return (wide.select(F.explode(F.array(*per_col)).alias("p"))
            .select("p.column", "p.n_non_null", "p.min_str", "p.max_str",
                    "p.distinct_ok"))
