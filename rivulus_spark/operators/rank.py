"""Distributed global ranking / ntile — no single-partition window.

Spark's ``Window.orderBy(...)`` with no ``partitionBy`` funnels the
ENTIRE input through one task (WindowExec logs exactly this warning);
at 100 TB that is an executor OOM, not a plan. Global order statistics
are computed in two distributed passes instead:

1. **Bucket** rows by range on the leading order column using
   approximate percentile boundaries (``percentile_approx``).
   Bucketing only needs *some* monotone partition of the key space —
   not exact quantiles — so approximation never affects rank
   exactness, only bucket balance.
2. **Offset**: count rows per bucket (one row per bucket), prefix-sum
   those counts with a window over the tiny bucket-count table, and
   broadcast the offsets back.
3. **Rank** within each bucket (window *partitioned by* bucket,
   ordered by the full key) and add the bucket's offset.

Every shuffle of real data is keyed by bucket; the only unpartitioned
window runs over ≤ ``n_buckets`` rows. This is the classic two-pass
parallel ranking used by distributed sorts (TeraSort-style range
partitioning + per-partition offsets).

Reference parity: the reference engine has no window operator at all
(SURVEY.md §2 — its expression algebra is row-local); these helpers
back the ntile / percent_rank workload queries that a percentile-based
corpus-filtering pipeline needs at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int = 64,
    rank_col: str = "rank",
    with_total: str | None = None,
    small_input_bytes: int = 64 << 20,
) -> DataFrame:
    """Append a 1-based global ``row_number`` over ``order_cols``
    (ascending, nulls first — Spark's default sort order) without a
    single-partition window.

    ``order_cols`` must form a unique key for exact ``rank`` /
    ``percent_rank`` parity (with a unique key, row_number == rank).
    ``with_total``, if set, also appends the total row count under
    that name (broadcast of a 1-row aggregate — needed by ntile).

    Bucket balance follows the LEADING column's value distribution:
    rows tied on it cannot split across buckets (boundaries must
    respect the total order), so a tie-heavy leading key (e.g. Zipf
    token counts) concentrates its modal value in one bucket — ranks
    stay exact, parallelism degrades toward that bucket's share.
    Prefer a high-cardinality leading column. Deterministic
    recomputation (percentile boundaries, not sampled-seed range
    partitioning) is what lets the count pass and the rank pass agree
    without persisting the input.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    lead = order_cols[0]

    # Scale-adaptive strategy, the same statistics-driven physical
    # choice Spark itself makes for broadcast-vs-shuffle joins: a file
    # input whose TOTAL size is known to fit one task comfortably
    # (``small_input_bytes``, default 64 MB — well under the
    # one-partition read unit) ranks through a single global window,
    # skipping the multi-stage two-pass machinery whose
    # stage-scheduling latency dominates at small sizes. This is the
    # one place the operator deliberately emits an unpartitioned
    # data window — gated on measured input size, never the default
    # for inputs of unknown size (in-memory, streaming) or anything
    # over the threshold, which all take the distributed path. The
    # bounded-window plan audit in tests/test_plans.py encodes exactly
    # this policy.
    from ..partitioning import estimated_input_bytes
    size = estimated_input_bytes(df)
    # the estimate measures the SOURCE files, not the ranked relation:
    # a lineage that can multiply rows (explode/Generate, joins) makes
    # file bytes an under-estimate, so treat the size as unknown and
    # take the distributed path — mis-classifying small is the failure
    # mode that single-partitions a huge window
    if size is not None:
        try:
            import re as _re

            plan = df._jdf.queryExecution().analyzed().toString()
            if _re.search(r"\b(Generate|Join)\b", plan):
                size = None
        except Exception:
            size = None
    if size is not None and size <= small_input_bytes:
        w1 = Window.orderBy(*order_cols)
        out = df.withColumn(rank_col, F.row_number().over(w1).cast("long"))
        if with_total is not None:
            out = out.withColumn(
                with_total,
                F.count("*").over(
                    w1.rowsBetween(Window.unboundedPreceding,
                                   Window.unboundedFollowing)))
        return out

    # 1. range-bucket on the leading column. Boundaries are approximate
    # quantiles: rows equal to a boundary fall in the lower bucket
    # (strict >), which is consistent and order-preserving. Nulls get
    # bucket 0, matching Spark's nulls-first ascending sort. An
    # ALL-null leading column makes percentile_approx return null —
    # coalesce the bucket to 0 so every row lands in bucket 0 instead
    # of being dropped by the null-keyed offsets join.
    lead_type = dict(df.dtypes).get(lead, "")
    if not any(t in lead_type for t in
               ("int", "long", "float", "double", "decimal", "date",
                "timestamp", "short", "byte")):
        raise ValueError(
            f"global_row_number: distributed ranking buckets on "
            f"percentile bounds of the leading order column, which "
            f"requires an orderable numeric/temporal type — got "
            f"{lead!r}: {lead_type}. Rank on a numeric key (e.g. a "
            f"length or hash-derived sort key) or pre-map the string "
            f"domain to codes.")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # GK accuracy only affects bucket BALANCE (rank error 1/accuracy
    # of relative rank), never exactness — 32x the bucket count keeps
    # boundary error well under a bucket's width at a fraction of the
    # 10k-accuracy sketch cost
    accuracy = max(1_000, 32 * n_buckets)
    # persist the two bounded intermediates (1-row bounds, <=n_buckets-
    # row counts): each is referenced from several plan branches, and
    # without a persist Catalyst re-expands the whole subtree at every
    # reference — the sf0.1 plan carried 12 input scans and SIX
    # percentile-sketch recomputations. Cached size is O(n_buckets)
    # rows regardless of corpus size, so this is scale-safe (unlike
    # persisting the bucketed data itself, deliberately avoided).
    from .. import cache
    bounds = cache.persist(df.select(
        F.percentile_approx(lead, probs, accuracy).alias("_rk_bounds")))
    b = (df.crossJoin(F.broadcast(bounds))
         .withColumn(
             "_rk_bucket",
             F.coalesce(
                 F.aggregate(
                     F.col("_rk_bounds"), F.lit(0),
                     lambda acc, x: acc + F.when(F.col(lead) > x, 1)
                                          .otherwise(0)),
                 F.lit(0)))
         .drop("_rk_bounds"))

    # 2. per-bucket counts -> exclusive prefix sums AND the grand
    # total, fused into ONE broadcast cross-join over the
    # <= n_buckets-row count table (a window-free prefix sum:
    # O(n_buckets^2) tiny rows, no unpartitioned WindowExec anywhere
    # in the plan, and no second aggregate pass over the counts — the
    # total rides along as sum over all partners, so with_total costs
    # no extra scan and no extra broadcast join against the data).
    counts = cache.persist(
        b.groupBy("_rk_bucket").agg(F.count("*").alias("_rk_n")))
    lower = counts.select(F.col("_rk_bucket").alias("_rk_b2"),
                          F.col("_rk_n").alias("_rk_n2"))
    total_aggs = ([F.sum("_rk_n2").alias(with_total)]
                  if with_total is not None else [])
    offsets = (counts.crossJoin(F.broadcast(lower))
               .groupBy("_rk_bucket")
               .agg(F.coalesce(
                        F.sum(F.when(F.col("_rk_b2") < F.col("_rk_bucket"),
                                     F.col("_rk_n2"))),
                        F.lit(0)).alias("_rk_off"),
                    *total_aggs))

    # 3. within-bucket row_number + bucket offset = exact global rank.
    wb = Window.partitionBy("_rk_bucket").orderBy(*order_cols)
    return (b.join(F.broadcast(offsets), "_rk_bucket")
            .withColumn(rank_col,
                        (F.col("_rk_off") + F.row_number().over(wb))
                        .cast("long"))
            .drop("_rk_bucket", "_rk_off"))


def _ntile_of(rank: Column, total: Column, n: int) -> Column:
    """SQL-standard ntile(n) of a 1-based rank given the total count:
    the first ``total % n`` tiles get ``floor(total/n) + 1`` rows, the
    rest ``floor(total/n)``. Pure column arithmetic — double division
    is exact for counts < 2^53."""
    base = F.floor(total / n)
    rem = total % n
    big = base + F.lit(1)
    return (F.when(rank <= rem * big, F.ceil(rank / big))
            .otherwise(rem + F.ceil((rank - rem * big)
                                    / F.greatest(base, F.lit(1))))
            .cast("long"))


def add_ntile_percent_rank(
    df: DataFrame,
    order_cols: list[str],
    n: int = 4,
    tile_col: str = "tile",
    pr_col: str = "pr",
    n_buckets: int = 64,
    small_input_bytes: int = 64 << 20,
) -> DataFrame:
    """Append ``ntile(n)`` and ``percent_rank()`` over a global order,
    computed from the two-pass distributed rank (``order_cols`` must be
    a unique key, so rank == row_number and percent_rank is
    ``(rank-1)/(N-1)``)."""
    r = global_row_number(df, order_cols, n_buckets=n_buckets,
                          rank_col="_rk_r", with_total="_rk_N",
                          small_input_bytes=small_input_bytes)
    rank, total = F.col("_rk_r"), F.col("_rk_N")
    return (r.withColumn(tile_col, _ntile_of(rank, total, n))
            .withColumn(pr_col,
                        F.when(total > 1, (rank - 1) / (total - 1))
                        .otherwise(F.lit(0.0)))
            .drop("_rk_r", "_rk_N"))
