"""Time-series resampling: dense per-key grids with gap filling.

Event tables are sparse — a (user, day) with no events simply has no
row — but models and dashboards want DENSE series (explicit zeros /
nulls for gaps). ``resample_daily`` builds the dense grid
relationally:

1. one tiny aggregate finds the global [min_date, max_date] span;
2. ``sequence()`` explodes it into a date spine (|days| rows);
3. the distinct key set cross-joins the broadcast spine — the grid is
   |keys| × |days|, the size the caller explicitly asked for by
   requesting a dense series;
4. the sparse per-(key, day) aggregate left-joins onto the grid and
   gaps fill with a constant.

Scale shape: the corpus is touched exactly twice (key set + sparse
aggregate, both partial-aggregated scans); the spine is always tiny
and broadcast, so the grid build is map-side; the final join shuffles
only (key, day) aggregate rows. Nothing scales with raw event count
except the two scans.

Reference: north-star superset (the reference has no date/time types
at all — SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def resample_daily(df: DataFrame, time_col: str, key_col: str,
                   aggs: list[Column],
                   fills: dict[str, Column | int | float] | None = None,
                   ) -> DataFrame:
    """Dense (key, day) grid over the table's full date span with the
    given aggregates; days with no rows for a key get the ``fills``
    value for each aggregate column (default: left-join nulls).
    Output: (key_col, day DATE, *agg columns).

    Scale shape: the corpus is scanned ONCE — the sparse (key, day)
    aggregate is persisted (it is bounded by keys x active days, tiny
    next to the event table) and the date bounds, key set, and dense
    grid all derive from it rather than re-scanning the source.

    Null keys: a null ``key_col`` groups into sparse but the grid join
    is null-unsafe (like the SQL oracle), so the null key's rows
    surface as fill values — filter null keys first if they carry
    real data."""
    from .. import cache

    d = df.withColumn("__d", F.to_date(time_col))
    sparse = cache.persist(
        d.groupBy(key_col, F.col("__d").alias("day")).agg(*aggs))
    bounds = sparse.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day"))
    keys = sparse.select(F.col(key_col)).distinct()
    grid = keys.crossJoin(F.broadcast(spine))
    out = grid.join(sparse, [key_col, "day"], "left")
    for name, fill in (fills or {}).items():
        c = fill if isinstance(fill, Column) else F.lit(fill)
        out = out.withColumn(name, F.coalesce(F.col(name), c))
    return out
