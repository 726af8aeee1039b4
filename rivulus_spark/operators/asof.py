"""As-of (point-in-time) join — a time-series primitive Spark has no
built-in operator for.

For each left row, attach the value columns of the LATEST right row of
the same key with ``right.on <= left.on`` (backward as-of). Classic
uses: attach the most recent quote to a trade, the last heartbeat to an
event, the prior page-view to a purchase.

Implementation is the union + carry-forward-window formulation, which
is the scale-correct one: tag both inputs, union them, and run one
``last(value, ignorenulls=True)`` window per key ordered by
(time, side) so right rows at identical timestamps sort before left
rows (<= semantics). Exactly ONE shuffle on the key — never a range
cross-join, never a per-key Python loop — and the window state is one
row (the current carried value), so it streams through each partition.
A naive range join would be O(|L| * |R|) per key; this is
O((|L|+|R|) log) for the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: list[str], value_cols: list[str] | None = None) -> DataFrame:
    """Backward as-of join: left columns + right ``value_cols`` (null
    when the key has no right row at or before the left row's ``on``).

    ``on`` must be mutually comparable across inputs (timestamp or
    numeric). Right rows tie-break AHEAD of left rows at equal ``on``,
    i.e. the match condition is ``right.on <= left.on``. If several
    right rows share (by, on), pre-aggregate the right side first (e.g.
    ``max_by``) — which one carries is otherwise unspecified.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c != on and c not in by]
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right value columns collide with left columns: {sorted(overlap)}")

    rv = F.struct(*[F.col(c) for c in value_cols]).alias("__rv")
    rtag = right.select(*by, F.col(on), F.lit(0).alias("__side"), rv)
    rv_type = rtag.schema["__rv"].dataType
    left_extra = [c for c in left.columns if c != on and c not in by]
    ltag = left.select(*by, F.col(on), F.lit(1).alias("__side"),
                       F.lit(None).cast(rv_type).alias("__rv"), *left_extra)
    # right rows carry no left-extra columns
    rtag = rtag.select(*by, on, "__side", "__rv",
                       *[F.lit(None).cast(ltag.schema[c].dataType).alias(c)
                         for c in left_extra])

    w = (Window.partitionBy(*by).orderBy(F.col(on), F.col("__side"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = (ltag.unionByName(rtag)
              .withColumn("__m", F.last("__rv", ignorenulls=True).over(w)))
    return (merged.filter(F.col("__side") == 1)
            .select(*by, on, *left_extra,
                    *[F.col("__m")[c].alias(c) for c in value_cols]))


def range_join(left: DataFrame, right: DataFrame, by: list[str],
               left_on: str, right_on: str,
               lower: int, upper: int) -> DataFrame:
    """Banded range join: all (left, right) pairs with matching ``by``
    keys and ``right_on`` in ``[left_on + lower, left_on + upper]``
    (inclusive; ``on`` columns are numeric, e.g. unix micros).

    Expressed naively this is an inequality join, which Spark can only
    execute as a nested-loop per key — O(|L|*|R|) and the classic 100 TB
    cliff. Instead both sides are bucketed by ``width = upper - lower``:
    a right row lands in bucket floor(right_on / width); a qualifying
    pair's right row can only be in the two buckets covering
    [left_on+lower, left_on+upper], so the left side explodes into
    exactly those (<=2) buckets and the join becomes a hash-partitioned
    EQUI-join on (by..., bucket), with the exact range predicate applied
    post-join. Shuffle volume is 2|L| + |R| rows — linear, skew-safe
    under AQE, no nested loop anywhere.

    Output: all left columns plus the right side's non-key columns
    (collisions suffixed ``_right``).
    """
    if upper <= lower:
        raise ValueError(f"empty range: lower={lower}, upper={upper}")
    width = upper - lower

    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    def _bucket(x: Column, integral: bool) -> Column:
        if integral:
            # exact int64 floor division: x - pmod(x, w) is exactly
            # divisible, so truncating `div` equals floor — the
            # double-division F.floor(x / w) shifts bucket boundaries
            # for |x| >= 2^53 (unix NANOS), which can put bucket(hi)
            # two past bucket(lo) and silently drop qualifying pairs
            # in the skipped middle bucket
            return F.call_function(
                "div", x - F.pmod(x, F.lit(width)), F.lit(width))
        return F.floor(x / F.lit(width))

    _int_types = (ByteType, ShortType, IntegerType, LongType)
    l_int = isinstance(left.schema[left_on].dataType, _int_types)
    r_int = isinstance(right.schema[right_on].dataType, _int_types)
    lo = F.col(left_on) + F.lit(lower)
    hi = F.col(left_on) + F.lit(upper)
    lbuckets = F.array_distinct(F.array(
        _bucket(lo, l_int), _bucket(hi, l_int)))
    l = left.withColumn("__bkt", F.explode(lbuckets))
    r = right.withColumn("__bkt", _bucket(F.col(right_on), r_int))
    rename = {c: f"{c}_right" for c in right.columns
              if c in left.columns and c not in by}
    r = r.withColumnsRenamed(rename)
    r_on = rename.get(right_on, right_on)
    out = l.alias("l").join(
        r.alias("r"),
        _and_all([F.col(f"l.{k}") == F.col(f"r.{k}") for k in by]
                 + [F.col("l.__bkt") == F.col("r.__bkt")]))
    out = out.filter((F.col(f"r.{r_on}") >= F.col(f"l.{left_on}") + F.lit(lower))
                     & (F.col(f"r.{r_on}") <= F.col(f"l.{left_on}") + F.lit(upper)))
    lcols = [F.col(f"l.{c}") for c in left.columns if c != "__bkt"]
    rcols = [F.col(f"r.{c}").alias(c) for c in r.columns
             if c not in by and c != "__bkt"]
    return out.select(*lcols, *rcols)


def _and_all(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out
