"""Skew-aware aggregation: two-stage salted group-by.

A straight ``groupBy(key)`` hash-partitions every row of a key onto ONE
reducer; at 100 TB a hot key (the empty document, a null user, a
bot account) turns into a straggler task that can be 1000x the median.
AQE's skew-join splitting does not help aggregations, so the classic
fix is salting:

  stage 1: groupBy(key, salt) with salt = hash(row) % n_salts —
           spreads each hot key over n_salts reducers and combines
           locally (partial aggregates shrink the shuffle too);
  stage 2: groupBy(key) re-combines the n_salts partials.

Both stages are plain Catalyst aggregations (codegen, map-side partial
combine); correctness needs each aggregate to be decomposable into a
partial + a merge, which count/sum/min/max are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: partial aggregate and its re-combiner for each supported op
_MERGE = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(df: DataFrame, keys: list[str],
               aggs: dict[str, tuple[str, str]],
               n_salts: int = 16) -> DataFrame:
    """Skew-resistant ``df.groupBy(*keys).agg(...)``.

    ``aggs`` maps output column name -> (op, input column), with op in
    {count, sum, min, max}; use input column "*" with count for row
    counts. Example::

        salted_agg(orders, ["o_custkey"],
                   {"n_orders": ("count", "*"),
                    "total_spend": ("sum", "o_totalprice")})

    produces the same rows as the direct group-by, but no reducer ever
    receives more than ~1/n_salts of a hot key's rows.
    """
    for name, (op, _) in aggs.items():
        if op not in _MERGE:
            raise ValueError(
                f"{name}: op must be one of {sorted(_MERGE)}, got {op!r}")
    salt = F.floor(F.rand(seed=0) * n_salts).cast("int")
    partial_exprs = []
    final_exprs = []
    for name, (op, src) in aggs.items():
        partial_fn, merge_fn = _MERGE[op]
        col = F.lit(1) if src == "*" else F.col(src)
        partial_exprs.append(partial_fn(col).alias(f"__p_{name}"))
        final_exprs.append(merge_fn(f"__p_{name}").alias(name))
    return (df.withColumn("__salt", salt)
            .groupBy(*keys, "__salt")
            .agg(*partial_exprs)
            .groupBy(*keys)
            .agg(*final_exprs))


def salted_join(big: DataFrame, small: DataFrame, big_key: str,
                small_key: str, n_salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: salt the big side's rows into
    ``n_salts`` sub-keys and replicate every small-side row once per
    salt, then join on (key, salt). A hot key's rows land on n_salts
    reducers instead of one; the price is an n_salts-times replication
    of the SMALL side only (keep it the dimension/lookup side).

    Prefer AQE's skew-join splitting when it applies (sort-merge joins
    it can see); this operator is for the cases it can't — e.g. the
    output of an exchange-free bucketed scan, or joins under a custom
    partitioner. Output columns: all of big's, then small's minus its
    key (the usual join contract without duplicated key columns)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.floor(F.rand(seed=0) * n_salts).cast("int")
    b = big.withColumn("__salt", salt)
    s = (small.withColumn("__salt",
                          F.explode(F.array(*[F.lit(i) for i in range(n_salts)])
                                    .cast("array<int>"))))
    cond = (b[big_key] == s[small_key]) & (b["__salt"] == s["__salt"])
    out = b.join(s, cond, how)
    keep = [b[c] for c in big.columns] + \
           [s[c] for c in small.columns if c != small_key]
    return out.select(*keep)
