"""Partition-shape helpers.

``spread`` fixes the small-input serialization trap: a parquet file
with one row group scans as ONE task no matter how many cores exist,
so any expression-heavy projection chained on the scan (higher-order
array folds, wide regex batteries) runs serially. At real scale inputs
have many row groups/files and the scan parallelizes itself — so
``spread`` is a no-op there (guarded on the actual scan partition
count) and only pays its (tiny, input-sized) round-robin shuffle when
the input genuinely under-splits the machine.

This is deliberately NOT applied everywhere: scan->filter->aggregate
plans hit an exchange immediately anyway, and an unconditional
repartition of a 100 TB scan would be a catastrophic extra shuffle.
Use it only in operators whose per-row compute dominates their first
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff its
    current plan yields fewer partitions than that (e.g. a single-row-
    group parquet file). No-op on well-split inputs."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
