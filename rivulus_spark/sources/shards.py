"""Deterministic shard export: the last step of a curation pipeline.

Training jobs consume a corpus as N equal-ish shards with a stable
doc→shard mapping (so a re-run after adding one file doesn't reshuffle
every example into a different shard, which would break resumable
data loaders and per-shard caching). This sink:

- assigns ``shard = pmod(id, n_shards)`` — pure arithmetic on a stable
  id, reproducible in any engine (and in the DuckDB oracle), unlike
  ``spark_partition_id`` or Spark's internal hash;
- repartitions BY THE SHARD VALUE so each shard is written by exactly
  one task → exactly one file per shard directory (atomic per-shard
  replacement downstream);
- sorts within each shard by id so shard files are deterministic
  byte-for-byte given deterministic input (stable for content hashing
  / caching layers);
- lays shards out hive-style (``shard=k/``) so a loader reading shard
  k lists one directory.

At 100 TB pick ``n_shards`` ≈ corpus_bytes / desired_shard_bytes
(thousands), far above any single-task memory; the repartition is the
one shuffle this export pays, and it replaces the random-ordered
many-files-per-shard layout a plain ``partitionBy`` write would give.

Reference parity: the reference has no write path at all (SURVEY §2);
this is a north-star training-pipeline superset operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_shards(df: DataFrame, path: str, n_shards: int,
                  id_col: str = "doc_id",
                  mode: str = "overwrite") -> None:
    """Write ``df`` as ``n_shards`` hive-partitioned, internally
    sorted, one-file-per-shard parquet shards keyed on ``id_col``."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    out = df.withColumn("shard", F.pmod(F.col(id_col), F.lit(n_shards))
                        .cast("long"))
    (out.repartition(n_shards, F.col("shard"))
     .sortWithinPartitions("shard", id_col)
     .write.mode(mode).partitionBy("shard").parquet(path))


def shard_manifest(spark: SparkSession, path: str,
                   id_col: str = "doc_id") -> DataFrame:
    """Read the shard layout back and summarize it: one row per shard
    with row count and id range — the manifest a data loader checks
    before training (and the oracle-checkable observable of the
    export)."""
    back = spark.read.parquet(path)
    return (back.groupBy(F.col("shard").cast("long").alias("shard"))
            .agg(F.count("*").alias("n_rows"),
                 F.min(id_col).alias("min_id"),
                 F.max(id_col).alias("max_id")))
