"""Bucketed catalog tables: co-located, shuffle-free joins.

At 100 TB the single biggest join cost is the shuffle of the fact
table(s). Bucketing pre-partitions data on disk by hash(key) %
n_buckets at WRITE time, so a join of two tables bucketed on the same
key with the same bucket count reads co-located partitions and skips
the exchange entirely — the shuffle is paid once at ingest instead of
once per query. Sorting within buckets additionally removes the
sort-merge-join's per-query sort.

Bucketed writes must go through the session catalog (``saveAsTable``) —
path-based parquet has nowhere to record bucket metadata. The catalog
is Spark's in-memory/derby one here; on a cluster it would be the
metastore, same API.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_TABLE_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a parquet catalog table bucketed by
    ``bucket_cols`` into ``n_buckets`` buckets; ``sort_cols`` (default:
    the bucket columns) sorts within each bucket file so sort-merge
    joins skip their sort stage too. Pick n_buckets so one bucket of
    the table fits an executor's memory (the bucket count is fixed for
    the table's lifetime — size for the table's target scale, not
    today's)."""
    if not _TABLE_RE.match(table):
        # the name is interpolated into SQL and into a filesystem path
        # that gets rmtree'd on overwrite — reject anything that isn't
        # a plain identifier before it can reach either
        raise ValueError(f"invalid table name {table!r}: must match "
                         f"{_TABLE_RE.pattern}")
    if mode == "overwrite":
        # the session catalog here is in-memory: a table written by a
        # previous process is gone from the catalog but its managed
        # location survives in the warehouse dir, and saveAsTable then
        # fails with LOCATION_ALREADY_EXISTS — drop both first (a real
        # metastore wouldn't have the orphan; same API either way)
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        loc = os.path.join(wh.removeprefix("file:"), table.lower())
        if wh.startswith(("file:", "/")) and os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    (df.write.mode(mode)
     .bucketBy(n_buckets, *bucket_cols)
     .sortBy(*(sort_cols or bucket_cols))
     .format("parquet")
     .saveAsTable(table))


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; Catalyst sees the bucket spec and
    plans exchanges only when the join key doesn't match it."""
    return spark.table(table)
