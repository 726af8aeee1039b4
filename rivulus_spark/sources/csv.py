"""CSV source with the reference's parsing contract.

Contract mirrored from /root/reference/src/execution/file_stream.rs:59-150
(no code copied): schema is required, header row always skipped, custom
delimiter, empty-string and literal "null" cells parse as null, and
boolean cells accept true/t/1/false/f/0 (case-insensitive).

Spark-first implementation: the file is read with Spark's distributed CSV
scanner (splittable, predicate/column pruning capable). Boolean columns
are scanned as strings and mapped with a JVM-side CASE expression —
Spark's native boolean parser accepts only true/false, so the extended
token set is applied as a post-read projection, never a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import DataType, struct_type

_TRUE_TOKENS = ["true", "t", "1"]
_FALSE_TOKENS = ["false", "f", "0"]


def read_csv(spark: SparkSession, path: str,
             schema: list[tuple[str, DataType]] | dict[str, DataType],
             delimiter: str = ",") -> DataFrame:
    items = list(schema.items()) if isinstance(schema, dict) else list(schema)
    bool_cols = [n for n, dt in items if dt is DataType.BOOLEAN]
    # booleans scanned as strings so the extended token set can be mapped
    scan_fields = [(n, DataType.STRING if dt is DataType.BOOLEAN else dt)
                   for n, dt in items]
    df = (
        spark.read
        .schema(struct_type(scan_fields))
        .option("header", True)
        .option("sep", delimiter)
        .option("nullValue", "null")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    for c in bool_cols:
        lc = F.lower(F.trim(F.col(c)))
        df = df.withColumn(
            c,
            F.when(lc.isin(_TRUE_TOKENS), F.lit(True))
             .when(lc.isin(_FALSE_TOKENS), F.lit(False))
             .otherwise(F.lit(None).cast("boolean")),
        )
    return df
