"""JSONL (line-delimited JSON) source.

The reference engine reads CSV only (file_stream.rs); JSONL is the
lingua franca of LLM training corpora, so this source extends the same
contract north-star-ward: **schema is required** (a schema-inference
pre-scan reads the whole corpus twice — never acceptable at 100 TB),
one JSON object per line (splittable: Spark assigns newline-delimited
ranges to tasks, so a single 1 TB file still parallelizes), keys
missing from a line and JSON ``null`` both surface as SQL nulls, and
malformed lines land in an optional ``corrupt_col`` instead of failing
the job (PERMISSIVE mode — at corpus scale a handful of broken lines
must not kill a 1000-executor read).

Spark-first: this is the built-in distributed JSON scanner — JVM-side
Jackson parsing, column pruning (only schema'd keys are materialized),
and predicate pushdown where the format allows. No Python touches the
bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import DataType, struct_type


def read_jsonl(spark: SparkSession, path: str,
               schema: list[tuple[str, DataType]] | dict[str, DataType],
               corrupt_col: str | None = None) -> DataFrame:
    """Distributed scan of line-delimited JSON under the required
    schema. ``corrupt_col`` (if given) is appended as a string column
    holding the raw text of unparseable lines (null for good rows)."""
    items = list(schema.items()) if isinstance(schema, dict) else list(schema)
    scan_fields = list(items)
    if corrupt_col is not None:
        scan_fields.append((corrupt_col, DataType.STRING))
    reader = (spark.read
              .schema(struct_type(scan_fields))
              .option("mode", "PERMISSIVE")
              .option("multiLine", False))
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.json(path)
