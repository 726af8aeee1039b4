"""Dataset snapshot diffing: what changed between two corpus releases.

Training-data pipelines re-curate continuously (new crawl dumps,
filter-rule changes, dedup threshold bumps); before a release ships,
the operative audit is the DIFF against the previous snapshot — how
many documents appeared, vanished, or changed content, and where. This
is a superset module (the reference engine at /root/reference has no
multi-table surface beyond join); built for the 100 TB use case.

Scale shape: each snapshot reduces to (id, fingerprint [, dims]) at
the scan — the full-outer join shuffles 16-byte MD5s plus ids, never
document text; status classification is a pure projection over the
joined row; release-level reporting is a partial-aggregated group-by.
One shuffle each side, no windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dataset_diff(old: DataFrame, new: DataFrame,
                 id_col: str = "doc_id",
                 fingerprint: Column | str = "text",
                 carry_cols: list[str] | None = None) -> DataFrame:
    """Per-document diff of two snapshots: one row per id present in
    EITHER snapshot with ``status`` in
    ``added | removed | changed | unchanged`` — 'changed' means the id
    exists in both but the fingerprint differs (MD5 of ``fingerprint``
    when given as a column name; pass a Column for a composite, e.g.
    ``F.concat_ws('|', 'text', 'lang')``). ``carry_cols`` ride along
    for reporting (taken from the NEW side, falling back to the old
    side for removed docs)."""
    fp = (F.col(fingerprint) if isinstance(fingerprint, str)
          else fingerprint)
    carry = carry_cols or []

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.md5(fp.cast("string")).alias(f"__fp_{tag}"),
            *[F.col(c).alias(f"__{tag}_{c}") for c in carry],
            F.lit(True).alias(f"__in_{tag}"))

    o, n = side(old, "old"), side(new, "new")
    j = o.join(n, id_col, "full_outer")
    status = (F.when(F.col("__in_old").isNull(), F.lit("added"))
              .when(F.col("__in_new").isNull(), F.lit("removed"))
              .when(F.col("__fp_old") != F.col("__fp_new"),
                    F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    out_carry = [F.coalesce(F.col(f"__new_{c}"), F.col(f"__old_{c}"))
                 .alias(c) for c in carry]
    return j.select(F.col(id_col), status.alias("status"), *out_carry)


def diff_report(old: DataFrame, new: DataFrame,
                id_col: str = "doc_id",
                fingerprint: Column | str = "text",
                by: list[str] | None = None) -> DataFrame:
    """Release-level diff summary: (``by``..., status, n_docs) counts
    — the one-screen audit before a snapshot ships. ``by`` columns
    (e.g. source, lang) must exist in both snapshots; they ride the
    diff via carry_cols."""
    d = dataset_diff(old, new, id_col, fingerprint, carry_cols=by or [])
    return (d.groupBy(*(by or []), "status")
            .agg(F.count("*").alias("n_docs")))
