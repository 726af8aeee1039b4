"""Train/eval contamination detection.

Decontamination of a training corpus against held-out evaluation sets:
flag every training document that shares at least one word n-gram with
any eval document — the GPT-3/PaLM-style n-gram-overlap
decontamination pass a training pipeline runs before every data
release. This is a superset operator (the reference engine at
/root/reference has no text surface; its expression set is
src/expressions/expr.rs's 12 binary ops) built for the 100 TB
training-data use case.

Scale shape: both corpora reduce to distinct ``(id, shingle-hash)``
rows (codegen posexplode + lead window, see dedup.shingle_rows), so the
join shuffles 16-byte (hash, id) rows keyed on the 60-bit shingle hash
— never document text. The eval side is typically millions of times
smaller than the training side; Spark's AQE converts the join to a
broadcast at runtime when it fits, making the pass one training-corpus
scan. Overlap counts are partial-aggregated map-side. A universally
common shingle ("in the of") fans out, which is why real
decontamination uses k >= 8 grams — rare by construction; k is a
parameter here because the synthetic corpus is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_rows, word_hash


def contamination_report(train: DataFrame, eval_df: DataFrame,
                         k: int = 3, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, n_shared_ngrams, n_eval_docs)`` for every training
    document sharing at least one k-gram shingle with the eval set:
    how many distinct shingles leak and how many eval documents they
    touch. Downstream policy (drop / quarantine / report) is the
    caller's; the report is the expensive distributed part."""
    tr = (shingle_rows(train, text_col, id_col, k)
          .select(F.col("id").alias("t_id"),
                  word_hash(F.col("s")).alias("h")))
    ev = (shingle_rows(eval_df, text_col, id_col, k)
          .select(F.col("id").alias("e_id"),
                  word_hash(F.col("s")).alias("h")))
    return (tr.join(ev, "h")
            .groupBy("t_id")
            .agg(F.countDistinct("h").alias("n_shared_ngrams"),
                 F.countDistinct("e_id").alias("n_eval_docs"))
            .select(F.col("t_id").alias(id_col),
                    "n_shared_ngrams", "n_eval_docs"))
