"""Corpus curation pipeline: the end-to-end composition the engine is
for — quality filtering, exact dedup, MinHash near-dedup, and corpus
stats as ONE lazy Spark plan.

Composition is deliberately pure DataFrame-to-DataFrame so Catalyst
sees the whole pipeline at once: the quality filter pushes into the
parquet scan, exact dedup's fingerprint group-by shrinks the corpus
before the (more expensive) near-dup stage, and nothing materializes
until the sink.

Deterministic survivor rule (SQL-expressible, hence oracle-checkable):
- exact stage: keep the smallest doc_id of each identical-text group;
- near-dup stage: drop a doc iff it is the LARGER id of some pair with
  Jaccard >= threshold (so the smallest member of every near-dup
  cluster always survives; a chain a~b~c keeps only a).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup
from .text import bpe_token_count, token_count


def curate_corpus(df: DataFrame, min_tokens: int = 20,
                  near_threshold: float = 0.8,
                  text_col: str = "text",
                  id_col: str = "doc_id",
                  band_widths: list[int] | None = None) -> DataFrame:
    """Curated corpus: rows of ``df`` that survive quality filtering,
    exact dedup, and near-dedup; adds n_tokens / n_bpe_tokens columns.

    Stages (all one lazy plan):
    1. quality: at least ``min_tokens`` whitespace tokens;
    2. exact dedup: min doc_id per md5(text) group survives;
    3. near-dedup: MinHash+LSH candidate pairs verified at
       ``near_threshold`` exact Jaccard; the larger id of each
       surviving pair is dropped (left anti join — no shuffle larger
       than the near-dup pair set). ``band_widths`` sizes the banding
       for large corpora (dedup.adaptive_minhash_bands over the input
       row count, r8) — pass it so the operator bands IDENTICALLY to
       the workload oracle's banded replica.

    The token budgets are computed ONCE in the head projection (fused
    into the scan stage) and carried as two long columns, instead of
    re-running the count regexes on the survivors after the dedup
    joins — at sf10 those per-document regex passes were the dominant
    pipeline_stats stage (r6 scale probe), and 16 bytes/row through
    the id-keyed shuffles is noise next to the text column that rides
    them anyway. The quality filter compares the precomputed column,
    which Catalyst still collapses into the scan-side projection."""
    base = df.select(
        F.col(id_col), F.col(text_col),
        token_count(text_col).cast("long").alias("n_tokens"),
        bpe_token_count(text_col).cast("long").alias("n_bpe_tokens"))
    q = base.filter(F.col("n_tokens") >= min_tokens)

    keep_exact = (q.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
                  .groupBy("fp").agg(F.min(id_col).alias(id_col))
                  .select(id_col))
    uniq = q.join(keep_exact, id_col, "semi")

    pairs = dedup.minhash_lsh_dedup(uniq, threshold=near_threshold,
                                    text_col=text_col, id_col=id_col,
                                    band_widths=band_widths)
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    kept = uniq.join(losers, id_col, "anti")

    return kept.select(id_col, text_col, "n_tokens", "n_bpe_tokens")


def corpus_stats(curated: DataFrame) -> DataFrame:
    """One-row summary of a curated corpus (the training-budget view)."""
    return curated.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        F.round(F.avg("n_tokens"), 2).alias("avg_tokens"))


def curate_v2(df: DataFrame, min_words: int = 30,
              min_stop_hits: int = 2,
              splits: dict[str, float] | None = None,
              split_seed: str = "split1",
              quota_n: int = 5, quota_seed: str = "quota2",
              text_col: str = "text", id_col: str = "doc_id",
              source_col: str = "source") -> DataFrame:
    """Round-2 curation pipeline, still ONE lazy plan:

    1. Gopher-rule quality gate (clean.gopher_quality, all five rules);
    2. PII scrubbing of the surviving text (clean.pii_scrub);
    3. exact dedup on the SCRUBBED text (min id per fingerprint — two
       docs differing only in PII are duplicates after redaction);
    4. deterministic train/val/test assignment (sample.assign_splits);
    5. per-(split, source) quota capping (sample.quota_cap), so no
       source floods any split.

    Output: one row per surviving doc with (doc_id, source, split, wc).
    Every stage is a projection, a partial-aggregated group-by, or a
    group-limit — the whole pipeline shuffles fingerprints, ids, and
    counts, never full text (the scrubbed text column is pruned away
    by Catalyst before any exchange)."""
    from . import clean
    from .sample import assign_splits, quota_cap

    g = (clean.gopher_quality(df, text_col=text_col, min_words=min_words,
                              min_stop_hits=min_stop_hits)
         .filter(F.col("gopher_pass")))
    scrubbed = g.withColumn(text_col, clean.pii_scrub(text_col))
    keep = (scrubbed
            .select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
            .groupBy("fp").agg(F.min(id_col).alias(id_col))
            .select(id_col))
    uniq = scrubbed.join(keep, id_col, "semi")
    sp = assign_splits(uniq,
                       splits or {"train": 0.9, "val": 0.05, "test": 0.05},
                       key_col=id_col, seed=split_seed)
    sp = sp.withColumn("__stratum",
                       F.concat_ws("|", F.col("split"), F.col(source_col)))
    capped = quota_cap(sp, "__stratum", quota_n, key_col=id_col,
                       seed=quota_seed)
    return capped.select(id_col, source_col, "split", "wc")


def curate_v2_stats(curated: DataFrame) -> DataFrame:
    """Per-(split, source) corpus composition of a curate_v2 output."""
    return (curated.groupBy("split", "source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("wc").cast("long").alias("total_tokens")))
