"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023).

The modern pretraining-data selector: score every raw-pool document by
how much its hashed-n-gram distribution looks like a TARGET domain
(the importance weight of a bag-of-hashed-grams bigram model), then
keep the top of the pool. This is the method behind domain-targeted
corpus construction at 100 TB scale — cheap enough to run over the
whole crawl (two linear passes, no embeddings, no model), principled
enough to beat heuristic filters (the paper's GLUE results).

This is a superset module — the reference engine at /root/reference
has no data-selection surface; built for the training-data-pipeline
north star.

Scale shape: documents reduce to a hashed (id, bucket) gram stream
(unigrams + bigrams, MD5-bucketed — engine-portable, oracle-checkable).
The raw-pool and target-side bucket histograms are bucket-count-sized
group-bys (map-side partial aggregation collapses every partition to
<= n_buckets rows); the per-bucket log-likelihood-ratio table is tiny
and BROADCAST back onto the gram stream; the per-document weight is
one (id)-keyed aggregation. Two corpus scans (the histogram pass and
the weighting pass share the persisted gram stream when it fits; the
stream recomputes map-side otherwise), two bounded shuffles
(n_buckets keys; id keys), no Python, no windows on the hot path.

Cross-engine determinism: per-bucket log-ratios are floored to 1e-9
and carried as BIGINTs, so the per-document accumulation is exact
integer arithmetic — summation ORDER cannot perturb the result (the
same trick corpus_datacard uses for stopword mass). The only float op
per document is one final division, which is IEEE-identical on both
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import cache
from .text import gram_concat, gram_stream, word_hash

DEFAULT_BUCKETS = 512
DEFAULT_ALPHA = 0.5  # add-alpha smoothing of both histograms


def hashed_gram_buckets(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """The DSIR feature stream: one ``(id, bkt)`` row per word unigram
    AND bigram occurrence, bucketed by the engine-portable 60-bit MD5
    hash mod ``n_buckets`` (Xie et al. use hashed uni+bigrams; the
    hash collision is part of the model, not an error). Duplicates are
    kept — the weight is a sum over gram OCCURRENCES. Map-side except
    the one (id)-keyed window exchange inside the bigram stream."""
    uni = (gram_stream(df, 1, text_col, id_col)
           .select("id", F.col("t0").alias("g")))
    bi = (gram_stream(df, 2, text_col, id_col)
          .select("id", gram_concat(2).alias("g")))
    return (uni.unionByName(bi)
            .select("id", (word_hash(F.col("g")) % n_buckets).alias("bkt")))


def _log_ratio_table(raw_bkts: DataFrame, tgt_bkts: DataFrame,
                     n_buckets: int, alpha: float) -> DataFrame:
    """Per-bucket smoothed log-likelihood ratio
    ``lam = ln(c_tgt + a) - ln(T + a*B) - ln(c_raw + a) + ln(R + a*B)``
    floored to 1e-9 and scaled to a BIGINT (``lam_e9``). Both
    histograms are n_buckets-row aggregates; the totals ride in as
    1-row broadcast crossJoins (the pmi_collocations shape). Buckets
    the raw pool never hits are absent — a gram hashing there exists
    in no document, so the rows cannot be consumed downstream."""
    c_raw = raw_bkts.groupBy("bkt").agg(F.count("*").alias("c_raw"))
    c_tgt = tgt_bkts.groupBy("bkt").agg(F.count("*").alias("c_tgt"))
    r_tot = c_raw.agg(F.sum("c_raw").alias("r"))
    t_tot = c_tgt.agg(F.sum("c_tgt").alias("t"))
    joined = (c_raw.join(c_tgt, "bkt", "left")
              .na.fill({"c_tgt": 0})
              .crossJoin(F.broadcast(r_tot))
              .crossJoin(F.broadcast(t_tot)))
    ab = float(alpha) * n_buckets
    # ln-difference form, term order mirrored in the SQL oracle
    lam = (F.log(F.col("c_tgt").cast("double") + alpha)
           - F.log(F.col("t").cast("double") + ab)
           - F.log(F.col("c_raw").cast("double") + alpha)
           + F.log(F.col("r").cast("double") + ab))
    return joined.select(
        "bkt", F.floor(lam * 1_000_000_000).alias("lam_e9"))


def dsir_weights(df: DataFrame, target: Column,
                 n_buckets: int = DEFAULT_BUCKETS,
                 alpha: float = DEFAULT_ALPHA,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document DSIR importance weight against the in-pool target
    domain ``target`` (a boolean predicate over ``df``'s columns):
    ``(id, n_grams, wgt)`` where ``wgt`` is the mean per-gram
    log-likelihood ratio between the target and raw hashed-gram
    bigram models, floored to 6 decimals. Positive = looks more like
    the target domain than the pool average. The per-gram mean (the
    paper scores fixed-length chunks; a raw sum over variable-length
    documents is just a length detector) keeps magnitudes comparable
    across lengths.

    Documents with no tokens produce no gram rows and are absent from
    the output — no weight is defensible for empty content.

    The gram stream feeds both the histogram pass and the weighting
    pass, so it persists (cache-module contract); eviction only costs
    a recompute. The lam table is ``n_buckets`` rows and broadcast —
    the weighting pass is scan + broadcast-hash-join + one (id)-keyed
    aggregation of 16-byte rows."""
    bkts = cache.persist(hashed_gram_buckets(df, n_buckets,
                                             text_col, id_col))
    tgt_ids = df.filter(target).select(F.col(id_col).alias("id"))
    # target histogram over the SAME persisted stream: broadcast the
    # target-id set is wrong at scale (it is a fraction of the corpus),
    # but a semi join on the stream's existing id keying is one
    # co-partitioned shuffle of (id) rows
    tgt_bkts = bkts.join(tgt_ids, "id", "left_semi")
    lam = _log_ratio_table(bkts, tgt_bkts, n_buckets, alpha)
    per_doc = (bkts.join(F.broadcast(lam), "bkt")
               .groupBy("id")
               .agg(F.count("*").alias("n_grams"),
                    F.sum("lam_e9").alias("s_e9")))
    wgt = F.floor(F.col("s_e9").cast("double")
                  / F.col("n_grams") / 1000.0) / 1_000_000
    return per_doc.select("id", "n_grams", wgt.alias("wgt"))


def dsir_select(df: DataFrame, target: Column, k: int,
                n_buckets: int = DEFAULT_BUCKETS,
                alpha: float = DEFAULT_ALPHA,
                text_col: str = "text",
                id_col: str = "doc_id",
                carry_cols: list[str] | None = None) -> DataFrame:
    """Top-``k`` raw-pool documents by DSIR weight (the resampling
    step, deterministic variant: highest weights win, doc id breaks
    ties — the Gumbel-noise variant adds a content-hash perturbation,
    which this corpus-sized k does not need). ``carry_cols`` ride
    along for reporting. The rank window is unpartitioned but
    Catalyst's group-limit rewrite bounds it to k rows (the
    pmi_collocations shape)."""
    from pyspark.sql import Window

    w = dsir_weights(df, target, n_buckets, alpha, text_col, id_col)
    carry = carry_cols or []
    meta = df.select(F.col(id_col).alias("id"), *carry)
    wr = Window.orderBy(F.col("wgt").desc(), F.col("id").asc())
    # filter on the RAW int rank — InferWindowGroupLimit's pattern
    # match needs the comparison directly on the window attribute, a
    # cast in between leaves the full table in the window (r8 plan
    # test); the long cast for the cross-engine contract comes after
    ranked = (w.join(meta, "id")
              .select("id", *carry, "n_grams", "wgt",
                      F.row_number().over(wr).alias("rank"))
              .filter(F.col("rank") <= k))
    return ranked.withColumn("rank", F.col("rank").cast("long"))
