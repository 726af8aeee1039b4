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
one (id)-keyed aggregation. Two gram-stream scans (one conditional
histogram pass over a target-flagged stream; one weighting pass), two
bounded shuffles (n_buckets keys; id keys), no corpus-sized persist
or join, no Python.

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

from .text import gram_concat, gram_stream, word_hash

DEFAULT_BUCKETS = 512
DEFAULT_ALPHA = 0.5  # add-alpha smoothing of both histograms


def hashed_gram_buckets(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        carry_cols: list[str] | None = None) -> DataFrame:
    """The DSIR feature stream: one ``(id, bkt)`` row per word unigram
    AND bigram occurrence, bucketed by the engine-portable 60-bit MD5
    hash mod ``n_buckets`` (Xie et al. use hashed uni+bigrams; the
    hash collision is part of the model, not an error). Duplicates are
    kept — the weight is a sum over gram OCCURRENCES. ``carry_cols``
    are per-document constants riding along (gram_stream contract).
    Map-side except the one (id)-keyed window exchange inside the
    bigram stream."""
    carry = carry_cols or []
    uni = (gram_stream(df, 1, text_col, id_col, carry)
           .select("id", *carry, F.col("t0").alias("g")))
    bi = (gram_stream(df, 2, text_col, id_col, carry)
          .select("id", *carry, gram_concat(2).alias("g")))
    return (uni.unionByName(bi)
            .select("id", *carry,
                    (word_hash(F.col("g")) % n_buckets).alias("bkt")))


def _log_ratio_table(flagged_bkts: DataFrame,
                     n_buckets: int, alpha: float) -> DataFrame:
    """Per-bucket smoothed log-likelihood ratio
    ``lam = ln(c_tgt + a) - ln(T + a*B) - ln(c_raw + a) + ln(R + a*B)``
    floored to 1e-9 and scaled to a BIGINT (``lam_e9``). BOTH
    histograms come out of ONE conditional aggregation over the
    flagged stream (count + count-if on the ``__tgt`` carry flag) —
    an n_buckets-row table; the totals ride in as a 1-row broadcast
    crossJoin (the pmi_collocations shape). Buckets the raw pool
    never hits are absent — a gram hashing there exists in no
    document, so the rows cannot be consumed downstream."""
    # coalesce the flag: a NULL target predicate (NULL domain column)
    # must count as not-target, not poison the bucket — an all-NULL
    # group's SUM is NULL, which would corrupt lam for that bucket and
    # crash dsir_model's int() on collect (r8 review)
    hist = (flagged_bkts.groupBy("bkt")
            .agg(F.count("*").alias("c_raw"),
                 F.sum(F.coalesce(F.col("__tgt").cast("long"),
                                  F.lit(0))).alias("c_tgt")))
    tot = hist.agg(F.sum("c_raw").alias("r"), F.sum("c_tgt").alias("t"))
    joined = hist.crossJoin(F.broadcast(tot))
    ab = float(alpha) * n_buckets
    # ln-difference form, term order mirrored in the SQL oracle
    lam = (F.log(F.col("c_tgt").cast("double") + alpha)
           - F.log(F.col("t").cast("double") + ab)
           - F.log(F.col("c_raw").cast("double") + alpha)
           + F.log(F.col("r").cast("double") + ab))
    # r/t ride along (constant per row) so a one-job collect can hand
    # the serving path its totals; batch consumers project them away
    return joined.select(
        "bkt", F.floor(lam * 1_000_000_000).alias("lam_e9"), "r", "t")


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

    TWO gram-stream scans — the paper's "two linear passes", literally —
    and NO corpus-sized materialization or join: both histograms fold
    into ONE conditional aggregation over a stream that carries the
    per-doc target flag (count / count-if per bucket), and the
    weighting pass recomputes the stream rather than persisting it
    (the pmi_collocations trade). Measured across the r8 rewrites at
    sf1/sf10: persist + target-id semi-join 5.4s/59.3s (the 2.4 GB
    cache churn plus the 150M-row id shuffle were the whole overage);
    three scans with a filtered target pass 8.3s/15.0s; this
    two-scan flagged form 3.7s/13.9s — fastest at BOTH decades.
    The lam table is ``n_buckets`` rows and broadcast — the weighting
    pass is scan + broadcast-hash-join + one (id)-keyed aggregation
    of 16-byte rows."""
    flagged = df.withColumn("__tgt", target)
    flagged_bkts = hashed_gram_buckets(flagged, n_buckets, text_col,
                                       id_col, carry_cols=["__tgt"])
    lam = _log_ratio_table(flagged_bkts, n_buckets, alpha)
    # the weighting pass IS the serving pass with a freshly-fitted
    # model — one implementation (r8 review: the weight formula is a
    # three-path bit-equality contract; it must live in ONE place)
    return dsir_batch_scores(df, lam, n_buckets, text_col, id_col)


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


def dsir_weight_expr(lam_rows: list[tuple[int, int]],
                     default_lam_e9: int,
                     n_buckets: int = DEFAULT_BUCKETS,
                     text_col: str = "text") -> Column:
    """ROW-LOCAL DSIR weight — the in-stream serving form: the offline
    ``_log_ratio_table`` collects to ``lam_rows`` (a bucket->lam_e9
    list, <= n_buckets entries — a k-row driver barrier like the
    logreg weights) and rides into any projection as a dense array
    literal, so scoring is stateless and shuffle-free: grams via the
    array-transform path (tokens + text.ngrams — row-local, no lead
    window, which a streaming plan could not host anyway), bucket
    lookup by index in the literal, exact-integer accumulation via
    F.aggregate over BIGINTs, one final division. Produces the SAME
    weight as :func:`dsir_weights` on the same document — the
    integer-lam contract makes the two paths bit-equal, which is what
    lets the stream query share the batch oracle.

    ``default_lam_e9`` fills buckets the offline pool never hit
    (impossible on a replayed corpus, expected on live data): pass
    ``floor((ln(a) - ln(T+aB) - ln(a) + ln(R+aB)) * 1e9)`` — the
    smoothed ratio at c_tgt = c_raw = 0.

    The table ships as ONE dense ArrayType literal indexed by bucket,
    not a 2*n_buckets-node CreateMap: a single Literal is one
    constant reference in generated code where the node-per-entry
    form bloats every micro-batch's codegen (measured at sf0.01:
    0.79s vs 1.19s warm for the same 500-doc scoring)."""
    from .text import ngrams, tokens

    dense = [int(default_lam_e9)] * n_buckets
    for bkt, lam in lam_rows:
        dense[bkt] = int(lam)
    arr = F.lit(dense)
    c = F.col(text_col)
    grams = F.concat(tokens(c), ngrams(c, 2))
    lams = F.transform(
        grams,
        lambda g: F.element_at(
            arr, (word_hash(g) % n_buckets + 1).cast("int")))
    s_e9 = F.aggregate(lams, F.lit(0).cast("long"), lambda a, x: a + x)
    return (F.floor(s_e9.cast("double") / F.size(grams) / 1000.0)
            / 1_000_000)


def dsir_model(df: DataFrame, target: Column,
               n_buckets: int = DEFAULT_BUCKETS,
               alpha: float = DEFAULT_ALPHA,
               text_col: str = "text",
               id_col: str = "doc_id") -> tuple[list[tuple[int, int]], int]:
    """The offline fit for in-stream serving: ONE histogram job over
    the flagged gram stream, collected as ``(lam_rows,
    default_lam_e9)`` for :func:`dsir_weight_expr`. The collect is an
    <= n_buckets-row driver barrier (the logreg-weights shape). The
    default is the smoothed ratio at c_tgt = c_raw = 0, computed
    driver-side with the same formula — it only ever applies to
    grams the offline pool never produced (live data), never to a
    replayed corpus, so the libm-vs-JVM ln seam cannot reach any
    oracle-checked row."""
    import math

    flagged = df.withColumn("__tgt", target)
    fb = hashed_gram_buckets(flagged, n_buckets, text_col, id_col,
                             carry_cols=["__tgt"])
    rows = _log_ratio_table(fb, n_buckets, alpha).collect()
    lam_rows = [(r["bkt"], r["lam_e9"]) for r in rows]
    ab = alpha * n_buckets
    r_tot, t_tot = (float(rows[0]["r"]), float(rows[0]["t"])) \
        if rows else (0.0, 0.0)
    default = math.floor(
        (math.log(alpha) - math.log(t_tot + ab)
         - math.log(alpha) + math.log(r_tot + ab)) * 1_000_000_000)
    return lam_rows, default


def dsir_batch_scores(bdf: DataFrame, lam_df: DataFrame,
                      n_buckets: int = DEFAULT_BUCKETS,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Score a (micro-)batch against an already-FITTED lam table:
    ``(id, n_grams, wgt)`` — :func:`dsir_weights`' weighting pass
    alone, with the model supplied instead of refit. This is the
    foreachBatch serving form: the gram stream and the bucket join
    run under whole-stage codegen, where the row-local
    :func:`dsir_weight_expr` evaluates its higher-order functions
    interpreted per element (measured on the stream bench at sf1:
    46.0s row-local vs 8.5s through this path; first-decade ratios
    8.2x vs 1.6x). ``lam_df`` must carry (bkt, lam_e9)
    covering every bucket the batch can hit — pad with the
    :func:`dsir_model` default for live data."""
    bkts = hashed_gram_buckets(bdf, n_buckets, text_col, id_col)
    per_doc = (bkts.join(F.broadcast(lam_df.select("bkt", "lam_e9")),
                         "bkt")
               .groupBy("id")
               .agg(F.count("*").alias("n_grams"),
                    F.sum("lam_e9").alias("s_e9")))
    wgt = F.floor(F.col("s_e9").cast("double")
                  / F.col("n_grams") / 1000.0) / 1_000_000
    return per_doc.select("id", "n_grams", wgt.alias("wgt"))
