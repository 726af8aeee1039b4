"""Statistical language-model quality scoring (char-bigram perplexity).

Heuristic quality flags (clean.py) catch structural junk; a statistical
score catches *unnatural text* — the CCNet/KenLM pattern where each
document is scored by a language model and the corpus is filtered or
bucketed by perplexity. A real KenLM needs external model files; the
same signal at engine level is an add-one-smoothed character-bigram
model **trained on the corpus itself in one aggregation** and applied
in one broadcast-join pass:

    score(doc) = mean_i  ln( (c(b_i) + 1) / (c(first(b_i)) + V) )

where c(..) are corpus bigram / context counts and V the alphabet
size. Gibberish scores far below prose because its bigrams are rare in
the corpus distribution.

Scale shape: the model table is bounded by |alphabet|² (a few thousand
rows regardless of corpus size), so it always broadcasts; training is
one partial-aggregated explode of the corpus, scoring is a map-side
lookup join + per-doc aggregate. Nothing superlinear, no Python.

Reference: north-star superset (the reference engine has no string or
statistical surface at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clean import normalize_ws


def _char_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, bigram) rows over the lowercased, whitespace-collapsed
    text — one row per adjacent char pair, corpus-linear."""
    from ..partitioning import spread

    t = F.lower(normalize_ws(text_col))
    return (spread(df).select(F.col(id_col), t.alias("__t"))
            .select(id_col,
                    F.explode(F.expr(
                        "transform(sequence(1, length(__t) - 1), "
                        "i -> substring(__t, i, 2))")).alias("bigram"))
            .filter(F.length("bigram") == 2))


def train_char_bigram(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """The model: corpus bigram counts ``(bigram, c_bigram, c_ctx)``
    with the context count (first-char marginal) attached. Bounded by
    alphabet², so the result broadcasts at any corpus scale."""
    bg = (_char_bigrams(df, text_col, id_col)
          .groupBy("bigram").agg(F.count("*").alias("c_bigram")))
    ctx = (bg.groupBy(F.substring("bigram", 1, 1).alias("ctx"))
           .agg(F.sum("c_bigram").alias("c_ctx")))
    return (bg.withColumn("ctx", F.substring("bigram", 1, 1))
            .join(F.broadcast(ctx), "ctx")
            .select("bigram", "c_bigram", "c_ctx"))


def charlm_score(df: DataFrame, model: DataFrame | None = None,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Score each document under the (corpus-trained or supplied)
    bigram model: ``(id, n_bigrams, charlm_logprob)`` where the score
    is the mean add-one-smoothed log probability per bigram. Unseen
    bigrams fall back to ``1 / (c_ctx + V)`` (unseen context: ``1/V``).

    Output contract: one row per document that produces at least one
    bigram — documents whose normalized text is shorter than 2 chars
    (or null) emit NO row, like a group-by over their zero bigram
    rows; reconcile against the corpus with a left join if you need
    explicit not-scored rows.

    Laziness: the SELF-TRAINED path runs one eager job (the model
    must be counted for V and is persisted — alphabet²-bounded). A
    SUPPLIED model is left untouched: not persisted (it belongs to
    the caller — registering it in the cache registry would let an
    unrelated cache.unpersist_all() drop it behind the caller's
    back), and V is counted from it directly (tiny)."""
    from .. import cache

    if model is None:
        model = cache.persist(train_char_bigram(df, text_col, id_col))
    v = model.select(F.substring("bigram", 1, 1)).distinct().count()
    per = _char_bigrams(df, text_col, id_col)
    # the context count joins on the CONTEXT (first char), not the full
    # bigram: an unseen bigram whose context IS seen must score
    # 1/(c_ctx + V), not 1/V — a full-bigram join would null out c_ctx
    # for exactly those rows (matters only for supplied models; on the
    # self-trained path every scored bigram is in the model)
    # aggregate (not distinct): a supplied model with inconsistent
    # c_ctx values for one context would otherwise yield multiple rows
    # per __ctx and the left join would duplicate per-bigram rows,
    # silently inflating n_bigrams — max() guarantees one row per ctx
    ctx_counts = (model
                  .groupBy(F.substring("bigram", 1, 1).alias("__ctx"))
                  .agg(F.max("c_ctx").alias("__c_ctx")))
    # same guard on the bigram side: a supplied model with duplicate
    # bigram rows (an un-deduped union of shards) would fan out
    # per-bigram rows through the left join and inflate n_bigrams
    bigram_counts = (model.groupBy("bigram")
                     .agg(F.max("c_bigram").alias("c_bigram")))
    joined = (per
              .withColumn("__ctx", F.substring("bigram", 1, 1))
              .join(F.broadcast(bigram_counts), "bigram", "left")
              .join(F.broadcast(ctx_counts), "__ctx", "left"))
    logp = F.log(
        (F.coalesce(F.col("c_bigram"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("__c_ctx"), F.lit(0)) + F.lit(v)).cast("double"))
    return (joined.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.avg(logp).alias("charlm_logprob")))


def _word_transitions(df: DataFrame, text_col: str,
                      id_col: str) -> DataFrame:
    """(id, prev, w) word-bigram transition rows over the shared
    positional gram stream (text.gram_stream)."""
    from .text import gram_stream

    return (gram_stream(df, 2, text_col, id_col)
            .select("id", F.col("t0").alias("prev"),
                    F.col("t1").alias("w")))


def wordlm_score(df: DataFrame, train_df: DataFrame | None = None,
                 text_col: str = "text", id_col: str = "doc_id",
                 alpha: float = 0.4) -> DataFrame:
    """WORD-bigram LM scoring with stupid backoff (Brants et al. 2007
    — the smoothing large-scale LMs actually shipped, and the engine-
    level stand-in for CCNet's KenLM wikipedia-perplexity filter):
    ``(id, n_transitions, wordlm_logprob)`` where the score is the
    mean log score over a doc's word transitions,

        S(w | prev) = c(prev w) / c(prev)          if the bigram is in
                                                   the model
                    = alpha * (c(w)+1) / (N + V)   otherwise (add-one
                                                   floor covers words
                                                   the model never saw)

    trained on ``train_df`` (default: the scored corpus itself — but
    the interesting deployment trains on a REFERENCE corpus, e.g.
    yesterday's curated release or wikipedia, so low-scoring docs are
    "unlike the reference", the CCNet quality split). Documents with
    fewer than 2 tokens emit no row (no transitions), matching
    charlm_score's contract.

    Versus charlm_score: word-level (catches fluent-gibberish word
    salad that has perfectly natural CHARACTER statistics) and the
    model is vocabulary²-bounded, NOT broadcastable by fiat — the
    bigram lookup is a plain hash join keyed on (prev, w) that AQE
    broadcasts only when the trained table actually fits, which is
    the honest 100 TB posture (a web-scale bigram table does not
    broadcast; the transition stream shuffles once on the pair key).
    Totals (N, V) ride in as a 1-row broadcast crossJoin; unigram
    context/backoff lookups join the vocabulary-sized count table
    twice. No Python anywhere."""
    from .. import cache
    from .text import tokens as _tokens

    if train_df is None:
        train_df = df
    # unigram counts over the FULL token stream (first tokens count as
    # context mass too), transition counts over the lead pairs
    toks = train_df.select(F.explode(_tokens(text_col)).alias("tok"))
    uni = cache.persist(
        toks.groupBy("tok").agg(F.count("*").alias("c")))
    bg = (_word_transitions(train_df, text_col, id_col)
          .groupBy("prev", "w").agg(F.count("*").alias("c_bg")))
    tot = uni.agg(F.sum("c").cast("double").alias("n"),
                  F.count("*").alias("v"))
    trans = _word_transitions(df, text_col, id_col)
    cp = uni.select(F.col("tok").alias("prev"), F.col("c").alias("c_prev"))
    cw = uni.select(F.col("tok").alias("w"), F.col("c").alias("c_w"))
    j = (trans.join(bg, ["prev", "w"], "left")
         .join(cp, "prev", "left")
         .join(cw, "w", "left")
         .crossJoin(F.broadcast(tot)))
    logp = F.when(
        F.col("c_bg").isNotNull(),
        F.log(F.col("c_bg").cast("double") / F.col("c_prev"))
    ).otherwise(
        F.log(F.lit(float(alpha))
              * (F.coalesce(F.col("c_w"), F.lit(0)) + 1).cast("double")
              / (F.col("n") + F.col("v"))))
    return (j.groupBy(F.col("id").alias(id_col))
            .agg(F.count("*").cast("long").alias("n_transitions"),
                 F.avg(logp).alias("wordlm_logprob")))
