"""BM25 full-text retrieval over the document corpus.

The missing retrieval surface next to the embedding-space operators
(knn/ANN): lexical top-k is what a training-data pipeline runs for
eval-set decontamination triage ("which training docs would a search
engine return for this benchmark question?"), hard-negative mining,
and RAG-corpus QA. Superset operator — the reference engine at
/root/reference has no text-retrieval surface (its query layer is the
relational operator set SURVEY.md §2 covers).

Spark-first shape (the 100 TB argument): the corpus never meets the
query set in a cross join. One tokenize/explode pass builds the
classic INVERTED POSTING table (term, doc, tf) — partial-aggregated
map-side, shuffled once on the term-bearing keys — document length
and term document-frequency are rollups OF the postings (no second
corpus scan), and scoring is an equi-join of postings to the query
terms on ``term``: cost proportional to the postings of the terms the
queries actually use, never |corpus| x |queries|. The per-(query,doc)
score folds in deterministic term order, so results are bit-stable
and DuckDB-checkable at any parallelism.

Float contract (keeps the SQL oracle hash-green): per-term
contributions are computed by ONE arithmetic expression evaluated
identically in both engines (ln shares bit behavior across
JVM/libm on this workload's value range — the PSI/Zipf/DSIR
precedent), ``avgdl`` is an exact-int sum divided once (never a
shuffle-order-dependent float avg), and the per-pair sum folds over
contributions sorted by term, seeded with the first element — the
pool_chunk_embeddings list_reduce contract. Scores floor-truncate at
6 decimals; ranking orders by (rounded score desc, doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import cache
from .text import tokens


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text",
              q_id_col: str = "q_id",
              q_text_col: str = "q_text") -> DataFrame:
    """Top-``k`` documents per query under BM25 (Robertson/Sparck
    Jones idf in Lucene's non-negative ``ln(1 + (N-df+0.5)/(df+0.5))``
    form; ``tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))`` length-normalized
    term frequency). Output ``(q_id, doc_id, rank, score_q)`` with
    ``score_q`` floor-truncated at 6 decimals and ``rank`` ordered by
    (score_q desc, doc_id) — deterministic, ties broken by id.

    Query terms are the DISTINCT whitespace tokens of ``q_text_col``
    (classic bag-of-words retrieval; duplicate query terms score
    once). Only documents sharing at least one term with the query
    appear — the inverted-index contract; a no-overlap query returns
    no rows rather than a zero-score corpus.

    Scale shape: the posting table is the one corpus-sized product
    and feeds THREE consumers (df rollup, dl rollup, the scoring
    join), so it is persisted (MEMORY_AND_DISK via
    :mod:`rivulus_spark.cache`). Corpus constants (N, total length)
    ride in as a 1-row broadcast crossJoin (the lm.py/sketch.py
    pattern); the query-term table is qlen-bounded and broadcast into
    the posting join. The final top-k is a per-query group-limited
    window over candidate rows only (never the corpus)."""
    toks = docs.select(F.col(id_col).cast("long").alias("doc"),
                       F.explode(tokens(text_col)).alias("term"))
    postings = cache.persist(
        toks.groupBy("term", "doc").agg(F.count("*").alias("tf")))
    # dl = sum of tf per doc == the doc's token count; rolled up from
    # the postings, not a second corpus tokenize
    dl = postings.groupBy("doc").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"),
                   F.sum("dl").alias("tot_len"))
    term_df = postings.groupBy("term").agg(F.count("*").alias("df_t"))
    qterms = queries.select(
        F.col(q_id_col).cast("long").alias("q_id"),
        F.explode(F.array_distinct(tokens(q_text_col))).alias("term"))
    avgdl = F.col("tot_len").cast("double") / F.col("n_docs")
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5))
    norm = F.col("tf") * (k1 + 1.0) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    contrib = (idf * norm).alias("c")
    hits = (postings
            .join(F.broadcast(qterms), "term")
            .join(dl, "doc")
            .join(term_df, "term")
            .crossJoin(F.broadcast(stats))
            .select("q_id", "doc", F.col("term").alias("t"), contrib))
    # deterministic per-pair sum: fold contributions in ascending term
    # order seeded with the first (list_reduce parity — terms are
    # unique within a pair, so the struct sort is total); groups are
    # query-length bounded, never corpus-sized
    cs = F.transform(F.col("parts"), lambda s: s["c"])
    summed = F.aggregate(F.slice(cs, F.lit(2), F.size(cs) - 1),
                         F.element_at(cs, 1), lambda a, x: a + x)
    scored = (hits.groupBy("q_id", "doc")
              .agg(F.array_sort(F.collect_list(F.struct("t", "c")))
                   .alias("parts"))
              .select("q_id", F.col("doc").alias("doc_id"),
                      (F.floor(summed * 1_000_000) / 1_000_000)
                      .alias("score_q")))
    w = Window.partitionBy("q_id").orderBy(F.col("score_q").desc(),
                                           F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "doc_id", F.col("rank").cast("long").alias("rank"),
                    "score_q"))
