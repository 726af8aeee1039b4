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


def mmr_select(df: DataFrame, query_id: int, k: int = 6,
               lam: float = 0.7, n_cands: int = 24,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998)
    diversified top-k: greedily pick k items maximizing
    ``lam·sim(q,d) − (1−lam)·max_{s∈S} sim(d,s)`` — the rerank every
    retrieval stack runs between "nearest neighbors" and "what a
    human sees", and the diversity-aware selection data pruning uses
    to avoid k copies of the same cluster. The query is the corpus
    vector ``query_id``; output one row per selection,
    ``(round, vec_id, mmr_q)`` — round 0..k-1 in pick order, mmr_q
    the winning MMR score floor-truncated at 6 decimals (round 0's is
    lam·relevance: the empty-set diversity term is 0 by convention,
    so the first pick is the pure-relevance argmax).

    Deterministic and oracle-checkable k rounds deep: every cosine is
    ``dot(a,b)/(|a|·|b|)`` with the ascending-dimension zero-seed
    fold (the knn_cosine float contract), the MMR score is ONE
    arithmetic expression with lam and (1−lam) passed as the same
    Python-repr'd double literals the SQL oracle embeds, and every
    argmax breaks ties by LOWEST id (max(struct(score, −id)) ≡
    ORDER BY score DESC, vec_id LIMIT 1).

    Scale shape: the corpus appears in exactly ONE stage — the
    relevance scan that takes the global top-``n_cands`` via
    sort-limit (TakeOrderedAndProject, the limit_topk pattern; swap
    in ann_ivf_topk for the scan at billion-vector scale, same
    contract downstream). The k greedy rounds then run on the
    n_cands-row candidate table: per round ONE tiny argmax job (a
    documented 1-row driver barrier, the kcenter/kmeans loop pattern)
    whose ``max_by`` carries the winner's (vec, nrm) payload out with
    the argmax key (opt r11: the former ``filter(id ==
    winner).head()`` was a second candidate-table job per round), and
    a lazily-localCheckpointed maxsim update the next round's argmax
    materializes, so round r's plan never drags round r−1's fold
    chain; the loop runs under driver_loop_conf (AQE off — nothing
    to re-plan in a 1-row aggregate). Total: one corpus scan + k
    candidate-sized jobs."""
    if k < 1 or n_cands < k:
        raise ValueError(
            f"mmr_select: need 1 <= k <= n_cands, got k={k} "
            f"n_cands={n_cands}")
    from .similarity import _as_double, dot, l2_norm

    import math

    qrows = (df.filter(F.col(id_col) == query_id)
             .select(_as_double(F.col(vec_col)).alias("v")).head(2))
    if len(qrows) != 1:
        raise ValueError(
            f"mmr_select: query id {query_id} matched {len(qrows)} rows")
    qvec = list(qrows[0].v)
    qarr = F.array(*[F.lit(float(x)) for x in qvec])
    qnrm = F.sqrt(dot(qarr, qarr))
    from .. import partitioning

    v = _as_double(F.col(vec_col))
    rel = dot(F.col("vec"), qarr) / (F.col("nrm") * qnrm)
    # the relevance scan folds dim-length dot products per row
    # (interpreted): spread an under-split parquet source so the one
    # corpus-sized stage uses the full core count (the kcenter /
    # char_entropy r9 lesson)
    df = partitioning.spread(df)
    state = (df.filter(F.col(id_col) != query_id)
             .select(F.col(id_col).cast("long").alias("id"),
                     v.alias("vec"), l2_norm(v).alias("nrm"))
             .withColumn("rel", rel)
             .orderBy(F.col("rel").desc(), F.col("id"))
             .limit(n_cands)
             .withColumn("maxsim", F.lit(0.0))
             .localCheckpoint(eager=False))
    lam_c, div_c = F.lit(float(lam)), F.lit(1.0 - float(lam))
    picked: list[tuple[int, int, float]] = []
    from ..partitioning import driver_loop_conf

    with driver_loop_conf(df.sparkSession):
        for rnd in range(k):
            score = lam_c * F.col("rel") - div_c * F.col("maxsim")
            # max_by key struct(sc, -id) == the former
            # max(struct(sc, -id)) argmax; ids are unique so the key
            # never ties and the payload row is deterministic
            best = (state
                    .select(score.alias("sc"), "id", "vec", "nrm")
                    .agg(F.max_by(
                        F.struct("sc", "id", "vec", "nrm"),
                        F.struct(F.col("sc"),
                                 (-F.col("id")).alias("nid")))
                        .alias("m"))
                    .select("m.*").head())
            if best is None or best.sc is None:
                break  # candidate pool exhausted (n_cands < corpus-k)
            sel = int(best.id)
            picked.append(
                (rnd, sel,
                 math.floor(float(best.sc) * 1_000_000) / 1_000_000))
            if rnd == k - 1:
                break
            sarr = F.array(*[F.lit(float(x)) for x in best.vec])
            snrm = F.lit(float(best.nrm))
            pair = dot(F.col("vec"), sarr) / (F.col("nrm") * snrm)
            state = (state.filter(F.col("id") != sel)
                     .withColumn("maxsim",
                                 F.greatest(F.col("maxsim"), pair))
                     .localCheckpoint(eager=False))
    return df.sparkSession.createDataFrame(
        picked, "round long, vec_id long, mmr_q double")


def rrf_fuse(lex: DataFrame, dense: DataFrame, k: int = 10,
             c: float = 60.0, q_col: str = "q_id",
             id_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009) of two
    ranked retrieval lists — the standard hybrid-search combiner
    (BM25 + dense ANN) every modern retrieval stack ships: score =
    Σ 1/(c + rank) over the lists that returned the document, absent
    lists contributing 0. Rank-based, so the two scorers need no
    score normalization — exactly why RRF won over score
    interpolation in practice. Output ``(q_id, doc_id, rank, rrf_q)``
    with rank ordered by (FULL-precision rrf desc, doc_id) and rrf_q
    floor-truncated at 6 decimals.

    Float contract: rrf is one fixed-order expression —
    coalesce(1/(c+rank_lex), 0) + coalesce(1/(c+rank_dense), 0) with
    c as a repr'd double literal — over INTEGER ranks, so both
    engines compute bit-identical doubles and the pre-truncation
    ordering is engine-independent.

    Scale shape: both inputs are already per-query top-k tables
    (k·|queries| rows — never corpus-sized), so the full-outer merge
    on (q_id, doc_id) and the per-query rank window are bounded by
    construction; the corpus-sized work happened inside the two
    retrievers."""
    ra = lex.select(q_col, id_col, F.col(rank_col).alias("ra"))
    rb = dense.select(q_col, id_col, F.col(rank_col).alias("rb"))
    j = ra.join(rb, [q_col, id_col], "full_outer")
    cc = F.lit(float(c))
    rrf = (F.coalesce(F.lit(1.0) / (cc + F.col("ra")), F.lit(0.0))
           + F.coalesce(F.lit(1.0) / (cc + F.col("rb")), F.lit(0.0)))
    w = Window.partitionBy(q_col).orderBy(F.col("rrf").desc(),
                                          F.col(id_col))
    return (j.withColumn("rrf", rrf)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_col, id_col,
                    F.col("rank").cast("long").alias("rank"),
                    (F.floor(F.col("rrf") * 1_000_000) / 1_000_000)
                    .alias("rrf_q")))
