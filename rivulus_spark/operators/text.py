"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure JVM-side column expressions (no Python UDFs):
tokenization, token counting, quality features, language-ID heuristics,
and document fingerprinting. They run inside whole-stage codegen and
scale linearly with a parquet scan — no shuffle except where a groupBy
is explicitly part of the semantics.

These are superset operators (the reference engine has no scalar
function library — /root/reference/src/expressions/expr.rs defines only
12 binary ops); they are built for the 100 TB training-data use case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import cache

#: token marker sets for the n-gram/stopword language-ID heuristic
EN_MARKERS = ["the", "a", "of", "and", "to", "is", "in", "it"]


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization of trimmed text (deterministic,
    locale-independent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: str | Column) -> Column:
    """``size(split(...))`` is deliberately kept as the count form —
    two "alloc-free" alternatives measured WORSE at sf1 (r7, same
    session, 3-rep means): (a) ``regexp_count(t, '\\S+')`` is
    RuntimeReplaceable to ``size(regexp_extract_all(...))`` (verified
    in the executed plan), i.e. it still materializes every token;
    (b) collapsing ``\\s+`` runs to single spaces and counting
    separators (``length - length(translate)``) ran 0.87s vs split's
    0.44s — regexp_replace's appendReplacement path costs more than
    split's cheap UTF8String slices. The scale fix for repeated counts
    is structural instead: compute once, carry the long (see
    pipeline.curate_corpus)."""
    return F.size(tokens(col))


#: BPE-style pre-tokenization pattern: letter runs, digit runs, and
#: single non-alphanumeric marks — the RE2-compatible core of the GPT-2
#: pre-tokenizer (no lookarounds, so Java regex and RE2 agree exactly)
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(col: str | Column) -> Column:
    """Subword-style pre-tokenization (letters / digits / punctuation
    marks as separate tokens) — the unit a BPE vocabulary would merge
    from, and a better token-budget estimate than whitespace words."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0))


def bpe_token_count(col: str | Column) -> Column:
    """Count of BPE_PATTERN matches — ``size(bpe_tokens(...))`` is
    also the best available form here (``regexp_count`` lowers to
    exactly this expression; see token_count's measured note)."""
    return F.size(bpe_tokens(col))


def word_hash(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a token: the first 15 hex
    digits of its MD5. MD5 is engine-portable (identical in Spark,
    DuckDB, Python), which is what makes dedup signatures verifiable
    against an independent oracle; 60 bits keeps all downstream integer
    arithmetic inside a signed 64-bit range (Spark 4 runs ANSI mode and
    raises on overflow)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def avg_token_len(col: str | Column) -> Column:
    """Mean token length, truncated (not rounded) to 2 decimals —
    floor(x*100)/100 is bit-deterministic across engines, while round()
    diverges on exact .xx5 halves (Spark rounds via the decimal string
    repr, DuckDB rounds the raw double)."""
    c = F.col(col) if isinstance(col, str) else col
    n = token_count(c)
    ratio = F.length(F.regexp_replace(F.trim(c), r"\s+", "")).cast("double") / n
    return F.floor(ratio * 100).cast("double") / 100


def punct_ratio(col: str | Column) -> Column:
    """Punctuation chars / non-space chars, floor-truncated to 3
    decimals (floor is bit-deterministic across engines; round isn't).
    Empty/whitespace-only text has zero non-space chars — the ratio is
    null (guarded: an unguarded divide crashes the whole job under
    Spark 4's default ANSI mode the moment one empty web-scraped doc
    appears)."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    n_chars = F.length(F.regexp_replace(F.trim(c), r"\s+", ""))
    ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars)
    return F.floor(ratio * 1000).cast("double") / 1000


def stopword_ratio(col: str | Column) -> Column:
    """Stopword tokens (total occurrences, not distinct) / tokens,
    floor-truncated to 3 decimals. High-quality prose sits in a known
    band; near-0 or near-1 flags keyword spam / boilerplate.

    Occurrences count as ``size(toks) - size(array_remove(toks, m))``
    summed over the 8 markers (array_remove keeps duplicates of
    everything else, so the size drop IS m's occurrence count) — not
    a filter-lambda over the token array: higher-order functions
    evaluate their lambda interpreted per element, and this column
    sits on the quality-features hot path (classifier, datacard,
    curation, two streams). Measured on the sf1 corpus scan: 1.0s vs
    5.7s, bit-identical ratios (r8)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_stop = sum(F.size(toks) - F.size(F.array_remove(toks, m))
                 for m in EN_MARKERS)
    ratio = n_stop.cast("double") / F.size(toks)
    return F.floor(ratio * 1000).cast("double") / 1000


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality scoring features: char/token counts, mean
    token length, punctuation + stopword ratios, a short-doc flag.
    Single projection, no shuffle."""
    c = F.col(text_col)
    return df.select(
        "doc_id",
        F.length(c).alias("n_chars_actual"),
        token_count(c).alias("n_tokens"),
        avg_token_len(c).alias("avg_token_len"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        (token_count(c) < 50).alias("is_short"),
    )


def gram_stream(df: DataFrame, k: int, text_col: str = "text",
                id_col: str = "doc_id",
                carry_cols: list[str] | None = None) -> DataFrame:
    """The shared positional k-gram token stream: ``(id, pos, t0 ..
    t{k-1})`` rows via posexplode + lead window — the one skeleton
    behind shingling, winnowing, corpus n-gram counting, PMI pairs,
    word-bigram LM transitions, and DSIR features (r8 review: five
    near-identical copies of this block existed; a fix to the stream
    now lands once). Rows whose k-th token is null (past the doc end)
    are dropped, so ``pos`` values are exactly 0..n_tokens-k per doc;
    ``k=1`` is the plain positional token stream. ``carry_cols``
    (per-DOCUMENT constants — a domain flag, a source label) ride
    along on every gram row, which is what lets a consumer fold two
    conditional histograms into ONE stream pass instead of scanning
    per condition.

    Fully map-side (opt r11): k-grams come from ``posexplode`` of an
    ``arrays_zip`` of the k off-by-one token-array slices — plain
    collection expressions, NO lambda and NO exchange. The historical
    lead-window form paid one corpus-sized (id)-keyed exchange per
    stream (every token row shuffled so ``lead`` could see its
    neighbors — data that was adjacent in the source array to begin
    with); the array-transform alternative evaluates its lambda
    interpreted per element (~10x slower on corpus scans — measured,
    see dedup.shingle_rows' history). Same-session A/B on the sf0.1
    bigram stream: window 0.741s / zip 0.377s / transform 2.721s,
    gram multiset identical (0 diff rows). At cluster scale this
    removes one full-corpus shuffle from every gram consumer
    (shingling, PMI, word-LM transitions, DSIR features, n-gram
    counts). ``spread`` guards under-split inputs."""
    from ..partitioning import spread

    carry = carry_cols or []
    toks = tokens(text_col)
    if k == 1:
        return spread(df).select(F.col(id_col).alias("id"), *carry,
                                 F.posexplode(toks).alias("pos", "t0"))
    # slice length is clamped at 0: a doc with fewer than k tokens
    # yields empty slices -> empty zip -> no rows, exactly the rows
    # the lead-window form dropped via the trailing-null filter
    n = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, n).alias(f"t{i}") for i in range(k)])
    return (spread(df)
            .select(F.col(id_col).alias("id"), *carry,
                    F.posexplode(zipped).alias("pos", "__g"))
            .select("id", *carry, "pos",
                    *[F.col(f"__g.t{i}").alias(f"t{i}") for i in range(k)]))


def gram_concat(k: int) -> Column:
    """Space-joined gram string over a :func:`gram_stream` row's
    ``t0..t{k-1}`` columns — the textual shingle form."""
    return F.concat_ws(" ", *[f"t{i}" for i in range(k)])


def ngrams(col: str | Column, n: int) -> Column:
    """Word n-grams of a text column as ``array<string>`` (space-joined,
    order-preserving, duplicates kept — counting wants the stream, not
    the set). Pure codegen: sequence + slice over the token array."""
    toks = tokens(col)
    starts = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return (F.when(F.size(toks) >= n,
                   F.transform(starts,
                               lambda i: F.concat_ws(" ", F.slice(toks, i, n))))
            .otherwise(F.array().cast("array<string>")))


def repetition_features(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition metrics per document: token count,
    distinct-token count, and the fraction of all tokens taken by the
    single most frequent token (``top_tok_frac``, floor-truncated to 3
    decimals so the ratio is engine-exact — see the workload float
    notes). High top-token fraction / low distinct ratio flags
    degenerate boilerplate the quality filter should drop.

    Scale shape: explode -> two-level hash aggregation, both with
    map-side partial aggregation; shuffle rows are (doc, token, count)
    partials, bounded by the distinct-token count per doc, never the
    raw token stream. No Python, no window over the corpus."""
    per_tok = (df.select(F.col(id_col),
                         F.explode(tokens(text_col)).alias("tok"))
               .groupBy(id_col, "tok").agg(F.count("*").alias("c")))
    return (per_tok.groupBy(id_col)
            .agg(F.sum("c").alias("n_tokens"),
                 F.count("*").alias("n_distinct_tokens"),
                 F.max("c").alias("top_tok_count"))
            .select(id_col, "n_tokens", "n_distinct_tokens",
                    (F.floor(F.col("top_tok_count") * 1000
                             / F.col("n_tokens")) / 1000)
                    .alias("top_tok_frac")))


def corpus_ngram_topk(df: DataFrame, n: int = 2, k: int = 20,
                      text_col: str = "text") -> DataFrame:
    """Corpus-level top-k word n-grams by frequency: (ngram, n_docs,
    total_count, rank), count-desc with an ngram tie-break so the cut
    is deterministic. The corpus-frequency table that drives
    boilerplate detection and contamination checks.

    Scale shape: one explode + hash aggregation (partial map-side
    combine collapses each partition's stream to its distinct n-grams)
    followed by a rank window over ONE global partition of only the
    aggregated n-gram table — Spark plans the k-cut as a group-limit
    (TakeOrdered-style), so the driver never sees more than the
    aggregate table and the full sort never materializes."""
    # lead-window n-gram stream (text.gram_stream) instead of
    # explode(ngrams(...)): the array-transform form evaluates its
    # lambda interpreted per element with a slice allocation per gram;
    # the shared stream is whole-stage codegen end to end
    grams = (gram_stream(df, n, text_col)
             .select("id", gram_concat(n).alias("g")))
    counts = (grams.groupBy("g")
              .agg(F.countDistinct("id").alias("n_docs"),
                   F.count("*").alias("total_count")))
    # rank-then-filter: Catalyst's InferWindowGroupLimit inserts a
    # TakeOrderedAndProject(limit=k) below this window (asserted in
    # test_plans.py), so the unpartitioned rank sees <= k rows — the
    # n-gram count table itself never single-partitions
    w = Window.orderBy(F.col("total_count").desc(), F.col("g").asc())
    return (counts.select(F.col("g").alias("ngram"), "n_docs",
                          "total_count",
                          F.row_number().over(w).alias("rank"))
            .filter(F.col("rank") <= k))


def pmi_collocations(df: DataFrame, k: int = 20, min_count: int = 5,
                     text_col: str = "text") -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information:
    ``(bigram, pair_count, pmi, rank)`` for bigrams occurring at least
    ``min_count`` times, PMI descending. PMI(x,y) = ln(p(x,y) /
    (p(x)·p(y))) with p(x,y) = c_xy/M over the bigram stream and
    p(x) = c_x/N over the token stream — the classic collocation
    statistic (Church & Hanks 1990): high-PMI pairs are multi-word
    units ("Hong Kong", "et al"), the vocabulary a tokenizer or a
    phrase-mining pass should treat as one symbol. ``min_count``
    guards the low-frequency blowup (a pair seen once by two rare
    words maxes PMI); PMI floor-truncates to 6 decimals and the rank
    tie-breaks on the bigram string, so the cut is deterministic
    cross-engine.

    Scale shape: one token stream feeds both count tables (unigram
    counts keyed on the token; lead-window bigram counts keyed on the
    pair — map-side partial aggregation collapses each partition to
    its distinct grams). The two scalar totals ride in as broadcast
    1-row crossJoins; the min_count-filtered pair table hash-joins the
    unigram table twice (vocabulary-sized, shuffles (term, count)
    rows). The final rank window is unpartitioned but Catalyst's
    group-limit rewrite bounds it to k rows (same shape as
    corpus_ngram_topk). No Python, nothing driver-side."""
    # the raw posexplode stream is deliberately NOT persisted (r8
    # review): materializing the corpus-sized (doc, pos, token) rows
    # to feed two aggregations costs more than the second scan at any
    # real scale — only the vocabulary-sized count table caches (the
    # module convention; it feeds three consumers)
    uni = cache.persist(
        gram_stream(df, 1, text_col)
        .groupBy(F.col("t0").alias("t"))
        .agg(F.count("*").alias("c")))
    n_total = uni.agg(F.sum("c").alias("n"))
    pairs = (gram_stream(df, 2, text_col)
             .select(F.col("t0").alias("x"), F.col("t1").alias("y")))
    cxy = (pairs.groupBy("x", "y").agg(F.count("*").alias("c_xy")))
    m_total = cxy.agg(F.sum("c_xy").alias("m"))
    ux = uni.select(F.col("t").alias("x"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("t").alias("y"), F.col("c").alias("c_y"))
    # ln-sum form (never multiplies counts: c_xy*N*N overflows a long
    # under ANSI at corpus scale); term order matches the SQL oracle
    # exactly so the doubles round identically
    pmi = (F.log(F.col("c_xy").cast("double")) - F.log(F.col("m").cast("double"))
           - F.log(F.col("c_x").cast("double")) - F.log(F.col("c_y").cast("double"))
           + F.lit(2.0) * F.log(F.col("n").cast("double")))
    scored = (cxy.filter(F.col("c_xy") >= min_count)
              .join(ux, "x").join(uy, "y")
              .crossJoin(F.broadcast(n_total))
              .crossJoin(F.broadcast(m_total))
              .select(F.concat_ws(" ", "x", "y").alias("bigram"),
                      F.col("c_xy").alias("pair_count"),
                      (F.floor(pmi * 1_000_000) / 1_000_000).alias("pmi")))
    wr = Window.orderBy(F.col("pmi").desc(), F.col("bigram").asc())
    return (scored.select("bigram", "pair_count", "pmi",
                          F.row_number().over(wr).alias("rank"))
            .filter(F.col("rank") <= k))


def top_distinctive_terms(df: DataFrame, k: int = 3,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Per-document top-k distinctive terms ``(doc_id, term, tf, df,
    rank)``: terms ranked by in-document frequency descending, then
    corpus document-frequency ASCENDING (rarer wins the tie), then
    term — the integer-exact core of tf-idf term selection (for a
    fixed tf, idf ordering IS ascending-df ordering), with no float
    in the ranking so the cut is bit-deterministic across engines.

    Scale shape: explode -> (doc, term, tf) hash aggregation (map-side
    partial), a second aggregation of the same table to the corpus df
    table (|vocab| rows, far smaller than the corpus), one equi-join
    back on term, and a per-doc row_number that Spark executes as a
    group-limit — shuffles carry (doc, term, counts) rows, never
    text."""
    per_doc = (df.select(F.col(id_col),
                         F.explode(tokens(text_col)).alias("term"))
               .groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    per_doc = cache.persist(per_doc)
    corpus_df = per_doc.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc())
    return (per_doc.join(corpus_df, "term")
            .select(id_col, "term", "tf", "df",
                    F.row_number().over(w).alias("rank"))
            .filter(F.col("rank") <= k)
            .withColumn("rank", F.col("rank").cast("long")))


def _en_marker_count(text_col: str | Column) -> Column:
    """Distinct English marker tokens present, as a sum of 8
    ``array_contains`` probes — NOT ``size(array_intersect(...))``:
    ArrayIntersect is a CodegenFallback collection expression that
    builds a hash set per row interpreted, while ArrayContains
    generates straight-line code; same answer (each marker counts
    once either way), measured 8.9s vs 0.9s on the sf1 corpus scan
    (r8)."""
    toks = tokens(text_col)
    n = sum(F.array_contains(toks, F.lit(m)).cast("int")
            for m in EN_MARKERS)
    return n


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language-ID heuristic: counts distinct English
    marker tokens present; >= 2 distinct markers => 'en'. (A real
    pipeline would use per-language marker sets + char n-gram stats;
    the scoring scaffold is identical.)"""
    n = _en_marker_count(text_col)
    return df.select(
        "doc_id",
        n.alias("en_markers"),
        F.when(n >= 2, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
    )


def lang_mismatch_audit(df: DataFrame, label_col: str = "lang",
                        group_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """Label-vs-detector disagreement rollup: per ``group_col``, how
    many documents the :func:`lang_id` heuristic scores differently
    from their ingest-time ``label_col`` — the audit that catches a
    crawl source shipping mislabeled or code-switched documents
    before the labels steer per-language mixing, fertility budgets,
    or per-lang quality thresholds. ``(group, n_docs, n_labeled_en,
    n_pred_en, n_mismatch)``; a group with high ``n_mismatch`` gets a
    relabel pass, not silent trust. One projection + one group-by
    over the handful of group keys (map-side partial), no joins — the
    detector runs inline, not against a materialized lang_id table."""
    pred_en = _en_marker_count(text_col) >= 2
    labeled_en = F.col(label_col) == "en"
    as_long = lambda c: F.sum(c.cast("long"))  # noqa: E731
    return (df.groupBy(group_col)
            .agg(F.count("*").alias("n_docs"),
                 as_long(labeled_en).alias("n_labeled_en"),
                 as_long(pred_en).alias("n_pred_en"),
                 as_long(labeled_en != pred_en).alias("n_mismatch")))


def chunk_documents(df: DataFrame, max_tokens: int = 128,
                    overlap: int = 16, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    context-window packing primitive of a training pipeline. Output:
    (doc_id, chunk_idx, chunk_text, n_chunk_tokens), one row per chunk.

    Chunk starts advance by ``max_tokens - overlap``; the last start is
    the largest multiple of the stride that is < n_tokens - overlap
    (and start 0 always exists), so no chunk is fully contained in its
    predecessor. Pure projection + explode: no shuffle, fan-out is
    ~n_tokens/stride rows per document, linear at corpus scale."""
    if overlap >= max_tokens:
        raise ValueError(f"overlap ({overlap}) must be < max_tokens "
                         f"({max_tokens})")
    stride = max_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    last = F.greatest(n - F.lit(overlap) - 1, F.lit(0))
    starts = F.sequence(F.lit(0), last, F.lit(stride))
    return (df.select(F.col(id_col), toks.alias("__toks"),
                      F.posexplode(starts).alias("chunk_idx", "start"))
            .select(id_col,
                    F.col("chunk_idx").cast("long").alias("chunk_idx"),
                    F.concat_ws(" ", F.slice(F.col("__toks"),
                                             F.col("start") + 1,
                                             max_tokens)).alias("chunk_text"),
                    F.size(F.slice(F.col("__toks"), F.col("start") + 1,
                                   max_tokens)).cast("long")
                    .alias("n_chunk_tokens")))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: MD5 of the raw text (engine-portable).
    Used as the exact-dedup key at scale — grouping on a 128-bit
    fingerprint instead of the full text keeps shuffle rows small."""
    return df.select("doc_id", F.md5(F.col(text_col)).alias("fp_md5"))


def build_vocab(df: DataFrame, text_col: str = "text",
                min_count: int = 1, max_size: int | None = None) -> DataFrame:
    """Frequency-ordered vocabulary: ``(token, count, token_id)`` with
    ids assigned by (count desc, token asc) so the mapping is
    deterministic across engines and runs. ``min_count`` prunes the
    long tail BEFORE the id window; ``max_size`` caps the vocabulary.

    Scale shape: explode -> partial-aggregated count (each partition
    collapses to its distinct tokens map-side), then one rank window
    over the |vocab|-row aggregate — the window sorts the vocabulary
    table, never the corpus. The output is small enough to broadcast
    into :func:`encode_docs` at any corpus scale (vocab size is
    bounded by max_size, not corpus size)."""
    counts = (df.select(F.explode(tokens(text_col)).alias("token"))
              .groupBy("token").agg(F.count("*").alias("count"))
              .filter(F.col("count") >= min_count))
    if max_size is not None:
        # rank-then-filter: the optimizer's group-limit rewrite bounds
        # the unpartitioned rank window to max_size rows via
        # TakeOrderedAndProject (asserted in test_plans.py) — the full
        # distinct-token table never single-partitions
        w = Window.orderBy(F.col("count").desc(), F.col("token").asc())
        return (counts.select("token", "count",
                              F.row_number().over(w).cast("long")
                              .alias("token_id"))
                .filter(F.col("token_id") <= max_size))
    # uncapped vocab: no rank filter means no group-limit rewrite, so
    # id assignment uses the two-pass distributed rank instead of
    # single-partitioning the whole distinct-token table
    from .rank import global_row_number

    return (global_row_number(
                counts.withColumn("__negc", -F.col("count")),
                ["__negc", "token"], rank_col="token_id")
            .select("token", "count", F.col("token_id").cast("long")
                    .alias("token_id")))


def encode_docs(df: DataFrame, vocab: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", oov_id: int = 0) -> DataFrame:
    """Tokenize each document and map tokens to vocabulary ids:
    ``(doc_id, n_tokens, n_oov, ids)`` where ``ids`` is the
    space-joined id sequence in document order (out-of-vocabulary
    tokens become ``oov_id``).

    Scale shape: posexplode keeps (doc, pos, token) rows; the vocab
    side is broadcast (bounded by construction), so encoding is a
    map-side hash lookup — no shuffle of the corpus. The per-doc
    reassembly groups on doc_id and sorts each doc's (pos, id) pairs
    inside the aggregate, touching only that doc's tokens."""
    toks = df.select(F.col(id_col),
                     F.posexplode(tokens(text_col)).alias("pos", "token"))
    v = F.broadcast(vocab.select("token", "token_id"))
    joined = (toks.join(v, "token", "left")
              .select(id_col, "pos",
                      F.coalesce(F.col("token_id"), F.lit(oov_id))
                      .alias("tid")))
    assembled = F.array_join(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                    lambda s: s.tid.cast("string")), " ")
    return (joined.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.sum((F.col("tid") == oov_id).cast("long"))
                 .alias("n_oov"),
                 assembled.alias("ids")))


def char_entropy(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document character-distribution Shannon entropy — the
    classic gibberish/boilerplate signal orthogonal to the token-level
    quality features: random bytes and base64 blobs score HIGH (near
    log2 of the alphabet), template/repeated-char spam scores LOW,
    natural language sits in a narrow band (~3.5-4.5 bits for
    English), so both tails are filter material. Output
    ``(doc_id, n_chars, n_unique_chars, entropy_q)`` with entropy in
    BITS, floor-truncated at 6 decimals; empty/null text yields
    n_chars 0 and entropy 0.0 (no 0/0, no ln(0)).

    Float contract (hash-checkable vs DuckDB): entropy is computed as
    ``(ln(n) - S/n) / ln(2)`` where ``S = sum cnt*ln(cnt)`` folds over
    the per-char counts in ascending CHARACTER order seeded with the
    first element (the list_reduce contract pool_chunk_embeddings
    pins); ``ln`` shares bit behavior across JVM/libm on this value
    range (the PSI/Zipf/DSIR precedent) and the identical expression
    tree is written in both engines — never ``log2`` (Spark rewrites
    log2 as ln(x)/ln(2) while libm has a native log2; the two differ
    in the last ulp).

    Scale shape: one explode of the char stream (the only
    corpus-sized stage, map-side partial-aggregated into (doc, char)
    counts — alphabet-bounded per doc), then a doc-keyed rollup whose
    groups are at most alphabet-sized. No Python, no windows, no
    driver state. The input is partitioning.spread first: the explode
    multiplies rows ~300x, so an under-split parquet source would run
    the whole char pass in one task (measured 54s on a single-row-
    group sf0.1 file vs 14s on the 10x-bigger 10-file sf1 dir, r9)."""
    from .. import partitioning

    df = partitioning.spread(df)
    c = F.col(text_col)
    chars = (df.select(F.col(id_col).alias("doc"),
                       F.explode(F.split(c, "")).alias("ch"))
             .filter(F.length("ch") > 0)
             .groupBy("doc", "ch").agg(F.count("*").alias("cnt")))
    parts = F.array_sort(F.collect_list(F.struct("ch", "cnt")))
    cl = F.transform(F.col("parts"),
                     lambda s: s["cnt"].cast("double")
                     * F.log(s["cnt"].cast("double")))
    s_fold = F.aggregate(F.slice(cl, F.lit(2), F.size(cl) - 1),
                         F.element_at(cl, 1), lambda a, x: a + x)
    n = F.col("n_chars").cast("double")
    ent = (F.log(n) - F.col("s") / n) / F.log(F.lit(2.0))
    per_doc = (chars.groupBy("doc")
               .agg(F.sum("cnt").alias("n_chars"),
                    F.count("*").alias("n_unique"),
                    parts.alias("parts"))
               .select("doc", "n_chars", "n_unique",
                       s_fold.alias("s")))
    scored = per_doc.select(
        F.col("doc").alias(id_col),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_unique").cast("long").alias("n_unique_chars"),
        F.when(F.col("n_chars") > 0,
               F.floor(ent * 1_000_000) / 1_000_000)
        .otherwise(F.lit(0.0)).alias("entropy_q"))
    # docs whose text exploded to zero chars (empty or null) fall out
    # of the aggregate; restore them with the documented zero row
    # (null-id docs land here too — null keys never match an equi
    # anti-join probe)
    missing = (df.select(F.col(id_col))
               .join(scored.select(id_col), id_col, "anti")
               .select(id_col, F.lit(0).cast("long").alias("n_chars"),
                       F.lit(0).cast("long").alias("n_unique_chars"),
                       F.lit(0.0).alias("entropy_q")))
    return scored.unionByName(missing)


def vocab_coverage(df: DataFrame, sizes: list[int],
                   text_col: str = "text") -> DataFrame:
    """Cumulative token coverage of the top-N vocabulary — the audit
    behind every "how big a vocab do we need" decision (tokenizer
    sizing, OOV-rate budgeting, Heaps/Zipf sanity next to
    zipf_slope): for each requested vocab size N, what fraction of
    ALL corpus token occurrences the N most frequent terms cover.
    Output: one row per size, ``(vocab_size, covered_tokens,
    total_tokens, coverage_q)`` with coverage floor-truncated at 6
    decimals; a size past the true vocabulary covers everything
    (cum sum saturates), so the curve is monotone and ends at 1.0.

    Deterministic: terms rank by (count DESC, term ASC) — the
    vocab_topk tie-break — so the prefix sums are engine-independent
    integers; the one float op is the final covered/total division.

    Scale shape: one tokenize/explode (the corpus-sized stage,
    map-side partial-aggregated into term counts), after which
    everything is VOCABULARY-sized (Heaps' law — sublinear in corpus
    tokens; the vocab_topk/zipf_slope justification). The ranking
    window is unpartitioned but vocab-bounded and further capped at
    max(sizes) rows by the rank filter; the per-size rollup is a
    range join of a k-row literal sizes table against that capped
    prefix table. No Python, no driver state."""
    if not sizes or any(s < 1 for s in sizes):
        raise ValueError(f"vocab_coverage: sizes must be >= 1, got {sizes}")
    from pyspark.sql import Window

    spark = df.sparkSession
    terms = (df.select(F.explode(tokens(text_col)).alias("term"))
             .filter(F.length("term") > 0)
             .groupBy("term").agg(F.count("*").alias("cnt")))
    total = terms.agg(F.sum("cnt").alias("total_tokens"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("term"))
    ranked = (terms.withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= max(sizes)))
    sz = spark.createDataFrame([(int(s),) for s in sorted(set(sizes))],
                               "vocab_size long")
    cov = (ranked.join(F.broadcast(sz), F.col("rk") <= F.col("vocab_size"))
           .groupBy("vocab_size")
           .agg(F.sum("cnt").alias("covered_tokens")))
    ratio = (F.col("covered_tokens").cast("double")
             / F.col("total_tokens").cast("double"))
    return (cov.crossJoin(F.broadcast(total))
            .select("vocab_size",
                    F.col("covered_tokens").cast("long")
                    .alias("covered_tokens"),
                    F.col("total_tokens").cast("long")
                    .alias("total_tokens"),
                    (F.floor(ratio * 1_000_000) / 1_000_000)
                    .alias("coverage_q")))
