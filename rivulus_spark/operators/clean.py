"""Text cleaning for training-data curation: HTML stripping, PII
redaction, and Gopher/C4-style quality heuristics.

Everything here is a pure JVM-side column expression (regexp_replace /
regexp_count / length arithmetic) that runs inside whole-stage codegen:
the whole module is a projection over the scan — no shuffle, no Python,
linear in bytes scanned, and therefore safe at 100 TB by construction.

All regexes are RE2-compatible (no lookarounds, no backreferences) so
the same pattern runs identically under Java regex (Spark), RE2
(DuckDB's oracle), and Go/Rust regex engines — a deliberate portability
contract, mirroring the BPE pattern in text.py.

Reference: the reference engine (/root/reference/src/expressions/
expr.rs) has no scalar string functions at all; these are north-star
superset operators for the LLM-pipeline use case (quality filtering and
PII removal are the first two passes any web-scale corpus gets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import cache
from .text import token_count, tokens

# ---------------------------------------------------------------------
# HTML stripping
# ---------------------------------------------------------------------

#: tags (open/close/self-closing) — deliberately simple: markup-as-text
#: cleanup for web-scraped corpora, not an HTML parser
TAG_PATTERN = r"<[^>]+>"

#: the entities worth decoding without an entity table. ``&amp;`` is
#: decoded LAST: decoding it first would make double-escaped markup
#: ("&amp;lt;" — the author wrote a literal "&lt;") re-enter the
#: pipeline as "&lt;" and wrongly decode to "<"
_ENTITIES = [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def strip_html(col: str | Column) -> Column:
    """Drop tags, decode the common entities, collapse whitespace.
    Order matters: tags first (entities inside attributes disappear
    with the tag), then entities, then whitespace."""
    c = F.regexp_replace(_c(col), TAG_PATTERN, " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return normalize_ws(c)


def normalize_ws(col: str | Column) -> Column:
    """Collapse runs of whitespace to single spaces and trim."""
    return F.trim(F.regexp_replace(_c(col), r"\s+", " "))


# ---------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------

#: detection patterns, applied in this order (email before phone so the
#: digits in a local-part are not re-matched; IP before phone so dotted
#: quads don't half-match a phone pattern)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def pii_scrub(col: str | Column) -> Column:
    """Replace every PII match with its placeholder token."""
    c = _c(col)
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document match counts (``n_email``, ``n_ipv4``, ...) plus
    ``n_pii`` total — the audit signal curation pipelines threshold on
    (drop documents with pathological PII density, scrub the rest).

    Semantics: each pattern counts ITS OWN matches against the raw
    text, so one string matching two patterns (an email whose local
    part embeds a phone-shaped digit run) contributes to both counts
    and twice to ``n_pii`` — per-pattern match totals, not distinct
    PII items. ``pii_scrub``'s sequential replacement is where the
    ordering protection lives; thresholds on ``n_pii`` should treat it
    as an upper bound on item count."""
    out = df
    for name, pat, _ in PII_PATTERNS:
        out = out.withColumn(f"n_{name}",
                             F.regexp_count(_c(text_col), F.lit(pat))
                             .cast("long"))
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total)


# ---------------------------------------------------------------------
# Gopher / C4-style quality heuristics
# ---------------------------------------------------------------------

#: symbols whose density marks boilerplate/junk (Gopher's symbol ratio)
_SYMBOLS = ["#", "...", "…"]

#: stopwords whose *presence* marks real prose (Gopher requires >=2)
_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(df: DataFrame, text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_wl: float = 3.0, max_mean_wl: float = 10.0,
                   max_symbol_ratio: float = 0.1,
                   min_alpha_ratio: float = 0.8,
                   min_stop_hits: int = 2) -> DataFrame:
    """Per-document quality flags after Gopher's rules (Rae et al. 2021,
    "Scaling Language Models", Appendix A1.1) restricted to what is
    computable as pure column arithmetic:

    - ``wc`` in [min_words, max_words]
    - mean word length in [min_mean_wl, max_mean_wl]
    - symbol-to-word ratio (# / ellipsis) <= max_symbol_ratio
    - fraction of words containing an alphabetic char >= min_alpha_ratio
    - at least ``min_stop_hits`` distinct common stopwords present

    Emits one boolean per rule plus the conjunction ``gopher_pass``.
    Flags (not a filter) so the caller can audit rule-by-rule rejection
    rates before committing to a corpus-wide drop.
    """
    t = _c(text_col)
    wc = token_count(t)
    # mean word length == non-space chars / words
    nonspace = F.length(F.regexp_replace(t, r"\s+", ""))
    mean_wl = nonspace / wc
    n_sym = None
    for s in _SYMBOLS:
        c = F.regexp_count(t, F.lit(s if s != "..." else r"\.\.\."))
        n_sym = c if n_sym is None else n_sym + c
    # Gopher's rule is the fraction of WORDS containing an alphabetic
    # character — counting alpha RUNS instead lets 'a-b-c' contribute 3
    # and pushes junk past the threshold (review r4, verified)
    n_alpha_words = F.size(
        F.filter(tokens(t), lambda w: w.rlike("[A-Za-z]")))
    n_stops = None
    for s in _GOPHER_STOPS:
        hit = (F.regexp_count(t, F.lit(rf"\b{s}\b")) > 0).cast("int")
        n_stops = hit if n_stops is None else n_stops + hit

    out = (df
           .withColumn("wc", wc.cast("long"))
           .withColumn("mean_wl", mean_wl)
           .withColumn("flag_wc",
                       (wc >= min_words) & (wc <= max_words))
           .withColumn("flag_mean_wl",
                       (mean_wl >= min_mean_wl) & (mean_wl <= max_mean_wl))
           .withColumn("flag_symbols",
                       (n_sym / wc) <= max_symbol_ratio)
           .withColumn("flag_alpha",
                       (n_alpha_words / wc) >= min_alpha_ratio)
           .withColumn("flag_stops", n_stops >= min_stop_hits))
    return out.withColumn(
        "gopher_pass",
        F.col("flag_wc") & F.col("flag_mean_wl") & F.col("flag_symbols")
        & F.col("flag_alpha") & F.col("flag_stops"))


# ---------------------------------------------------------------------
# C4-style line-level filtering
# ---------------------------------------------------------------------

def _kept_lines(col: str | Column, min_words: int) -> Column:
    """Array of lines surviving the C4 line rule — the single place the
    keep predicate (split on newline, >= min_words words) is encoded,
    shared by the transform (c4_keep_lines) and the audit view
    (c4_line_stats) so the two can't desynchronize."""
    lines = F.split(_c(col), r"\n")
    return F.filter(
        lines,
        lambda ln: F.size(F.split(F.trim(ln), r"\s+")) >= min_words)


def c4_keep_lines(col: str | Column, min_words: int = 5) -> Column:
    """C4's line-level pass (Raffel et al. 2020 §2.2, restricted to
    relationally-expressible rules): split the document into lines,
    drop lines with fewer than ``min_words`` words, rejoin. Gopher
    (gopher_quality) judges whole documents; this repairs documents by
    removing navigation/boilerplate stubs line by line. Pure array
    expression — no shuffle, no Python."""
    return F.array_join(_kept_lines(col, min_words), "\n")


def dedup_lines(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Intra-document duplicate-line removal (the within-doc sibling of
    corpus dedup — repeated nav bars / footers inside one scraped page
    are the most common boilerplate C4/Gopher-style pipelines strip).
    Adds ``n_lines``, ``n_unique_lines``, ``line_dedup_text`` (first
    occurrence of each line, original order — ``array_distinct``
    keeps first-seen order), and ``uniq_md5``, a digest of the SORTED
    unique lines so the observable is order-independent and portable
    to engines whose distinct-list order differs. Pure array
    expressions — no shuffle, no Python."""
    lines = F.split(_c(text_col), r"\n")
    uniq = F.array_distinct(lines)
    return (df
            .withColumn("n_lines", F.size(lines).cast("long"))
            .withColumn("n_unique_lines", F.size(uniq).cast("long"))
            .withColumn("line_dedup_text", F.array_join(uniq, "\n"))
            .withColumn("uniq_md5",
                        F.md5(F.array_join(F.array_sort(uniq), "\n"))))


def cross_doc_line_dedup(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         min_docs: int = 3) -> DataFrame:
    """Corpus-level boilerplate line removal (the C4/RefinedWeb step
    intra-doc dedup_lines cannot see): drop every line that appears in
    at least ``min_docs`` DISTINCT documents — nav bars, footers,
    cookie banners, license stubs — preserving each document's
    remaining line order. Output: one row per input document with
    ``n_lines``, ``n_kept``, ``clean_text`` (kept lines rejoined) and
    ``clean_md5`` (its digest, the engine-portable observable).

    Scale shape (100 TB): the exploded line stream carries
    (id, pos, md5(line)) — fixed-width rows, the raw line text rides
    only to the reassembly of docs that need it; the boilerplate table
    is a distinct-doc count with map-side partials over the 16-byte
    line hash; and ONLY AFFECTED documents (those sharing a line with
    the boilerplate set — a semi-join) are reassembled via
    group-and-sort. Untouched documents project straight through with
    their original text: the reassembly shuffle is proportional to
    boilerplate INCIDENCE, never the corpus. No windows, no Python."""
    lines = F.split(_c(text_col), r"\n")
    rows = (df.select(F.col(id_col).alias("id"),
                      F.posexplode(lines).alias("pos", "line"))
            .withColumn("h", F.md5("line")))
    rows = cache.persist(rows)
    bp = (rows.groupBy("h")
          .agg(F.countDistinct("id").alias("n_docs"))
          .filter(F.col("n_docs") >= min_docs)
          .select("h"))
    bp = cache.persist(bp)
    affected = rows.join(bp, "h", "semi").select("id").distinct()
    arows = (rows.join(affected, "id", "semi")
             .join(bp.withColumn("__bp", F.lit(True)), "h", "left"))
    rebuilt = (arows.groupBy("id")
               .agg(F.count("*").alias("n_lines"),
                    F.array_sort(F.collect_list(
                        F.when(F.col("__bp").isNull(),
                               F.struct("pos", "line")))).alias("kept"))
               .select(
                   F.col("id").alias(id_col),
                   F.col("n_lines").cast("long"),
                   F.size("kept").cast("long").alias("n_kept"),
                   F.array_join(F.transform(F.col("kept"),
                                            lambda x: x["line"]), "\n")
                   .alias("clean_text")))
    untouched = (df.select(F.col(id_col), F.col(text_col))
                 .join(affected.select(F.col("id").alias(id_col)),
                       id_col, "anti")
                 .select(
                     id_col,
                     F.size(lines).cast("long").alias("n_lines"),
                     F.size(lines).cast("long").alias("n_kept"),
                     F.col(text_col).alias("clean_text")))
    return (rebuilt.unionByName(untouched)
            .withColumn("clean_md5", F.md5("clean_text")))


def c4_line_stats(df: DataFrame, text_col: str = "text",
                  min_words: int = 5) -> DataFrame:
    """Adds ``n_lines``, ``n_lines_kept``, and the cleaned text's
    digest-ready column ``c4_text`` — the audit view of the line
    filter's aggressiveness before committing to it corpus-wide."""
    lines = F.split(_c(text_col), r"\n")
    kept_arr = _kept_lines(text_col, min_words)
    # count the filtered ARRAY, not a re-split of the joined string:
    # joining an empty keep-set gives "" which would re-split to [""]
    # (count 1, where the truth is 0)
    return (df
            .withColumn("n_lines", F.size(lines).cast("long"))
            .withColumn("n_lines_kept", F.size(kept_arr).cast("long"))
            .withColumn("c4_text", F.array_join(kept_arr, "\n")))


# ---------------------------------------------------------------------
# Lexicon (blocklist) scoring
# ---------------------------------------------------------------------

def lexicon_score(df: DataFrame, lexicon: list[str],
                  text_col: str = "text",
                  max_ratio: float = 0.02) -> DataFrame:
    """Wordlist-based content scoring: per-document count of
    word-boundary matches against ``lexicon`` (a blocklist, a domain
    vocabulary, a safety list — the operator is policy-agnostic),
    their ratio to the word count, and a ``lexicon_pass`` flag at
    ``max_ratio``. The standard cheap pass before any model-based
    safety scoring. One regex alternation, pure codegen projection.

    Terms are regex-escaped individually (``re.escape`` emits only
    backslash-punctuation escapes, legal in both Java regex and RE2 —
    no ``\\Q..\\E``, which RE2 lacks), so blocklist entries like
    ``c++`` or ``a.out`` match literally. ``\\b`` anchors are applied
    per term edge, and only where that edge is a word character — a
    ``\\b`` next to punctuation can never match (no word boundary
    between ``+`` and a space), so punctuation edges are left
    unanchored instead of silently unmatchable."""
    if not lexicon:
        raise ValueError("lexicon must be non-empty")
    if any(not t for t in lexicon):
        raise ValueError("lexicon terms must be non-empty strings")
    import re as _re

    # the word-char test for \b anchoring must be ASCII: Java's \b is
    # Unicode-aware but RE2/Go/Rust's is ASCII-only, so anchoring a
    # term whose edge is a non-ASCII letter (e.g. 'café') would be
    # silently unmatchable on the least-common-denominator engines the
    # portability contract names — leave such edges unanchored instead
    _ascii_word = _re.compile(r"[A-Za-z0-9_]")

    def _term_pat(t: str) -> str:
        p = _re.escape(t)
        if _ascii_word.match(t[0]):
            p = r"\b" + p
        if _ascii_word.match(t[-1]):
            p = p + r"\b"
        return p

    pat = "(" + "|".join(_term_pat(t) for t in sorted(lexicon)) + ")"
    t = _c(text_col)
    n_hits = F.regexp_count(t, F.lit(pat))
    wc = token_count(t)
    ratio = n_hits.cast("double") / wc
    return (df
            .withColumn("n_lexicon_hits", n_hits.cast("long"))
            .withColumn("lexicon_ratio", ratio)
            .withColumn("lexicon_pass", ratio <= max_ratio))
