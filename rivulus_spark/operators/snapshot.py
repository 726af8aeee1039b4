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

from .. import cache
from .text import tokens


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
    side for removed docs).

    Precondition (r7 ADVICE): ``id_col`` must be unique WITHIN each
    snapshot — the same contract quota_cap and global_shuffle document
    for their id columns. A duplicated id would fan out through the
    full-outer join (every old copy × every new copy) and multiply
    diff_report counts; a snapshot with re-issued ids is itself the
    bug the diff should surface, so this operator does not silently
    aggregate copies away. Dedup first (e.g. exact_dedup) if ids can
    legitimately repeat."""
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


def datacard(df: DataFrame, group_col: str = "source",
             text_col: str = "text", lang_col: str = "lang",
             id_col: str = "doc_id", short_tokens: int = 50) -> DataFrame:
    """Per-group release datasheet — the one-table summary a corpus
    ships with: document and token volume, exact-duplicate share,
    short-doc share, mean stopword ratio, and language-mix entropy.
    Every number is the value a datasheet-for-datasets audit quotes
    before sign-off.

    Scale shape: two corpus-sized partial aggregates (the per-doc
    feature projection folded into one group-by; the duplicate-share
    pass groups the 16-byte content fingerprint, then its per-group
    rollup joins back on the tiny group table) and one k-row language
    histogram for the entropy — nothing document-sized crosses a
    shuffle twice. Ratios floor-truncate (3 decimals) per the
    cross-engine convention; entropy in nats.
    """
    from .text import stopword_ratio, token_count

    from .. import cache

    g = F.col(group_col).alias("grp")
    # persisted: four aggregations consume this projection (volume
    # stats, corpus-wide fingerprint counts, the dup attribution, the
    # language histogram) — without it each re-runs the regex battery
    # and the md5 over full document text (the repo-wide
    # multi-consumer persist convention, cache.py)
    base = cache.persist(df.select(
        g, F.col(lang_col).alias("lang"),
        token_count(text_col).alias("n_tok"),
        stopword_ratio(text_col).alias("stop_r"),
        F.md5(F.col(text_col)).alias("fp")))

    # mean of the floored per-doc ratios, accumulated EXACTLY: each
    # stop_r is k/1000, so round(stop_r*1000) recovers the integer k
    # and integer sums are order-independent — the mean is then ONE
    # identical IEEE division on both engines (a float avg's partial
    # sums could flip the floor at an exact k/1000 boundary)
    per_group = (base.groupBy("grp")
                 .agg(F.count("*").alias("n_docs"),
                      F.sum("n_tok").alias("total_tokens"),
                      F.sum(F.round(F.col("stop_r") * 1000).cast("long"))
                      .alias("stop_milli"),
                      F.sum((F.col("n_tok") < short_tokens).cast("long"))
                      .alias("n_short")))

    # duplicate share: docs whose exact content appears >= 2 times in
    # the WHOLE corpus (cross-group mirrors count — that is the audit
    # question), attributed to each group they appear in
    fp_counts = (base.groupBy("fp")
                 .agg(F.count("*").alias("n_fp")))
    dups = (base.join(fp_counts, "fp")
            .filter(F.col("n_fp") >= 2)
            .groupBy("grp")
            .agg(F.count("*").alias("n_dup")))

    lang_hist = (base.groupBy("grp", "lang")
                 .agg(F.count("*").alias("n")))
    tot = lang_hist.groupBy("grp").agg(F.sum("n").alias("nt"))
    ent = (lang_hist.join(tot, "grp")
           .select("grp", (F.col("n") / F.col("nt")).alias("p"))
           .groupBy("grp")
           .agg((-F.sum(F.col("p") * F.log("p"))).alias("lang_entropy")))

    f3 = lambda c: (F.floor(c * 1000) / 1000)  # noqa: E731
    return (per_group
            .join(dups, "grp", "left")
            .join(ent, "grp")
            .select(F.col("grp").alias(group_col),
                    "n_docs", "total_tokens",
                    f3(F.coalesce(F.col("n_dup"), F.lit(0))
                       / F.col("n_docs")).alias("dup_frac"),
                    f3(F.col("n_short") / F.col("n_docs"))
                    .alias("short_frac"),
                    (F.floor(F.col("stop_milli") / F.col("n_docs"))
                     / 1000).alias("mean_stopword_ratio"),
                    f3(F.col("lang_entropy")).alias("lang_entropy")))


def population_stability(old: DataFrame, new: DataFrame,
                         value: Column | str,
                         group_col: str | None = None,
                         n_bins: int = 16,
                         eps: float = 1e-4) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    corpus feature — THE standard drift audit a training-data pipeline
    runs per release (did the token-length / quality-score / document-
    size mix move between yesterday's corpus and today's?). Output:
    one row per (``group_col``...,) bin with the old/new mass and the
    bin's PSI term, plus the bin bounds for reporting; ``sum(psi_term)
    over the group`` is the headline index (< 0.1 stable, 0.1-0.25
    drifting, > 0.25 shifted — the classic scorecard thresholds).

    Binning is FIXED log2-scale — bin = floor(log2(1+floor(x))),
    computed as the INTEGER bit length of 1+floor(x) (length of the
    binary string), so bin assignment is exact integer arithmetic on
    both engines, with no libm-log2 last-ulp risk at power-of-two
    boundaries — not quantile-based: percentile sketches are
    engine-specific (GK accuracy) and release-over-release audits need
    the SAME bin edges on both sides anyway (a quantile re-fit per
    release would make indices incomparable across releases). Values
    floor to a long first (token counts / doc sizes are integers;
    scale fractional scores up before auditing); negatives clamp to
    bin 0. Masses and the PSI term floor-truncate to 6 decimals — the
    cross-engine convention — and ``eps`` replaces empty-bin masses so
    ln(p/q) stays finite (the standard PSI smoothing).

    Scale shape: one partial-aggregated group-by per snapshot over
    (group, bin) — shuffle rows are k-row histograms, never documents
    — then a full-outer join of two tiny histogram tables. No windows,
    no Python, no driver loop."""
    gcols = [group_col] if group_col else []
    return psi_from_histograms(
        psi_histogram(old, value, gcols, n_bins, "old"),
        psi_histogram(new, value, gcols, n_bins, "new"),
        gcols, eps)


def psi_bin(value: Column | str, n_bins: int = 16) -> Column:
    """The PSI log2-size bin as a column expression — exact integer
    bit-length arithmetic (see :func:`population_stability`), exposed
    separately so a STREAMING plan can bin rows map-side with the
    identical edges the batch audit uses.

    Non-finite and huge inputs clamp BEFORE the long cast (r8 review):
    an unguarded double->long cast raises CAST_OVERFLOW under Spark
    4's ANSI default for values >= 2^63, +/-inf, or NaN — and a drift
    audit crashing on the degenerate feature values an upstream bug
    produces is exactly the alarm-not-crash contract violation the
    empty-side fix removed. The 1e15 ceiling is semantically free:
    any value >= 2^(n_bins-1) already lands in the top bin (Spark's
    float ordering puts NaN above +inf, so least() absorbs both into
    the ceiling; -inf clamps to 0 via greatest)."""
    v = (F.col(value) if isinstance(value, str) else value).cast("double")
    safe = F.greatest(F.lit(0.0), F.least(v, F.lit(1.0e15)))
    x = F.floor(safe).cast("long")
    return F.least(F.lit(n_bins - 1),
                   (F.length(F.bin(x + 1)) - 1).cast("int"))


def psi_histogram(df: DataFrame, value: Column | str,
                  gcols: list[str], n_bins: int, tag: str) -> DataFrame:
    """(gcols..., bin, n_<tag>) histogram of :func:`psi_bin` — the
    k-row aggregate both PSI entry points reduce a corpus to."""
    return (df.select(*gcols, psi_bin(value, n_bins).alias("bin"))
            .groupBy(*gcols, "bin")
            .agg(F.count("*").alias(f"n_{tag}")))


def psi_from_histograms(hold: DataFrame, hnew: DataFrame,
                        gcols: list[str],
                        eps: float = 1e-4) -> DataFrame:
    """PSI terms from two pre-aggregated histograms ``(gcols..., bin,
    n_old)`` / ``(gcols..., bin, n_new)`` — the k-row tail shared by
    the batch audit (:func:`population_stability`) and the streaming
    drift monitor (whose new-side histogram arrives from a streaming
    aggregation drain). Everything here runs over bin-count-sized
    tables; the per-group total windows see <= n_bins rows each."""
    from pyspark.sql import Window

    j = hold.join(hnew, gcols + ["bin"], "full_outer")
    w = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    f6 = lambda c: F.floor(c * 1_000_000) / 1_000_000  # noqa: E731
    n_old = F.coalesce(F.col("n_old"), F.lit(0))
    n_new = F.coalesce(F.col("n_new"), F.lit(0))
    # a side (or a group's side) with ZERO rows must alarm, not crash:
    # unguarded 0/0 raises DIVIDE_BY_ZERO under Spark 4's ANSI default
    # exactly when the audit matters most (a source vanished from the
    # new release / an upstream shipped an empty snapshot). Zero total
    # -> every mass 0 -> eps drives each term to its maximum.
    tot_old = F.sum(n_old).over(w)
    tot_new = F.sum(n_new).over(w)
    p_old = F.when(tot_old > 0, n_old / tot_old).otherwise(F.lit(0.0))
    p_new = F.when(tot_new > 0, n_new / tot_new).otherwise(F.lit(0.0))
    po = F.greatest(F.lit(float(eps)), p_old)
    pn = F.greatest(F.lit(float(eps)), p_new)
    term = (pn - po) * F.log(pn / po)
    return (j.select(*gcols, "bin",
                     (F.pow(F.lit(2.0), F.col("bin")) - 1).alias("lo"),
                     f6(p_old).alias("p_old"),
                     f6(p_new).alias("p_new"),
                     f6(term).alias("psi_term"))
            .orderBy(*gcols, "bin"))


def source_term_divergence(df: DataFrame, v: int = 64,
                           text_col: str = "text",
                           group_col: str = "source") -> DataFrame:
    """Per-source CONTENT divergence from the corpus: Jensen-Shannon
    divergence terms between each source's token distribution and the
    corpus-wide one, over the global top-``v`` vocabulary plus an
    ``<other>`` bucket — one row per (source, bucket) with the
    source mass ``p``, corpus mass ``q``, and the bucket's JS term;
    ``sum(js_term)`` per source is the headline (0 = identical mix,
    ln 2 = disjoint). Where :func:`population_stability` audits a
    NUMERIC feature's drift between releases, this audits each
    source's *content* against the corpus — the distributional-outlier
    signal domain-weighting and source-triage passes rank on (a
    source whose top-term mix diverges hard is machine spam, a wrong
    language, or a mislabeled crawl).

    JS (not KL): bounded, symmetric, and defined at p=0 with no eps
    smoothing — a zero-mass bucket contributes ``q/2 · ln 2`` exactly,
    so the per-bucket terms are exact and the caller's sum needs no
    floor-order caveat beyond the terms' own 6-decimal truncation.
    The bucket set is data-defined (top-v global terms + a tail
    bucket iff tail terms exist), so every bucket has q > 0 by
    construction. The tail sentinel is ``"< other terms >"`` — it
    CONTAINS SPACES, so no whitespace-split token can ever collide
    with it (r8 review: a markup corpus where the literal token
    ``<other>`` ranks top-v would otherwise silently merge that
    term's mass into the tail).

    Scale shape: ONE token-stream aggregation to (source, token)
    counts — the only corpus-sized shuffle, map-side partial-combined
    — then vocabulary-sized work: the global top-v cut (group-limit
    rank over the aggregated term table), a broadcast bucket
    remapping, and a (sources × ≤v+1)-row grid built from two tiny
    aggregates so zero-mass buckets surface as rows. Windows run over
    ≤ v+1 rows per source."""
    from pyspark.sql import Window

    f6 = lambda c: F.floor(c * 1_000_000) / 1_000_000  # noqa: E731
    toks = df.select(F.col(group_col).alias("src"),
                     F.explode(tokens(text_col)).alias("t"))
    counts = cache.persist(
        toks.groupBy("src", "t").agg(F.count("*").alias("c")))
    glob = counts.groupBy("t").agg(F.sum("c").alias("gc"))
    wr = Window.orderBy(F.col("gc").desc(), F.col("t").asc())
    topv = (glob.select("t", F.row_number().over(wr).alias("r"))
            .filter(F.col("r") <= v).select("t", F.lit(1).alias("__top")))
    bucketed = (counts.join(F.broadcast(topv), "t", "left")
                .select("src",
                        F.when(F.col("__top") == 1, F.col("t"))
                        .otherwise(F.lit("< other terms >"))
                        .alias("bucket"),
                        "c")
                .groupBy("src", "bucket").agg(F.sum("c").alias("n")))
    bucketed = cache.persist(bucketed)
    qdist = (bucketed.groupBy("bucket").agg(F.sum("n").alias("gn")))
    # grid: every (source, bucket) pair, so buckets a source lacks
    # emit p=0 rows (their q/2·ln2 mass is real divergence)
    grid = (bucketed.select("src").distinct()
            .crossJoin(F.broadcast(qdist)))
    ws = Window.partitionBy("src")
    j = (grid.join(bucketed, ["src", "bucket"], "left")
         .select("src", "bucket", "gn",
                 F.coalesce(F.col("n"), F.lit(0)).alias("n")))
    p = F.col("n") / F.sum("n").over(ws)
    q = F.col("gn") / F.sum("gn").over(ws)
    m = (p + q) / 2
    js = (F.when(F.col("n") > 0, p * F.log(p / m) / 2).otherwise(F.lit(0.0))
          + q * F.log(q / m) / 2)
    return (j.select(F.col("src").alias(group_col), "bucket",
                     f6(p).alias("p"), f6(q).alias("q"),
                     f6(js).alias("js_term"))
            .orderBy(group_col, "bucket"))


def vocabulary_diff(old: DataFrame, new: DataFrame,
                    min_count: int = 5,
                    text_col: str = "text") -> DataFrame:
    """Term-level release diff — the vocabulary-churn audit that
    completes the release suite (doc-level :func:`dataset_diff`, size
    drift :func:`population_stability`, content mix
    :func:`source_term_divergence`): one row per term whose count
    reaches ``min_count`` in EITHER snapshot, with both counts, the
    new/old ratio, and a status in ``added | vanished | grew | shrunk
    | stable``. A release where thousands of terms 'appeared' is a new
    crawl source (or an encoding bug); one where they 'vanished' is an
    over-aggressive filter rule — exactly the diff a data-release
    review reads.

    Status thresholds are INTEGER comparisons (grew: 2·c_new ≥
    3·c_old, i.e. ratio ≥ 1.5; shrunk symmetric), so classification is
    engine-exact with no float boundary; the reported ``ratio``
    floor-truncates to 3 decimals and is null for added terms (no old
    mass to divide by — and the unguarded divide would raise under
    ANSI).

    Scale shape: one map-side-combined token count per snapshot (the
    only corpus-sized stages), a full-outer join of two
    vocabulary-sized count tables keyed on the term, and a pure
    projection. No windows, no Python, no driver state."""
    def counts(df: DataFrame, tag: str) -> DataFrame:
        return (df.select(F.explode(tokens(text_col)).alias("term"))
                .groupBy("term").agg(F.count("*").alias(f"c_{tag}")))

    j = counts(old, "old").join(counts(new, "new"), "term",
                                "full_outer")
    c_old = F.coalesce(F.col("c_old"), F.lit(0))
    c_new = F.coalesce(F.col("c_new"), F.lit(0))
    status = (F.when(c_old == 0, F.lit("added"))
              .when(c_new == 0, F.lit("vanished"))
              .when(2 * c_new >= 3 * c_old, F.lit("grew"))
              .when(2 * c_old >= 3 * c_new, F.lit("shrunk"))
              .otherwise(F.lit("stable")))
    ratio = F.when(c_old > 0,
                   F.floor(c_new * 1000 / c_old) / 1000)
    return (j.filter((c_old >= min_count) | (c_new >= min_count))
            .select("term", c_old.alias("c_old"), c_new.alias("c_new"),
                    ratio.alias("ratio"), status.alias("status")))
