"""Sequence packing: concatenate-and-chunk documents into fixed-size
context windows.

LLM pre-training consumes fixed-length token sequences; the standard
packing scheme concatenates documents in a deterministic order and
cuts the token stream every ``ctx_len`` tokens. This operator computes
the document→window assignment and per-window occupancy entirely with
integer window arithmetic (cumulative token counts), so the packing is
reproducible and oracle-checkable. Superset operator — the reference
engine (/root/reference) has no text surface.

Scale shape: one codegen projection for per-doc token counts, then a
running-sum window partitioned by the stream key — a single hash
shuffle on ``part_col``, each partition scanned once sequentially, and
a final partial-aggregated groupBy on (stream, window id). Shuffle rows
are (id, token-count) pairs, never text. The stream key IS the
parallelism unit: at 100 TB you pack per (source, shard) — thousands
of independent streams — not one global stream, which would serialize
the cumsum on a single task. ``part_col`` makes that choice explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import bpe_token_count


def pack_context_windows(df: DataFrame, ctx_len: int = 512,
                         text_col: str = "text", id_col: str = "doc_id",
                         part_col: str = "source") -> DataFrame:
    """Per-window packing report ``(part, window_id, n_docs,
    total_tokens, fill_frac)``: documents are streamed in (part, id)
    order, each document lands in the window where its first token
    falls (``floor(tokens_before / ctx_len)``), and ``fill_frac`` is
    the window's token occupancy (3-decimal floor-truncated so the
    ratio is engine-exact). Documents longer than ``ctx_len`` span
    windows but are counted where they start — the accounting matches
    the concatenate-then-cut training layout."""
    toks = df.select(F.col(part_col).alias("part"), F.col(id_col),
                     bpe_token_count(text_col).cast("long").alias("n_tok"))
    # ROWS frame, not the default RANGE: RANGE treats rows tied on the
    # order key as peers that each see the full peer-group sum, so
    # duplicate (part, id) pairs would all skip past their own window
    # (window 0 can vanish entirely); ROWS keeps the running sum a
    # true prefix sum regardless of ties
    w = (Window.partitionBy("part").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    assigned = toks.select(
        "part", "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok"))
                / F.lit(ctx_len)).alias("window_id"))
    return (assigned.groupBy("part", "window_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("total_tokens"))
            .select("part", "window_id", "n_docs", "total_tokens",
                    (F.floor(F.col("total_tokens") * 1000 / F.lit(ctx_len))
                     / 1000).alias("fill_frac")))


def context_length_plan(df: DataFrame, ctx_lens: list[int],
                        text_col: str = "text", id_col: str = "doc_id",
                        part_col: str = "source") -> DataFrame:
    """Context-length planning audit: for each candidate ``ctx_len``,
    the cost of the two standard sequence layouts side by side —
    ``(ctx_len, n_docs, total_tokens, pad_windows, pad_frac,
    cut_windows, frag_docs, frag_frac)``:

    - PAD layout (one document per window, pad to ctx): windows =
      sum(ceil(tokens/ctx)); ``pad_frac`` is the padding share of the
      window budget — what short documents waste.
    - CUT layout (concatenate-then-cut, pack_context_windows' scheme):
      windows = ceil(stream_tokens/ctx) per stream; ``frag_docs`` is
      how many documents a window boundary SPLITS — what long contexts
      buy and short ones destroy (a fragmented doc attends across a
      reset boundary or is truncated, both quality costs).

    The crossing test reuses the packing cumsum: a doc fragments iff
    floor((before + t - 1)/c) > floor(before/c) with t > 0. All
    integer arithmetic; fractions floor-truncate to 6 decimals.

    Scale shape: ONE token-count projection + ONE per-stream cumsum
    window (the pack_context_windows exchange, reused across all
    candidates via a ctx-length explode of k literals), then a k-row
    group-by. Shuffle rows are (part, count) pairs, never text."""
    if not ctx_lens or any(c < 1 for c in ctx_lens):
        raise ValueError(f"ctx_lens must be positive, got {ctx_lens}")
    toks = df.select(F.col(part_col).alias("part"), F.col(id_col),
                     bpe_token_count(text_col).cast("long").alias("n_tok"))
    w = (Window.partitionBy("part").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = toks.select(
        "part", "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("before"))
    ctx = F.explode(F.array(*[F.lit(int(c)) for c in
                              sorted(set(ctx_lens))])).alias("ctx_len")
    per_doc = cum.select("part", "n_tok", "before", ctx)
    c = F.col("ctx_len")
    pad_w = F.floor((F.col("n_tok") + c - 1) / c)  # ceil(t/c)
    frags = F.when(
        (F.col("n_tok") > 0)
        & (F.floor((F.col("before") + F.col("n_tok") - 1) / c)
           > F.floor(F.col("before") / c)), 1).otherwise(0)
    stream_tok = F.col("before") + F.col("n_tok")  # max per part = total
    agg = (per_doc.groupBy("ctx_len")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_tok").alias("total_tokens"),
                F.sum(pad_w).alias("pad_windows"),
                F.sum(frags).alias("frag_docs"),
                # per-part totals: take the max cumsum per (part, ctx)
                # via a second small agg below
                ))
    per_part = (per_doc.groupBy("ctx_len", "part")
                .agg(F.max(stream_tok).alias("part_tokens"))
                .groupBy("ctx_len")
                .agg(F.sum(F.floor((F.col("part_tokens") + c - 1) / c))
                     .alias("cut_windows")))
    out = agg.join(per_part, "ctx_len")
    pad_frac = (F.floor((F.lit(1.0) - F.col("total_tokens").cast("double")
                         / (F.col("pad_windows") * c)) * 1_000_000)
                / 1_000_000)
    frag_frac = (F.floor(F.col("frag_docs").cast("double")
                         / F.col("n_docs") * 1_000_000) / 1_000_000)
    return out.select(
        F.col("ctx_len").cast("long").alias("ctx_len"),
        "n_docs", "total_tokens", "pad_windows",
        pad_frac.alias("pad_frac"),
        "cut_windows", "frag_docs", frag_frac.alias("frag_frac"))
