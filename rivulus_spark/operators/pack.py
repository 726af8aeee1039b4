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
