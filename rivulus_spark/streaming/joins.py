"""Stream-stream joins: correlating two live streams in event time.

A stream-stream join is stateful on BOTH sides — each side buffers rows
until the other side can no longer produce a match. Two things bound
that state (and both are required on unbounded streams):

- a **watermark** on each input (how late a row may arrive), and
- a **time-range condition** tying the two event times together
  (how far apart matching rows may be).

From those Spark derives a per-side state-retention horizon and evicts
buffered rows the moment they can no longer join — the state store
holds only the active correlation window, not the stream's history,
which is what keeps the operator viable on an unbounded 100 TB/day
feed. The join itself shuffles both sides on the equi-key, so key skew
matters exactly as it does for a batch join (salt upstream if a single
user/session dominates).

Inner joins emit as matches happen; outer joins additionally emit the
unmatched row once its side's horizon passes (so outer results are
delayed by the watermark, by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, on: str,
                  left_time: str, right_time: str,
                  lower: str, upper: str,
                  left_watermark: str | None = None,
                  right_watermark: str | None = None,
                  how: str = "inner",
                  extra: Column | None = None) -> DataFrame:
    """Join rows with equal ``on`` keys whose event times satisfy
    ``left_time + lower <= right_time <= left_time + upper`` (bounds as
    SQL interval strings, e.g. ``lower="-30 minutes"``, ``upper="0
    seconds"``). Works identically for two batch frames (plain range
    join, no state) and two streaming frames (state-bounded
    stream-stream join) — the batch form IS the correctness oracle for
    the streaming one.

    Column naming: every right-side column is suffixed ``_r`` (the
    engine's join contract for overlapping names, frame.py `_right`),
    including the key and time columns, so downstream projections are
    unambiguous.
    """
    if left.isStreaming and right.isStreaming:
        if left_watermark is None or right_watermark is None:
            raise ValueError(
                "stream-stream joins require watermarks on both sides "
                "(state would grow without bound)")
    # watermark is applied per-side, only to the streaming side(s) —
    # in particular a batch-left/streaming-right call must still bound
    # the streaming side's state
    if left.isStreaming and left_watermark is not None:
        left = left.withWatermark(left_time, left_watermark)
    if right.isStreaming and right_watermark is not None:
        right = right.withWatermark(right_time, right_watermark)
    # the _r-suffix contract breaks if a suffixed name collides with an
    # existing column (chained interval_joins, or a right frame that
    # already carries both 'x' and 'x_r' — the sequential rename would
    # then produce a corrupt duplicate column); fail eagerly instead
    suffixed = [f"{c}_r" for c in right.columns]
    clash = ({s for s in suffixed if s in left.columns}
             | {s for s in suffixed if s in right.columns}
             | {s for s in suffixed if suffixed.count(s) > 1})
    if clash:
        raise ValueError(
            f"interval_join: suffixed right column(s) {sorted(clash)} "
            f"collide with existing columns; rename before joining")
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, f"{c}_r")
    lt, rt = F.col(left_time), F.col(f"{right_time}_r")
    cond = (
        (F.col(on) == F.col(f"{on}_r"))
        & (rt >= lt + F.expr(f"INTERVAL {lower}"))
        & (rt <= lt + F.expr(f"INTERVAL {upper}"))
    )
    if extra is not None:
        cond = cond & extra
    return left.join(r, cond, how)
