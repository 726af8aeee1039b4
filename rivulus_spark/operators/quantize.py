"""Embedding quantization: symmetric per-vector int8.

Embedding tables dominate storage in similarity/dedup pipelines (a
100 TB corpus's 768-dim float32 embeddings are ~0.3 TB per billion
rows); int8 quantization cuts that 4x and is what vector stores
actually persist. This operator quantizes and reports per-vector
reconstruction error WITHOUT a Python UDF: everything is codegen
array arithmetic, and the squared error comes from the algebraic
identity

    ||x - s*q||^2 = x.x - 2s*(x.q) + s^2*(q.q),   s = scale/127

so no reconstructed vector is ever materialized — three fold dot
products per row, one corpus scan, zero shuffles. Superset operator
(the reference engine at /root/reference has no vector surface).

Float determinism: the folds are sequential left-to-right (bit-equal
to DuckDB's list_dot_product — see the workload float notes), the
quantized values use floor (round() diverges across engines on .5
halves), and reported floats are floor-truncated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import dot


def _floorq(c: Column, digits: int) -> Column:
    p = 10 ** digits
    return F.floor(c * p) / p


def quantize_int8_report(df: DataFrame, vec_col: str = "embedding",
                         id_col: str = "vec_id") -> DataFrame:
    """Per-vector quantization report ``(vec_id, dim, scale_q, n_sat,
    sq_err_q)``: the symmetric int8 scale (max |x| / 127), how many
    elements saturate at |q| = 127, and the squared reconstruction
    error. ``scale_q`` is 6-decimal and ``sq_err_q`` 9-decimal
    floor-truncated. All-zero vectors quantize to all-zero with
    scale 0 and error 0 (guarded — no 0/0).

    The per-element fold arithmetic dominates the scan, so the input
    is ``spread`` across cores first (no-op on well-split inputs; see
    partitioning.py)."""
    from ..partitioning import spread

    df = spread(df)
    xd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    scale = F.array_max(F.transform(xd, F.abs))
    q = F.transform(
        xd, lambda v: F.when(scale == 0.0, F.lit(0).cast("long"))
        .otherwise(F.greatest(F.lit(-127).cast("long"),
                              F.least(F.lit(127).cast("long"),
                                      F.floor(v / scale * 127)))))
    qd = F.transform(q, lambda v: v.cast("double"))
    s = scale / 127.0
    ssq_x = dot(xd, xd)
    dot_xq = dot(xd, qd)
    ssq_q = dot(qd, qd)
    err = ssq_x - 2.0 * s * dot_xq + s * s * ssq_q
    n_sat = F.size(F.filter(q, lambda v: F.abs(v) == 127))
    return df.select(
        F.col(id_col),
        F.size(F.col(vec_col)).cast("long").alias("dim"),
        _floorq(scale, 6).alias("scale_q"),
        n_sat.cast("long").alias("n_sat"),
        _floorq(err, 9).alias("sq_err_q"))
