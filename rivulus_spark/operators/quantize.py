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
    # ONE copy of the int8 code rule: quantized_vec, whose
    # array_repeat(scale) zip already evaluates the dim-cost scale
    # fold once per row instead of once per ELEMENT (the historical
    # transform-lambda form here re-ran it per element — the exact
    # measured-5x inefficiency quantized_vec documents; ADVICE r8).
    # scale itself stays a top-level select expression below (once per
    # row); the codes are exact integers carried in doubles, so n_sat
    # and the fold dots are unchanged bit-for-bit.
    qd = quantized_vec(xd)
    s = scale / 127.0
    ssq_x = dot(xd, xd)
    dot_xq = dot(xd, qd)
    ssq_q = dot(qd, qd)
    err = ssq_x - 2.0 * s * dot_xq + s * s * ssq_q
    n_sat = F.size(F.filter(qd, lambda v: F.abs(v) == 127.0))
    return df.select(
        F.col(id_col),
        F.size(F.col(vec_col)).cast("long").alias("dim"),
        _floorq(scale, 6).alias("scale_q"),
        n_sat.cast("long").alias("n_sat"),
        _floorq(err, 9).alias("sq_err_q"))


def quantized_vec(vec_col: str | Column) -> Column:
    """The symmetric int8 code array of a vector — the SAME rule
    quantize_int8_report scores (scale = max |x|, floor(x/scale·127)
    clamped to ±127, all-zero → all-zero), carried as exact integers
    in a double array so downstream dot folds stay in one codegen
    expression type on both engines (every value is an integer in
    [-127, 127]; products and 64-dim sums stay far below 2^53, so
    double arithmetic on them is EXACT integer arithmetic)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    xd = F.transform(c, lambda v: v.cast("double"))
    scale = F.array_max(F.transform(xd, F.abs))
    # zip against array_repeat(scale) so the scale expression (itself
    # a dim-cost array fold) evaluates ONCE per row — referencing it
    # inside a transform lambda re-evaluates it per ELEMENT (no CSE
    # inside higher-order-function bodies), measured 5x on the knn
    # scan at sf1
    sarr = F.array_repeat(scale, F.size(xd))
    return F.zip_with(
        xd, sarr, lambda v, s: F.when(s == 0.0, F.lit(0.0))
        .otherwise(F.greatest(F.lit(-127.0),
                              F.least(F.lit(127.0),
                                      F.floor(v / s * 127)
                                      .cast("double")))))


def knn_cosine_quantized(corpus: DataFrame, queries: DataFrame, k: int,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors under int8-QUANTIZED cosine — the scoring
    a vector store that persists int8 codes (quantize_int8_report's
    format) actually runs. At 100 TB the point is memory bandwidth:
    the scan reads 1/4 the bytes of float32, and the integer dot
    products are exact, so the ONLY approximation is the quantization
    itself — which this operator makes measurable (compare against
    knn_cosine's float ranking on the same queries; rank inversions
    are the quantization cost, not engine noise).

    Output (q_id, n_id, rank, sim_q): sim_q = dot(qa,qb) /
    (|qa|·|qb|) over the int8 codes (0.0 when either side quantized
    to all-zero), 6-decimal rounded, (sim desc, n_id) rank order —
    knn_cosine's contract on the quantized space. Same plan shape:
    codegen quantization + fold dots, broadcast queries, one corpus
    scan, group-limit top-k. All integer values ride in doubles, so
    every product/sum is exact and the SQL oracle replicates
    bit-for-bit (see quantized_vec)."""
    from pyspark.sql import Window

    from .. import cache

    # PERSIST the corpus codes: Catalyst's projection collapse would
    # otherwise inline the quantization chain into the join-level sim
    # expression and re-quantize each corpus vector once PER QUERY
    # (measured 5x on the sf1 scan). Materializing is also the point
    # of the operator — the int8 code table IS what a vector store
    # persists; production reads it back from disk at 1/4 the bytes.
    c = cache.persist(
        corpus.select(F.col(id_col).alias("n_id"),
                      quantized_vec(vec_col).alias("n_q"))
        .withColumn("n_nrm", F.sqrt(dot(F.col("n_q"), F.col("n_q")))))
    q = (queries.select(F.col(id_col).alias("q_id"),
                        quantized_vec(vec_col).alias("q_q"))
         .withColumn("q_nrm", F.sqrt(dot(F.col("q_q"), F.col("q_q")))))
    sim = F.when((F.col("q_nrm") == 0.0) | (F.col("n_nrm") == 0.0),
                 F.lit(0.0)).otherwise(
        F.round(dot(F.col("q_q"), F.col("n_q"))
                / (F.col("q_nrm") * F.col("n_nrm")), 6))
    pairs = (c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
             .select("q_id", "n_id", sim.alias("sim_q")))
    w = Window.partitionBy("q_id").orderBy(F.col("sim_q").desc(),
                                           F.col("n_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "n_id", "rank", "sim_q"))
