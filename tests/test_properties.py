"""Property-based tests (hypothesis): the engine's semantic rules hold
for arbitrary inputs, not just the curated fixtures.

Strategy notes: one shared SparkSession (conftest), small row counts
(Spark job dispatch dominates), deadline disabled (JVM warmup makes
wall-clock flaky), and examples capped to keep the suite fast.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rivulus_spark import DataType, LazyFrame, MixedTypesError, col, lit

SET = settings(max_examples=15, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])

ints = st.integers(min_value=-2**40, max_value=2**40)
floats = st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e12, max_value=1e12)


@given(data=st.lists(st.one_of(ints, st.none()), min_size=1, max_size=8))
@SET
def test_int_column_roundtrip(spark, data):
    lf = LazyFrame.from_dataframe(spark, {"x": data})
    assert [r.x for r in lf.collect()] == data
    if any(v is not None for v in data):
        assert dict(lf.logical_schema)["x"] is DataType.INT64


@given(data=st.lists(st.one_of(ints, floats, st.none()),
                     min_size=1, max_size=8))
@SET
def test_mixed_numeric_promotes_to_float(spark, data):
    has_int = any(isinstance(v, int) for v in data)
    has_float = any(isinstance(v, float) for v in data)
    if not (has_int and has_float):
        return
    lf = LazyFrame.from_dataframe(spark, {"x": data})
    assert dict(lf.logical_schema)["x"] is DataType.FLOAT64
    got = [r.x for r in lf.collect()]
    for g, v in zip(got, data):
        assert (g is None) == (v is None)
        if v is not None:
            assert g == pytest.approx(float(v))


@given(data=st.lists(st.one_of(ints, st.text(max_size=5)),
                     min_size=2, max_size=8))
@SET
def test_int_string_mix_rejected(spark, data):
    has_int = any(isinstance(v, int) for v in data)
    has_str = any(isinstance(v, str) for v in data)
    if not (has_int and has_str):
        return
    with pytest.raises(MixedTypesError):
        LazyFrame.from_dataframe(spark, {"x": data})


@given(xs=st.lists(ints, min_size=1, max_size=8), threshold=ints)
@SET
def test_filter_matches_python_semantics(spark, xs, threshold):
    lf = LazyFrame.from_dataframe(spark, {"x": xs})
    got = sorted(r.x for r in lf.filter(col("x") > threshold).collect())
    assert got == sorted(v for v in xs if v > threshold)


@given(xs=st.lists(ints, min_size=1, max_size=8),
       ys=st.lists(ints, min_size=1, max_size=8))
@SET
def test_int_arithmetic_matches_python(spark, xs, ys):
    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    lf = LazyFrame.from_dataframe(spark, {"x": xs, "y": ys})
    out = lf.select((col("x") + col("y")).alias("s"),
                    (col("x") * lit(2)).alias("d")).collect()
    assert [r.s for r in out] == [a + b for a, b in zip(xs, ys)]
    assert [r.d for r in out] == [a * 2 for a in xs]
