"""Lifecycle registry for DataFrames the operators ``persist()``.

Operators that feed one intermediate table to several consumers
(shingle rows, MinHash signatures, SimHash tables, packed embedding
blocks) persist it so the expensive stage runs once. Because every
operator returns a LAZY DataFrame, the operator itself cannot
unpersist — the cache must outlive the call and stay alive until the
caller has run its action(s).

Contract: persisted intermediates are registered here; callers that
run many queries in one long-lived session (benchmarks, services)
call :func:`unpersist_all` between units of work. Single-query runs
(the driver harness) may skip it — Spark's LRU block eviction bounds
the footprint, and session teardown frees everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# STRONG references, deliberately: the persisted wrapper is usually an
# operator-internal local that dies when the operator returns, while
# the JVM CacheManager keeps the cached blocks alive until an explicit
# unpersist — a weakref registry would be dead before any caller could
# clean up. The registry is therefore the lifecycle owner; entries are
# released only by unpersist_all().
_PERSISTED: list[DataFrame] = []


def persist(df: DataFrame, *args, **kwargs) -> DataFrame:
    """``df.persist(...)`` + registration for later :func:`unpersist_all`."""
    out = df.persist(*args, **kwargs)
    _PERSISTED.append(out)
    return out


def unpersist_all(blocking: bool = False) -> int:
    """Unpersist every registered intermediate; returns how many were
    dropped. Safe to call at any time — unpersisting a DataFrame that
    a later action still needs only costs recomputation."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:
            pass  # session already stopped
    return n
