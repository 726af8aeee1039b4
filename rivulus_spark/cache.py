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

import weakref

from pyspark.sql import DataFrame

# weak refs: a cached table whose last reference died can be GC'd by
# Spark's ContextCleaner; the registry must not keep it alive forever.
_PERSISTED: list[weakref.ref[DataFrame]] = []


def persist(df: DataFrame, *args, **kwargs) -> DataFrame:
    """``df.persist(...)`` + registration for later :func:`unpersist_all`."""
    out = df.persist(*args, **kwargs)
    _PERSISTED.append(weakref.ref(out))
    return out


def unpersist_all(blocking: bool = False) -> int:
    """Unpersist every registered intermediate; returns how many were
    still alive. Safe to call at any time — unpersisting a DataFrame
    that a later action still needs only costs recomputation."""
    n = 0
    while _PERSISTED:
        ref = _PERSISTED.pop()
        df = ref()
        if df is not None:
            try:
                df.unpersist(blocking=blocking)
                n += 1
            except Exception:
                pass  # session already stopped
    return n
