"""Event-time stream processing (Structured Streaming).

The reference's "streaming" is Volcano-style incremental batch
execution (/root/reference/src/execution/stream.rs:25-54) — covered by
``LazyFrame.collect_streaming``. THIS package is the north-star
superset: real event-time processing with watermarks, tumbling /
sliding / session windows, and late-data handling, built on Spark
Structured Streaming.
"""

from .joins import interval_join
from .stateful import running_totals, streaming_dedup, watermark_dedup
from .windows import (
    enrich_stream,
    load_events,
    read_event_stream,
    run_available_now,
    session_agg,
    sliding_agg,
    tumbling_agg,
)

__all__ = [
    "enrich_stream",
    "interval_join",
    "load_events",
    "read_event_stream",
    "run_available_now",
    "running_totals",
    "session_agg",
    "sliding_agg",
    "streaming_dedup",
    "watermark_dedup",
    "tumbling_agg",
]
