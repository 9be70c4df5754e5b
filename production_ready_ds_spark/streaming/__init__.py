"""Structured Streaming surface: streaming twins of the batch event
queries (SURVEY.md §2b streaming surface).

The reference's incremental machinery — daily micro-batches with a
4-day trailing reprocessing window (O4, run_pipeline.sh:6-11) — maps to
``withWatermark("ts", "4 days")`` + windowed aggregation; its per-day
partitioned sinks (S7) map to a ``foreachBatch`` partitioned-parquet
sink. Each operator here is validated against its batch twin on the
same data (tests/test_streaming.py), the standard oracle for streaming
windows.
"""

from .events import (
    click_purchase_join,
    dedup_stream,
    foreach_batch_daily_sink,
    running_user_totals,
    session_counts,
    sliding_counts,
    stream_events,
    tumbling_counts,
)

__all__ = [
    "click_purchase_join",
    "dedup_stream",
    "foreach_batch_daily_sink",
    "running_user_totals",
    "session_counts",
    "sliding_counts",
    "stream_events",
    "tumbling_counts",
]
