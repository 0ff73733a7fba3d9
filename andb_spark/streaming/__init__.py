"""Structured Streaming over the events table.

The reference has no streaming at all (SURVEY §2.9 — README roadmap
only). This package provides the north-star streaming surface:
tumbling/sliding/session windows with watermarks, each with a
batch-equivalent twin so the DuckDB oracle can verify semantics
(batch == stream on a finite input is the Structured Streaming
correctness contract).
"""

from andb_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)

__all__ = ["tumbling_agg", "sliding_agg", "session_agg", "stream_events"]
