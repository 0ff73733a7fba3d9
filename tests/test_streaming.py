"""Batch/stream equivalence tests — the Structured Streaming correctness
contract: the same transform over a finite source must agree between
batch execution and incremental streaming execution."""

from __future__ import annotations

from andb_spark.catalog import load_table, table_path
from andb_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)


def test_stream_equals_batch_tumbling(spark, sf_dir):
    batch = sorted(
        tuple(r) for r in tumbling_agg(load_table(spark, sf_dir, "events")).collect()
    )
    stream = sorted(
        tuple(r)
        for r in stream_events(
            spark, table_path(sf_dir, "events"), tumbling_agg,
            query_name="t_stream_eq",
        ).collect()
    )
    assert batch == stream
    assert len(batch) > 0


def test_sliding_windows_cover_each_event_twice(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    total = sliding_agg(ev).groupBy().sum("n").collect()[0][0]
    # width 1h / slide 30m → every event lands in exactly 2 windows
    assert total == 2 * n_events


def test_session_windows_respect_gap(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = session_agg(ev)
    # sessions per user are disjoint: total events preserved
    assert out.groupBy().sum("n_events").collect()[0][0] == ev.count()
