"""Streaming twins must produce exactly the batch results when replaying
the bounded testdata (the lambda-collapse guarantee)."""

from __future__ import annotations

from mutable_spark import registry
from mutable_spark.streaming.events import (
    run_available_now,
    sessionize,
    stream_events,
    tumbling_counts,
)
from tests.conftest import SF_DIR

registry.load_all()


def _rows(rows):
    return sorted(tuple(r) for r in rows)


def test_streaming_tumbling_equals_batch(spark):
    stream = stream_events(spark, SF_DIR)
    assert stream.isStreaming
    got = run_available_now(tumbling_counts(stream), "t_tumbling")
    want = registry.QUERIES["events_window_tumbling"](spark, SF_DIR).collect()
    assert _rows(got) == _rows(want)


def test_streaming_sessionize_counts(spark):
    stream = stream_events(spark, SF_DIR)
    got = run_available_now(sessionize(stream), "t_sessions")
    # session_window merges by gap like the batch lag/cumsum formulation:
    # same number of sessions per user, same per-session event counts
    want = registry.QUERIES["events_sessionize"](spark, SF_DIR).collect()
    got_key = sorted((r.user_id, r.session_start, r.n_events) for r in got)
    want_key = sorted((r.user_id, r.session_start, r.n_events) for r in want)
    assert got_key == want_key


def test_stateful_running_totals(spark):
    import pyspark.sql.functions as F
    from mutable_spark.streaming.events import run_available_now, running_user_totals

    stream = stream_events(spark, SF_DIR)
    got = run_available_now(running_user_totals(stream), "t_state", mode="update")
    # single bounded replay → final state per user equals the batch totals
    from mutable_spark.catalog import load_tables

    want = (
        load_tables(spark, SF_DIR)
        .events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    got_last = {}
    for r in got:  # update mode may emit once per batch; keep the last
        got_last[r.user_id] = r.n_events
    assert got_last == {r.user_id: r.n_events for r in want}


def test_streaming_sliding_equals_batch(spark):
    from mutable_spark.streaming.events import sliding_counts

    stream = stream_events(spark, SF_DIR)
    got = run_available_now(sliding_counts(stream), "t_sliding")
    want = registry.QUERIES["events_window_sliding"](spark, SF_DIR).collect()
    assert _rows(got) == _rows(want)


def test_streaming_json_extract_equals_batch(spark):
    from mutable_spark.streaming.events import json_extract_counts

    stream = stream_events(spark, SF_DIR)
    got = run_available_now(json_extract_counts(stream), "t_json")
    want = registry.QUERIES["events_json_extract"](spark, SF_DIR).collect()
    assert _rows(got) == _rows(want)
