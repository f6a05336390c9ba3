"""Adversarial event streams through the driver's oracle-equality harness:
the determinism contracts of the event operators (ties broken by
event_id, session-gap and window boundaries, funnel orderings) checked on
hand-built pathologies rather than the generator's well-spaced stream.

Shapes covered: identical timestamps for one user (total-order
tie-break), a click with no preceding view and a click at the exact view
timestamp (funnel edges), a single-event user, events exactly at the
10-minute session gap, events on exact hour/midnight boundaries
(tumbling/retention bucket edges), and two users with equal counts in one
hour (leaderboard rank tie).
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from mutable_spark import registry
from tests.oracle_harness import compare

registry.load_all()


def _ts(day, h, m=0, s=0, us=0):
    return dt.datetime(2024, 1, day, h, m, s, us)


#: (event_id, ts, user_id, event_type, value, props)
_EDGE_EVENTS = [
    # user 1: two events at the IDENTICAL timestamp (tie-break by event_id),
    # one view + one click at the same instant
    (0, _ts(1, 9, 0, 0), 1, "view", 10.0, '{"k": 1}'),
    (1, _ts(1, 9, 0, 0), 1, "click", 20.0, '{"k": 2}'),
    # user 2: click BEFORE any view, then a view with no click after
    (2, _ts(1, 9, 5), 2, "click", 1.5, '{"k": 3}'),
    (3, _ts(1, 9, 10), 2, "view", 2.5, '{"k": 4}'),
    # user 3: a single event ever
    (4, _ts(1, 12, 0), 3, "view", 7.25, '{"k": 5}'),
    # user 4: events EXACTLY 10 minutes apart (the session-gap boundary),
    # then one at 10 minutes + 1 microsecond (strictly past the gap)
    (5, _ts(1, 14, 0, 0), 4, "view", 1.0, '{"k": 6}'),
    (6, _ts(1, 14, 10, 0), 4, "view", 1.0, '{"k": 7}'),
    (7, _ts(1, 14, 20, 0, 1), 4, "click", 1.0, '{"k": 8}'),
    # user 5: exact hour boundary + exact midnight (day-boundary cohort)
    (8, _ts(1, 0, 0, 0), 5, "view", 3.0, '{"k": 9}'),
    (9, _ts(1, 23, 59, 59, 999999), 5, "view", 3.0, '{"k": 10}'),
    (10, _ts(2, 0, 0, 0), 5, "click", 3.0, '{"k": 11}'),
    # users 6 and 7: equal event counts inside one hour (rank tie by id)
    (11, _ts(3, 8, 1), 6, "view", 1.0, '{"k": 12}'),
    (12, _ts(3, 8, 2), 6, "view", 1.0, '{"k": 13}'),
    (13, _ts(3, 8, 3), 7, "view", 1.0, '{"k": 14}'),
    (14, _ts(3, 8, 4), 7, "view", 1.0, '{"k": 15}'),
    (15, _ts(3, 8, 5), 8, "error", 1.0, '{"k": 16}'),
    # malformed / empty props: the k-extraction regexp must yield NULL in
    # both engines, and an event_type whose EVERY row lacks a valid k
    # exercises the NULL/0 avg path (NULL in both engines, no ANSI error)
    (16, _ts(3, 9, 0), 8, "signup", 2.0, "{broken"),
    (17, _ts(3, 9, 1), 8, "signup", 2.0, ""),
    (18, _ts(3, 9, 2), 8, "signup", 2.0, '{"k": "not-a-number"}'),
]

_EVENT_OPS = [
    "events_json_extract",
    "events_window_tumbling",
    "events_window_sliding",
    "events_sessionize",
    "events_funnel",
    "events_retention",
    "events_windowed_topk",
    "events_value_percentiles",
    "events_interarrival",
    # r10 additions: CUSUM (single-bucket types, ties at the hour edge)
    # and the Welch t (an arm with a single row exercises the variance-0
    # path — the statistic divides by sqrt(0+var_b), never 0/0 here)
    "events_changepoint_cusum",
    "events_ab_test",
]


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    import os

    from tests.conftest import SF_DIR

    path = tmp_path_factory.mktemp("edge_events")
    df = spark.createDataFrame(
        _EDGE_EVENTS,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(path / "events.parquet"))
    for f in os.listdir(SF_DIR):
        if f.endswith(".parquet") and f != "events.parquet":
            os.symlink(os.path.join(SF_DIR, f), str(path / f))
    return str(path)


@pytest.fixture(scope="module")
def events_duck(events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{events_dir}/events.parquet/*.parquet'"
    )
    return con


@pytest.mark.parametrize("name", _EVENT_OPS)
def test_edge_events_match_oracle(name, spark, events_duck, events_dir):
    ok, msg = compare(name, spark, events_duck, events_dir)
    assert ok, msg
