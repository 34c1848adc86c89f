"""Event analytics — sessionize / funnel / asof_join / range_join."""

import datetime as dt

import pytest

from graphscope_spark.functions.events import (
    asof_join,
    funnel,
    range_join,
    sessionize,
)
from graphscope_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-events", cpus=4, shuffle_partitions=4)


BASE = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return BASE + dt.timedelta(minutes=minutes)


def _ev(spark, rows):
    # rows: (event_id, minutes, user_id, event_type, value)
    data = [(i, _ts(m), u, t, v) for i, m, u, t, v in rows]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )


def test_sessionize_gap_boundaries(spark):
    ev = _ev(spark, [
        (1, 0, 7, "view", 0.0),
        (2, 30, 7, "view", 0.0),     # 30 min gap -> same session
        (3, 91, 7, "view", 0.0),     # 61 min gap -> NEW session (gap=60)
        (4, 151, 7, "view", 0.0),    # exactly 60 -> same session (> only)
        (5, 0, 8, "view", 0.0),      # other user independent
    ])
    got = {
        (r["user_id"], r["session"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in sessionize(ev, gap_minutes=60).collect()
    }
    us = lambda m: int(_ts(m).timestamp() * 1_000_000)  # noqa: E731
    assert got == {
        (7, 1): (2, us(0), us(30)),
        (7, 2): (2, us(91), us(151)),
        (8, 1): (1, us(0), us(0)),
    }


def test_funnel_strict_order(spark):
    ev = _ev(spark, [
        # user 1 completes A -> B -> C in order
        (1, 0, 1, "A", 0.0), (2, 10, 1, "B", 0.0), (3, 20, 1, "C", 0.0),
        # user 2 has B BEFORE A -> reaches A only (needs B after A)
        (4, 0, 2, "B", 0.0), (5, 10, 2, "A", 0.0),
        # user 3 A and B simultaneous -> strictly-after fails step B
        (6, 0, 3, "A", 0.0), (7, 0, 3, "B", 0.0),
        # user 4 never starts
        (8, 0, 4, "C", 0.0),
    ])
    got = {
        r["step_name"]: r["n_users"]
        for r in funnel(ev, ["A", "B", "C"]).collect()
    }
    assert got == {"A": 3, "B": 1, "C": 1}


def test_asof_join_semantics(spark):
    left = _ev(spark, [
        (10, 5, 1, "click", 0.0),
        (11, 20, 1, "click", 0.0),
        (12, 1, 2, "click", 0.0),   # before any purchase -> null
    ]).select("event_id", "user_id", "ts")
    right = _ev(spark, [
        (90, 5, 1, "purchase", 1.5),   # same ts as click 10 -> matches (<=)
        (91, 15, 1, "purchase", 2.5),
        (92, 15, 1, "purchase", 3.5),  # simultaneous: larger (id, value) wins
        (93, 30, 2, "purchase", 9.9),
    ]).select("event_id", "user_id", "value", "ts")
    out = {
        r["event_id"]: (r["event_id_right"], r["value_right"])
        for r in asof_join(
            left, right, "user_id", right_cols=["event_id", "value"]
        ).collect()
    }
    assert out[10] == (90, 1.5)     # ts-equal right row matches
    assert out[11] == (92, 3.5)     # latest ts; tie -> max (id, value)
    assert out[12] == (None, None)  # no prior right row


def test_range_join_half_open(spark):
    pts = _ev(spark, [
        (1, 0, 1, "x", 0.0),       # == lo -> in
        (2, 59, 1, "x", 0.0),      # < hi -> in
        (3, 60, 1, "x", 0.0),      # == hi -> OUT (half-open)
        (4, 200, 1, "x", 0.0),     # in no window
    ]).select("event_id", "ts")
    us = lambda m: int(_ts(m).timestamp() * 1_000_000)  # noqa: E731
    win = spark.createDataFrame(
        [(0, us(0), us(60)), (1, us(100), us(160))],
        "window_id long, lo_us long, hi_us long",
    )
    got = {
        (r["event_id"], r["window_id"])
        for r in range_join(pts, win, bucket_minutes=30).collect()
    }
    assert got == {(1, 0), (2, 0)}


def test_range_join_overlapping_windows_no_dups(spark):
    pts = _ev(spark, [(1, 50, 1, "x", 0.0)]).select("event_id", "ts")
    us = lambda m: int(_ts(m).timestamp() * 1_000_000)  # noqa: E731
    win = spark.createDataFrame(
        [(0, us(0), us(100)), (1, us(40), us(60))],
        "window_id long, lo_us long, hi_us long",
    )
    rows = range_join(pts, win, bucket_minutes=1).collect()
    # point matches both windows, exactly once each despite the interval
    # spanning many buckets
    assert sorted((r["event_id"], r["window_id"]) for r in rows) == [
        (1, 0), (1, 1)
    ]


def test_retention_cohorts_exact(spark):
    from graphscope_spark.functions.events import retention_cohorts
    D = 24 * 60  # minutes per day
    ev = _ev(spark, [
        # user 1: first day 0, active days 0, 1, 3 (two events day 1)
        (1, 0, 1, "x", 0.0), (2, D + 5, 1, "x", 0.0),
        (3, D + 6, 1, "x", 0.0), (4, 3 * D, 1, "x", 0.0),
        # user 2: first day 1, active day 1 only
        (5, D + 1, 2, "x", 0.0),
    ])
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    day0 = int(BASE.timestamp() * 1_000_000) // 86_400_000_000
    assert got == {
        (day0, 0): 1, (day0, 1): 1, (day0, 3): 1,
        (day0 + 1, 0): 1,
    }


def test_rolling_window_sum_trailing(spark):
    from graphscope_spark.functions.events import rolling_window_sum
    D = 24 * 60
    ev = _ev(spark, [
        (1, 0, 1, "x", 1.0),
        (2, 3 * D, 1, "x", 2.0),      # window(2d): only itself at days=2
        (3, 4 * D, 1, "x", 4.0),      # window: events 2,3
        (4, 6 * D, 1, "x", 8.0),      # window: 3,4 (event 2 is 3d back)
        (5, 0, 2, "x", 100.0),        # other user
    ])
    got = {
        r["event_id"]: (r["n_in_window"], r["roll_value"])
        for r in rolling_window_sum(ev, days=2).collect()
    }
    assert got == {
        1: (1, 1.0), 2: (1, 2.0), 3: (2, 6.0), 4: (2, 12.0),
        5: (1, 100.0),
    }


def test_interval_join_overlap_exactly_once(spark):
    from graphscope_spark.functions.events import interval_join
    us = lambda m: m * 60_000_000  # noqa: E731
    a = spark.createDataFrame(
        [(1, us(0), us(100)), (2, us(500), us(600)), (3, us(50), us(60))],
        "aid long, lo_us long, hi_us long",
    )
    b = spark.createDataFrame(
        [(10, us(90), us(510)),   # overlaps a1 (tail) and a2 (head)
         (11, us(55), us(58)),    # inside a1 and a3
         (12, us(100), us(101))], # touches a1 at hi -> NO overlap (half-open)
        "bid long, lo_us long, hi_us long",
    )
    got = sorted(
        (r["aid"], r["bid"])
        for r in interval_join(a, b, bucket_minutes=1).collect()
    )
    # exactly once per overlapping pair despite multi-bucket spans
    assert got == [(1, 10), (1, 11), (2, 10), (3, 11)]
