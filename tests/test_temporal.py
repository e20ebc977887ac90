"""Unit tests for operators/temporal.py: as-of join semantics (ties,
outer nulls, tolerance) and sessionize gap boundaries, plus the
single-shuffle plan shape the docstrings promise."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators.temporal import asof_join, sessionize


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00"), 5.0),
            (2, "u1", _ts("2024-01-01 12:00:00"), 6.0),
            (3, "u2", _ts("2024-01-01 09:00:00"), 7.0),  # no prior right
            (4, "u1", _ts("2024-01-01 08:00:00"), 8.0),  # equal-ts match
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (101, "u1", _ts("2024-01-01 08:00:00"), 1.0),  # ties with left id=4
            (102, "u1", _ts("2024-01-01 08:00:00"), 2.0),  # same ts: max id wins
            (103, "u1", _ts("2024-01-01 11:30:00"), 3.0),
            (104, "u2", _ts("2024-01-01 09:30:00"), 4.0),  # after left id=3
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    return left, right


def test_asof_backward_inclusive_and_ties(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="user_id", ts_col="ts",
        right_cols=["event_id", "ts", "value"], tiebreak_col="event_id",
    )
    got = {r["event_id"]: r for r in out.collect()}
    # equal timestamps match (inclusive); max event_id wins the tie
    assert got[4]["asof_event_id"] == 102 and got[4]["asof_value"] == 2.0
    # latest-at-or-before, not just any earlier
    assert got[1]["asof_event_id"] == 102
    assert got[2]["asof_event_id"] == 103
    # left-outer: u2 purchase precedes every u2 right row
    assert got[3]["asof_event_id"] is None and got[3]["asof_value"] is None
    assert out.count() == left.count()


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="user_id", ts_col="ts",
        right_cols=["event_id", "ts", "value"], tiebreak_col="event_id",
        tolerance_us=60 * 60 * 1_000_000,  # 1 hour
    )
    got = {r["event_id"]: r for r in out.collect()}
    assert got[2]["asof_event_id"] == 103  # 30 min back: kept
    assert got[1]["asof_event_id"] is None  # 2 h back: nulled
    assert got[4]["asof_event_id"] == 102  # 0 back: kept


def test_asof_single_shuffle_plan(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="user_id", ts_col="ts", right_cols=["ts", "value"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one exchange for the window; union must not add its own shuffle
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_sessionize_gap_boundary(spark):
    base = _ts("2024-01-01 00:00:00")
    rows = [
        ("u1", 1, base),
        ("u1", 2, base + dt.timedelta(hours=4)),           # gap == 4h: same session
        ("u1", 3, base + dt.timedelta(hours=8, seconds=1)),  # gap > 4h: new session
        ("u2", 4, base),
    ]
    df = spark.createDataFrame(
        [(u, i, ts) for u, i, ts in rows], "user_id string, event_id long, ts timestamp"
    )
    out = sessionize(
        df, "user_id", "ts", gap_us=4 * 3600 * 1_000_000, tiebreak_col="event_id"
    )
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_interval_join_inclusive_bounds_and_bucket_spans(spark):
    from nyc_taxi_etl_spark.operators.temporal import interval_join

    points = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),   # == start: included
            (2, "u1", _ts("2024-01-01 11:00:00")),   # == end: included
            (3, "u1", _ts("2024-01-01 11:00:01")),   # past end: excluded
            (4, "u2", _ts("2024-01-01 10:30:00")),   # wrong key: excluded
            (5, "u1", _ts("2024-01-01 10:59:59")),   # crosses hour bucket
        ],
        "pid long, user_id string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, "u1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "iid long, user_id string, w_start timestamp, w_end timestamp",
    )
    out = interval_join(
        points, intervals, on="user_id", ts_col="ts",
        start_col="w_start", end_col="w_end",
        bucket_us=3600 * 1_000_000,
    )
    assert sorted(r["pid"] for r in out.collect()) == [1, 2, 5]
    # each qualifying pair appears exactly once despite the interval
    # covering two buckets
    assert out.count() == 3


def test_asof_join_rejects_reserved_side_column(spark):
    import pytest

    from nyc_taxi_etl_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 0)], "k int, ts string, _side int"
    )
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], "k int, ts string, v double"
    )
    with pytest.raises(ValueError, match="_side"):
        asof_join(left, right, on="k", ts_col="ts", right_cols=["v"])
