"""Interval (range) join: correctness on a hand-computed fixture plus a
plan-shape assertion that the bucket equi-reduction never degrades to a
BroadcastNestedLoopJoin / CartesianProduct (the naive range-join plan)."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from _multi_source_retail_data_integration_hub_spark.operators.ranges import (
    interval_join,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_interval_join_matches_hand_computed(spark):
    # user 1: interval [0, 60) catches points at 0 and 59, not 60 (exclusive)
    # user 2: interval [30, 90) catches 30; point at 29 excluded
    # user 3: no interval -> its point never appears (inner join)
    intervals = spark.createDataFrame(
        [
            (1, "a", _ts(0), _ts(60)),
            (2, "b", _ts(30), _ts(90)),
        ],
        "user_id long, iv_id string, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [
            (1, _ts(0), 1.0),
            (1, _ts(59), 2.0),
            (1, _ts(60), 4.0),
            (2, _ts(29), 8.0),
            (2, _ts(30), 16.0),
            (3, _ts(30), 32.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = interval_join(
        intervals, points, on=["user_id"], bucket_seconds=3600
    )
    got = {
        (r["iv_id"], r["value"])
        for r in out.select("iv_id", "value").collect()
    }
    assert got == {("a", 1.0), ("a", 2.0), ("b", 16.0)}


def test_interval_join_spanning_bucket_edges(spark):
    # interval [50, 110) spans two 1-hour buckets; a point in each bucket
    # must match exactly once (no duplicate from the interval's fan-out).
    intervals = spark.createDataFrame(
        [(1, "a", _ts(50), _ts(110))],
        "user_id long, iv_id string, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [(1, _ts(55), 1.0), (1, _ts(65), 2.0), (1, _ts(110), 4.0)],
        "user_id long, ts timestamp, value double",
    )
    out = interval_join(intervals, points, on=["user_id"], bucket_seconds=3600)
    vals = sorted(r["value"] for r in out.collect())
    assert vals == [1.0, 2.0]


def test_interval_join_plan_is_equi_join(spark):
    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(60))],
        "user_id long, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [(1, _ts(30), 1.0)], "user_id long, ts timestamp, value double"
    )
    out = interval_join(intervals, points, on=["user_id"], bucket_seconds=3600)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the join must be a hash/sort-merge equi-join on (user_id, bucket)
    assert "Join" in plan


def test_interval_join_rejects_outer_joins(spark):
    d = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))],
        "user_id long, start_ts timestamp, end_ts timestamp",
    )
    p = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "user_id long, ts timestamp"
    )
    with pytest.raises(ValueError, match="inner"):
        interval_join(d, p, on=["user_id"], how="left")
