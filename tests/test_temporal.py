"""Unit tests for the temporal join operators (as-of, bucketed range) —
edge semantics the oracle query can't isolate: exact-timestamp ties,
left rows before any right row, staleness tolerance, bucket boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from realtime_market_data_pipeline_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("A", _ts(0), 1), ("A", _ts(10), 2), ("A", _ts(20), 3), ("B", _ts(10), 4)],
        ["k", "ts", "lid"],
    )
    right = spark.createDataFrame(
        [("A", _ts(10), 100.0), ("A", _ts(15), 150.0)],
        ["k", "ts", "quote"],
    )
    out = {
        r.lid: (r.asof_ts, r.quote)
        for r in asof_join(left, right, ["k"], "ts", ["quote"]).collect()
    }
    assert out[1] == (None, None)            # before any right row
    assert out[2] == (_ts(10), 100.0)        # exact-ts tie: right row visible
    assert out[3] == (_ts(15), 150.0)        # most recent, not first
    assert out[4] == (None, None)            # other key never matches


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([("A", _ts(3600 * 3), 1)], ["k", "ts", "lid"])
    right = spark.createDataFrame([("A", _ts(0), 9.0)], ["k", "ts", "quote"])
    fresh = asof_join(left, right, ["k"], "ts", ["quote"], tolerance="1 hour").first()
    assert fresh.quote is None and fresh.asof_ts is None  # too stale
    loose = asof_join(left, right, ["k"], "ts", ["quote"], tolerance="4 hours").first()
    assert loose.quote == 9.0


def test_range_join_bucket_boundaries(spark):
    points = spark.createDataFrame(
        [("A", _ts(s), s) for s in (0, 86_399, 86_400, 200_000)],
        ["k", "ts", "pid"],
    )
    intervals = spark.createDataFrame(
        [("A", _ts(0), _ts(86_400), "d1"), ("A", _ts(86_400), _ts(172_800), "d2")],
        ["k", "start", "end", "label"],
    )
    out = {
        r.pid: r.label
        for r in range_join_bucketed(
            points, intervals, ["k"], "ts", "start", "end", bucket="1 day"
        ).collect()
    }
    # end-exclusive containment across bucket boundaries; the 200000s point
    # is outside every interval
    assert out == {0: "d1", 86_399: "d1", 86_400: "d2"}


def test_range_join_interval_spanning_many_buckets(spark):
    points = spark.createDataFrame(
        [("A", _ts(s), s) for s in (0, 100_000, 250_000)], ["k", "ts", "pid"]
    )
    intervals = spark.createDataFrame(
        [("A", _ts(0), _ts(260_000), "wide")], ["k", "start", "end", "label"]
    )
    got = range_join_bucketed(
        points, intervals, ["k"], "ts", "start", "end", bucket="1 hour"
    )
    assert sorted(r.pid for r in got.collect()) == [0, 100_000, 250_000]
    # no duplicate rows despite the interval covering ~73 buckets
    assert got.count() == 3
