"""range_join: bucketized interval-containment join (operators/rangejoin.py).

Covers: inclusive bounds on both ends, a point matching several overlapping
intervals exactly once each, intervals spanning multiple buckets, points on
exact bucket boundaries, inverted (end < start) intervals matching nothing,
key isolation, and the replication guard raising on unbounded intervals.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from entityresolution_capstone_spark.operators.rangejoin import range_join


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


@pytest.fixture()
def frames(spark):
    points = spark.createDataFrame(
        [
            ("p1", 1, _ts(0)),       # == i1.start (inclusive)
            ("p2", 1, _ts(10)),      # inside i1 and i2
            ("p3", 1, _ts(20)),      # == i1.end (inclusive)
            ("p4", 1, _ts(21)),      # just past i1.end, inside i2
            ("p5", 2, _ts(10)),      # same instant as p2, different key
            ("p6", 1, _ts(59, 59)),  # matches nothing
        ],
        "pid string, k int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("i1", 1, _ts(0), _ts(20)),    # 21 min, spans several 5-min buckets
            ("i2", 1, _ts(5), _ts(25)),
            ("i3", 2, _ts(10), _ts(10)),   # zero-length, still matches p5
            ("i4", 1, _ts(30), _ts(29)),   # inverted: matches nothing
        ],
        "iid string, k int, start_ts timestamp, end_ts timestamp",
    )
    return points, intervals


def _matches(points, intervals, **kw):
    out = range_join(
        points, intervals, on=["k"], point_ts="ts",
        bucket_width_s=kw.pop("bucket_width_s", 300), **kw
    )
    return sorted(
        (r["pid"], r["iid"]) for r in out.select("pid", "iid").collect()
    )


EXPECTED = sorted(
    [
        ("p1", "i1"),
        ("p2", "i1"), ("p2", "i2"),
        ("p3", "i1"), ("p3", "i2"),
        ("p4", "i2"),
        ("p5", "i3"),
    ]
)


def test_matches_exactly_once(frames):
    points, intervals = frames
    assert _matches(points, intervals) == EXPECTED


def test_bucket_width_invariance(frames):
    # different quantizations, identical match set (each match emitted once)
    points, intervals = frames
    for width in (60, 137, 1800, 7200):
        assert _matches(points, intervals, bucket_width_s=width) == EXPECTED


def test_payload_and_point_columns_survive(frames):
    points, intervals = frames
    out = range_join(points, intervals, on=["k"], bucket_width_s=300)
    assert out.columns == ["pid", "k", "ts", "iid", "start_ts", "end_ts"]


def test_replication_guard_raises(spark, frames):
    points, intervals = frames
    wide = intervals.withColumn("end_ts", F.expr("start_ts + interval 30 days"))
    with pytest.raises(Exception, match="max_buckets_per_interval"):
        range_join(
            points, wide, on=["k"], bucket_width_s=60,
            max_buckets_per_interval=100,
        ).collect()


def test_equijoin_plan_no_nested_loop(frames):
    # the point of the operator: the physical plan must be an equi-join on
    # (key, bucket), never BroadcastNestedLoop/Cartesian over the raw tables
    points, intervals = frames
    plan = range_join(
        points, intervals, on=["k"], bucket_width_s=300
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_random_brute_force_equivalence(spark):
    # pinned-seed random workload vs a per-row brute-force evaluation
    import random

    rng = random.Random(42)
    base = dt.datetime(2024, 3, 1)
    pts = [
        (f"p{i}", rng.randint(0, 3), base + dt.timedelta(seconds=rng.randint(0, 50000)))
        for i in range(300)
    ]
    ivls = []
    for i in range(120):
        s = base + dt.timedelta(seconds=rng.randint(0, 50000))
        ivls.append(
            (f"i{i}", rng.randint(0, 3), s, s + dt.timedelta(seconds=rng.randint(0, 4000)))
        )
    expected = sorted(
        (p[0], v[0])
        for p in pts
        for v in ivls
        if p[1] == v[1] and v[2] <= p[2] <= v[3]
    )
    points = spark.createDataFrame(pts, "pid string, k int, ts timestamp")
    intervals = spark.createDataFrame(
        ivls, "iid string, k int, start_ts timestamp, end_ts timestamp"
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, on=["k"], bucket_width_s=600
        ).select("pid", "iid").collect()
    )
    assert got == expected and len(expected) > 100
