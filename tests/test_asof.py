"""Point-in-time (as-of) join: window-plan result == brute-force range join."""

import pytest
from pyspark.sql import functions as F

from entityresolution_capstone_spark.operators.asof import asof_join_backward


@pytest.fixture(scope="module")
def tables(spark):
    left = spark.createDataFrame(
        [
            (1, 1, 100, "p1"),
            (2, 1, 200, "p2"),
            (3, 1, 50, "p0"),   # before any right row
            (4, 2, 100, "q1"),  # key with no right rows at all
            (5, 1, 150, "tie"),  # equal-ts right row must be visible
        ],
        "event_id long, k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, 90, 10.0),
            (1, 150, 20.0),
            (1, 199, 30.0),
        ],
        "k long, ts long, v double",
    )
    return left, right


def test_asof_backward_matches_bruteforce(spark, tables):
    left, right = tables
    got = {
        r["event_id"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join_backward(left, right, on=["k"], ts_col="ts").collect()
    }
    # brute force: max-ts right row with r.ts <= l.ts per left row
    brute = (
        left.join(right, on=[left.k == right.k, right.ts <= left.ts], how="left")
        .groupBy("event_id")
        .agg(F.max_by(F.struct(right.ts, right.v), right.ts).alias("m"))
        .collect()
    )
    want = {
        r["event_id"]: ((r["m"]["ts"], r["m"]["v"]) if r["m"] else (None, None))
        for r in brute
    }
    assert got == want
    assert got[3] == (None, None)       # nothing precedes ts=50
    assert got[4] == (None, None)       # key has no right rows
    assert got[5] == (150, 20.0)        # same-instant right row is visible
    assert got[2] == (199, 30.0)


def test_asof_left_rows_preserved(spark, tables):
    left, right = tables
    out = asof_join_backward(left, right, on=["k"], ts_col="ts")
    assert out.count() == left.count()
    assert set(out.columns) == {"event_id", "k", "ts", "tag", "asof_ts", "asof_v"}
