import pytest

from tachyon_spark.operators.range_join import range_join


@pytest.fixture(scope="module")
def frames(spark):
    events = spark.createDataFrame(
        [("u1", 5, 1.0), ("u1", 15, 2.0), ("u1", 25, 3.0), ("u2", 15, 4.0)],
        "user string, ts long, value double",
    )
    intervals = spark.createDataFrame(
        [("u1", 10, 20, "w1"), ("u1", 24, 30, "w2"), ("u2", 0, 9, "w3")],
        "user string, start long, end long, label string",
    )
    return events, intervals


EXPECTED = {("u1", 15, "w1"), ("u1", 25, "w2")}


def test_range_join_broadcast(frames):
    events, intervals = frames
    out = range_join(events, intervals, by=["user"])
    assert {(r.user, r.ts, r.label) for r in out.collect()} == EXPECTED


def test_range_join_bucketized(frames):
    events, intervals = frames
    out = range_join(events, intervals, by=["user"], bucket=7)
    assert {(r.user, r.ts, r.label) for r in out.collect()} == EXPECTED
    # no duplicate matches even when an interval spans several buckets
    assert out.count() == 2


def test_range_join_no_keys(frames):
    events, intervals = frames
    out = range_join(events, intervals.drop("user"))
    # without keys every interval can match every event in range
    got = {(r.ts, r.label) for r in out.collect()}
    assert got == {(15, "w1"), (25, "w2"), (5, "w3")}


def test_range_join_inclusive_bounds(spark):
    events = spark.createDataFrame([(10,), (20,)], "ts long")
    intervals = spark.createDataFrame([(10, 20, "w")], "start long, end long, label string")
    out = range_join(events, intervals)
    assert sorted(r.ts for r in out.collect()) == [10, 20]
