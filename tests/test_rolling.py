"""operators/rolling.rolling_range_agg: the bucketed carry-in rolling
window must be row-identical to the plain unbounded RANGE-frame form —
including rows exactly on bucket boundaries, duplicate timestamps, and
frames that span the boundary."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tachyon_spark.operators.rolling import rolling_range_agg


def _plain(df, keys, ts, width, agg, out_col):
    w = Window.partitionBy(*keys).orderBy(ts).rangeBetween(-width, 0)
    return df.withColumn(out_col, agg().over(w))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("bucket_width", [10, 25, 60])
def test_bucketed_equals_plain(spark, bucket_width):
    # width 10; points straddle bucket boundaries for every tested bucket
    # width, with a duplicate ts (7) and a same-ts pair across keys
    data = [
        ("a", 0, 1.0), ("a", 7, 2.0), ("a", 7, 4.0), ("a", 10, 8.0),
        ("a", 19, 16.0), ("a", 20, 32.0), ("a", 21, 64.0), ("a", 30, 128.0),
        ("a", 59, 256.0), ("a", 60, 512.0), ("a", 61, 1024.0),
        ("b", 10, 3.0), ("b", 20, 5.0), ("b", 65, 7.0),
    ]
    df = spark.createDataFrame(data, "k string, ts long, value double")
    got = rolling_range_agg(
        df, ["k"], "ts", 10, lambda: F.avg("value"),
        out_col="r", bucket_width=bucket_width,
    )
    want = _plain(df, ["k"], "ts", 10, lambda: F.avg("value"), "r")
    assert _rows(got) == _rows(want)


def test_bucket_width_floor(spark):
    df = spark.createDataFrame([("a", 0, 1.0)], "k string, ts long, value double")
    with pytest.raises(ValueError, match="bucket_width"):
        rolling_range_agg(
            df, ["k"], "ts", 10, lambda: F.avg("value"), bucket_width=5
        )


def test_other_aggregates(spark):
    data = [("a", t, float(t % 7)) for t in range(0, 100, 3)]
    df = spark.createDataFrame(data, "k string, ts long, value double")
    for agg in (lambda: F.sum("value"), lambda: F.max("value"),
                lambda: F.count("value")):
        got = rolling_range_agg(df, ["k"], "ts", 12, agg, out_col="r",
                                bucket_width=20)
        want = _plain(df, ["k"], "ts", 12, agg, "r")
        assert _rows(got) == _rows(want)


def test_rolling_multi_agg_single_pass(spark):
    """aggs={...} computes several rolling aggregates in one Window pass
    (one exchange), and each matches its single-agg twin."""
    import pyspark.sql.functions as F

    rows = [("a", t, float(v)) for t, v in
            [(0, 1), (5, 2), (10, 3), (17, 4), (30, 5)]]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    multi = rolling_range_agg(
        df, ["k"], "ts", 10,
        aggs={"s": lambda: F.sum("v"), "n": lambda: F.count("v")},
    )
    single = rolling_range_agg(df, ["k"], "ts", 10, lambda: F.sum("v"),
                               out_col="s1")
    got = {r.ts: (r.s, r.n) for r in multi.collect()}
    want_s = {r.ts: r.s1 for r in single.collect()}
    assert {t: s for t, (s, _) in got.items()} == want_s
    assert got[10] == (6.0, 3) and got[30] == (5.0, 1)
    # one Window operator in the plan, not one per aggregate (after
    # execution AQE prints Final + Initial plans; check the final one)
    import re

    plan = multi._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"Window \[", final)) == 1
    assert final.count("Exchange hashpartitioning") == 1
