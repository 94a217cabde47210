from tachyon_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("u1", 10, 1.0), ("u1", 25, 2.0), ("u2", 10, 3.0)],
        "user string, ts long, value double",
    )
    right = spark.createDataFrame(
        [("u1", 5, 100.0), ("u1", 20, 200.0), ("u3", 1, 999.0)],
        "user string, ts long, value double",
    )
    return left, right


def test_asof_backward_basic(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by=["user"], out_col="rv")
    rows = {(r.user, r.ts): r.rv for r in out.collect()}
    assert rows[("u1", 10)] == 100.0  # 5 <= 10, latest
    assert rows[("u1", 25)] == 200.0  # 20 <= 25
    assert rows[("u2", 10)] is None  # no right rows for u2


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame([("u1", 20, 1.0)], "user string, ts long, value double")
    right = spark.createDataFrame([("u1", 20, 7.0)], "user string, ts long, value double")
    out = asof_join(left, right, on="ts", by=["user"], out_col="rv")
    assert out.head().rv == 7.0  # <= is inclusive


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by=["user"], out_col="rv", tolerance=5)
    rows = {(r.user, r.ts): r.rv for r in out.collect()}
    assert rows[("u1", 10)] == 100.0  # gap 5 <= 5 kept
    assert rows[("u1", 25)] == 200.0  # gap 5 kept
    assert rows[("u2", 10)] is None


def test_asof_preserves_left_columns_and_count(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by=["user"], out_col="rv")
    assert out.columns == ["user", "ts", "value", "rv"]
    assert out.count() == left.count()
