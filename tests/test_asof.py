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


def test_asof_forward_and_nearest(spark):
    from tachyon_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("a", 10), ("a", 25), ("a", 40), ("b", 5)], "k string, ts long"
    )
    right = spark.createDataFrame(
        [("a", 8, 1.0), ("a", 25, 2.0), ("a", 30, 3.0), ("b", 50, 9.0)],
        "k string, ts long, value double",
    )
    fwd = {(r.k, r.ts): r.value_asof for r in
           asof_join(left, right, by=["k"], direction="forward").collect()}
    # 10 -> next right at 25; 25 -> exact match 25 (>=); 40 -> none
    assert fwd == {("a", 10): 2.0, ("a", 25): 2.0, ("a", 40): None, ("b", 5): 9.0}
    near = {(r.k, r.ts): r.value_asof for r in
            asof_join(left, right, by=["k"], direction="nearest").collect()}
    # 10: back 8 (d=2) vs fwd 25 (d=15) -> 1.0 ; 40: only back 30 -> 3.0
    assert near == {("a", 10): 1.0, ("a", 25): 2.0, ("a", 40): 3.0, ("b", 5): 9.0}
    # tolerance applies per side in nearest
    near_t = {(r.k, r.ts): r.value_asof for r in
              asof_join(left, right, by=["k"], direction="nearest", tolerance=5).collect()}
    assert near_t[("a", 40)] is None and near_t[("b", 5)] is None
    assert near_t[("a", 10)] == 1.0
    import pytest as _pt

    with _pt.raises(ValueError):
        asof_join(left, right, direction="sideways")


def test_asof_directions_match_pandas(spark):
    """Fuzz all three directions against pandas.merge_asof on shared data."""
    import random

    import pandas as pd

    rnd = random.Random(11)
    for trial in range(3):
        lrows = sorted({rnd.randrange(0, 200) for _ in range(30)})
        rrows = sorted({rnd.randrange(0, 200) for _ in range(25)})
        lpd = pd.DataFrame({"ts": lrows})
        rpd = pd.DataFrame({"ts": rrows, "value": [float(t * 2 + 1) for t in rrows]})
        left = spark.createDataFrame(lpd.assign(k="x"), "ts long, k string")
        right = spark.createDataFrame(rpd.assign(k="x"), "ts long, value double, k string")
        from tachyon_spark.operators.asof import asof_join

        for direction in ("backward", "forward", "nearest"):
            ref = pd.merge_asof(lpd, rpd, on="ts", direction=direction)
            got = {r.ts: r.value_asof for r in
                   asof_join(left, right, by=["k"], direction=direction).collect()}
            for ts, v in zip(ref["ts"], ref["value"]):
                g = got[ts]
                assert (pd.isna(v) and g is None) or g == v, (direction, ts, v, g)
