"""Seasonal decomposition (operators/seasonal.py): pinned against a
pure-Python model of the textbook 2xM / M moving-average method, plus
the structural invariants (reconstruction, edge NULLs, per-phase
constancy of the seasonal component, multi-group independence)."""

import math

import pytest
from pyspark.sql import functions as F

from tachyon_spark.operators.seasonal import seasonal_decompose


def _model(values, period):
    """(trend, seasonal, remainder) lists — the same arithmetic the
    operator promises (uncentered per-phase means of detrended)."""
    n = len(values)
    half = period // 2
    den = 2 * period if period % 2 == 0 else period
    num = [None] * n
    for i in range(n):
        if period % 2 == 0:
            if i - half >= 0 and i + half <= n - 1:
                num[i] = sum(values[i - half:i + half]) + sum(
                    values[i - half + 1:i + half + 1]
                )
        else:
            if i - half >= 0 and i + half <= n - 1:
                num[i] = sum(values[i - half:i + half + 1])
    seas = {}
    for p in range(period):
        pts = [values[i] * den - num[i] for i in range(p, n, period)
               if num[i] is not None]
        if pts:
            seas[p] = sum(pts) / (len(pts) * den)
    trend = [None if v is None else v / den for v in num]
    out_seas = [seas.get(i % period) for i in range(n)]
    rem = [
        None if trend[i] is None or out_seas[i] is None
        else values[i] - trend[i] - out_seas[i]
        for i in range(n)
    ]
    return trend, out_seas, rem


@pytest.mark.parametrize("period", [4, 5, 24])
def test_matches_python_model(spark, period):
    n = 6 * period
    values = [((i * 7) % 13) + 3 * math.sin(0)  # deterministic ints
              + ((i // period) % 4) for i in range(n)]
    values = [float(int(v)) for v in values]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "ts long, value double"
    )
    out = {
        r["ts"]: r
        for r in seasonal_decompose(df, "ts", "value", period).collect()
    }
    trend, seas, rem = _model(values, period)
    for i in range(n):
        r = out[i]
        assert r["phase"] == i % period
        for col, exp in (("trend", trend[i]), ("seasonal", seas[i]),
                         ("remainder", rem[i])):
            if exp is None:
                assert r[col] is None, (i, col)
            else:
                assert r[col] == pytest.approx(exp, abs=1e-12), (i, col)


def test_reconstruction_and_edges(spark):
    period = 6
    n = 5 * period
    df = spark.createDataFrame(
        [(i, float((i % period) * 10 + i // period)) for i in range(n)],
        "ts long, value double",
    )
    rows = seasonal_decompose(df, "ts", "value", period).collect()
    half = period // 2
    for r in sorted(rows, key=lambda r: r["ts"]):
        i = r["ts"]
        if i < half or i > n - 1 - half:
            assert r["trend"] is None and r["remainder"] is None
        else:
            assert r["value"] == pytest.approx(
                r["trend"] + r["seasonal"] + r["remainder"], abs=1e-9
            )
    # seasonal is a pure function of phase
    by_phase = {}
    for r in rows:
        if r["seasonal"] is not None:
            by_phase.setdefault(r["phase"], set()).add(r["seasonal"])
    assert all(len(v) == 1 for v in by_phase.values())


def test_groups_decompose_independently(spark):
    period = 4
    rows = [("a", i, float(i % period)) for i in range(16)] + [
        ("b", i, float(100 + (i % period) * 5)) for i in range(16)
    ]
    df = spark.createDataFrame(rows, "g string, ts long, value double")
    out = seasonal_decompose(df, "ts", "value", period, group_cols=["g"])
    got = {(r["g"], r["ts"]): r for r in out.collect()}
    # constant-per-phase series: trend is the flat mean, remainder 0
    a_mid = got[("a", 8)]
    assert a_mid["trend"] == pytest.approx(1.5)
    assert a_mid["remainder"] == pytest.approx(0.0, abs=1e-12)
    b_mid = got[("b", 8)]
    assert b_mid["trend"] == pytest.approx(100 + 1.5 * 5)
    assert b_mid["remainder"] == pytest.approx(0.0, abs=1e-12)


def test_period_validation(spark):
    df = spark.createDataFrame([(0, 1.0)], "ts long, value double")
    with pytest.raises(ValueError, match="period"):
        seasonal_decompose(df, "ts", "value", 1)


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


@pytest.mark.parametrize("period", [4, 5])
def test_robust_median_matches_python_model(spark, period):
    # VERDICT r12 item 7: robust=True takes the per-phase MEDIAN of the
    # detrended series; an injected spike must not drag its phase
    n = 8 * period
    values = [float((i * 7) % 13 + (i // period) % 4) for i in range(n)]
    values[3 * period + 1] += 1000.0  # the outlier
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "ts long, value double"
    )
    out = {
        r["ts"]: r
        for r in seasonal_decompose(
            df, "ts", "value", period, robust=True
        ).collect()
    }
    half = period // 2
    den = 2 * period if period % 2 == 0 else period
    num = [None] * n
    for i in range(half, n - half):
        if period % 2 == 0:
            num[i] = sum(values[i - half:i + half]) + sum(
                values[i - half + 1:i + half + 1]
            )
        else:
            num[i] = sum(values[i - half:i + half + 1])
    for p in range(period):
        pts = [values[i] * den - num[i] for i in range(p, n, period)
               if num[i] is not None]
        exp = _median(pts) / den
        got = {out[i]["seasonal"] for i in range(p, n, period)}
        assert len(got) == 1, p
        assert got.pop() == pytest.approx(exp, abs=1e-12), p
    # robustness: the mean-based seasonal of the spiked phase moves by
    # ~1000/count; the median-based one must stay near the clean value
    clean = seasonal_decompose(
        spark.createDataFrame(
            [(i, float((i * 7) % 13 + (i // period) % 4))
             for i in range(n)],
            "ts long, value double",
        ),
        "ts", "value", period, robust=True,
    ).where(F.col("phase") == (3 * period + 1) % period)
    clean_val = clean.select("seasonal").first()[0]
    spiked_val = out[(3 * period + 1) % period]["seasonal"]
    assert abs(spiked_val - clean_val) < 5.0  # mean would shift ~150


def test_output_name_collision_raises(spark):
    df = spark.createDataFrame(
        [("x", 0, 1.0)], "value string, ts long, v double"
    )
    with pytest.raises(ValueError, match="collide"):
        seasonal_decompose(df, "ts", "v", 4, group_cols=["value"])
    df2 = spark.createDataFrame([(0, 1.0)], "trend long, v double")
    with pytest.raises(ValueError, match="collide"):
        seasonal_decompose(df2, "trend", "v", 4)


def test_seasonal_strength_separates_seasonal_from_noise(spark):
    from tachyon_spark.operators.seasonal import seasonal_strength

    import random

    rng = random.Random(7)
    period, n = 12, 240
    rows = []
    for i in range(n):
        rows.append(("seasonal", i, float((i % period) * 10 + rng.uniform(-1, 1))))
        rows.append(("noise", i, float(rng.uniform(0, 100))))
    df = spark.createDataFrame(rows, "g string, ts long, value double")
    got = {
        r["g"]: (r["n"], r["strength"])
        for r in seasonal_strength(
            df, "ts", "value", period, group_cols=["g"]
        ).collect()
    }
    # edges trimmed by the MA trend: n = total - 2*(period/2)
    assert got["seasonal"][0] == n - period
    assert got["seasonal"][1] > 0.95
    assert got["noise"][1] < 0.5


def test_seasonal_strength_constant_series_is_null(spark):
    from tachyon_spark.operators.seasonal import seasonal_strength

    df = spark.createDataFrame(
        [(i, 5.0) for i in range(48)], "ts long, value double"
    )
    rows = seasonal_strength(df, "ts", "value", 12).collect()
    assert len(rows) == 1 and rows[0]["strength"] is None


def test_seasonal_strength_matches_python_model(spark):
    from tachyon_spark.operators.seasonal import seasonal_strength

    period, n = 6, 90
    vals = [float((i % period) * 3 + (i * 7) % 5) for i in range(n)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "ts long, value double"
    )
    dec = {r["ts"]: r for r in seasonal_decompose(
        df, "ts", "value", period).collect()}
    rem = [dec[i]["remainder"] for i in range(n)
           if dec[i]["remainder"] is not None]
    det = [dec[i]["seasonal"] + dec[i]["remainder"] for i in range(n)
           if dec[i]["remainder"] is not None]

    def _varp(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)

    exp = max(0.0, 1.0 - _varp(rem) / _varp(det))
    got = seasonal_strength(df, "ts", "value", period).collect()[0]
    assert got["n"] == len(rem)
    assert got["strength"] == pytest.approx(exp, abs=1e-9)


def test_seasonal_strength_collision_raises(spark):
    from tachyon_spark.operators.seasonal import seasonal_strength

    df = spark.createDataFrame(
        [("x", 0, 1.0)], "n string, ts long, v double"
    )
    with pytest.raises(ValueError, match="collide"):
        seasonal_strength(df, "ts", "v", 4, group_cols=["n"])


def test_dunder_input_columns_raise(spark):
    from tachyon_spark.operators.seasonal import seasonal_strength

    df = spark.createDataFrame(
        [("x", 0, 1.0)], "__vr string, ts long, v double"
    )
    with pytest.raises(ValueError, match="collide"):
        seasonal_decompose(df, "ts", "v", 4, group_cols=["__vr"])
    with pytest.raises(ValueError, match="collide"):
        seasonal_strength(df, "ts", "v", 4, group_cols=["__vr"])
