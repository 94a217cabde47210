"""Property-based fuzz of the round-12 series operators
(operators/seasonal.py, operators/acf.py) against direct Python models
over random integer-valued series — the integer-exactness contract both
driver gates rely on means agreement should be essentially exact, so
the tolerance here is 1e-9 absolute. One Spark job pair per example;
series kept short (<= 3 periods x 12)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tachyon_spark.operators.acf import autocorrelation
from tachyon_spark.operators.seasonal import seasonal_decompose

series = st.lists(
    st.integers(min_value=0, max_value=1000), min_size=8, max_size=36
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(values=series, period=st.integers(min_value=2, max_value=7))
def test_seasonal_decompose_matches_model(spark, values, period):
    vals = [float(v) for v in values]
    n, half = len(vals), period // 2
    den = 2 * period if period % 2 == 0 else period
    df = spark.createDataFrame(
        list(enumerate(vals)), "ts long, value double"
    )
    rows = {
        r["ts"]: r
        for r in seasonal_decompose(df, "ts", "value", period).collect()
    }
    num = [None] * n
    for i in range(n):
        if period % 2 == 0:
            if i - half >= 0 and i + half <= n - 1:
                num[i] = sum(vals[i - half:i + half]) + sum(
                    vals[i - half + 1:i + half + 1]
                )
        elif i - half >= 0 and i + half <= n - 1:
            num[i] = sum(vals[i - half:i + half + 1])
    seas = {}
    for p in range(period):
        pts = [vals[i] * den - num[i] for i in range(p, n, period)
               if num[i] is not None]
        if pts:
            seas[p] = sum(pts) / (len(pts) * den)
    for i in range(n):
        r = rows[i]
        trend = None if num[i] is None else num[i] / den
        s = seas.get(i % period)
        rem = (
            None if trend is None or s is None
            else vals[i] - trend - s
        )
        for col, exp in (("trend", trend), ("seasonal", s),
                         ("remainder", rem)):
            if exp is None:
                assert r[col] is None, (i, col)
            else:
                assert abs(r[col] - exp) < 1e-9, (i, col, r[col], exp)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(values=series, max_lag=st.integers(min_value=1, max_value=6))
def test_autocorrelation_matches_model(spark, values, max_lag):
    vals = [float(v) for v in values]
    n = len(vals)
    df = spark.createDataFrame(
        list(enumerate(vals)), "ts long, value double"
    )
    got = {
        r["lag"]: r["acf"]
        for r in autocorrelation(df, "ts", "value", max_lag).collect()
    }
    m = sum(vals) / n
    den = sum((v - m) ** 2 for v in vals)
    exp = {}
    for k in range(1, max_lag + 1):
        if k >= n or den == 0:
            continue
        exp[k] = sum(
            (vals[t] - m) * (vals[t + k] - m) for t in range(n - k)
        ) / den
    assert set(got) == set(exp)
    for k, e in exp.items():
        assert math.isclose(got[k], e, rel_tol=0, abs_tol=1e-9), k
