"""Autocorrelation (operators/acf.py): pinned against a direct Python
implementation of the product-moment estimator (unexpanded form — the
operator's algebraic expansion must agree to float tolerance), plus
structural checks: periodic series peak at the period, multi-group
independence, zero-variance and short-series edge handling."""

import pytest

from tachyon_spark.operators.acf import autocorrelation


def _acf(values, max_lag):
    n = len(values)
    m = sum(values) / n
    den = sum((v - m) ** 2 for v in values)
    out = {}
    for k in range(1, max_lag + 1):
        if k >= n or den == 0:
            continue
        num = sum(
            (values[t] - m) * (values[t + k] - m) for t in range(n - k)
        )
        out[k] = num / den
    return out


def test_matches_python_model(spark):
    values = [float((i * 7) % 13 + (i % 24)) for i in range(96)]
    df = spark.createDataFrame(
        list(enumerate(values)), "ts long, value double"
    )
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in autocorrelation(df, "ts", "value", 30).collect()
    }
    exp = _acf(values, 30)
    assert set(got) == set(exp)
    for k, e in exp.items():
        n_pairs, a = got[k]
        assert n_pairs == len(values) - k
        assert a == pytest.approx(e, abs=1e-9), k


def test_periodic_series_peaks_at_period(spark):
    period = 12
    values = [float(i % period) for i in range(10 * period)]
    df = spark.createDataFrame(
        list(enumerate(values)), "ts long, value double"
    )
    got = {
        r["lag"]: r["acf"]
        for r in autocorrelation(df, "ts", "value", period).collect()
    }
    assert got[period] == max(got.values())
    # non-circular estimator over a perfect sawtooth: (n - period)/n
    assert got[period] == pytest.approx(1 - period / (10 * period))


def test_groups_and_edges(spark):
    rows = (
        [("p", i, float(i % 4)) for i in range(20)]
        + [("flat", i, 5.0) for i in range(20)]  # zero variance -> dropped
        + [("short", 0, 1.0), ("short", 1, 2.0)]
    )
    df = spark.createDataFrame(rows, "g string, ts long, value double")
    out = autocorrelation(df, "ts", "value", 6, group_cols=["g"]).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], {})[r["lag"]] = r["acf"]
    assert "flat" not in by_g
    assert set(by_g["short"]) == {1}  # only lag 1 has overlap
    exp = _acf([float(i % 4) for i in range(20)], 6)
    for k, e in exp.items():
        assert by_g["p"][k] == pytest.approx(e, abs=1e-9)


def test_max_lag_validation(spark):
    df = spark.createDataFrame([(0, 1.0)], "ts long, value double")
    with pytest.raises(ValueError, match="max_lag"):
        autocorrelation(df, "ts", "value", 0)
