"""Round-10 ADVICE conformance pins.

One test per round-9 advisor finding, locking the fixed behavior:

1. py_arith('^', 0, negative) — Go math.Pow / java.lang.Math.pow return
   +Inf (−Inf for a −0.0 base with a negative odd-integer exponent);
   CPython's math.pow raises ValueError instead. The scalar literal fold
   must match the Spark column path (F.pow) and Prometheus.
2. _extrapolate clamp order — current Prometheus (promql/functions.go
   since PR #13725, v2.53+) applies the 1.1x-threshold clamp to the
   start gap FIRST and the counter zero-crossing minimum to the clamped
   value; the orders diverge when ds >= thr and the zero crossing lands
   between avg/2 and 1.1*avg.
3. rolling_range_agg bucket ids — exact integer floor-division; the old
   (ts / b).cast('long') double divide mis-buckets nanosecond epochs
   past 2^53 and truncates (not floors) negative ts.
4. absent_over_time over a scalar subquery — clear ValueError, not
   AttributeError on inner.df = None.
"""

from __future__ import annotations

import math

import pytest

from tachyon_spark.arith import py_arith


INF = float("inf")


# --- 1. zero-base negative-exponent pow ----------------------------------

@pytest.mark.parametrize(
    "a,b,expected",
    [
        (0.0, -1.0, INF),       # Go: Pow(+0, y<0 odd int) = +Inf
        (0.0, -2.0, INF),
        (0.0, -0.5, INF),
        (-0.0, -1.0, -INF),     # -0 base, negative odd int -> -Inf
        (-0.0, -3.0, -INF),
        (-0.0, -2.0, INF),      # even int -> +Inf
        (-0.0, -0.5, INF),      # non-integer -> +Inf
        (0.0, 0.0, 1.0),        # unchanged: 0^0 = 1
        (2.0, 3.0, 8.0),
    ],
)
def test_py_arith_pow_zero_base_negative_exponent(a, b, expected):
    assert py_arith("^", a, b) == expected


def test_py_arith_pow_negative_fractional_still_nan():
    assert math.isnan(py_arith("^", -2.0, 0.5))


def test_scalar_fold_matches_column_path(golden_db):
    # the literal fast path (plans/builder.py scalar fold) goes through
    # py_arith; `0 ^ -1` must be +Inf end-to-end, matching F.pow
    rows = golden_db.query("0 ^ -1", 0, 10).rows()
    assert rows[0] == INF


# --- 2. extrapolatedRate v2.53+ clamp order ------------------------------

def test_extrapolate_threshold_clamp_before_zero_crossing(spark, tmp_path):
    """Counter samples at t=35,40 in window (20,40]: first=5, inc=5,
    si=5, n=2, avg=5, thr=5.5, ds=15 >= thr, dz = 5*(5/5) = 5.

    Pre-2.53 order: ds = min(dz, 15) = 5 (< thr, kept) -> increase 10.
    v2.53+ order:   ds = avg/2 = 2.5 first; dz=5 is NOT < 2.5 -> stays
    2.5 -> increase = 5 * (5 + 2.5 + 0)/5 = 7.5."""
    import tachyon_spark as ty

    conn = ty.Connection(
        str(tmp_path / "xdb"), spark, prometheus_extrapolation=True
    )
    conn.create_stream("c", "f64")
    ins = conn.prepare_insert("c")
    for t, v in [(35, 5.0), (40, 10.0)]:
        ins.insert(t, v)
    ins.flush()
    q = conn.query_range("increase(c[20])", 40, 40, 10, lookback=10)
    assert q.rows()[0][1] == pytest.approx(7.5)


# --- 3. rolling bucket ids are exact integer floor-division --------------

def test_rolling_bucket_exact_at_ns_epoch_scale(spark):
    """Nanosecond-scale epochs (> 2^53): a row `width` before another
    must stay inside the lookback frame; the double-divide bucket id
    rounded such neighbors into different buckets, dropping them."""
    from pyspark.sql import functions as F

    from tachyon_spark.operators.rolling import rolling_range_agg

    base = 1_700_000_000_000_000_000  # ns epoch, > 2^53
    w = 3_600_000_000_000  # 1h in ns
    rows = [(base, 1.0), (base + w, 2.0), (base + w + 1, 3.0)]
    df = spark.createDataFrame(rows, "ts long, value double").withColumn(
        "k", F.lit("a")
    )
    out = rolling_range_agg(
        df, ["k"], "ts", w, agg=lambda: F.sum("value"), out_col="s"
    )
    got = {r["ts"]: r["s"] for r in out.collect()}
    # frame (ts-w, ts]: base row sees itself; base+w sees both earlier?
    # no — (base, base+w] excludes base (left-open), holds base+w only...
    # RANGE frame is inclusive both ends (rangeBetween(-w, 0)) => at
    # base+w the frame [base, base+w] holds rows 1 and 2
    assert got[base] == pytest.approx(1.0)
    assert got[base + w] == pytest.approx(3.0)
    assert got[base + w + 1] == pytest.approx(5.0)


def test_rolling_bucket_floors_negative_ts(spark):
    """Negative timestamps: floor-division buckets (not truncation
    toward zero) keep the carry-in contract — a row at -1 and a row at
    +1 with width 10 share a frame."""
    from pyspark.sql import functions as F

    from tachyon_spark.operators.rolling import rolling_range_agg

    rows = [(-5, 1.0), (-1, 2.0), (1, 4.0)]
    df = spark.createDataFrame(rows, "ts long, value double").withColumn(
        "k", F.lit("a")
    )
    out = rolling_range_agg(
        df, ["k"], "ts", 10, agg=lambda: F.sum("value"), out_col="s",
        bucket_width=10,
    )
    got = {r["ts"]: r["s"] for r in out.collect()}
    assert got[1] == pytest.approx(7.0)
    assert got[-1] == pytest.approx(3.0)
    assert got[-5] == pytest.approx(1.0)


# --- 4. absent_over_time over a scalar subquery --------------------------

def test_absent_over_time_scalar_subquery_clear_error(golden_db):
    with pytest.raises(ValueError, match="instant vector"):
        golden_db.query_range(
            "absent_over_time((2)[10:2])", 20, 40, 10
        ).rows()


# --- 5. @ on absent_over_time subqueries (the last erroring @ position) ---

def test_absent_over_time_subquery_at_modifier(golden_db):
    """absent_over_time(expr[R:S] @ T): the pinned window decides
    absence ONCE and the verdict fans across the grid — 1 everywhere
    when (T-R, T] holds no inner instant, empty otherwise."""
    # golden http_requests_total samples live in ts 12..67
    # pinned at 40: window (20, 40] holds instants -> present -> empty
    q = golden_db.query_range(
        "absent_over_time(http_requests_total[20:5] @ 40)", 50, 70, 10
    )
    assert q.rows() == []
    # pinned at 200: window (180, 200] empty (staleness: instants stop
    # lookback past the last sample) -> 1 on every grid step
    q = golden_db.query_range(
        "absent_over_time(http_requests_total[20:5] @ 200)", 50, 70, 10,
        lookback=10,
    )
    assert q.rows() == [(50, 1.0), (60, 1.0), (70, 1.0)]
    # unknown metric with @: absent on the whole grid
    q = golden_db.query_range(
        "absent_over_time(nope_total[20:5] @ 40)", 50, 60, 10
    )
    assert q.rows() == [(50, 1.0), (60, 1.0)]
    # @ end() anchor resolves to the query end
    q = golden_db.query_range(
        "absent_over_time(http_requests_total[20:5] @ end())", 50, 70, 10,
        lookback=10,
    )
    assert q.rows() == []
