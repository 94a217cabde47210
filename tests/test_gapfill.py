"""Grid gap-filling (operators/gapfill.py): grid coverage, all four
fill methods against a pure-Python model, explicit-range semantics,
multi-group independence, off-grid detection, edge handling."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401

from tachyon_spark.operators.gapfill import gapfill


def test_locf_and_grid_coverage(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (30, 4.0), (50, 9.0)], "ts long, v double"
    )
    out = gapfill(df, "ts", "v", 10, method="locf")
    got = {r["ts"]: (r["value"], r["filled"]) for r in out.collect()}
    assert sorted(got) == [0, 10, 20, 30, 40, 50]
    assert got[0] == (1.0, False)
    assert got[10] == (1.0, True) and got[20] == (1.0, True)
    assert got[30] == (4.0, False)
    assert got[40] == (4.0, True)
    assert got[50] == (9.0, False)


def test_linear_is_exact_and_edges_stay_null(spark):
    df = spark.createDataFrame(
        [(10, 2.0), (40, 8.0), (60, 4.0)], "ts long, v double"
    )
    out = gapfill(
        df, "ts", "v", 10, method="linear", start=0, end=70
    )
    got = {r["ts"]: (r["value"], r["filled"]) for r in out.collect()}
    assert sorted(got) == [0, 10, 20, 30, 40, 50, 60, 70]
    # leading/trailing holes: NULL (TimescaleDB interpolate semantics)
    assert got[0] == (None, True) and got[70] == (None, True)
    # exact interior interpolation
    assert got[20] == (2.0 + 6.0 * (10.0 / 30.0), True)
    assert got[30] == (2.0 + 6.0 * (20.0 / 30.0), True)
    assert got[50] == (8.0 + (-4.0) * (10.0 / 20.0), True)
    assert got[40] == (8.0, False)


def test_null_and_value_methods(spark):
    df = spark.createDataFrame([(0, 5.0), (20, 7.0)], "ts long, v double")
    null_out = {r["ts"]: r["value"]
                for r in gapfill(df, "ts", "v", 10, method="null").collect()}
    assert null_out == {0: 5.0, 10: None, 20: 7.0}
    val_out = {r["ts"]: r["value"]
               for r in gapfill(
                   df, "ts", "v", 10, method="value", fill_value=-1.0
               ).collect()}
    assert val_out == {0: 5.0, 10: -1.0, 20: 7.0}


def test_groups_fill_independently(spark):
    rows = [("a", 0, 1.0), ("a", 20, 3.0), ("b", 100, 10.0),
            ("b", 110, 11.0)]
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    out = gapfill(df, "ts", "v", 10, group_cols=["g"], method="locf")
    got = {(r["g"], r["ts"]): r["value"] for r in out.collect()}
    assert got == {
        ("a", 0): 1.0, ("a", 10): 1.0, ("a", 20): 3.0,
        ("b", 100): 10.0, ("b", 110): 11.0,
    }


def test_explicit_range_drops_outside_and_fills_empty(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (100, 9.0)], "ts long, v double"
    )
    out = gapfill(
        df, "ts", "v", 10, method="value", fill_value=0.0,
        start=20, end=40,
    )
    got = {r["ts"]: r["value"] for r in out.collect()}
    assert got == {20: 0.0, 30: 0.0, 40: 0.0}


def test_off_grid_timestamp_raises(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (15, 2.0), (20, 3.0)], "ts long, v double"
    )
    with pytest.raises(Exception, match="not on the step grid"):
        gapfill(df, "ts", "v", 10).collect()


def test_validation(spark):
    df = spark.createDataFrame([(0, 1.0)], "ts long, v double")
    with pytest.raises(ValueError, match="step"):
        gapfill(df, "ts", "v", 0)
    with pytest.raises(ValueError, match="unknown method"):
        gapfill(df, "ts", "v", 10, method="nearest")
    with pytest.raises(ValueError, match="together"):
        gapfill(df, "ts", "v", 10, start=0)
    with pytest.raises(ValueError, match="collide"):
        gapfill(
            df.withColumnRenamed("ts", "value"), "value", "v", 10
        )


def test_chunked_grid_crosses_chunk_boundaries(spark):
    # a grid longer than one chunk (8192 steps) must stay contiguous
    n = 20000
    df = spark.createDataFrame(
        [(0, 1.0), ((n - 1) * 5, 2.0)], "ts long, v double"
    )
    out = gapfill(df, "ts", "v", 5, method="locf")
    stats = out.agg(
        F.count("*"), F.min("ts"), F.max("ts"),
        F.count(F.when(F.col("filled"), 1)),
    ).first()
    assert tuple(stats) == (n, 0, (n - 1) * 5, n - 2)
    # every step present exactly once
    assert out.select("ts").distinct().count() == n


def test_locf_max_carry_limits_staleness(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (60, 7.0)], "ts long, v double"
    )
    out = gapfill(df, "ts", "v", 10, method="locf", max_carry=2)
    got = {r["ts"]: r["value"] for r in out.collect()}
    assert got == {
        0: 1.0, 10: 1.0, 20: 1.0, 30: None, 40: None, 50: None, 60: 7.0,
    }
    with pytest.raises(ValueError, match="max_carry"):
        gapfill(df, "ts", "v", 10, method="linear", max_carry=2)
    with pytest.raises(ValueError, match="max_carry"):
        gapfill(df, "ts", "v", 10, method="locf", max_carry=0)


def test_duplicate_timestamp_raises(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (20, 3.0)], "ts long, v double"
    )
    with pytest.raises(Exception, match="duplicate rows"):
        gapfill(df, "ts", "v", 10).collect()


def test_regularize_then_analyze_pipeline(spark):
    """The end-to-end story the series analytics document: bucket an
    irregular event stream, gapfill the holes, then decompose/correlate
    on the now-regular grid — every stage a driver-gated operator."""
    import math

    from tachyon_spark.operators.acf import autocorrelation
    from tachyon_spark.operators.seasonal import seasonal_decompose

    # irregular raw points: a daily-periodic signal sampled patchily
    period, days = 24, 12
    raw = []
    for h in range(period * days):
        if (h * 7) % 11 == 3:
            continue  # drop ~9% of hours -> holes
        for k in range((h % 3) + 1):  # 1-3 events per surviving hour
            raw.append((
                h * 3600 + k * 7,
                float(10 + 8 * math.sin(2 * math.pi * h / period)
                      + (h % period)),
            ))
    df = spark.createDataFrame(raw, "ts long, v double")
    hourly = df.groupBy(
        (F.col("ts") - F.col("ts") % 3600).alias("hour")
    ).agg(F.avg("v").alias("v"))
    assert hourly.count() < period * days  # holes exist
    filled = gapfill(hourly, "hour", "v", 3600, method="linear")
    assert filled.count() == filled.select("hour").distinct().count()
    # the filled series is regular: seasonal decomposition reconstructs
    dec = seasonal_decompose(filled, "hour", "value", period)
    mid = [r for r in dec.collect()
           if r["trend"] is not None and r["value"] is not None]
    assert len(mid) > period * (days - 2)
    for r in mid:
        assert r["value"] == pytest.approx(
            r["trend"] + r["seasonal"] + r["remainder"], abs=1e-9
        )
    # and the ACF of the filled series peaks at the period
    acf = {r["lag"]: r["acf"]
           for r in autocorrelation(
               filled.where(F.col("value").isNotNull()),
               "hour", "value", period,
           ).collect()}
    assert acf[period] == max(acf.values())
    assert acf[period] > 0.8


def test_query_range_fill_grouped_and_vector(spark, tmp_path):
    """r14 (fill_grid_plan): the Connection.query_range(fill=...) path
    for BOTH plan kinds — per-stream vector and `sum by` grouped —
    fills only the staleness-dropped steps; scalar results reject."""
    from tachyon_spark.connection import Connection

    conn = Connection(str(tmp_path / "fdb"), spark)
    for k, pts in (("a", [(10, 1.0), (50, 5.0)]), ("b", [(30, 3.0)])):
        conn.create_stream(f'gm{{k="{k}"}}', "f64")
        ins = conn.prepare_insert(f'gm{{k="{k}"}}')
        for t, v in pts:
            ins.insert(t, v)
        ins.flush()

    # vector kind (per-stream grid)
    q = conn.query_range('gm{k="a"}', 0, 70, 10, lookback=10,
                         fill="previous")
    assert q.rows() == [
        (0, None), (10, 1.0), (20, 1.0), (30, 1.0), (40, 1.0),
        (50, 5.0), (60, 5.0), (70, 5.0),
    ]
    # grouped kind (sum by (k)) — groups fill independently
    g = conn.query_range("sum by (k) (gm)", 0, 70, 10, lookback=10,
                         fill="value:0").df()
    got = {(r["k"], r["ts"]): r["value"] for r in g.collect()}
    assert got[("a", 0)] == 0.0 and got[("a", 30)] == 0.0
    assert got[("a", 20)] == 1.0  # lookback-resolved, not filled
    assert got[("b", 30)] == 3.0 and got[("b", 50)] == 0.0
    assert len(got) == 16  # 2 groups x 8 steps
    # linear on grouped
    lin = conn.query_range('gm{k="a"}', 0, 70, 10, lookback=10,
                           fill="linear").rows()
    d = dict(lin)
    assert d[30] == 1.0 + 4.0 * (10.0 / 30.0)
    assert d[0] is None and d[70] is None
    # ungrouped aggregate = anonymous grid vector: fill applies too
    s = dict(conn.query_range("sum(gm)", 0, 70, 10, lookback=10,
                              fill="value:0").rows())
    assert s[0] == 0.0 and s[70] == 0.0  # no series resolves there
    assert s[40] == 3.0  # b's sample rides lookback — not a fill
