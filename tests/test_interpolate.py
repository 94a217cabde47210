"""Interpolating vector-to-vector join goldens (lib.rs:1395-1470, FIXTURES.md C)."""

GOLDEN_1_TS = [5, 10, 15, 20, 25, 30, 35, 40, 45]
GOLDEN_1_V = [10, 10, 20, 30, 20, 10, 20, 30, 30]

A3_TS = [1, 2, 4, 6, 10, 12, 13, 14, 15, 16]
B3_TS = [3, 5, 7, 8, 9, 11, 16]
GOLDEN_3_V = [40, 50, 55, 60, 55, 40, 30, 40, 40, 35, 25, 20, 25, 30, 90, 110]


def test_golden_1(golden_db):
    q = golden_db.query("ia + ib", 0, 100)
    assert q.rows() == list(zip(GOLDEN_1_TS, GOLDEN_1_V))


def test_golden_2_commutative(golden_db):
    q = golden_db.query("ib + ia", 0, 100)
    assert q.rows() == list(zip(GOLDEN_1_TS, GOLDEN_1_V))


def test_golden_3(golden_db):
    q = golden_db.query("ia3 + ib3", 0, 100)
    ts_union = sorted(set(A3_TS) | set(B3_TS))
    assert q.rows() == list(zip(ts_union, GOLDEN_3_V))


def test_grouped_series_cols(spark):
    """The distributed variant: windows partition by series key, and each
    key reproduces the same golden interpolation independently."""
    from pyspark.sql import functions as F

    from tachyon_spark.operators.interpolate import interpolated_binop

    ia = [(10, 0), (20, 20), (30, 0), (40, 20)]
    ib = [(5, 10), (15, 10), (25, 10), (35, 10), (45, 10)]
    rows_a = [(k, t, float(v)) for k in ("k1", "k2") for t, v in ia]
    rows_b = [(k, t, float(v)) for k in ("k1", "k2") for t, v in ib]
    a = spark.createDataFrame(rows_a, "key string, ts long, value double")
    b = spark.createDataFrame(rows_b, "key string, ts long, value double")
    out = interpolated_binop(a, b, "+", integer_result=True, series_cols=["key"])
    got = {(r.key, r.ts): r.value for r in out.collect()}
    for k in ("k1", "k2"):
        assert [got[(k, t)] for t in GOLDEN_1_TS] == GOLDEN_1_V
