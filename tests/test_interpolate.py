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


def test_bucketed_matches_golden_every_n_buckets(golden_db):
    """The ungrouped path is time-bucketed with boundary carry-in; the result
    must be identical for ANY bucket count, including buckets that fall
    entirely inside one side's sample gap (forcing multi-bucket carry)."""
    from tachyon_spark.operators.interpolate import interpolated_binop

    a = golden_db.query("ia3", 0, 100).df()
    b = golden_db.query("ib3", 0, 100).df()
    ts_union = sorted(set(A3_TS) | set(B3_TS))
    want = list(zip(ts_union, GOLDEN_3_V))
    for n in (1, 2, 3, 5, 16, 64):
        out = interpolated_binop(a, b, "+", integer_result=True, n_buckets=n)
        got = [(r.ts, r.value) for r in out.collect()]
        assert got == want, f"n_buckets={n}"


def test_bucketed_plan_is_partitioned(golden_db):
    """Scale contract: the ungrouped interpolation's sample-data windows are
    hash-partitioned by time bucket — never a single unbounded partition."""
    from tachyon_spark.operators.interpolate import interpolated_binop

    a = golden_db.query("ia", 0, 100).df()
    b = golden_db.query("ib", 0, 100).df()
    out = interpolated_binop(a, b, "+", integer_result=True, n_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__bkt" in plan
    # every window over ts-ordered sample rows carries the __bkt partition spec
    for line in plan.split("\n"):
        if "windowspecdefinition(ts#" in line:
            raise AssertionError(f"unpartitioned sample window: {line.strip()[:120]}")


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
