"""Aggregate + topk goldens (lib.rs:1032-1150, 1188-1256; FIXTURES.md A/B/D)."""

import pytest


def test_sum(fixture_b):
    assert fixture_b.query("sum(ints)", 0, 100).scalar() == 20


def test_sum_empty_no_row(fixture_b):
    assert fixture_b.query("sum(ints < 0)", 0, 100).rows() == []


def test_count(fixture_b):
    assert fixture_b.query("count(uints)", 0, 100).scalar() == 4


def test_count_empty_is_zero(fixture_b):
    assert fixture_b.query("count(ints < 0)", 0, 100).scalar() == 0


def test_avg(fixture_b):
    assert fixture_b.query("avg(floats)", 0, 100).scalar() == pytest.approx(2.75)


def test_avg_empty_no_row(fixture_b):
    assert fixture_b.query("avg(ints < 0)", 0, 100).rows() == []


def test_min_max(fixture_b):
    assert fixture_b.query("min(ints)", 0, 100).scalar() == 2
    assert fixture_b.query("max(uints)", 0, 100).scalar() == 4
    assert fixture_b.query("min(ints < 0)", 0, 100).rows() == []
    assert fixture_b.query("max(ints < 0)", 0, 100).rows() == []


def test_partial_range_aggregates(golden_db):
    # Fixture A partial range [29,40]: sum=70, count=2, avg=35, min=23, max=47
    sel = 'http_requests_total{service="web"}'
    assert golden_db.query(f"sum({sel})", 29, 40).scalar() == 70
    assert golden_db.query(f"count({sel})", 29, 40).scalar() == 2
    assert golden_db.query(f"avg({sel})", 29, 40).scalar() == pytest.approx(35.0)
    assert golden_db.query(f"min({sel})", 29, 40).scalar() == 23
    assert golden_db.query(f"max({sel})", 29, 40).scalar() == 47


def test_topk(fixture_b):
    assert fixture_b.query("topk(2, ints)", 0, 100).rows() == [8, 6]
    assert fixture_b.query("topk(100, uints)", 0, 100).rows() == [4, 3, 2, 1]
    assert fixture_b.query("topk(0, floats)", 0, 100).rows() == []


def test_bottomk(fixture_b):
    assert fixture_b.query("bottomk(2, ints)", 0, 100).rows() == [2, 4]
    assert fixture_b.query("bottomk(100, uints)", 0, 100).rows() == [1, 2, 3, 4]
    assert fixture_b.query("bottomk(0, floats)", 0, 100).rows() == []


def test_negative_ints(golden_db):
    # lib.rs:1707-1761
    assert golden_db.query("topk(2, neg)", 0, 100).rows() == [-1, -5]
    assert golden_db.query("sum(neg)", 0, 100).scalar() == -1013
    assert golden_db.query("min(neg)", 0, 100).scalar() == -1000


def test_floats_misc(golden_db):
    # lib.rs:1763-1807
    assert golden_db.query("bottomk(1, fl)", 0, 100).rows() == pytest.approx([-23.1])
    assert golden_db.query("avg(fl)", 0, 100).scalar() == pytest.approx(-9.65)


def test_vector_plus_aggregate_scalar(golden_db):
    # web + sum(mobile): each value +127 (lib.rs:1473-1527)
    q = golden_db.query(
        'http_requests_total{service="web"} + sum(http_requests_total{service="mobile"})',
        0, 100,
    )
    assert [v for _, v in q.rows()] == [45 + 127, 47 + 127, 23 + 127, 48 + 127]


def test_sum_div_sum(golden_db):
    q = golden_db.query(
        'sum(http_requests_total{service="web"}) / sum(http_requests_total{service="mobile"})',
        0, 100,
    )
    assert q.scalar() == pytest.approx(163 / 127)
    assert q.value_type == "f64"


def test_same_ts_vector_mul(golden_db):
    # web * mobile on identical timestamps → [405, 846, 0, 4800] (lib.rs:1259-1313)
    q = golden_db.query(
        'http_requests_total{service="web"} * http_requests_total{service="mobile"}',
        0, 100,
    )
    assert q.rows() == [(23, 405), (29, 846), (40, 0), (51, 4800)]


def test_grouped_aggregate_extension(golden_db):
    # beyond-reference: sum by (service) (mg)
    q = golden_db.query("sum by (service) (mg)", 0, 100)
    rows = {r.service: r.value for r in q.df().collect()}
    assert rows == {"web": 30, "mobile": 3}


def test_salted_stats_matches_plain_groupby(spark):
    """Skew-safe two-phase aggregation: same results as the direct groupBy
    (salt only changes the shuffle shape), hot key included."""
    import random

    from pyspark.sql import functions as F

    from tachyon_spark.operators.aggregates import salted_stats

    rnd = random.Random(3)
    rows = [("hot", rnd.uniform(-10, 10)) for _ in range(5000)] + [
        (f"k{i % 7}", rnd.uniform(-10, 10)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "key string, value double")
    got = {
        r.key: (r.n, round(r.sum_value, 6), round(r.avg_value, 9), r.min_value, r.max_value)
        for r in salted_stats(df, ["key"], salt=16).collect()
    }
    exp = {
        r.key: (r.n, round(r.s, 6), round(r.a, 9), r.mn, r.mx)
        for r in df.groupBy("key")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("s"),
            F.avg("value").alias("a"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert got == exp
    # the plan really is two exchanges: (key, salt) then (key)
    plan = salted_stats(df, ["key"], salt=16)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") >= 2
    assert "__salt" in plan


def test_stddev_stdvar(golden_db):
    # ints [2,4,6,8]: population variance = 5, stddev = sqrt(5)
    assert golden_db.query("stdvar(ints)", 0, 100).scalar() == 5.0
    import math

    assert abs(golden_db.query("stddev(ints)", 0, 100).scalar() - math.sqrt(5)) < 1e-12
    # grouped form composes like the other aggregates
    q = golden_db.query("stddev by (service) (mg)", 0, 100)
    rows = {r.service: r.value for r in q.df().collect()}
    assert rows["web"] == 5.0 and rows["mobile"] == 0.5


def test_absent(golden_db):
    assert golden_db.query("absent(ints)", 0, 100).rows() == []
    # unknown metric -> 1
    assert golden_db.query("absent(nope_metric)", 0, 100).scalar() == 1.0
    # known metric, empty range -> 1
    assert golden_db.query("absent(ints)", 1000, 2000).scalar() == 1.0


def test_absent_over_time(golden_db):
    # ints samples at 10,20,30,40; 20-wide windows anchored at 0 over
    # 0..100 -> populated {0,20,40}, absent {60,80,100}
    q = golden_db.query("absent_over_time(ints[20])", 0, 100)
    assert sorted(q.rows()) == [(60, 1.0), (80, 1.0), (100, 1.0)]
    # unknown metric: every window reports 1
    q = golden_db.query("absent_over_time(nope_metric[20])", 0, 100)
    assert sorted(t for t, _ in q.rows()) == [0, 20, 40, 60, 80, 100]
    assert all(v == 1.0 for _, v in q.rows())


def test_topk_by_group(golden_db):
    # top-1 per service over mg: web [10,20] -> 20; mobile [1,2] -> 2
    q = golden_db.query("topk by (service) (1, mg)", 0, 100)
    rows = sorted(tuple(r) for r in q.df().collect())
    assert rows == [("mobile", 2), ("web", 20)]
    # bottomk per group
    q2 = golden_db.query("bottomk by (service) (1, mg)", 0, 100)
    assert sorted(tuple(r) for r in q2.df().collect()) == [("mobile", 1), ("web", 10)]
    # k larger than the group returns the whole group
    q3 = golden_db.query("topk by (service) (5, mg)", 0, 100)
    assert len(q3.df().collect()) == 4


def test_quantile_aggregation(golden_db):
    # ints [2,4,6,8]: exact interpolated median = 5, p25 = 3.5
    assert golden_db.query("quantile(0.5, ints)", 0, 100).scalar() == 5.0
    assert golden_db.query("quantile(0.25, ints)", 0, 100).scalar() == 3.5
    # grouped form: mg web [10,20] -> 15; mobile [1,2] -> 1.5
    q = golden_db.query("quantile by (service) (0.5, mg)", 0, 100)
    rows = {r.service: r.value for r in q.df().collect()}
    assert rows == {"web": 15.0, "mobile": 1.5}


def test_count_values(golden_db):
    # ib: five samples all 10 -> one row ("10", 5)
    q = golden_db.query('count_values("val", ib)', 0, 100)
    assert [tuple(r) for r in q.df().collect()] == [("10", 5)]
    q2 = golden_db.query('count_values("v", ints)', 0, 100)
    assert sorted(tuple(r) for r in q2.df().collect()) == [
        ("2", 1), ("4", 1), ("6", 1), ("8", 1),
    ]


def test_approx_aggregates_flag(golden_db, spark):
    """Connection(approx_aggregates=True): quantile compiles to the
    approx_percentile sketch (mergeable partials, rank error <= 1e-4);
    exact stays the default. Values agree on small data."""
    from tachyon_spark.connection import Connection

    approx = Connection(golden_db.db_dir, spark, approx_aggregates=True)
    q = "quantile(0.5, ints)"
    exact_plan = golden_db.query(q, 0, 100).df()._jdf.queryExecution().executedPlan().toString()
    approx_plan = approx.query(q, 0, 100).df()._jdf.queryExecution().executedPlan().toString()
    assert "approx_percentile" not in exact_plan and "percentile" in exact_plan
    assert "approx_percentile" in approx_plan
    # documented divergence: the sketch returns an ACTUAL element (no
    # linear interpolation) — ints [2,4,6,8] p50 -> 4, exact -> 5
    assert golden_db.query(q, 0, 100).scalar() == 5.0
    assert approx.query(q, 0, 100).scalar() in (4.0, 6.0)
    # quantile_over_time takes the same path
    qo = "quantile_over_time(0.5, ints[20])"
    plan = approx.query(qo, 0, 100).df()._jdf.queryExecution().executedPlan().toString()
    assert "approx_percentile" in plan
    # per window: elements of {2,4} and {6,8} respectively
    got = dict(approx.query(qo, 0, 100).rows())
    assert got[20] in (2, 4) and got[40] in (6, 8)


def test_distinct_count_approx(spark):
    from pyspark.sql import functions as F

    from tachyon_spark.operators.aggregates import distinct_count

    df = spark.createDataFrame(
        [(g, f"u{i % 37}") for g in ("a", "b") for i in range(200)],
        "g string, value string",
    )
    exact = distinct_count(df, ["g"])
    appr = distinct_count(df, ["g"], approx=True, rsd=0.01)
    assert "approx_count_distinct" in appr._jdf.queryExecution().executedPlan().toString()
    ev = {r.g: r.value for r in exact.collect()}
    av = {r.g: r.value for r in appr.collect()}
    assert ev == {"a": 37, "b": 37}
    for g in ev:
        assert abs(av[g] - ev[g]) <= 2  # rsd-bounded


def test_aggregate_over_grouped_children_raw(golden_db):
    """Round 10: raw-mode aggregation composes over grouped results —
    the grouped child collapses the range per group, so re-aggregation
    runs over the group rows (builder._aggregate grouped branch)."""
    # per-service sums of http_requests_total: web=163, cool=66, mobile=127
    q = golden_db.query("max(sum by (service) (http_requests_total))", 0, 100)
    assert q.rows() == [163]
    q = golden_db.query(
        "sum without (service) (sum by (service) (http_requests_total))",
        0, 100,
    )
    assert q.rows() == [163 + 66 + 127]
    q = golden_db.query(
        "avg(sum by (service) (http_requests_total))", 0, 100
    )
    assert q.rows() == [(163 + 66 + 127) / 3]
    import pytest as _pt

    with _pt.raises(ValueError, match="not present"):
        golden_db.query(
            "sum by (nope) (sum by (service) (http_requests_total))", 0, 100
        ).rows()
