"""rate/increase/delta extension (ast.RangeFunc — the reference rejects all
function calls, planner.rs:218-222). Raw-sample semantics over [start, end]."""

import pytest


def test_increase(fixture_b):
    # ints: ts [10..40], values [2,4,6,8] -> last - first = 6
    assert fixture_b.query("increase(ints)", 0, 100).scalar() == 6.0


def test_delta_gauge(fixture_b):
    # floats [4.1, 3.2, 2.3, 1.4] -> 1.4 - 4.1
    assert fixture_b.query("delta(floats)", 0, 100).scalar() == pytest.approx(-2.7)


def test_rate(fixture_b):
    # increase 6 over ts span 30 -> 0.2 per ts unit
    assert fixture_b.query("rate(ints)", 0, 100).scalar() == pytest.approx(0.2)


def test_rate_partial_range(fixture_b):
    # range [20, 40]: values [4,6,8], increase 4 over span 20
    assert fixture_b.query("rate(ints)", 20, 40).scalar() == pytest.approx(0.2)
    assert fixture_b.query("increase(ints)", 20, 40).scalar() == 4.0


def test_range_func_single_sample_empty(fixture_b):
    # exactly one sample in range -> no result (PromQL needs 2 points)
    assert fixture_b.query("rate(ints)", 10, 10).scalar() is None
    assert fixture_b.query("increase(ints)", 10, 10).scalar() is None


def test_range_func_composes(fixture_b):
    # rate result is a scalar usable in arithmetic
    assert fixture_b.query("rate(ints) * 10", 0, 100).scalar() == pytest.approx(2.0)


# ---------------------------------------------------------------------------
# matrix selectors: rate/increase/delta per tumbling window (extension; the
# reference REJECTS matrix selectors, planner.rs:208-216)
# ---------------------------------------------------------------------------


def test_windowed_increase(golden_db):
    # web: ts [23,29,40,51] values [45,47,23,48]; windows of 20 from start 0:
    # [20,40): (45,47) -> +2 ; [40,60): (23,48) -> +25
    q = golden_db.query('increase(http_requests_total{service="web"}[20])', 0, 100)
    assert q.rows() == [(20, 2.0), (40, 25.0)]


def test_windowed_rate(golden_db):
    q = golden_db.query('rate(http_requests_total{service="web"}[20])', 0, 100)
    got = dict(q.rows())
    assert got[20] == pytest.approx(2 / 6)  # span 29-23
    assert got[40] == pytest.approx(25 / 11)  # span 51-40


def test_windowed_anchor_at_query_start(golden_db):
    # start=23 shifts the grid: [23,43): (45,47,23) -> 23-45 = -22; [43,63): one
    # sample only (51) -> dropped
    q = golden_db.query('delta(http_requests_total{service="web"}[20])', 23, 100)
    assert q.rows() == [(23, -22.0)]


def test_windowed_anchor_follows_at_modifier(golden_db):
    # `@ 0` pins the selector start to 0, so the window grid anchors at 0
    # even though the query's own start is 23 (no scanned row can sit left
    # of the anchor -> bucketing never sees a negative offset)
    q = golden_db.query(
        'increase(http_requests_total{service="web"}[20] @ 0)', 23, 100
    )
    assert q.rows() == [(20, 2.0), (40, 25.0)]


def test_windowed_rate_composes(golden_db):
    # windowed result is a vector: arithmetic and aggregates apply
    q = golden_db.query('sum(increase(http_requests_total{service="web"}[20]))', 0, 100)
    assert q.scalar() == 27.0


def test_duration_units(golden_db):
    # 1ns unit == native unit here; 20 with no unit == 20 native units
    q1 = golden_db.query('increase(http_requests_total{service="web"}[20ns])', 0, 100)
    assert q1.rows() == [(20, 2.0), (40, 25.0)]


def test_over_time_funcs(golden_db):
    # web: windows of 20 from 0: [20,40): 45,47 ; [40,60): 23,48
    q = 'http_requests_total{service="web"}'
    assert golden_db.query(f"sum_over_time({q}[20])", 0, 100).rows() == [(20, 92), (40, 71)]
    assert golden_db.query(f"count_over_time({q}[20])", 0, 100).rows() == [(20, 2), (40, 2)]
    assert golden_db.query(f"min_over_time({q}[20])", 0, 100).rows() == [(20, 45), (40, 23)]
    assert golden_db.query(f"max_over_time({q}[20])", 0, 100).rows() == [(20, 47), (40, 48)]
    assert golden_db.query(f"last_over_time({q}[20])", 0, 100).rows() == [(20, 47), (40, 48)]
    assert golden_db.query(f"avg_over_time({q}[20])", 0, 100).rows() == [(20, 46.0), (40, 35.5)]
    # single-sample windows DO report (no two-point rule for over_time aggs)
    assert golden_db.query(f"count_over_time({q}[10])", 0, 100).rows() == [
        (20, 2), (40, 1), (50, 1),
    ]
    # composes downstream
    assert golden_db.query(f"sum(sum_over_time({q}[20]))", 0, 100).scalar() == 163


def test_quantile_over_time(golden_db):
    q = 'http_requests_total{service="web"}'
    # [20,40): (45,47) -> p50 = 46 ; [40,60): (23,48) -> p90 = 23 + 0.9*25
    got = golden_db.query(f"quantile_over_time(0.5, {q}[20])", 0, 100).rows()
    assert got == [(20, 46.0), (40, 35.5)]
    got = golden_db.query(f"quantile_over_time(0.9, {q}[20])", 0, 100).rows()
    assert got[0][1] == pytest.approx(46.8) and got[1][1] == pytest.approx(45.5)
    from tachyon_spark.promql import parse
    from tachyon_spark.promql.parser import PromQLError

    for bad in ["quantile_over_time(m[5])", "quantile_over_time(1.5, m[5])",
                "quantile_over_time(0.5, m)"]:
        with pytest.raises(PromQLError):
            parse(bad)


def test_resets_and_changes(golden_db):
    q = 'http_requests_total{service="web"}'
    # values by ts: 45,47,23,48 — one window [0,100): one decrease (47->23),
    # three consecutive changes
    assert golden_db.query(f"resets({q}[100])", 0, 100).rows() == [(0, 1)]
    assert golden_db.query(f"changes({q}[100])", 0, 100).rows() == [(0, 3)]
    # windows of 20: [20,40): 45->47 no reset, 1 change; [40,60): 23->48 same
    assert golden_db.query(f"resets({q}[20])", 0, 100).rows() == [(20, 0), (40, 0)]
    assert golden_db.query(f"changes({q}[20])", 0, 100).rows() == [(20, 1), (40, 1)]
    # per-series on the multi-stream selector: mobile has 18->0 (1 reset)
    got = golden_db.query("resets(http_requests_total[100])", 0, 100).rows()
    # web 47->23, cool 40->20, mobile 18->0: one reset each
    assert sorted(v for _, v in got) == [1, 1, 1]
    from tachyon_spark.promql import parse
    from tachyon_spark.promql.parser import PromQLError

    with pytest.raises(PromQLError, match="range vector"):
        parse("resets(m)")


def test_irate_idelta(golden_db):
    q = 'http_requests_total{service="web"}'
    # last pair in [0,100): (40,23)->(51,48)
    assert golden_db.query(f"idelta({q}[100])", 0, 100).rows() == [(0, 25.0)]
    got = golden_db.query(f"irate({q}[100])", 0, 100).rows()
    assert got[0][1] == pytest.approx(25 / 11)
    # per window of 20: [20,40) last pair (23,45)->(29,47); [40,60) (40,23)->(51,48)
    got = dict(golden_db.query(f"irate({q}[20])", 0, 100).rows())
    assert got[20] == pytest.approx(2 / 6) and got[40] == pytest.approx(25 / 11)
    # single-sample windows drop
    assert golden_db.query(f"idelta({q}[10])", 0, 100).rows() == [(20, 2.0)]


def test_deriv(golden_db):
    q = 'http_requests_total{service="web"}'
    # least-squares slope over ts [23,29,40,51] values [45,47,23,48]
    got = golden_db.query(f"deriv({q}[100])", 0, 100).rows()
    assert len(got) == 1 and got[0][0] == 0
    assert got[0][1] == pytest.approx(-0.13351498637602185)
    # single-sample windows drop (no slope from one point)
    got = golden_db.query(f"deriv({q}[10])", 0, 100).rows()
    assert [t for t, _ in got] == [20]  # only [20,30) has 2 samples
    assert got[0][1] == pytest.approx((47 - 45) / (29 - 23))
    from tachyon_spark.promql import parse
    from tachyon_spark.promql.parser import PromQLError

    with pytest.raises(PromQLError, match="range vector"):
        parse("deriv(m)")


def test_over_time_requires_range_vector(golden_db):
    from tachyon_spark.promql import parse
    from tachyon_spark.promql.parser import PromQLError

    with pytest.raises(PromQLError, match="range vector"):
        parse("avg_over_time(m)")


def test_windowed_is_per_series(golden_db):
    # multi-stream selector: each series gets its own windows (PromQL
    # semantics), so one [0,100) window yields one increase PER service.
    # Reset-aware: web 45,47,23,48 -> 2+23+25=50; cool 1,5,40,20 ->
    # 4+35+20=59; mobile 9,18,0,100 -> 9+0+100=109
    got = golden_db.query("increase(http_requests_total[100])", 0, 100).rows()
    assert sorted(got) == [(0, 50.0), (0, 59.0), (0, 109.0)]


def test_sum_by_over_windowed_rate(golden_db):
    # the canonical PromQL composition: per-series windowed increase,
    # re-aggregated by label via the broadcast catalog join
    q = golden_db.query(
        "sum by (service) (increase(http_requests_total[100]))", 0, 100
    )
    got = {r.service: r.value for r in q.df().collect()}
    assert got == {"web": 50.0, "cool": 59.0, "mobile": 109.0}


def test_counter_reset_aware_increase_and_rate(golden_db):
    # mobile: ts [23,29,40,51] values [9,18,0,100] — reset mid-window at
    # ts40. Prometheus semantics: increase = 9 + 0 + 100 = 109 (not
    # last-first = 91); rate = 109 / (51-23)
    q = 'http_requests_total{service="mobile"}'
    assert golden_db.query(f"increase({q}[100])", 0, 100).rows() == [(0, 109.0)]
    got = golden_db.query(f"rate({q}[100])", 0, 100).rows()
    assert got[0][1] == pytest.approx(109 / 28)
    # scalar whole-range form agrees
    assert golden_db.query(f"increase({q})", 0, 100).scalar() == 109.0
    assert golden_db.query(f"rate({q})", 0, 100).scalar() == pytest.approx(109 / 28)
    # irate: last pair 0 -> 100 grew, unaffected; but a reset last pair
    # uses v (cool [..., 40, 20]: last pair 40->20 resets -> 20/span)
    qc = 'http_requests_total{service="cool"}'
    got = golden_db.query(f"irate({qc}[100])", 0, 100).rows()
    assert got[0][1] == pytest.approx(20 / (67 - 30))
    # delta is a GAUGE function: stays last-first, NOT reset-corrected
    assert golden_db.query(f"delta({q}[100])", 0, 100).rows() == [(0, 91.0)]


def test_compat_rate_last_first_flag(golden_db, spark):
    # the pre-round-4 last-first behavior stays replayable for migration
    from tachyon_spark.connection import Connection

    compat = Connection(golden_db.db_dir, spark, compat_rate_last_first=True)
    q = 'http_requests_total{service="mobile"}'
    assert compat.query(f"increase({q}[100])", 0, 100).rows() == [(0, 91.0)]
    assert compat.query(f"increase({q})", 0, 100).scalar() == 91.0
    qc = 'http_requests_total{service="cool"}'
    got = compat.query(f"irate({qc}[100])", 0, 100).rows()
    assert got[0][1] == pytest.approx((20 - 40) / (67 - 30))


def test_grouped_agg_on_identityless_vector_rejected(golden_db):
    # derived vectors without series identity (interpolating join output)
    # must error cleanly rather than fail deep in the label join
    with pytest.raises(ValueError, match="label-carrying"):
        golden_db.query("sum by (t) (ia + ib)", 0, 100)


def test_matrix_selector_errors(golden_db):
    from tachyon_spark.promql.parser import PromQLError

    with pytest.raises(ValueError, match="matrix selector"):
        golden_db.query('http_requests_total{service="web"}[20]', 0, 100)
    with pytest.raises(ValueError, match="matrix selector"):
        golden_db.query('sum(http_requests_total{service="web"}[20])', 0, 100)
    for bad in ["m[", "m[]", "m[0]", "m[5q]", "m[5m"]:
        with pytest.raises(PromQLError):
            from tachyon_spark.promql import parse

            parse(bad)


def test_predict_linear(golden_db):
    q = 'http_requests_total{service="web"}'
    # whole-range window [0,100): least squares over ts [23,29,40,51],
    # v [45,47,23,48]; prediction at win_start + range + t = 0 + 100 + 10
    got = golden_db.query(f"predict_linear({q}[100], 10)", 0, 100).rows()
    assert len(got) == 1 and got[0][0] == 0
    assert got[0][1] == pytest.approx(30.836512261580367)
    # window of 20: [20,40) has (23,45),(29,47) -> exact line through both,
    # predicted at 20 + 20 + 5 = 45
    got = dict(golden_db.query(f"predict_linear({q}[20], 5)", 0, 100).rows())
    assert got[20] == pytest.approx(52.333333333333336)
    # negative horizon = interpolate before window end
    got = dict(golden_db.query(f"predict_linear({q}[20], -11)", 0, 100).rows())
    assert got[20] == pytest.approx(45 + (47 - 45) / (29 - 23) * (29 - 23))
    # single-sample windows drop (no slope)
    got = golden_db.query(f"predict_linear({q}[10], 5)", 0, 100).rows()
    assert [t for t, _ in got] == [20]
    from tachyon_spark.promql import parse
    from tachyon_spark.promql.parser import PromQLError

    for bad in ["predict_linear(m, 5)", "predict_linear(m[5])",
                "predict_linear(m[5], x)"]:
        with pytest.raises(PromQLError):
            parse(bad)


def test_stddev_stdvar_present_over_time(golden_db):
    q = 'http_requests_total{service="web"}'
    # [20,40): (45,47) pop stddev 1.0; [40,60): (23,48) pop stddev 12.5
    got = dict(golden_db.query(f"stddev_over_time({q}[20])", 0, 100).rows())
    assert got[20] == pytest.approx(1.0) and got[40] == pytest.approx(12.5)
    got = dict(golden_db.query(f"stdvar_over_time({q}[20])", 0, 100).rows())
    assert got[20] == pytest.approx(1.0) and got[40] == pytest.approx(156.25)
    assert golden_db.query(f"present_over_time({q}[20])", 0, 100).rows() == [
        (20, 1.0), (40, 1.0),
    ]
    # single-sample window: stddev_pop of one value is 0, present is 1
    got = dict(golden_db.query(f"stddev_over_time({q}[10])", 0, 100).rows())
    assert got[40] == 0.0


def test_holt_winters(golden_db):
    q = 'http_requests_total{service="web"}'
    # replay of prometheus funcHoltWinters over ts-ordered [45,47,23,48]
    def ref(vals, sf, tf):
        s1 = float(vals[0]); s0 = 0.0; b = float(vals[1] - vals[0])
        for i in range(1, len(vals)):
            bb = b if i == 1 else tf * (s1 - s0) + (1 - tf) * b
            s0, s1, b = s1, sf * vals[i] + (1 - sf) * (s1 + bb), bb
        return s1

    got = golden_db.query(f"holt_winters({q}[100], 0.3, 0.1)", 0, 100).rows()
    assert len(got) == 1 and got[0][1] == pytest.approx(ref([45, 47, 23, 48], 0.3, 0.1))
    # prometheus-3 name is an alias
    got2 = golden_db.query(
        f"double_exponential_smoothing({q}[100], 0.3, 0.1)", 0, 100
    ).rows()
    assert got2 == got
    # per-window: [20,40) folds [45,47]; single-sample windows drop
    got = dict(golden_db.query(f"holt_winters({q}[20], 0.5, 0.5)", 0, 100).rows())
    assert got[20] == pytest.approx(ref([45, 47], 0.5, 0.5))
    assert golden_db.query(f"holt_winters({q}[10], 0.5, 0.5)", 0, 100).rows() == [
        (20, pytest.approx(ref([45, 47], 0.5, 0.5)))
    ]
    # grid form
    got = golden_db.query_range(f"holt_winters({q}[60], 0.3, 0.1)", 60, 60, 10).rows()
    assert got[0][1] == pytest.approx(ref([45, 47, 23, 48], 0.3, 0.1))
    from tachyon_spark.promql import parse
    from tachyon_spark.promql.parser import PromQLError

    for bad in ["holt_winters(m[5])", "holt_winters(m[5], 0.3)",
                "holt_winters(m, 0.3, 0.1)", "holt_winters(m[5], 1.5, 0.1)",
                "holt_winters(m[5], 0.3, 0)"]:
        with pytest.raises(PromQLError):
            parse(bad)


def test_mad_over_time_and_group(golden_db):
    q = 'http_requests_total{service="web"}'
    # whole-range window: [45,47,23,48] -> median 46, |x-46| = [1,1,23,2]
    # sorted [1,1,2,23] -> interpolated median (1+2)/2 = 1.5
    got = golden_db.query(f"mad_over_time({q}[100])", 0, 100).rows()
    assert got == [(0, 1.5)]
    # per-20 windows: [45,47] -> med 46, devs [1,1] -> 1.0;
    # [23,48] -> med 35.5, devs [12.5,12.5] -> 12.5
    got = dict(golden_db.query(f"mad_over_time({q}[20])", 0, 100).rows())
    assert got[20] == 1.0 and got[40] == 12.5
    # grid form
    got = golden_db.query_range(f"mad_over_time({q}[60])", 60, 60, 10).rows()
    assert got == [(60, 1.5)]
    # group(): 1 per group / per match set
    assert golden_db.query("group(http_requests_total)", 0, 100).scalar() == 1.0
    got = golden_db.query(
        "group by (service) (http_requests_total)", 0, 100
    ).df().collect()
    assert {r.service: r.value for r in got} == {
        "web": 1.0, "cool": 1.0, "mobile": 1.0
    }


def test_ts_of_over_time_funcs(golden_db):
    # Prometheus 3.x experimental ts_of_* family: the TIMESTAMP (native
    # units, f64) of the max/min/newest sample per window.
    # web windows of 20 from 0: [20,40): (23,45),(29,47); [40,60): (40,23),(51,48)
    q = 'http_requests_total{service="web"}'
    assert golden_db.query(f"ts_of_max_over_time({q}[20])", 0, 100).rows() == [
        (20, 29.0), (40, 51.0)]
    assert golden_db.query(f"ts_of_min_over_time({q}[20])", 0, 100).rows() == [
        (20, 23.0), (40, 40.0)]
    assert golden_db.query(f"ts_of_last_over_time({q}[20])", 0, 100).rows() == [
        (20, 29.0), (40, 51.0)]
    # grid path shares the same aggregate column
    got = golden_db.query_range(f"ts_of_max_over_time({q}[30])", 60, 60, 10).rows()
    # window (30, 60]: samples at 40 (23), 51 (48) -> max 48 at ts 51
    assert got == [(60, 51.0)]
    # value ties resolve to the LATEST timestamp (Prometheus >= scan):
    # ia values [0,20,0,20] at ts [10,20,30,40] -> max 20 latest at 40
    assert golden_db.query("ts_of_max_over_time(ia[100])", 0, 100).rows() == [
        (0, 40.0)]
    assert golden_db.query("ts_of_min_over_time(ia[100])", 0, 100).rows() == [
        (0, 30.0)]


def test_ts_of_over_time_subquery(golden_db):
    # ia: ts [10,20,30,40] -> subquery grid (window-start ts): 10:0, 20:20,
    # 30:0, 40:20; ts_of_max over the grid: max 20 ties at grid ts 20/40 ->
    # LATEST (40); ts_of_min ties 0 at 10/30 -> 30
    q = golden_db.query("ts_of_max_over_time(ia[100:10])", 0, 100)
    assert q.rows() == [(0, 40.0)]
    q2 = golden_db.query("ts_of_min_over_time(ia[100:10])", 0, 100)
    assert q2.rows() == [(0, 30.0)]
