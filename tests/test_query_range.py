"""Step-aligned range evaluation (Connection.query_range; plans/range_eval).

Prometheus query_range semantics on the golden fixtures: per-step lookback
resolution with staleness, left-open sliding windows (t - R, t] for range
functions, per-instant aggregation, and the error surface for the
deliberately unsupported forms.

web stream: ts [23, 29, 40, 51], values [45, 47, 23, 48].
"""

import pytest

WEB = 'http_requests_total{service="web"}'


def test_selector_lookback_and_staleness(golden_db):
    # steps 0..100 by 10, lookback 10: a step sees the latest sample at
    # most 10 old; 70+ is stale (last sample 51)
    q = golden_db.query_range(WEB, 0, 100, 10, lookback=10)
    assert q.rows() == [(30, 47), (40, 23), (50, 23), (60, 48)]


def test_selector_wide_lookback_carries(golden_db):
    q = golden_db.query_range(WEB, 0, 100, 10, lookback=100)
    got = dict(q.rows())
    assert got[30] == 47 and got[100] == 48  # carried to the end
    assert 20 not in got  # still nothing before the first sample


def test_sample_exactly_at_step_and_boundary(golden_db):
    # lookback edge is INCLUSIVE: t - sts == lookback still resolves
    q = golden_db.query_range(WEB, 50, 50, 7, lookback=10)
    assert q.rows() == [(50, 23)]  # 50 - 40 == 10 == lookback


def test_offset_shifts_sample_clock(golden_db):
    q = golden_db.query_range(f"{WEB} offset 10", 0, 100, 10, lookback=10)
    assert q.rows() == [(40, 47), (50, 23), (60, 23), (70, 48)]


def test_sliding_rate_left_open_windows(golden_db):
    # rate(web[20]) at t covers (t-20, t]: t=30 -> {23,29}: inc 2 span 6;
    # t=40 -> {23,29,40}: 2 + reset-to-23 = 25, span 17; t=50 -> {40} and
    # t=60 -> {51} single-sample windows drop (two-point rule)
    q = golden_db.query_range(f"rate({WEB}[20])", 0, 100, 10, lookback=10)
    got = dict(q.rows())
    assert set(got) == {30, 40}
    assert got[30] == pytest.approx(2 / 6)
    assert got[40] == pytest.approx(25 / 17)


def test_sliding_increase_counter_reset(golden_db):
    q = golden_db.query_range(f"increase({WEB}[20])", 0, 100, 10, lookback=10)
    assert q.rows() == [(30, 2.0), (40, 25.0)]


def test_sliding_over_time(golden_db):
    q = golden_db.query_range(f"avg_over_time({WEB}[20])", 0, 100, 20, lookback=10)
    assert q.rows() == [(40, pytest.approx(115 / 3)), (60, 48.0)]
    # count has no two-point rule: single-sample windows report
    q = golden_db.query_range(f"count_over_time({WEB}[20])", 0, 100, 20)
    assert q.rows() == [(40, 3), (60, 1)]


def test_sliding_resets_irate(golden_db):
    # windows: t=30 -> (0,30] = {23,29}: 0 resets; t=60 -> (30,60] =
    # {40,51} (23 -> 48 grows): 0; t=90 -> (60,90] empty: dropped
    q = golden_db.query_range(f"resets({WEB}[30])", 0, 100, 30)
    got = dict(q.rows())
    assert got[30] == 0 and got[60] == 0 and set(got) == {30, 60}
    # full-width: t=60, R=60 -> (0,60] = all 4 samples, one reset (47->23)
    q = golden_db.query_range(f"resets({WEB}[60])", 60, 60, 10)
    assert q.rows() == [(60, 1)]
    q = golden_db.query_range(f"irate({WEB}[60])", 60, 60, 10)
    assert q.rows()[0][1] == pytest.approx(25 / 11)


def test_per_step_aggregate_sum_count(golden_db):
    # sum(http_requests_total) per step over the 3 services; staleness
    # drops series independently (count shrinks as streams go stale)
    q = golden_db.query_range("sum(http_requests_total)", 0, 100, 10, lookback=10)
    got = dict(q.rows())
    # t=30: web 47 (29), cool 40 (30), mobile 18 (29) = 105
    assert got[30] == 105
    # t=70: all stale except cool (67: 20) -> 20
    assert got[70] == 20
    q = golden_db.query_range("count(http_requests_total)", 0, 100, 10, lookback=10)
    got = dict(q.rows())
    assert got[30] == 3 and got[70] == 1


def test_aggregate_by_label_per_step(golden_db):
    q = golden_db.query_range(
        "sum by (service) (http_requests_total)", 0, 60, 30, lookback=10
    )
    rows = {(r.service, r.ts): r.value for r in q.df().collect()}
    assert rows[("web", 30)] == 47 and rows[("web", 60)] == 48
    assert rows[("cool", 30)] == 40
    assert ("cool", 60) not in rows  # last cool sample 67; at 60 last is 30, stale


def test_vector_scalar_and_math(golden_db):
    q = golden_db.query_range(f"{WEB} * 2 + 1", 0, 60, 30, lookback=10)
    assert q.rows() == [(30, 95.0), (60, 97.0)]
    q = golden_db.query_range(f"abs({WEB} - 40)", 0, 60, 30, lookback=10)
    assert q.rows() == [(30, 7.0), (60, 8.0)]
    q = golden_db.query_range(f"{WEB} > bool 40", 0, 60, 30, lookback=10)
    assert q.rows() == [(30, 1.0), (60, 1.0)]


def test_topk_per_instant(golden_db):
    q = golden_db.query_range("topk(1, http_requests_total)", 0, 30, 30, lookback=10)
    rows = [tuple(r) for r in q.df().collect()]
    # t=30: web 47, cool 40, mobile 18 -> top1 = 47
    assert (30, 47) in rows and len([r for r in rows if r[0] == 30]) == 1


def test_topk_grouped_per_instant(golden_db):
    """topk by/without on the grid (round 9): per-(group, step) ranking.
    vm_multi: {service=web,host=a} samples 1.0@10, 2.0@20;
    {service=web,host=b} 3.0@10 — top-1 by (service) per step."""
    q = golden_db.query_range(
        "topk by (service) (1, vm_multi)", 10, 20, 10, lookback=10
    )
    rows = sorted(tuple(r) for r in q.df().collect())
    # step 10: max(1.0, 3.0) = 3.0; step 20: host b carries 3.0 via
    # lookback, host a has 2.0 -> 3.0 again
    assert rows == [("web", 10, 3.0), ("web", 20, 3.0)]
    # without(host) groups on the remaining-label series key
    q2 = golden_db.query_range(
        "topk without (host) (1, vm_multi)", 10, 20, 10, lookback=10
    )
    rows2 = sorted(tuple(r) for r in q2.df().collect())
    assert rows2 == [("service=web", 10, 3.0), ("service=web", 20, 3.0)]


def test_windowed_at_pinned_range(golden_db):
    """`rate(m[R] @ T)` on the grid (round 9): the range window pins at
    (T - R, T] and every step reports that one value (Prometheus @
    semantics — the grid only sets output timestamps)."""
    pinned = golden_db.query_range("increase(ints[30] @ 40)", 0, 20, 10)
    ref = golden_db.query_range("increase(ints[30])", 40, 40, 10)
    [(t_ref, v_ref)] = ref.rows()
    assert t_ref == 40
    assert sorted(pinned.rows()) == [(0, v_ref), (10, v_ref), (20, v_ref)]
    # @ end() anchors at the query's end
    anchored = golden_db.query_range("increase(ints[30] @ end())", 20, 40, 10)
    assert sorted(anchored.rows()) == [(20, v_ref), (30, v_ref), (40, v_ref)]
    # *_over_time with a pinned window: max_over_time(ints[30] @ 40) over
    # (10, 40] = max(4, 6, 8) = 8 at every step
    m = golden_db.query_range("max_over_time(ints[30] @ 40)", 0, 10, 10)
    assert sorted(m.rows()) == [(0, 8), (10, 8)]


def test_default_vector_matching_on_grid(golden_db):
    """`a / b` with NO modifier (round 9): Prometheus's default one-to-one
    matching on the full label sets — identical to `ignoring()` with no
    labels, and (here, where service is the only label) to on(service)."""
    dflt = golden_db.query_range("vm_req / vm_lim", 0, 30, 10, lookback=10)
    expl = golden_db.query_range(
        "vm_req / on(service) vm_lim", 0, 30, 10, lookback=10
    )
    # ignoring() renders the canonical "k=v" series key where on(service)
    # renders the bare label value — values and alignment must agree
    d = sorted(
        (r[0].removeprefix("service="), *r[1:]) for r in dflt.df().collect()
    )
    e = sorted(tuple(r) for r in expl.df().collect())
    assert d == e and len(d) > 0


def test_vector_comparison_on_grid(golden_db):
    """Vector-to-vector comparisons on the grid (round 9 extension; raw
    mode keeps the reference's panic): filter keeps the LHS sample where
    the predicate holds; `bool` yields 1/0 per matched (key, step)."""
    # vm_req vs vm_lim on(service): req < lim everywhere except nowhere —
    # web 10/100, 20/100, 30/200; mobile 8/40 (step 20) -> all true
    q = golden_db.query_range(
        "vm_req < on(service) vm_lim", 0, 30, 10, lookback=10
    )
    rows = {(r.service, r.ts): r.value for r in q.df().collect()}
    assert rows[("web", 10)] == 10.0  # LHS value kept
    assert rows[("mobile", 20)] == 8.0
    # bool mode: 1/0 for every matched pair
    qb = golden_db.query_range(
        "vm_req > bool on(service) vm_lim", 0, 30, 10, lookback=10
    )
    vals = {v for _, v in ((r.ts, r.value) for r in qb.df().collect())}
    assert vals == {0.0}  # req never exceeds lim in this fixture
    # default matching composes with comparisons too (same label sets)
    qd = golden_db.query_range("vm_req < vm_lim", 0, 30, 10, lookback=10)
    assert qd.df().count() == q.df().count()


def test_vector_matching_exact_step_join(golden_db):
    # vm_req / on(service) vm_lim at steps; both sides resolve per step
    # with lookback, join is exact per (service, step) — no interpolation
    q = golden_db.query_range(
        "vm_req / on(service) vm_lim", 0, 30, 10, lookback=10
    )
    rows = {(r.service, r.ts): r.value for r in q.df().collect()}
    assert rows[("web", 10)] == pytest.approx(10 / 100)
    assert rows[("web", 20)] == pytest.approx(20 / 100)  # lim carried from 10
    assert rows[("web", 30)] == pytest.approx(30 / 200)
    assert rows[("mobile", 20)] == pytest.approx(8 / 40)
    assert ("mobile", 10) not in rows  # mobile lim first sample at 20


def test_literal_grid(golden_db):
    q = golden_db.query_range("42", 0, 20, 10)
    assert q.rows() == [(0, 42.0), (10, 42.0), (20, 42.0)]


def test_errors(golden_db):
    with pytest.raises(ValueError, match="step must be positive"):
        golden_db.query_range(WEB, 0, 100, 0)
    with pytest.raises(ValueError, match="steps"):
        golden_db.query_range(WEB, 0, 10**9, 1)
    # round 9: formerly errors, now features — @ on range selectors pins
    # the window; modifier-less vector ops use Prometheus default matching
    # (ia and ib carry no labels, so their empty keys align)
    pinned = golden_db.query_range("rate(ints[30] @ 40)", 0, 20, 10)
    assert len({v for _, v in pinned.rows()}) == 1  # same value every step
    assert golden_db.query_range("ia + ib", 0, 100, 10).df().count() > 0
    # Prometheus IGNORES sort in range queries (presentation-only)
    assert golden_db.query_range(f"sort({WEB})", 0, 100, 10, lookback=10).rows() == \
        golden_db.query_range(WEB, 0, 100, 10, lookback=10).rows()
    with pytest.raises(ValueError, match="range vector"):
        golden_db.query_range(f"rate({WEB})", 0, 100, 10)


def test_plan_has_no_per_step_loop(golden_db):
    # the grid is data: one job regardless of step count; spot-check the
    # plan contains a single exchange for the selector path (stream_id)
    q = golden_db.query_range(WEB, 0, 100, 1, lookback=10)
    plan = q.df()._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1


def test_histogram_quantile_selector_grid(golden_db):
    # hq buckets: ts10 counts [1,2,4] les [.5,1,+Inf]; ts20 [2,5,5].
    # step 30 still sees the ts-20 instants (lookback 10, inclusive edge)
    q = golden_db.query_range("histogram_quantile(0.5, hq)", 0, 30, 10, lookback=10)
    got = dict(q.rows())
    assert set(got) == {10, 20, 30}
    assert got[10] == 1.0  # rank 2 hits bucket le=1 exactly
    assert abs(got[20] - (0.5 + 0.5 * 0.5 / 3)) < 1e-9
    assert got[30] == got[20]


def test_histogram_quantile_grouped_grid(golden_db):
    # the canonical dashboard shape: aggregate by (le), then interpolate
    # per step (one series per le here, so values match the selector form)
    q = golden_db.query_range(
        "histogram_quantile(0.5, sum by (le) (hq))", 0, 30, 10, lookback=10
    )
    got = dict(q.rows())
    assert set(got) == {10, 20, 30}
    assert got[10] == 1.0
    assert abs(got[20] - (0.5 + 0.5 * 0.5 / 3)) < 1e-9


def test_histogram_quantile_windowed_child_grid(golden_db):
    # increase(hq[20]) at step 20 covers (0, 20]: per-bucket increases
    # [1, 3, 1]; steps 10/30/40 have single-sample windows (dropped).
    # bucket interpolation over the increase counts: total 1, rank 0.5
    # lands in the first bucket -> 0.5 * 0.5 / 1
    q = golden_db.query_range(
        "histogram_quantile(0.5, increase(hq[20]))", 0, 40, 10, lookback=10
    )
    got = dict(q.rows())
    assert set(got) == {20}
    assert abs(got[20] - 0.25) < 1e-9


def test_group_left_on_grid(golden_db):
    # many side vm_multi (hosts a, b; both service=web) x one side vm_lim;
    # instants resolve per step with lookback 10 before joining
    q = golden_db.query_range(
        "vm_multi * on(service) group_left vm_lim", 0, 30, 10, lookback=10
    )
    df = q.df()
    assert "stream_id" in df.columns  # many side keeps series identity
    by_ts = {}
    for r in df.collect():
        by_ts.setdefault(r["ts"], []).append(r["value"])
    # ts10: a=1*100, b=3*100; ts20: a=2*100, b=3*100; ts30: a=2*200 (vm_lim
    # carried to 20, b stale at 30)
    assert sorted(by_ts[10]) == [100.0, 300.0]
    assert sorted(by_ts[20]) == [200.0, 300.0]
    assert by_ts[30] == [400.0]


def test_group_left_include_labels_grid(golden_db):
    q = golden_db.query_range(
        "vm_multi * on(service) group_left(tier) vm_lim2", 0, 20, 10, lookback=10
    )
    rows = q.df().collect()
    assert rows and all(r["tier"] == "gold" for r in rows)


def test_many_to_one_requires_group_modifier_grid(golden_db):
    with pytest.raises(ValueError, match="group_left/group_right"):
        golden_db.query_range("vm_multi * on(service) vm_lim", 0, 20, 10)


def test_set_op_and_on_grid(golden_db):
    # vm_req and on(service) vm_lim per (service, step): web limits exist
    # at steps 10-30; mobile limit (sample at 20) exists at steps 20, 30
    q = golden_db.query_range(
        "vm_req and on(service) vm_lim", 0, 30, 10, lookback=10
    )
    got = sorted((r["service"], r["ts"], r["value"]) for r in q.df().collect())
    assert got == [
        ("mobile", 20, 8.0), ("mobile", 30, 12.0),
        ("web", 10, 10.0), ("web", 20, 20.0), ("web", 30, 30.0),
    ]


def test_absent_on_grid(golden_db):
    q = golden_db.query_range(f"absent({WEB})", 0, 100, 10, lookback=10)
    assert sorted(t for t, _ in q.rows()) == [0, 10, 20, 70, 80, 90, 100]
    assert all(v == 1.0 for _, v in q.rows())
    # unknown metric: absent across the whole grid
    q = golden_db.query_range('absent(nope{service="x"})', 0, 30, 10)
    assert sorted(t for t, _ in q.rows()) == [0, 10, 20, 30]


def test_absent_over_time_on_grid(golden_db):
    # web samples at 23,29,40,51; 20-wide left-open windows (t-20, t] on
    # the 0..100/10 grid -> populated steps {30,40,50,60,70}
    q = golden_db.query_range(f"absent_over_time({WEB}[20])", 0, 100, 10)
    assert sorted(t for t, _ in q.rows()) == [0, 10, 20, 80, 90, 100]
    assert all(v == 1.0 for _, v in q.rows())
    # unknown metric: 1 across the whole grid
    q = golden_db.query_range("absent_over_time(nope_metric[20])", 0, 30, 10)
    assert sorted(t for t, _ in q.rows()) == [0, 10, 20, 30]


def test_absent_over_time_at_pinned_range(golden_db):
    """`absent_over_time(m[R] @ T)` — @ on a range selector under absent
    was the last unsupported modifier position in query_range (round 11,
    VERDICT r10 item 6). The window pins at (T-R, T]: one presence fact
    fans across the grid."""
    # (20, 40] holds web samples at 23,29,40 -> present -> empty result
    q = golden_db.query_range(f"absent_over_time({WEB}[20] @ 40)", 0, 30, 10)
    assert q.rows() == []
    # (80, 100] holds nothing -> 1 on every step
    q = golden_db.query_range(f"absent_over_time({WEB}[20] @ 100)", 0, 30, 10)
    assert q.rows() == [(0, 1.0), (10, 1.0), (20, 1.0), (30, 1.0)]
    # @ end() anchors at the grid end; (10, 30] has samples 23,29
    q = golden_db.query_range(
        f"absent_over_time({WEB}[20] @ end())", 0, 30, 10
    )
    assert q.rows() == []
    # @ start() anchors at the grid start; (-20, 0] is empty
    q = golden_db.query_range(
        f"absent_over_time({WEB}[20] @ start())", 0, 30, 10
    )
    assert q.rows() == [(0, 1.0), (10, 1.0), (20, 1.0), (30, 1.0)]
    # offset composes inside the pinned window: (0, 20] via @40 offset 20
    # holds nothing (first web sample is 23)
    q = golden_db.query_range(
        f"absent_over_time({WEB}[20] @ 40 offset 20)", 0, 30, 10
    )
    assert q.rows() == [(0, 1.0), (10, 1.0), (20, 1.0), (30, 1.0)]
    # unknown metric under @: still 1 across the whole grid
    q = golden_db.query_range(
        "absent_over_time(nope_metric[20] @ 40)", 0, 30, 10
    )
    assert sorted(t for t, _ in q.rows()) == [0, 10, 20, 30]


def test_at_modifier_pins_instant_on_grid(golden_db):
    # @29 pins evaluation at ts 29 (value 47): every step reports it
    q = golden_db.query_range(f"{WEB} @ 29", 0, 30, 10, lookback=10)
    assert q.rows() == [(0, 47), (10, 47), (20, 47), (30, 47)]
    # @ end() anchors at the grid end (60: last sample 51 -> 48)
    q = golden_db.query_range(f"{WEB} @ end()", 40, 60, 10, lookback=10)
    assert q.rows() == [(40, 48), (50, 48), (60, 48)]
    # pinned instant outside the lookback: empty everywhere
    q = golden_db.query_range(f"{WEB} @ 100", 0, 20, 10, lookback=10)
    assert q.rows() == []
    # arithmetic composes over the pinned vector
    q = golden_db.query_range(f"{WEB} @ 29 * 2", 0, 10, 10, lookback=10)
    assert q.rows() == [(0, 94.0), (10, 94.0)]


def test_label_replace_on_grid(golden_db):
    # rewrite service -> svc copy, then group by the new label per step
    q = golden_db.query_range(
        'sum by (svc) (label_replace(http_requests_total, "svc", "$1", '
        '"service", "(w.*)"))',
        30, 30, 30, lookback=10,
    )
    rows = {(r.svc, r.ts): r.value for r in q.df().collect()}
    # only web matches (w.*): svc="web" gets web's 47; cool/mobile keep
    # svc absent -> null group carries their sum
    assert rows[("web", 30)] == 47.0


def test_count_values_on_grid(golden_db):
    # ints values at instants: step 40 sees ts-40 samples; ints=8 u64=4...
    q = golden_db.query_range('count_values("v", ints)', 40, 40, 10, lookback=10)
    rows = {(r.v, r.ts): r.value for r in q.df().collect()}
    assert rows[("8", 40)] == 1


def test_subquery_on_grid(golden_db):
    # max_over_time(web[30:10]): inner instants on the 10-grid (lookback
    # applies to them), outer max over (t-30, t]
    q = golden_db.query_range(f"max_over_time({WEB}[30:10])", 30, 60, 30, lookback=10)
    assert q.rows() == [(30, 47), (60, 48)]
    # count_over_time counts inner INSTANTS (not raw samples): (30,60]
    # holds grid instants 40, 50, 60
    q = golden_db.query_range(f"count_over_time({WEB}[30:10])", 60, 60, 30, lookback=10)
    assert q.rows() == [(60, 3)]


def test_subquery_nested_rate_on_grid(golden_db):
    # inner rate(web[10]) on the 10-grid has one defined instant (t=30:
    # two samples in (20, 30], increase 2 over span 6); outer avg sees it
    q = golden_db.query_range(
        f"avg_over_time(rate({WEB}[10])[40:10])", 40, 40, 10, lookback=10
    )
    rows = q.rows()
    assert len(rows) == 1 and rows[0][0] == 40
    assert rows[0][1] == pytest.approx(2 / 6)


def test_sliding_stddev_present_over_time(golden_db):
    # sliding windows (t-20, t]: t=40 -> {23,29,40} = {45,47,23};
    # t=60 -> {51} = {48}
    q = golden_db.query_range(f"stddev_over_time({WEB}[20])", 0, 100, 20)
    got = dict(q.rows())
    import statistics

    assert got[40] == pytest.approx(statistics.pstdev([45, 47, 23]))
    assert got[60] == 0.0
    q = golden_db.query_range(f"stdvar_over_time({WEB}[20])", 0, 100, 20)
    assert dict(q.rows())[40] == pytest.approx(
        statistics.pvariance([45, 47, 23])
    )
    q = golden_db.query_range(f"present_over_time({WEB}[20])", 0, 100, 20)
    assert q.rows() == [(40, 1.0), (60, 1.0)]


def test_query_range_limitk_and_sort_passthrough(golden_db):
    # limitk in a range query keeps the SAME series as the raw path would;
    # sort_by_label is presentation-only and Prometheus ignores it here
    base = golden_db.query_range("http_requests_total", 0, 100, 10, lookback=100)
    n_base = len(base.rows())
    all3 = golden_db.query_range("limitk(3, http_requests_total)", 0, 100, 10, lookback=100)
    assert len(all3.rows()) == n_base
    two = golden_db.query_range("limitk(2, http_requests_total)", 0, 100, 10, lookback=100)
    assert 0 < len(two.rows()) < n_base
    ignored = golden_db.query_range(
        'sort_by_label(http_requests_total, "service")', 0, 100, 10, lookback=100
    )
    assert sorted(ignored.rows()) == sorted(base.rows())
    # ratio partition contract holds on the grid too
    keep = golden_db.query_range("limit_ratio(0.4, http_requests_total)", 0, 100, 10, lookback=100)
    comp = golden_db.query_range("limit_ratio(-0.6, http_requests_total)", 0, 100, 10, lookback=100)
    assert sorted(keep.rows() + comp.rows()) == sorted(base.rows())


def test_bare_vector_binary_on_grid(golden_db):
    """`sum(a) / sum(b)` on the grid (round 9): ungrouped per-step
    aggregates carry the EMPTY label set, so Prometheus's default match is
    one-to-one on the empty key — a pure per-step join. The dashboard
    ratio-of-sums shape."""
    q = golden_db.query_range(
        "sum(vm_req) / sum(vm_lim)", 0, 30, 10, lookback=10
    )
    got = dict(q.rows())
    # t=10: req web 10 + mobile 4, lim web 100 (mobile lim absent) -> 0.14
    assert got[10] == pytest.approx(14 / 100)
    # t=20: req 20+8=28, lim 100+40=140 -> 0.2
    assert got[20] == pytest.approx(28 / 140)
    # t=30: req 30+12=42, lim 200+40=240
    assert got[30] == pytest.approx(42 / 240)
    # comparisons too: filter keeps the LHS per-step sum where true
    qc = golden_db.query_range(
        "sum(vm_req) < sum(vm_lim)", 0, 30, 10, lookback=10
    )
    assert dict(qc.rows())[20] == pytest.approx(28.0)
    qb = golden_db.query_range(
        "sum(vm_req) >= bool sum(vm_lim)", 0, 30, 10, lookback=10
    )
    assert set(v for _, v in qb.rows()) == {0.0}


def test_sliding_predict_linear(golden_db):
    """predict_linear(m[20], 10) on the grid (round 9): per sliding
    left-open window (t-20, t], least-squares fit evaluated at
    t + horizon. Windows with < 2 distinct ts drop (no slope)."""
    q = golden_db.query_range(f"predict_linear({WEB}[20], 10)", 0, 100, 10)
    got = dict(q.rows())
    # t=30: (10,30] holds (23,45),(29,47): exact line, value at 40 =
    # 45 + (40-23) * (2/6)
    assert got[30] == pytest.approx(45 + (40 - 23) * (2 / 6))
    # t=40: (20,40] holds x=[23,29,40], y=[45,47,23]; fit evaluated at 50
    xs, ys = [23.0, 29.0, 40.0], [45.0, 47.0, 23.0]
    mx, my = sum(xs) / 3, sum(ys) / 3
    m = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    assert got[40] == pytest.approx((my - m * mx) + m * 50)
    # single-sample windows dropped
    assert set(got) == {30, 40}
    # horizon 0 = the fitted value AT the step: consistent with deriv
    q0 = golden_db.query_range(f"predict_linear({WEB}[20], 0)", 40, 40, 10)
    assert dict(q0.rows())[40] == pytest.approx((my - m * mx) + m * 40)


def test_prometheus_extrapolated_rate(spark, tmp_path):
    """Connection(prometheus_extrapolation=True): rate/increase/delta on
    the grid use Prometheus's extrapolatedRate (promql/functions.go) —
    scale to the window edges, 1.1x-average-spacing threshold, counter
    zero-crossing clamp, rate over the FULL window."""
    import tachyon_spark as ty

    conn = ty.Connection(
        str(tmp_path / "xdb"), spark, prometheus_extrapolation=True
    )
    conn.create_stream("m", "f64")
    ins = conn.prepare_insert("m")
    for t, v in [(23, 45.0), (29, 47.0), (40, 23.0)]:
        ins.insert(t, v)
    ins.flush()
    # window (20, 40]: t0=23 t1=40 n=3 first=45, reset-adjusted inc=25;
    # ds=3 de=0 si=17 avg=8.5 thr=9.35 -> no caps, no zero clamp
    # increase = 25 * (17+3+0)/17; rate divides by the FULL window (20)
    q = conn.query_range("increase(m[20])", 40, 40, 10, lookback=10)
    assert q.rows()[0][1] == pytest.approx(25 * 20 / 17)
    q = conn.query_range("rate(m[20])", 40, 40, 10, lookback=10)
    assert q.rows()[0][1] == pytest.approx(25 * 20 / 17 / 20)

    # zero-crossing clamp: counter starts near 0 -> the start-side
    # extrapolation stops at the zero crossing, so increase = inc + first
    conn.create_stream("z", "f64")
    ins = conn.prepare_insert("z")
    for t, v in [(21, 0.5), (30, 10.0), (40, 20.0)]:
        ins.insert(t, v)
    ins.flush()
    q = conn.query_range("increase(z[20])", 40, 40, 10, lookback=10)
    assert q.rows()[0][1] == pytest.approx(20.0)

    # edge gap beyond the 1.1x threshold counts as half a spacing:
    # samples at 39, 40 in window (20, 40]: ds=19 >> thr -> avg/2 = 0.5
    conn.create_stream("g", "f64")
    ins = conn.prepare_insert("g")
    for t, v in [(39, 5.0), (40, 7.0)]:
        ins.insert(t, v)
    ins.flush()
    q = conn.query_range("delta(g[20])", 40, 40, 10, lookback=10)
    # delta (gauge): 2 * (1 + 0.5 + 0)/1 = 3 (no zero clamp)
    assert q.rows()[0][1] == pytest.approx(3.0)

    # default connection keeps the native semantics
    base = ty.Connection(str(tmp_path / "bdb"), spark)
    base.create_stream("m", "f64")
    ins = base.prepare_insert("m")
    for t, v in [(23, 45.0), (29, 47.0), (40, 23.0)]:
        ins.insert(t, v)
    ins.flush()
    q = base.query_range("increase(m[20])", 40, 40, 10, lookback=10)
    assert q.rows()[0][1] == pytest.approx(25.0)


def test_topk_over_derived_vector_on_grid(golden_db):
    """topk over a default-matched binop (`topk(1, a + ignoring(t) b)`):
    PromQL's topk ranks any instant vector, so grouped derived results
    qualify — per-step rank, series key kept."""
    q = golden_db.query_range(
        "topk(1, ints + ignoring(t) uints)", 20, 40, 10, lookback=10
    )
    rows = {r.ts: r.value for r in q.df().collect()}
    assert rows == {20: 6.0, 30: 9.0, 40: 12.0}
    cols = q.df().columns
    assert "ts" in cols and "value" in cols and len(cols) >= 3  # key kept
    # k <= 0 -> empty, like the selector form
    assert golden_db.query_range(
        "topk(0, ints + ignoring(t) uints)", 20, 40, 10, lookback=10
    ).df().count() == 0


def test_aggregate_over_grouped_children_grid(golden_db):
    """Round 10: aggregations compose over ALREADY-GROUPED instant
    vectors (range_eval._aggregate_grouped) — set-op results, grouped
    binops, nested aggregates."""
    # sum by over an on()-matched set op: vm_req unless on(service)
    # vm_lim drops (service, step) pairs where a limit instant exists
    q = golden_db.query_range(
        "sum by (service) (vm_req unless on(service) vm_lim)",
        0, 30, 10, lookback=10,
    )
    got = sorted((r["service"], r["ts"], r["value"]) for r in q.df().collect())
    # web limits cover steps 10-30; mobile limit (sample at 20) covers
    # steps 20, 30 -> survivors: mobile@10
    assert got == [("mobile", 10, 4.0)]
    # nested aggregate: max over the per-service sums
    q = golden_db.query_range(
        "max(sum by (service) (vm_req))", 0, 30, 10, lookback=10
    )
    assert dict(q.rows()) == {10: 10.0, 20: 20.0, 30: 30.0}
    # without-grouping over a grouped child drops the listed label
    q = golden_db.query_range(
        "sum without (service) (sum by (service) (vm_req))",
        0, 30, 10, lookback=10,
    )
    assert dict(q.rows()) == {10: 14.0, 20: 28.0, 30: 42.0}
    # default-matched set ops key on FULL label sets: clear error steers
    # to on() matching
    with pytest.raises(ValueError, match="use\\s+on"):
        golden_db.query_range(
            "sum by (service) (vm_req unless vm_lim)", 0, 30, 10,
            lookback=10,
        ).rows()


def test_param_aggregates_over_grouped_children_grid(golden_db):
    """Parameterized/statistical aggregations compose over grouped
    children too (same _aggregate_grouped path): quantile and stddev of
    the per-service sums per step."""
    q = golden_db.query_range(
        "quantile(0.5, sum by (service) (vm_req))", 0, 30, 10, lookback=10
    )
    # per step the only series-sums are web/mobile: median = midpoint
    assert dict(q.rows()) == {10: 7.0, 20: 14.0, 30: 21.0}
    q = golden_db.query_range(
        "stddev(sum by (service) (vm_req))", 0, 30, 10, lookback=10
    )
    # population stddev of {web, mobile} per step = |web-mobile|/2
    assert dict(q.rows()) == {10: 3.0, 20: 6.0, 30: 9.0}
