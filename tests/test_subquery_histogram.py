"""Subqueries expr[RANGE:STEP] and histogram_quantile (VERDICT r2 items
4-5; both rejected/absent in the reference — subqueries at
query/planner.rs:125-133, function calls at planner.rs:218-222)."""

import pytest

from tachyon_spark.promql import ast, parse


# ---------------------------------------------------------------- parsing
def test_parse_selector_subquery():
    e = parse("m[30:10]")
    assert isinstance(e, ast.Subquery)
    assert isinstance(e.child, ast.VectorSelector)
    assert (e.range_, e.step) == (30, 10)


def test_parse_function_subquery_with_units():
    e = parse("max_over_time(rate(m[5m])[30m:5m])")
    assert isinstance(e, ast.OverTimeFunc) and e.func == "max_over_time"
    sub = e.child
    assert isinstance(sub, ast.Subquery)
    assert isinstance(sub.child, ast.RangeFunc) and sub.child.func == "rate"
    m = 60 * 1_000_000_000
    assert (sub.range_, sub.step) == (30 * m, 5 * m)


def test_parse_histogram_quantile():
    e = parse("histogram_quantile(0.9, hq)")
    assert isinstance(e, ast.HistogramQuantile)
    assert e.phi == 0.9 and e.child.name == "hq"


def test_bare_subquery_rejected_outside_over_time(golden_db):
    with pytest.raises(ValueError, match="over_time"):
        golden_db.query("ints[20:10]", 0, 40)


def test_subquery_step_must_match_inner_window(golden_db):
    with pytest.raises(ValueError, match="step"):
        golden_db.query("max_over_time(rate(ints[10])[40:20])", 0, 40)


# -------------------------------------------------------------- semantics
def test_selector_subquery_last_per_step_then_outer_max(golden_db):
    # ints: ts [10,20,30,40] values [2,4,6,8]; step grid 10 keeps each
    # sample; outer 20-windows: [0,20)->2, [20,40)->max(4,6), [40,..)->8
    q = golden_db.query("max_over_time(ints[20:10])", 0, 40)
    assert q.rows() == [(0, 2), (20, 6), (40, 8)]


def test_selector_subquery_sum(golden_db):
    q = golden_db.query("sum_over_time(ints[20:10])", 0, 40)
    assert q.rows() == [(0, 2), (20, 10), (40, 8)]


def test_function_subquery_rate_then_max(golden_db):
    # rate(ints[20]) on the 20-grid: only window 20 has 2 samples ->
    # (6-4)/10 = 0.2; outer 40-window max -> one row at 0
    q = golden_db.query("max_over_time(rate(ints[20])[40:20])", 0, 40)
    assert q.rows() == [(0, 0.2)]


def test_histogram_quantile_golden(golden_db):
    # hq buckets: ts10 counts [1,2,4] les [.5,1,+Inf]; ts20 [2,5,5]
    q = golden_db.query("histogram_quantile(0.5, hq)", 0, 100)
    rows = q.rows()
    assert rows[0] == (10, 1.0)  # rank 2 hits bucket le=1 exactly
    assert rows[1][0] == 20 and abs(rows[1][1] - (0.5 + 0.5 * 0.5 / 3)) < 1e-9


def test_histogram_quantile_inf_bucket_returns_highest_finite(golden_db):
    q = golden_db.query("histogram_quantile(0.9, hq)", 0, 100)
    rows = q.rows()
    # ts10: rank 3.6 lands in +Inf bucket -> highest finite le (1.0)
    assert rows[0] == (10, 1.0)
    assert rows[1][0] == 20 and abs(rows[1][1] - (0.5 + 0.5 * 2.5 / 3)) < 1e-9


def test_histogram_quantile_requires_le(golden_db):
    with pytest.raises(ValueError, match="le"):
        golden_db.query("histogram_quantile(0.5, ints)", 0, 100)


def test_histogram_quantile_only_inf_bucket_yields_no_rows(db):
    # a histogram whose ONLY bucket is +Inf has no finite bound; Prometheus
    # returns NaN — we drop the row (null filtered) instead of clamping
    from tests.conftest import make_stream

    make_stream(db, 'hinf{le="+Inf"}', "u64", [(10, 4), (20, 7)])
    q = db.query("histogram_quantile(0.9, hinf)", 0, 100)
    assert q.rows() == []


def test_histogram_quantile_windowed_child_raw(golden_db):
    # raw mode now accepts any streams-carrying vector child:
    # max_over_time(hq[100]) collapses each bucket series to its window max
    # (counts [2, 5, 5] at window ts 0), then the same bucket interpolation
    q = golden_db.query("histogram_quantile(0.9, max_over_time(hq[100]))", 0, 100)
    rows = q.rows()
    assert len(rows) == 1
    assert rows[0][0] == 0
    # rank 4.5 in counts [2,5,5]: le=1 bucket, 0.5 + 0.5*(4.5-2)/(5-2)
    assert abs(rows[0][1] - (0.5 + 0.5 * 2.5 / 3)) < 1e-9


def test_histogram_quantile_aggregate_child_raw_rejected(golden_db):
    with pytest.raises(ValueError, match="query_range"):
        golden_db.query("histogram_quantile(0.5, sum by (le) (hq))", 0, 100)


# --- Prometheus 3.x classic-histogram helpers (VERDICT r6 item 6) ---------
# hq buckets: ts10 cumulative [1, 2, 4] for les [0.5, 1, +Inf];
#             ts20 cumulative [2, 5, 5]


def test_histogram_count_golden(golden_db):
    q = golden_db.query("histogram_count(hq)", 0, 100)
    assert q.rows() == [(10, 4.0), (20, 5.0)]


def test_histogram_sum_golden(golden_db):
    # midpoint estimate: per-bucket n * mid; +Inf bucket represented by
    # the highest finite le (same clamp as histogram_quantile)
    # ts10: n=[1,1,2], mids=[0.25, 0.75, 1.0] -> 3.0
    # ts20: n=[2,3,0] -> 0.5 + 2.25 = 2.75
    q = golden_db.query("histogram_sum(hq)", 0, 100)
    assert q.rows() == [(10, 3.0), (20, 2.75)]


def test_histogram_avg_golden(golden_db):
    q = golden_db.query("histogram_avg(hq)", 0, 100)
    assert q.rows() == [(10, 0.75), (20, 0.55)]


def test_histogram_fraction_bucket_boundaries_exact(golden_db):
    # bounds on bucket boundaries need no interpolation
    q = golden_db.query("histogram_fraction(0.5, 1, hq)", 0, 100)
    assert q.rows() == [(10, 0.25), (20, 0.6)]


def test_histogram_fraction_interpolates(golden_db):
    # ts10: C(0.75)=1.5, C(0.25)=0.5 -> 0.25; ts20: C(0.75)=3.5, C(0.25)=1
    q = golden_db.query("histogram_fraction(0.25, 0.75, hq)", 0, 100)
    rows = q.rows()
    assert rows[0][0] == 10 and abs(rows[0][1] - 0.25) < 1e-9
    assert rows[1][0] == 20 and abs(rows[1][1] - 0.5) < 1e-9


def test_histogram_helpers_require_le(golden_db):
    with pytest.raises(ValueError, match="no 'le' label"):
        golden_db.query("histogram_sum(ints)", 0, 100)
    with pytest.raises(ValueError, match="no 'le' label"):
        golden_db.query("histogram_fraction(0, 1, ints)", 0, 100)


def test_histogram_fraction_bounds_order_rejected():
    from tachyon_spark.promql.parser import PromQLError, parse

    with pytest.raises(PromQLError, match="lo <= hi"):
        parse("histogram_fraction(2, 1, hq)")


def test_histogram_helpers_only_inf_bucket(db):
    # count is exact even with only +Inf (it IS the total); sum/avg have
    # no finite representative -> rows drop (null filtered)
    from tests.conftest import make_stream

    make_stream(db, 'hinf2{le="+Inf"}', "u64", [(10, 4), (20, 7)])
    assert db.query("histogram_count(hinf2)", 0, 100).rows() == [
        (10, 4.0), (20, 7.0)
    ]
    assert db.query("histogram_sum(hinf2)", 0, 100).rows() == []
    assert db.query("histogram_avg(hinf2)", 0, 100).rows() == []


def test_histogram_fraction_negative_lower_bound_clamped(golden_db):
    """Bounds clamp into the bucket domain [0, +Inf): a negative lower
    bound must NOT extrapolate a negative cumulative count (which inflated
    the fraction above the [0, hi] value)."""
    neg = golden_db.query("histogram_fraction(-5, 1, hq)", 0, 100).rows()
    zero = golden_db.query("histogram_fraction(0, 1, hq)", 0, 100).rows()
    assert neg == zero
    # a fully-negative range holds no observations
    allneg = golden_db.query("histogram_fraction(-5, -1, hq)", 0, 100).rows()
    assert [v for _, v in allneg] == [0.0, 0.0]


def test_histogram_helpers_selector_grid(golden_db):
    """histogram_count/sum/avg/fraction in query_range (grid mode): per-
    step instants over the lookback-latest bucket samples — same numbers
    as the raw goldens at their own ts."""
    kw = dict(start=10, end=20, step=10, lookback=10)
    q = golden_db.query_range("histogram_count(hq)", **kw)
    assert sorted(q.rows()) == [(10, 4.0), (20, 5.0)]
    q = golden_db.query_range("histogram_sum(hq)", **kw)
    assert sorted(q.rows()) == [(10, 3.0), (20, 2.75)]
    q = golden_db.query_range("histogram_avg(hq)", **kw)
    assert sorted(q.rows()) == [(10, 0.75), (20, 0.55)]
    q = golden_db.query_range("histogram_fraction(0.5, 1, hq)", **kw)
    assert sorted(q.rows()) == [(10, 0.25), (20, 0.6)]


def test_histogram_helpers_grouped_le_child_grid(golden_db):
    """The canonical dashboard shape on the grid: `histogram_count(sum by
    (le) (hq))` — grouped-le child path shared with histogram_quantile."""
    kw = dict(start=10, end=20, step=10, lookback=10)
    q = golden_db.query_range("histogram_count(sum by (le) (hq))", **kw)
    assert sorted(q.rows()) == [(10, 4.0), (20, 5.0)]
    q = golden_db.query_range("histogram_avg(sum by (le) (hq))", **kw)
    assert sorted(q.rows()) == [(10, 0.75), (20, 0.55)]
    q = golden_db.query_range(
        "histogram_fraction(0.25, 0.75, sum by (le) (hq))", **kw
    )
    rows = sorted(q.rows())
    assert rows[0][0] == 10 and abs(rows[0][1] - 0.25) < 1e-9
    assert rows[1][0] == 20 and abs(rows[1][1] - 0.5) < 1e-9


def test_histogram_helpers_windowed_child_grid(golden_db):
    """histogram_count over a windowed child: increase(hq[20]) at step 20
    covers (0, 20] and turns each cumulative bucket series into its window
    increase — les [0.5, 1, +Inf] become [1, 3, 1]. histogram_count is the
    +Inf bucket's value, so 1.0. Steps 10/30/40 have single-sample windows
    and drop, matching the quantile test's window behavior."""
    q = golden_db.query_range(
        "histogram_count(increase(hq[20]))", 0, 40, 10, lookback=10
    )
    got = dict(q.rows())
    assert set(got) == {20}
    assert abs(got[20] - 1.0) < 1e-9


def test_subquery_at_and_offset_on_grid(golden_db):
    """`fn(expr[R:S] @ T)` / `offset o` in query_range (round 9): the
    modifiers after the brackets bind to the SUBQUERY's evaluation clock
    (Prometheus), not the inner expression."""
    # pinned: every step reports the single-step evaluation at T=40
    pinned = golden_db.query_range("max_over_time(ints[40:20] @ 40)", 0, 20, 10)
    ref = golden_db.query_range("max_over_time(ints[40:20])", 40, 40, 10)
    [(t_ref, v_ref)] = ref.rows()
    assert t_ref == 40
    assert sorted(pinned.rows()) == [(0, v_ref), (10, v_ref), (20, v_ref)]
    # @ end() anchors at the query's end
    anch = golden_db.query_range(
        "max_over_time(ints[40:20] @ end())", 20, 40, 10
    )
    assert sorted(anch.rows()) == [(20, v_ref), (30, v_ref), (40, v_ref)]
    # offset: the whole subquery clock shifts — results equal the
    # unshifted query at (t - offset), re-stamped on the outer grid
    off = golden_db.query_range("max_over_time(ints[40:20] offset 10)", 10, 50, 10)
    plain = golden_db.query_range("max_over_time(ints[40:20])", 0, 40, 10)
    assert sorted((t + 10, v) for t, v in plain.rows()) == sorted(off.rows())


def test_subquery_at_offset_rejected_raw(golden_db):
    import pytest

    with pytest.raises(ValueError, match="query_range only"):
        golden_db.query("max_over_time(ints[40:20] @ 40)", 0, 100)
    with pytest.raises(ValueError, match="query_range only"):
        golden_db.query("max_over_time(ints[40:20] offset 10)", 0, 100)


# ------------------------------------------- windowed funcs over subqueries
def test_rate_family_over_subquery_raw(golden_db):
    """rate/increase/delta over a SUBQUERY on the raw path (round 9):
    `rate(ints[20:10])` — inner instants on the 10-grid, the same
    reset-aware evaluation per outer 20-window as rate(m[20]).
    ints sit exactly on the grid, so the subquery form must equal the
    matrix-selector form."""
    for fn in ("rate", "increase", "delta"):
        sub = golden_db.query(f"{fn}(ints[20:10])", 0, 40).rows()
        mat = golden_db.query(f"{fn}(ints[20])", 0, 40).rows()
        assert sub == mat, fn
    # [20,40) holds instants (20,4),(30,6): increase 2 over span 10
    assert golden_db.query("rate(ints[20:10])", 0, 40).rows() == [(20, 0.2)]


def test_count_family_over_subquery_raw(golden_db):
    for fn in ("resets", "changes", "irate", "idelta"):
        sub = golden_db.query(f"{fn}(ints[20:10])", 0, 40).rows()
        mat = golden_db.query(f"{fn}(ints[20])", 0, 40).rows()
        assert sub == mat, fn
    got = dict(golden_db.query("changes(ints[20:10])", 0, 40).rows())
    assert got == {0: 0, 20: 1, 40: 0}


def test_deriv_predict_holt_over_subquery_raw(golden_db):
    assert golden_db.query("deriv(ints[20:10])", 0, 40).rows() == [(20, 0.2)]
    # window [20,40): exact line through (20,4),(30,6); predicted at
    # 20 + 20 + 5 = 45 -> 0.2*45 + 0 = 9
    got = golden_db.query("predict_linear(ints[20:10], 5)", 0, 40).rows()
    assert got == [(20, 9.0)]
    sub = golden_db.query("holt_winters(ints[40:10], 0.5, 0.5)", 0, 40).rows()
    mat = golden_db.query("holt_winters(ints[40], 0.5, 0.5)", 0, 40).rows()
    assert sub == mat and len(sub) >= 1


def test_rate_family_over_subquery_grid(golden_db):
    """The same surface in query_range: `rate(web[30:10])` — inner
    instants on the 10-grid WITH lookback semantics, outer left-open
    (t-30, t] windows. web: ts [23,29,40,51] v [45,47,23,48]; with
    lookback=10 the inner instants are (30,47),(40,23),(50,23),(60,48)."""
    q = golden_db.query_range("rate(http_requests_total{service=\"web\"}[30:10])",
                              60, 60, 10, lookback=10)
    # (30,60] holds instants 40,50,60 = 23,23,48: reset-aware increase 25
    # over observed span 20 -> 1.25
    assert q.rows() == [(60, 1.25)]
    q = golden_db.query_range("resets(http_requests_total{service=\"web\"}[30:10])",
                              60, 60, 10, lookback=10)
    assert q.rows() == [(60, 0)]
    q = golden_db.query_range("changes(http_requests_total{service=\"web\"}[30:10])",
                              60, 60, 10, lookback=10)
    assert q.rows() == [(60, 1)]
    # deriv: least squares over (40,23),(50,23),(60,48) -> slope 1.25
    q = golden_db.query_range("deriv(http_requests_total{service=\"web\"}[30:10])",
                              60, 60, 10, lookback=10)
    assert q.rows() == [(60, pytest.approx(1.25))]
    # predict_linear: same fit, evaluated at step + horizon = 70
    # intercept = 31.3333... - 1.25*50 = -31.1666...; value = 56.3333...
    q = golden_db.query_range(
        "predict_linear(http_requests_total{service=\"web\"}[30:10], 10)",
        60, 60, 10, lookback=10)
    assert q.rows() == [(60, pytest.approx(94 / 3 - 62.5 + 1.25 * 70))]


def test_rate_over_subquery_grid_pinned(golden_db):
    """`rate(expr[R:S] @ T)` on the grid: the subquery clock pins at T,
    every step reports that single evaluation."""
    pinned = golden_db.query_range(
        "rate(http_requests_total{service=\"web\"}[30:10] @ 60)",
        0, 20, 10, lookback=10)
    assert sorted(pinned.rows()) == [(0, 1.25), (10, 1.25), (20, 1.25)]


def test_absent_over_time_subquery_raw(golden_db):
    """absent_over_time(expr[R:S]) raw path: 1 per tumbling window with
    no inner instant. ints instants live at 10..40; windows 60/80/100
    are empty."""
    q = golden_db.query("absent_over_time(ints[20:10])", 0, 100)
    assert q.rows() == [(60, 1.0), (80, 1.0), (100, 1.0)]
    # fully-covered range -> empty result
    assert golden_db.query("absent_over_time(ints[20:10])", 0, 40).rows() == []
    # unknown metric inside the subquery -> 1 on every window
    q = golden_db.query("absent_over_time(nope_metric[20:10])", 0, 40)
    assert q.rows() == [(0, 1.0), (20, 1.0), (40, 1.0)]


def test_absent_over_time_subquery_grid(golden_db):
    """Grid form: 1 at steps whose (t-30, t] window holds no inner
    10-grid instant. web instants (lookback 10) sit at 30/40/50/60."""
    q = golden_db.query_range(
        'absent_over_time(http_requests_total{service="web"}[30:10])',
        0, 90, 30, lookback=10
    )
    assert sorted(q.rows()) == [(0, 1.0), (90, 1.0)]


def test_subquery_over_arithmetic_raw(golden_db):
    """`(a + b)[R:S]` — the classic Prometheus subquery shape: the inner
    expression evaluates RAW (interpolating join), snaps to the S-grid
    (newest derived row per step window), then the outer windowed
    function runs. ints+uints at ts 10..40 = [3, 6, 9, 12]."""
    q = golden_db.query("max_over_time((ints + uints)[20:10])", 0, 40)
    assert q.rows() == [(0, 3), (20, 9), (40, 12)]
    q = golden_db.query("deriv((ints * 2)[20:10])", 0, 40)
    # [20,40): (20,8),(30,12) -> slope 0.4
    assert q.rows() == [(20, pytest.approx(0.4))]
    # a scalar-returning inner is rejected with a clear error
    with pytest.raises(ValueError, match="vector"):
        golden_db.query("max_over_time((sum(ints))[20:10])", 0, 40)


def test_subquery_over_arithmetic_grid(golden_db):
    """Grid form: inner (a + b) evaluates per inner step with default
    full-label matching; the outer window aggregates per (match key,
    step)."""
    # fixture labels differ (t="i" vs t="u"), so PromQL one-to-one
    # matching needs ignoring(t) — default matching correctly finds no
    # groups (pinned below)
    q = golden_db.query_range(
        "max_over_time((ints + ignoring(t) uints)[20:10])",
        20, 40, 10, lookback=10,
    )
    rows = {r.ts: r.value for r in q.df().collect()}
    assert rows == {20: 6.0, 30: 9.0, 40: 12.0}
    q = golden_db.query_range(
        "rate((ints + ignoring(t) uints)[30:10])", 40, 40, 10, lookback=10
    )
    # (10,40]: instants 20,30,40 = 6,9,12 -> inc 6 over span 20
    [r] = q.df().collect()
    assert r.value == pytest.approx(0.3)
    with pytest.raises(ValueError, match="no matching label groups"):
        golden_db.query_range(
            "max_over_time((ints + uints)[20:10])", 20, 40, 10, lookback=10
        ).df().collect()
