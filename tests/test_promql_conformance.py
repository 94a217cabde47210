"""PromQL grammar conformance sweep (VERDICT r6 item 5).

Pins the grammar against two external corpora:

1. The REFERENCE parser/planner corpus — every query in the reference's
   planner tests (tachyon_core/src/query/planner.rs:264-364) plus the
   shapes its handlers accept/reject (planner.rs:28-262). The reference
   uses a forked promql-parser whose matcher lists allow `or`
   disjunctions ({a="x" or b="y"}) — every one of its planner tests uses
   them — and signed offsets (Offset::Pos/Neg, planner.rs:171-176).

2. Prometheus-DOCUMENTED examples (querying/functions + querying/examples
   docs) for the extended surface this engine supports beyond the
   reference.

Also enumerates the exact error surface: everything malformed raises
PromQLError (a ValueError subclass) at parse time, or ValueError at plan
time — never an uncontrolled exception type.
"""

from __future__ import annotations

import pytest

from tachyon_spark.promql import ast
from tachyon_spark.promql.parser import PromQLError, parse

# --- 1. the reference planner-test corpus, verbatim -----------------------

REFERENCE_CORPUS = [
    # planner.rs:268-276 (test_vector_selector_query)
    ('http_requests_total{service = "web" or service = "nice"} @ 324',
     ast.VectorSelector),
    # planner.rs:279-330 (sum/count/avg/min/max)
    ('sum(http_requests_total{service = "web" or service = "nice"})',
     ast.Aggregate),
    ('count(http_requests_total{service = "web" or service = "nice"})',
     ast.Aggregate),
    ('avg(http_requests_total{service = "web" or service = "nice"})',
     ast.Aggregate),
    ('min(http_requests_total{service = "web" or service = "nice"})',
     ast.Aggregate),
    ('max(http_requests_total{service = "web" or service = "nice"})',
     ast.Aggregate),
    # planner.rs:332-364 (bottomk/topk with param)
    ('bottomk(5, http_requests_total{service = "web" or service = "nice"})',
     ast.GetK),
    ('topk(5, http_requests_total{service = "web" or service = "nice"})',
     ast.GetK),
]


@pytest.mark.parametrize("src,node_type", REFERENCE_CORPUS)
def test_reference_planner_corpus_parses(src, node_type):
    assert isinstance(parse(src), node_type)


def test_or_matchers_build_disjunction_groups():
    e = parse('m{service = "web" or service = "nice"}')
    assert e.matchers == ()
    assert e.or_groups == (
        (ast.Matcher("service", "=", "web"),),
        (ast.Matcher("service", "=", "nice"),),
    )
    # ',' binds tighter than 'or': (a AND b) OR c
    e2 = parse('m{a="1", b="2" or c="3"}')
    assert e2.or_groups == (
        (ast.Matcher("a", "=", "1"), ast.Matcher("b", "=", "2")),
        (ast.Matcher("c", "=", "3"),),
    )
    # single group stays in the flat `matchers` form
    e3 = parse('m{a="1", b="2"}')
    assert e3.or_groups == () and len(e3.matchers) == 2


def test_or_matchers_resolve_union(db):
    from tests.conftest import make_stream

    for svc, v in (("web", 1.0), ("nice", 2.0), ("db", 4.0)):
        make_stream(db, f'conf_reqs{{service="{svc}"}}', "f64", [(10, v)])
    q = db.query(
        'sum(conf_reqs{service = "web" or service = "nice"})', 0, 100
    )
    assert q.scalar() == 3.0
    # overlapping groups still count each stream once
    q2 = db.query(
        'sum(conf_reqs{service = "web" or service =~ "w.*"})', 0, 100
    )
    assert q2.scalar() == 1.0


def test_offset_signs_match_reference_saturating_semantics(db):
    """planner.rs:171-176: offset ADDS to the @ anchor (Pos=saturating_add,
    Neg=saturating_sub) — this engine mirrors that, including the
    saturation floor at 0."""
    from tests.conftest import make_stream

    make_stream(db, "conf_off", "f64", [(10, 1.0), (50, 2.0)])
    assert db.query("conf_off @ 50 offset -45", 0, 100).rows() == [
        (10, 1.0), (50, 2.0)
    ]
    assert db.query("conf_off @ 0 offset 30", 0, 100).rows() == [(50, 2.0)]
    # saturates at 0 instead of going negative
    assert db.query("conf_off @ 5 offset -100", 0, 100).rows() == [
        (10, 1.0), (50, 2.0)
    ]
    # duration units are accepted (reference offsets are durations)
    assert isinstance(parse("conf_off offset 5m"), ast.VectorSelector)
    assert parse("conf_off offset -5m").offset == -parse(
        "conf_off offset 5m"
    ).offset


def test_offset_zero_accepted(db):
    """Prometheus accepts a zero offset (`m offset 0` == `m`); range
    selectors and subquery steps stay strictly positive."""
    assert parse("m offset 0").offset == 0
    assert parse("m offset 0m").offset == 0
    assert parse("m offset -0").offset == 0
    from tests.conftest import make_stream

    make_stream(db, "conf_off0", "f64", [(10, 1.0), (50, 2.0)])
    assert db.query("conf_off0 offset 0", 0, 100).rows() == db.query(
        "conf_off0", 0, 100
    ).rows()
    with pytest.raises(PromQLError):
        parse("m[0]")
    with pytest.raises(PromQLError):
        parse("max_over_time(m[40:0])")


def test_postfix_grouping_all_aggregations(golden_db):
    """Prometheus accepts the grouping modifier postfix on EVERY
    aggregation operator: `topk(5, m) by (job)` == `topk by (job) (5, m)`
    (same for bottomk/quantile/count_values/limitk/limit_ratio)."""
    pairs = [
        ("topk(5, m) by (job)", "topk by (job) (5, m)"),
        ("bottomk(2, m) by (job)", "bottomk by (job) (2, m)"),
        ("quantile(0.9, m) by (job)", "quantile by (job) (0.9, m)"),
        ('count_values("v", m) by (job)', 'count_values by (job) ("v", m)'),
        ("limitk(2, m) by (job)", "limitk by (job) (2, m)"),
        ("limit_ratio(0.5, m) by (job)", "limit_ratio by (job) (0.5, m)"),
        ("sum(m) without (job)", "sum without (job) (m)"),
        ('count_values("v", m) without (job)',
         'count_values without (job) ("v", m)'),
        ("topk(5, m) without (job)", "topk without (job) (5, m)"),
        ("limitk(2, m) without (job)", "limitk without (job) (2, m)"),
    ]
    for postfix, prefix in pairs:
        assert parse(postfix) == parse(prefix), postfix
    # postfix evaluates identically to prefix through the engine
    post = golden_db.query("topk(1, mg) by (service)", 0, 100)
    pre = golden_db.query("topk by (service) (1, mg)", 0, 100)
    assert sorted(map(tuple, post.df().collect())) == sorted(
        map(tuple, pre.df().collect())
    )


def test_topk_limitk_without_grouping(golden_db):
    """`without` grouping on topk/bottomk and limitk (round 9; previously
    a documented by-only divergence): groups on the canonical
    remaining-label series key, same as Aggregate.without."""
    # vm_multi: {service=web,host=a} [1,2], {service=web,host=b} [3] —
    # without(host) leaves one service=web group; top-1 value is 3.0
    q = golden_db.query("topk without (host) (1, vm_multi)", 0, 100)
    assert [tuple(r) for r in q.df().collect()] == [("service=web", 3.0)]
    # bottomk: smallest value in the merged group is 1.0
    q2 = golden_db.query("bottomk without (host) (1, vm_multi)", 0, 100)
    assert [tuple(r) for r in q2.df().collect()] == [("service=web", 1.0)]
    # mg's only label is service, so without(service) collapses both
    # streams into one group == the ungrouped limitk selection
    a = sorted(golden_db.query("limitk without (service) (1, mg)", 0, 100).rows())
    b = sorted(golden_db.query("limitk(1, mg)", 0, 100).rows())
    assert a == b and len(a) == 2


def test_count_values_grouped(golden_db):
    """count_values with by/without grouping (PromQL: count_values is an
    aggregation): counts per (group, value) pair."""
    # mg web [10,20], mobile [1,2] -> one row per (service, value)
    q = golden_db.query('count_values("v", mg) by (service)', 0, 100)
    assert sorted(map(tuple, q.df().collect())) == [
        ("mobile", "1", 1), ("mobile", "2", 1),
        ("web", "10", 1), ("web", "20", 1),
    ]
    # without(service) drops the only label -> empty series key
    q2 = golden_db.query('count_values without (service) ("v", mg)', 0, 100)
    assert sorted(map(tuple, q2.df().collect())) == [
        ("", "1", 1), ("", "10", 1), ("", "2", 1), ("", "20", 1),
    ]
    # grouping label colliding with the value label is rejected
    with pytest.raises(PromQLError, match="collides"):
        parse('count_values("service", mg) by (service)')


# --- 2. shapes the reference REJECTS: our disposition, pinned -------------
# Each entry: (query, "extension" if we evaluate it | exact parse/plan error)

REFERENCE_REJECTS = [
    # planner.rs:208-216: matrix selectors — we parse them but planning a
    # STANDALONE one is a controlled error (only range-function args)
    ("m[30]", "plan-error"),
    # planner.rs:218-222: Call — all function calls: our extension
    ("rate(m[30])", "extension"),
    ("abs(m)", "extension"),
    # planner.rs:125-133: subqueries: our extension
    ("max_over_time(m[40:20])", "extension"),
    # planner.rs:85-89: unary: our extension (parsed as 0 - m)
    ("-m", "extension"),
    # planner.rs:146-154: string literals: parse error both engines
    ('"just a string"', "parse-error"),
    # planner.rs:190-193: selector without a metric name — the reference
    # rejects, but Prometheus ACCEPTS bare matcher selectors, so since
    # round 9 this is our extension ({} with no matcher stays an error)
    ('{service="web"}', "extension"),
    ("{}", "parse-error"),
    # planner.rs:77-79: topk without its k param: syntax error
    ("topk(5)", "parse-error"),
]


@pytest.mark.parametrize("src,disposition", REFERENCE_REJECTS)
def test_reference_rejected_shapes_disposition(src, disposition, golden_db):
    if disposition == "parse-error":
        with pytest.raises(PromQLError):
            parse(src)
        return
    expr = parse(src)  # must at least parse
    if disposition == "plan-error":
        with pytest.raises(ValueError):
            golden_db.query(src.replace("m[", "ints["), 0, 100)
    else:
        assert expr is not None  # extension: parse succeeds; evaluation
        # of each extension family is pinned by its own golden tests


# --- 3. Prometheus-documented expressions parse ---------------------------

PROMETHEUS_DOC_CORPUS = [
    'http_requests_total{job="apiserver", handler="/api/comments"}',
    'http_requests_total{job=~".*server"}',
    'http_requests_total{status!~"4.."}',
    "sum by (job) (rate(http_requests_total[300]))",
    "sum without (instance) (http_requests_total)",
    "topk(5, http_requests_total)",
    'count_values("version", build_version)',
    "histogram_quantile(0.9, rate(b[600]))",
    "histogram_fraction(0, 0.2, rate(b[3600]))",
    "histogram_count(b)",
    "histogram_sum(b)",
    "histogram_avg(b)",
    'label_replace(up{job="api-server"}, "foo", "$1", "service", "(.*):.*")',
    'label_join(up{job="api-server"}, "foo", ",", "instance", "job")',
    "clamp(m, 0, 10)",
    "clamp_max(m, 10)",
    "clamp_min(m, 1)",
    'absent(nonexistent{job="myjob"})',
    "absent_over_time(m[3600])",
    "delta(cpu_temp_celsius[7200])",
    "increase(http_requests_total[300])",
    "irate(http_requests_total[300])",
    "idelta(m[300])",
    "resets(m[300])",
    "changes(m[300])",
    "deriv(m[300])",
    "predict_linear(m[3600], 3600)",
    "holt_winters(m[3600], 0.3, 0.1)",
    "avg_over_time(m[300])",
    "min_over_time(m[300])",
    "max_over_time(m[300])",
    "sum_over_time(m[300])",
    "count_over_time(m[300])",
    "quantile_over_time(0.9, m[300])",
    "stddev_over_time(m[300])",
    "stdvar_over_time(m[300])",
    "last_over_time(m[300])",
    "present_over_time(m[300])",
    "mad_over_time(m[300])",
    "m[1800:300]",
    "max_over_time(rate(m[300])[1800:300])",
    "abs(m)", "ceil(m)", "floor(m)", "exp(m)", "ln(m)", "log2(m)",
    "log10(m)", "sqrt(m)", "sgn(m)", "round(m, 5)",
    "scalar(m)", "vector(1)", "time()", "timestamp(m)",
    "minute()", "hour()", "day_of_week()", "day_of_month()",
    "days_in_month()", "month()", "year()",
    "sort(m)", "sort_desc(m)",
    "sort_by_label(m, \"instance\")", "sort_by_label_desc(m, \"instance\")",
    "limitk(2, m)", "limit_ratio(0.5, m)",
    "stddev(m)", "stdvar(m)", "quantile(0.9, m)", "group(m)",
    "m and n", "m or n", "m unless n",
    "m * on(a) group_left(b) n",
    "m / ignoring(c) n",
    "sum(rate(http_requests_total[300])) by (job)",  # postfix by
    "(m + n) * 2",
    "m == bool 1",
    "1 + 2 * 3 - -4",
]


@pytest.mark.parametrize("src", PROMETHEUS_DOC_CORPUS)
def test_prometheus_documented_expressions_parse(src):
    assert parse(src) is not None


# --- 4. exact error surface ----------------------------------------------

MALFORMED = [
    "",                       # empty
    "(",                      # unbalanced
    "m{",                     # unterminated matcher list
    'm{a=}',                  # missing matcher value
    'm{a="x" or}',            # dangling or
    'm{a="x",}',              # trailing comma is tolerated? pin below
    "m[",                     # unterminated range
    "m[0]",                   # non-positive duration
    "m[5q]",                  # unknown unit
    "m offset",               # missing offset value
    "m @ web",                # bad @ modifier
    "topk(5)",                # missing child
    "sum by (m",              # unterminated label list
    "histogram_quantile(2, m)",       # phi out of range
    "histogram_fraction(3, 1, m)",    # lo > hi
    "quantile_over_time(x, m[300])",  # non-number phi
    "m n",                    # trailing input
    "m + ",                   # missing rhs
]
# NOT malformed by design: `rate(m)` over a plain selector is this
# engine's documented whole-range extension (tests/test_range_funcs.py) —
# Prometheus would reject it, the reference rejects ALL calls.


@pytest.mark.parametrize("src", MALFORMED)
def test_malformed_queries_raise_promql_error_only(src):
    if src == 'm{a="x",}':
        # trailing comma inside a matcher list is accepted (Prometheus
        # allows it) — pin that it parses to the single-matcher form
        assert parse(src).matchers == (ast.Matcher("a", "=", "x"),)
        return
    with pytest.raises(PromQLError):
        parse(src)


def test_promql_error_is_value_error():
    # the public contract: callers can catch ValueError for everything
    assert issubclass(PromQLError, ValueError)
