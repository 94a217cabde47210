import pytest

from tachyon_spark.promql import ast, parse
from tachyon_spark.promql.parser import PromQLError


def test_selector_with_matchers():
    e = parse('http_requests_total{service="web", env!="prod"}')
    assert isinstance(e, ast.VectorSelector)
    assert e.name == "http_requests_total"
    assert e.matchers == (
        ast.Matcher("service", "=", "web"),
        ast.Matcher("env", "!=", "prod"),
    )


def test_at_offset():
    e = parse("m @ 324 offset 10")
    assert e.at_ts == 324 and e.offset == 10
    e2 = parse("m @ start()")
    assert e2.at_anchor == "start"


def test_precedence():
    e = parse("a + b * c")
    assert isinstance(e, ast.BinaryOp) and e.op == "+"
    assert isinstance(e.rhs, ast.BinaryOp) and e.rhs.op == "*"


def test_cmp_lowest_precedence():
    e = parse("a % 4 == 2")
    assert e.op == "==" and e.lhs.op == "%"


def test_aggregate_by():
    e = parse("sum by (service) (m)")
    assert isinstance(e, ast.Aggregate) and e.by == ("service",)


def test_topk():
    e = parse("topk(2 + 1, m)")
    assert isinstance(e, ast.GetK) and e.func == "topk"
    assert isinstance(e.k, ast.BinaryOp)


def test_number_literal_negative():
    e = parse("-4.5")
    assert isinstance(e, ast.NumberLiteral) and e.value == -4.5


def test_errors():
    with pytest.raises(PromQLError):
        parse("m{")
    with pytest.raises(PromQLError):
        parse("sum(")
    with pytest.raises(PromQLError):
        parse("m 5")


def test_colon_metric_names():
    """Recording-rule-style names (job:rate:sum) lex as one identifier
    outside a range context; subquery ':' inside [..] still works."""
    from tachyon_spark.promql import ast

    expr = parse("job:http_requests:rate5m")
    assert isinstance(expr, ast.VectorSelector)
    assert expr.name == "job:http_requests:rate5m"
    sel = parse('job:err:ratio{service="web"}')
    assert sel.name == "job:err:ratio"
    # subquery separator unaffected
    sub = parse("job:rate:sum[30:5]")
    assert isinstance(sub, ast.Subquery)
    assert (sub.range_, sub.step) == (30, 5)


def test_count_values_reserved_label_rejected():
    for label in ("value", "ts", "stream_id"):
        with pytest.raises(PromQLError, match="reserved"):
            parse(f'count_values("{label}", m)')


def test_parser_raises_only_controlled_errors():
    """Fuzz: arbitrary input must yield PromQLError/ValueError, never an
    uncontrolled IndexError/AttributeError (the error surface the CLI,
    server, and library callers catch)."""
    import random
    import string

    from tachyon_spark.promql.parser import PromQLError, parse

    rng = random.Random(5)
    alphabet = string.ascii_lowercase + '(){}[]"\',=!~@: .0123456789+-*/%^_'
    for _ in range(4000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 25)))
        try:
            parse(s)
        except (PromQLError, ValueError):
            pass
    # token-soup variant biased toward the grouping grammar (round 9:
    # postfix/prefix by/without on every aggregation) — multi-char tokens
    # random chars rarely produce
    words = [
        "topk", "bottomk", "sum", "quantile", "count_values", "limitk",
        "limit_ratio", "by", "without", "offset", "or", "(", ")", ",",
        "(job)", "(a,b)", "m", "5", "0.9", '"v"', "@", "0", "-", "[5m]",
        "^", "atan2", "+", "{", "}", "__name__", "=~", '"a|b"',
        "[30m:5m]", "rate", "predict_linear", "absent_over_time",
    ]
    for _ in range(2000):
        s = " ".join(rng.choice(words) for _ in range(rng.randint(1, 12)))
        try:
            parse(s)
        except (PromQLError, ValueError):
            pass
