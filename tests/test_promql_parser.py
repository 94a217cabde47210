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
