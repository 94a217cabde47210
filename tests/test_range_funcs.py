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
