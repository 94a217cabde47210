"""Recording rules (Connection.record): evaluate an expression, persist
the result as queryable streams."""

import pytest

WEB = 'http_requests_total{service="web"}'


def test_record_ungrouped_grid(db):
    from tests.conftest import make_stream

    make_stream(db, "rr_src", "u64", [(10, 5), (20, 9), (30, 4)])
    ids = db.record("rr_rate", "increase(rr_src[20])", 0, 40, step=10)
    assert len(ids) == 1
    # windows (t-20, t]: t20 -> {5,9}: 4; t30 -> {9,4}: reset -> 4;
    # t40 -> {4}: dropped (two-point rule)
    got = db.query("rr_rate", 0, 100).rows()
    assert got == [(20, 4.0), (30, 4.0)]
    # recorded stream composes like any metric
    assert db.query("rr_rate * 2", 0, 100).rows() == [(20, 8.0), (30, 8.0)]


def test_record_grouped_labels(golden_db):
    ids = golden_db.record(
        "rr_sum", "sum by (service) (http_requests_total)", 0, 60,
        step=30, lookback=10,
    )
    assert len(ids) >= 2  # one stream per service group
    web = dict(golden_db.query('rr_sum{service="web"}', 0, 100).rows())
    assert web[30] == 47.0 and web[60] == 48.0
    # grouped selector over the recorded family works too
    total = dict(
        golden_db.query_range("sum(rr_sum)", 30, 30, 30, lookback=0).rows()
    )
    assert 30 in total


def test_record_rejects_timeless_result(golden_db):
    with pytest.raises(ValueError, match="collapse time"):
        golden_db.record("rr_bad", "sum(http_requests_total)", 0, 100)
