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


def test_record_grouped_ids_deterministic_and_collision_checked(db):
    """The distributed record() path: stream ids are a pure function of
    (name, label tuple) — re-recording after a delete reproduces the SAME
    ids on any cluster — re-recording over live streams raises the same
    already-exists error as create_streams, and return_ids=False skips the
    driver-side id materialization entirely (the million-series contract)."""
    from tests.conftest import make_stream

    make_stream(db, 'rr2_src{service="web"}', "u64", [(10, 5), (20, 9)])
    make_stream(db, 'rr2_src{service="app"}', "u64", [(10, 2), (20, 3)])
    ids1 = db.record(
        "rr2_sum", "sum by (service) (rr2_src)", 0, 30, step=10, lookback=10
    )
    assert len(ids1) == 2
    with pytest.raises(ValueError, match="already exists"):
        db.record(
            "rr2_sum", "sum by (service) (rr2_src)", 0, 30, step=10,
            lookback=10,
        )
    db.delete_stream("rr2_sum")
    ids2 = db.record(
        "rr2_sum", "sum by (service) (rr2_src)", 0, 30, step=10, lookback=10
    )
    assert sorted(ids1) == sorted(ids2)
    db.delete_stream("rr2_sum")
    assert (
        db.record(
            "rr2_sum", "sum by (service) (rr2_src)", 0, 30, step=10,
            lookback=10, return_ids=False,
        )
        is None
    )
    web = dict(db.query('rr2_sum{service="web"}', 0, 100).rows())
    assert web[10] == 5.0 and web[20] == 9.0
