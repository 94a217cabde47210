"""Alerting-rule evaluation (operators/alerts.alert_state +
Connection.alert_rule): Prometheus pending/firing lifecycle over the
step grid — islands of contiguous present steps, active_since = island
start, firing once the island is `for_` old."""

import pytest

WEB = 'http_requests_total{service="web"}'


def test_alert_state_islands(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from tachyon_spark.operators.alerts import alert_state

    rows = [("s", t, 1.0) for t in [10, 20, 30, 60, 70]]
    df = spark.createDataFrame(rows, ["stream_id", "ts", "value"])
    out = {
        r.ts: (r.active_since, r.state)
        for r in alert_state(df, step=10, for_=20).collect()
    }
    # island 1: 10-30 (active_since 10); island 2: 60-70 (active_since 60)
    assert out[10] == (10, "pending")
    assert out[20] == (10, "pending")
    assert out[30] == (10, "firing")  # 30 - 10 >= 20
    assert out[60] == (60, "pending")
    assert out[70] == (60, "pending")


def test_alert_state_for_zero_fires_immediately(spark):
    from tachyon_spark.operators.alerts import alert_state

    df = spark.createDataFrame([("s", 5, 1.0)], ["stream_id", "ts", "value"])
    [r] = alert_state(df, step=5, for_=0).collect()
    assert r.state == "firing" and r.active_since == 5


def test_alert_state_validation(spark):
    from tachyon_spark.operators.alerts import alert_state

    df = spark.createDataFrame([("s", 5, 1.0)], ["stream_id", "ts", "value"])
    with pytest.raises(ValueError, match="step"):
        alert_state(df, step=0)
    with pytest.raises(ValueError, match="for_"):
        alert_state(df, step=5, for_=-1)


def test_alert_rule_end_to_end(golden_db):
    """web values [45, 47, 23, 48] at ts [23, 29, 40, 51]; `web > 40` on
    the 10-grid (lookback 100) holds at 30 and 60..100 — two islands."""
    out = golden_db.alert_rule(f"{WEB} > 40", 0, 100, 10, for_=20, lookback=100)
    rows = {r.ts: (r.active_since, r.state, r.value) for r in out.collect()}
    assert set(rows) == {30, 60, 70, 80, 90, 100}
    assert rows[30] == (30, "pending", 47)
    assert rows[60] == (60, "pending", 48)
    assert rows[70] == (60, "pending", 48)
    assert rows[80] == (60, "firing", 48)
    assert rows[100] == (60, "firing", 48)
    # for_=0: every present step fires immediately
    out0 = golden_db.alert_rule(f"{WEB} > 40", 0, 100, 10, for_=0, lookback=100)
    assert all(r.state == "firing" for r in out0.collect())
    # threshold nothing exceeds -> no alerts at all
    none = golden_db.alert_rule(f"{WEB} > 1000", 0, 100, 10, lookback=100)
    assert none.count() == 0


def test_alert_rule_grouped_expression(spark, tmp_path):
    """Alerting on an aggregation: `sum by (service) (m) > 50 for 20` —
    each group is its own alert series (alert_state keys on the group
    columns automatically)."""
    import tachyon_spark as ty

    conn = ty.Connection(str(tmp_path / "db"), spark)
    for svc, pts in (("web", [(10, 60.0), (20, 70.0), (30, 80.0)]),
                     ("db", [(10, 1.0), (20, 2.0), (30, 3.0)])):
        conn.create_stream(f'm{{service="{svc}"}}', "f64")
        ins = conn.prepare_insert(f'm{{service="{svc}"}}')
        for t, v in pts:
            ins.insert(t, v)
        ins.flush()
    out = conn.alert_rule(
        "sum by (service) (m) > 50", 0, 30, 10, for_=20, lookback=10
    )
    rows = {(r.service, r.ts): r.state for r in out.collect()}
    assert rows == {
        ("web", 10): "pending",
        ("web", 20): "pending",
        ("web", 30): "firing",
    }


def test_alert_state_keep_firing_for(spark):
    """keep_firing_for bridges gaps only for runs that reached firing:
    the same incident continues (active_since preserved); pending runs
    reset immediately on any gap."""
    from tachyon_spark.operators.alerts import alert_state

    # step 10, for_=20, keep=20: run A 10..40 fires at 30; gap 50-60
    # (absent), back at 70 -> 70-40=30 <= keep+step: SAME incident.
    # Run B 200 (single, pending), gap, 230: pending never bridges.
    rows = [("s", t, 1.0) for t in [10, 20, 30, 40, 70, 200, 230]]
    df = spark.createDataFrame(rows, ["stream_id", "ts", "value"])
    out = {
        r.ts: (r.active_since, r.state)
        for r in alert_state(df, step=10, for_=20,
                             keep_firing_for=20).collect()
    }
    assert out[30] == (10, "firing")
    assert out[40] == (10, "firing")
    assert out[70] == (10, "firing")   # bridged: incident identity kept
    assert out[200] == (200, "pending")
    assert out[230] == (230, "pending")  # pending did NOT bridge
    # beyond keep: 70 -> 110 is 40 > keep+step=30: new incident
    rows2 = [("s", t, 1.0) for t in [10, 20, 30, 70]]
    df2 = spark.createDataFrame(rows2, ["stream_id", "ts", "value"])
    out2 = {
        r.ts: (r.active_since, r.state)
        for r in alert_state(df2, step=10, for_=20,
                             keep_firing_for=20).collect()
    }
    assert out2[30] == (10, "firing")
    assert out2[70] == (70, "pending")  # 70-30=40 > 30: fresh incident
    # keep=0 path equals the vectorized islands
    base = {
        r.ts: (r.active_since, r.state)
        for r in alert_state(df, step=10, for_=20).collect()
    }
    assert base[70] == (70, "pending")
