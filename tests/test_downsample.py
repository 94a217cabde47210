"""M4 downsampling and windowed anomaly flags (operators/downsample)."""

import pytest

from tachyon_spark.operators.downsample import anomaly_flags, m4_downsample


def test_m4_roles_and_dedup(spark):
    rows = [
        ("s", 1, 5.0), ("s", 2, 9.0), ("s", 3, 1.0), ("s", 4, 7.0),  # bucket 0
        ("s", 12, 2.0),                                              # bucket 10: singleton
    ]
    df = spark.createDataFrame(rows, "stream_id string, ts long, value double")
    out = {(r.bucket, r.ts): r.roles for r in m4_downsample(df, 10).collect()}
    assert out[(0, 1)] == ["first"]
    assert out[(0, 2)] == ["max"]
    assert out[(0, 3)] == ["min"]
    assert out[(0, 4)] == ["last"]
    # a singleton bucket's sample carries all four roles, deduplicated
    assert out[(10, 12)] == ["first", "last", "max", "min"]
    # rendering-lossless: the 4 points bound every bucket's envelope
    assert len(out) == 5
    with pytest.raises(ValueError):
        m4_downsample(df, 0)


def test_anomaly_flags_plain_and_robust(spark):
    # window [0,100): nine 10s and one 100 -> the 100 is the anomaly
    rows = [("s", t, 10.0) for t in range(9)] + [("s", 9, 100.0)]
    df = spark.createDataFrame(rows, "stream_id string, ts long, value double")
    # mean 19, stddev_pop 27: |100-19| = 81 = 3.0 sigma exactly, so use 2.9
    out = {r.ts: r.is_anomaly for r in anomaly_flags(df, 100, nsigma=2.9).collect()}
    assert out[9] and not any(out[t] for t in range(9))
    # robust (median/MAD): MAD is 0 here -> spread 0 -> outlier still flagged,
    # and the 10s (|x-med| = 0) never are
    rout = {r.ts: r.is_anomaly for r in
            anomaly_flags(df, 100, nsigma=3.0, robust=True).collect()}
    assert rout[9] and not any(rout[t] for t in range(9))
    # constant window: nothing flagged (spread 0, deviation 0)
    const = spark.createDataFrame(
        [("c", t, 5.0) for t in range(5)], "stream_id string, ts long, value double"
    )
    assert not any(r.is_anomaly for r in anomaly_flags(const, 100).collect())
