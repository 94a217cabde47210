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


def test_funnel_ordering_and_window(spark):
    from tachyon_spark.operators.funnel import funnel

    rows = [
        # u1 completes all 3 in order
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: click BEFORE view -> not counted; no click after the view
        (2, "click", 5), (2, "view", 10), (2, "purchase", 40),
        # u3: click too late for the window
        (3, "view", 10), (3, "click", 200),
        # u4: same-ts click does NOT count (strictly after)
        (4, "view", 10), (4, "click", 10),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    out = {r.user: r for r in funnel(df, ["view", "click", "purchase"], within=50).collect()}
    assert (out[1].t1, out[1].t2, out[1].t3, out[1].reached) == (10, 20, 30, 3)
    assert out[2].t2 is None and out[2].reached == 1
    assert out[3].t2 is None
    assert out[4].t2 is None
    import pytest as _pt

    with _pt.raises(ValueError):
        funnel(df, ["view"])


def test_cohort_retention_triangle(spark):
    from tachyon_spark.operators.funnel import cohort_retention

    # periods of 10: u1 first at 0, active offsets 0,1,3; u2 first at 10 (offset 0 only)
    rows = [(1, 1), (1, 5), (1, 12), (1, 33), (2, 11)]
    df = spark.createDataFrame(rows, "user_id long, ts long")
    got = {(r.cohort, r.offset): r.n_users
           for r in cohort_retention(df, period=10, max_offset=5).collect()}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (10, 0): 1}


def test_cusum_drift_detects_sustained_shift(spark):
    from tachyon_spark.operators.downsample import cusum_drift

    # first half oscillates around 0, second half sustains +1: pointwise
    # z-scores stay small but CUSUM accumulates past the threshold
    vals = [0.5, -0.5] * 10 + [1.0] * 20
    rows = [("s", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "stream_id string, ts long, value double")
    out = cusum_drift(df, 1000, k=0.5, h=4.0).collect()
    assert len(out) == 1 and out[0].alarmed and out[0].n == 40
    # anomaly_flags at 3 sigma misses the same shift (no single outlier)
    from tachyon_spark.operators.downsample import anomaly_flags

    assert not any(
        r.is_anomaly for r in anomaly_flags(df, 1000, nsigma=3.0).collect()
    )
    # constant window: stddev 0 -> s_max 0, no alarm
    const = spark.createDataFrame(
        [("c", t, 7.0) for t in range(5)], "stream_id string, ts long, value double"
    )
    got = cusum_drift(const, 1000).collect()
    assert got[0].s_max == 0.0 and not got[0].alarmed


def test_lttb_downsample_matches_python_model(spark):
    """Fixed-anchor LTTB vs a direct Python replay: one selected sample
    per bucket, endpoints pinned, interior pick = max triangle area vs
    neighbor-bucket means (area round-6, tie -> earliest ts)."""
    from tachyon_spark.operators.downsample import lttb_downsample

    pts = [(t, float(((t * 7) % 13) - 6)) for t in range(0, 40)]
    df = spark.createDataFrame(
        [("s", t, v) for t, v in pts], "stream_id string, ts long, value double"
    )
    got = {
        r["bucket"]: (r["ts"], r["value"])
        for r in lttb_downsample(df, 10).collect()
    }

    # python model
    import collections

    buckets = collections.defaultdict(list)
    for t, v in pts:
        buckets[t - t % 10].append((t, v))
    order = sorted(buckets)
    means = {b: (sum(t for t, _ in buckets[b]) / len(buckets[b]),
                 sum(v for _, v in buckets[b]) / len(buckets[b]))
             for b in order}
    expect = {}
    for i, bkt in enumerate(order):
        if i == 0:
            expect[bkt] = min(buckets[bkt])
        elif i == len(order) - 1:
            expect[bkt] = max(buckets[bkt])
        else:
            at, av = means[order[i - 1]]
            ct, cv = means[order[i + 1]]
            best = max(
                buckets[bkt],
                key=lambda p: (round(abs((at - ct) * (p[1] - av)
                                         - (at - p[0]) * (cv - av)) / 2, 6),
                               -p[0]),
            )
            expect[bkt] = best
    assert got == expect
    assert len(got) == 4  # one pick per bucket


def test_lttb_validation(spark):
    import pytest

    from tachyon_spark.operators.downsample import lttb_downsample

    df = spark.createDataFrame([("s", 1, 1.0)], "stream_id string, ts long, value double")
    with pytest.raises(ValueError):
        lttb_downsample(df, 0)
    # single-bucket series keeps its first sample
    assert lttb_downsample(df, 10).collect()[0]["ts"] == 1


def test_multires_rollup_one_exchange(spark):
    """GROUPING SETS multi-resolution rollup: correct per-resolution
    buckets, and ONE Exchange serves every resolution."""
    from tachyon_spark.operators.multires import multires_rollup

    df = spark.createDataFrame(
        [("a", t, float(t)) for t in range(0, 100, 10)]
        + [("b", 5, 7.0)],
        "stream_id string, ts long, value double",
    )
    out = multires_rollup(df, {"r20": 20, "r50": 50})
    rows = {(r["key"], r["resolution"], r["bucket"]): (r["n"], r["sum"], r["avg"])
            for r in out.collect()}
    assert rows[("a", "r20", 0)] == (2, 10.0, 5.0)
    assert rows[("a", "r50", 50)] == (5, 350.0, 70.0)
    assert rows[("b", "r20", 0)] == (1, 7.0, 7.0)
    assert rows[("b", "r50", 0)] == (1, 7.0, 7.0)
    # every (key, resolution) partitioning is complete
    assert len([k for k in rows if k[1] == "r20"]) == 6
    assert len([k for k in rows if k[1] == "r50"]) == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both plans
    assert final.count("Exchange") == 1  # one shuffle for BOTH resolutions
    import pytest

    with pytest.raises(ValueError):
        multires_rollup(df, {})
    with pytest.raises(ValueError):
        multires_rollup(df, {"x": 0})


def test_serve_from_rollup_routes_and_merges_exactly(spark):
    """Rollup serving: picks the coarsest dividing resolution, and the
    count-weighted merge equals direct aggregation of the raw samples."""
    import pytest
    from pyspark.sql import functions as F

    from tachyon_spark.operators.multires import (
        multires_rollup,
        serve_from_rollup,
    )

    raw = spark.createDataFrame(
        [("a", t, float((t * 13) % 7)) for t in range(0, 200, 3)],
        "stream_id string, ts long, value double",
    )
    res = {"r10": 10, "r50": 50}
    roll = multires_rollup(raw, res)
    served = {(r["key"], r["bucket"]): r["value"]
              for r in serve_from_rollup(roll, res, 0, 199, 100).collect()}
    from tachyon_spark.operators.multires import round6_replayable

    direct = {("a", b): v for b, v in raw.groupBy(
        (F.col("ts") - F.col("ts") % 100).alias("b")).agg(
        round6_replayable(F.avg("value")).alias("v")).collect()}
    assert served == direct
    # sum/count merges are exact too
    got_n = {(r["key"], r["bucket"]): r["value"] for r in
             serve_from_rollup(roll, res, 0, 199, 100, agg="count").collect()}
    assert got_n[("a", 0)] == 34 and got_n[("a", 100)] == 33
    # step that no resolution divides -> explicit error, never silent raw
    with pytest.raises(ValueError, match="no stored resolution"):
        serve_from_rollup(roll, res, 0, 199, 75)
    with pytest.raises(ValueError, match="unsupported agg"):
        serve_from_rollup(roll, res, 0, 199, 100, agg="median")


def test_serve_from_rollup_anchor_alignment(spark):
    """ADVICE r5: serving an anchored rollup must re-bucket from the SAME
    anchor — with anchor=0 re-bucketing, an anchored w-bucket straddles two
    step buckets and the merged sums silently shift."""
    from pyspark.sql import functions as F

    from tachyon_spark.operators.multires import (
        multires_rollup,
        serve_from_rollup,
    )

    raw = spark.createDataFrame(
        [("a", t, float(t % 11)) for t in range(5, 205, 3)],
        "stream_id string, ts long, value double",
    )
    res = {"r10": 10}
    roll = multires_rollup(raw, res, anchor=5)
    served = {(r["key"], r["bucket"]): r["value"]
              for r in serve_from_rollup(
                  roll, res, 0, 210, 50, agg="sum", anchor=5).collect()}
    direct = {("a", b): v for b, v in raw.groupBy(
        (F.col("ts") - (F.col("ts") - 5) % 50).alias("b")).agg(
        F.sum("value").alias("v")).collect()}
    assert served == direct
    # anchored step buckets start at anchor + k*step, not k*step
    assert all(b % 50 == 5 for _, b in served)


def test_rollup_pre_anchor_data_floors(spark):
    """ADVICE r6: data BEFORE the anchor must floor onto the anchor+k*w
    grid (pmod), not round toward the anchor — Spark's % follows the
    dividend's sign, which would put ts=-3 with anchor=100, w=10 into
    bucket 100 - 0 = 100's negative twin at -0 instead of -10's grid."""
    from pyspark.sql import functions as F

    from tachyon_spark.operators.multires import (
        multires_rollup,
        serve_from_rollup,
    )

    # ts spans both sides of the anchor
    raw = spark.createDataFrame(
        [("a", t, 1.0) for t in range(3, 200, 7)],
        "stream_id string, ts long, value double",
    )
    res = {"r10": 10}
    anchor = 105
    roll = multires_rollup(raw, res, anchor=anchor)
    # every bucket sits on the anchor + k*w grid, pre-anchor included
    for r in roll.collect():
        assert (r["bucket"] - anchor) % 10 == 0
    per_ts = {
        r["ts"]: r["ts"] - ((r["ts"] - anchor) % 10 + 10) % 10
        for r in raw.collect()
    }
    got_buckets = sorted(r["bucket"] for r in roll.collect())
    assert got_buckets == sorted(set(per_ts.values()))
    # serving with the same anchor merges exactly onto the anchored grid
    served = {r["bucket"]: r["value"] for r in serve_from_rollup(
        roll, res, -1000, 1000, 50, agg="count", anchor=anchor).collect()}
    direct = {b: n for b, n in raw.groupBy(
        (F.col("ts") - F.pmod(F.col("ts") - anchor, F.lit(50))).alias("b")
    ).count().collect()}
    assert served == direct
    assert all((b - anchor) % 50 == 0 for b in served)
