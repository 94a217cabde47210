"""Autocorrelation (operators/acf.py): pinned against a direct Python
implementation of the product-moment estimator (unexpanded form — the
operator's algebraic expansion must agree to float tolerance), plus
structural checks: periodic series peak at the period, multi-group
independence, zero-variance and short-series edge handling."""

import pytest
from pyspark.sql import functions as F

from tachyon_spark.operators.acf import autocorrelation


def _acf(values, max_lag):
    n = len(values)
    m = sum(values) / n
    den = sum((v - m) ** 2 for v in values)
    out = {}
    for k in range(1, max_lag + 1):
        if k >= n or den == 0:
            continue
        num = sum(
            (values[t] - m) * (values[t + k] - m) for t in range(n - k)
        )
        out[k] = num / den
    return out


def test_matches_python_model(spark):
    values = [float((i * 7) % 13 + (i % 24)) for i in range(96)]
    df = spark.createDataFrame(
        list(enumerate(values)), "ts long, value double"
    )
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in autocorrelation(df, "ts", "value", 30).collect()
    }
    exp = _acf(values, 30)
    assert set(got) == set(exp)
    for k, e in exp.items():
        n_pairs, a = got[k]
        assert n_pairs == len(values) - k
        assert a == pytest.approx(e, abs=1e-9), k


def test_periodic_series_peaks_at_period(spark):
    period = 12
    values = [float(i % period) for i in range(10 * period)]
    df = spark.createDataFrame(
        list(enumerate(values)), "ts long, value double"
    )
    got = {
        r["lag"]: r["acf"]
        for r in autocorrelation(df, "ts", "value", period).collect()
    }
    assert got[period] == max(got.values())
    # non-circular estimator over a perfect sawtooth: (n - period)/n
    assert got[period] == pytest.approx(1 - period / (10 * period))


def test_groups_and_edges(spark):
    rows = (
        [("p", i, float(i % 4)) for i in range(20)]
        + [("flat", i, 5.0) for i in range(20)]  # zero variance -> dropped
        + [("short", 0, 1.0), ("short", 1, 2.0)]
    )
    df = spark.createDataFrame(rows, "g string, ts long, value double")
    out = autocorrelation(df, "ts", "value", 6, group_cols=["g"]).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], {})[r["lag"]] = r["acf"]
    assert "flat" not in by_g
    assert set(by_g["short"]) == {1}  # only lag 1 has overlap
    exp = _acf([float(i % 4) for i in range(20)], 6)
    for k, e in exp.items():
        assert by_g["p"][k] == pytest.approx(e, abs=1e-9)


def test_max_lag_validation(spark):
    df = spark.createDataFrame([(0, 1.0)], "ts long, value double")
    with pytest.raises(ValueError, match="max_lag"):
        autocorrelation(df, "ts", "value", 0)


# --- cross-correlation -------------------------------------------------------

def _ccf(xs, ys, max_lag):
    """Direct product-moment ccf(k) = corr(x_t, y_{t+k}) — unexpanded."""
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    import math

    den = math.sqrt(
        sum((v - mx) ** 2 for v in xs) * sum((v - my) ** 2 for v in ys)
    )
    out = {}
    for k in range(-max_lag, max_lag + 1):
        if abs(k) >= n or den == 0:
            continue
        if k >= 0:
            num = sum((xs[t] - mx) * (ys[t + k] - my) for t in range(n - k))
        else:
            num = sum(
                (xs[t] - mx) * (ys[t + k] - my) for t in range(-k, n)
            )
        out[k] = num / den
    return out


def test_ccf_matches_python_model_and_detects_lead(spark):
    from tachyon_spark.operators.acf import cross_correlation

    # y is x delayed by 3 rows (plus deterministic jitter): the ccf must
    # peak at lag +3 (x leads y), and every lag must match the model
    xs = [float((i * 5) % 17 + (i % 8)) for i in range(80)]
    ys = [0.0, 0.0, 0.0] + xs[:-3]
    ys = [v + (i % 2) for i, v in enumerate(ys)]
    xdf = spark.createDataFrame(list(enumerate(xs)), "ts long, value double")
    ydf = spark.createDataFrame(list(enumerate(ys)), "ts long, value double")
    got = {
        r["lag"]: (r["n_pairs"], r["ccf"])
        for r in cross_correlation(xdf, ydf, "ts", "value", 6).collect()
    }
    exp = _ccf(xs, ys, 6)
    assert set(got) == set(exp)
    for k, e in exp.items():
        n_pairs, c = got[k]
        assert n_pairs == len(xs) - abs(k), k
        assert c == pytest.approx(e, abs=1e-9), k
    assert max(exp, key=lambda k: got[k][1]) == 3
    # lag 0 is plain Pearson correlation
    assert got[0][1] == pytest.approx(exp[0], abs=1e-12)


def test_ccf_groups_align_on_ts(spark):
    from tachyon_spark.operators.acf import cross_correlation

    # group "a" has a missing ts in y — alignment drops it on both sides
    xr = [("a", i, float(i % 3)) for i in range(12)]
    yr = [("a", i, float((i + 1) % 3)) for i in range(12) if i != 5]
    xdf = spark.createDataFrame(xr, "g string, ts long, value double")
    ydf = spark.createDataFrame(yr, "g string, ts long, value double")
    out = cross_correlation(
        xdf, ydf, "ts", "value", 2, group_cols=["g"]
    ).collect()
    by_lag = {r["lag"]: r for r in out}
    assert by_lag[0]["n_pairs"] == 11  # aligned length, not len(x)
    xs = [float(i % 3) for i in range(12) if i != 5]
    ys = [float((i + 1) % 3) for i in range(12) if i != 5]
    exp = _ccf(xs, ys, 2)
    for k, e in exp.items():
        assert by_lag[k]["ccf"] == pytest.approx(e, abs=1e-9), k


def test_null_values_are_dropped_before_ranking(spark):
    # a NULL value must not occupy a rank slot (it would desync n from
    # the sums) — the series behaves as if the row were absent
    vals = [float((i * 3) % 7) for i in range(20)]
    with_null = [(i, v) for i, v in enumerate(vals)] + [(99, None)]
    df = spark.createDataFrame(with_null, "ts long, value double")
    clean = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "ts long, value double"
    )
    got = {r["lag"]: r["acf"]
           for r in autocorrelation(df, "ts", "value", 4).collect()}
    exp = {r["lag"]: r["acf"]
           for r in autocorrelation(clean, "ts", "value", 4).collect()}
    assert got == exp


def test_ungrouped_matches_grouped_constant(spark):
    # VERDICT r12 item 2: the ungrouped path routes through the
    # distributed global rank — results must be identical to a
    # constant-group run (which uses the plain window path)
    df = spark.createDataFrame(
        [(i, float((i * 5) % 11)) for i in range(500)],
        "ts long, value double",
    )
    ung = {r["lag"]: (r["n_pairs"], r["acf"])
           for r in autocorrelation(df, "ts", "value", 6).collect()}
    grp = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in autocorrelation(
            df.withColumn("g", F.lit(1)), "ts", "value", 6,
            group_cols=["g"],
        ).collect()
    }
    assert ung == grp


def test_ungrouped_plan_has_no_data_sized_one_task_sort(spark):
    # the only SinglePartition exchanges allowed are the offsets frame
    # (one row per shuffle partition) and the 1-row scalars broadcast;
    # the series itself must go through a range partition
    df = spark.range(0, 10000).select(
        F.col("id").alias("ts"),
        (F.col("id") % 17).cast("double").alias("value"),
    )
    out = autocorrelation(df, "ts", "value", 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the series shuffles by the deterministic value bucket, and every
    # rank window partitions by it — the data is never sorted in one
    # task
    assert "hashpartitioning(__pid" in plan
    ranks = [ln for ln in plan.splitlines() if "row_number()" in ln]
    assert ranks and all("__pid" in ln for ln in ranks), plan
    # every SinglePartition exchange must feed from a bounded frame:
    # either a scalar aggregate (keys=[] — min/max stats, per-series
    # scalars: 1 row) or the bucket-count offsets (keys=[__pid] —
    # config-sized). A data-sized single-partition exchange would have
    # neither shape below it.
    import re

    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        below = "\n".join(lines[i + 1:i + 4])
        assert re.search(
            r"HashAggregate\(keys=\[(\]|__pid)", below
        ), f"unbounded single-partition exchange:\n{ln}\n{below}"


def test_column_name_collisions_raise(spark):
    from tachyon_spark.operators.acf import cross_correlation

    df = spark.createDataFrame(
        [("x", 0, 1.0)], "lag string, ts long, value double"
    )
    with pytest.raises(ValueError, match="collide"):
        autocorrelation(df, "ts", "value", 2, group_cols=["lag"])
    df2 = spark.createDataFrame([(0, 1.0)], "__rn long, value double")
    with pytest.raises(ValueError, match="collide"):
        autocorrelation(df2, "__rn", "value", 2)
    with pytest.raises(ValueError, match="collide"):
        cross_correlation(df, df, "ts", "value", 2, group_cols=["lag"])


def _py_pacf(rho, max_lag):
    # Durbin-Levinson truth model (rho: dict lag -> acf)
    phi, out = {}, {}
    for k in range(1, max_lag + 1):
        if k not in rho:
            break
        if k == 1:
            pkk = rho[1]
        else:
            num = rho[k] - sum(phi[j] * rho[k - j] for j in range(1, k))
            den = 1.0 - sum(phi[j] * rho[j] for j in range(1, k))
            if den == 0.0:
                break
            pkk = num / den
        phi = {j: phi[j] - pkk * phi[k - j] for j in range(1, k)}
        phi[k] = pkk
        out[k] = pkk
    return out


def test_pacf_matches_durbin_levinson_model(spark):
    from tachyon_spark.operators.acf import partial_autocorrelation

    vals = [float((i * 5 + (i * i) % 7) % 11) for i in range(120)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "ts long, value double"
    )
    rho = {r["lag"]: r["acf"]
           for r in autocorrelation(df, "ts", "value", 8).collect()}
    exp = _py_pacf(rho, 8)
    got = {r["lag"]: r["pacf"]
           for r in partial_autocorrelation(
               df, "ts", "value", 8).collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-12), k


def test_pacf_ar1_cuts_off_after_lag1(spark):
    from tachyon_spark.operators.acf import partial_autocorrelation

    # deterministic AR(1) series: y_t = 0.7*y_{t-1} + seeded white noise
    import random

    rng = random.Random(42)
    y, vals = 0.0, []
    for _ in range(400):
        y = 0.7 * y + rng.uniform(-0.5, 0.5)
        vals.append(y)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "ts long, value double"
    )
    got = {r["lag"]: r["pacf"]
           for r in partial_autocorrelation(
               df, "ts", "value", 5).collect()}
    assert got[1] > 0.5  # strong AR(1) signal
    for k in (2, 3, 4, 5):  # the AR-order cutoff property
        assert abs(got[k]) < 0.2, (k, got[k])


def test_pacf_grouped_runs_per_series(spark):
    from tachyon_spark.operators.acf import partial_autocorrelation

    rows = [("a", i, float(i % 4)) for i in range(40)] + [
        ("b", i, float((i * 3) % 7)) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, ts long, value double")
    out = partial_autocorrelation(
        df, "ts", "value", 3, group_cols=["g"]
    ).collect()
    per_g = {}
    for r in out:
        per_g.setdefault(r["g"], {})[r["lag"]] = r["pacf"]
    for gname in ("a", "b"):
        rho = {
            r["lag"]: r["acf"]
            for r in autocorrelation(
                df.where(F.col("g") == gname), "ts", "value", 3
            ).collect()
        }
        exp = _py_pacf(rho, 3)
        assert per_g[gname] == pytest.approx(exp, abs=1e-12), gname


def test_pacf_group_named_pacf_raises(spark):
    from tachyon_spark.operators.acf import partial_autocorrelation

    df = spark.createDataFrame(
        [("x", 0, 1.0)], "pacf string, ts long, value double"
    )
    with pytest.raises(ValueError, match="collide"):
        partial_autocorrelation(df, "ts", "value", 2, group_cols=["pacf"])


def test_global_rank_quantile_buckets_balance_skew(spark):
    """r15 (VERDICT r14 item 6): quantile-sampled cut points keep the
    rank buckets balanced on a pathological ts distribution — 10k rows
    clustered in [0, 10k) plus one outlier at 10^12 used to land ~all
    rows in ONE equal-width bucket; GK cuts bound every bucket near
    rows/nbuckets. Rank correctness is re-pinned alongside."""
    from tachyon_spark.operators.acf import _global_rank

    spark.conf.set("spark.sql.shuffle.partitions", "32")
    df = spark.range(10_000).select(F.col("id").alias("ts")).union(
        spark.range(1).select(
            (F.col("id") + 1_000_000_000_000).alias("ts")
        )
    )
    ranked = _global_rank(df, "ts", keep_pid=True)
    # correctness: rank == ts order
    rows = ranked.orderBy("__rn").select("ts", "__rn").collect()
    assert [r["__rn"] for r in rows] == list(range(1, 10_002))
    assert [r["ts"] for r in rows] == sorted(r["ts"] for r in rows)
    # balance: the largest bucket holds ~1/32 of the rows, not ~all
    sizes = [
        r.n
        for r in ranked.groupBy("__pid").agg(
            F.count("*").alias("n")
        ).collect()
    ]
    assert max(sizes) < 10_001 * 0.15, sizes  # equal-width would be ~1.0
