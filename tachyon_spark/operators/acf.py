"""Autocorrelation function (ACF) over regular series — the classic
seasonality/lag-structure diagnostic every TS analytics layer ships
(statsmodels acf, Timescale toolkit): for each lag k, the correlation of
the series with itself shifted by k rows.

Estimator: the standard non-circular product-moment form

    r_k = sum_{t<=n-k} (y_t - m)(y_{t+k} - m) / sum_t (y_t - m)^2

with m the series mean — but ALGEBRAICALLY EXPANDED so no intermediate
ever rounds: with integer-valued inputs, A_k = sum y_t*y_{t+k},
B_k = sum_{t<=n-k} y_t, C_k = sum_{t>k} y_t, S = sum y, Q = sum y^2 are
all exact in doubles, and

    r_k = (n^2*A_k - n*S*(B_k + C_k) + (n-k)*S^2) / (n^2*Q - n*S^2)

is ONE division of two exactly-representable products-of-integers (safe
while the scaled terms stay under 2^53 — n^2*Q for a 10k-row series of
1e4-scale values is ~1e16, inside the window; document inputs
accordingly). Any IEEE-754 engine computes the identical double — the
property the DuckDB hash gate exploits (same construction as
operators/seasonal.py).

Scale shape: one row_number window per series (partitioned by
group_cols), one explode by max_lag, one hash equi-join on
(group, rn + lag) = (group, rn) — linear-in-data x max_lag rows through
a single keyed shuffle — then a grouped agg per (group, lag) and a
broadcast join of the per-group scalars. No self-crossjoin, no
collect. UNGROUPED inputs do NOT fall back to a one-task global sort
(VERDICT r12 item 2): the global rank comes from a deterministic
value-bucket partition + per-bucket local row_number + broadcast-joined
cumulative offsets — the only single-partition exchanges are 1-row
stats/scalar aggregates and the offsets frame, one row per bucket
(config-sized, never data-sized).

Reference parity: the reference engine has no correlation surface; this
extends the beyond-reference analytics set (SURVEY.md), next to
seasonal_decompose and holt_winters.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "autocorrelation",
    "cross_correlation",
    "partial_autocorrelation",
]


def _check_names(ts_col, group_cols, out_cols):
    # fixed output names + __-prefixed internals must not be shadowed by
    # input keys (ADVICE r12: a group column literally named 'lag' or
    # '__y' would silently collide)
    clash = sorted(
        c for c in {ts_col, *group_cols}
        if c in out_cols or c.startswith("__")
    )
    if clash:
        raise ValueError(
            f"ts_col/group_cols collide with output/internal names: "
            f"{clash} — rename the input columns"
        )


def _global_rank(
    df: DataFrame, ts_col: str, keep_pid: bool = False
) -> DataFrame:
    """Distributed global row_number over `ts_col` (1-based, ascending,
    numeric ts), as column `__rn` — WITHOUT the one-task global sort an
    empty window partition list would produce (VERDICT r12 item 2; same
    motivation as interpolate.py's bucket + carry-in).

    Bucket by VALUE (equal-width over [min, max], floor of an affine
    map — monotone in ts), take a per-bucket local row_number, then add
    each bucket's cumulative predecessor count via a broadcast join.
    The offsets frame is one row per bucket — its single-partition
    window is config-sized (spark.sql.shuffle.partitions), never
    data-sized. Fully lazy: no driver collect.

    Why value buckets and not repartitionByRange + spark_partition_id
    (r13 review finding): the window branch and the offsets branch must
    observe the SAME partition assignment, and exchange reuse /
    identical AQE coalescing across two readers of one shuffle is an
    optimizer behavior, not a guarantee (RangePartitioner even seeds
    its boundary sample by RDD id, so two *recomputed* exchanges may
    not agree). The cut points here are computed ONCE (one bounded
    approxQuantile pass — a nbuckets-sized result, never data-sized)
    and embedded as LITERALS, so every branch computes the identical
    assignment even with reuse disabled.

    r15 (VERDICT r14 item 6): the boundaries are QUANTILE-sampled, not
    equal-width over [min, max] — equal-width balanced perfectly on
    regular time grids but skewed badly on pathological ts
    distributions (one dense cluster + one outlier put ~all rows in one
    bucket: a parallelism cliff). Greenwald-Khanna quantile cuts bound
    every bucket at ~(1/nbuckets ± eps) of the rows regardless of the
    distribution; rows tied on a single heavy ts value still co-locate
    (a global rank cannot split equal keys). Assignment is a JVM binary
    search (ml.feature.Bucketizer) per row, monotone in ts. A
    single-distinct-ts input degenerates to one bucket (not a series).
    """
    try:
        nbuckets = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    except ValueError:  # e.g. "auto" under some AQE deployments
        nbuckets = 200
    # a NULL ts is not a series point: a null bucket expression would
    # dump the row in one bucket while the in-bucket sort puts it
    # first — silent rank corruption (r13 review)
    df = df.where(F.col(ts_col).isNotNull())
    probs = [i / nbuckets for i in range(1, nbuckets)]
    cuts = df.select(
        F.col(ts_col).cast("double").alias("__t")
    ).stat.approxQuantile("__t", probs, 0.25 / nbuckets)
    splits = sorted(set(cuts))
    if splits:
        from pyspark.ml.feature import Bucketizer

        buck = Bucketizer(
            splits=[float("-inf")] + splits + [float("inf")],
            inputCol="__tq",
            outputCol="__pid_d",
        )
        part = (
            buck.transform(
                df.withColumn("__tq", F.col(ts_col).cast("double"))
            )
            .withColumn("__pid", F.col("__pid_d").cast("int"))
            .drop("__tq", "__pid_d")
        )
    else:  # empty input or a single distinct ts
        part = df.withColumn("__pid", F.lit(0))
    wloc = Window.partitionBy("__pid").orderBy(ts_col)
    local = part.withColumn("__lrn", F.row_number().over(wloc))
    woff = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        part.groupBy("__pid")
        .agg(F.count("*").alias("__cnt"))
        .select(
            "__pid",
            F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off"),
        )
    )
    out = (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn("__rn", (F.col("__lrn") + F.col("__off")).cast("int"))
        .drop("__lrn", "__off")
    )
    # __pid is internal; keep_pid exists so the balance tripwire test
    # can observe the bucket sizes without re-deriving the cut points
    return out if keep_pid else out.drop("__pid")


def autocorrelation(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    max_lag: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group ACF for lags 1..max_lag. Expects one row per
    (group, ts) on a regular grid; returns (group_cols..., lag, n_pairs,
    acf) where n_pairs = n - lag is the overlap count (rows with
    n_pairs <= 0 are omitted, as is a zero-variance denominator)."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    g = list(group_cols)
    _check_names(ts_col, g, {"lag", "n_pairs", "acf"})
    y = F.col(value_col).cast("double")
    # NULL values would desync n from the sums (row_number counts the
    # row, sum skips it) — drop them before ranking
    if g:
        w = Window.partitionBy(*[F.col(c) for c in g]).orderBy(ts_col)
        base = df.where(
            y.isNotNull() & F.col(ts_col).isNotNull()
        ).select(
            *g, y.alias("__y"), (F.row_number().over(w)).alias("__rn")
        )
    else:
        # ungrouped: distributed global rank, not a one-task sort
        base = _global_rank(
            df.where(y.isNotNull()).select(ts_col, y.alias("__y")),
            ts_col,
        ).select("__y", "__rn")

    scalars = base.groupBy(*g).agg(
        F.count("__y").alias("__n"),
        F.sum("__y").alias("__s"),
        F.sum(F.col("__y") * F.col("__y")).alias("__q"),
    )

    lags = base.select(
        *g,
        "__y",
        "__rn",
        F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag"),
    )
    right = base.select(
        *[F.col(c).alias(f"__r_{c}") for c in g],
        F.col("__y").alias("__y2"),
        F.col("__rn").alias("__rn2"),
    )
    cond = [lags[c] == right[f"__r_{c}"] for c in g] + [
        (lags["__rn"] + lags["lag"]) == right["__rn2"]
    ]
    pairs = lags.join(right, cond).select(
        *g, "lag", "__y", "__y2"
    )
    per_lag = pairs.groupBy(*g, "lag").agg(
        F.sum(F.col("__y") * F.col("__y2")).alias("__a"),
        F.sum("__y").alias("__b"),
        F.sum("__y2").alias("__c"),
        F.count("__y").alias("n_pairs"),
    )
    n, s, q = F.col("__n"), F.col("__s"), F.col("__q")
    num = (
        n * n * F.col("__a")
        - n * s * (F.col("__b") + F.col("__c"))
        + (n - F.col("lag")) * s * s
    )
    den = n * n * q - n * s * s
    return (
        per_lag.join(F.broadcast(scalars), g if g else None)
        if g
        else per_lag.crossJoin(F.broadcast(scalars))
    ).where(den != 0).select(
        *g,
        "lag",
        "n_pairs",
        (num / den).alias("acf"),
    )


def cross_correlation(
    x: DataFrame,
    y: DataFrame,
    ts_col: str,
    value_col: str,
    max_lag: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group cross-correlation ccf(k) = corr(x_t, y_{t+k}) for
    k in -max_lag..+max_lag — the lead/lag diagnostic between two
    series (does x lead y?); lag 0 is the plain Pearson correlation.

    The two frames align by an inner join on (group, ts) first (both
    must be regular on a shared grid), then lags are ROW shifts within
    the aligned sequence. Same exactness construction as
    `autocorrelation`: with the overlap sums A_k = sum x_t*y_{t+k},
    B_k = sum x_t, C_k = sum y_{t+k} and full-series S/Q sums,

        ccf_k = (n^2*A_k - n*Sx*C_k - n*Sy*B_k + (n-|k|)*Sx*Sy)
                / (n * sqrt((n*Qx - Sx^2) * (n*Qy - Sy^2)))

    — every aggregate an order-independent integer sum (integer-valued
    inputs), every composition a fixed association order, sqrt correctly
    rounded: any IEEE-754 engine computes the identical double even
    where an intermediate product rounds. Returns (group_cols..., lag,
    n_pairs, ccf); zero-variance sides are omitted.

    Scale shape mirrors autocorrelation: one aligned join, one
    row_number window per group, one equi-join on (group, rn + lag) —
    rows x (2*max_lag + 1) through keyed shuffles, never all-pairs."""
    if max_lag < 0:
        raise ValueError(f"max_lag must be >= 0, got {max_lag}")
    g = list(group_cols)
    _check_names(ts_col, g, {"lag", "n_pairs", "ccf"})
    aligned = (
        x.select(*g, ts_col, F.col(value_col).cast("double").alias("__x"))
        .join(
            y.select(
                *g, ts_col, F.col(value_col).cast("double").alias("__y")
            ),
            [*g, ts_col],
        )
    )
    # same NULL discipline as autocorrelation: a NULL on either side
    # would desync n from the sums
    clean = aligned.where(
        F.col("__x").isNotNull()
        & F.col("__y").isNotNull()
        & F.col(ts_col).isNotNull()
    )
    if g:
        w = Window.partitionBy(*[F.col(c) for c in g]).orderBy(ts_col)
        base = clean.select(
            *g, "__x", "__y", F.row_number().over(w).alias("__rn")
        )
    else:
        # ungrouped: distributed global rank, not a one-task sort
        base = _global_rank(
            clean.select(ts_col, "__x", "__y"), ts_col
        ).select("__x", "__y", "__rn")
    scalars = base.groupBy(*g).agg(
        F.count("__x").alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__qx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__qy"),
    )
    lags = base.select(
        *g,
        F.col("__x").alias("__x1"),
        "__rn",
        F.explode(
            F.sequence(F.lit(-max_lag), F.lit(max_lag))
        ).alias("lag"),
    )
    right = base.select(
        *[F.col(c).alias(f"__r_{c}") for c in g],
        F.col("__y").alias("__y2"),
        F.col("__rn").alias("__rn2"),
    )
    cond = [lags[c] == right[f"__r_{c}"] for c in g] + [
        (lags["__rn"] + lags["lag"]) == right["__rn2"]
    ]
    per_lag = (
        lags.join(right, cond)
        .groupBy(*g, "lag")
        .agg(
            F.sum(F.col("__x1") * F.col("__y2")).alias("__a"),
            F.sum("__x1").alias("__b"),
            F.sum("__y2").alias("__c"),
            F.count("__x1").alias("n_pairs"),
        )
    )
    n = F.col("__n")
    sx, sy, qx, qy = (F.col(c) for c in ("__sx", "__sy", "__qx", "__qy"))
    num = (
        n * n * F.col("__a")
        - n * sx * F.col("__c")
        - n * sy * F.col("__b")
        + (n - F.abs(F.col("lag"))) * sx * sy
    )
    den = n * F.sqrt((n * qx - sx * sx) * (n * qy - sy * sy))
    joined = (
        per_lag.join(F.broadcast(scalars), g)
        if g
        else per_lag.crossJoin(F.broadcast(scalars))
    )
    return joined.where(
        ((n * qx - sx * sx) != 0) & ((n * qy - sy * sy) != 0)
    ).select(*g, "lag", "n_pairs", (num / den).alias("ccf"))


def partial_autocorrelation(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    max_lag: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group PACF for lags 1..max_lag via the Durbin-Levinson
    recursion over the ACF (the standard AR-order diagnostic: PACF cuts
    off after lag p for an AR(p) process, where the ACF only decays).
    Returns (group_cols..., lag, pacf); lags whose ACF is unavailable
    (n_pairs <= 0 or zero variance) are omitted, and the recursion stops
    at the first gap so every reported value is well-defined.

    Scale shape: the heavy lifting is `autocorrelation` (distributed —
    keyed windows/joins, see module docstring); the recursion itself
    runs per group over AT MOST max_lag rows inside ONE Arrow-batched
    applyInPandas (sequential by construction — each phi_{k,k} depends
    on all previous levels — so a per-group kernel over a
    max_lag-bounded frame is the correct distribution: millions of
    series parallelize across groups, never within one).
    """
    import pandas as pd

    # autocorrelation's guard covers lag/n_pairs/acf; this operator also
    # emits 'pacf' (a group column named 'pacf' would be overwritten by
    # the recursion's output dict — r13 review finding)
    _check_names(ts_col, list(group_cols), {"lag", "n_pairs", "acf", "pacf"})
    acf_df = autocorrelation(df, ts_col, value_col, max_lag, group_cols)
    g = list(group_cols)
    if not g:
        acf_df = acf_df.withColumn("__g", F.lit(1))
        g = ["__g"]

    out_fields = ", ".join(
        f"`{c}` {t}"
        for c, t in zip(
            g, (dict(acf_df.dtypes)[c] for c in g)
        )
    )
    schema = f"{out_fields}, lag int, pacf double"

    def _durbin_levinson(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("lag")
        keys = {c: pdf.iloc[0][c] for c in g}
        rho = {int(r.lag): float(r.acf) for r in pdf.itertuples()}
        out_lag, out_pacf = [], []
        phi: dict[int, float] = {}
        for k in range(1, max_lag + 1):
            if k not in rho:
                break  # first gap ends the recursion
            if k == 1:
                pkk = rho[1]
            else:
                num = rho[k] - sum(
                    phi[j] * rho[k - j] for j in range(1, k)
                )
                den = 1.0 - sum(phi[j] * rho[j] for j in range(1, k))
                if den == 0.0:
                    break
                pkk = num / den
            new_phi = {
                j: phi[j] - pkk * phi[k - j] for j in range(1, k)
            }
            new_phi[k] = pkk
            phi = new_phi
            out_lag.append(k)
            out_pacf.append(pkk)
        data = {c: [keys[c]] * len(out_lag) for c in g}
        data["lag"] = out_lag
        data["pacf"] = out_pacf
        return pd.DataFrame(data)

    out = acf_df.groupBy(*g).applyInPandas(_durbin_levinson, schema)
    if group_cols:
        return out
    return out.drop("__g")
