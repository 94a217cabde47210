"""Classical seasonal decomposition (additive moving-average method) —
the `seasonal_decompose` every TSDB analytics layer ships (Timescale's
toolkit, statsmodels' seasonal_decompose): split a regular series into
trend + seasonal + remainder.

Method (the textbook one, chosen because every step replays EXACTLY in
ANSI SQL, so the driver's DuckDB oracle can hash-gate it):

- trend: centered moving average over one period. For even periods the
  standard 2xM MA — the average of the two M-wide windows offset by one
  ([-M/2, M/2-1] and [-M/2+1, M/2]) — computed as (sum1 + sum2) / (2*M).
  NULL where either window is not fully populated (series edges).
- seasonal: the per-phase mean of the detrended series (phase = index
  mod period), computed over rows where trend exists. UNCENTERED — the
  seasonal component carries its own level instead of subtracting the
  grand mean (documented divergence from statsmodels, which centers;
  centering subtracts an order-of-summation-dependent float that would
  poison exact cross-engine comparison for zero analytical gain here).
- remainder: value - trend - seasonal (NULL at the edges with trend).

Exactness: with integer-valued inputs every sum above is exact in
doubles (< 2^53), group-sum order cannot perturb it, and each component
is ONE division of identical exact operands — so Spark and any other
IEEE-754 engine produce bit-identical doubles. Float inputs are fine
too; only the cross-engine bit-exactness guarantee needs integers.

Scale shape: two window sums over (group, ts) — one shuffle to
partition by group (bounded state per partition, no unbounded window:
frames are ROWS BETWEEN +-period), one grouped agg for the seasonal
means (period-sized — tiny), one broadcast-sized join back. Works on
any number of series in one pass via `group_cols`.

Reference parity: the reference engine has no decomposition surface;
this extends the analytics set (SURVEY.md beyond-reference operators),
same family as operators/downsample.py (lttb/m4) and holt_winters.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["seasonal_decompose", "seasonal_strength"]


def seasonal_decompose(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period: int,
    group_cols: Sequence[str] = (),
    robust: bool = False,
) -> DataFrame:
    """Decompose a regular series into (trend, seasonal, remainder).

    Expects one row per (group, ts) on a regular grid (use the rollup /
    downsample operators to regularize first); `period` is the season
    length in ROWS (24 for hourly data with daily seasonality). Returns
    the input keys plus value, phase, trend, seasonal, remainder; trend
    and remainder are NULL within period/2 rows of each series edge.

    `robust=True` replaces the per-phase MEAN of the detrended series
    with the per-phase MEDIAN (STL-style outlier resistance for the
    seasonal component: one spiked observation no longer drags its
    whole phase). The trend stays the centered MA — the textbook robust
    variant (full STL re-weights the trend with LOESS, which has no
    exact SQL replay; documented divergence). Still exact cross-engine
    on integer-valued inputs: the median of an odd count is an element,
    of an even count one addition + one division of exact operands —
    Spark's `median` and DuckDB's `median` agree bit-for-bit there.

    Partitioning: the window partitions by `group_cols` — decomposition
    of MANY series in one pass is the scale shape. With no groups the
    single series sorts in one task, which is fine exactly because one
    regular series is grid-sized by construction (regularize/downsample
    first; a 10-year hourly series is 87k rows).
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    # fixed output names + internals must not be shadowed by input keys
    # (a group column literally named 'value' would silently collide —
    # ADVICE r12); value_col itself is fine, it BECOMES 'value'
    reserved = {"value", "phase", "trend", "seasonal", "remainder"}
    # any __-prefixed input collides with internals here and in
    # compositions (seasonal_strength's __vr/__vd) — reject the prefix
    # wholesale, same policy as acf._check_names (r13 review finding)
    clash = sorted(
        c for c in {ts_col, *group_cols}
        if c in reserved or c.startswith("__")
    )
    if clash:
        raise ValueError(
            f"ts_col/group_cols collide with output/internal names: "
            f"{clash} — rename the input columns"
        )
    g = [F.col(c) for c in group_cols]
    w = Window.partitionBy(*g).orderBy(ts_col)
    half = period // 2
    y = F.col(value_col).cast("double")

    # The trend numerator (a window sum of inputs, scaled by the window
    # count) is kept as a SCALED column so the seasonal means can sum it
    # exactly: with integer-valued inputs `den*y - num` is integer-valued,
    # its group sum is order-independent in doubles, and each output
    # component is one division of exact operands — bit-identical in any
    # IEEE-754 engine regardless of summation order.
    if period % 2 == 0:
        # 2xM centered MA: average of the two M-windows straddling center
        w1 = w.rowsBetween(-half, half - 1)
        w2 = w.rowsBetween(-half + 1, half)
        full = (F.count(y).over(w1) == period) & (
            F.count(y).over(w2) == period
        )
        num = F.when(full, F.sum(y).over(w1) + F.sum(y).over(w2))
        den = 2 * period
    else:
        wc = w.rowsBetween(-half, half)
        num = F.when(F.count(y).over(wc) == period, F.sum(y).over(wc))
        den = period

    # phase from the row's rank within its series, so irregular ts units
    # (us, ms, datetime) all work; the grid regularity contract makes
    # rank mod period == time-of-season
    phase = (F.row_number().over(w) - 1) % period
    base = df.select(
        *group_cols,
        F.col(ts_col).alias(ts_col),
        y.alias("value"),
        phase.alias("phase"),
        num.alias("__num"),
    )
    # detrended, scaled by den: integer-valued whenever the input is
    detr = base.withColumn(
        "__detr_num", F.col("value") * F.lit(float(den)) - F.col("__num")
    )
    # per-phase center of the detrended series: mean (classical) or
    # median (robust) — both one division of exact operands on
    # integer-valued inputs (median of an even count adds one exact
    # addition), so both replay bit-identically cross-engine
    if robust:
        center = F.median("__detr_num") / F.lit(float(den))
    else:
        center = F.sum("__detr_num") / (
            F.count("__detr_num") * F.lit(float(den))
        )
    seas = (
        detr.where(F.col("__num").isNotNull())
        .groupBy(*group_cols, "phase")
        .agg(center.alias("seasonal"))
    )
    trend = F.col("__num") / F.lit(float(den))
    out = detr.join(seas, [*group_cols, "phase"], "left").select(
        *group_cols,
        ts_col,
        "value",
        "phase",
        trend.alias("trend"),
        "seasonal",
        (F.col("value") - trend - F.col("seasonal")).alias("remainder"),
    )
    return out


def seasonal_strength(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period: int,
    group_cols: Sequence[str] = (),
    robust: bool = False,
) -> DataFrame:
    """Per-series seasonality strength (Hyndman & Athanasopoulos, FPP3
    §4.3, computed from the classical decomposition instead of STL):

        F_s = max(0, 1 - Var(remainder) / Var(seasonal + remainder))

    ~0 for series with no stable seasonal pattern, ->1 when the seasonal
    component explains the detrended variance. The scan-series triage
    metric: rank a million metrics by F_s to find the ones worth a
    seasonal model. Returns (group_cols..., n, strength); series whose
    detrended variance is zero (constant after the MA trend) are
    reported with NULL strength rather than dropped.

    One pass over `seasonal_decompose` (same shuffles — the variance
    aggregate rides the existing (group, phase) join output), then one
    grouped aggregate per series. Population variance on both terms, so
    the ratio is scale-free and n cancels.
    """
    clash = sorted({ts_col, *group_cols} & {"n", "strength"})
    if clash:
        raise ValueError(
            f"ts_col/group_cols collide with output names: {clash} — "
            "rename the input columns"
        )
    dec = seasonal_decompose(
        df, ts_col, value_col, period, group_cols, robust=robust
    )
    g = list(group_cols)
    ok = dec.where(F.col("remainder").isNotNull())
    detr = F.col("seasonal") + F.col("remainder")
    agg = ok.groupBy(*g).agg(
        F.count("*").alias("n"),
        F.var_pop("remainder").alias("__vr"),
        F.var_pop(detr).alias("__vd"),
    )
    strength = F.when(
        F.col("__vd") > 0,
        F.greatest(
            F.lit(0.0), F.lit(1.0) - F.col("__vr") / F.col("__vd")
        ),
    )
    return agg.select(*g, "n", strength.alias("strength"))
