"""Display-oriented downsampling and windowed anomaly detection.

M4 downsampling (Jugel et al., "M4: A Visualization-Oriented Time Series
Data Aggregation", VLDB 2014): for line-chart rendering at w pixels, the
only samples that can affect the drawn pixels are each pixel-column
bucket's first/last/min/max — so emitting those four per (series, bucket)
is error-free for the rendered image while shrinking the scan result to
O(4w) rows per series. Unlike LTTB (whose pick depends sequentially on the
previous pick), M4 is four plain mergeable aggregates: map-side partials,
one (series, bucket) shuffle, embarrassingly parallel — the right
downsampler for a 100 TB store feeding dashboards.

Anomaly flags: classic robust z-score per (series, window) — a sample is
anomalous when |x - mean| > nsigma * stddev_pop of its window (or, robust
form, |x - median| > nsigma * 1.4826 * MAD). Aggregate-then-join-back: two
keyed shuffles, no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def m4_downsample(
    df: DataFrame,
    bucket_width: int,
    key_col: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
    anchor: int = 0,
) -> DataFrame:
    """M4: per (series, bucket of `bucket_width` ts units) emit the
    first, last, min and max samples (as (ts, value) points, deduplicated
    — one sample can hold several roles). Returns
    (key, bucket, ts, value, roles) with roles an array like
    ['first','min'] sorted for determinism."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    b = (
        (F.col(ts_col) - F.lit(anchor))
        - (F.col(ts_col) - F.lit(anchor)) % F.lit(bucket_width)
        + F.lit(anchor)
    )
    pt = F.struct(F.col(ts_col).alias("ts"), F.col(value_col).alias("value"))
    agg = df.groupBy(F.col(key_col).alias("key"), b.alias("bucket")).agg(
        F.min_by(pt, F.struct(ts_col, value_col)).alias("p_first"),
        F.max_by(pt, F.struct(ts_col, value_col)).alias("p_last"),
        # value ties: earliest ts wins for min, latest for max (struct order)
        F.min_by(pt, F.struct(value_col, ts_col)).alias("p_min"),
        F.max_by(pt, F.struct(value_col, ts_col)).alias("p_max"),
    )
    roles = F.array(
        F.struct(F.lit("first").alias("role"), F.col("p_first").alias("p")),
        F.struct(F.lit("last").alias("role"), F.col("p_last").alias("p")),
        F.struct(F.lit("min").alias("role"), F.col("p_min").alias("p")),
        F.struct(F.lit("max").alias("role"), F.col("p_max").alias("p")),
    )
    exploded = agg.select(
        "key", "bucket", F.explode(roles).alias("rp")
    ).select(
        "key", "bucket",
        F.col("rp.p.ts").alias("ts"),
        F.col("rp.p.value").alias("value"),
        F.col("rp.role").alias("role"),
    )
    return exploded.groupBy("key", "bucket", "ts", "value").agg(
        F.sort_array(F.collect_list("role")).alias("roles")
    )


def anomaly_flags(
    df: DataFrame,
    window_width: int,
    nsigma: float = 3.0,
    robust: bool = False,
    key_col: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
    anchor: int = 0,
) -> DataFrame:
    """Flag samples deviating > nsigma dispersions from their (series,
    tumbling window) center. Default: |x - mean| > nsigma * stddev_pop.
    robust=True uses median/MAD (x sigma-consistency 1.4826) — immune to
    the anomaly inflating its own threshold. Returns every sample with
    (key, ts, value, center, spread, is_anomaly)."""
    if window_width <= 0:
        raise ValueError("window_width must be positive")
    b = (
        (F.col(ts_col) - F.lit(anchor))
        - (F.col(ts_col) - F.lit(anchor)) % F.lit(window_width)
        + F.lit(anchor)
    )
    v = F.col(value_col).cast("double")
    base = df.select(
        F.col(key_col).alias("key"), F.col(ts_col).alias("ts"),
        v.alias("value"), b.alias("__w"),
    )
    if robust:
        med = base.groupBy("key", "__w").agg(
            F.percentile("value", F.lit(0.5)).alias("center")
        )
        dev = base.join(med, ["key", "__w"]).select(
            "key", "__w",
            F.abs(F.col("value") - F.col("center")).alias("__d"),
        )
        mad = dev.groupBy("key", "__w").agg(
            (F.percentile("__d", F.lit(0.5)) * F.lit(1.4826)).alias("spread")
        )
        stats = med.join(mad, ["key", "__w"])
    else:
        stats = base.groupBy("key", "__w").agg(
            F.avg("value").alias("center"),
            F.stddev_pop("value").alias("spread"),
        )
    return (
        base.join(stats, ["key", "__w"])
        .select(
            "key", "ts", "value", "center", "spread",
            (F.abs(F.col("value") - F.col("center"))
             > F.lit(nsigma) * F.col("spread")).alias("is_anomaly"),
        )
    )


def cusum_drift(
    df: DataFrame,
    window_width: int,
    k: float = 0.5,
    h: float = 4.0,
    key_col: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
    anchor: int = 0,
) -> DataFrame:
    """One-sided CUSUM drift detection per (series, tumbling window): the
    classic change-point statistic s_i = max(0, s_{i-1} + z_i - k) over
    the window's standardized samples z_i = (x_i - mean) / stddev (window
    mean/stddev_pop — the self-referenced baseline form), alarming when
    the running sum ever exceeds h. Complements anomaly_flags: a CUSUM
    catches small SUSTAINED shifts that never individually cross an
    nsigma threshold.

    The max(0, ...) clamp breaks the affine-composition trick EWMA uses,
    so each (series, window) folds its own sorted sample list in one
    task — the same bounded-window contract as holt_winters; windows
    distribute per (series, window) key. Constant windows (stddev 0)
    report s_max = 0 / no alarm. Returns (key, window, n, s_max,
    alarmed)."""
    if window_width <= 0:
        raise ValueError("window_width must be positive")
    b = (
        (F.col(ts_col) - F.lit(anchor))
        - (F.col(ts_col) - F.lit(anchor)) % F.lit(window_width)
        + F.lit(anchor)
    )
    v = F.col(value_col).cast("double")
    base = df.select(
        F.col(key_col).alias("key"), F.col(ts_col).alias("ts"),
        v.alias("value"), b.alias("__w"),
    )
    pairs = F.sort_array(F.collect_list(F.struct("ts", "value")))
    vals = F.transform(pairs, lambda p: p["value"])
    agg = base.groupBy("key", F.col("__w").alias("window")).agg(
        vals.alias("__vs"),
        F.avg("value").alias("__mu"),
        F.stddev_pop("value").alias("__sd"),
    )
    zero = F.struct(F.lit(0.0).alias("s"), F.lit(0.0).alias("m"))
    step = lambda acc, x: F.struct(
        F.greatest(
            F.lit(0.0),
            acc["s"] + (x - F.col("__mu")) / F.col("__sd") - F.lit(k),
        ).alias("s"),
        F.greatest(
            acc["m"],
            F.greatest(
                F.lit(0.0),
                acc["s"] + (x - F.col("__mu")) / F.col("__sd") - F.lit(k),
            ),
        ).alias("m"),
    )
    smax = F.when(
        F.col("__sd") > 0,
        F.aggregate(F.col("__vs"), zero, step, lambda acc: acc["m"]),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "key", "window", F.size("__vs").alias("n"),
        smax.alias("s_max"), (smax > F.lit(h)).alias("alarmed"),
    )


def lttb_downsample(
    df: DataFrame,
    bucket_width: int,
    key_col: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
    anchor: int = 0,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013), the
    PARALLEL fixed-anchor variant: per (series, bucket) keep the sample
    maximizing the triangle area against the NEIGHBOR BUCKETS' MEAN
    points. Classic LTTB anchors on the previously SELECTED point — a
    sequential chain no distributed plan can honor; anchoring on the
    previous bucket's mean (the same approximation the original paper
    uses for the NEXT bucket) keeps selections within ~1 sample of the
    sequential algorithm on smooth series and makes every bucket
    independent. First/last buckets keep their first/last sample (LTTB
    always pins the endpoints). Returns (key, bucket, ts, value).

    Shape: one (series, bucket) aggregate for the means, one bounded
    window over the means frame (bucket-count-sized — the display width,
    not the data), one join back, one argmax aggregate. Areas round to 6
    before the argmax (ties -> earliest ts) so the selection replays
    identically in SQL."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    from pyspark.sql import Window

    b = (
        (F.col(ts_col) - F.lit(anchor))
        - (F.col(ts_col) - F.lit(anchor)) % F.lit(bucket_width)
        + F.lit(anchor)
    )
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
        b.alias("bucket"),
    )
    means = base.groupBy("key", "bucket").agg(
        F.avg(F.col("ts").cast("double")).alias("mt"),
        F.avg("value").alias("mv"),
    )
    w = Window.partitionBy("key").orderBy("bucket")
    anchors = means.select(
        "key", "bucket",
        F.lag("mt").over(w).alias("at"), F.lag("mv").over(w).alias("av"),
        F.lead("mt").over(w).alias("ct"), F.lead("mv").over(w).alias("cv"),
    )
    cand = base.join(anchors, ["key", "bucket"])
    area = F.round(
        F.abs(
            (F.col("at") - F.col("ct")) * (F.col("value") - F.col("av"))
            - (F.col("at") - F.col("ts").cast("double"))
            * (F.col("cv") - F.col("av"))
        ) / F.lit(2.0),
        6,
    )
    pt = F.struct(F.col("ts").alias("ts"), F.col("value").alias("value"))
    picked = cand.groupBy("key", "bucket").agg(
        F.max_by(
            pt,
            F.when(
                F.col("at").isNull(),  # first bucket: keep FIRST sample
                F.struct(F.lit(0.0).alias("a"), (-F.col("ts")).alias("o")),
            )
            .when(
                F.col("ct").isNull(),  # last bucket: keep LAST sample
                F.struct(F.lit(0.0).alias("a"), F.col("ts").alias("o")),
            )
            .otherwise(
                F.struct(area.alias("a"), (-F.col("ts")).alias("o"))
            ),
        ).alias("p")
    )
    return picked.select(
        "key", "bucket", F.col("p.ts").alias("ts"), F.col("p.value").alias("value")
    )
