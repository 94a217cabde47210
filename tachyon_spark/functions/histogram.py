"""Prometheus-style histogram bucket quantiles.

`histogram_quantile(phi, buckets)` over CUMULATIVE le-labeled bucket counts
(extension; absent from the reference — its planner rejects all function
calls, query/planner.rs:218-222). The algorithm is Prometheus's
bucketQuantile: per group, sort buckets by le ascending, find the first
bucket whose cumulative count reaches rank = phi * total, and linearly
interpolate within that bucket's [prev_le, le] bounds; a rank landing in
the +Inf bucket returns the highest finite le; the first bucket
interpolates from 0.

Spark mapping: one groupBy per (group key) collecting the per-group bucket
array (bounded: histograms have tens of buckets, never millions), then a
single pure-codegen expression over array HOFs — no UDF, one narrow
shuffle on the group key. This is the 100 TB plan: the shuffle key is
(series, ts), bucket fan-in is constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INF = float("inf")


def parse_le(col):
    """'+Inf' -> double infinity; anything else casts as double."""
    return F.when(F.col(col) == "+Inf", F.lit(INF)).otherwise(
        F.col(col).cast("double")
    )


def le_series_frame(spark, streams):
    """Broadcastable (stream_id, __le, __series) frame for le-labeled bucket
    streams: __le is the parsed upper bound (+Inf -> infinity) and __series
    the canonical remaining-label key. Returns (frame, multi) where multi
    says whether more than one non-le label set exists (i.e. the quantile
    must group per series, not just per timestamp). Shared by the raw-sample
    and query_range histogram_quantile paths."""
    les = {}
    series_keys = set()
    for s in streams:
        if "le" not in s.labels:
            raise ValueError(
                f"histogram_quantile: stream {s.name}{s.labels} has no 'le' label"
            )
        le = INF if s.labels["le"] == "+Inf" else float(s.labels["le"])
        rest = tuple(sorted((k, v) for k, v in s.labels.items() if k != "le"))
        les[s.stream_id] = (le, ",".join(f"{k}={v}" for k, v in rest))
        series_keys.add(rest)
    frame = spark.createDataFrame(
        [(sid, le, grp) for sid, (le, grp) in les.items()],
        "stream_id string, __le double, __series string",
    )
    return frame, len(series_keys) > 1


def bucket_quantile(
    df: DataFrame,
    phi: float,
    group_cols: list[str],
    le_col: str = "le",
    value_col: str = "value",
) -> DataFrame:
    """Per-group bucket quantile. `df` has one row per (group, bucket) with
    the bucket's upper bound (double; +Inf allowed) and CUMULATIVE count.
    Returns one row per group: (group_cols..., value)."""
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(le_col).alias("le"), F.col(value_col).cast("double").alias("c")))
    )
    g = df.groupBy(*group_cols).agg(pairs.alias("__b"))
    les = F.transform(F.col("__b"), lambda s: s["le"])
    counts = F.transform(F.col("__b"), lambda s: s["c"])
    total = F.element_at(counts, -1)
    rank = F.lit(float(phi)) * total
    # first 1-based index whose cumulative count >= rank
    idx = F.size(F.filter(counts, lambda c: c < rank)) + 1
    b_le = F.element_at(les, idx)
    b_cnt = F.element_at(counts, idx)
    prev_cnt = F.when(idx == 1, F.lit(0.0)).otherwise(F.element_at(counts, idx - 1))
    prev_le = F.when(idx == 1, F.lit(0.0)).otherwise(F.element_at(les, idx - 1))
    hf = F.element_at(les, F.greatest(F.size(les) - 1, F.lit(1)))
    # a histogram whose only bucket is +Inf has no finite upper bound to
    # clamp to — Prometheus yields NaN there; we yield null (filtered below)
    highest_finite = F.when((F.size(les) >= 2) & (hf != F.lit(INF)), hf)
    quantile = (
        F.when(total <= 0, F.lit(None).cast("double"))
        .when(b_le == F.lit(INF), highest_finite)
        .when(b_cnt == prev_cnt, prev_le)  # phi=0 / empty bucket guard
        .otherwise(
            prev_le + (b_le - prev_le) * (rank - prev_cnt) / (b_cnt - prev_cnt)
        )
    )
    return g.select(*group_cols, quantile.alias("value")).where(
        F.col("value").isNotNull()
    )
