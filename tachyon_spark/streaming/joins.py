"""Stream-stream interval joins (Structured Streaming).

The reference has no streaming surface at all (SURVEY §1: single-threaded
embedded engine); this is the Spark-native attribution primitive — match
each conversion to the impressions that preceded it within a horizon,
with WATERMARK-BOUNDED state on both sides so a long-running job's join
state stays finite (Spark drops an impression's state once the
conversion-side watermark passes imp_ts + within).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_attribution_join(
    impressions: DataFrame,
    conversions: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "event_ts",
    within: str = "5 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Attribute conversions to prior impressions of the same key within
    `within`: imp_ts <= conv_ts <= imp_ts + within. Works on streaming
    AND batch frames (watermarks apply only to streaming inputs, so the
    same call is both the production stream job and its replayable batch
    oracle). `how='leftOuter'` keeps unmatched impressions (NULL conv_ts)
    once the watermark proves no conversion can still arrive.

    Scale shape: a key-equi join plus an event-time range — Spark
    co-partitions both streams on the key, and the watermark bounds the
    buffered state to the `within` + `watermark` horizon per key. The
    range predicate is what lets Spark evict state: without it a
    stream-stream join would have to buffer forever.

    Returns (key_col, imp_ts, conv_ts, lag_s)."""
    if how not in ("inner", "leftOuter"):
        raise ValueError("how must be 'inner' or 'leftOuter'")
    imp = impressions.select(
        F.col(key_col).alias("__k"), F.col(ts_col).alias("imp_ts")
    )
    conv = conversions.select(
        F.col(key_col).alias("__k2"), F.col(ts_col).alias("conv_ts")
    )
    if imp.isStreaming:
        imp = imp.withWatermark("imp_ts", watermark)
    if conv.isStreaming:
        conv = conv.withWatermark("conv_ts", watermark)
    cond = F.expr(
        "__k = __k2 AND conv_ts >= imp_ts "
        f"AND conv_ts <= imp_ts + INTERVAL {within}"
    )
    joined = imp.join(conv, cond, how)
    return joined.select(
        F.col("__k").alias(key_col),
        "imp_ts",
        "conv_ts",
        (
            F.col("conv_ts").cast("double") - F.col("imp_ts").cast("double")
        ).alias("lag_s"),
    )
