"""Event-time windowed aggregation — tumbling / sliding / session.

Beyond-reference surface (the reference has no windows, watermarks, or
late-data handling — SURVEY.md §2.3): these helpers work identically on
batch AND streaming DataFrames, because `F.window`/`F.session_window` are
plan-level constructs. On a stream, pass `watermark=` so state is bounded;
on batch they compile to a plain groupBy on a derived window struct.

Timestamps: a long epoch-microseconds column (the engine convention) is
converted with `timestamp_micros`; a native timestamp column passes through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _default_aggs():
    # built lazily — Column construction needs an active SparkContext
    return (
        F.count("*").alias("n"),
        F.avg("value").alias("avg_value"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def _event_time(df: DataFrame, ts_col: str):
    if isinstance(df.schema[ts_col].dataType, LongType):
        return F.timestamp_micros(F.col(ts_col))
    return F.col(ts_col)


def _prepare(df, ts_col, watermark):
    df = df.withColumn("__event_time", _event_time(df, ts_col))
    if watermark:
        df = df.withWatermark("__event_time", watermark)
    return df


def _finish(grouped, aggs, window_field):
    out = grouped.agg(*(aggs or _default_aggs()))
    return out.select(
        F.unix_micros(F.col(window_field).getField("start")).alias("window_start_us"),
        F.unix_micros(F.col(window_field).getField("end")).alias("window_end_us"),
        *[c for c in out.columns if c != window_field],
    )


def tumbling_window_agg(
    df: DataFrame,
    duration: str,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    aggs=None,
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows, e.g. duration='1 hour'."""
    df = _prepare(df, ts_col, watermark)
    grouped = df.groupBy(F.window("__event_time", duration).alias("__w"), *(keys or []))
    return _finish(grouped, aggs, "__w")


def sliding_window_agg(
    df: DataFrame,
    duration: str,
    slide: str,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    aggs=None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each row lands in duration/slide windows."""
    df = _prepare(df, ts_col, watermark)
    grouped = df.groupBy(
        F.window("__event_time", duration, slide).alias("__w"), *(keys or [])
    )
    return _finish(grouped, aggs, "__w")


def session_window_agg(
    df: DataFrame,
    gap: str,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    aggs=None,
    watermark: str | None = None,
) -> DataFrame:
    """Dynamic-size sessions closed after `gap` of inactivity per key."""
    df = _prepare(df, ts_col, watermark)
    grouped = df.groupBy(F.session_window("__event_time", gap).alias("__w"), *(keys or []))
    return _finish(grouped, aggs, "__w")
