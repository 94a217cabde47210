"""Range (interval) join: match point events to time intervals.

Not in the reference (no relational join surface at all, SURVEY §2.3);
standard in time-series analytics (events ⨝ maintenance windows, sessions,
experiment cohorts). A naive `l.ts BETWEEN r.start AND r.end` predicate
compiles to BroadcastNestedLoopJoin — O(|L|·|R|) unless one side is tiny.

Two strategies:
  - broadcast (default when intervals are small): fine — NLJ against a
    broadcast of the interval table is one narrow pass over events.
  - bucketize: chop every interval into fixed-width time buckets, equi-join
    events on their bucket, then re-apply the exact range predicate. The
    equi-join hash-shuffles on (bucket [, keys]) — the 100 TB path. Bucket
    width should be ~the median interval length: wider buckets → fewer
    interval replicas; narrower → fewer false candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: list[str] | None = None,
    bucket: int | None = None,
) -> DataFrame:
    """events rows inner-joined to intervals with start <= ts <= end
    (+ equal `by` keys). `bucket=None` broadcasts the interval table;
    `bucket=width` uses the bucketized equi-join (intervals exploded per
    covered bucket)."""
    by = by or []
    on_range = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))

    if bucket is None:
        r = F.broadcast(intervals)
        if by:
            return events.join(r, [*by], "inner").where(on_range)
        return events.join(r, on_range, "inner")

    ivals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} DIV {bucket}"), F.expr(f"{end_col} DIV {bucket}")
            )
        ),
    )
    ev = events.withColumn("__bucket", F.expr(f"{ts_col} DIV {bucket}"))
    out = ev.join(ivals, ["__bucket", *by], "inner").where(on_range)
    return out.drop("__bucket")
