"""Time-range selector scan.

Reference (tachyon_core/src/execution/node/vector_select.rs:12-106): resolve
metric+matchers -> stream ids via the inverted index, prune data files to
[start, end], iterate samples in ts order per stream.

Spark mapping: a filter on (stream_id IN resolved, ts BETWEEN start AND end).
With samples stored as Parquet partitioned by stream bucket and sorted by ts
within files, Catalyst turns this into partition pruning + row-group min/max
skipping — the distributed equivalent of the reference's SQLite file catalog
(query/indexer.rs:323-343).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def select_range(
    samples: DataFrame,
    stream_ids: Sequence[str] | None = None,
    start: int | None = None,
    end: int | None = None,
    ts_col: str = "ts",
    stream_col: str = "stream_id",
    time_bucket: int | None = None,
    bucket_col: str = "ts_bucket",
) -> DataFrame:
    """Filter samples to the given streams and inclusive time range.

    With a time-bucketed layout (partition dirs stream_id=X/ts_bucket=N),
    also filter the bucket column so Catalyst prunes whole time partitions —
    at 100 TB a narrow range touches only its buckets, not every file of the
    stream.
    """
    df = samples
    if stream_ids is not None:
        ids = list(stream_ids)
        if len(ids) == 1:
            df = df.where(F.col(stream_col) == ids[0])
        else:
            df = df.where(F.col(stream_col).isin(ids))
    if time_bucket:
        if start is not None:
            df = df.where(F.col(bucket_col) >= start // time_bucket)
        if end is not None:
            df = df.where(F.col(bucket_col) <= end // time_bucket)
    if start is not None:
        df = df.where(F.col(ts_col) >= F.lit(start))
    if end is not None:
        df = df.where(F.col(ts_col) <= F.lit(end))
    return df
