"""Per-file statistics report — the `parse-headers` equivalent.

The reference CLI's `parse-headers` dumps every .ty file's header (stream id,
ts range, count, value stats, compression ratio — tachyon_cli/src/main.rs:
104-175; header fields storage/file.rs:20-36). Parquet keeps the same facts
in footers; this module surfaces them as a DataFrame by aggregating the
samples table per physical input file (`input_file_name()`), which at 100 TB
is a metadata-cheap full scan best run occasionally, not per query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def samples_file_stats(conn) -> DataFrame:
    """One row per parquet data file: stream, ts range, count, value stats,
    on-disk bytes and the reference's compression-ratio formula
    (count*16 / file_bytes, tachyon_cli/src/main.rs:139-145)."""
    df = conn.samples_df().withColumn(
        "__file", F.regexp_replace(F.input_file_name(), "^file:/*", "/")
    )
    per_file = df.groupBy("__file", "stream_id").agg(
        F.min("ts").alias("min_timestamp"),
        F.max("ts").alias("max_timestamp"),
        F.count("*").alias("count"),
        F.sum(F.coalesce(F.col("value"), F.col("value_int").cast("double"))).alias("value_sum"),
        F.min(F.coalesce(F.col("value"), F.col("value_int").cast("double"))).alias("min_value"),
        F.max(F.coalesce(F.col("value"), F.col("value_int").cast("double"))).alias("max_value"),
        F.first(F.coalesce(F.col("value"), F.col("value_int").cast("double"))).alias("first_value"),
    )
    sizes = _file_sizes(conn)
    if sizes is not None:
        per_file = per_file.join(F.broadcast(sizes), "__file", "left").withColumn(
            "compression_ratio",
            F.when(
                F.col("file_bytes") > 0, F.col("count") * 16.0 / F.col("file_bytes")
            ),
        )
    return per_file.withColumnRenamed("__file", "file").orderBy("stream_id", "min_timestamp")


def _file_sizes(conn) -> DataFrame | None:
    root = conn.samples_path
    if not os.path.isdir(root):
        return None
    rows = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                rows.append((p, os.path.getsize(p)))
    if not rows:
        return None
    return conn.spark.createDataFrame(rows, "`__file` string, file_bytes long")
