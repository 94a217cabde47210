"""Continuous aggregate (hypertable-style rollup) maintenance.

TimescaleDB-style continuous aggregates (the reference's README benchmarks
against TimescaleDB) keep a bucketed rollup of a raw table incrementally
up to date. The scalable Spark design is APPEND-ONLY MERGEABLE PARTIALS:

  - each micro-batch aggregates ITS OWN rows to (key, bucket) partials
    (count, sum, min, max) and appends them — no read-modify-write, no
    state store, commutative across batches and replays;
  - readers merge partials with a second tiny aggregation
    (sum(count), sum(sum), min(min), max(max); avg = sum/count at read).

At 100 TB this is the only shape that works: writes stay contention-free
appends partitioned by bucket, and the merge input is per-(key, bucket)
partial rows — orders of magnitude smaller than the raw table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tachyon_spark.connection import SAMPLES_SCHEMA


def _partials(batch: DataFrame, bucket_ms: int, keys: list[str]) -> DataFrame:
    bucket = (F.col("ts") - (F.col("ts") % F.lit(bucket_ms))).alias("bucket_ts")
    value = F.coalesce(F.col("value"), F.col("value_int").cast("double"))
    return batch.groupBy(bucket, *keys).agg(
        F.count(value).alias("p_count"),
        F.sum(value).alias("p_sum"),
        F.min(value).alias("p_min"),
        F.max(value).alias("p_max"),
    )


def start_continuous_rollup(
    conn,
    source_dir: str,
    rollup_path: str,
    bucket_ms: int = 3_600_000,
    keys: list[str] | None = None,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
    max_files_per_trigger: int | None = None,
):
    """Tail `source_dir` for SAMPLES_SCHEMA drops and maintain an append-only
    partial-aggregate rollup at rollup_path. Returns the StreamingQuery.

    max_files_per_trigger bounds each micro-batch (and, with trigger_once,
    forces a multi-batch catch-up — useful to exercise partial merging)."""
    keys = keys if keys is not None else ["stream_id"]
    checkpoint_dir = checkpoint_dir or os.path.join(
        conn.db_dir, "_checkpoints", "rollup"
    )
    reader = conn.spark.readStream.schema(SAMPLES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(source_dir)

    def _append(batch_df, _batch_id):
        (
            _partials(batch_df, bucket_ms, keys)
            .write.mode("append")
            .parquet(rollup_path)
        )

    writer = (
        src.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(spark, rollup_path: str, keys: list[str] | None = None) -> DataFrame:
    """Merge the partials into final per-(key, bucket) aggregates."""
    keys = keys if keys is not None else ["stream_id"]
    parts = spark.read.parquet(rollup_path)
    return parts.groupBy("bucket_ts", *keys).agg(
        F.sum("p_count").alias("count"),
        F.sum("p_sum").alias("sum"),
        (F.sum("p_sum") / F.sum("p_count")).alias("avg"),
        F.min("p_min").alias("min"),
        F.max("p_max").alias("max"),
    )


def rollup_batch(df: DataFrame, bucket_ms: int, keys: list[str]) -> DataFrame:
    """Batch cross-check: the same rollup computed directly from raw rows."""
    bucket = (F.col("ts") - (F.col("ts") % F.lit(bucket_ms))).alias("bucket_ts")
    value = F.coalesce(F.col("value"), F.col("value_int").cast("double"))
    return df.groupBy(bucket, *keys).agg(
        F.count(value).alias("count"),
        F.sum(value).alias("sum"),
        F.avg(value).alias("avg"),
        F.min(value).alias("min"),
        F.max(value).alias("max"),
    )
