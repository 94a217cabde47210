"""Structured Streaming ingestion into the samples table.

The reference ingests with a single-threaded buffered Inserter that rotates
files at 62,500 samples (persistent_writer.rs:76-116, storage/mod.rs:8).
The Spark-native equivalent for live feeds is a streaming file/queue source
→ writeStream parquet sink with checkpointing: exactly-once appends, file
rotation via maxRecordsPerFile, partition-per-stream layout identical to the
batch path, so batch queries see streamed data with no special casing.

At 100 TB/day the same topology holds — the source becomes Kafka/queue, the
sink a partitioned table; only trigger/checkpoint configs change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from tachyon_spark.connection import SAMPLES_SCHEMA


def start_stream_ingest(
    conn,
    source_dir: str,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
    max_files_per_trigger: int = 100,
):
    """Tail `source_dir` for new parquet drops of SAMPLES_SCHEMA rows and
    append them to the connection's samples table. Returns the StreamingQuery.
    """
    checkpoint_dir = checkpoint_dir or os.path.join(conn.db_dir, "_checkpoints", "ingest")
    src = (
        conn.spark.readStream.schema(SAMPLES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    # foreachBatch + the batch writer, NOT a direct parquet sink: the sink's
    # _spark_metadata log would make every later batch read of samples/ use
    # MetadataLogFileIndex and silently hide batch-written files. Exactly-once
    # degrades to at-least-once on batch retry; downstream dedup is the
    # documented contract for replays.
    def _append(batch_df, _batch_id):
        conn._write_samples(batch_df)

    writer = (
        src.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_source(conn, source_dir: str, schema=None) -> DataFrame:
    """A streaming DataFrame over a drop directory (for windowed aggs)."""
    return conn.spark.readStream.schema(schema or SAMPLES_SCHEMA).parquet(source_dir)


def start_openmetrics_ingest(
    conn,
    source_dir: str,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
    max_files_per_trigger: int = 100,
    ns_clock: bool = True,
    value_type: str = "f64",
):
    """LIVE scrape ingestion: tail `source_dir` for OpenMetrics text
    drops (the files a scrape loop or federation pull writes) and ingest
    each micro-batch through sources/openmetrics.ingest_openmetrics —
    the same JVM-regexp parse, metadata-altitude series resolution
    (new metrics appearing mid-stream register their streams in that
    batch), and batch write path. Composition, not new machinery: the
    foreachBatch contract (at-least-once on retry) and checkpointing
    match start_stream_ingest. Returns the StreamingQuery."""
    checkpoint_dir = checkpoint_dir or os.path.join(
        conn.db_dir, "_checkpoints", "openmetrics"
    )
    src = (
        conn.spark.readStream.option(
            "maxFilesPerTrigger", max_files_per_trigger
        )
        .text(source_dir)
    )

    def _append(batch_df, _batch_id):
        from tachyon_spark.sources.openmetrics import ingest_openmetrics

        ingest_openmetrics(
            conn, batch_df, ns_clock=ns_clock, value_type=value_type
        )

    writer = (
        src.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_line_protocol_ingest(
    conn,
    source_dir: str,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
    max_files_per_trigger: int = 100,
    precision: str = "ns",
    value_type: str = "f64",
):
    """LIVE line-protocol ingestion (r13): tail `source_dir` for
    InfluxDB line-protocol text drops (Telegraf file output, `influx
    write` dumps, IoT gateway batches) and ingest each micro-batch
    through sources/line_protocol.ingest_line_protocol — the same
    JVM-regexp parse, measurement_field{tags} fan-out,
    metadata-altitude series resolution (new measurements appearing
    mid-stream register their streams in that batch), and batch write
    path. Composition, not new machinery: the foreachBatch contract
    (at-least-once on retry) and checkpointing match
    start_stream_ingest / start_openmetrics_ingest. Returns the
    StreamingQuery."""
    checkpoint_dir = checkpoint_dir or os.path.join(
        conn.db_dir, "_checkpoints", "line_protocol"
    )
    src = (
        conn.spark.readStream.option(
            "maxFilesPerTrigger", max_files_per_trigger
        )
        .text(source_dir)
    )

    def _append(batch_df, _batch_id):
        from tachyon_spark.sources.line_protocol import (
            ingest_line_protocol,
        )

        ingest_line_protocol(
            conn, batch_df, precision=precision, value_type=value_type
        )

    writer = (
        src.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_graphite_ingest(
    conn,
    source_dir: str,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
    max_files_per_trigger: int = 100,
    ts_unit: str = "s",
    value_type: str = "f64",
):
    """LIVE Graphite plaintext ingestion (r14): tail `source_dir` for
    carbon-style text drops and ingest each micro-batch through
    sources/line_protocol.ingest_graphite — the same JVM-regexp parse,
    name{tags} series identity, distributed catalog-join resolution
    (sources/series_resolve.py — per-batch cost is bounded by the
    batch's own series, never the catalog size), and batch write path.
    Completes the wire-format symmetry: all three text formats now have
    parse + batch ingest + streaming drop-dir arms. Returns the
    StreamingQuery."""
    checkpoint_dir = checkpoint_dir or os.path.join(
        conn.db_dir, "_checkpoints", "graphite"
    )
    src = (
        conn.spark.readStream.option(
            "maxFilesPerTrigger", max_files_per_trigger
        )
        .text(source_dir)
    )

    def _append(batch_df, _batch_id):
        from tachyon_spark.sources.line_protocol import ingest_graphite

        ingest_graphite(
            conn, batch_df, ts_unit=ts_unit, value_type=value_type
        )

    writer = (
        src.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_remote_write_ingest(
    conn,
    source_dir: str,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
    max_files_per_trigger: int = 100,
    ts_unit: str = "ms",
    value_type: str = "f64",
    compressed: bool = True,
    proto: str = "1",
    store_exemplars: bool = False,
):
    """LIVE remote_write ingestion (r15): tail `source_dir` for dropped
    WriteRequest blobs (one snappy+protobuf body per file — the shape a
    dumb HTTP front or a replayed WAL produces) and ingest each
    micro-batch through sources/remote_write.ingest_remote_write — the
    same distributed mapInPandas decode, catalog-join series resolution
    (new series appearing mid-stream register in that batch), and batch
    write path as the HTTP endpoint. binaryFile streaming source +
    the shared foreachBatch/checkpoint contract of the three text arms.
    `proto` "2" tails remote-write 2.0 bodies; `store_exemplars`
    retains exemplars per batch (tachyon_spark/exemplars.py — its own
    failure domain, like the HTTP ?exemplars=1 opt-in). Returns the
    StreamingQuery."""
    checkpoint_dir = checkpoint_dir or os.path.join(
        conn.db_dir, "_checkpoints", "remote_write"
    )
    src = (
        conn.spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
    )

    def _append(batch_df, _batch_id):
        from tachyon_spark.sources.remote_write import ingest_remote_write

        blobs = batch_df.select("content")
        ingest_remote_write(
            conn,
            blobs,
            ts_unit=ts_unit,
            value_type=value_type,
            compressed=compressed,
            proto=proto,
        )
        if store_exemplars:
            from tachyon_spark.exemplars import (
                extract_remote_write_exemplars,
            )

            try:  # samples are committed; exemplars must not re-fire
                # the batch via a foreachBatch retry
                extract_remote_write_exemplars(
                    conn, blobs, ts_unit=ts_unit,
                    compressed=compressed, proto=proto,
                )
            except Exception:
                pass

    writer = (
        src.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_otlp_ingest(
    conn,
    source_dir: str,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
    max_files_per_trigger: int = 100,
    ts_unit: str = "ns",
    value_type: str = "f64",
    encoding: str = "auto",
):
    """LIVE OTLP metrics ingestion (r15 second wave): tail `source_dir`
    for dropped ExportMetricsServiceRequest blobs (one protobuf body
    per file, gzip self-identifying under encoding="auto" — the shape
    an OTel Collector file exporter or a replayed HTTP log produces)
    and ingest each micro-batch through sources/otlp.ingest_otlp — the
    same distributed mapInPandas decode + Prometheus translation,
    catalog-join series resolution, and batch write path as the
    /v1/metrics endpoint. binaryFile streaming source + the shared
    foreachBatch/checkpoint contract of the four sibling arms. Returns
    the StreamingQuery."""
    checkpoint_dir = checkpoint_dir or os.path.join(
        conn.db_dir, "_checkpoints", "otlp"
    )
    src = (
        conn.spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
    )

    def _append(batch_df, _batch_id):
        from tachyon_spark.sources.otlp import ingest_otlp

        ingest_otlp(
            conn,
            batch_df.select("content"),
            ts_unit=ts_unit,
            value_type=value_type,
            encoding=encoding,
        )

    writer = (
        src.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
