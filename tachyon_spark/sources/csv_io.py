"""CSV import/export for streams.

Mirrors the reference CLI surface (`import-csv <stream> <file>` with a
`Timestamp,Value` header, tachyon_cli/src/main.rs:247-296; query `--export`
writing the same shape, main.rs:177-186) — but distributed: the CSV is read
by Spark with an explicit schema (header validated driver-side), values are
type-checked against the stream's declared value_type, and the append goes
through the same partitioned-parquet write path as programmatic ingest.

At scale the CSV may be a directory of part files on object storage; the read
is parallel and the per-stream repartition keeps one writer per stream
directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tachyon_spark.types import is_integer

CSV_SCHEMA = T.StructType(
    [
        T.StructField("Timestamp", T.LongType(), False),
        T.StructField("Value", T.DoubleType(), False),
    ]
)

CSV_SCHEMA_INT = T.StructType(
    [
        T.StructField("Timestamp", T.LongType(), False),
        T.StructField("Value", T.LongType(), False),
    ]
)


def import_csv(conn, selector: str, path: str) -> int:
    """Append `Timestamp,Value` CSV rows into the stream named by selector.

    Returns the number of rows ingested. Unparseable rows fail the job
    (mode FAILFAST) — same contract as the reference's per-row parse errors.
    """
    sel = conn._parse_selector(selector)
    rows = conn.catalog.resolve(sel.name, sel.matchers)
    if len(rows) != 1:
        raise ValueError(f"selector must resolve to exactly 1 stream, got {len(rows)}")
    stream_id, value_type = rows[0].stream_id, rows[0].value_type

    schema = CSV_SCHEMA_INT if is_integer(value_type) else CSV_SCHEMA
    df = conn.spark.read.csv(path, header=True, schema=schema, mode="FAILFAST")
    n = df.count()
    if is_integer(value_type):
        out = df.select(
            F.lit(stream_id).alias("stream_id"),
            F.col("Timestamp").alias("ts"),
            F.lit(None).cast("double").alias("value"),
            F.col("Value").alias("value_int"),
        )
    else:
        out = df.select(
            F.lit(stream_id).alias("stream_id"),
            F.col("Timestamp").alias("ts"),
            F.col("Value").alias("value"),
            F.lit(None).cast("long").alias("value_int"),
        )
    conn._write_samples(out, single_stream=True)
    return n


def export_csv(df: DataFrame, path: str) -> None:
    """Write a (ts, value) query result as `Timestamp,Value` CSV."""
    (
        df.select(F.col("ts").alias("Timestamp"), F.col("value").alias("Value"))
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


def import_jsonl(conn, selector: str, path: str) -> int:
    """Append JSON-lines rows ({"ts": ..., "value": ...}) into the stream
    named by selector — the format beyond the reference's CSV surface that
    a log-shipper actually emits. Same contract as import_csv: explicit
    schema, FAILFAST on unparseable rows, one resolved stream, the standard
    partitioned write path."""
    sel = conn._parse_selector(selector)
    rows = conn.catalog.resolve(sel.name, sel.matchers)
    if len(rows) != 1:
        raise ValueError(f"selector must resolve to exactly 1 stream, got {len(rows)}")
    stream_id, value_type = rows[0].stream_id, rows[0].value_type

    vtype = T.LongType() if is_integer(value_type) else T.DoubleType()
    schema = T.StructType(
        [
            T.StructField("ts", T.LongType(), False),
            T.StructField("value", vtype, False),
        ]
    )
    df = conn.spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    n = df.count()
    if is_integer(value_type):
        out = df.select(
            F.lit(stream_id).alias("stream_id"),
            "ts",
            F.lit(None).cast("double").alias("value"),
            F.col("value").alias("value_int"),
        )
    else:
        out = df.select(
            F.lit(stream_id).alias("stream_id"),
            "ts",
            "value",
            F.lit(None).cast("long").alias("value_int"),
        )
    conn._write_samples(out, single_stream=True)
    return n


def export_jsonl(df: DataFrame, path: str) -> None:
    """Write a (ts, value) query result as JSON lines."""
    df.select("ts", "value").write.mode("overwrite").json(path)
