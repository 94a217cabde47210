"""Bucketed tables: pre-shuffled storage for exchange-free repeated joins.

The 100 TB co-location primitive Spark offers natively (bucketBy +
saveAsTable): both sides of an equi-join written with the SAME bucket
count and key hash-place matching keys in matching files, so every later
join or aggregation on that key runs with NO Exchange on either side —
the shuffle is paid ONCE at write time instead of per query. This is the
Spark-native analog of the reference's per-stream directory layout
(tachyon_core/src/storage/writer/persistent_writer.rs:21-24: one dir per
stream = perfect co-location by stream id), generalized to any key.

Use when a table is joined on the same key by many queries (events by
user_id against a user dimension, samples by stream_id against stream
metadata). Not worth it for one-shot joins — the write-side shuffle costs
the same as the join's would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and optionally sorted) table.

    sort_cols additionally sorts within each bucket file — joins and
    windows on (bucket_cols, sort_cols) then skip their Sort too
    (SortMergeJoin needs neither Exchange nor Sort). `path` makes the
    table external (data at that location, metadata in the session
    catalog); bucketing metadata lives in the catalog either way, which
    is why this is saveAsTable and not .parquet()."""
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucketing metadata (spark.table —
    a plain spark.read.parquet on the files would lose the bucket spec
    and reintroduce the exchange)."""
    return spark.table(table)


def is_exchange_free_join(a: DataFrame, b: DataFrame, on: list[str]) -> bool:
    """True when joining `a` and `b` on `on` plans with NO Exchange —
    the co-location self-check (cheap: inspects the physical plan, runs
    nothing). Use in pipelines to assert the write-side bucketing
    actually bought the join co-location it was paying for."""
    plan = a.join(b, on)._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
