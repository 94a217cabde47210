"""Batch series resolution for the text-ingest paths (openmetrics /
line-protocol / graphite) — catalog JOIN, not catalog collect.

Before r14 every `ingest_*` call looped over `conn.get_all_streams()`
(a full driver-side catalog collect) to build the series_key ->
stream_id mapping, then broadcast the ENTIRE catalog into the sample
join; `start_line_protocol_ingest` paid that per micro-batch. At the
engine's own 10^7-series posture (SCALE.md) that is a driver
bottleneck on a streaming hot path (r13 VERDICT item 4 / ADVICE).

The resolution here is metadata-altitude but DISTRIBUTED:

1. the batch's distinct parsed series LEFT-ANTI join the catalog
   parquet keyed by the same canonical `name{k="v",...}` rendering
   (sorted (key, value) entries, promapi-escaped values) — only
   genuinely NEW series ever reach the driver;
2. new series register through `Catalog.create_streams` (one fragment
   write) when few, or the fully distributed
   `Catalog.register_streams_df` past `REG_COLLECT_MAX`;
3. the returned mapping frame is the catalog parquet SEMI-JOINED down
   to the batch's own keys — batch-bounded, safe to broadcast into the
   sample join no matter how large the catalog grows.

The canonical key rendered here MUST stay byte-identical to the
parsers' `series_key` columns (parse_line_protocol / parse_graphite /
parse_openmetrics all sort the unescaped (key, value) structs and
escape values like promapi._escape_label) — a divergence re-registers
existing streams as duplicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tachyon_spark.types import VT_I64, VT_U64

__all__ = [
    "canonical_series_key",
    "escape_label_col",
    "resolve_series_mapping",
]

# above this many NEW series in one batch, registration goes through
# the distributed register_streams_df path instead of a driver collect
REG_COLLECT_MAX = 50_000


def escape_label_col(col: Column) -> Column:
    """promapi._escape_label, column form: backslash, quote, newline."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', r'\\"')
    return F.regexp_replace(out, "\n", r"\\n")


def canonical_series_key(name: Column, labels: Column) -> Column:
    """`name{k="v",...}` with entries sorted by (key, value) — the same
    ordering as Python's sorted(labels.items()) — and values escaped
    like promapi._escape_label. Struct sort, NOT raw `k="v"` string
    sort: the '=' byte would order a prefix key ('a') after its
    extension ('a1'), diverging from the Python key builder."""
    entries = F.array_sort(F.map_entries(labels))
    return F.concat(
        name,
        F.lit("{"),
        F.array_join(
            F.transform(
                entries,
                lambda e: F.concat(
                    e["key"],
                    F.lit('="'),
                    escape_label_col(e["value"]),
                    F.lit('"'),
                ),
            ),
            ",",
        ),
        F.lit("}"),
    )


def _catalog_keyed(conn) -> DataFrame:
    return conn.catalog.df().select(
        canonical_series_key(F.col("name"), F.col("labels")).alias(
            "series_key"
        ),
        "stream_id",
        "value_type",
    )


def resolve_series_mapping(
    conn,
    series_df: DataFrame,
    value_type: str = "f64",
    reg_collect_max: int = REG_COLLECT_MAX,
) -> DataFrame:
    """Resolve every series in `series_df` — (series_key, name,
    labels: map<string,string>), ONE ROW PER DISTINCT series_key — to a
    stream id, registering the missing ones with `value_type`. Returns
    the batch-bounded mapping frame (series_key, stream_id,
    __int: boolean) ready to broadcast into the sample join;
    pre-existing streams keep their own declared type."""
    missing = series_df.join(_catalog_keyed(conn), "series_key", "left_anti")
    head = missing.select("name", "labels").take(reg_collect_max + 1)
    if len(head) > reg_collect_max:
        # distributed registration: ids mint executor-side; the frame
        # is materialized exactly once by the parquet append, and the
        # mapping below re-reads the ids from the catalog — never from
        # this (nondeterministic) projection
        conn.catalog.register_streams_df(
            missing.select(
                F.expr("uuid()").alias("stream_id"),
                "name",
                "labels",
                F.lit(value_type).alias("value_type"),
            )
        )
    elif head:
        conn.catalog.create_streams(
            [(r["name"], dict(r["labels"]), value_type) for r in head]
        )
    return (
        _catalog_keyed(conn)
        .join(series_df.select("series_key"), "series_key", "left_semi")
        .select(
            "series_key",
            "stream_id",
            F.col("value_type").isin(VT_I64, VT_U64).alias("__int"),
        )
    )
