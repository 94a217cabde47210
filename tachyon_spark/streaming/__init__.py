from tachyon_spark.streaming.ingest import start_stream_ingest
from tachyon_spark.streaming.joins import stream_attribution_join
from tachyon_spark.streaming.rollup import read_rollup, start_continuous_rollup
from tachyon_spark.streaming.stateful import streaming_dedup, streaming_ewma
from tachyon_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "start_stream_ingest",
    "start_continuous_rollup",
    "read_rollup",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "streaming_ewma",
    "streaming_dedup",
    "stream_attribution_join",
]
