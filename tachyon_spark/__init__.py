"""tachyon_spark — a PySpark-native time-series analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference TSDB (tachyontsdb/tachyon, studied read-only at /root/reference/),
re-expressed Spark-first: declarative DataFrame plans, Catalyst optimization,
Parquet storage with partition pruning, and Structured Streaming ingestion.

Public surface:
    Connection(db_dir)        — open/create a database directory
    conn.create_stream(...)   — declare a stream (metric + labels + value type)
    conn.prepare_insert(...)  — buffered appends
    conn.query(promql, start, end) -> Query (DataFrame-backed result)

The PromQL subset matches the reference's planner surface (selectors with
matchers, @/offset, number literals, + - * / %, comparisons-as-filters,
sum/count/avg/min/max/topk/bottomk, parens) plus Spark-natural extensions:
regex matchers; `by`/`without` grouping with stddev/stdvar/quantile/
count_values; per-group topk; matrix selectors m[5m] with the
rate/increase/delta/*_over_time/resets/changes/irate/idelta/deriv
families; subqueries expr[RANGE:STEP]; vector matching on()/ignoring()
with group_left/group_right; histogram_quantile; label_replace/label_join;
set operators; the bool comparison modifier; absent()/absent_over_time;
math/sort/clamp functions; pi() and the evaluation-clock family.
"""

from tachyon_spark.connection import Connection, Query
from tachyon_spark.session import get_spark
from tachyon_spark.types import VT_F64, VT_I64, VT_U64, promote

__all__ = [
    "Connection",
    "Query",
    "get_spark",
    "VT_I64",
    "VT_U64",
    "VT_F64",
    "promote",
]
