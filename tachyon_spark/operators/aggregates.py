"""Full-vector and grouped aggregates.

Reference semantics (tachyon_core/src/execution/node/aggregate.rs:35-138):
  - sum/min/max over an empty vector yield NO row (not 0 / NULL);
  - count over an empty vector yields one row with 0;
  - avg is sum/count, always f64, empty -> no row.

Spark mapping: a single df.agg(...) — Catalyst performs map-side partial
aggregation, so this is one scan + a 1-row exchange regardless of input size.
The empty contract is enforced by filtering the NULL produced by Spark's
sum/min/max over an empty frame. Grouped aggregation (`sum by (label)`) is a
Spark-natural extension the reference lacks (SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGGS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "count": F.count,
}

AGG_FUNCS = frozenset(_AGGS)


def scalar_agg(df: DataFrame, func: str, value_col: str = "value", out: str = "value") -> DataFrame:
    """One-row (or zero-row, per the empty contract) aggregate over df."""
    if func not in _AGGS:
        raise ValueError(f"unsupported aggregate: {func}")
    agg_col = _AGGS[func](F.col(value_col)).alias(out)
    result = df.agg(agg_col)
    if func == "count":
        return result  # count of empty = 0, one row
    return result.where(F.col(out).isNotNull())


def grouped_agg(
    df: DataFrame,
    func: str,
    by: list[str],
    value_col: str = "value",
    out: str = "value",
) -> DataFrame:
    """`sum by (label) (v)`-style grouped aggregate (beyond-reference).

    groupBy shuffles on the grouping keys with partial aggregation map-side;
    empty groups simply don't exist, so no empty-contract handling is needed.
    """
    if func not in _AGGS:
        raise ValueError(f"unsupported aggregate: {func}")
    return df.groupBy(*by).agg(_AGGS[func](F.col(value_col)).alias(out))
