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
    # PromQL parity extensions: population moments (PromQL stddev/stdvar
    # are population, not sample); empty input -> no row, like sum
    "stddev": F.stddev_pop,
    "stdvar": F.var_pop,
    # PromQL group(): 1 for every (non-empty) group
    "group": lambda c: F.max(F.lit(1.0)),
}

AGG_FUNCS = frozenset(_AGGS) | {"quantile"}


# approx_percentile accuracy: relative rank error <= 1/accuracy (Spark's
# Greenwald-Khanna-style sketch), i.e. 1e-4 rank error at the default —
# mergeable partials, bounded memory, the 100 TB path.
APPROX_PERCENTILE_ACCURACY = 10_000


def _agg_col(func: str, value_col: str, param: float | None, approx: bool = False):
    if func == "quantile":
        if approx:
            # mergeable sketch: rank error bounded by 1/accuracy
            return F.approx_percentile(
                F.col(value_col).cast("double"),
                F.lit(param),
                F.lit(APPROX_PERCENTILE_ACCURACY),
            )
        # exact linear-interpolated percentile (PromQL semantics) — the
        # oracle-gated default
        return F.percentile(F.col(value_col).cast("double"), F.lit(param))
    if func not in _AGGS:
        raise ValueError(f"unsupported aggregate: {func}")
    return _AGGS[func](F.col(value_col))


def scalar_agg(
    df: DataFrame,
    func: str,
    value_col: str = "value",
    out: str = "value",
    param: float | None = None,
    approx: bool = False,
) -> DataFrame:
    """One-row (or zero-row, per the empty contract) aggregate over df."""
    result = df.agg(_agg_col(func, value_col, param, approx).alias(out))
    if func == "count":
        return result  # count of empty = 0, one row
    return result.where(F.col(out).isNotNull())


def salted_stats(
    df: DataFrame,
    keys: list[str],
    value_col: str = "value",
    salt: int = 32,
) -> DataFrame:
    """Two-phase skew-safe stats per key: count/sum/avg/min/max.

    A single hot key funnels its entire group through one reducer in a
    plain groupBy; salting splits each key across `salt` sub-groups
    (phase 1: mergeable partials by (key, salt) — the hot key now spreads
    over `salt` tasks) and merges the partials per key (phase 2: `salt`
    rows per key, trivial). AQE's skew handling covers JOINS; this is the
    equivalent for aggregation when a key's partial state itself is the
    bottleneck. Only mergeable aggregates compose this way (avg is
    re-derived as sum/count at the merge)."""
    v = F.col(value_col)
    salted = df.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    partials = salted.groupBy(*keys, "__salt").agg(
        F.count(v).alias("__n"),
        F.sum(v).alias("__s"),
        F.min(v).alias("__mn"),
        F.max(v).alias("__mx"),
    )
    return partials.groupBy(*keys).agg(
        F.sum("__n").alias("n"),
        F.sum("__s").alias("sum_value"),
        (F.sum("__s") / F.sum("__n")).alias("avg_value"),
        F.min("__mn").alias("min_value"),
        F.max("__mx").alias("max_value"),
    )


def grouped_agg(
    df: DataFrame,
    func: str,
    by: list[str],
    value_col: str = "value",
    out: str = "value",
    param: float | None = None,
    approx: bool = False,
) -> DataFrame:
    """`sum by (label) (v)`-style grouped aggregate (beyond-reference).

    groupBy shuffles on the grouping keys with partial aggregation map-side;
    empty groups simply don't exist, so no empty-contract handling is needed.
    """
    return df.groupBy(*by).agg(_agg_col(func, value_col, param, approx).alias(out))


def distinct_count(
    df: DataFrame,
    by: list[str],
    value_col: str = "value",
    out: str = "value",
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Distinct count per group. approx=True uses approx_count_distinct
    (HyperLogLog++): mergeable fixed-size sketch partials instead of the
    exact path's per-group distinct expansion; relative standard deviation
    <= rsd (default 5%, Spark's default). The exact path stays the
    oracle-gated default."""
    col = (
        F.approx_count_distinct(F.col(value_col), rsd)
        if approx
        else F.countDistinct(F.col(value_col))
    )
    return df.groupBy(*by).agg(col.alias(out))
