"""Prometheus-style alerting-rule evaluation (gaps-and-islands).

Prometheus alert rules (rule.go / AlertingRule.Eval) evaluate an
expression on the rule-group interval; a series present in the result is
ACTIVE — `pending` from its first contiguous evaluation, `firing` once it
has been active for at least `for`, and gone (inactive) the step it drops
out of the result. The reference engine has no rule engine at all (its
serving layer forwards raw queries only), so this is an extension shaped
for Spark:

  step grid rows    `Connection.alert_rule` evaluates the expression with
                    query_range (comparison filters keep only steps where
                    the condition holds — PromQL filter semantics), so the
                    alert condition arrives as PRESENT/ABSENT rows.
  islands           per series, contiguous runs of present steps: one
                    row_number window over (series) and the classic
                    ts - step * row_number island key — consecutive steps
                    share it, any gap starts a new island.
  state             active_since = min(ts) per (series, island); a step is
                    `firing` when ts - active_since >= for_, else
                    `pending` — exactly Prometheus's ActiveAt + holdDuration
                    check, vectorized.

Two keyed shuffles total (series, then series+island), both bounded by
the step-grid size — no driver iteration, no state store. The streaming
analogue for live data is streaming/stateful.py; this operator is the
batch/backfill form every rule-evaluation audit ("when would this alert
have fired last month?") runs over historical data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def alert_state(
    df: DataFrame,
    step: int,
    for_: int = 0,
    ts_col: str = "ts",
    series_cols: list[str] | None = None,
) -> DataFrame:
    """Annotate present (series, step) rows with the Prometheus alert
    lifecycle: `active_since` (first step of the contiguous run) and
    `state` ('pending' until the run is >= for_ old, then 'firing').
    Rows absent from `df` are inactive — they produce nothing, like the
    ALERTS metric."""
    if step <= 0:
        raise ValueError("alert_state step must be positive")
    if for_ < 0:
        raise ValueError("alert_state for_ must be >= 0")
    sc = (
        series_cols
        if series_cols is not None
        else [c for c in df.columns if c not in (ts_col, "value")]
    )
    w = Window.partitionBy(*sc).orderBy(ts_col) if sc else (
        Window.orderBy(ts_col)
    )
    island = (F.col(ts_col) - F.lit(step) * F.row_number().over(w)).alias(
        "__island"
    )
    d = df.select(*sc, ts_col, "value", island)
    w2 = Window.partitionBy(*sc, "__island") if sc else Window.partitionBy(
        "__island"
    )
    active_since = F.min(ts_col).over(w2)
    return d.select(
        *sc,
        ts_col,
        "value",
        active_since.alias("active_since"),
        F.when(
            F.col(ts_col) - active_since >= F.lit(for_), F.lit("firing")
        )
        .otherwise(F.lit("pending"))
        .alias("state"),
    )
