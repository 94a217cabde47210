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
    keep_firing_for: int = 0,
) -> DataFrame:
    """Annotate present (series, step) rows with the Prometheus alert
    lifecycle: `active_since` (first step of the contiguous run) and
    `state` ('pending' until the run is >= for_ old, then 'firing').
    Rows absent from `df` are inactive — they produce nothing, like the
    ALERTS metric.

    `keep_firing_for` (Prometheus 2.42 `keep_firing_for:`): a FIRING
    alert survives a gap of absent steps as long as each absent step is
    within that duration of the last true evaluation — the next true
    step continues the SAME incident (active_since preserved) when
    ts - prev_ts <= keep_firing_for + step and the run had already
    reached firing. Pending runs never bridge (Prometheus resets them
    immediately). The bridged lifecycle is a sequential recurrence per
    series, so it runs as an Arrow-batched applyInPandas fold — bounded
    by the step grid's rows per series, the same in-memory contract as
    holt_winters; keep_firing_for=0 keeps the all-vectorized two-window
    path."""
    if step <= 0:
        raise ValueError("alert_state step must be positive")
    if for_ < 0:
        raise ValueError("alert_state for_ must be >= 0")
    if keep_firing_for < 0:
        raise ValueError("alert_state keep_firing_for must be >= 0")
    sc = (
        series_cols
        if series_cols is not None
        else [c for c in df.columns if c not in (ts_col, "value")]
    )
    if keep_firing_for:
        return _alert_state_bridged(
            df, step, for_, keep_firing_for, ts_col, sc
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


def _alert_state_bridged(
    df: DataFrame,
    step: int,
    for_: int,
    keep: int,
    ts_col: str,
    sc: list[str],
) -> DataFrame:
    """keep_firing_for lifecycle (sequential per series): incidents merge
    across a gap when the run had reached firing and every absent step in
    the gap stayed within `keep` of the last true step."""
    import pandas as pd

    out_fields = [f"{c} string" for c in sc] + [
        f"{ts_col} long", "value double", "active_since long",
        "state string",
    ]
    schema = ", ".join(out_fields)

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        active_since = None
        last_true = None
        firing = False
        since_o, st_o = [], []
        for ts in pdf[ts_col]:
            ts = int(ts)
            if last_true is not None:
                gap_bridged = firing and ts - last_true <= keep + step
                contiguous = ts - last_true == step
                if not (contiguous or gap_bridged):
                    active_since, firing = None, False
            if active_since is None:
                active_since = ts
            if ts - active_since >= for_:
                firing = True
            since_o.append(active_since)
            st_o.append("firing" if firing else "pending")
            last_true = ts
        out = pdf[sc + [ts_col, "value"]].copy()
        out["active_since"] = pd.array(since_o, dtype="Int64")
        out["state"] = st_o
        return out

    base = df.select(*sc, ts_col, F.col("value").cast("double"))
    if not sc:
        base = base.withColumn("__k", F.lit("_"))
        out = base.groupBy("__k").applyInPandas(
            lambda p: fold(p.drop(columns="__k")).assign(__k="_"),
            schema="__k string, " + schema,
        )
        return out.drop("__k")
    return base.groupBy(*sc).applyInPandas(fold, schema)
