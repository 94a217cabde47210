"""Funnel and cohort-retention analytics over the events table.

Beyond-reference product-analytics operators (the reference has no
relational surface at all, SURVEY.md §2.3); both are compositions of
keyed aggregations — no sessionization state, no per-user loops.

funnel: ordered step completion — for steps [A, B, C], a user completes
step k when an event of type k happens STRICTLY AFTER their step-(k-1)
completion (and within `within` ts units of it, when set). Earliest
completion times are taken at every stage (the standard greedy funnel,
which maximizes conversion counts for the window rule). One grouped
aggregate per step over the step's events, each joined user-keyed onto
the previous stage — len(steps) keyed shuffles, mergeable min aggregates.

cohort_retention: users bucket into cohorts by FIRST-activity period;
the (cohort, k) cell counts distinct users active k periods after their
cohort start. Two keyed aggregations (first activity, then distinct
users per offset) — the standard retention triangle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list[str],
    within: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel completion times: (user, t1..tN, reached) where
    t_k is the earliest step-k event strictly after t_{k-1} (within
    `within` of t_{k-1} when set) and `reached` counts completed steps."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    ev = df.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("et"),
        F.col(ts_col).alias("t"),
    )
    cur = (
        ev.where(F.col("et") == steps[0])
        .groupBy("user")
        .agg(F.min("t").alias("t1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        prev = f"t{k - 1}"
        nxt = (
            ev.where(F.col("et") == step)
            .join(cur.select("user", prev), "user")
            .where(
                (F.col("t") > F.col(prev))
                & (
                    F.lit(True)
                    if within is None
                    else (F.col("t") <= F.col(prev) + F.lit(within))
                )
            )
            .groupBy("user")
            .agg(F.min("t").alias(f"t{k}"))
        )
        cur = cur.join(nxt, "user", "left")
    reached = sum(
        (F.col(f"t{k}").isNotNull().cast("int") for k in range(2, len(steps) + 1)),
        F.lit(1),
    )
    return cur.select("user", *[f"t{k}" for k in range(1, len(steps) + 1)],
                      reached.alias("reached"))


def cohort_retention(
    df: DataFrame,
    period: int,
    max_offset: int = 12,
    user_col: str = "user_id",
    ts_col: str = "ts",
    anchor: int = 0,
) -> DataFrame:
    """Retention triangle: (cohort, offset, n_users) — users whose FIRST
    activity fell in `cohort` (period-bucketed ts) and who were active
    `offset` periods later (0 <= offset <= max_offset)."""
    if period <= 0:
        raise ValueError("period must be positive")
    b = (
        (F.col(ts_col) - F.lit(anchor))
        - (F.col(ts_col) - F.lit(anchor)) % F.lit(period)
        + F.lit(anchor)
    )
    acts = df.select(F.col(user_col).alias("user"), b.alias("p")).distinct()
    first = acts.groupBy("user").agg(F.min("p").alias("cohort"))
    joined = acts.join(first, "user").select(
        "user", "cohort",
        ((F.col("p") - F.col("cohort")) / F.lit(period)).cast("long").alias("offset"),
    )
    return (
        joined.where(F.col("offset") <= max_offset)
        .groupBy("cohort", "offset")
        .agg(F.count_distinct("user").alias("n_users"))
    )
