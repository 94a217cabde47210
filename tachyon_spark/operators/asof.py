"""As-of (nearest-key temporal) join.

Not in the reference (its only temporal combination is the interpolating
vector-to-vector join, vector_to_vector.rs:23-413); standard in time-series
stores. Spark has no built-in as-of join, so we compose one shuffle + one
window pass:

    union(left tagged 1, right tagged 0)
      -> window per `by` key ordered by (ts, tag)
      -> last(right value, ignorenulls) carried forward
      -> keep left rows

This is the scalable pattern: a single hash shuffle on the key, linear state
per partition, no per-row Python, no broadcast of either side. Skewed keys
can be salted upstream; AQE handles moderate skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    right_value: str = "value",
    out_col: str | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach the `right_value` of the latest right row
    with right.on <= left.on (per `by` keys). Backward-direction as-of join.

    tolerance: max allowed (left.on - right.on); older matches become null.
    """
    by = by or []
    out_col = out_col or f"{right_value}_asof"
    lcols = left.columns

    l_tag = left.withColumn("__tag", F.lit(1)).withColumn(
        "__rv", F.lit(None).cast(right.schema[right_value].dataType)
    )
    r_tag = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__tag"),
        F.col(right_value).alias("__rv"),
    )
    # align columns for the union
    r_full = r_tag.select(
        *[
            F.col(c) if c in (by + [on]) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        "__tag",
        "__rv",
    )
    unioned = l_tag.select(*lcols, "__tag", "__rv").unionByName(r_full)

    # right rows sort before left rows at equal ts (tag 0 < 1) => `<=` match
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.col("__rv"), ignorenulls=True).over(w)
    carried_ts = F.last(
        F.when(F.col("__tag") == 0, F.col(on)), ignorenulls=True
    ).over(w)

    out = unioned.withColumn(out_col, carried).withColumn("__rts", carried_ts)
    if tolerance is not None:
        out = out.withColumn(
            out_col,
            F.when(F.col(on) - F.col("__rts") <= F.lit(tolerance), F.col(out_col)),
        )
    return out.where(F.col("__tag") == 1).select(*lcols, out_col)
