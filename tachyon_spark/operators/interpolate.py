"""Interpolating temporal join: the reference's vector-to-vector binary op.

Reference semantics (tachyon_core/src/execution/node/vector_to_vector.rs:23-413,
goldens at lib.rs:1395-1470): align two vectors on the UNION of their
timestamps; where one side has no sample, linearly interpolate it between its
previous and next samples; before the first / after the last sample, carry the
nearest value. The reference rounds interpolants to integers (its own
`TODO: Allow floats`, vector_to_vector.rs:59); we round only when the promoted
result type is integer and interpolate exactly for f64.

Spark mapping (no built-in equivalent): full-outer join on ts gives the
timestamp union; `last(ignorenulls)` over an unbounded-preceding window and
`first(ignorenulls)` over an unbounded-following window recover each side's
neighboring samples; a single column expression computes the interpolant.
Everything stays in whole-stage codegen — no Python UDF.

Scale note: an un-partitioned window is a single-task sort. `series_cols`
partitions the windows by series key (the grouped variant, e.g. one pair of
vectors per device), which distributes perfectly. The single global series
case is inherently sequential in its neighbor dependency; for 100 TB use the
grouped form or pre-bucket by coarse time range with boundary overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ARITH = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "%": lambda a, b: a % b,
}


def _interp_side(value_col: str, ts_col: str, w_prev, w_next, round_int: bool):
    v = F.col(value_col)
    ts = F.col(ts_col)
    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    prev_ts = F.last(F.when(v.isNotNull(), ts), ignorenulls=True).over(w_prev)
    # "next neighbor" via last() over a DESC-ordered running frame, NOT
    # first() over [current, unboundedFollowing]: Spark evaluates unbounded-
    # FOLLOWING frames by rescanning to the partition end per row (O(n^2));
    # the DESC running frame is the O(n) streaming path. Same semantics.
    next_v = F.last(v, ignorenulls=True).over(w_next)
    next_ts = F.last(F.when(v.isNotNull(), ts), ignorenulls=True).over(w_next)
    lin = prev_v + (next_v - prev_v) * (ts - prev_ts) / (next_ts - prev_ts)
    if round_int:
        lin = F.round(lin)
    return (
        F.when(v.isNotNull(), v.cast("double"))
        .when(prev_ts.isNull(), next_v.cast("double"))  # before first sample: carry next
        .when(next_ts.isNull(), prev_v.cast("double"))  # after last sample: carry prev
        .otherwise(lin.cast("double"))
    )


def interpolated_binop(
    a: DataFrame,
    b: DataFrame,
    op: str,
    integer_result: bool = False,
    ts_col: str = "ts",
    value_col: str = "value",
    series_cols: list[str] | None = None,
) -> DataFrame:
    """`a OP b` over the union of timestamps with linear interpolation.

    a, b: frames with (ts, value) [+ series_cols for the grouped variant].
    Returns (ts, value) [+ series_cols], one row per union timestamp.
    """
    if op not in _ARITH:
        raise ValueError(f"unsupported vector-to-vector op: {op!r} (comparisons panic in the reference too)")
    keys = (series_cols or []) + [ts_col]
    left = a.select(*keys, F.col(value_col).alias("__va"))
    right = b.select(*keys, F.col(value_col).alias("__vb"))
    joined = left.join(right, on=keys, how="full_outer")

    part = series_cols or []
    w_prev = Window.partitionBy(*part).orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    w_next = (
        Window.partitionBy(*part)
        .orderBy(F.desc(ts_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    va = _interp_side("__va", ts_col, w_prev, w_next, integer_result)
    vb = _interp_side("__vb", ts_col, w_prev, w_next, integer_result)
    result = _ARITH[op](va, vb)
    # / and % are always f64 (lib.rs:306-362); others keep the promoted type.
    if integer_result and op not in ("/", "%"):
        result = result.cast("long")
    out_cols = (series_cols or []) + [ts_col]
    return joined.select(*out_cols, result.alias(value_col)).orderBy(*out_cols)
