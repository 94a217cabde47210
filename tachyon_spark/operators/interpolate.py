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

Scale design. The grouped variant (`series_cols`) partitions the windows by
series key and distributes perfectly. The ungrouped case has a global
neighbor dependency, so a naive un-partitioned window is a single-task sort;
instead we partition by COARSE TIME BUCKET and carry each bucket's missing
boundary neighbors in from the adjacent buckets:

  1. bucket each union row by ts into `n_buckets` contiguous ranges;
  2. aggregate per (bucket, side) the first/last non-null sample — a tiny
     frame of <= n_buckets rows;
  3. over that tiny frame, compute for every bucket the nearest sample in any
     EARLIER bucket (running last) and any LATER bucket (running last over a
     DESC order) per side — these are the carried-in neighbors;
  4. broadcast-join the carried neighbors back and run the interpolation
     windows partitioned by bucket, coalescing the in-bucket running
     neighbor with the carried one.

Every window over sample data is hash-partitioned by bucket; the only
single-partition stage is the step-3 window over the <= n_buckets boundary
rows (bounded, like any global aggregate). At 100 TB set n_buckets to a few
x the cluster's parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tachyon_spark.arith import ieee_div, ieee_mod

_ARITH = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    # / and % evaluate on f64 (integer_result is never set for them) with
    # IEEE zero-divisor semantics under ANSI mode — tachyon_spark/arith.py
    "/": ieee_div,
    "%": ieee_mod,
    "^": lambda a, b: F.pow(a.cast("double"), b.cast("double")),
    "atan2": lambda a, b: F.atan2(a.cast("double"), b.cast("double")),
}


def _interp_side(value_col, ts_col, w_prev, w_next, round_int,
                 carry_prev=None, carry_next=None):
    """Interpolated value for one side; `carry_prev`/`carry_next` are struct
    columns (t, v) holding the nearest neighbor OUTSIDE the window partition
    (bucketed path), or None (global / grouped path)."""
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
    if carry_prev is not None:
        prev_v = F.coalesce(prev_v, carry_prev["v"])
        prev_ts = F.coalesce(prev_ts, carry_prev["t"])
    if carry_next is not None:
        next_v = F.coalesce(next_v, carry_next["v"])
        next_ts = F.coalesce(next_ts, carry_next["t"])
    lin = prev_v + (next_v - prev_v) * (ts - prev_ts) / (next_ts - prev_ts)
    if round_int:
        lin = F.round(lin)
    return (
        F.when(v.isNotNull(), v.cast("double"))
        .when(prev_ts.isNull(), next_v.cast("double"))  # before first sample: carry next
        .when(next_ts.isNull(), prev_v.cast("double"))  # after last sample: carry prev
        .otherwise(lin.cast("double"))
    )


def _edge_struct(side_col: str, ts_col: str):
    """(t, v) struct for non-null samples, null otherwise; struct min/max is
    lexicographic on t first, so min = first sample, max = last sample."""
    v = F.col(side_col)
    return F.when(
        v.isNotNull(), F.struct(F.col(ts_col).alias("t"), v.alias("v"))
    )


def interpolated_binop(
    a: DataFrame,
    b: DataFrame,
    op: str,
    integer_result: bool = False,
    ts_col: str = "ts",
    value_col: str = "value",
    series_cols: list[str] | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """`a OP b` over the union of timestamps with linear interpolation.

    a, b: frames with (ts, value) [+ series_cols for the grouped variant].
    Returns (ts, value) [+ series_cols], one row per union timestamp.
    Ungrouped inputs are processed in `n_buckets` time-range partitions
    (default: 2x the cluster's default parallelism) with boundary-neighbor
    carry-in, so no window runs over a single unbounded partition.
    """
    if op not in _ARITH:
        raise ValueError(f"unsupported vector-to-vector op: {op!r} (comparisons panic in the reference too)")
    keys = (series_cols or []) + [ts_col]
    left = a.select(*keys, F.col(value_col).alias("__va"))
    right = b.select(*keys, F.col(value_col).alias("__vb"))
    joined = left.join(right, on=keys, how="full_outer")

    if series_cols:
        w_prev = (
            Window.partitionBy(*series_cols)
            .orderBy(ts_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_next = (
            Window.partitionBy(*series_cols)
            .orderBy(F.desc(ts_col))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        va = _interp_side("__va", ts_col, w_prev, w_next, integer_result)
        vb = _interp_side("__vb", ts_col, w_prev, w_next, integer_result)
        out = joined
    else:
        if n_buckets is None:
            sc = joined.sparkSession.sparkContext
            n_buckets = max(2 * sc.defaultParallelism, 8)
        # 1. contiguous ts-range buckets; double math avoids long overflow on
        # ns timestamps and only needs monotonicity in ts, which floor of a
        # monotone map preserves. The range comes from the two INPUTS (their
        # union's min/max == min-of-mins/max-of-maxes), not from `joined` —
        # aggregating the join output would execute the join twice, while the
        # per-input 1-row aggs read parquet footer stats at best.
        rng = (
            a.select(F.col(ts_col).alias("__t"))
            .unionByName(b.select(F.col(ts_col).alias("__t")))
            .agg(F.min("__t").alias("__tmin"), F.max("__t").alias("__tmax"))
        )
        width = (F.col("__tmax") - F.col("__tmin") + F.lit(1)).cast("double")
        bkt = F.floor(
            (F.col(ts_col) - F.col("__tmin")).cast("double") / width * n_buckets
        ).cast("long")
        bucketed = joined.crossJoin(F.broadcast(rng)).select(
            ts_col, "__va", "__vb", bkt.alias("__bkt")
        )
        # 2. per-bucket boundary samples (<= n_buckets rows)
        edges = bucketed.groupBy("__bkt").agg(
            F.min(_edge_struct("__va", ts_col)).alias("__fa"),
            F.max(_edge_struct("__va", ts_col)).alias("__la"),
            F.min(_edge_struct("__vb", ts_col)).alias("__fb"),
            F.max(_edge_struct("__vb", ts_col)).alias("__lb"),
        )
        # 3. nearest neighbor in earlier/later buckets (frame excludes the
        # current bucket); single-partition but over the tiny edges frame only
        wp = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
        wn = Window.orderBy(F.desc("__bkt")).rowsBetween(Window.unboundedPreceding, -1)
        carried = edges.select(
            "__bkt",
            F.last("__la", ignorenulls=True).over(wp).alias("__ca_prev"),
            F.last("__fa", ignorenulls=True).over(wn).alias("__ca_next"),
            F.last("__lb", ignorenulls=True).over(wp).alias("__cb_prev"),
            F.last("__fb", ignorenulls=True).over(wn).alias("__cb_next"),
        )
        # 4. interpolation windows partitioned by bucket
        out = bucketed.join(F.broadcast(carried), "__bkt")
        w_prev = (
            Window.partitionBy("__bkt")
            .orderBy(ts_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_next = (
            Window.partitionBy("__bkt")
            .orderBy(F.desc(ts_col))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        va = _interp_side("__va", ts_col, w_prev, w_next, integer_result,
                          F.col("__ca_prev"), F.col("__ca_next"))
        vb = _interp_side("__vb", ts_col, w_prev, w_next, integer_result,
                          F.col("__cb_prev"), F.col("__cb_next"))

    result = _ARITH[op](va, vb)
    # / % ^ atan2 are always f64 (lib.rs:306-362 for the first two;
    # PromQL pow/atan2 are float); others keep the promoted type.
    if integer_result and op not in ("/", "%", "^", "atan2"):
        result = result.cast("long")
    out_cols = (series_cols or []) + [ts_col]
    return out.select(*out_cols, result.alias(value_col)).orderBy(*out_cols)
