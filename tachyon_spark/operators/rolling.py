"""Bucketed rolling-window aggregation over event time.

A RANGE-frame running window partitioned by a FIXED-cardinality key
(`Window.partitionBy(key).orderBy(ts).rangeBetween(-W, 0)`) is a
scale-killer: the key count does not grow with data, so every partition
becomes one ever-growing sorted task (measured: the plain form degraded
26x under a 100x-replica at local[32] — SCALE.md round-9 table).

`rolling_range_agg` computes the identical frame result in TIME BUCKETS
with boundary carry-in, the same decomposition operators/interpolate.py
uses for its unbounded union join:

  1. each row lands in bucket floor(ts / B) as a MAIN row;
  2. rows in the last W of a bucket are duplicated into the NEXT bucket
     as CARRY rows (carry rows supply the lookback across the boundary
     and emit no output);
  3. the window runs per (key..., bucket) — partition count grows with
     the time span, so parallelism grows with data instead of saturating
     at the key cardinality;
  4. main rows keep their aggregate; carry rows drop.

Correctness: with B >= W every row's frame (ts - W, ts] lies entirely
within its own bucket plus the previous bucket's final W — exactly the
rows carried in — so the bucketed frame sees the same row multiset as
the unbounded form (ties included; RANGE frames are value-based, so
carry duplicates of the SAME row are excluded by the carry filter, never
double-counted).

Bucket sizing: default 6*W — wide enough that carry duplication is <=
~17% of rows, narrow enough that a 30-day span yields hundreds of
buckets per key. At extreme per-key densities shrink toward W (more
buckets, more carry); the floor B = W keeps one-neighbor carry valid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_range_agg(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    width: int,
    agg=None,
    out_col: str = "rolling_value",
    bucket_width: int | None = None,
    aggs: dict | None = None,
) -> DataFrame:
    """RANGE-frame running aggregate over (`ts` - width, `ts`] per key,
    computed in carry-in time buckets (module docstring). `agg` is a
    callable Column -> Column (e.g. ``lambda: F.avg("value")`` shaped as
    ``agg()`` below); inclusive frame edges match
    ``rangeBetween(-width, 0)``. Returns df's columns plus `out_col`.

    `aggs` ({out_col: callable}) computes SEVERAL rolling aggregates in
    the SAME pass — they share one window spec, so Catalyst plans one
    Window operator and one exchange, not one per aggregate."""
    if aggs is None:
        if agg is None:
            raise ValueError("rolling_range_agg needs agg or aggs")
        aggs = {out_col: agg}
    b = int(bucket_width) if bucket_width else 6 * int(width)
    if b < width:
        raise ValueError("bucket_width must be >= width (one-neighbor carry)")
    # exact integer floor-division: long/long `/` in Spark is a double
    # divide, which loses precision past 2^53 (nanosecond epochs) and
    # truncates toward zero for negative ts; ts - pmod(ts, b) is the
    # exact multiple of b at-or-below ts, and `div` on it is exact
    bucket = F.expr(
        f"(`{ts_col}` - pmod(`{ts_col}`, {b})) div {b}"
    )
    # ONE scan: each row explodes to its main (bucket, carry=0) slot plus,
    # when it sits in the bucket's final `width`, a (bucket+1, carry=1)
    # slot — a union of two scans would read the input twice
    near_edge = F.col(ts_col) >= (bucket + 1) * F.lit(b) - F.lit(width)
    main_slot = F.struct(bucket.alias("bk"), F.lit(0).alias("carry"))
    carry_slot = F.struct((bucket + 1).alias("bk"), F.lit(1).alias("carry"))
    slots = F.when(near_edge, F.array(main_slot, carry_slot)).otherwise(
        F.array(main_slot)
    )
    u = (
        df.withColumn("__s", F.explode(slots))
        .withColumn("__bk", F.col("__s.bk"))
        .withColumn("__carry", F.col("__s.carry"))
        .drop("__s")
    )
    w = (
        Window.partitionBy(*keys, "__bk")
        .orderBy(ts_col)
        .rangeBetween(-int(width), 0)
    )
    for name, fn in aggs.items():
        u = u.withColumn(name, fn().over(w))
    return u.where(F.col("__carry") == 0).drop("__bk", "__carry")
