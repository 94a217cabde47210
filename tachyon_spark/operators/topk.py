"""topk / bottomk over sample values.

Reference (tachyon_core/src/execution/node/get_k.rs:29-139): size-k binary
heap, O(n log k); output is VALUES only (timestamps dropped), sorted desc for
topk / asc for bottomk; ties broken newest-timestamp-first; k=0 -> empty;
k > n -> all n.

Spark mapping: orderBy(...).limit(k) — Catalyst compiles this to
TakeOrderedAndProject, the same bounded-heap algorithm run per-partition and
merged on the driver, i.e. it never fully sorts the input. This scales: each
of 1000 executors keeps a k-heap, driver merges 1000*k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _k_rows(df: DataFrame, k: int, desc: bool, value_col: str, ts_col: str | None) -> DataFrame:
    if k <= 0:
        return df.select(F.col(value_col)).limit(0)
    value = F.col(value_col)
    order = [value.desc() if desc else value.asc()]
    if ts_col is not None:
        order.append(F.col(ts_col).desc())  # ties: newest wins (get_k.rs:88-128)
    return df.orderBy(*order).limit(k).select(value_col)


def top_k(df: DataFrame, k: int, value_col: str = "value", ts_col: str | None = "ts") -> DataFrame:
    return _k_rows(df, k, True, value_col, ts_col)


def bottom_k(df: DataFrame, k: int, value_col: str = "value", ts_col: str | None = "ts") -> DataFrame:
    return _k_rows(df, k, False, value_col, ts_col)


def grouped_top_k(
    df: DataFrame,
    k: int,
    by: list[str],
    desc: bool = True,
    value_col: str = "value",
    ts_col: str | None = "ts",
) -> DataFrame:
    """Per-group top/bottom-k (`topk by (label) (k, v)` — extension; the
    reference's GetK is global only). One hash shuffle on the group key; the
    rank window shares that partitioning, so no global sort and no second
    exchange. Output keeps the group columns; same tie rule (newest ts
    wins) and k<=0 -> empty as the global form."""
    from pyspark.sql import Window as W

    if k <= 0:
        return df.select(*by, value_col).limit(0)
    value = F.col(value_col)
    order = [value.desc() if desc else value.asc()]
    if ts_col is not None:
        order.append(F.col(ts_col).desc())
    w = W.partitionBy(*by).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(*by, value_col, "__rn")
        .drop("__rn")
    )
