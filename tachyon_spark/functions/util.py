"""Shared dataframe utilities for the LLM-pipeline function modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, cap: int = 32) -> DataFrame:
    """Repartition small-file inputs so narrow per-row heavy work (array
    HOFs, regex, Arrow-batched decode, hashing) uses every core.

    At 100 TB the scan already has thousands of splits and this is a
    NO-OP; locally (or on any corpus stored as a few files — the driver
    testdata is one single-row-group parquet per table) the scan yields
    fewer partitions than cores and one task would pin one core for the
    whole pass. The repartition's shuffle moves only the small input
    (sub-file-sized by construction of the trigger condition), buying
    full parallelism for the expensive projection above it.

    Heuristic uses inputFiles() (plan metadata, no job) instead of
    df.rdd.getNumPartitions(): touching .rdd forces plan analysis plus a
    Python<->JVM conversion path per call. Non-file sources (in-memory
    test frames) report no files and are left alone — they already
    parallelize from their creation. Derived frames that have a shuffle
    between the scan and the call site still report the scan's files, so
    apply this at scan-adjacent points only.
    """
    target = min(df.sparkSession.sparkContext.defaultParallelism, cap)
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df


def table_profile(df, columns: list[str] | None = None):
    """Per-column data-quality profile — the ANALYZE/profiling pass every
    pipeline runs before training on a new source: for each column its
    row count, null count, exact distinct count, and min/max rendered as
    strings (type-agnostic output shape). Returns one row per column:
    (column, n_rows, n_null, n_distinct, min_value, max_value).

    ONE scan: all per-column aggregates evaluate in a single agg()
    (map-side partials), then a bounded stack() unpivot — no per-column
    jobs, no collect. Exact distinct counts expand per column in the same
    pass; swap to approx_count_distinct at 100 TB if the 2%-error sketch
    is acceptable (one-line change, same shape).
    """
    from pyspark.sql import functions as F

    cols = columns or df.columns
    # r16: the distinct counts aggregate SEPARATELY from
    # count/null/min/max. In one agg(), the string min/max buffers
    # forced the whole multi-distinct Expand into SortAggregate — a full
    # sort of (n_cols+1)x the input rows on an (n_cols+1)-column key
    # (plans/r16/table_profile_before.txt ops 3-9). Split, the distinct
    # branch's dedup phase carries no aggregation buffer (pure
    # HashAggregate over the expanded rows) and the min/max branch is a
    # global agg whose sort fallback has no grouping key to sort by.
    # The two 1-row results meet in a free crossJoin; the second scan is
    # a column-pruned parquet pass — far cheaper than sorting the
    # expanded rows (measured sf0.1: 1.96 s -> see bench).
    base_aggs = []
    dist_aggs = []
    for c in cols:
        base_aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nl_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
        dist_aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*base_aggs).crossJoin(df.agg(*dist_aggs))
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __nl_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_rows, n_null, n_distinct, min_value, max_value)"
    )


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns in ONE scan:
    all k(k-1)/2 F.corr aggregates land in a single groupBy().agg — one
    pass, map-side partial moments, no per-pair jobs (df.stat.corr runs a
    job per pair). Output is long form (col_a, col_b, corr) with a < b,
    rounded to 6 (covariance partial-aggregation order differs between
    engines in the last ulps). The feature-redundancy screen that runs
    before training-data feature selection."""
    from pyspark.sql import functions as F

    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    aggs = []
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            pairs.append((a, b))
            aggs.append(
                F.round(
                    F.corr(F.col(a).cast("double"), F.col(b).cast("double")), 6
                ).alias(f"__c{len(aggs)}")
            )
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', __c{i}" for i, (a, b) in enumerate(pairs)
    )
    return one.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, corr)"
    )
