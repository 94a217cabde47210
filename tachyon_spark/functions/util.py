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
