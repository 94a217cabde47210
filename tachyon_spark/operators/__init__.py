from tachyon_spark.operators.aggregates import grouped_agg, scalar_agg
from tachyon_spark.operators.interpolate import interpolated_binop
from tachyon_spark.operators.topk import bottom_k, top_k
from tachyon_spark.operators.asof import asof_join
from tachyon_spark.operators.select import select_range
from tachyon_spark.operators.downsample import anomaly_flags, cusum_drift, m4_downsample
from tachyon_spark.operators.funnel import cohort_retention, funnel
from tachyon_spark.operators.gapfill import gapfill
from tachyon_spark.operators.seasonal import seasonal_decompose, seasonal_strength
from tachyon_spark.operators.acf import (
    autocorrelation,
    cross_correlation,
    partial_autocorrelation,
)

__all__ = [
    "scalar_agg",
    "grouped_agg",
    "interpolated_binop",
    "top_k",
    "bottom_k",
    "select_range",
    "asof_join",
    "m4_downsample",
    "anomaly_flags",
    "funnel",
    "cohort_retention",
    "cusum_drift",
    "gapfill",
    "seasonal_decompose",
    "seasonal_strength",
    "autocorrelation",
    "cross_correlation",
    "partial_autocorrelation",
]
