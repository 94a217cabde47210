"""Custom stateful streaming operators via applyInPandasWithState.

Beyond-reference surface (the reference has no stateful streaming at all,
SURVEY.md §2.3). The flagship op is a per-stream running EWMA + counter:
state is O(1) per key (last ewma, count, last ts), updates are Arrow-batched,
and GroupStateTimeout can expire idle streams — the canonical shape for any
custom per-key streaming accumulator (rate trackers, anomaly flags, gap
detection).

On batch DataFrames the same math runs as `ewma_batch` (window cumulative
form) so results can be cross-checked without a streaming harness.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("ewma", T.DoubleType(), True),
        T.StructField("n_seen", T.LongType(), False),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ewma", T.DoubleType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def _ewma_update(alpha: float):
    def fn(
        key: Tuple[str],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ewma, n = state.get
        else:
            ewma, n = None, 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts")
            out_ewma = []
            for v in pdf["value"]:
                ewma = v if ewma is None else alpha * v + (1 - alpha) * ewma
                n += 1
                out_ewma.append(ewma)
            yield pd.DataFrame(
                {
                    "stream_id": key[0],
                    "ts": pdf["ts"],
                    "value": pdf["value"],
                    "ewma": out_ewma,
                    "n_seen": range(n - len(out_ewma) + 1, n + 1),
                }
            )
        state.update((ewma, n))

    return fn


def streaming_ewma(
    stream: DataFrame, alpha: float = 0.3, key_col: str = "stream_id"
) -> DataFrame:
    """Per-key running EWMA over a streaming (or grouped batch) DataFrame
    with rows (stream_id, ts, value). Emits one row per input row."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _ewma_update(alpha),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_batch(df: DataFrame, alpha: float = 0.3, key_col: str = "stream_id") -> DataFrame:
    """Batch EWMA cross-check: same recurrence via aggregate over a collected
    per-key ordered array. ewma_t = alpha*v_t + (1-alpha)*ewma_{t-1}.

    Exact closed form per row i: sum_j w_ij v_j with geometric weights — here
    computed with an array fold (exact same float op order as streaming)."""
    rows = df.groupBy(key_col).agg(
        F.sort_array(F.collect_list(F.struct("ts", "value"))).alias("pts")
    )
    folded = rows.select(
        key_col,
        F.aggregate(
            "pts",
            F.expr(
                "CAST(array() AS array<struct<ts:bigint,value:double,ewma:double,n_seen:bigint>>)"
            ),
            lambda acc, p: F.concat(
                acc,
                F.array(
                    F.struct(
                        p.getField("ts").alias("ts"),
                        p.getField("value").alias("value"),
                        F.when(
                            F.size(acc) == 0, p.getField("value")
                        ).otherwise(
                            F.lit(alpha) * p.getField("value")
                            + F.lit(1 - alpha) * F.element_at(acc, -1).getField("ewma")
                        ).alias("ewma"),
                        (F.size(acc) + 1).cast("long").alias("n_seen"),
                    )
                ),
            ),
        ).alias("out"),
    )
    return folded.select(key_col, F.explode("out").alias("o")).select(
        key_col, "o.ts", "o.value", "o.ewma", "o.n_seen"
    )
