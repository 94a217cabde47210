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

from typing import Iterator, Tuple

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


def _ewma_update(alpha: float, idle_timeout_ms: int | None = None):
    def fn(
        key: Tuple[str],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if idle_timeout_ms and state.hasTimedOut:
            # stream went idle past the timeout: drop its state (bounded
            # state store — dead streams never accumulate)
            state.remove()
            return
        if state.exists:
            ewma, n = state.get
        else:
            ewma, n = None, 0
        # One group's micro-batch rows can arrive as several Arrow chunks in
        # arbitrary order; concatenate and sort ONCE by (ts, value) — the
        # engine-wide deterministic tie-break — so the fold order matches the
        # batch forms (sort_array of (ts, value) structs) and any replay.
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts", "value"], kind="mergesort")
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
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)

    return fn


def streaming_ewma(
    stream: DataFrame,
    alpha: float = 0.3,
    key_col: str = "stream_id",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running EWMA over a streaming (or grouped batch) DataFrame
    with rows (stream_id, ts, value). Emits one row per input row.

    idle_timeout_ms: expire a stream's state after this much processing
    time without new samples (its next sample restarts the EWMA fresh)."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _ewma_update(alpha, idle_timeout_ms),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms
            else GroupStateTimeout.NoTimeout
        ),
    )


# ---------------------------------------------------------------- batch form
#
# EWMA is a linear recurrence, so a segment of the sequence composes to one
# affine map: running e_in through rows (v_1..v_n) yields
#     e_out = C + (1-alpha)^n * e_in,   C = zero-seeded fold of the segment.
# That makes a SEGMENTED SCAN possible: split each key's sequence into coarse
# ts-range buckets, fold each bucket independently (bounded work per task),
# then compose the per-bucket affine maps in bucket order — a per-key fold
# over <= n_buckets summaries, never over the raw rows. No unbounded
# collect_list anywhere; state per row stays O(1).


def _bucketize(df: DataFrame, key_col: str, n_buckets: int):
    """Assign each row a contiguous per-key ts-range bucket (monotone in ts)."""
    rng = df.groupBy(key_col).agg(
        F.min("ts").alias("__tmin"), F.max("ts").alias("__tmax")
    )
    width = (F.col("__tmax") - F.col("__tmin") + F.lit(1)).cast("double")
    bkt = F.floor(
        (F.col("ts") - F.col("__tmin")).cast("double") / width * n_buckets
    ).cast("long")
    return df.join(F.broadcast(rng), key_col).select(
        key_col, "ts", "value", bkt.alias("__bkt")
    )


def _segment_summaries(seg: DataFrame, key_col: str, alpha: float):
    """Per (key, bucket): C (zero-seeded fold), S (null-seeded fold, i.e. the
    true EWMA if the sequence starts here) and the row count. Scalars only."""
    q = 1.0 - alpha
    zero = F.struct(
        F.lit(0.0).alias("c"), F.lit(None).cast("double").alias("s"),
        F.lit(0).cast("long").alias("n"),
    )
    step = lambda acc, p: F.struct(
        (F.lit(alpha) * p.getField("value") + F.lit(q) * acc.getField("c")).alias("c"),
        F.when(acc.getField("s").isNull(), p.getField("value"))
        .otherwise(F.lit(alpha) * p.getField("value") + F.lit(q) * acc.getField("s"))
        .alias("s"),
        (acc.getField("n") + 1).alias("n"),
    )
    return seg.select(
        key_col, "__bkt", F.aggregate("pts", zero, step).alias("sm")
    ).select(key_col, "__bkt", "sm.c", "sm.s", "sm.n")


def _carry_in(summ: DataFrame, key_col: str, alpha: float):
    """Per (key, bucket): the EWMA state entering the bucket (`e_in`, null for
    the first non-empty bucket) and rows seen before it. A per-key fold over
    the <= n_buckets summaries — tiny."""
    q = 1.0 - alpha
    per_key = summ.groupBy(key_col).agg(
        F.sort_array(F.collect_list(F.struct("__bkt", "c", "s", "n"))).alias("segs")
    )
    acc0 = F.expr(
        "named_struct('entries', CAST(array() AS array<struct<bkt:bigint,e_in:double,n_before:bigint>>), "
        "'e', CAST(NULL AS double), 'n', CAST(0 AS bigint))"
    )
    step = lambda acc, s: F.struct(
        F.concat(
            acc.getField("entries"),
            F.array(F.struct(
                s.getField("__bkt").alias("bkt"),
                acc.getField("e").alias("e_in"),
                acc.getField("n").alias("n_before"),
            )),
        ).alias("entries"),
        F.when(acc.getField("e").isNull(), s.getField("s"))
        .otherwise(
            s.getField("c")
            + F.pow(F.lit(q), s.getField("n").cast("double")) * acc.getField("e")
        ).alias("e"),
        (acc.getField("n") + s.getField("n")).alias("n"),
    )
    folded = per_key.select(
        key_col, F.aggregate("segs", acc0, step).alias("st")
    )
    carried = folded.select(key_col, F.explode("st.entries").alias("en")).select(
        key_col, F.col("en.bkt").alias("__bkt"), "en.e_in", "en.n_before"
    )
    final = folded.select(key_col, F.col("st.e").alias("ewma"))
    return carried, final


def ewma_batch(
    df: DataFrame,
    alpha: float = 0.3,
    key_col: str = "stream_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """Per-row batch EWMA, segmented-scan form (cross-check for streaming).

    Within each (key, ts-range bucket) the fold is the exact sequential
    recurrence; across buckets the carried state enters as
    `L_i + (1-alpha)^i * e_in` (affine composition). Work per task is bounded
    by the bucket size, so one huge key cannot pin a single task the way a
    whole-group collect_list would."""
    q = 1.0 - alpha
    if n_buckets is None:
        n_buckets = max(2 * df.sparkSession.sparkContext.defaultParallelism, 8)
    seg = (
        _bucketize(df, key_col, n_buckets)
        .groupBy(key_col, "__bkt")
        .agg(F.sort_array(F.collect_list(F.struct("ts", "value"))).alias("pts"))
    )
    carried, _ = _carry_in(_segment_summaries(seg, key_col, alpha), key_col, alpha)

    # per-row zero-seeded (L) and null-seeded (S) folds within the bucket
    acc0 = F.expr(
        "CAST(array() AS array<struct<ts:bigint,value:double,L:double,S:double>>)"
    )
    step = lambda acc, p: F.concat(
        acc,
        F.array(F.struct(
            p.getField("ts").alias("ts"),
            p.getField("value").alias("value"),
            (F.lit(alpha) * p.getField("value")
             + F.lit(q) * F.when(F.size(acc) == 0, F.lit(0.0))
             .otherwise(F.element_at(acc, -1).getField("L"))
             ).alias("L"),
            F.when(F.size(acc) == 0, p.getField("value"))
            .otherwise(F.lit(alpha) * p.getField("value")
                       + F.lit(q) * F.element_at(acc, -1).getField("S"))
            .alias("S"),
        )),
    )
    rows = seg.select(key_col, "__bkt", F.aggregate("pts", acc0, step).alias("rows"))
    out = rows.join(F.broadcast(carried), [key_col, "__bkt"]).select(
        key_col, "e_in", "n_before", F.posexplode("rows").alias("i0", "r")
    )
    i = (F.col("i0") + 1).cast("double")
    ewma = F.when(F.col("e_in").isNull(), F.col("r.S")).otherwise(
        F.col("r.L") + F.pow(F.lit(q), i) * F.col("e_in")
    )
    return out.select(
        key_col,
        F.col("r.ts").alias("ts"),
        F.col("r.value").alias("value"),
        ewma.alias("ewma"),
        (F.col("n_before") + F.col("i0") + 1).alias("n_seen"),
    )


def ewma_final(
    df: DataFrame,
    alpha: float = 0.3,
    key_col: str = "stream_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """Final EWMA per key — pure segmented scan, no per-row arrays at all:
    per-bucket scalar folds, then one per-key fold over <= n_buckets affine
    summaries. Returns (key, ewma)."""
    if n_buckets is None:
        n_buckets = max(2 * df.sparkSession.sparkContext.defaultParallelism, 8)
    seg = (
        _bucketize(df, key_col, n_buckets)
        .groupBy(key_col, "__bkt")
        .agg(F.sort_array(F.collect_list(F.struct("ts", "value"))).alias("pts"))
    )
    _, final = _carry_in(_segment_summaries(seg, key_col, alpha), key_col, alpha)
    return final


# ---------------------------------------------------------------- streaming dedup

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("is_dup", T.BooleanType(), False),
        T.StructField("dup_of", T.LongType(), True),
        T.StructField("n_prior", T.LongType(), False),
    ]
)

DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_id", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def _dedup_update(idle_timeout_ms: int | None = None):
    def fn(
        key: Tuple[str],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if idle_timeout_ms and state.hasTimedOut:
            state.remove()
            return
        first, n = state.get if state.exists else (None, 0)
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            # deterministic intra-batch arrival: ascending doc_id
            pdf = pdf.sort_values("doc_id", kind="mergesort")
            is_dup, dup_of, n_prior = [], [], []
            for d in pdf["doc_id"]:
                n_prior.append(n)
                if first is None:
                    first = int(d)
                    is_dup.append(False)
                    dup_of.append(None)
                else:
                    is_dup.append(True)
                    dup_of.append(first)
                n += 1
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "is_dup": is_dup,
                    "dup_of": pd.array(dup_of, dtype="Int64"),
                    "n_prior": n_prior,
                }
            )
        state.update((first, n))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)

    return fn


def streaming_dedup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming EXACT dedup: mark every document whose text was already
    seen earlier in the stream (first occurrence wins; intra-batch ties
    resolve by ascending id). The online form of functions/dedup.
    exact_dedup — the shape every live ingestion pipeline needs so
    duplicates are flagged at ARRIVAL time, not in a nightly batch.

    State is O(1) per distinct text (first_id, count), keyed by md5(text)
    so the state store never holds document bodies; idle_timeout_ms
    expires keys not seen again (bounded store under content churn).
    Emits one row per input row: (doc_id, is_dup, dup_of, n_prior)."""
    keyed = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("__h"),
    )
    return keyed.groupBy("__h").applyInPandasWithState(
        _dedup_update(idle_timeout_ms),
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms
            else GroupStateTimeout.NoTimeout
        ),
    )


# ------------------------------------------------------------ live alerting

ALERT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("active_since", T.LongType(), True),
        T.StructField("state", T.StringType(), False),
    ]
)

ALERT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("active_since", T.LongType(), True),
        T.StructField("last_true", T.LongType(), True),
        T.StructField("firing", T.BooleanType(), True),
    ]
)


def _alert_update(
    threshold: float,
    for_: int,
    keep: int = 0,
    idle_timeout_ms: int | None = None,
):
    def fn(
        key: Tuple[str],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if idle_timeout_ms and state.hasTimedOut:
            state.remove()
            return
        active_since, last_true, firing = (
            state.get if state.exists else (None, None, False)
        )
        firing = bool(firing)
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values("ts", kind="mergesort")
            ts_o, v_o, since_o, st_o = [], [], [], []
            for ts, v in zip(pdf["ts"], pdf["value"]):
                ts, v = int(ts), float(v)
                if v > threshold:
                    if active_since is None:
                        active_since = ts
                    if ts - active_since >= for_:
                        firing = True
                    last_true = ts
                    ts_o.append(ts)
                    v_o.append(v)
                    since_o.append(active_since)
                    st_o.append("firing" if firing else "pending")
                else:
                    if active_since is not None:
                        if (
                            firing
                            and keep
                            and last_true is not None
                            and ts - last_true <= keep
                        ):
                            # keep_firing_for: a firing alert rides out
                            # false evaluations within `keep` of the last
                            # true one — same incident, still firing
                            ts_o.append(ts)
                            v_o.append(v)
                            since_o.append(active_since)
                            st_o.append("firing")
                            continue
                        # run just ended: one resolved transition row
                        ts_o.append(ts)
                        v_o.append(v)
                        since_o.append(active_since)
                        st_o.append("resolved")
                    active_since, last_true, firing = None, None, False
            if ts_o:
                yield pd.DataFrame(
                    {
                        "stream_id": [key[0]] * len(ts_o),
                        "ts": ts_o,
                        "value": v_o,
                        "active_since": pd.array(since_o, dtype="Int64"),
                        "state": st_o,
                    }
                )
        state.update((active_since, last_true, bool(firing)))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)

    return fn


def streaming_alert(
    stream: DataFrame,
    threshold: float,
    for_: int = 0,
    key_col: str = "stream_id",
    idle_timeout_ms: int | None = None,
    keep_firing_for: int = 0,
) -> DataFrame:
    """LIVE threshold alerting with Prometheus's hold-duration lifecycle:
    per key, a run of consecutive samples with value > threshold is
    `pending` from its first sample's ts (active_since) and `firing` once
    ts - active_since >= for_; the first non-violating sample after an
    active run emits one `resolved` transition row and resets the run.
    The streaming complement of the batch/backfill Connection.alert_rule
    (operators/alerts.py): there the condition evaluates on a step grid,
    here at ARRIVAL time on raw samples — a run survives micro-batch
    boundaries because active_since lives in the state store (O(1) per
    key: one long). Samples sort by ts within each batch; across batches
    the per-key arrival order must be ts-monotone (the append-ingest
    contract, same as streaming_ewma)."""
    keyed = stream.select(
        F.col(key_col).cast("string").alias("stream_id"),
        F.col("ts").cast("long").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )
    return keyed.groupBy("stream_id").applyInPandasWithState(
        _alert_update(
            float(threshold), int(for_), int(keep_firing_for),
            idle_timeout_ms,
        ),
        outputStructType=ALERT_OUTPUT_SCHEMA,
        stateStructType=ALERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms
            else GroupStateTimeout.NoTimeout
        ),
    )
