from pyspark.sql import functions as F

from tachyon_spark.connection import SAMPLES_SCHEMA
from tachyon_spark.streaming.stateful import ewma_batch, streaming_ewma


def _expected_ewma(values, alpha=0.3):
    out, e = [], None
    for v in values:
        e = v if e is None else alpha * v + (1 - alpha) * e
        out.append(e)
    return out


def test_ewma_batch(spark):
    rows = [("a", t, float(v)) for t, v in zip([10, 20, 30, 40], [1, 2, 3, 4])] + [
        ("b", 10, 10.0),
        ("b", 20, 20.0),
    ]
    df = spark.createDataFrame(rows, "stream_id string, ts long, value double")
    out = {
        (r.stream_id, r.ts): (r.ewma, r.n_seen)
        for r in ewma_batch(df, alpha=0.3).collect()
    }
    exp_a = _expected_ewma([1.0, 2.0, 3.0, 4.0])
    for i, ts in enumerate([10, 20, 30, 40]):
        assert abs(out[("a", ts)][0] - exp_a[i]) < 1e-9
        assert out[("a", ts)][1] == i + 1
    assert out[("b", 20)][0] == 0.3 * 20.0 + 0.7 * 10.0


def test_streaming_ewma_with_idle_timeout(spark, tmp_path):
    """ProcessingTimeTimeout wiring: with a long timeout nothing expires in
    one availableNow run, so results match the no-timeout path (the expiry
    branch drops state for streams gone idle in long-running queries)."""
    src = str(tmp_path / "ewma_timeout")
    rows = [("a", 10, 1.0, None), ("a", 20, 2.0, None)]
    spark.createDataFrame(rows, SAMPLES_SCHEMA).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(SAMPLES_SCHEMA)
        .parquet(src)
        .select("stream_id", "ts", "value")
    )
    q = (
        streaming_ewma(stream, alpha=0.3, idle_timeout_ms=3_600_000)
        .writeStream.format("memory")
        .queryName("ewma_to")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.ts: r.ewma for r in spark.sql("SELECT * FROM ewma_to").collect()}
    assert got == {10: 1.0, 20: 0.3 * 2.0 + 0.7 * 1.0}


def test_ewma_segmented_any_bucket_count(spark):
    """The segmented scan must reproduce the sequential recurrence for ANY
    bucket count (splits mid-key force affine cross-bucket composition)."""
    import random

    from tachyon_spark.streaming.stateful import ewma_final

    rnd = random.Random(7)
    vals = {k: [round(rnd.uniform(-50, 150), 3) for _ in range(200)] for k in ("a", "b")}
    rows = [(k, 1000 + 7 * i, v) for k, vs in vals.items() for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "stream_id string, ts long, value double")
    exp = {k: _expected_ewma(vs)[-1] for k, vs in vals.items()}
    for n in (1, 2, 3, 17, 64):
        got = {r.stream_id: r.ewma for r in ewma_final(df, 0.3, n_buckets=n).collect()}
        for k in exp:
            assert abs(got[k] - exp[k]) < 1e-9, (n, k)
        per_row = ewma_batch(df, 0.3, n_buckets=n)
        got_rows = {(r.stream_id, r.ts): (r.ewma, r.n_seen) for r in per_row.collect()}
        for k, vs in vals.items():
            seq = _expected_ewma(vs)
            for i in (0, 1, 99, 199):
                e, ns = got_rows[(k, 1000 + 7 * i)]
                assert abs(e - seq[i]) < 1e-9 and ns == i + 1, (n, k, i)


def test_streaming_ewma_matches_batch(spark, tmp_path):
    """Stream the same rows through applyInPandasWithState; state must carry
    across micro-batches (two drops → two batches with maxFilesPerTrigger=1)."""
    src = str(tmp_path / "ewma_drops")
    b1 = [("a", 10, 1.0, None), ("a", 20, 2.0, None)]
    b2 = [("a", 30, 3.0, None), ("a", 40, 4.0, None)]
    for batch in (b1, b2):
        spark.createDataFrame(batch, SAMPLES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(SAMPLES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("stream_id", "ts", "value")
    )
    q = (
        streaming_ewma(stream, alpha=0.3)
        .writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.ts: (r.ewma, r.n_seen)
        for r in spark.sql("SELECT * FROM ewma_out").collect()
    }
    exp = _expected_ewma([1.0, 2.0, 3.0, 4.0])
    assert len(got) == 4
    for i, ts in enumerate([10, 20, 30, 40]):
        assert abs(got[ts][0] - exp[i]) < 1e-9, (ts, got[ts], exp[i])
        assert got[ts][1] == i + 1


def test_streaming_dedup_state_across_batches(spark, tmp_path):
    """Duplicates split ACROSS drops must still be flagged — state has to
    survive micro-batch boundaries — and the first occurrence never is."""
    import os
    import time

    from pyspark.sql import functions as F

    from tachyon_spark.streaming.stateful import streaming_dedup

    drops = [
        [(1, "alpha"), (2, "beta")],
        [(3, "alpha"), (4, "gamma")],      # 3 dups 1 across batches
        [(5, "beta"), (6, "alpha"), (7, "delta")],
    ]
    src = tmp_path / "drops"
    src.mkdir()
    base = time.time() - 100
    for k, rows in enumerate(drops):
        df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
        stage = tmp_path / f"stage{k}"
        df.write.mode("overwrite").parquet(str(stage))
        f = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        dst = src / f"drop-{k}.parquet"
        os.rename(stage / f, dst)
        os.utime(dst, (base + k * 10, base + k * 10))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out_dir = str(tmp_path / "out")
    q = (
        streaming_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {r.doc_id: (r.is_dup, r.dup_of) for r in spark.read.parquet(out_dir).collect()}
    assert got == {
        1: (False, None), 2: (False, None),
        3: (True, 1), 4: (False, None),
        5: (True, 2), 6: (True, 1), 7: (False, None),
    }


def test_streaming_alert_run_spans_batches(spark, tmp_path):
    """A violating run split across micro-batches must keep its
    active_since (state store) so the hold duration elapses across the
    boundary: pending in batch 1, firing in batch 2, resolved in batch 3."""
    import os
    import time

    from tachyon_spark.streaming.stateful import streaming_alert

    drops = [
        [("a", 10, 50.0), ("a", 20, 60.0)],              # run starts at 10
        [("a", 30, 70.0), ("b", 30, 5.0)],               # 30-10 >= 20: firing
        [("a", 40, 1.0), ("a", 50, 90.0)],               # resolved, new run
    ]
    src = tmp_path / "drops"
    src.mkdir()
    base = time.time() - 100
    for k, rows in enumerate(drops):
        df = spark.createDataFrame(
            rows, "stream_id string, ts long, value double"
        ).coalesce(1)
        stage = tmp_path / f"stage{k}"
        df.write.mode("overwrite").parquet(str(stage))
        f = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        dst = src / f"drop-{k}.parquet"
        os.rename(stage / f, dst)
        os.utime(dst, (base + k * 10, base + k * 10))
    stream = (
        spark.readStream.schema("stream_id string, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out_dir = str(tmp_path / "out")
    q = (
        streaming_alert(stream, threshold=40.0, for_=20)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        (r.stream_id, r.ts): (r.active_since, r.state)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        ("a", 10): (10, "pending"),
        ("a", 20): (10, "pending"),       # 20 - 10 < 20
        ("a", 30): (10, "firing"),        # held 20 across the batch gap
        ("a", 40): (10, "resolved"),      # run ends, one transition row
        ("a", 50): (50, "pending"),       # fresh run, new active_since
    }
    # "b" never violates and never had a run: no rows at all
    assert not [k for k in got if k[0] == "b"]


def test_streaming_alert_for_zero(spark, tmp_path):
    """for_=0 fires on the first violating sample."""
    from tachyon_spark.streaming.stateful import streaming_alert

    df = spark.createDataFrame(
        [("a", 1, 99.0)], "stream_id string, ts long, value double"
    )
    src = tmp_path / "one"
    df.write.parquet(str(src))
    stream = spark.readStream.schema(
        "stream_id string, ts long, value double"
    ).parquet(str(src))
    out_dir = str(tmp_path / "out0")
    q = (
        streaming_alert(stream, threshold=40.0)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck0"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    [r] = spark.read.parquet(out_dir).collect()
    assert (r.ts, r.active_since, r.state) == (1, 1, "firing")


def test_streaming_alert_keep_firing_for(spark, tmp_path):
    """A firing alert rides out false evaluations within keep_firing_for
    of the last true one (same incident, rows stay 'firing'); beyond it,
    one resolved row."""
    from tachyon_spark.streaming.stateful import streaming_alert

    rows = [
        ("a", 10, 99.0), ("a", 20, 99.0),      # fires at 20 (for_=10)
        ("a", 25, 1.0),                        # within keep=10 of 20
        ("a", 28, 99.0),                       # same incident continues
        ("a", 50, 1.0),                        # 50-28=22 > keep: resolved
    ]
    df = spark.createDataFrame(rows, "stream_id string, ts long, value double")
    src = tmp_path / "k"
    df.coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(
        "stream_id string, ts long, value double"
    ).parquet(str(src))
    out_dir = str(tmp_path / "outk")
    q = (
        streaming_alert(stream, threshold=40.0, for_=10, keep_firing_for=10)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckk"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        r.ts: (r.active_since, r.state)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        10: (10, "pending"),
        20: (10, "firing"),
        25: (10, "firing"),   # bridged false evaluation
        28: (10, "firing"),   # incident identity preserved
        50: (10, "resolved"),
    }
