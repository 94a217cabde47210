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
