from tachyon_spark.connection import SAMPLES_SCHEMA
from tachyon_spark.streaming.rollup import (
    read_rollup,
    rollup_batch,
    start_continuous_rollup,
)

HOUR = 3_600_000


def _drop(spark, d, rows):
    spark.createDataFrame(rows, SAMPLES_SCHEMA).coalesce(1).write.mode("append").parquet(d)


def test_continuous_rollup_merges_across_batches(db, tmp_path):
    """Two micro-batches touching the SAME bucket must merge correctly —
    the append-only-partials property."""
    src = str(tmp_path / "drops")
    roll = str(tmp_path / "rollup")
    b1 = [("s1", 10, 1.0, None), ("s1", 20, 3.0, None), ("s1", HOUR + 5, 10.0, None)]
    b2 = [("s1", 30, 5.0, None), ("s2", 40, 7.0, None)]  # bucket 0 again
    _drop(db.spark, src, b1)
    start_continuous_rollup(db, src, roll, HOUR, trigger_once=True).awaitTermination(120)
    _drop(db.spark, src, b2)
    start_continuous_rollup(db, src, roll, HOUR, trigger_once=True).awaitTermination(120)

    got = {
        (r.stream_id, r.bucket_ts): (r["count"], r["sum"], r["avg"], r["min"], r["max"])
        for r in read_rollup(db.spark, roll).collect()
    }
    assert got[("s1", 0)] == (3, 9.0, 3.0, 1.0, 5.0)  # merged from 2 batches
    assert got[("s1", HOUR)] == (1, 10.0, 10.0, 10.0, 10.0)
    assert got[("s2", 0)] == (1, 7.0, 7.0, 7.0, 7.0)

    # equals the direct batch computation over all raw rows
    raw = db.spark.createDataFrame(b1 + b2, SAMPLES_SCHEMA)
    expected = {
        (r.stream_id, r.bucket_ts): (r["count"], r["sum"], r["avg"], r["min"], r["max"])
        for r in rollup_batch(raw, HOUR, ["stream_id"]).collect()
    }
    assert got == expected
