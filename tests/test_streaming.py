import time

from pyspark.sql import functions as F

from tachyon_spark.connection import SAMPLES_SCHEMA
from tachyon_spark.streaming import (
    session_window_agg,
    sliding_window_agg,
    start_stream_ingest,
    tumbling_window_agg,
)
from tachyon_spark.streaming.ingest import stream_source


def _drop_batch(spark, d, rows):
    spark.createDataFrame(rows, SAMPLES_SCHEMA).coalesce(1).write.mode("append").parquet(d)


def test_stream_ingest_available_now(db, tmp_path):
    db.create_stream('s{k="1"}', "f64")
    sid = db.get_all_streams()[0].stream_id
    src = str(tmp_path / "drops")
    _drop_batch(db.spark, src, [(sid, 10, 1.0, None), (sid, 20, 2.0, None)])
    _drop_batch(db.spark, src, [(sid, 30, 3.0, None)])
    q = start_stream_ingest(db, src, trigger_once=True)
    q.awaitTermination(120)
    assert db.query('s{k="1"}', 0, 100).rows() == [(10, 1.0), (20, 2.0), (30, 3.0)]


def test_stream_ingest_incremental(db, tmp_path):
    """Second availableNow run picks up only new files (checkpoint works)."""
    db.create_stream('s{k="2"}', "f64")
    sid = db.get_all_streams()[0].stream_id
    src = str(tmp_path / "drops2")
    _drop_batch(db.spark, src, [(sid, 1, 1.0, None)])
    start_stream_ingest(db, src, trigger_once=True).awaitTermination(120)
    _drop_batch(db.spark, src, [(sid, 2, 2.0, None)])
    start_stream_ingest(db, src, trigger_once=True).awaitTermination(120)
    assert db.query('s{k="2"}', 0, 100).rows() == [(1, 1.0), (2, 2.0)]


def test_stream_ingest_interleaves_with_batch(db, tmp_path):
    """Streamed appends must not hide batch-written samples (the parquet
    sink's _spark_metadata log would; foreachBatch keeps one table)."""
    db.create_stream('s{k="3"}', "f64")
    sid = db.get_all_streams()[0].stream_id
    ins = db.prepare_insert('s{k="3"}')
    ins.insert(1, 1.0)
    ins.flush()
    src = str(tmp_path / "drops3")
    _drop_batch(db.spark, src, [(sid, 2, 2.0, None)])
    start_stream_ingest(db, src, trigger_once=True).awaitTermination(120)
    ins.insert(3, 3.0)
    ins.flush()
    assert db.query('s{k="3"}', 0, 100).rows() == [(1, 1.0), (2, 2.0), (3, 3.0)]


def _mk_batch_df(spark, rows):
    return spark.createDataFrame(rows, "ts long, key string, value double")


US = 1_000_000


def test_tumbling_window_batch(spark):
    df = _mk_batch_df(
        spark,
        [(0, "a", 1.0), (30 * US, "a", 3.0), (90 * US, "a", 5.0)],
    )
    out = tumbling_window_agg(df, "1 minute", keys=["key"]).collect()
    by_start = {r.window_start_us: r for r in out}
    assert by_start[0].n == 2 and by_start[0].sum_value == 4.0
    assert by_start[60 * US].n == 1 and by_start[60 * US].avg_value == 5.0


def test_sliding_window_batch(spark):
    df = _mk_batch_df(spark, [(45 * US, "a", 2.0)])
    out = sliding_window_agg(df, "1 minute", "30 seconds").collect()
    starts = sorted(r.window_start_us for r in out)
    assert starts == [0, 30 * US]  # row lands in 2 overlapping windows


def test_session_window_batch(spark):
    df = _mk_batch_df(
        spark,
        [(0, "a", 1.0), (10 * US, "a", 1.0), (200 * US, "a", 1.0)],
    )
    out = session_window_agg(df, "30 seconds", keys=["key"]).collect()
    assert len(out) == 2  # 10s gap merges, 190s gap splits
    ns = sorted(r.n for r in out)
    assert ns == [1, 2]


def test_streaming_windowed_agg_with_watermark(db, tmp_path):
    """End-to-end: streaming source → watermark → tumbling window → memory sink."""
    src = str(tmp_path / "wdrops")
    rows = [("s1", 0, 1.0, None), ("s1", 30 * US, 3.0, None), ("s1", 90 * US, 5.0, None)]
    _drop_batch(db.spark, src, rows)
    stream = stream_source(db, src)
    agg = tumbling_window_agg(stream, "1 minute", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("append")  # watermark makes append legal on a stream
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has closed; with
    # availableNow the final watermark closes the first window at least.
    out = db.spark.sql("SELECT * FROM win_test").collect()
    assert {r.window_start_us for r in out} <= {0, 60 * US}
    complete = {r.window_start_us: r for r in out}
    if 0 in complete:
        assert complete[0].n == 2 and complete[0].sum_value == 4.0


def test_watermark_drops_late_rows(db, tmp_path):
    """Late-data contract: once the watermark has CLOSED a window (an
    eviction happens at the end of the batch after the watermark advances
    past window end), a late row for it is dropped, not resurrected —
    the bounded-state guarantee watermarks exist for."""
    import time

    src = str(tmp_path / "latedrops")
    # file 1 advances event time to 20 min; file 2 pushes the watermark
    # batch that EVICTS window 0; file 3 is a late row for window 0
    _drop_batch(db.spark, src, [("s1", 0, 1.0, None), ("s1", 1200 * US, 7.0, None)])
    time.sleep(1.1)  # distinct mtimes => deterministic file order
    _drop_batch(db.spark, src, [("s1", 2400 * US, 9.0, None)])
    time.sleep(1.1)
    _drop_batch(db.spark, src, [("s1", 30 * US, 100.0, None)])
    stream = (
        db.spark.readStream.schema(db.samples_df().schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("stream_id", "ts", "value")
    )
    agg = tumbling_window_agg(stream, "1 minute", watermark="5 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(90)
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped == 1
    out = {r.window_start_us: r for r in db.spark.sql("SELECT * FROM late_test").collect()}
    assert out[0].n == 1 and out[0].sum_value == 1.0  # late 100.0 not merged


# ------------------------------------------------- stream-stream join
def _ts_rows(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_ts timestamp")


def test_stream_attribution_join_streaming_matches_batch(db, tmp_path):
    """Stream-stream interval join: availableNow streaming result ==
    the same call on batch frames (the replayable oracle)."""
    import datetime as dt

    from tachyon_spark.streaming import stream_attribution_join

    spark = db.spark
    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    imps = [(1, t(0)), (1, t(100)), (2, t(10)), (3, t(0))]
    convs = [(1, t(30)), (2, t(400)), (3, t(299)), (4, t(5))]
    imp_dir, conv_dir = str(tmp_path / "imp"), str(tmp_path / "conv")
    _ts_rows(spark, imps).coalesce(1).write.parquet(imp_dir)
    _ts_rows(spark, convs).coalesce(1).write.parquet(conv_dir)

    schema = "user_id long, event_ts timestamp"
    s_imp = spark.readStream.schema(schema).parquet(imp_dir)
    s_conv = spark.readStream.schema(schema).parquet(conv_dir)
    out = stream_attribution_join(s_imp, s_conv, within="5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["lag_s"])
        for r in spark.sql("SELECT * FROM attrib").collect()
    )
    # user1: conv@30 matches imp@0 (lag 30) but NOT imp@100 (conv before);
    # user2: conv@400 vs imp@10 -> lag 390 > 300 -> no match;
    # user3: conv@299 matches imp@0 (lag 299 <= 300); user4: no imp
    assert got == [(1, 30.0), (3, 299.0)]

    batch = stream_attribution_join(
        _ts_rows(spark, imps), _ts_rows(spark, convs), within="5 minutes"
    )
    got_batch = sorted((r["user_id"], r["lag_s"]) for r in batch.collect())
    assert got_batch == got


def test_stream_attribution_join_left_outer_batch(db):
    import datetime as dt

    from tachyon_spark.streaming import stream_attribution_join

    spark = db.spark
    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    imps = _ts_rows(spark, [(1, t(0)), (2, t(0))])
    convs = _ts_rows(spark, [(1, t(10))])
    out = stream_attribution_join(imps, convs, within="1 minutes", how="leftOuter")
    rows = {r["user_id"]: r["lag_s"] for r in out.collect()}
    assert rows[1] == 10.0 and rows[2] is None
    import pytest

    with pytest.raises(ValueError):
        stream_attribution_join(imps, convs, how="full")
