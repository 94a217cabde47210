import pytest

from tachyon_spark.connection import Connection


def _fill(conn):
    conn.create_stream('tb{k="1"}', "f64")
    ins = conn.prepare_insert('tb{k="1"}')
    # 3 daily buckets of ms timestamps
    for ts, v in [(10, 1.0), (86_400_000 + 10, 2.0), (2 * 86_400_000 + 10, 3.0)]:
        ins.insert(ts, v)
    ins.flush()


def test_bucketed_layout_roundtrip(spark, tmp_path):
    conn = Connection(str(tmp_path / "db"), spark, time_bucket=86_400_000)
    _fill(conn)
    # all rows
    assert conn.query('tb{k="1"}', 0, 10 * 86_400_000).rows() == [
        (10, 1.0),
        (86_400_010, 2.0),
        (172_800_010, 3.0),
    ]
    # narrow range hits only the middle bucket
    assert conn.query('tb{k="1"}', 86_400_000, 2 * 86_400_000 - 1).rows() == [
        (86_400_010, 2.0)
    ]


def test_bucket_partition_pruning(spark, tmp_path):
    conn = Connection(str(tmp_path / "db"), spark, time_bucket=86_400_000)
    _fill(conn)
    df = conn.query('tb{k="1"}', 86_400_000, 2 * 86_400_000 - 1).df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ts_bucket" in plan  # bucket filter reached the scan


def test_bucketed_dirs_on_disk(spark, tmp_path):
    conn = Connection(str(tmp_path / "db"), spark, time_bucket=86_400_000)
    _fill(conn)
    sid = conn.get_all_streams()[0].stream_id
    base = tmp_path / "db" / "samples" / f"stream_id={sid}"
    assert sorted(p.name for p in base.iterdir() if p.is_dir()) == [
        "ts_bucket=0",
        "ts_bucket=1",
        "ts_bucket=2",
    ]


def test_config_persistence(spark, tmp_path):
    db = str(tmp_path / "db")
    Connection(db, spark, time_bucket=1000)
    reopened = Connection(db, spark)  # layout read from config
    assert reopened.time_bucket == 1000
    with pytest.raises(ValueError):
        Connection(db, spark, time_bucket=2000)


def test_unbucketed_default_unchanged(spark, tmp_path):
    conn = Connection(str(tmp_path / "db2"), spark)
    assert conn.time_bucket is None
    _fill(conn)
    assert len(conn.query('tb{k="1"}', 0, 10 * 86_400_000).rows()) == 3
