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
    import re

    conn = Connection(str(tmp_path / "db"), spark, time_bucket=86_400_000)
    _fill(conn)
    import contextlib
    import io

    df = conn.query('tb{k="1"}', 86_400_000, 2 * 86_400_000 - 1).df()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")  # toString() truncates long filter lists
    plan = buf.getvalue()
    # the bucket predicate must land in PartitionFilters (whole-directory
    # pruning), not just the row-level Filter
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None and "ts_bucket" in m.group(1), plan
    # both bucket bounds must prune (>= 1 AND <= 1 for the middle day)
    assert re.search(r"ts_bucket#\d+L? >= 1", m.group(1)), m.group(1)
    assert re.search(r"ts_bucket#\d+L? <= 1", m.group(1)), m.group(1)


def test_bucketed_dirs_on_disk_legacy_layout(spark, tmp_path):
    # stream_buckets=0 pins the rounds-1/2 one-dir-per-stream layout
    conn = Connection(
        str(tmp_path / "db"), spark, time_bucket=86_400_000, stream_buckets=0
    )
    _fill(conn)
    sid = conn.get_all_streams()[0].stream_id
    base = tmp_path / "db" / "samples" / f"stream_id={sid}"
    assert sorted(p.name for p in base.iterdir() if p.is_dir()) == [
        "ts_bucket=0",
        "ts_bucket=1",
        "ts_bucket=2",
    ]


def test_hash_bucketed_dirs_on_disk(spark, tmp_path):
    import zlib

    conn = Connection(str(tmp_path / "db"), spark, time_bucket=86_400_000)
    _fill(conn)
    sid = conn.get_all_streams()[0].stream_id
    b = zlib.crc32(sid.encode()) % conn.stream_buckets
    base = tmp_path / "db" / "samples" / f"stream_bucket={b}"
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
