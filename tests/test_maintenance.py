import os

import pytest

from tachyon_spark.connection import Connection
from tachyon_spark.maintenance import compact_all, compact_stream, expire_before

DAY = 86_400_000


def _many_small_flushes(conn, sel, n_flushes=4):
    conn.create_stream(sel, "f64")
    ins = conn.prepare_insert(sel)
    for i in range(n_flushes):
        ins.insert(i * 10, float(i))
        ins.flush()  # one parquet file per flush


def test_compact_merges_files_and_preserves_rows(spark, tmp_path):
    conn = Connection(str(tmp_path / "db"), spark, stream_buckets=0)
    _many_small_flushes(conn, 'c{k="1"}')
    sid = conn.get_all_streams()[0].stream_id
    before = conn.query('c{k="1"}', 0, 1000).rows()
    n_before = compact_stream(conn, sid)
    assert n_before == 4
    part_dir = tmp_path / "db" / "samples" / f"stream_id={sid}"
    files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    assert len(files) == 1
    assert conn.query('c{k="1"}', 0, 1000).rows() == before


def test_compact_bucketed_layout(spark, tmp_path):
    conn = Connection(str(tmp_path / "db"), spark, time_bucket=DAY, stream_buckets=0)
    conn.create_stream('c{k="2"}', "f64")
    ins = conn.prepare_insert('c{k="2"}')
    for i in range(3):
        ins.insert(i * 10, float(i))          # bucket 0
        ins.insert(DAY + i * 10, float(i))    # bucket 1
        ins.flush()
    before = conn.query('c{k="2"}', 0, 10 * DAY).rows()
    compact_all(conn)
    sid = conn.get_all_streams()[0].stream_id
    b0 = tmp_path / "db" / "samples" / f"stream_id={sid}" / "ts_bucket=0"
    assert len([f for f in os.listdir(b0) if f.endswith(".parquet")]) == 1
    assert conn.query('c{k="2"}', 0, 10 * DAY).rows() == before


def test_expire_before_drops_only_full_buckets(spark, tmp_path):
    conn = Connection(str(tmp_path / "db"), spark, time_bucket=DAY)
    conn.create_stream('e{k="1"}', "f64")
    ins = conn.prepare_insert('e{k="1"}')
    for day in range(3):
        ins.insert(day * DAY + 5, float(day))
    ins.flush()
    # cutoff mid-day-1: only day-0's bucket is FULLY below
    dropped = expire_before(conn, DAY + 500)
    assert dropped == 1
    rows = conn.query('e{k="1"}', 0, 10 * DAY).rows()
    assert rows == [(DAY + 5, 1.0), (2 * DAY + 5, 2.0)]


def test_expire_requires_bucketed_layout(spark, tmp_path):
    conn = Connection(str(tmp_path / "db2"), spark)
    with pytest.raises(ValueError):
        expire_before(conn, 100)


def test_compact_hash_bucket_layout(spark, tmp_path):
    # default layout: streams hash into stream_bucket dirs; compaction unit
    # is the bucket, re-clustered by (stream_id, ts)
    conn = Connection(str(tmp_path / "db"), spark)
    _many_small_flushes(conn, 'h{k="1"}')
    sid = conn.get_all_streams()[0].stream_id
    before = conn.query('h{k="1"}', 0, 1000).rows()
    n_before = compact_stream(conn, sid)
    assert n_before == 4
    import zlib

    b = zlib.crc32(sid.encode()) % conn.stream_buckets
    part_dir = tmp_path / "db" / "samples" / f"stream_bucket={b}"
    files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    assert len(files) == 1
    assert conn.query('h{k="1"}', 0, 1000).rows() == before


def test_expire_hash_bucket_layout(spark, tmp_path):
    conn = Connection(str(tmp_path / "db"), spark, time_bucket=DAY)
    conn.create_stream('e{k="2"}', "f64")
    ins = conn.prepare_insert('e{k="2"}')
    for day in range(3):
        ins.insert(day * DAY + 5, float(day))
    ins.flush()
    dropped = expire_before(conn, DAY + 500)
    assert dropped == 1
    assert conn.query('e{k="2"}', 0, 10 * DAY).rows() == [
        (DAY + 5, 1.0),
        (2 * DAY + 5, 2.0),
    ]


def _two_streams(conn):
    for sel, pts in (
        ('d{k="a"}', [(10, 1.0), (20, 2.0), (30, 3.0)]),
        ('d{k="b"}', [(10, 4.0), (20, 5.0)]),
    ):
        conn.create_stream(sel, "f64")
        ins = conn.prepare_insert(sel)
        for t, v in pts:
            ins.insert(t, v)
        ins.flush()


def test_delete_series_range_and_matcher(spark, tmp_path):
    """delete_series drops only the matched stream's samples inside the
    range; metadata stays registered; other streams byte-identical."""
    conn = Connection(str(tmp_path / "db"), spark)
    _two_streams(conn)
    n = conn.delete_series('d{k="a"}', start=15, end=25)
    assert n == 1
    assert conn.query('d{k="a"}', 0, 100).rows() == [(10, 1.0), (30, 3.0)]
    assert conn.query('d{k="b"}', 0, 100).rows() == [(10, 4.0), (20, 5.0)]
    assert conn.check_stream_exists('d{k="a"}')  # metadata survives
    # open-ended: delete everything left of the matched stream
    assert conn.delete_series('d{k="a"}') == 2
    assert conn.query('d{k="a"}', 0, 100).rows() == []


def test_delete_series_no_match_is_noop(spark, tmp_path):
    conn = Connection(str(tmp_path / "db"), spark)
    _two_streams(conn)
    assert conn.delete_series('d{k="zzz"}') == 0
    assert conn.delete_series('d{k="a"}', start=500, end=600) == 0
    assert conn.query('d{k="a"}', 0, 100).rows() == [
        (10, 1.0), (20, 2.0), (30, 3.0)]


def test_delete_series_time_bucketed_prunes(spark, tmp_path):
    """Time-bucketed layout: only overlapping ts_bucket subdirs rewrite;
    a bucket outside the range keeps its exact files."""
    conn = Connection(
        str(tmp_path / "db"), spark, time_bucket=DAY, stream_buckets=0
    )
    conn.create_stream('t{k="1"}', "f64")
    ins = conn.prepare_insert('t{k="1"}')
    for i in range(3):
        ins.insert(i * 10, float(i))         # bucket 0
        ins.insert(DAY + i * 10, 10.0 + i)   # bucket 1
    ins.flush()
    sid = conn.get_all_streams()[0].stream_id
    b0 = tmp_path / "db" / "samples" / f"stream_id={sid}" / "ts_bucket=0"
    before = sorted(os.listdir(b0))
    n = conn.delete_series('t{k="1"}', start=DAY, end=2 * DAY)
    assert n == 3
    assert sorted(os.listdir(b0)) == before  # bucket 0 untouched
    assert conn.query('t{k="1"}', 0, 10 * DAY).rows() == [
        (0, 0.0), (10, 1.0), (20, 2.0)]


def test_delete_series_legacy_layout(spark, tmp_path):
    conn = Connection(str(tmp_path / "db"), spark, stream_buckets=0)
    _two_streams(conn)
    assert conn.delete_series('d{k="b"}', end=10) == 1
    assert conn.query('d{k="b"}', 0, 100).rows() == [(20, 5.0)]


def test_snapshot_restore_and_isolation(spark, tmp_path):
    """snapshot copies a consistent db state; the snapshot path opens as
    a database (the restore story) and is ISOLATED — later writes and
    deletes in the source don't leak into it."""
    db = str(tmp_path / "snapdb")
    conn = Connection(db, spark)
    conn.create_stream('s{k="1"}', "f64")
    ins = conn.prepare_insert('s{k="1"}')
    ins.insert(10, 1.0)
    ins.insert(20, 2.0)
    ins.flush()

    dest = conn.snapshot("snap1")
    assert os.path.isdir(dest)
    # mutate the source AFTER the snapshot
    ins = conn.prepare_insert('s{k="1"}')
    ins.insert(30, 3.0)
    ins.flush()
    conn.delete_series('s{k="1"}', end=10)
    assert conn.query('s{k="1"}', 0, 100).rows() == [(20, 2.0), (30, 3.0)]

    restored = Connection(dest, spark)
    assert restored.query('s{k="1"}', 0, 100).rows() == [(10, 1.0), (20, 2.0)]

    # name hygiene + duplicate protection
    with pytest.raises(ValueError, match="already exists"):
        conn.snapshot("snap1")
    with pytest.raises(ValueError, match="plain directory name"):
        conn.snapshot("../evil")
    # auto-named snapshots work and don't collide with data reads
    auto = conn.snapshot()
    assert os.path.isdir(auto)
    assert conn.query('s{k="1"}', 0, 100).rows() == [(20, 2.0), (30, 3.0)]


def test_delete_series_hash_and_time_bucketed(spark, tmp_path):
    """Combined layout (stream_bucket hash dirs + ts_bucket subdirs):
    range delete prunes to overlapping ts_buckets inside the hash
    bucket, keeps other streams in the same bucket intact."""
    conn = Connection(str(tmp_path / "db"), spark, time_bucket=DAY)
    for sel, base in (('h{k="a"}', 0.0), ('h{k="b"}', 100.0)):
        conn.create_stream(sel, "f64")
        ins = conn.prepare_insert(sel)
        for i in range(2):
            ins.insert(i * 10, base + i)          # day 0
            ins.insert(DAY + i * 10, base + 10 + i)  # day 1
        ins.flush()
    n = conn.delete_series('h{k="a"}', start=DAY)
    assert n == 2
    assert conn.query('h{k="a"}', 0, 10 * DAY).rows() == [
        (0, 0.0), (10, 1.0)]
    assert conn.query('h{k="b"}', 0, 10 * DAY).rows() == [
        (0, 100.0), (10, 101.0), (DAY, 110.0), (DAY + 10, 111.0)]


def test_cache_samples_invalidation(db, spark):
    """cache_samples pins the samples relation (InMemoryTableScan in
    subsequent query plans); EVERY samples mutation — ingest, ranged
    delete, stream delete — invalidates it, so no query ever serves
    pre-mutation data (round 11)."""
    import contextlib
    import io

    from tests.conftest import make_stream

    make_stream(db, "hot", "f64", [(10, 1.0), (20, 2.0)])
    db.cache_samples()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        db.query("hot", 0, 100).df().explain("formatted")
    assert "InMemoryTableScan" in buf.getvalue()
    # ingest invalidates: new sample must be visible
    ins = db.prepare_insert("hot")
    ins.insert(30, 3.0)
    ins.flush()
    assert db.query("hot", 0, 100).rows() == [(10, 1.0), (20, 2.0), (30, 3.0)]
    # ranged delete invalidates
    db.cache_samples()
    assert db.delete_series("hot", 20, 20) == 1
    assert db.query("hot", 0, 100).rows() == [(10, 1.0), (30, 3.0)]
    # stream delete invalidates
    db.cache_samples()
    assert db.delete_stream("hot") == 1
    import pytest as _pt

    with _pt.raises(ValueError, match="[Nn]o streams matched"):
        db.query("hot", 0, 100).rows()
    # after invalidation the plan is back to the parquet scan
    db.uncache_samples()  # idempotent no-op
