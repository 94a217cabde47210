import os

from pyspark.sql import functions as F

from tachyon_spark.sources import export_csv, import_csv, samples_file_stats


def test_import_csv_roundtrip(db, tmp_path):
    db.create_stream('cpu{host="a"}', "f64")
    csv = tmp_path / "in.csv"
    csv.write_text("Timestamp,Value\n10,1.5\n20,2.5\n30,3.5\n")
    n = import_csv(db, 'cpu{host="a"}', str(csv))
    assert n == 3
    q = db.query('cpu{host="a"}', 0, 100)
    assert q.rows() == [(10, 1.5), (20, 2.5), (30, 3.5)]


def test_import_csv_integer_stream(db, tmp_path):
    db.create_stream('reqs{host="a"}', "i64")
    csv = tmp_path / "in.csv"
    csv.write_text("Timestamp,Value\n10,100\n20,200\n")
    import_csv(db, 'reqs{host="a"}', str(csv))
    assert db.query('reqs{host="a"}', 0, 100).rows() == [(10, 100), (20, 200)]


def test_export_csv(db, tmp_path, spark):
    db.create_stream('cpu{host="b"}', "f64")
    ins = db.prepare_insert('cpu{host="b"}')
    for ts, v in [(1, 1.0), (2, 2.0)]:
        ins.insert(ts, v)
    ins.flush()
    out = str(tmp_path / "out_csv")
    export_csv(db.query('cpu{host="b"}', 0, 10).df(), out)
    back = spark.read.csv(out, header=True, inferSchema=True)
    assert sorted((r.Timestamp, r.Value) for r in back.collect()) == [(1, 1.0), (2, 2.0)]


def test_typed_insert_validation(db):
    import pytest

    db.create_stream('ty{k="i"}', "i64")
    db.create_stream('ty{k="u"}', "u64")
    ins_i = db.prepare_insert('ty{k="i"}')
    ins_i.insert(1, -5)  # negative ok for i64
    ins_i.insert(2, 3.0)  # integral float ok
    with pytest.raises(TypeError):
        ins_i.insert(3, 2.5)  # fractional on int stream
    ins_u = db.prepare_insert('ty{k="u"}')
    with pytest.raises(TypeError):
        ins_u.insert(1, -1)  # negative on u64


def test_delete_stream(db):
    db.create_stream('del{k="1"}', "f64")
    db.create_stream('del{k="2"}', "f64")
    ins = db.prepare_insert('del{k="1"}')
    ins.insert(1, 1.0)
    ins.flush()
    assert db.delete_stream('del{k="1"}') == 1
    assert not db.check_stream_exists('del{k="1"}')
    assert db.check_stream_exists('del{k="2"}')
    import pytest

    with pytest.raises(ValueError):  # selector no longer resolves
        db.query('del{k="1"}', 0, 10)


def test_samples_file_stats(db):
    db.create_stream('cpu{host="c"}', "f64")
    ins = db.prepare_insert('cpu{host="c"}')
    for ts, v in [(1, 1.0), (2, 5.0), (3, 3.0)]:
        ins.insert(ts, v)
    ins.flush()
    stats = samples_file_stats(db).collect()
    assert len(stats) == 1
    row = stats[0]
    assert row["min_timestamp"] == 1 and row["max_timestamp"] == 3
    assert row["count"] == 3
    assert row["value_sum"] == 9.0
    assert row["min_value"] == 1.0 and row["max_value"] == 5.0
    assert row["first_value"] == 1.0
    assert row["file_bytes"] > 0 and row["compression_ratio"] is not None
    assert os.path.exists(row["file"])


def test_register_views_sql_surface(db):
    """The SQL escape hatch: samples + catalog as temp views, joinable."""
    db.create_stream('sqlv{k="1"}', "f64")
    ins = db.prepare_insert('sqlv{k="1"}')
    ins.insert(10, 1.5)
    ins.insert(20, 2.5)
    ins.flush()
    db.register_views()
    out = db.spark.sql(
        """
        SELECT st.name, count(*) AS n, sum(sa.value) AS s
        FROM tachyon_samples sa JOIN tachyon_streams st USING (stream_id)
        WHERE st.name = 'sqlv' GROUP BY st.name
        """
    ).collect()
    assert [(r.name, r.n, r.s) for r in out] == [("sqlv", 2, 4.0)]


def test_jsonl_round_trip(spark, tmp_path):
    import json

    from tachyon_spark.connection import Connection
    from tachyon_spark.sources.csv_io import export_jsonl, import_jsonl

    conn = Connection(str(tmp_path / "db"), spark)
    conn.create_stream('jl{k="1"}', "f64")
    src = tmp_path / "in.jsonl"
    src.write_text("\n".join(json.dumps({"ts": t, "value": v}) for t, v in
                             [(10, 1.5), (20, 2.5), (30, 3.5)]))
    assert import_jsonl(conn, 'jl{k="1"}', str(src)) == 3
    q = conn.query('jl{k="1"}', 0, 100)
    assert q.rows() == [(10, 1.5), (20, 2.5), (30, 3.5)]
    out = tmp_path / "out"
    export_jsonl(q.df(), str(out))
    back = spark.read.json(str(out))
    assert sorted((r.ts, r.value) for r in back.collect()) == q.rows()


def test_jsonl_integer_stream_typed(spark, tmp_path):
    import json

    from tachyon_spark.connection import Connection
    from tachyon_spark.sources.csv_io import import_jsonl

    conn = Connection(str(tmp_path / "db"), spark)
    conn.create_stream('jli{k="1"}', "i64")
    src = tmp_path / "in.jsonl"
    src.write_text(json.dumps({"ts": 5, "value": 42}))
    assert import_jsonl(conn, 'jli{k="1"}', str(src)) == 1
    assert conn.query('jli{k="1"}', 0, 10).rows() == [(5, 42)]


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """write_bucketed pays the shuffle once: a later equi-join of two
    tables bucketed on the same key plans with NO Exchange (and, with
    sortBy, no extra Sort) — the repeated-join co-location contract."""
    from pyspark.sql import functions as F

    from tachyon_spark.sources import (
        is_exchange_free_join,
        read_bucketed,
        write_bucketed,
    )

    a = spark.range(0, 1000).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("x")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("user_id"), (F.col("id") % 3).alias("y")
    )
    write_bucketed(a, "tb_a", ["user_id"], n_buckets=8,
                   sort_cols=["user_id"], path=str(tmp_path / "a"))
    write_bucketed(b, "tb_b", ["user_id"], n_buckets=8,
                   sort_cols=["user_id"], path=str(tmp_path / "b"))
    ra, rb = read_bucketed(spark, "tb_a"), read_bucketed(spark, "tb_b")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert is_exchange_free_join(ra, rb, ["user_id"])
        joined = ra.join(rb, "user_id")
        assert joined.count() == 1000
        # a plain parquet read of the same files LOSES the bucket spec
        plain = spark.read.parquet(str(tmp_path / "a"))
        assert not is_exchange_free_join(plain, rb, ["user_id"])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS tb_a")
        spark.sql("DROP TABLE IF EXISTS tb_b")

    import pytest

    with pytest.raises(ValueError):
        write_bucketed(a, "tb_bad", [], n_buckets=8)
