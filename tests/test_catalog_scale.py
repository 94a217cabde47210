"""High-cardinality catalog + layout (VERDICT r2 item 1).

Pins the 100x posture: 100k-stream registration and resolution stay
sub-second-ish (log-structured parquet catalog, name-indexed cache), a
wide selector compiles to a broadcast semi-join instead of an unbounded
IN-list, and ingest produces a bounded number of partition directories
regardless of stream count (stream_bucket = crc32(stream_id) % N).
"""

import contextlib
import io
import os
import time

import pytest
from pyspark.sql import functions as F

from tachyon_spark.connection import SAMPLES_SCHEMA, Connection
from tachyon_spark.promql import parse


def _bulk_streams(conn, metric: str, n: int):
    specs = [(f'{metric}{{host="h{i}",dc="dc{i % 4}"}}', "f64") for i in range(n)]
    return conn.create_streams(specs)


def test_100k_stream_create_and_resolve_fast(spark, tmp_path):
    conn = Connection(str(tmp_path / "db"), spark)
    t0 = time.monotonic()
    ids = _bulk_streams(conn, "hc_metric", 100_000)
    create_s = time.monotonic() - t0
    assert len(set(ids)) == 100_000
    # one catalog fragment for the whole batch — not 100k file writes
    assert len(os.listdir(os.path.join(str(tmp_path / "db"), "catalog"))) == 1

    t0 = time.monotonic()
    rows = conn.catalog.resolve("hc_metric", ())
    full_s = time.monotonic() - t0
    assert len(rows) == 100_000

    # warm-cache matcher resolution over one metric's streams
    from tachyon_spark.promql.ast import Matcher

    t0 = time.monotonic()
    sub = conn.catalog.resolve("hc_metric", (Matcher("dc", "=", "dc1"),))
    sub_s = time.monotonic() - t0
    assert len(sub) == 25_000
    # generous CI bounds; the real guard is the complexity class
    # (measured ~6s alone on local[32]; 20s absorbs a co-scheduled suite —
    # an O(n) regression to per-stream file writes would be minutes)
    assert create_s < 20, f"bulk create took {create_s:.2f}s"
    assert full_s < 5, f"cold resolve took {full_s:.2f}s"
    assert sub_s < 1, f"warm matcher resolve took {sub_s:.2f}s"


def test_wide_selector_uses_semi_join_not_in_list(spark, tmp_path):
    conn = Connection(str(tmp_path / "db"), spark)
    n = 1_500  # past ISIN_THRESHOLD
    ids = _bulk_streams(conn, "wide", n)
    rows = [(sid, 100 + (i % 7), float(i), None) for i, sid in enumerate(ids)]
    conn.bulk_load(spark.createDataFrame(rows, SAMPLES_SCHEMA))

    q = conn.query("wide", 0, 1_000)
    df = q.df()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "LeftSemi" in plan, plan
    assert "stream_id IN" not in plan and ".isin(" not in plan
    assert df.count() == n

    # narrow selector (one stream) keeps the literal-pushdown path
    one = conn.query('wide{host="h7"}', 0, 1_000)
    assert len(one.rows()) == 1


def test_bounded_partition_dirs(spark, tmp_path):
    conn = Connection(str(tmp_path / "db"), spark)
    ids = _bulk_streams(conn, "dirs", 1_500)
    rows = [(sid, i, float(i), None) for i, sid in enumerate(ids)]
    conn.bulk_load(spark.createDataFrame(rows, SAMPLES_SCHEMA))
    top = [d for d in os.listdir(conn.samples_path) if d.startswith("stream_bucket=")]
    assert 0 < len(top) <= conn.stream_buckets  # 1500 streams, <= 64 dirs


def test_bucketed_delete_stream(spark, tmp_path):
    conn = Connection(str(tmp_path / "db"), spark)
    for i in range(3):
        conn.create_stream(f'del_m{{k="{i}"}}', "f64")
        ins = conn.prepare_insert(f'del_m{{k="{i}"}}')
        ins.insert(10 + i, float(i))
        ins.flush()
    assert conn.delete_stream('del_m{k="1"}') == 1
    assert len(conn.get_all_streams()) == 2
    vals = sorted(v for _, v in conn.query("del_m", 0, 100).rows())
    assert vals == [0.0, 2.0]


def test_catalog_json_migration(spark, tmp_path):
    # a rounds-1/2 db (JSON catalog) upgrades transparently on open
    import json

    db = tmp_path / "db"
    os.makedirs(db)
    legacy = [
        {
            "stream_id": "abc-123",
            "name": "old_metric",
            "labels": {"service": "web"},
            "value_type": "u64",
        }
    ]
    with open(db / "catalog.json", "w") as f:
        json.dump(legacy, f)
    conn = Connection(str(db), spark)
    assert conn.check_stream_exists('old_metric{service="web"}')
    info = conn.get_all_streams()[0]
    assert info.stream_id == "abc-123" and info.value_type == "u64"
    assert not os.path.exists(db / "catalog.json")


def test_resolve_df_matches_driver_resolution(spark, tmp_path):
    conn = Connection(str(tmp_path / "db"), spark)
    conn.create_streams(
        [
            ('m{env="prod",dc="a"}', "f64"),
            ('m{env="prod",dc="b"}', "f64"),
            ('m{env="dev",dc="a"}', "f64"),
            ('m{dc="a"}', "f64"),  # no env label
        ]
    )
    from tachyon_spark.promql.ast import Matcher

    cases = [
        (Matcher("env", "=", "prod"),),
        (Matcher("env", "!=", "prod"),),  # missing label passes !=
        (Matcher("env", "=~", "pro.*"),),  # anchored: needs the full value
        (Matcher("env", "!~", "d.*"),),
        (Matcher("env", "=", "prod"), Matcher("dc", "=", "a")),
        # empty-matcher family (r14): a missing label is "" on BOTH paths
        (Matcher("env", "=", ""),),
        (Matcher("env", "!=", ""),),
        (Matcher("env", "=~", ".*"),),
        (Matcher("env", "=~", ".+"),),
        (Matcher("env", "!~", ".*"),),
    ]
    for matchers in cases:
        driver = {s.stream_id for s in conn.catalog.resolve("m", matchers)}
        dist = {
            r.stream_id
            for r in conn.catalog.resolve_df("m", matchers).select("stream_id").collect()
        }
        assert driver == dist, matchers
    # Prometheus empty-matcher semantics pinned by COUNT (model/labels:
    # a missing label reads as ""): {env=""} selects exactly the
    # env-less stream, {env!=""} its complement, =~".*" everything,
    # =~".+" only explicit values, !~".*" nothing
    counts = {
        ("=", ""): 1, ("!=", ""): 3, ("=~", ".*"): 4,
        ("=~", ".+"): 3, ("!~", ".*"): 0,
    }
    for (op, v), n in counts.items():
        got = conn.catalog.resolve("m", (Matcher("env", op, v),))
        assert len(got) == n, (op, v, got)


def test_bucketed_delete_with_time_buckets(spark, tmp_path):
    # hash-bucketed AND time-bucketed layout: delete rewrites only the
    # affected stream_bucket dirs, preserving ts_bucket partitioning
    conn = Connection(str(tmp_path / "db"), spark, time_bucket=1000)
    for i in range(3):
        conn.create_stream(f'dtb{{k="{i}"}}', "f64")
        ins = conn.prepare_insert(f'dtb{{k="{i}"}}')
        ins.insert(100 + i, float(i))      # ts_bucket 0
        ins.insert(1500 + i, 10.0 + i)     # ts_bucket 1
        ins.flush()
    assert conn.delete_stream('dtb{k="1"}') == 1
    rows = sorted(conn.query("dtb", 0, 10_000).rows())
    assert rows == [(100, 0.0), (102, 2.0), (1500, 10.0), (1502, 12.0)]
    # ts_bucket partition dirs survived the rewrite
    import os

    top = [d for d in os.listdir(conn.samples_path) if d.startswith("stream_bucket=")]
    assert top and all(
        any(s.startswith("ts_bucket=") for s in os.listdir(os.path.join(conn.samples_path, d)))
        for d in top
    )


def test_python_only_regex_rejected(spark, tmp_path):
    # resolve (Python re) and resolve_df (Java rlike) must agree; matchers
    # using Python-only syntax are rejected rather than silently diverging
    conn = Connection(str(tmp_path / "db"), spark)
    conn.create_stream('rxm{job="api-1"}', "f64")
    with pytest.raises(ValueError, match="Python-only"):
        conn.query('rxm{job=~"(?P<x>api)-1"}', 0, 100)
    # portable regexes still fine on both paths
    assert conn.catalog.resolve("rxm", parse('rxm{job=~"api-\\\\d"}').matchers)
    assert conn.catalog.resolve_df("rxm", parse('rxm{job=~"api-\\\\d"}').matchers).count() == 1


def test_delete_crash_recovery(spark, tmp_path):
    # simulate a crash between the two delete renames: bucket dir moved to
    # .old, staged dir never swapped in — reopen must restore the bucket
    import shutil

    conn = Connection(str(tmp_path / "db"), spark)
    for i in range(3):
        conn.create_stream(f'cr{{k="{i}"}}', "f64")
        ins = conn.prepare_insert(f'cr{{k="{i}"}}')
        ins.insert(10 + i, float(i))
        ins.flush()
    buckets = [d for d in os.listdir(conn.samples_path) if d.startswith("stream_bucket=")]
    victim = os.path.join(conn.samples_path, buckets[0])
    os.replace(victim, victim + ".old")  # the crash window state
    conn2 = Connection(str(tmp_path / "db"), spark)
    vals = sorted(v for _, v in conn2.query("cr", 0, 100).rows())
    assert vals == [0.0, 1.0, 2.0]
    assert not any(d.endswith(".old") for d in os.listdir(conn2.samples_path))


def test_distributed_register_streams_df_100k(spark, tmp_path):
    """Catalog.register_streams_df — the million-series record() path:
    100k streams register through one DISTRIBUTED parquet append (rows
    never visit the driver), resolve sees them all, the duplicate check
    rejects a re-registration, and the fragments Spark wrote interoperate
    with the pyarrow loader + compaction."""
    conn = Connection(str(tmp_path / "db"), spark)
    n = 100_000
    reg = spark.range(n).select(
        F.concat(F.lit("sid-"), F.col("id")).alias("stream_id"),
        F.lit("reg_metric").alias("name"),
        F.create_map(
            F.lit("host"), F.concat(F.lit("h"), F.col("id")),
            F.lit("dc"), F.concat(F.lit("dc"), (F.col("id") % 4)),
        ).alias("labels"),
        F.lit("f64").alias("value_type"),
    )
    t0 = time.monotonic()
    conn.catalog.register_streams_df(reg)
    reg_s = time.monotonic() - t0
    rows = conn.catalog.resolve("reg_metric", ())
    assert len(rows) == n
    assert {r.stream_id for r in rows} == {f"sid-{i}" for i in range(n)}
    assert rows[0].labels.keys() == {"host", "dc"}
    # duplicate (name, labels) combos are rejected, same as create_streams
    with pytest.raises(ValueError, match="already exists"):
        conn.catalog.register_streams_df(reg.limit(1))
    assert reg_s < 30, f"distributed register took {reg_s:.2f}s"


def test_ingest_resolution_joins_catalog_not_collect(spark, tmp_path):
    """r14 (VERDICT r13 item 4): the text-ingest series resolution is a
    JOIN against the catalog parquet, never a full driver-side catalog
    collect/broadcast. Against a 100k-stream catalog: (a) the mapping
    plan shows the catalog scan + a LeftSemi batch-key restriction, (b)
    an ingest that hits EXISTING series resolves them (no duplicate
    registration) while a new series registers, (c) the resolve stays
    far from O(catalog) driver time."""
    from tachyon_spark.sources.line_protocol import ingest_line_protocol
    from tachyon_spark.sources.series_resolve import (
        resolve_series_mapping,
    )

    conn = Connection(str(tmp_path / "db"), spark)
    ids = _bulk_streams(conn, "lp_metric", 100_000)

    # (a) plan shape: catalog parquet scan joined, batch-key semi-join
    series_df = spark.createDataFrame(
        [(
            'lp_metric{dc="dc3",host="h7"}',
            "lp_metric",
            {"host": "h7", "dc": "dc3"},
        )],
        "series_key string, name string, labels map<string,string>",
    )
    t0 = time.monotonic()
    mapping = resolve_series_mapping(conn, series_df, "f64")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mapping.explain("formatted")
    plan = buf.getvalue()
    assert "LeftSemi" in plan, plan
    assert os.path.join("db", "catalog") in plan, plan
    rows = mapping.collect()
    resolve_s = time.monotonic() - t0
    assert [(r["series_key"], r["stream_id"], r["__int"])
            for r in rows] == [
        ('lp_metric{dc="dc3",host="h7"}', ids[7], False)
    ]

    # (b) ingest against the big catalog: existing series resolve, the
    # new one registers — exactly one stream added
    n, _ = ingest_line_protocol(
        conn,
        "lp,host=h7,dc=dc3 metric=1.5 1000\n"
        "lp,host=h8,dc=dc0 metric=2.5 1000\n"
        "lp,host=hNEW,dc=dc9 metric=9.9 1000",
    )
    assert n == 3
    assert len(conn.get_all_streams()) == 100_001
    assert conn.query(
        '{__name__="lp_metric",host="h7"}', 0, 10_000
    ).rows() == [(1000, 1.5)]
    # (c) generous CI bound — the point is the complexity class: the
    # old path collected+broadcast all 100k streams per call
    assert resolve_s < 15, f"mapping resolve took {resolve_s:.2f}s"


def test_wide_selector_query_range_grid_is_distributed(spark, tmp_path):
    """query_range over a selector past the IN-list threshold: the
    per-series step grid must come from the DISTRIBUTED catalog frame
    (executor-side explode), the samples side from a LeftSemi join — no
    unbounded IN-list, no driver-side grid materialization."""
    conn = Connection(str(tmp_path / "db"), spark)
    n = 1_500  # past ISIN_THRESHOLD
    ids = _bulk_streams(conn, "gridwide", n)
    rows = [(sid, 100, float(i), None) for i, sid in enumerate(ids)]
    conn.bulk_load(spark.createDataFrame(rows, SAMPLES_SCHEMA))

    q = conn.query_range("gridwide", 100, 120, 10, lookback=10)
    df = q.df()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "LeftSemi" in plan, plan
    assert "stream_id IN" not in plan and ".isin(" not in plan
    # sample at 100 resolves at steps 100 and 110 (lookback 10), stale at 120
    assert df.count() == 2 * n


def test_nameless_all_empty_matcher_selector_rejected(spark, tmp_path):
    """r14 (Prometheus parser conformance + full-scan guard): a
    nameless selector whose every matcher matches the empty string
    would select every series — rejected on BOTH resolution paths,
    while selectors with one non-empty matcher still resolve."""
    from tachyon_spark.promql.ast import Matcher

    conn = Connection(str(tmp_path / "db"), spark)
    conn.create_stream('g1{env="prod"}', "f64")
    for bad in [
        (Matcher("env", "=~", ".*"),),
        (Matcher("env", "!=", "x"),),
        (Matcher("env", "=", ""),),
        (),
    ]:
        with pytest.raises(ValueError, match="non-empty matcher"):
            conn.catalog.resolve("", bad)
        with pytest.raises(ValueError, match="non-empty matcher"):
            conn.catalog.resolve_df("", bad)
    # fine with a name, or with one non-empty matcher
    assert len(conn.catalog.resolve("g1", (Matcher("env", "=~", ".*"),))) == 1
    assert len(conn.catalog.resolve(
        "", (Matcher("__name__", "=~", ".+"),))) == 1
    assert conn.query('{__name__=~"g.+"}', 0, 100) is not None
