"""OpenMetrics text-exposition ingest (sources/openmetrics.py).

Round-trips against promapi.openmetrics_text (the /metrics exposition
this engine already serves) and pins the parse grammar: labels with
escaped quotes/backslashes/newlines, Inf/NaN value spellings, optional
timestamps, comment/EOF handling, FAILFAST on malformed lines, and the
label-order-insensitive series identity.
"""

from __future__ import annotations

import math

import pytest

from tachyon_spark.connection import Connection
from tachyon_spark.promapi import openmetrics_text
from tachyon_spark.sources.openmetrics import (
    ingest_openmetrics,
    parse_openmetrics,
)


def _lines(spark, text):
    return spark.createDataFrame(
        [(l,) for l in text.split("\n")], "value string"
    )


def test_parse_basic_and_labels(spark):
    text = (
        'http_requests_total{service="web",code="200"} 42 12\n'
        "errors_total 3.5 13\n"
        "# HELP http_requests_total whatever\n"
        "# TYPE http_requests_total counter\n"
        "# EOF\n"
    )
    out = parse_openmetrics(_lines(spark, text), ns_clock=False).collect()
    by_name = {r["name"]: r for r in out}
    assert len(out) == 2
    r = by_name["http_requests_total"]
    assert r["labels"] == {"service": "web", "code": "200"}
    assert r["ts"] == 12 and r["value"] == 42.0
    assert by_name["errors_total"]["labels"] == {}
    assert by_name["errors_total"]["value"] == 3.5


def test_parse_escapes_and_specials(spark):
    text = (
        'm{p="a\\"b",q="c\\\\d",r="e\\nf"} +Inf 1\n'
        "n -Inf 2\n"
        "o NaN 3\n"
    )
    out = {r["name"]: r for r in parse_openmetrics(
        _lines(spark, text), ns_clock=False
    ).collect()}
    assert out["m"]["labels"] == {"p": 'a"b', "q": "c\\d", "r": "e\nf"}
    assert out["m"]["value"] == float("inf")
    assert out["n"]["value"] == float("-inf")
    assert math.isnan(out["o"]["value"])


def test_parse_missing_ts_takes_default(spark):
    out = parse_openmetrics(
        _lines(spark, "m 1.5\n"), ns_clock=False, default_ts=77
    ).collect()
    assert out[0]["ts"] == 77


def test_parse_seconds_clock_scales_to_ns(spark):
    out = parse_openmetrics(_lines(spark, "m 1 2.5\n")).collect()
    assert out[0]["ts"] == 2_500_000_000


def test_parse_failfast_on_garbage(spark):
    # the check rides the parse expression (no probe pass), so a direct
    # collect surfaces Spark's raise_error exception at action time
    with pytest.raises(Exception, match="unparseable OpenMetrics line"):
        parse_openmetrics(_lines(spark, "}}no{{ 1 2\n")).collect()


def test_ingest_failfast_raises_valueerror(db):
    # the ingest path keeps the documented ValueError contract
    with pytest.raises(ValueError, match="unparseable OpenMetrics line"):
        ingest_openmetrics(db, "}}no{{ 1 2\nok_metric 1 2\n", ns_clock=False)


def test_series_identity_ignores_label_order(spark):
    text = 'm{a="1",b="2"} 1 1\nm{b="2",a="1"} 2 2\n'
    out = parse_openmetrics(_lines(spark, text), ns_clock=False)
    keys = [r["series_key"] for r in out.collect()]
    assert keys[0] == keys[1]


def test_ingest_creates_streams_and_appends(spark, tmp_path):
    conn = Connection(str(tmp_path / "omdb"), spark)
    text = (
        'cpu{host="a"} 0.5 10\n'
        'cpu{host="b"} 0.7 10\n'
        'cpu{host="a"} 0.6 20\n'
        "# EOF\n"
    )
    n = ingest_openmetrics(conn, text, ns_clock=False)
    assert n == 3
    assert conn.check_stream_exists('cpu{host="a"}')
    rows = conn.query('cpu{host="a"}', 0, 100).rows()
    assert rows == [(10, 0.5), (20, 0.6)]
    # idempotent stream resolution: a second ingest appends to the SAME
    # streams instead of duplicating the series
    ingest_openmetrics(conn, 'cpu{host="a"} 0.9 30\n', ns_clock=False)
    assert len(conn.get_all_streams()) == 2
    assert conn.query('cpu{host="a"}', 0, 100).rows()[-1] == (30, 0.9)


def test_roundtrip_with_exposition(spark, tmp_path):
    """exposition -> ingest -> identical latest samples + labels (native
    units both ways; the seconds clock is documented lossy at ns epoch
    magnitudes)."""
    src = Connection(str(tmp_path / "src"), spark)
    for sel, pts in (
        ('m{service="web",note="a\\"q"}', [(10, 1.5), (20, 2.5)]),
        ('m{service="db"}', [(15, 7.0)]),
        ("plain", [(11, 3.0)]),
    ):
        src.create_stream(sel, "f64")
        ins = src.prepare_insert(sel)
        for t, v in pts:
            ins.insert(t, v)
        ins.flush()
    text = openmetrics_text(src, ns_clock=False)

    dst = Connection(str(tmp_path / "dst"), spark)
    n = ingest_openmetrics(dst, text, ns_clock=False)
    assert n == 3  # exposition carries the LATEST sample per stream
    assert dst.query('m{service="web"}', 0, 100).rows() == [(20, 2.5)]
    assert dst.query('m{service="db"}', 0, 100).rows() == [(15, 7.0)]
    assert dst.query("plain", 0, 100).rows() == [(11, 3.0)]
    # label fidelity through escape/unescape
    labs = {
        tuple(sorted(s.labels.items()))
        for s in dst.get_all_streams()
        if s.name == "m"
    }
    assert ("note", 'a"q') in {kv for lab in labs for kv in lab}


def test_ingest_from_path(spark, tmp_path):
    p = tmp_path / "scrape.txt"
    p.write_text('disk{host="a"} 9.5 5\n# EOF\n')
    conn = Connection(str(tmp_path / "pdb"), spark)
    n = ingest_openmetrics(conn, str(p), ns_clock=False)
    assert n == 1
    assert conn.query('disk{host="a"}', 0, 10).rows() == [(5, 9.5)]


def test_cli_import_openmetrics(spark, tmp_path, capsys):
    from tachyon_spark.cli import main as cli_main

    p = tmp_path / "scrape.txt"
    p.write_text('net{host="x"} 4.5 7\n# EOF\n')
    db = str(tmp_path / "clidb")
    assert cli_main(
        [db, "import-openmetrics", str(p), "--native-units"]
    ) == 0
    assert "imported 1 samples" in capsys.readouterr().out
    conn = Connection(db, spark)
    assert conn.query('net{host="x"}', 0, 10).rows() == [(7, 4.5)]


def test_ingest_integer_stream_routes_value_int(spark, tmp_path):
    """A pre-existing u64 stream ingests into value_int (the typed
    layout readers resolve through value_column); a float stream in the
    same batch keeps the double column — per-stream routing by DECLARED
    type, not by the call's value_type parameter."""
    conn = Connection(str(tmp_path / "intdb"), spark)
    conn.create_stream('req{host="a"}', "u64")
    text = 'req{host="a"} 41 9\ngauge{host="a"} 1.5 9\n'
    n = ingest_openmetrics(conn, text, ns_clock=False)
    assert n == 2
    assert conn.query('req{host="a"}', 0, 10).rows() == [(9, 41)]
    assert conn.query('gauge{host="a"}', 0, 10).rows() == [(9, 1.5)]
    # the int sample landed in value_int, not value
    import pyspark.sql.functions as F
    sid = next(
        s.stream_id for s in conn.get_all_streams() if s.name == "req"
    )
    r = conn.samples_df().where(F.col("stream_id") == sid).head()
    assert r.value is None and r.value_int == 41


def test_streaming_openmetrics_ingest(spark, tmp_path):
    """Live scrape-drop ingestion: two text drops through the streaming
    reader; a metric first seen in drop 2 registers its stream
    mid-stream; all samples land in the same queryable table."""
    import os

    from tachyon_spark.streaming.ingest import start_openmetrics_ingest

    src_dir = tmp_path / "scrapes"
    src_dir.mkdir()
    (src_dir / "t1.txt").write_text(
        'cpu{host="a"} 0.5 10\ncpu{host="a"} 0.6 20\n# EOF\n'
    )
    (src_dir / "t2.txt").write_text(
        'cpu{host="a"} 0.7 30\nnew_metric 1.0 30\n# EOF\n'
    )
    conn = Connection(str(tmp_path / "sdb"), spark)
    q = start_openmetrics_ingest(
        conn, str(src_dir), trigger_once=True, max_files_per_trigger=1,
        ns_clock=False,
    )
    q.awaitTermination(120)
    assert conn.query('cpu{host="a"}', 0, 100).rows() == [
        (10, 0.5), (20, 0.6), (30, 0.7)]
    assert conn.query("new_metric", 0, 100).rows() == [(30, 1.0)]
    # restart with no new files: checkpoint prevents re-ingestion
    q2 = start_openmetrics_ingest(
        conn, str(src_dir), trigger_once=True, ns_clock=False,
    )
    q2.awaitTermination(120)
    assert conn.query('cpu{host="a"}', 0, 100).rows() == [
        (10, 0.5), (20, 0.6), (30, 0.7)]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_label_val = st.text(
    alphabet=st.characters(
        codec="ascii", min_codepoint=32, max_codepoint=126
    ) | st.sampled_from(['"', "\\", "\n"]),
    min_size=0, max_size=12,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=st.lists(_label_val, min_size=1, max_size=3, unique=True))
def test_label_escape_roundtrip_property(spark, vals):
    """Any ASCII label value (incl. quotes, backslashes, newlines)
    survives _escape_label -> exposition line -> parse_openmetrics."""
    from tachyon_spark.promapi import _escape_label

    labels = {f"l{i}": v for i, v in enumerate(vals)}
    body = ",".join(
        f'{k}="{_escape_label(v)}"' for k, v in sorted(labels.items())
    )
    line = f"m{{{body}}} 1.5 7\n"
    out = parse_openmetrics(_lines(spark, line), ns_clock=False).collect()
    assert len(out) == 1
    assert dict(out[0]["labels"]) == labels


def test_ingest_one_line_blob_guidance(spark, tmp_path):
    """r14: a one-line exposition blob routed to the path branch fails
    with 'pass literal=True' guidance (the r13 line-protocol red's
    failure class), and literal=True ingests it."""
    import pytest

    from tachyon_spark.connection import Connection
    from tachyon_spark.sources.openmetrics import ingest_openmetrics

    conn = Connection(str(tmp_path / "omdb"), spark)
    with pytest.raises(ValueError, match="literal=True"):
        ingest_openmetrics(conn, 'om_blob{k="1"} 2.5 10', ns_clock=False)
    n = ingest_openmetrics(
        conn, 'om_blob{k="1"} 2.5 10', ns_clock=False, literal=True
    )
    assert n == 1
    assert conn.query('om_blob{k="1"}', 0, 100).rows() == [(10, 2.5)]
    # a genuinely nonexistent path that does NOT look like exposition
    # keeps the raw error
    with pytest.raises(Exception, match="PATH_NOT_FOUND|Path does not"):
        ingest_openmetrics(conn, str(tmp_path / "nope" / "x.om"))
