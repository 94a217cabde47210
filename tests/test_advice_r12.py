"""Round-12 advisor regressions (ADVICE.md r11).

1. The exemplar strip must be quote-aware: a label VALUE may legally
   contain ' # {' (only \\, ", \\n need escaping in exposition text), so
   the ' # {...}' suffix is an exemplar only after a COMPLETE sample.
2. snapshot() must survive transient per-file FileNotFoundError from a
   concurrent maintenance swap — the old shutil.copytree aggregated those
   into shutil.Error, slipping past the retry.
"""

from tests.conftest import make_stream


# --- 1. quote-aware exemplar strip ------------------------------------------

def test_openmetrics_exemplar_sep_inside_label_value(spark):
    from tachyon_spark.sources.openmetrics import parse_openmetrics

    lines = spark.createDataFrame(
        [('m{p="a # {b}"} 1 5',)], "value string"
    )
    rows = parse_openmetrics(lines, ns_clock=False).collect()
    assert len(rows) == 1
    assert rows[0].labels == {"p": "a # {b}"}
    assert rows[0].value == 1.0 and rows[0].ts == 5


def test_openmetrics_exemplar_after_tricky_label_still_strips(spark):
    from tachyon_spark.sources.openmetrics import parse_openmetrics

    text = "\n".join(
        [
            # exemplar AND a '#' in the label value on the same line
            'm{p="a # {b}"} 2 7 # {trace_id="x"} 0.5',
            # exemplar on a bare (label-free) sample without timestamp
            'plain_total 17 # {span="y"} 0.1 125',
        ]
    )
    lines = spark.createDataFrame(
        [(l,) for l in text.split("\n")], "value string"
    )
    rows = parse_openmetrics(lines, ns_clock=False, default_ts=9).collect()
    by_name = {r.name: r for r in rows}
    assert by_name["m"].labels == {"p": "a # {b}"}
    assert by_name["m"].value == 2.0 and by_name["m"].ts == 7
    assert by_name["plain_total"].value == 17.0
    assert by_name["plain_total"].ts == 9  # exemplar ts never leaks in


# --- 2. snapshot retries transient per-file vanish --------------------------

def test_snapshot_retries_per_file_vanish(db, spark, monkeypatch):
    import shutil

    make_stream(db, "snapv", "f64", [(1, 1.0), (2, 2.0)])
    real_copy2 = shutil.copy2
    failed = {"n": 0}

    def flaky_copy2(src, dst, **kw):
        # vanish the first samples file once — simulates the compact/
        # delete os.replace window (previously surfaced as shutil.Error
        # from copytree and aborted the snapshot unretried)
        if failed["n"] == 0 and "samples" in str(src):
            failed["n"] += 1
            raise FileNotFoundError(src)
        return real_copy2(src, dst, **kw)

    monkeypatch.setattr(shutil, "copy2", flaky_copy2)
    dest = db.snapshot("advice-r12")
    assert failed["n"] == 1, "the flaky copy must have fired"
    from tachyon_spark.connection import Connection

    c2 = Connection(dest, spark)
    assert c2.query("snapv", 0, 10).rows() == [(1, 1.0), (2, 2.0)]
