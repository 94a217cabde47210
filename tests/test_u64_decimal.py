"""u64-exact storage layout: DECIMAL(20,0) escape hatch (SURVEY §1.5).

Default LongType storage caps u64 at 2^63-1 (JVM long); a db opened with
u64_decimal=True stores u64 streams in a DECIMAL(20,0) column and round-trips
the full u64 range exactly.
"""

import pytest

from tachyon_spark.connection import Connection


def test_u64_decimal_roundtrip(spark, tmp_path):
    conn = Connection(str(tmp_path / "u64db"), spark, u64_decimal=True)
    conn.create_stream('big{k="1"}', "u64")
    ins = conn.prepare_insert('big{k="1"}')
    pts = [(10, 2**63 + 5), (20, 2**64 - 1), (30, 7)]
    for t, v in pts:
        ins.insert(t, v)
    ins.flush()
    assert conn.query("big", 0, 100).rows() == pts
    assert conn.query("max(big)", 0, 100).scalar() == 2**64 - 1
    assert conn.query("sum(big)", 0, 100).scalar() == (2**63 + 5) + (2**64 - 1) + 7
    assert conn.query("count(big)", 0, 100).scalar() == 3
    assert conn.query("avg(big)", 0, 100).scalar() == pytest.approx(
        ((2**63 + 5) + (2**64 - 1) + 7) / 3
    )
    assert conn.query("topk(1, big)", 0, 100).rows() == [2**64 - 1]
    # f64 streams in the same db are unaffected
    conn.create_stream('f{k="1"}', "f64")
    fi = conn.prepare_insert('f{k="1"}')
    fi.insert(10, 1.5)
    fi.flush()
    assert conn.query("f", 0, 100).rows() == [(10, 1.5)]


def test_default_layout_rejects_oversize(spark, tmp_path):
    conn = Connection(str(tmp_path / "longdb"), spark)
    conn.create_stream('big{k="1"}', "u64")
    ins = conn.prepare_insert('big{k="1"}')
    with pytest.raises(TypeError, match="u64_decimal"):
        ins.insert(10, 2**63 + 5)
    ins.insert(20, 2**63 - 1)  # max representable stays fine


def test_layout_persisted_on_reopen(spark, tmp_path):
    db = str(tmp_path / "reopendb")
    Connection(db, spark, u64_decimal=True)
    # reopening without the flag keeps the stored layout
    assert Connection(db, spark).u64_decimal is True
    # asking for the layout on a db created without it is an error
    db2 = str(tmp_path / "plaindb")
    Connection(db2, spark)
    with pytest.raises(ValueError, match="u64_decimal"):
        Connection(db2, spark, u64_decimal=True)
