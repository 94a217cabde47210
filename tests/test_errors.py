"""Error-path contracts: malformed queries, unknown streams, bad CSV."""

import pytest

from tachyon_spark.promql import parse
from tachyon_spark.promql.parser import PromQLError


def test_parse_errors():
    for bad in ["", "m +", "sum(", "m{label=}", "m{label~'x'}", "topk(m)", "1 2",
                "clamp(m)", "clamp_min(m, 'x')", "m @ bad"]:
        with pytest.raises(PromQLError):
            parse(bad)


def test_unknown_metric_raises(db):
    with pytest.raises(ValueError, match="no streams matched"):
        db.query("does_not_exist", 0, 10)


def test_duplicate_stream_rejected(db):
    db.create_stream('dup{k="1"}', "f64")
    with pytest.raises(ValueError, match="already exists"):
        db.create_stream('dup{k="1"}', "f64")


def test_bad_value_type_rejected(db):
    with pytest.raises(ValueError, match="value_type"):
        db.create_stream('vt{k="1"}', "f32")


def test_insert_needs_unique_stream(db):
    db.create_stream('multi{k="1"}', "f64")
    db.create_stream('multi{k="2"}', "f64")
    with pytest.raises(ValueError, match="exactly 1 stream"):
        db.prepare_insert("multi")  # matches both


def test_csv_failfast_on_malformed(db, tmp_path):
    from tachyon_spark.sources import import_csv

    db.create_stream('csvbad{k="1"}', "f64")
    bad = tmp_path / "bad.csv"
    bad.write_text("Timestamp,Value\n10,1.5\nnot_a_number,oops\n")
    with pytest.raises(Exception):  # Spark FAILFAST surfaces a parse error
        import_csv(db, 'csvbad{k="1"}', str(bad))


def test_topk_as_scalar_operand_rejected(golden_db):
    # topk is multi-row; using it where a scalar is expected must error,
    # not silently cross-join k rows (builder._scalar_df guard).
    for q in ["ints + topk(2, floats)", "topk(2, ints) + 1", "sum(ints) * topk(2, floats)"]:
        with pytest.raises(ValueError, match="multi-row"):
            golden_db.query(q, 0, 100)
    # aggregating the topk result first is the supported form
    assert golden_db.query("sum(topk(2, ints))", 0, 100).rows() == [14]


def test_vector_comparison_rejected(golden_db):
    with pytest.raises(ValueError, match="not supported"):
        golden_db.query("ints > floats", 0, 100)


def test_scalar_comparison_rejected(golden_db):
    # filter semantics are undefined on scalars; only `> bool` is allowed
    with pytest.raises(ValueError, match="bool modifier"):
        golden_db.query("sum(ints) > sum(floats)", 0, 100)
