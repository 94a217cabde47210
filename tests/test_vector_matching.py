"""PromQL vector matching on()/ignoring()/group_left/group_right
(VERDICT r2 item 2 — extension; the reference ignores labels in binary ops
entirely, concatenating matched streams at scan, vector_select.rs:78-105).

Semantics: per match group, the engine's interpolating temporal join
(union-of-ts + linear interpolation, operators/interpolate.py), with the
Prometheus matching contract: one-to-one unless group_left/group_right, the
"one" side unique per group, missing labels match as ""."""

import pytest

from tachyon_spark.promql import ast, parse


# --------------------------------------------------------------- parser
def test_parse_on():
    e = parse("a / on(instance) b")
    assert isinstance(e, ast.BinaryOp) and e.op == "/"
    assert e.matching == ast.VectorMatching(True, ("instance",), None, ())


def test_parse_ignoring_group_left_include():
    e = parse("a * ignoring(cpu, mode) group_left(node, rack) b")
    assert e.matching == ast.VectorMatching(
        False, ("cpu", "mode"), "left", ("node", "rack")
    )


def test_parse_group_right():
    e = parse("a + on(job) group_right b")
    assert e.matching == ast.VectorMatching(True, ("job",), "right", ())


def test_parse_set_op_matching():
    e = parse("a and on(job) b")
    assert e.op == "and" and e.matching.labels == ("job",)


# --------------------------------------------------------------- semantics
def _rows(golden_db, q, start=0, end=100):
    df = golden_db.query(q, start, end).df()
    return [tuple(r) for r in df.collect()]


def test_on_one_to_one_interpolated_division(golden_db):
    rows = _rows(golden_db, "vm_req / on(service) vm_lim")
    assert rows == [
        ("mobile", 10, 0.1),
        ("mobile", 20, 0.2),
        ("mobile", 30, 0.3),
        ("web", 10, 0.1),
        ("web", 20, 20.0 / 150.0),  # lim interpolated 100@10 -> 200@30
        ("web", 30, 0.15),
    ]


def test_ignoring_matches_remaining_labels(golden_db):
    # ignoring a label nobody has groups by the full label set (= service)
    rows = _rows(golden_db, "vm_req / ignoring(nonexistent) vm_lim")
    vals = sorted(round(v, 6) for _, _, v in rows)
    assert vals == sorted(
        round(v, 6) for v in [0.1, 0.2, 0.3, 0.1, 20.0 / 150.0, 0.15]
    )


def test_group_left_many_to_one(golden_db):
    rows = _rows(golden_db, "vm_multi * on(service) group_left vm_lim")
    # output: (stream_id, service, ts, value); collapse to (ts, value) per host
    by_val = sorted((ts, v) for _, _, ts, v in rows)
    # host=a (union ts {10,20,30}): 1*100, 2*150, 2*200 (left carries 2)
    # host=b (union ts {10,30}):    3*100, 3*200       (left carries 3)
    assert by_val == [
        (10, 100.0),
        (10, 300.0),
        (20, 300.0),
        (30, 400.0),
        (30, 600.0),
    ]


def test_group_right_is_mirror(golden_db):
    rows = _rows(golden_db, "vm_lim * on(service) group_right vm_multi")
    vals = sorted(v for *_, v in rows)
    assert vals == [100.0, 300.0, 300.0, 400.0, 600.0]


def test_group_left_include_copies_labels(golden_db):
    rows = _rows(golden_db, "vm_multi * on(service) group_left(tier) vm_lim2")
    # output: (stream_id, service, ts, value, tier) — tier copied from rhs
    assert all(r[-1] == "gold" for r in rows), rows
    assert sorted(v for _, _, _, v, _ in rows) == [100.0, 200.0, 300.0]


def test_include_overlapping_match_key_rejected(golden_db):
    with pytest.raises(ValueError, match="overlap"):
        golden_db.query(
            "vm_multi * on(service) group_left(service) vm_lim", 0, 100
        )


def test_one_to_many_requires_group_modifier(golden_db):
    with pytest.raises(ValueError, match="group_left"):
        golden_db.query("vm_multi / on(service) vm_lim", 0, 100).df()


def test_no_matching_groups_raises(golden_db):
    with pytest.raises(ValueError, match="no matching label groups"):
        golden_db.query('vm_req{service="web"} / on(service) vm_lim{service="mobile"}', 0, 100)


def test_and_on_matching(golden_db):
    rows = _rows(golden_db, "vm_req and on(service) vm_lim")
    # lhs samples whose (service, ts) exists on rhs
    assert sorted(rows) == [("mobile", 20, 8.0), ("web", 10, 10.0), ("web", 30, 30.0)]


def test_unless_on_matching(golden_db):
    rows = _rows(golden_db, "vm_req unless on(service) vm_lim")
    assert sorted(rows) == [
        ("mobile", 10, 4.0),
        ("mobile", 30, 12.0),
        ("web", 20, 20.0),
    ]


def test_or_on_keeps_unmatched_groups(golden_db):
    rows = _rows(golden_db, 'vm_req{service="web"} or on(service) vm_lim')
    # all web req samples + rhs (service, ts) keys absent from lhs
    assert sorted(rows) == [
        ("mobile", 20, 40.0),
        ("web", 10, 10.0),
        ("web", 20, 20.0),
        ("web", 30, 30.0),
    ]


def test_matching_requires_selector_vectors(golden_db):
    with pytest.raises(ValueError, match="vector operands"):
        golden_db.query("vm_req / on(service) 2", 0, 100)


# ------------------------------------------------- label_replace/label_join
def test_parse_label_funcs():
    e = parse('label_replace(m, "dst", "$1", "src", "(.*)")')
    assert isinstance(e, ast.LabelFunc) and e.func == "label_replace"
    assert e.args == ("dst", "$1", "src", "(.*)")
    j = parse('label_join(m, "k", "-", "a", "b")')
    assert j.func == "label_join" and j.args == ("k", "-", "a", "b")


def test_label_replace_grouped_agg(golden_db):
    # service=web matches (w.*) -> env=web; mobile does not -> no env label
    q = golden_db.query(
        'sum by (env) (label_replace(vm_req, "env", "$1", "service", "(w.*)"))',
        0, 100,
    )
    rows = {r.env: r.value for r in q.df().collect()}
    assert rows == {"web": 60.0, None: 24.0}


def test_label_join_grouped_agg(golden_db):
    q = golden_db.query(
        'sum by (k) (label_join(vm_req, "k", "-", "service", "service"))', 0, 100
    )
    rows = {r.k: r.value for r in q.df().collect()}
    assert rows == {"web-web": 60.0, "mobile-mobile": 24.0}


def test_label_replace_feeds_vector_matching(golden_db):
    # copy service into a fresh label on both sides; matching on it must
    # reproduce the on(service) result
    q = golden_db.query(
        'label_replace(vm_req, "svc", "$1", "service", "(.+)") '
        '/ on(svc) label_replace(vm_lim, "svc", "$1", "service", "(.+)")',
        0, 100,
    )
    rows = [tuple(r) for r in q.df().collect()]
    base = [tuple(r) for r in golden_db.query("vm_req / on(service) vm_lim", 0, 100).df().collect()]
    assert [(g, t, v) for g, t, v in rows] == base


def test_matching_over_windowed_vectors(golden_db):
    # series identity now survives the windowed family, so PromQL's classic
    # `rate(a) / on(l) rate(b)` shape composes; max_over_time windows at
    # width 20 anchored at query start 0
    rows = _rows(
        golden_db,
        "max_over_time(vm_req[20]) / on(service) max_over_time(vm_lim[20])",
    )
    # windows [0,20) and [20,40): req web max 10 then 30; mobile 4 then 12;
    # lim web 100 then 200; mobile only 40@[20,40), carried back for ts 0
    assert sorted(rows) == [
        ("mobile", 0, 0.1),   # 4 / 40 (lim carried back)
        ("mobile", 20, 0.3),  # 12 / 40
        ("web", 0, 0.1),      # 10 / 100
        ("web", 20, 0.15),    # 30 / 200
    ]
