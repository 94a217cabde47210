"""Interpolating vector-to-vector join goldens (lib.rs:1395-1470, FIXTURES.md C)."""

GOLDEN_1_TS = [5, 10, 15, 20, 25, 30, 35, 40, 45]
GOLDEN_1_V = [10, 10, 20, 30, 20, 10, 20, 30, 30]

A3_TS = [1, 2, 4, 6, 10, 12, 13, 14, 15, 16]
B3_TS = [3, 5, 7, 8, 9, 11, 16]
GOLDEN_3_V = [40, 50, 55, 60, 55, 40, 30, 40, 40, 35, 25, 20, 25, 30, 90, 110]


def test_golden_1(golden_db):
    q = golden_db.query("ia + ib", 0, 100)
    assert q.rows() == list(zip(GOLDEN_1_TS, GOLDEN_1_V))


def test_golden_2_commutative(golden_db):
    q = golden_db.query("ib + ia", 0, 100)
    assert q.rows() == list(zip(GOLDEN_1_TS, GOLDEN_1_V))


def test_golden_3(golden_db):
    q = golden_db.query("ia3 + ib3", 0, 100)
    ts_union = sorted(set(A3_TS) | set(B3_TS))
    assert q.rows() == list(zip(ts_union, GOLDEN_3_V))
