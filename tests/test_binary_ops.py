"""Binary-op goldens from the reference (lib.rs:862-1030, FIXTURES.md B)."""

import pytest


def vals(q):
    return [v for _, v in q.rows()]


# --- vector ⊕ vector on shared timestamps (no interpolation needed) --------

def test_ints_plus_floats(fixture_b):
    q = fixture_b.query("ints + floats", 0, 100)
    assert vals(q) == pytest.approx([6.1, 7.2, 8.3, 9.4])
    assert q.value_type == "f64"


def test_ints_minus_uints(fixture_b):
    q = fixture_b.query("ints - uints", 0, 100)
    assert vals(q) == [1, 2, 3, 4]
    assert q.value_type == "i64"


def test_ints_times_floats(fixture_b):
    q = fixture_b.query("ints * floats", 0, 100)
    assert vals(q) == pytest.approx([8.2, 12.8, 13.8, 11.2])


def test_ints_div_uints_always_f64(fixture_b):
    q = fixture_b.query("ints / uints", 0, 100)
    assert vals(q) == pytest.approx([2.0, 2.0, 2.0, 2.0])
    assert q.value_type == "f64"


def test_ints_mod_floats(fixture_b):
    q = fixture_b.query("ints % floats", 0, 100)
    assert vals(q) == pytest.approx([2.0, 0.8, 1.4, 1.0])
    assert q.value_type == "f64"


# --- vector ⊕ scalar ---------------------------------------------------------

def test_ints_plus_literal_promotes_f64(fixture_b):
    q = fixture_b.query("ints + 2", 0, 100)
    assert vals(q) == pytest.approx([4.0, 6.0, 8.0, 10.0])
    assert q.value_type == "f64"  # literals are f64 (planner.rs:135-144)


def test_uints_minus_fractional(fixture_b):
    q = fixture_b.query("uints - 2.5", 0, 100)
    assert vals(q) == pytest.approx([-1.5, -0.5, 0.5, 1.5])


def test_floats_times_11(fixture_b):
    q = fixture_b.query("floats * 11", 0, 100)
    assert vals(q) == pytest.approx([45.1, 35.2, 25.3, 15.4])


def test_ints_div_negative(fixture_b):
    q = fixture_b.query("ints / -4", 0, 100)
    assert vals(q) == pytest.approx([-0.5, -1.0, -1.5, -2.0])


def test_uints_mod_2(fixture_b):
    q = fixture_b.query("uints % 2", 0, 100)
    assert vals(q) == pytest.approx([1.0, 0.0, 1.0, 0.0])


def test_scalar_minus_vector_written_order(fixture_b):
    # Reference swaps operands (binary_op.rs:103-105 — documented bug);
    # we evaluate the written order: 10 - ints.
    q = fixture_b.query("10 - ints", 0, 100)
    assert vals(q) == pytest.approx([8.0, 6.0, 4.0, 2.0])


def test_compat_scalar_swap_flag(fixture_b):
    # Connection(compat_scalar_swap=True) replicates the reference's swap:
    # `10 - ints` evaluates as `ints - 10` — golden-migration mode.
    from tachyon_spark.connection import Connection

    compat = Connection(fixture_b.db_dir, fixture_b.spark, compat_scalar_swap=True)
    q = compat.query("10 - ints", 0, 100)
    assert vals(q) == pytest.approx([-8.0, -6.0, -4.0, -2.0])
    # commutative ops and vector-on-left are unaffected
    assert vals(compat.query("10 + ints", 0, 100)) == pytest.approx([12.0, 14.0, 16.0, 18.0])
    assert vals(compat.query("ints - 10", 0, 100)) == pytest.approx([-8.0, -6.0, -4.0, -2.0])


# --- comparisons = filters keeping computed values ---------------------------

def test_mod_eq_filter_keeps_computed(fixture_b):
    q = fixture_b.query("(ints % 4) == 2", 0, 100)
    assert vals(q) == pytest.approx([2.0, 2.0])  # lib.rs:962-970


def test_uints_ne(fixture_b):
    assert vals(fixture_b.query("uints != 2", 0, 100)) == [1, 3, 4]


def test_floats_gt(fixture_b):
    assert vals(fixture_b.query("floats > 2.3", 0, 100)) == pytest.approx([4.1, 3.2])


def test_floats_ge(fixture_b):
    assert vals(fixture_b.query("floats >= 2.3", 0, 100)) == pytest.approx([4.1, 3.2, 2.3])


def test_floats_lt(fixture_b):
    assert vals(fixture_b.query("floats < 3.2", 0, 100)) == pytest.approx([2.3, 1.4])


def test_floats_le(fixture_b):
    assert vals(fixture_b.query("floats <= 3.2", 0, 100)) == pytest.approx([3.2, 2.3, 1.4])


# --- scalar-only -------------------------------------------------------------

def test_scalar_expression(fixture_b):
    q = fixture_b.query("(2 + 3 - 4.5) * (5 / 2.3) % 1", 0, 100)
    assert q.scalar() == pytest.approx(0.5 * (5 / 2.3) % 1)  # ≈ 0.0870 (lib.rs:1022-1030)


def test_bool_comparison_modifier(golden_db):
    # v > bool 5: 0/1 per sample, no filtering (extension)
    q = golden_db.query("ints > bool 5", 0, 100)
    assert q.rows() == [(10, 0.0), (20, 0.0), (30, 1.0), (40, 1.0)]
    assert q.value_type == "f64"
    # scalar comparison allowed only with bool
    assert golden_db.query("2 > bool 1", 0, 100).scalar() == 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bool"):
        golden_db.query("2 > 1", 0, 100)


def test_scalar_on_left_comparison_written_order(golden_db):
    # 5 > v keeps samples where 5 > value (written order; the reference
    # would swap to v > 5 — replayable via compat_scalar_swap)
    q = golden_db.query("5 > ints", 0, 100)
    assert q.rows() == [(10, 2), (20, 4)]


def test_division_by_zero_is_ieee(golden_db):
    # Spark 4 ANSI mode would raise DIVIDE_BY_ZERO; the engine keeps the
    # reference's Rust-f64 / PromQL IEEE semantics (tachyon_spark/arith.py)
    import math

    assert golden_db.query("1 / 0", 0, 100).scalar() == float("inf")
    assert golden_db.query("-1 / 0", 0, 100).scalar() == float("-inf")
    assert math.isnan(golden_db.query("0 / 0", 0, 100).scalar())
    assert math.isnan(golden_db.query("5 % 0", 0, 100).scalar())
    # vector path: ia has value 0 at ts 10/30 -> ib / ia hits x/0 mid-join
    rows = dict(golden_db.query("ib / ia", 0, 50).rows())
    assert any(math.isinf(v) or math.isnan(v) for v in rows.values())
    assert all(v is not None for v in rows.values())


# --- ^ and atan2 (Prometheus's other binary operators; round 9) -------------

def test_pow_scalar_fold_and_precedence(fixture_b):
    import math

    # right-associative: 2^(3^2) = 512, not (2^3)^2 = 64
    assert fixture_b.query("2 ^ 3 ^ 2", 0, 100).scalar() == 512.0
    # ^ binds tighter than unary minus: -2^2 = -(2^2)
    assert fixture_b.query("-2^2", 0, 100).scalar() == -4.0
    assert fixture_b.query("2^-2", 0, 100).scalar() == 0.25
    # ^ above * in precedence: 2 * 3 ^ 2 = 18
    assert fixture_b.query("2 * 3 ^ 2", 0, 100).scalar() == 18.0
    # IEEE corner cases (Go math.Pow): 0^0 = 1, neg base fractional -> NaN
    assert fixture_b.query("0 ^ 0", 0, 100).scalar() == 1.0
    assert math.isnan(fixture_b.query("(0 - 1) ^ 0.5", 0, 100).scalar())


def test_atan2_scalar_fold(fixture_b):
    import math

    assert fixture_b.query("1 atan2 0", 0, 100).scalar() == pytest.approx(
        math.pi / 2
    )
    assert fixture_b.query("0 atan2 0", 0, 100).scalar() == 0.0


def test_vector_pow_scalar_always_f64(fixture_b):
    # ints ^ 2 over [2,4,6,8] -> f64 (PromQL pow is float even for ints)
    q = fixture_b.query("ints ^ 2", 0, 100)
    assert vals(q) == pytest.approx([4.0, 16.0, 36.0, 64.0])
    assert q.value_type == "f64"
    # scalar on the left keeps written order: 2 ^ ints
    q = fixture_b.query("2 ^ ints", 0, 100)
    assert vals(q) == pytest.approx([4.0, 16.0, 64.0, 256.0])


def test_vector_atan2_vector_and_scalar(fixture_b):
    import math

    q = fixture_b.query("ints atan2 uints", 0, 100)
    assert vals(q) == pytest.approx(
        [math.atan2(a, b) for a, b in zip([2, 4, 6, 8], [1, 2, 3, 4])]
    )
    assert q.value_type == "f64"
    q = fixture_b.query("ints atan2 0", 0, 100)
    assert vals(q) == pytest.approx([math.pi / 2] * 4)


def test_pow_atan2_on_grid(golden_db):
    import math

    # ints on the grid: steps 10..40, lookback 10 -> 2,4,6,8
    q = golden_db.query_range("ints ^ 2", 10, 40, 10, lookback=10)
    assert [v for _, v in sorted(q.rows())] == pytest.approx(
        [4.0, 16.0, 36.0, 64.0]
    )
    # default full-label-set matching: ints atan2 ints = pi/4 everywhere
    q = golden_db.query_range("ints atan2 ints", 10, 40, 10, lookback=10)
    assert [v for _, v in sorted(q.rows())] == pytest.approx(
        [math.pi / 4] * 4
    )
