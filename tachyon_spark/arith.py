"""IEEE-754 float division/modulo under Spark ANSI mode.

Spark 4 ships with `spark.sql.ansi.enabled=true`, which turns division
(and modulo) by zero into a runtime DIVIDE_BY_ZERO error — for DOUBLE
operands too. This engine's `/` and `%` are always f64 (the promotion
lattice; tachyon_core's Rust f64 ops and PromQL both follow IEEE), so a
zero divisor must yield ±Inf / NaN, not an error: `1 / 0 = +Inf`,
`-1 / 0 = -Inf`, `0 / 0 = NaN`, `x % 0 = NaN`.

The guards below are CASE WHEN expressions — Spark evaluates the
division branch only when the divisor is non-zero, so no ANSI error
fires, and whole-stage codegen keeps them JVM-side. A -0.0 divisor is
treated as +0.0 (the sign of the zero is not recovered; PromQL data
never exercises it).

Note for oracle authors: DuckDB returns NULL for float x/0, so
hash-gated fixtures must avoid zero divisors (engine Inf vs oracle NULL
can never hash-match); the pytest goldens pin the Inf/NaN behavior
instead.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

INF = float("inf")
NAN = float("nan")


def ieee_div(a, b):
    """Column a / b with IEEE zero-divisor semantics (operands double)."""
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
        .when(b != 0, a / b)
        .when(a > 0, F.lit(INF))
        .when(a < 0, F.lit(-INF))
        .otherwise(F.lit(NAN))
    )


def ieee_mod(a, b):
    """Column a % b (fmod) with IEEE zero-divisor semantics."""
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
        .when(b != 0, a % b)
        .otherwise(F.lit(NAN))
    )


def py_arith(op: str, a: float, b: float) -> float:
    """Python-literal fast path with the same IEEE semantics (plain
    Python raises ZeroDivisionError / ValueError on zero divisors)."""
    if op == "/":
        if b == 0:
            return INF if a > 0 else -INF if a < 0 else NAN
        return a / b
    if op == "%":
        return math.fmod(a, b) if b != 0 else NAN
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "^":
        # Go math.Pow semantics (PromQL): NaN for negative base with
        # fractional exponent, 0^0 = 1, signed Inf on overflow.
        # CPython raises ValueError for 0^negative where Go (and
        # Spark's F.pow, i.e. java.lang.Math.pow) returns Inf — the
        # sign follows the base's sign for odd-integer exponents
        if a == 0 and b < 0:
            # int(-inf) raises OverflowError; Math.pow(0, -Inf) = +Inf
            if math.isinf(b):
                return INF
            neg_zero = math.copysign(1.0, a) < 0
            odd_int = b == int(b) and int(b) % 2 != 0
            return -INF if (neg_zero and odd_int) else INF
        try:
            return math.pow(a, b)
        except ValueError:
            return NAN
        except OverflowError:
            return -INF if (a < 0 and b % 2 == 1) else INF
    if op == "atan2":
        return math.atan2(a, b)
    raise ValueError(f"unsupported arithmetic op {op!r}")
