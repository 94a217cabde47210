"""Value-type lattice mirroring the reference's semantics.

Reference: ValueType { Integer64, UInteger64, Float64 } with promotion
u64 < i64 < f64 (tachyon_core/src/lib.rs:54-72); division and modulo always
compute in f64 (lib.rs:306-362); number literals are always f64
(query/planner.rs:135-144).

Spark mapping: i64/u64 -> LongType (JVM has no unsigned 64-bit; values >= 2^63
are out of contract and documented), f64 -> DoubleType.
"""

from __future__ import annotations

from pyspark.sql import types as T

VT_U64 = "u64"
VT_I64 = "i64"
VT_F64 = "f64"

_RANK = {VT_U64: 0, VT_I64: 1, VT_F64: 2}

VALID_TYPES = frozenset(_RANK)


def promote(a: str, b: str) -> str:
    """Type of an arithmetic op over operands of types a, b (u64 < i64 < f64)."""
    if a not in _RANK or b not in _RANK:
        raise ValueError(f"unknown value type: {a!r}, {b!r}")
    return a if _RANK[a] >= _RANK[b] else b


def result_type(op: str, a: str, b: str) -> str:
    """Arithmetic result type: / % ^ atan2 are always f64, others
    promote."""
    if op in ("/", "%", "^", "atan2"):
        return VT_F64
    return promote(a, b)


def spark_type(vt: str) -> T.DataType:
    return T.DoubleType() if vt == VT_F64 else T.LongType()


def is_integer(vt: str) -> bool:
    return vt in (VT_I64, VT_U64)
