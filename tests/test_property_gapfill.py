"""Property-based fuzz of gapfill (operators/gapfill.py): for random
sparse grids, every method must match a direct Python model exactly
(integer-valued inputs -> exact linear interpolation both sides)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tachyon_spark.operators.gapfill import gapfill


def _model(points, step, method, fill_value=0.0, max_carry=None):
    pts = dict(points)
    lo, hi = min(pts), max(pts)
    grid = list(range(lo, hi + 1, step))
    obs = sorted(pts)
    out = {}
    for t in grid:
        if t in pts:
            out[t] = (pts[t], False)
            continue
        prev = max((o for o in obs if o < t), default=None)
        nxt = min((o for o in obs if o > t), default=None)
        if method == "null":
            v = None
        elif method == "value":
            v = fill_value
        elif method == "locf":
            v = pts[prev] if prev is not None else None
            if (
                v is not None
                and max_carry is not None
                and (t - prev) // step > max_carry
            ):
                v = None
        else:  # linear
            if prev is None or nxt is None:
                v = None
            else:
                v = pts[prev] + (pts[nxt] - pts[prev]) * (
                    (t - prev) / (nxt - prev)
                )
        out[t] = (v, True)
    return out


points_strategy = st.dictionaries(
    st.integers(min_value=0, max_value=40),
    st.integers(min_value=-5, max_value=20),
    min_size=1,
    max_size=12,
).map(lambda d: [(k * 10, float(v)) for k, v in d.items()])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    points=points_strategy,
    method=st.sampled_from(["null", "locf", "linear", "value"]),
    max_carry=st.one_of(st.none(), st.integers(min_value=1, max_value=3)),
)
def test_gapfill_matches_python_model(spark, points, method, max_carry):
    if max_carry is not None and method != "locf":
        max_carry = None
    df = spark.createDataFrame(points, "ts long, v double")
    out = gapfill(
        df, "ts", "v", 10, method=method, fill_value=-3.0,
        max_carry=max_carry,
    )
    got = {r["ts"]: (r["value"], r["filled"]) for r in out.collect()}
    exp = _model(points, 10, method, fill_value=-3.0, max_carry=max_carry)
    assert got == exp
