"""Property-based fuzz of the fuzzy join (functions/linkage.py): for
random short-alphabet corpora (small alphabets maximize accidental
near-collisions — the hard case for blocking completeness), BOTH
blocking methods must return exactly the brute-force Levenshtein truth.
One Spark job pair per example; examples kept small (<=12 keys/side)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tachyon_spark.functions.linkage import fuzzy_join


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


keys = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left=keys, right=keys, k=st.integers(min_value=0, max_value=2))
def test_neighborhood_matches_bruteforce(spark, left, right, k):
    ldf = spark.createDataFrame(
        list(enumerate(left)), "left_id long, key string"
    )
    rdf = spark.createDataFrame(
        [(100 + i, w) for i, w in enumerate(right)],
        "right_id long, key string",
    )
    got = sorted(
        tuple(r)
        for r in fuzzy_join(
            ldf, rdf, "key", k=k, method="neighborhood"
        ).collect()
    )
    truth = sorted(
        (i, 100 + j, _lev(a, b))
        for i, a in enumerate(left)
        for j, b in enumerate(right)
        if _lev(a, b) <= k
    )
    assert got == truth


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    left=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=7),
        min_size=1,
        max_size=10,
    ),
    right=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=7),
        min_size=1,
        max_size=10,
    ),
    k=st.integers(min_value=0, max_value=2),
)
def test_segment_matches_bruteforce(spark, left, right, k):
    # PassJoin generalization (r13): any k, per-row segment widths,
    # short-right-key arm — min_size=1 deliberately exercises keys the
    # pigeonhole cannot segment
    ldf = spark.createDataFrame(
        list(enumerate(left)), "left_id long, key string"
    )
    rdf = spark.createDataFrame(
        [(100 + i, w) for i, w in enumerate(right)],
        "right_id long, key string",
    )
    got = sorted(
        tuple(r)
        for r in fuzzy_join(
            ldf, rdf, "key", k=k, method="segment"
        ).collect()
    )
    truth = sorted(
        (i, 100 + j, _lev(a, b))
        for i, a in enumerate(left)
        for j, b in enumerate(right)
        if _lev(a, b) <= k
    )
    assert got == truth


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    left=st.lists(
        st.text(alphabet="abc", min_size=3, max_size=12),
        min_size=1,
        max_size=8,
    ),
    right=st.lists(
        st.text(alphabet="abc", min_size=3, max_size=12),
        min_size=1,
        max_size=8,
    ),
)
def test_segment_k2_longer_strings(spark, left, right):
    # stresses the PassJoin shift-window math where segment widths vary
    # (base/rem split) and lengths differ by up to k on both sides
    ldf = spark.createDataFrame(
        list(enumerate(left)), "left_id long, key string"
    )
    rdf = spark.createDataFrame(
        [(100 + i, w) for i, w in enumerate(right)],
        "right_id long, key string",
    )
    got = sorted(
        tuple(r)
        for r in fuzzy_join(
            ldf, rdf, "key", k=2, method="segment"
        ).collect()
    )
    truth = sorted(
        (i, 100 + j, _lev(a, b))
        for i, a in enumerate(left)
        for j, b in enumerate(right)
        if _lev(a, b) <= 2
    )
    assert got == truth
