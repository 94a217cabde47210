"""Gopher rule flags + token entropy (functions/textstats.py round-5
additions). Point semantics pinned here; corpus-level agreement is
oracle-gated via __spark_entry__."""

import math

import pytest
from pyspark.sql import functions as F

from tachyon_spark.functions.textstats import (
    gopher_quality_flags,
    token_entropy,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 60 normal words incl. stopwords -> passes every rule
        (0, "the quick brown fox jumps over a lazy dog and runs on " * 5),
        # too short
        (1, "the tiny one"),
        # symbol-heavy: many # marks and ellipses
        (2, ("### ... ### word " * 20) + "the a and"),
        # numeric soup: words without letters fail ok_alpha
        (3, ("123 456 789 000 " * 20) + "the a and for with"),
        # degenerate repetition (entropy ~ 0)
        (4, "spam " * 80),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_rules_point_cases(docs):
    out = {r["doc_id"]: r.asDict() for r in gopher_quality_flags(docs).collect()}
    assert out[0]["pass"] is True
    assert out[1]["ok_n_tokens"] is False and out[1]["pass"] is False
    assert out[2]["ok_symbols"] is False
    assert out[3]["ok_alpha"] is False
    # repetition alone doesn't fail Gopher's rule set (that's entropy's job)
    assert out[4]["ok_word_len"] is True


def test_token_entropy_bounds(docs):
    out = {r["id"]: r for r in token_entropy(docs).collect()}
    # all-identical tokens: H = 0
    assert out[4]["entropy"] == 0.0
    # mixed doc: 0 < H <= ln(n_tok), maximum when all tokens distinct
    h0 = out[0]["entropy"]
    assert 0.0 < h0 <= math.log(out[0]["n_tok"]) + 1e-9
    # uniform-distribution check: 12 distinct words x 5 repeats -> ln(12)
    assert abs(h0 - math.log(12)) < 1e-6


# ----------------------------------- quality_percentile / ngrams / vocab


def test_quality_percentile_domain_relative(spark):
    from tachyon_spark.functions.textstats import quality_percentile

    rows = [
        # src A: three docs of increasing quality (longer, more stopwords)
        (1, "A", "x y"),
        (2, "A", "the and is of it " * 10),
        (3, "A", "the quick brown fox is on the hill and it runs " * 5),
        # src B: two docs
        (4, "B", "z"),
        (5, "B", "the cat is on the mat and it sleeps " * 8),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r["pctl"] for r in quality_percentile(df).collect()}
    # lowest doc per domain gets 0.0; highest gets 1.0 — per DOMAIN
    assert out[1] == 0.0 and out[3] == 1.0
    assert out[4] == 0.0 and out[5] == 1.0


def test_corpus_top_ngrams_counts_and_ties(spark):
    from tachyon_spark.functions.textstats import corpus_top_ngrams

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x")], "doc_id long, text string"
    )
    got = [(r["ngram"], r["n"]) for r in corpus_top_ngrams(df, n=2, top=3).collect()]
    # bigrams: doc1: 'a b','b a','a b','b c'; doc2: 'a b','b x'
    assert got[0] == ("a b", 3)
    assert set(got[1:]) <= {("a b", 3), ("b a", 1), ("b c", 1), ("b x", 1)}
    # tie-break: count desc then ngram asc
    assert got[1] == ("b a", 1) and got[2] == ("b c", 1)
    # unigrams and short-doc guard
    uni = dict((r["ngram"], r["n"]) for r in corpus_top_ngrams(df, n=1, top=10).collect())
    assert uni["a"] == 3 and uni["b"] == 3
    # the general indexed-concat path (n != 2, r13)
    tri = dict((r["ngram"], r["n"]) for r in corpus_top_ngrams(df, n=3, top=10).collect())
    assert tri == {"a b a": 1, "b a b": 1, "a b c": 1, "a b x": 1}
    import pytest

    with pytest.raises(ValueError):
        corpus_top_ngrams(df, n=0)


def test_vocab_stats(spark):
    from tachyon_spark.functions.textstats import vocab_stats

    df = spark.createDataFrame(
        [(1, "A", "a a b"), (2, "A", "a c"), (3, "B", "z z z z")],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in vocab_stats(df).collect()}
    # A: tokens a,a,b,a,c -> 5 tokens, 3 types, hapax b,c -> 2/3
    assert out["A"]["n_tokens"] == 5 and out["A"]["n_types"] == 3
    assert out["A"]["ttr"] == 0.6
    assert abs(out["A"]["hapax_frac"] - 2 / 3) < 1e-6
    # B: 4 tokens 1 type, no hapax
    assert out["B"]["n_tokens"] == 4 and out["B"]["n_types"] == 1
    assert out["B"]["hapax_frac"] == 0.0


def test_corr_matrix_one_scan(spark):
    import math

    from tachyon_spark.functions.util import corr_matrix

    rows = [(float(i), 2.0 * i + 1.0, float((-1) ** i)) for i in range(10)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {(r["col_a"], r["col_b"]): r["corr"] for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    assert got[("x", "y")] == 1.0  # exact linear
    assert abs(got[("x", "z")]) < 0.2  # alternating sign ~ uncorrelated
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
    import pytest

    with pytest.raises(ValueError):
        corr_matrix(df, ["x"])


def test_table_profile_split_distinct_branch(spark):
    # r16: distinct counts aggregate separately from min/max so the
    # multi-distinct Expand stays a HashAggregate; this pins the values
    # across the split — typed (numeric) min/max, null accounting, and
    # exact distincts on a frame with nulls and duplicates
    from tachyon_spark.functions.util import table_profile

    df = spark.createDataFrame(
        [(10, "b", None), (9, "a", 2.5), (9, None, 2.5), (100, "a", -1.0)],
        "n long, s string, v double",
    )
    got = {r["column"]: r for r in table_profile(df).collect()}
    assert [got[c]["n_rows"] for c in ("n", "s", "v")] == [4, 4, 4]
    assert [got[c]["n_null"] for c in ("n", "s", "v")] == [0, 1, 1]
    assert [got[c]["n_distinct"] for c in ("n", "s", "v")] == [3, 2, 2]
    # typed ordering: min/max computed BEFORE the string render
    assert (got["n"]["min_value"], got["n"]["max_value"]) == ("9", "100")
    assert (got["v"]["min_value"], got["v"]["max_value"]) == ("-1.0", "2.5")
    assert (got["s"]["min_value"], got["s"]["max_value"]) == ("a", "b")
