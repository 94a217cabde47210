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
