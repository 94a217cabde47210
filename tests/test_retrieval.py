"""BM25 lexical retrieval (functions/retrieval.py, round 11)."""

from __future__ import annotations

import math

import pytest

from tachyon_spark.functions.retrieval import bm25_topk


def _bm25(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "hash join hash probe build"),
        (2, "sort merge join spill"),
        (3, "scan filter project scan"),
        (4, "hash HASH hash aggregate"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_scores_and_order(corpus):
    out = bm25_topk(corpus, ["hash"], k=10).collect()
    # df(hash)=2 (docs 1 and 4 — case-folded), N=4, avgdl=4.25
    exp1 = _bm25(2, 2, 4, 5, 4.25)
    exp4 = _bm25(3, 2, 4, 4, 4.25)
    got = {r.doc_id: r.score for r in out}
    assert list(got) == [4, 1]  # doc 4 has higher tf and shorter dl
    assert got[1] == pytest.approx(round(exp1, 6), abs=1e-6)
    assert got[4] == pytest.approx(round(exp4, 6), abs=1e-6)


def test_bm25_multi_term_sums_and_k_cut(corpus):
    out = bm25_topk(corpus, ["hash", "join"], k=2).collect()
    # docs 1 (hash+join), 4 (hash), 2 (join) all score; k=2 keeps the top
    assert len(out) == 2
    assert out[0].score >= out[1].score
    assert out[0].doc_id == 1  # both terms hit doc 1
    # uppercase query terms fold to the same result
    up = bm25_topk(corpus, ["HASH", "Join"], k=2).collect()
    assert [(r.doc_id, r.score) for r in up] == [
        (r.doc_id, r.score) for r in out
    ]


def test_bm25_requires_terms(corpus):
    with pytest.raises(ValueError, match="query term"):
        bm25_topk(corpus, [])


def test_bm25_plan_is_take_ordered(corpus):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bm25_topk(corpus, ["hash"], k=3).explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan.replace(
        "BroadcastNestedLoopJoin", ""
    )


def test_rrf_fuse_matches_python_model(spark):
    from tachyon_spark.functions.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 9.5), (2, 7.0), (3, 5.0), (4, 5.0)],
        "doc_id long, score double",
    )
    sem = spark.createDataFrame(
        [(3, 0.9), (5, 0.8), (2, 0.7)], "doc_id long, score double"
    )
    got = [(r["doc_id"], r["rrf"])
           for r in rrf_fuse([lex, sem], k=10, c=60).collect()]
    # python model: ranks tie-break by id
    lr = {1: 1, 2: 2, 3: 3, 4: 4}  # (5.0, 3) before (5.0, 4)
    sr = {3: 1, 5: 2, 2: 3}
    exp = {}
    for d in {1, 2, 3, 4, 5}:
        s = 0.0
        if d in lr:
            s += 1.0 / (60 + lr[d])
        if d in sr:
            s += 1.0 / (60 + sr[d])
        exp[d] = round(s, 6)
    exp_order = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == [(d, s) for d, s in exp_order]


def test_rrf_fuse_single_list_and_validation(spark):
    import pytest

    from tachyon_spark.functions.retrieval import rrf_fuse

    lst = spark.createDataFrame(
        [(7, 1.0), (8, 0.5)], "doc_id long, score double"
    )
    got = [(r["doc_id"], r["rrf"]) for r in rrf_fuse([lst], k=1).collect()]
    assert got == [(7, round(1.0 / 61, 6))]
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="c must"):
        rrf_fuse([lst], c=0)


def test_rrf_fuse_fuzz_matches_python_model(spark):
    # deterministic pseudo-random lists with deliberate score ties —
    # rank tie-break by id must match the model in every case
    import random

    from tachyon_spark.functions.retrieval import rrf_fuse

    rng = random.Random(11)
    for trial in range(4):
        nlists = rng.randint(1, 3)
        lists = []
        for _ in range(nlists):
            ids = rng.sample(range(30), rng.randint(1, 12))
            lists.append(
                [(i, float(rng.randint(0, 5))) for i in ids]  # many ties
            )
        dfs = [
            spark.createDataFrame(rows, "doc_id long, score double")
            for rows in lists
        ]
        got = [(r["doc_id"], r["rrf"])
               for r in rrf_fuse(dfs, k=50, c=60).collect()]
        ranks = []
        for rows in lists:
            order = sorted(rows, key=lambda t: (-t[1], t[0]))
            ranks.append({d: i + 1 for i, (d, _) in enumerate(order)})
        all_ids = set().union(*[set(r) for r in ranks])
        exp = {}
        for d in all_ids:
            s = 0.0
            for r in ranks:
                if d in r:
                    s += 1.0 / (60 + r[d])
            exp[d] = round(s, 6)
        exp_order = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got == exp_order, trial
