"""Round-11 ADVICE conformance pins.

One test block per round-10 advisor finding:

1. Aggregation over a `without`-grouped child must DECOMPOSE the opaque
   composite series key and re-key (Plan.series_labels +
   PlanBuilder._rekey_series) — `sum without (c) (sum without (b) (m))`
   merges series differing only in c. Before the fix the grid path
   silently regrouped the composite unchanged (no merge) and the raw
   path collapsed to a scalar.
2. py_arith('^', 0.0, -inf) — int(-inf) raised OverflowError; Go /
   java.lang.Math.pow(0, -Inf) return +Inf, so the scalar fold must too.
3. OpenMetrics exemplar lines (`name 1 2 # {trace_id="x"} 0.5`) are
   valid exposition — the parser strips the exemplar suffix instead of
   FAILFAST-aborting the whole ingest.
4. Connection.snapshot retries the copy on FileNotFoundError (concurrent
   maintenance swap window) — pinned lightly: the retry path must not
   break the ordinary single-writer snapshot.
"""

from __future__ import annotations

import math

import pytest

from tachyon_spark.arith import py_arith
from tests.conftest import make_stream

INF = float("inf")


@pytest.fixture()
def nested_db(db):
    """Three-label fixture: dropping b then c must merge partially."""
    make_stream(db, 'm{a="1",b="x",c="p"}', "f64", [(10, 1.0)])
    make_stream(db, 'm{a="1",b="y",c="p"}', "f64", [(10, 2.0)])
    make_stream(db, 'm{a="1",b="x",c="q"}', "f64", [(10, 4.0)])
    make_stream(db, 'm{a="2",b="x",c="p"}', "f64", [(10, 8.0)])
    return db


# --- 1a. without-over-without: grid path ----------------------------------

def test_without_over_without_merges_grid(nested_db):
    # inner: sum without (b) -> {a=1,c=p}:3, {a=1,c=q}:4, {a=2,c=p}:8
    q = nested_db.query_range(
        "sum without (c) (sum without (b) (m))", 10, 10, 10, lookback=10
    )
    got = {(r.series, r.ts): r.value for r in q.df().collect()}
    assert got == {("a=1", 10): 7.0, ("a=2", 10): 8.0}


def test_by_over_without_grid(nested_db):
    q = nested_db.query_range(
        "sum by (a) (sum without (b) (m))", 10, 10, 10, lookback=10
    )
    got = {(r.a, r.ts): r.value for r in q.df().collect()}
    assert got == {("1", 10): 7.0, ("2", 10): 8.0}
    # and by a label the composite carries in only some groups is still
    # validated against the union of remaining labels
    with pytest.raises(ValueError, match="not present"):
        nested_db.query_range(
            "sum by (nope) (sum without (b) (m))", 10, 10, 10, lookback=10
        )


def test_max_by_over_without_grid(nested_db):
    q = nested_db.query_range(
        "max by (c) (sum without (b) (m))", 10, 10, 10, lookback=10
    )
    got = {(r.c, r.ts): r.value for r in q.df().collect()}
    assert got == {("p", 10): 8.0, ("q", 10): 4.0}


def test_without_drop_all_single_group_grid(nested_db):
    q = nested_db.query_range(
        "sum without (a, c) (sum without (b) (m))", 10, 10, 10, lookback=10
    )
    got = {(r.series, r.ts): r.value for r in q.df().collect()}
    assert got == {("", 10): 15.0}


# --- 1b. without-over-without: raw/instant path ---------------------------

def test_without_over_without_merges_raw(nested_db):
    q = nested_db.query("sum without (c) (sum without (b) (m))", 0, 100)
    got = {r.series: r.value for r in q.df().collect()}
    assert got == {"a=1": 7.0, "a=2": 8.0}


def test_by_over_without_raw(nested_db):
    q = nested_db.query("sum by (a) (sum without (b) (m))", 0, 100)
    got = {r.a: r.value for r in q.df().collect()}
    assert got == {"1": 7.0, "2": 8.0}
    # ungrouped outer over a composite child still collapses to a scalar
    assert nested_db.query(
        "sum (sum without (b) (m))", 0, 100
    ).rows() == [15.0]


def test_aggregate_over_histogram_quantile_rekeys(nested_db):
    # histogram bucket composites carry the series -> label map too
    # (le_series_frame), so outer by/without over histogram_quantile
    # re-keys instead of raising (and never silently regroups).
    # svc=a: buckets {le1: 1, +Inf: 2} -> q0.5 = 1.0
    # svc=b: buckets {le1: 3, +Inf: 3} -> q0.5 = 0.5
    make_stream(nested_db, 'hm{le="1",svc="a"}', "u64", [(10, 1)])
    make_stream(nested_db, 'hm{le="+Inf",svc="a"}', "u64", [(10, 2)])
    make_stream(nested_db, 'hm{le="1",svc="b"}', "u64", [(10, 3)])
    make_stream(nested_db, 'hm{le="+Inf",svc="b"}', "u64", [(10, 3)])
    q = nested_db.query_range(
        "sum without (svc) (histogram_quantile(0.5, hm))",
        10, 10, 10, lookback=10,
    )
    got = {(r.series, r.ts): r.value for r in q.df().collect()}
    assert got == {("", 10): 1.5}
    q = nested_db.query_range(
        "max by (svc) (histogram_quantile(0.5, hm))",
        10, 10, 10, lookback=10,
    )
    got = {(r.svc, r.ts): r.value for r in q.df().collect()}
    assert got == {("a", 10): 1.0, ("b", 10): 0.5}


# --- 2. pow(0, -Inf) -------------------------------------------------------

@pytest.mark.parametrize(
    "a,b,expected",
    [
        (0.0, -INF, INF),
        (-0.0, -INF, INF),   # Math.pow(-0.0, -Inf) = +Inf too
        (0.0, -1.0, INF),    # unchanged
    ],
)
def test_py_arith_pow_zero_base_neg_inf(a, b, expected):
    assert py_arith("^", a, b) == expected
    assert not math.isnan(py_arith("^", a, b))


# --- 3. OpenMetrics exemplar lines -----------------------------------------

def test_openmetrics_exemplar_suffix_stripped(spark):
    from tachyon_spark.sources.openmetrics import parse_openmetrics

    text = "\n".join(
        [
            "# TYPE acme_bucket histogram",
            'acme_bucket{le="0.01"} 0 123',
            'acme_bucket{le="0.1"} 8 123 # {trace_id="KOO5S4vxi0o"} 0.067',
            "plain_total 17 124 # {} 0.5 125",
        ]
    )
    lines = spark.createDataFrame([(l,) for l in text.split("\n")], "value string")
    rows = parse_openmetrics(lines, ns_clock=False).collect()
    assert len(rows) == 3
    by_key = {(r.series_key, r.ts): r.value for r in rows}
    assert by_key[('acme_bucket{le="0.1"}', 123)] == 8.0
    assert by_key[("plain_total{}", 124)] == 17.0


def test_openmetrics_hash_in_label_value_not_stripped(spark):
    from tachyon_spark.sources.openmetrics import parse_openmetrics

    lines = spark.createDataFrame(
        [('m{p="a # b"} 1 5',)], "value string"
    )
    rows = parse_openmetrics(lines, ns_clock=False).collect()
    assert len(rows) == 1 and rows[0].labels == {"p": "a # b"}


# --- 4. snapshot still works through the retry wrapper ---------------------

def test_snapshot_roundtrip_after_retry_wrapper(db, spark, tmp_path):
    make_stream(db, "snap_m", "f64", [(1, 1.0), (2, 2.0)])
    dest = db.snapshot("advice-r11")
    from tachyon_spark.connection import Connection

    c2 = Connection(dest, spark)
    assert c2.query("snap_m", 0, 10).rows() == [(1, 1.0), (2, 2.0)]


def test_aggregate_over_topk_without_rekeys(nested_db):
    # grouped topk threads the series -> label map too, so an outer
    # aggregation over `topk without (...)` re-keys instead of raising
    # (raw mode: the topk rows collapse per outer group)
    make_stream(nested_db, 'tv{service="web",host="a"}', "f64",
                [(10, 1.0), (20, 2.0)])
    make_stream(nested_db, 'tv{service="web",host="b"}', "f64", [(10, 3.0)])
    make_stream(nested_db, 'tv{service="api",host="a"}', "f64", [(10, 5.0)])
    q = nested_db.query(
        "sum without (host) (topk without (service) (1, tv))", 0, 100
    )
    got = {r.series: r.value for r in q.df().collect()}
    # per-host best: a -> 5.0 (api), b -> 3.0; outer merge drops host
    assert got == {"": 8.0}
