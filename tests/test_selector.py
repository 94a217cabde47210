"""Phase-1 E2E slice: selector scan goldens from the reference
(tachyon_core/src/lib.rs:701-760, FIXTURES.md Fixture A)."""

import pytest

FIXTURE_A = [(23, 45), (29, 47), (40, 23), (51, 48)]


def test_full_range(golden_db):
    q = golden_db.query('http_requests_total{service="web"}', 23, 51)
    assert q.rows() == FIXTURE_A
    assert q.value_type == "u64"
    assert q.return_type == "vector"


def test_partial_range(golden_db):
    q = golden_db.query('http_requests_total{service="web"}', 29, 40)
    assert q.rows() == [(29, 47), (40, 23)]


def test_stream_isolation(golden_db):
    q = golden_db.query('http_requests_total{service="cool"}', 0, 100)
    assert q.rows() == [(12, 1), (15, 5), (30, 40), (67, 20)]


def test_multi_stream_concat(golden_db):
    q = golden_db.query("http_requests_total", 0, 100)
    # all three streams, deterministic (stream, ts) order
    assert len(q.rows()) == 12


def test_regex_matcher_extension(golden_db):
    q = golden_db.query('http_requests_total{service=~"web|mobile"}', 23, 23)
    assert sorted(v for _, v in q.rows()) == [9, 45]


def test_no_match_raises(golden_db):
    with pytest.raises(ValueError, match="no streams matched"):
        golden_db.query('nope{service="web"}', 0, 100)


def test_at_modifier_pins_start(golden_db):
    # @29 pins start to 29 (planner.rs:162-180); end stays 51
    q = golden_db.query('http_requests_total{service="web"} @ 29', None, 51)
    assert q.rows() == [(29, 47), (40, 23), (51, 48)]
    # offset adds to the @ anchor
    q2 = golden_db.query('http_requests_total{service="web"} @ 29 offset 11', None, 51)
    assert q2.rows() == [(40, 23), (51, 48)]


def test_regex_matchers_fully_anchored(golden_db):
    """Prometheus wraps every regex matcher in ^(?:...)$ (labels.
    NewMatcher): service=~"web" must NOT match a hypothetical "webapp",
    and a partial pattern matches nothing unless it covers the whole
    value. Both resolution paths (driver re.fullmatch + distributed
    anchored rlike) agree."""
    # "we" is a substring of "web" but anchored it matches nothing
    # (empty resolution raises, reference semantics)
    with pytest.raises(ValueError, match="no streams matched"):
        golden_db.query('http_requests_total{service=~"we"}', 0, 100)
    # the full value matches
    q = golden_db.query('http_requests_total{service=~"web"}', 23, 23)
    assert len(q.rows()) == 1
    # .* completes the partial pattern
    q = golden_db.query('http_requests_total{service=~"we.*"}', 23, 23)
    assert len(q.rows()) == 1
    # negation: !~"web" excludes exactly web, keeps cool/mobile
    q = golden_db.query('http_requests_total{service!~"web"}', 12, 12)
    assert q.rows() == [(12, 1)]  # only cool has a sample at ts 12
    # alternation anchors each alternative as a whole
    q = golden_db.query('http_requests_total{service=~"web|mob"}', 23, 23)
    assert len(q.rows()) == 1  # "mob" does not match "mobile"


def test_name_matcher_and_bare_selector(golden_db):
    """Prometheus reserved label __name__: `{__name__="m"}` is `m`, a
    __name__ regex selects across metrics, and it composes with plain
    matchers on a named selector."""
    plain = golden_db.query("ints", 0, 100).rows()
    assert golden_db.query('{__name__="ints"}', 0, 100).rows() == plain
    # regex across metrics, anchored: "ints|uints" matches both streams
    both = golden_db.query('{__name__=~"ints|uints"}', 10, 10).rows()
    assert sorted(v for _, v in both) == [1, 2]  # ints 2, uints 1 at ts 10
    # __name__ matcher on a NAMED selector must agree with the name
    import pytest

    with pytest.raises(ValueError, match="no streams matched"):
        golden_db.query('ints{__name__="uints"}', 0, 100)
    # and matches when consistent
    assert golden_db.query('ints{__name__="ints"}', 0, 100).rows() == plain
