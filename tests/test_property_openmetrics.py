"""Property-based round-trip: exposition RENDER -> parse_openmetrics.

Labels are rendered exactly the way promapi.openmetrics_text renders them
(_escape_label: \\ -> \\\\, " -> \\", newline -> \\n) and must parse back
verbatim — including the r12 adversarial shapes: label values containing
the exemplar separator ' # {', lone braces, quotes, trailing backslashes.
Each hypothesis example carries a BATCH of lines so one Spark job covers
many cases (the per-example cost is the collect, not the data).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tachyon_spark.promapi import _escape_label

# label values: printable ASCII plus the characters the escaper and the
# quote-aware exemplar strip care about; hypothesis shrinks toward the
# nasty fragments, which are seeded explicitly too
_fragments = st.sampled_from(
    [" # {", "} 1 2", '"', "\\", "\n", "{", "#", " # ", "a=\"b\""]
)
label_value = st.one_of(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=12,
    ),
    st.tuples(_fragments, st.text(max_size=4, alphabet="ab #{}\\\"")).map(
        lambda t: t[0] + t[1]
    ),
)
label_key = st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True)
labels_strategy = st.dictionaries(label_key, label_value, max_size=3)

case_strategy = st.tuples(
    labels_strategy,
    st.integers(min_value=-(10**12), max_value=10**12),  # value (exact)
    st.integers(min_value=0, max_value=10**15),  # ts, native units
    st.booleans(),  # append an exemplar suffix
)


def _render(name, labels, value, ts, exemplar):
    body = (
        "{"
        + ",".join(
            f'{k}="{_escape_label(v)}"' for k, v in sorted(labels.items())
        )
        + "}"
        if labels
        else ""
    )
    line = f"{name}{body} {value} {ts}"
    if exemplar:
        line += ' # {trace_id="abc"} 0.5'
    return line


@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(cases=st.lists(case_strategy, min_size=1, max_size=10))
def test_exposition_roundtrip(spark, cases):
    from tachyon_spark.sources.openmetrics import parse_openmetrics

    lines = [
        (_render(f"m{i}", lb, v, ts, ex),)
        for i, (lb, v, ts, ex) in enumerate(cases)
    ]
    df = spark.createDataFrame(lines, "value string")
    rows = {r.name: r for r in parse_openmetrics(df, ns_clock=False).collect()}
    assert len(rows) == len(cases)
    for i, (lb, v, ts, ex) in enumerate(cases):
        r = rows[f"m{i}"]
        assert dict(r.labels) == lb, (r.labels, lb)
        assert r.value == float(v)
        assert r.ts == ts
