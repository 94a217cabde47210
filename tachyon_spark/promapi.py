"""Prometheus HTTP-API response shaping (/api/v1 result JSON).

The reference's web backend returns a private {timestamps[], values[]}
shape (tachyon_web_backend/src/main.rs:27-76); real dashboards speak the
Prometheus API: {"status":"success","data":{"resultType":"matrix",
"result":[{"metric":{...}, "values":[[ts,"v"],...]}]}}. This module turns
a Query into that JSON so Grafana-style clients can poll the HTTP shell.

Timestamps: Prometheus uses unix SECONDS; this engine's clock is native
unitless units. Under the repo's ns wall-clock convention
(promql.parser.DURATION_UNITS) `ns_clock=True` (default) divides by 1e9;
pass False to emit raw native units.

Like the rest of server.py this is a parity/testing surface — results are
collected driver-side; the scale path is the DataFrame API.
"""

from __future__ import annotations

# Cap on points collected to the driver per API response. Prometheus
# enforces the same idea (--query.max-samples, 11k points/series in the UI):
# result size is n_steps x n_series, and a careless grid query over a
# high-cardinality selector must fail fast with a clear error, not OOM the
# serving process. The limit is applied as df.limit(max+1) so Spark stops
# producing rows at the cap instead of materializing the full result.
DEFAULT_MAX_POINTS = 1_000_000


class TooManyPoints(ValueError):
    """Result exceeds the serving-path point cap (see DEFAULT_MAX_POINTS)."""


def _bounded_collect(df, max_points):
    if max_points is None:
        return df.collect()
    rows = df.limit(int(max_points) + 1).collect()
    if len(rows) > max_points:
        raise TooManyPoints(
            f"query result exceeds {max_points} points; narrow the time "
            "range, widen the step, or aggregate across series "
            "(configurable via max_points)"
        )
    return rows


def _fmt_ts(t, ns_clock: bool):
    return t / 1e9 if ns_clock else t


def _fmt_val(v):
    # Prometheus renders sample values as strings. Decimal (the u64-exact
    # DecimalType layout) normalizes through int exactly like Query.rows()
    # — str(Decimal) would render '1E+2'-style forms if an op ever shifts
    # the exponent, silently diverging between the two collection paths.
    # None stays None (JSON null) — the fill=null grid rows (r14) carry
    # explicit holes, the shape Grafana's datasource expects.
    import decimal

    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return str(int(v))
    return repr(float(v)) if isinstance(v, float) else str(v)


def _eval_ts(plan, ns_clock: bool):
    """The instant a point-in-time result is reported at: the query's
    evaluation end (Prometheus semantics), 0 only when no range was given."""
    return _fmt_ts(plan.eval_ts, ns_clock) if plan.eval_ts is not None else 0


def prometheus_data(
    query, ns_clock: bool = True, max_points: int | None = DEFAULT_MAX_POINTS,
    instant: bool = False,
) -> dict:
    """The "data" object for a Query result: matrix for multi-instant
    vectors (per-series when stream identity survived the plan, one
    anonymous/grouped series otherwise), scalar for scalars.

    Raises TooManyPoints when the result would exceed `max_points` samples
    (None disables the guard) — the serving path collects driver-side, and
    the cap keeps a high-cardinality grid query from OOMing the server."""
    plan = query.plan
    if plan.kind == "topk":
        # GetK declares ReturnType::Scalar in the reference but yields k
        # VALUES; Prometheus's topk is an instant vector. Render every
        # value at the evaluation ts (series identity does not survive
        # the reference's concat-at-scan semantics, so metrics are empty)
        # instead of silently collapsing to the first value.
        rows = _bounded_collect(query.df(), max_points)
        t = _eval_ts(plan, ns_clock)
        return {
            "resultType": "vector",
            "result": [
                {"metric": {}, "value": [t, _fmt_val(r[0])]} for r in rows
            ],
        }
    if plan.return_type == "scalar":
        v = query.scalar()
        return {
            "resultType": "scalar",
            "result": [_eval_ts(plan, ns_clock), _fmt_val(v)] if v is not None else [],
        }
    if (
        plan.kind == "vector"
        and plan.df is not None
        and "stream_id" in plan.df.columns
        and plan.streams
    ):
        labels = {
            s.stream_id: {"__name__": s.name, **s.labels} for s in plan.streams
        }
        rows = _bounded_collect(
            plan.df.select("stream_id", "ts", "value").orderBy(
                "stream_id", "ts"
            ),
            max_points,
        )
        series: dict[str, list] = {}
        for r in rows:
            series.setdefault(r.stream_id, []).append(
                [_fmt_ts(r.ts, ns_clock), _fmt_val(r.value)]
            )
        if instant:
            # one-step grid evaluation: Prometheus instant VECTOR shape
            result = [
                {"metric": labels.get(sid, {}), "value": vals[-1]}
                for sid, vals in series.items()
            ]
            result.sort(key=lambda x: sorted(x["metric"].items()))
            return {"resultType": "vector", "result": result}
        result = [
            {"metric": labels.get(sid, {}), "values": vals}
            for sid, vals in series.items()
        ]
        result.sort(key=lambda s: sorted(s["metric"].items()))
        return {"resultType": "matrix", "result": result}
    if plan.kind == "grouped" and plan.df is not None:
        if "ts" in plan.df.columns:
            keys = [c for c in plan.group_cols if c != "ts"]
            rows = _bounded_collect(
                plan.df.orderBy(*plan.group_cols), max_points
            )
            series = {}
            for r in rows:
                k = tuple((c, r[c]) for c in keys)
                series.setdefault(k, []).append(
                    [_fmt_ts(r["ts"], ns_clock), _fmt_val(r["value"])]
                )
            # a series may be missing one of the `by` labels (None from the
            # catalog left-join) — sort None-safe and, like Prometheus,
            # OMIT absent labels from the metric instead of rendering 'None'
            none_safe = lambda k: [(c, "" if v is None else str(v)) for c, v in k]
            if instant:
                result = [
                    {
                        "metric": {c: str(v) for c, v in k if v is not None},
                        "value": vals[-1],
                    }
                    for k, vals in sorted(
                        series.items(), key=lambda kv: none_safe(kv[0])
                    )
                ]
                return {"resultType": "vector", "result": result}
            result = [
                {
                    "metric": {c: str(v) for c, v in k if v is not None},
                    "values": vals,
                }
                for k, vals in sorted(series.items(), key=lambda kv: none_safe(kv[0]))
            ]
            return {"resultType": "matrix", "result": result}
        # grouped instant (raw-path `sum by (...)`) — a Prometheus vector
        keys = list(plan.group_cols)
        rows = _bounded_collect(plan.df.orderBy(*keys), max_points)
        return {
            "resultType": "vector",
            "result": [
                {
                    "metric": {
                        c: str(r[c]) for c in keys if r[c] is not None
                    },
                    "value": [_eval_ts(plan, ns_clock), _fmt_val(r["value"])],
                }
                for r in rows
            ],
        }
    # derived vector without series identity: one anonymous series
    rows = _bounded_collect(query.df(), max_points)
    if instant:
        return {
            "resultType": "vector",
            "result": [
                {
                    "metric": {},
                    "value": [
                        _fmt_ts(rows[-1].ts, ns_clock),
                        _fmt_val(rows[-1].value),
                    ],
                }
            ]
            if rows
            else [],
        }
    return {
        "resultType": "matrix",
        "result": [
            {
                "metric": {},
                "values": [
                    [_fmt_ts(r.ts, ns_clock), _fmt_val(r.value)] for r in rows
                ],
            }
        ]
        if rows
        else [],
    }


def prometheus_envelope(
    query, ns_clock: bool = True, max_points: int | None = DEFAULT_MAX_POINTS,
    instant: bool = False,
) -> dict:
    return {
        "status": "success",
        "data": prometheus_data(query, ns_clock, max_points, instant),
    }


def _escape_label(v: str) -> str:
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def openmetrics_text(
    conn, start=None, end=None, ns_clock: bool = True, match=None
) -> str:
    """OpenMetrics/Prometheus text exposition of the LATEST sample per
    stream (optionally within [start, end]) — the /metrics page, so a real
    Prometheus can scrape this engine's state. One distributed max_by per
    stream (map-side partial argmax, one exchange on stream_id); labels
    attach driver-side from the bounded catalog. Lines sorted for
    determinism; ends with the required # EOF.

    `match` (a selector string or a list of them — Prometheus
    federation's repeated match[] parameter) restricts the exposition to
    the union of streams the selectors resolve to; the id set pushes
    down to the scan (GET /federate serves this form).

    OpenMetrics timestamps are unix SECONDS; `ns_clock=True` (default)
    converts the engine's native ns clock, matching prometheus_data.
    Pass False for native-unit exposition (not scrapeable by a real
    Prometheus — test/debug only). `start`/`end` stay in native units
    either way (they filter the raw ts column)."""
    from pyspark.sql import functions as F

    streams = conn.get_all_streams()
    if match is not None:
        matchers = [match] if isinstance(match, str) else list(match)
        keep: dict[str, object] = {}
        for m in matchers:
            for s in conn._match_streams(m):
                keep[s.stream_id] = s
        streams = [keep[k] for k in sorted(keep)]
        if not streams:
            return "# EOF\n"

    df = conn.samples_df()
    if match is not None:
        df = df.where(F.col("stream_id").isin([s.stream_id for s in streams]))
    if start is not None:
        df = df.where(F.col("ts") >= int(start))
    if end is not None:
        df = df.where(F.col("ts") <= int(end))
    pt = F.struct("ts", "value", "value_int")
    latest = {
        r["stream_id"]: r["p"]
        for r in df.groupBy("stream_id").agg(F.max_by(pt, "ts").alias("p")).collect()
    }
    lines = []
    for s in streams:
        p = latest.get(s.stream_id)
        if p is None:
            continue
        v = p["value"] if p["value"] is not None else p["value_int"]
        labels = ",".join(
            f'{k}="{_escape_label(str(val))}"'
            for k, val in sorted(s.labels.items())
        )
        body = f"{{{labels}}}" if labels else ""
        ts = _fmt_ts(p["ts"], ns_clock)
        lines.append(f"{s.name}{body} {v} {ts}")
    return "\n".join(sorted(lines)) + "\n# EOF\n"


def exemplars_envelope(
    conn, query: str, start: int, end: int,
    ns_clock: bool = True, max_points=DEFAULT_MAX_POINTS,
):
    """/api/v1/query_exemplars data payload: series matching the
    selector, each with its stored exemplars in [start, end] — the
    seriesLabels/exemplars shape Grafana's trace links consume. Rides
    the selector-scoped store read (exemplars.query_exemplars) through
    the serving point cap."""
    from tachyon_spark.exemplars import query_exemplars

    df = query_exemplars(conn, query, start, end).orderBy(
        "stream_id", "ts"
    )
    rows = _bounded_collect(df, max_points)
    by_series: dict = {}
    for r in rows:
        key = (r.name, tuple(sorted(r.labels.items())))
        by_series.setdefault(key, []).append(
            {
                "labels": dict(r.ex_labels),
                "value": _fmt_val(r.value),
                "timestamp": _fmt_ts(r.ts, ns_clock),
            }
        )
    return [
        {
            "seriesLabels": {"__name__": name, **dict(labels)},
            "exemplars": exs,
        }
        for (name, labels), exs in sorted(by_series.items())
    ]
