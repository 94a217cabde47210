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


def _fmt_ts(t, ns_clock: bool):
    return t / 1e9 if ns_clock else t


def _fmt_val(v) -> str:
    # Prometheus renders sample values as strings
    return repr(float(v)) if isinstance(v, float) else str(v)


def prometheus_data(query, ns_clock: bool = True) -> dict:
    """The "data" object for a Query result: matrix for multi-instant
    vectors (per-series when stream identity survived the plan, one
    anonymous/grouped series otherwise), scalar for scalars."""
    plan = query.plan
    if plan.return_type == "scalar":
        v = query.scalar()
        return {
            "resultType": "scalar",
            "result": [0, _fmt_val(v)] if v is not None else [],
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
        rows = (
            plan.df.select("stream_id", "ts", "value")
            .orderBy("stream_id", "ts")
            .collect()
        )
        series: dict[str, list] = {}
        for r in rows:
            series.setdefault(r.stream_id, []).append(
                [_fmt_ts(r.ts, ns_clock), _fmt_val(r.value)]
            )
        result = [
            {"metric": labels.get(sid, {}), "values": vals}
            for sid, vals in series.items()
        ]
        result.sort(key=lambda s: sorted(s["metric"].items()))
        return {"resultType": "matrix", "result": result}
    if plan.kind == "grouped" and plan.df is not None:
        if "ts" in plan.df.columns:
            keys = [c for c in plan.group_cols if c != "ts"]
            rows = plan.df.orderBy(*plan.group_cols).collect()
            series = {}
            for r in rows:
                k = tuple((c, r[c]) for c in keys)
                series.setdefault(k, []).append(
                    [_fmt_ts(r["ts"], ns_clock), _fmt_val(r["value"])]
                )
            result = [
                {"metric": {c: str(v) for c, v in k}, "values": vals}
                for k, vals in sorted(series.items())
            ]
            return {"resultType": "matrix", "result": result}
        # grouped instant (raw-path `sum by (...)`) — a Prometheus vector
        keys = list(plan.group_cols)
        rows = plan.df.orderBy(*keys).collect()
        return {
            "resultType": "vector",
            "result": [
                {
                    "metric": {c: str(r[c]) for c in keys},
                    "value": [0, _fmt_val(r["value"])],
                }
                for r in rows
            ],
        }
    # derived vector without series identity: one anonymous series
    rows = query.rows()
    return {
        "resultType": "matrix",
        "result": [
            {
                "metric": {},
                "values": [[_fmt_ts(t, ns_clock), _fmt_val(v)] for t, v in rows],
            }
        ]
        if rows
        else [],
    }


def prometheus_envelope(query, ns_clock: bool = True) -> dict:
    return {"status": "success", "data": prometheus_data(query, ns_clock)}


def _escape_label(v: str) -> str:
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def openmetrics_text(conn, start=None, end=None) -> str:
    """OpenMetrics/Prometheus text exposition of the LATEST sample per
    stream (optionally within [start, end]) — the /metrics page, so a real
    Prometheus can scrape this engine's state. One distributed max_by per
    stream (map-side partial argmax, one exchange on stream_id); labels
    attach driver-side from the bounded catalog. Lines sorted for
    determinism; ends with the required # EOF."""
    from pyspark.sql import functions as F

    df = conn.samples_df()
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
    for s in conn.get_all_streams():
        p = latest.get(s.stream_id)
        if p is None:
            continue
        v = p["value"] if p["value"] is not None else p["value_int"]
        labels = ",".join(
            f'{k}="{_escape_label(str(val))}"'
            for k, val in sorted(s.labels.items())
        )
        body = f"{{{labels}}}" if labels else ""
        lines.append(f"{s.name}{body} {v} {p['ts']}")
    return "\n".join(sorted(lines)) + "\n# EOF\n"
