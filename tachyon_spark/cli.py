"""Command-line shell — parity with the reference CLI.

Reference surface (tachyon_cli/src/main.rs): create-stream, list-all-streams,
insert, import-csv, query (with CSV export and ASCII chart), parse-headers.
Same verbs here over the Spark engine; the chart is a dependency-free ASCII
plot instead of textplots.

Usage:
    python -m tachyon_spark.cli <db_dir> create-stream '<selector>' f64
    python -m tachyon_spark.cli <db_dir> list-all-streams
    python -m tachyon_spark.cli <db_dir> insert '<selector>' <ts> <value>
    python -m tachyon_spark.cli <db_dir> import-csv '<selector>' <file.csv>
    python -m tachyon_spark.cli <db_dir> query '<promql>' --start 0 --end 100 [--export out/ | --chart]
    python -m tachyon_spark.cli <db_dir> check-stream-exists '<selector>'
    python -m tachyon_spark.cli <db_dir> repl [--start N --end N --chart]
    python -m tachyon_spark.cli <db_dir> parse-headers

Beyond the reference: import-jsonl, import-openmetrics (scraped
/metrics text), query-range (step grids, --explain), record (recording
rules), alerts (rule backfill), labels / label-values / series
(metadata), delete-series (ranged sample deletion), snapshot.
"""

from __future__ import annotations

import argparse
import sys

# reference default end: a fixed ms epoch (tachyon_cli/src/main.rs:195-202)
DEFAULT_END = 1719776339748


def _ascii_chart(rows: list[tuple], width: int = 60, height: int = 12) -> str:
    if not rows:
        return "(empty)"
    ts = [r[0] for r in rows]
    vs = [float(r[1]) for r in rows]
    lo, hi = min(vs), max(vs)
    span = (hi - lo) or 1.0
    grid = [[" "] * width for _ in range(height)]
    n = len(rows)
    for i, v in enumerate(vs):
        x = int(i * (width - 1) / max(n - 1, 1))
        y = int((v - lo) / span * (height - 1))
        grid[height - 1 - y][x] = "*"
    lines = ["".join(row) for row in grid]
    lines.append(f"ts [{ts[0]} .. {ts[-1]}]  value [{lo:g} .. {hi:g}]  n={n}")
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="tachyon_spark")
    p.add_argument("db_dir")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("create-stream")
    sp.add_argument("selector")
    sp.add_argument("value_type", choices=["i64", "u64", "f64"])

    sub.add_parser("list-all-streams")

    sp = sub.add_parser("insert")
    sp.add_argument("selector")
    sp.add_argument("ts", type=int)
    sp.add_argument("value")

    sp = sub.add_parser("import-csv")
    sp.add_argument("selector")
    sp.add_argument("csv_path")

    sp = sub.add_parser("import-jsonl")
    sp.add_argument("selector")
    sp.add_argument("jsonl_path")

    # scraped /metrics text (OpenMetrics exposition): selector-less —
    # series identity comes from each line's name{labels}
    sp = sub.add_parser("import-openmetrics")
    sp.add_argument("path")
    sp.add_argument("--native-units", action="store_true",
                    help="timestamps are native integer units, not unix "
                         "seconds")
    sp.add_argument("--value-type", default="f64")

    sp = sub.add_parser("import-lp")
    sp.add_argument("path")
    sp.add_argument("--precision", default="ns",
                    choices=["ns", "us", "ms", "s"])
    sp.add_argument("--value-type", default="f64")

    sp = sub.add_parser("import-graphite")
    sp.add_argument("path")
    sp.add_argument("--ts-unit", default="s",
                    choices=["s", "ms", "us", "ns"])
    sp.add_argument("--value-type", default="f64")

    sp = sub.add_parser("import-remote-write")
    sp.add_argument("path", help="WriteRequest blob file(s) (path/glob)")
    sp.add_argument("--ts-unit", default="ms",
                    choices=["s", "ms", "us", "ns"])
    sp.add_argument("--value-type", default="f64")
    sp.add_argument("--uncompressed", action="store_true",
                    help="bodies are raw protobuf (no snappy)")
    sp.add_argument("--proto", default="1", choices=["1", "2"],
                    help="remote-write message version (2 = "
                         "io.prometheus.write.v2.Request)")

    sp = sub.add_parser("import-otlp")
    sp.add_argument(
        "path",
        help="ExportMetricsServiceRequest blob file(s) (path/glob; "
             "gzip bodies self-identify)",
    )
    sp.add_argument("--ts-unit", default="ns",
                    choices=["s", "ms", "us", "ns"])
    sp.add_argument("--value-type", default="f64")

    sp = sub.add_parser("query")
    sp.add_argument("promql")
    sp.add_argument("--start", type=int, default=0)
    sp.add_argument("--end", type=int, default=DEFAULT_END)
    sp.add_argument("--export", help="directory to write Timestamp,Value CSV")
    sp.add_argument("--chart", action="store_true")
    sp.add_argument(
        "--explain", action="store_true",
        help="print the physical plan instead of results (check "
        "PartitionFilters / PushedFilters / exchanges)",
    )

    sp = sub.add_parser("query-range")
    sp.add_argument("promql")
    sp.add_argument("--start", type=int, required=True)
    sp.add_argument("--end", type=int, required=True)
    sp.add_argument("--step", type=int, required=True)
    sp.add_argument("--lookback", type=int, default=None)
    sp.add_argument("--fill", default=None,
                    help="gap-fill the grid: null|previous|linear|value:N")
    sp.add_argument("--chart", action="store_true")
    sp.add_argument(
        "--explain", action="store_true",
        help="print the physical plan instead of results",
    )

    sp = sub.add_parser("alerts")
    sp.add_argument("promql")
    sp.add_argument("--start", type=int, required=True)
    sp.add_argument("--end", type=int, required=True)
    sp.add_argument("--step", type=int, required=True)
    sp.add_argument("--for", dest="for_", type=int, default=0)
    sp.add_argument("--keep-firing-for", dest="keep_firing_for",
                    type=int, default=0)
    sp.add_argument("--lookback", type=int, default=None)
    sp.add_argument(
        "--limit", type=int, default=None,
        help="print at most N lifecycle rows (driver-bounded collect, "
        "same idea as the server cap; a long backfill over many firing "
        "series is unbounded otherwise)",
    )

    sp = sub.add_parser("record")
    sp.add_argument("name")
    sp.add_argument("promql")
    sp.add_argument("--start", type=int, required=True)
    sp.add_argument("--end", type=int, required=True)
    sp.add_argument("--step", type=int, default=None)
    sp.add_argument("--lookback", type=int, default=None)

    # targeted sample deletion (Prometheus delete_series semantics)
    sp = sub.add_parser("delete-series")
    sp.add_argument("selector")
    sp.add_argument("--start", type=int)
    sp.add_argument("--end", type=int)

    sp = sub.add_parser("snapshot")
    sp.add_argument("--name")

    sp = sub.add_parser("check-stream-exists")
    sp.add_argument("selector")

    sp = sub.add_parser("repl")
    sp.add_argument("--start", type=int, default=0)
    sp.add_argument("--end", type=int, default=DEFAULT_END)
    sp.add_argument("--chart", action="store_true")

    sub.add_parser("parse-headers")

    # metadata introspection (beyond the reference CLI; Prometheus
    # /api/v1/labels // label/<l>/values // series parity)
    sub.add_parser("labels")
    sp = sub.add_parser("label-values")
    sp.add_argument("label")
    sp = sub.add_parser("series")
    sp.add_argument("selector")
    sp.add_argument("--start", type=int, default=None)
    sp.add_argument("--end", type=int, default=None)
    sp = sub.add_parser("query-exemplars")
    sp.add_argument("selector")
    sp.add_argument("--start", type=int, required=True)
    sp.add_argument("--end", type=int, required=True)

    args = p.parse_args(argv)

    from tachyon_spark.connection import Connection

    conn = Connection(args.db_dir)

    if args.cmd == "create-stream":
        sid = conn.create_stream(args.selector, args.value_type)
        print(f"created stream {sid}")
    elif args.cmd == "list-all-streams":
        for row in conn.get_all_streams():
            labels = dict(row.labels) if row.labels else {}
            print(f"{row.stream_id}  {row.name}{labels}  {row.value_type}")
    elif args.cmd == "insert":
        ins = conn.prepare_insert(args.selector)
        v = float(args.value) if "." in args.value else int(args.value)
        ins.insert(args.ts, v)
        ins.flush()
        print("inserted 1 sample")
    elif args.cmd == "import-csv":
        from tachyon_spark.sources import import_csv

        n = import_csv(conn, args.selector, args.csv_path)
        print(f"imported {n} samples")
    elif args.cmd == "import-jsonl":
        from tachyon_spark.sources import import_jsonl

        n = import_jsonl(conn, args.selector, args.jsonl_path)
        print(f"imported {n} samples")
    elif args.cmd == "import-openmetrics":
        from tachyon_spark.sources.openmetrics import ingest_openmetrics

        n = ingest_openmetrics(
            conn, args.path, ns_clock=not args.native_units,
            value_type=args.value_type,
        )
        print(f"imported {n} samples")
    elif args.cmd == "import-lp":
        from tachyon_spark.sources.line_protocol import (
            ingest_line_protocol,
        )

        n, skipped = ingest_line_protocol(
            conn, args.path, precision=args.precision,
            value_type=args.value_type,
        )
        print(f"imported {n} samples ({skipped} string fields skipped)")
    elif args.cmd == "import-graphite":
        from tachyon_spark.sources.line_protocol import ingest_graphite

        n = ingest_graphite(
            conn, args.path, ts_unit=args.ts_unit,
            value_type=args.value_type,
        )
        print(f"imported {n} samples")
    elif args.cmd == "import-remote-write":
        from tachyon_spark.sources.remote_write import ingest_remote_write

        n = ingest_remote_write(
            conn, args.path, ts_unit=args.ts_unit,
            value_type=args.value_type,
            compressed=not args.uncompressed,
            proto=args.proto,
        )
        print(f"imported {n} samples")
    elif args.cmd == "import-otlp":
        from tachyon_spark.sources.otlp import ingest_otlp

        n = ingest_otlp(
            conn, args.path, ts_unit=args.ts_unit,
            value_type=args.value_type,
        )
        print(f"imported {n} samples")
    elif args.cmd == "query":
        q = conn.query(args.promql, args.start, args.end)
        if args.explain:
            q.explain("formatted")
        elif args.export:
            from tachyon_spark.sources import export_csv

            export_csv(q.df(), args.export)
            print(f"exported to {args.export}")
        else:
            rows = q.rows()
            if args.chart and q.return_type == "vector":
                print(_ascii_chart(rows))
            else:
                for r in rows:
                    print(r)
    elif args.cmd == "query-range":
        q = conn.query_range(
            args.promql, args.start, args.end, args.step, args.lookback,
            fill=args.fill,
        )
        if args.explain:
            q.explain("formatted")
            return 0
        rows = q.rows()
        if args.chart and q.return_type == "vector":
            print(_ascii_chart(rows))
        else:
            for r in rows:
                print(r)
    elif args.cmd == "alerts":
        # alerting-rule backfill: when would `expr for: <d>` have fired?
        out = conn.alert_rule(
            args.promql, args.start, args.end, args.step,
            for_=args.for_, lookback=args.lookback,
            keep_firing_for=args.keep_firing_for,
        )
        cols = out.columns
        ordered = out.orderBy(*[c for c in cols if c != "value"])
        if args.limit is not None:
            if args.limit <= 0:
                raise SystemExit("--limit must be a positive integer")
            # limit+1 so truncation is visible; orderBy+limit plans as
            # TakeOrdered — Spark stops producing rows at the cap
            rows = ordered.limit(args.limit + 1).collect()
            for r in rows[: args.limit]:
                print(tuple(r))
            if len(rows) > args.limit:
                print(f"... (truncated at --limit {args.limit})")
        else:
            for r in ordered.collect():
                print(tuple(r))
    elif args.cmd == "record":
        ids = conn.record(
            args.name, args.promql, args.start, args.end,
            step=args.step, lookback=args.lookback,
        )
        print(f"recorded {len(ids)} stream(s)")
    elif args.cmd == "labels":
        for name in conn.label_names():
            print(name)
    elif args.cmd == "label-values":
        for v in conn.label_values(args.label):
            print(v)
    elif args.cmd == "series":
        import json as _json

        for s in conn.series(args.selector, args.start, args.end):
            print(_json.dumps(s, sort_keys=True))
    elif args.cmd == "query-exemplars":
        import json as _json

        from tachyon_spark.promapi import exemplars_envelope

        for entry in exemplars_envelope(
            conn, args.selector, args.start, args.end, ns_clock=False
        ):
            print(_json.dumps(entry, sort_keys=True))
    elif args.cmd == "delete-series":
        n = conn.delete_series(args.selector, args.start, args.end)
        print(f"deleted {n} samples")
    elif args.cmd == "snapshot":
        print(f"snapshot at {conn.snapshot(args.name)}")
    elif args.cmd == "check-stream-exists":
        # tachyon_cli/src/main.rs:66-102
        if conn.check_stream_exists(args.selector):
            print(f"stream {args.selector} exists")
        else:
            print(f"stream {args.selector} does not exist")
            return 1
    elif args.cmd == "repl":
        # interactive loop, readline -> query -> print (main.rs:298-327);
        # blank line / exit / quit leaves. Errors keep the loop alive.
        while True:
            try:
                line = input("> ")
            except EOFError:
                break
            line = line.strip()
            if not line or line in ("exit", "quit"):
                break
            try:
                q = conn.query(line, args.start, args.end)
                rows = q.rows()
                if args.chart and q.return_type == "vector":
                    print(_ascii_chart(rows))
                else:
                    for r in rows:
                        print(r)
            except Exception as e:  # keep the shell alive on bad queries
                print(f"error: {e}")
    elif args.cmd == "parse-headers":
        from tachyon_spark.sources import samples_file_stats

        samples_file_stats(conn).show(truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
