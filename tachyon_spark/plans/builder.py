"""AST -> DataFrame plan builder.

The reference plans an AST into a Volcano pull tree of 8 TNode variants
(tachyon_core/src/query/planner.rs:234-261, execution/node/mod.rs:35-44). Here
the same AST becomes a *declarative* DataFrame plan: Catalyst is our
optimizer and physical planner, so selector filters push down to Parquet,
aggregates get map-side partial aggregation, and topk compiles to
TakeOrderedAndProject — the distributed equivalents of the reference's
hand-wired ScanHint / heap strategies (SURVEY §4).

Semantics encoded here (with reference citations):
  - number literals are f64 (planner.rs:135-144);
  - promotion lattice u64 < i64 < f64; / and % always f64 (lib.rs:64-72,
    306-362);
  - comparisons are FILTERS keeping the (computed) sample values
    (vector_to_scalar.rs:62-77);
  - scalar OP vector: the reference swaps operands (binary_op.rs:103-105, a
    bug); we evaluate the written order — divergence documented in tests;
  - vector OP vector: interpolating temporal join (vector_to_vector.rs);
  - aggregate empty-input contract (aggregate.rs:96-104);
  - @/offset pin the selector start (planner.rs:162-180): @start()=0,
    @end()=MAX, @t=t, then offset is added; without @, offset is ignored.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tachyon_spark.operators.aggregates import grouped_agg, scalar_agg
from tachyon_spark.operators.interpolate import interpolated_binop
from tachyon_spark.operators.select import select_range
from tachyon_spark.operators.topk import bottom_k, top_k
from tachyon_spark.promql import ast
from tachyon_spark.types import VT_F64, VT_I64, VT_U64, is_integer, promote, result_type

U64_MAX = (1 << 63) - 1  # reference uses u64::MAX; we cap at i64 max (JVM long)

from tachyon_spark.arith import ieee_div, ieee_mod, py_arith  # noqa: E402


def rewrite_label_streams(node, streams) -> tuple:
    """The label_replace/label_join driver-side stream rewrite, shared by
    the raw-sample and query_range evaluators (labels live in plan-level
    stream info, so the rewrite costs nothing in the distributed plan)."""
    import re as _re

    new_streams = []
    if node.func == "label_replace":
        dst, repl, src, regex = node.args
        pat = _re.compile(regex)
        for s in streams:
            val = s.labels.get(src, "")
            m = pat.fullmatch(val)  # Prometheus anchors the regex
            labels = dict(s.labels)
            if m:
                # $1 → \1 group references
                out = _re.sub(r"\$(\d+)", r"\\\1", repl)
                new_val = m.expand(out)
                if new_val:
                    labels[dst] = new_val
                else:
                    labels.pop(dst, None)  # empty result drops the label
            new_streams.append(replace(s, labels=labels))
    else:  # label_join
        dst, sep, *srcs = node.args
        for s in streams:
            labels = dict(s.labels)
            joined = sep.join(s.labels.get(l, "") for l in srcs)
            if joined:
                labels[dst] = joined
            else:
                labels.pop(dst, None)
            new_streams.append(replace(s, labels=labels))
    return tuple(new_streams)

def inline_ids_df(spark, ids, col: str = "stream_id") -> DataFrame:
    """A 1-column DataFrame of driver-known ids WITHOUT createDataFrame.

    createDataFrame costs ~40 ms of py4j/serialization per call even for a
    handful of rows (measured r16, §4-adjacent driver latency); the grid
    evaluator builds one id frame per selector instant. Packing the ids
    into ONE string literal and exploding a split() costs a few round
    trips. Falls back to createDataFrame when an id contains the
    separator (never for catalog-generated ids)."""
    sep = "\x1f"
    if any(sep in i for i in ids):
        return spark.createDataFrame([(i,) for i in ids], f"{col} string")
    return spark.range(1).select(
        F.explode(F.split(F.lit(sep.join(ids)), sep, -1)).alias(col)
    )


_ARITH = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    # / and % are always f64 (promotion lattice) and keep IEEE zero-divisor
    # semantics (±Inf/NaN) under Spark ANSI mode — see tachyon_spark/arith.py
    "/": ieee_div,
    "%": ieee_mod,
    # ^ and atan2 (Prometheus's other binary operators) are always f64;
    # java.lang.Math.pow/atan2 are IEEE-conformant under ANSI mode (no
    # error paths), so no CASE guards needed
    "^": lambda a, b: F.pow(a.cast("double"), b.cast("double")),
    "atan2": lambda a, b: F.atan2(a.cast("double"), b.cast("double")),
}
_CMP = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b,
    "<=": lambda a, b: a <= b,
}


@dataclass
class Plan:
    kind: str  # 'vector' | 'scalar' | 'topk' | 'grouped'
    df: DataFrame | None
    value_type: str
    literal: float | None = None  # plan-time-known scalar (number literals)
    group_cols: tuple[str, ...] = ()
    # matched StreamInfo rows for selector-derived vectors; vector matching
    # (on/ignoring) needs per-series label sets and gets them driver-side
    # from here instead of a distributed catalog join
    streams: tuple = ()
    # query evaluation instant (native ts units) — Prometheus instant
    # results carry [eval_ts, value]; Connection.query stamps this
    eval_ts: int | None = None
    # for composite-keyed grouped plans (`without` grouping): the
    # series-key -> remaining-labels map, computed driver-side when the
    # key was built. Lets an OUTER aggregation decompose the opaque key
    # and re-group correctly (`sum without (c) (sum without (b) (m))`
    # must merge series differing only in c) instead of regrouping the
    # composite unchanged. One entry per output group — bounded by the
    # series count, never by data volume.
    series_labels: tuple = ()

    @property
    def return_type(self) -> str:
        # GetK declares ReturnType::Scalar in the reference (get_k.rs) even
        # though it yields multiple rows; we mirror that.
        return "vector" if self.kind in ("vector", "grouped", "sorted") else "scalar"

    def ordered_df(self) -> DataFrame:
        if self.kind == "vector":
            cols = [c for c in ("stream_id", "ts") if c in self.df.columns]
            return self.df.orderBy(*cols).select("ts", "value")
        if self.kind == "grouped":
            return self.df.orderBy(*self.group_cols)
        if self.kind in ("topk", "sorted"):
            return self.df  # already value-ordered
        return self.df.select("value")


class PlanBuilder:
    def __init__(self, conn, start: int | None, end: int | None):
        self.conn = conn
        self.start = start
        self.end = end

    # ------------------------------------------------------------------ build
    def build(self, expr) -> Plan:
        if isinstance(expr, ast.NumberLiteral):
            return Plan("scalar", None, VT_F64, literal=float(expr.value))
        if isinstance(expr, ast.VectorSelector):
            return self._selector(expr)
        if isinstance(expr, ast.MatrixSelector):
            raise ValueError(
                "range vector (matrix selector) can only be used as the "
                "argument of a range function (rate/increase/delta, "
                "*_over_time, resets/changes/irate/idelta, deriv)"
            )
        if isinstance(expr, ast.BinaryOp):
            return self._binary(expr)
        if isinstance(expr, ast.Aggregate):
            return self._aggregate(expr)
        if isinstance(expr, ast.GetK):
            return self._getk(expr)
        if isinstance(expr, ast.RangeFunc):
            return self._range_func(expr)
        if isinstance(expr, ast.OverTimeFunc):
            return self._over_time_func(expr)
        if isinstance(expr, ast.RangeCountFunc):
            return self._range_count_func(expr)
        if isinstance(expr, ast.DerivFunc):
            return self._deriv_func(expr)
        if isinstance(expr, ast.PredictLinearFunc):
            return self._predict_linear(expr)
        if isinstance(expr, ast.HoltWintersFunc):
            return self._holt_winters(expr)
        if isinstance(expr, ast.ClockFunc):
            return self._clock_func(expr)
        if isinstance(expr, ast.MathFunc):
            return self._math_func(expr)
        if isinstance(expr, ast.CalendarFunc):
            return self._calendar_func(expr)
        if isinstance(expr, ast.HistogramQuantile):
            return self._histogram_quantile(expr)
        if isinstance(expr, ast.HistogramAgg):
            return self._histogram_agg(expr)
        if isinstance(expr, ast.HistogramFraction):
            return self._histogram_fraction(expr)
        if isinstance(expr, ast.LabelFunc):
            return self._label_func(expr)
        if isinstance(expr, ast.AbsentOverTime):
            return self._absent_over_time(expr)
        if isinstance(expr, ast.AbsentFunc):
            return self._absent(expr)
        if isinstance(expr, ast.RoundFunc):
            child = self.build(expr.child)
            if child.kind != "vector":
                raise ValueError("round() requires a vector input")
            t = float(expr.to_nearest)
            # PromQL: floor(v/t + 0.5) * t (ties round up toward +inf)
            v = F.col("value").cast("double")
            result = F.floor(v / F.lit(t) + F.lit(0.5)) * F.lit(t)
            keep = [c for c in ("stream_id", "ts") if c in child.df.columns]
            return Plan(
                "vector", child.df.select(*keep, result.alias("value")), VT_F64,
                streams=child.streams,
            )
        if isinstance(expr, ast.CountValues):
            child = self.build(expr.child)
            if child.kind != "vector":
                raise ValueError("count_values requires a vector input")
            cdf, extra = self._grouping_cols(
                child, expr.by, expr.without, "count_values"
            )
            out = cdf.groupBy(
                *extra, F.col("value").cast("string").alias(expr.label)
            ).agg(F.count("*").alias("value"))
            return Plan(
                "grouped", out, VT_U64, group_cols=(*extra, expr.label)
            )
        if isinstance(expr, ast.Subquery):
            raise ValueError(
                "a subquery expr[RANGE:STEP] can only be the argument of a "
                "windowed function (*_over_time, rate/increase/delta, "
                "resets/changes/irate/idelta, deriv, predict_linear, "
                "holt_winters)"
            )
        if isinstance(expr, ast.SortFunc):
            return self._sort_func(expr)
        if isinstance(expr, ast.SortByLabelFunc):
            return self._sort_by_label(expr)
        if isinstance(expr, ast.LimitAgg):
            return self._limit_agg(expr)
        if isinstance(expr, ast.ClampFunc):
            return self._clamp_func(expr)
        raise ValueError(f"unsupported expression: {expr!r}")

    def _sort_func(self, node: ast.SortFunc) -> Plan:
        """sort()/sort_desc(): vector ordered by value (ts kept). Extension;
        a global sort — at scale prefer topk for bounded results."""
        child = self.build(node.child)
        if child.kind != "vector":
            raise ValueError(f"{node.func} requires a vector input")
        order = F.asc("value") if node.func == "sort" else F.desc("value")
        out = child.df.select("ts", "value").orderBy(order, F.asc("ts"))
        return Plan("sorted", out, child.value_type)

    def _sort_by_label(self, node: ast.SortByLabelFunc) -> Plan:
        """sort_by_label(_desc): vector reordered by label values
        (ast.SortByLabelFunc). Labels attach as one broadcast map join on
        stream_id (same shape as grouped aggregation); the sort itself is
        the presentation-order global sort the sort()/sort_desc family
        already accepts at this altitude."""
        child = self.build(node.child)
        if child.kind != "vector":
            raise ValueError(f"{node.func} requires a vector input")
        if "stream_id" not in child.df.columns or not child.streams:
            raise ValueError(
                f"{node.func} requires a label-carrying selector vector"
            )
        df = self._attach_labels(child.df, node.labels, child.streams)
        asc = node.func == "sort_by_label"
        order = [
            F.asc_nulls_first(l) if asc else F.desc_nulls_last(l)
            for l in node.labels
        ]
        out = df.orderBy(*order, F.asc("ts")).select("ts", "value")
        return Plan("sorted", out, child.value_type)

    @staticmethod
    def _series_fingerprint(s) -> str:
        """Stable series identity string for hash-based sampling: metric
        name + sorted labels — the same fingerprint regardless of matcher
        or creation order."""
        parts = [f"__name__={s.name}"] + [
            f"{k}={v}" for k, v in sorted(s.labels.items())
        ]
        return ",".join(parts)

    @staticmethod
    def _select_limit_series(
        func: str, param: float, streams: tuple, by: tuple[str, ...],
        without: tuple[str, ...] = (),
    ) -> set:
        """The limitk/limit_ratio series-selection rule, shared by the raw
        and step-grid paths (selection is metadata-only, so both paths must
        pick the SAME series for a given param). `without` groups on every
        label EXCEPT the listed ones (mutually exclusive with `by`)."""
        import hashlib

        if func == "limitk":
            k = max(int(param), 0)
            groups: dict[tuple, list] = {}
            for s in streams:
                if without:
                    drop = set(without)
                    key = tuple(
                        (l, v)
                        for l, v in sorted(s.labels.items())
                        if l not in drop
                    )
                else:
                    key = tuple(s.labels.get(l) for l in by)
                groups.setdefault(key, []).append(s)
            return {
                s.stream_id
                for ss in groups.values()
                for s in sorted(ss, key=lambda s: s.stream_id)[:k]
            }
        r = float(param)
        if not -1.0 <= r <= 1.0:
            raise ValueError("limit_ratio requires a ratio in [-1, 1]")
        kept = set()
        for s in streams:
            dig = hashlib.md5(
                PlanBuilder._series_fingerprint(s).encode()
            ).digest()
            u = int.from_bytes(dig[:8], "big") / 2.0**64
            if (r >= 0 and u < r) or (r < 0 and u >= 1.0 + r):
                kept.add(s.stream_id)
        return kept

    def _limit_agg(self, node: ast.LimitAgg) -> Plan:
        """limitk/limit_ratio (ast.LimitAgg): per-group SERIES sampling.
        Selection runs driver-side over the plan's bounded stream metadata
        (the altitude label attachment already lives at); the distributed
        plan only gains a pushdown-able stream_id IN filter, so the scan
        SHRINKS — no shuffle, no window. Deterministic: limitk keeps the k
        smallest stream_ids per group; limit_ratio hashes the series
        fingerprint to [0,1) via md5 and keeps u < r (complement u >= 1+r
        for negative r — limit_ratio(r) + limit_ratio(-(1-r)) partition)."""
        import hashlib

        p_plan = self.build(node.param)
        if p_plan.kind != "scalar":
            raise ValueError(f"{node.func} parameter must be a scalar")
        if p_plan.literal is not None:
            param = float(p_plan.literal)
        else:
            row = p_plan.df.select("value").collect()
            param = float(row[0].value) if row else 0.0
        child = self.build(node.child)
        if child.kind != "vector":
            raise ValueError(f"{node.func} requires a vector input")
        if "stream_id" not in child.df.columns or not child.streams:
            raise ValueError(
                f"{node.func} requires a label-carrying selector vector"
            )
        kept = self._select_limit_series(
            node.func, param, child.streams, node.by, node.without
        )
        if kept:
            out = child.df.where(F.col("stream_id").isin(sorted(kept)))
        else:
            out = child.df.where(F.lit(False))
        streams = tuple(s for s in child.streams if s.stream_id in kept)
        return Plan("vector", out, child.value_type, streams=streams)

    def _clamp_func(self, node: ast.ClampFunc) -> Plan:
        """clamp/clamp_min/clamp_max with literal bounds; result f64."""
        child = self.build(node.child)
        if child.kind != "vector":
            raise ValueError(f"{node.func} requires a vector input")
        v = F.col("value").cast("double")
        if node.func == "clamp_min":
            result = F.greatest(v, F.lit(node.args[0]))
        elif node.func == "clamp_max":
            result = F.least(v, F.lit(node.args[0]))
        else:
            result = F.least(F.greatest(v, F.lit(node.args[0])), F.lit(node.args[1]))
        keep = [c for c in ("stream_id", "ts") if c in child.df.columns]
        return Plan(
            "vector", child.df.select(*keep, result.alias("value")), VT_F64,
            streams=child.streams,
        )

    _MATH = {
        "abs": F.abs,
        "ceil": F.ceil,
        "floor": F.floor,
        "sqrt": F.sqrt,
        "exp": F.exp,
        "ln": F.log,
        "sgn": F.signum,
        "log2": F.log2,
        "log10": F.log10,
        "sin": F.sin,
        "cos": F.cos,
        "tan": F.tan,
        "asin": F.asin,
        "acos": F.acos,
        "atan": F.atan,
        "sinh": F.sinh,
        "cosh": F.cosh,
        "tanh": F.tanh,
        "asinh": F.asinh,
        "acosh": F.acosh,
        "atanh": F.atanh,
        "deg": F.degrees,
        "rad": F.radians,
    }

    @staticmethod
    def _calendar_col(func: str, v):
        """Calendar field of `v` = unix SECONDS, computed tz-FREE: the UTC
        calendar date is derived by whole-day offset from the epoch
        (date_add on a date literal), so the result never depends on
        spark.sql.session.timeZone; minute/hour are pure modular
        arithmetic. Matches Prometheus's time.Unix(...).UTC() fields
        (prometheus/promql functions.go funcDaysInMonth..funcYear).
        Narrow codegen expression — no shuffle, no UDF."""
        days = F.floor(v / F.lit(86400.0))
        d = F.date_add(F.lit("1970-01-01").cast("date"), days.cast("int"))
        if func == "minute":
            return F.pmod(F.floor(v / F.lit(60.0)), F.lit(60.0)).cast("double")
        if func == "hour":
            return F.pmod(F.floor(v / F.lit(3600.0)), F.lit(24.0)).cast("double")
        if func == "day_of_week":
            # Spark dayofweek: 1=Sunday..7 — Prometheus wants 0=Sunday..6
            return (F.dayofweek(d) - F.lit(1)).cast("double")
        if func == "day_of_month":
            return F.dayofmonth(d).cast("double")
        if func == "day_of_year":
            return F.dayofyear(d).cast("double")
        if func == "days_in_month":
            return F.dayofmonth(F.last_day(d)).cast("double")
        if func == "month":
            return F.month(d).cast("double")
        if func == "year":
            return F.year(d).cast("double")
        raise ValueError(f"unknown calendar function {func!r}")

    @staticmethod
    def _calendar_py(func: str, v: float) -> float:
        """Driver-side mirror of _calendar_col for literal scalars."""
        import calendar as _cal
        import datetime as _dt
        import math as _m

        if func == "minute":
            return float(_m.floor(v / 60.0) % 60)
        if func == "hour":
            return float(_m.floor(v / 3600.0) % 24)
        d = _dt.date(1970, 1, 1) + _dt.timedelta(days=_m.floor(v / 86400.0))
        if func == "day_of_week":
            return float((d.weekday() + 1) % 7)  # Monday=0 -> Sunday=0
        if func == "day_of_month":
            return float(d.day)
        if func == "day_of_year":
            return float(d.timetuple().tm_yday)
        if func == "days_in_month":
            return float(_cal.monthrange(d.year, d.month)[1])
        if func == "month":
            return float(d.month)
        if func == "year":
            return float(d.year)
        raise ValueError(f"unknown calendar function {func!r}")

    def _calendar_func(self, node: ast.CalendarFunc) -> Plan:
        """Prometheus calendar functions (ast.CalendarFunc): sample VALUES
        as unix seconds UTC -> field, f64. Zero-arg = vector(time()) with
        time()'s native-ns value converted to seconds."""
        if node.child is None:
            secs = float(self.start or 0) / 1e9
            ts0 = int(self.start or 0)
            df = self.conn.spark.range(1).select(
                F.lit(ts0).cast("long").alias("ts"),
                F.lit(self._calendar_py(node.func, secs)).alias("value"),
            )
            return Plan("vector", df, VT_F64)
        child = self.build(node.child)
        if child.kind == "scalar" and child.literal is not None:
            return Plan(
                "scalar", None, VT_F64,
                literal=self._calendar_py(node.func, float(child.literal)),
            )
        if child.kind not in ("vector", "grouped"):
            raise ValueError(f"{node.func} requires a vector input")
        keep = [c for c in child.df.columns if c != "value"]
        result = self._calendar_col(node.func, F.col("value").cast("double"))
        return Plan(
            child.kind, child.df.select(*keep, result.alias("value")), VT_F64,
            group_cols=child.group_cols, streams=child.streams,
        )

    def _math_func(self, node: ast.MathFunc) -> Plan:
        """Elementwise math (extension; ast.MathFunc). Narrow column
        expression — stays in whole-stage codegen, no shuffle."""
        child = self.build(node.child)
        if child.kind == "scalar":
            if child.literal is not None:
                import math as m

                fn = {"abs": abs, "ceil": m.ceil, "floor": m.floor,
                      "sqrt": m.sqrt, "exp": m.exp, "ln": m.log,
                      "sgn": lambda x: (x > 0) - (x < 0),
                      "log2": m.log2, "log10": m.log10, "sin": m.sin,
                      "cos": m.cos, "tan": m.tan, "asin": m.asin,
                      "acos": m.acos, "atan": m.atan, "sinh": m.sinh,
                      "cosh": m.cosh, "tanh": m.tanh, "asinh": m.asinh,
                      "acosh": m.acosh, "atanh": m.atanh,
                      "deg": m.degrees, "rad": m.radians}[node.func]
                return Plan("scalar", None, VT_F64, literal=float(fn(child.literal)))
            out = child.df.select(
                self._MATH[node.func](F.col("value").cast("double")).alias("value")
            )
            return Plan("scalar", out, VT_F64)
        if child.kind != "vector":
            raise ValueError(f"{node.func} requires a vector or scalar input")
        vt = child.value_type if node.func == "abs" else VT_F64
        col = F.col("value") if node.func == "abs" else F.col("value").cast("double")
        result = self._MATH[node.func](col)
        keep = [c for c in ("stream_id", "ts") if c in child.df.columns]
        return Plan(
            "vector", child.df.select(*keep, result.alias("value")), vt,
            streams=child.streams,
        )

    def _set_op(self, op: str, lhs: Plan, rhs: Plan) -> Plan:
        """and/or/unless on the ts key (extension; reference has no set ops,
        planner.rs:95-107). and = semi-join, unless = anti-join, or = lhs
        plus rhs rows at timestamps lhs lacks. All are ts-key equi-joins."""
        if lhs.kind != "vector" or rhs.kind != "vector":
            raise ValueError(f"{op!r} requires vector operands")
        l_df = lhs.df.select("ts", "value")
        r_ts = rhs.df.select("ts").distinct()
        if op == "and":
            out = l_df.join(r_ts, "ts", "left_semi")
            return Plan("vector", out, lhs.value_type)
        if op == "unless":
            out = l_df.join(r_ts, "ts", "left_anti")
            return Plan("vector", out, lhs.value_type)
        # or: keep all lhs; add rhs rows whose ts is absent from lhs
        r_extra = rhs.df.select("ts", "value").join(
            l_df.select("ts").distinct(), "ts", "left_anti"
        )
        vt = promote(lhs.value_type, rhs.value_type)
        out = l_df.select("ts", F.col("value").cast("double").alias("value")).unionByName(
            r_extra.select("ts", F.col("value").cast("double").alias("value"))
        )
        if is_integer(vt):
            out = out.select("ts", F.col("value").cast("long").alias("value"))
        return Plan("vector", out, vt)

    def _range_func(self, node: ast.RangeFunc) -> Plan:
        """rate/increase/delta over [start, end] (extension; ast.RangeFunc).

        rate/increase are COUNTER-RESET-AWARE (Prometheus semantics): the
        per-pair adjusted delta is `v - prev` when the counter grew, else
        `v` (the counter restarted from 0 and climbed to v), summed per
        series — so a mid-range reset no longer yields a wrong (even
        negative) rate. delta stays last(value) - first(value): PromQL's
        delta is for gauges and deliberately not reset-corrected. rate =
        increase per ts unit over the observed span; PromQL returns nothing
        for <2 samples — enforced by requiring max(ts) > min(ts).
        `Connection(compat_rate_last_first=True)` replays the pre-round-4
        last-first behavior for migration.

        With a matrix-selector child (`rate(m[5m])`) the same evaluation
        runs per (series, TUMBLING window): one scan + one hash shuffle on
        that key (the lag window and the aggregation share the
        partitioning) — the distributed plan shape at any scale."""
        compat = getattr(self.conn, "compat_rate_last_first", False)
        if isinstance(node.child, ast.MatrixSelector):
            return self._range_windowed(node.func, node.child)
        if isinstance(node.child, ast.Subquery):
            return self._windowed_subquery_func(
                "range", node.func, node.child, None
            )
        child = self.build(node.child)
        if child.kind != "vector":
            raise ValueError(f"{node.func} requires a vector input")
        df = child.df
        if node.func in ("rate", "increase") and not compat:
            from pyspark.sql import Window as W

            # per-series lag (multi-stream selectors reset independently);
            # derived vectors without stream_id order globally — fine for a
            # whole-range scalar (bounded, already filtered)
            part = ["stream_id"] if "stream_id" in df.columns else []
            w = W.partitionBy(*part).orderBy("ts", "value")
            v = F.col("value").cast("double")
            prev = F.lag(v).over(w)
            adj = F.when(prev.isNull(), F.lit(None)).when(
                v >= prev, v - prev
            ).otherwise(v)
            rows = df.select(F.col("ts"), adj.alias("__d"))
            agg = rows.agg(
                F.sum("__d").alias("__inc"),
                F.min("ts").alias("__t0"),
                F.max("ts").alias("__t1"),
            ).where(F.col("__t1") > F.col("__t0"))
            value = F.col("__inc")
            if node.func == "rate":
                value = value / (F.col("__t1") - F.col("__t0")).cast("double")
            return Plan("scalar", agg.select(value.alias("value")), VT_F64)
        agg = df.agg(
            # (ts, value) struct tie-break: deterministic when the extreme ts
            # is duplicated (plain min_by/max_by pick an arbitrary row).
            F.min_by("value", F.struct("ts", "value")).cast("double").alias("__first"),
            F.max_by("value", F.struct("ts", "value")).cast("double").alias("__last"),
            F.min("ts").alias("__t0"),
            F.max("ts").alias("__t1"),
        ).where(F.col("__t1") > F.col("__t0"))
        diff = F.col("__last") - F.col("__first")
        if node.func == "rate":
            value = diff / (F.col("__t1") - F.col("__t0")).cast("double")
        else:  # increase | delta
            value = diff
        return Plan("scalar", agg.select(value.alias("value")), VT_F64)

    @staticmethod
    def _over_time_agg(fn: str, child_vt: str, arg, approx: bool = False):
        """The *_over_time aggregate column + result type (shared by the
        matrix-selector, subquery, and query_range paths)."""
        v = F.col("value")
        if fn == "avg":
            return F.avg(v.cast("double")), VT_F64
        if fn == "sum":
            return F.sum(v), child_vt
        if fn == "min":
            return F.min(v), child_vt
        if fn == "max":
            return F.max(v), child_vt
        if fn == "count":
            return F.count(v), VT_U64
        if fn == "quantile":
            if approx:
                # mergeable sketch (Connection(approx_aggregates=True)):
                # rank error <= 1/accuracy — the 100 TB path
                from tachyon_spark.operators.aggregates import (
                    APPROX_PERCENTILE_ACCURACY,
                )

                return (
                    F.approx_percentile(
                        v.cast("double"),
                        F.lit(arg),
                        F.lit(APPROX_PERCENTILE_ACCURACY),
                    ),
                    VT_F64,
                )
            # exact linear-interpolated percentile (PromQL semantics) — the
            # oracle-gated default
            return F.percentile(v.cast("double"), F.lit(arg)), VT_F64
        if fn == "mad":
            # median absolute deviation: med(|x - med(x)|) — two nested
            # medians over the window's sorted sample list (a window is
            # range-width bounded, same in-memory contract as quantile).
            # Interpolated median (avg of middle two for even n), matching
            # percentile(0.5)'s linear interpolation.
            def _arr_median(a):
                n = F.size(a)
                mid = (n / 2).cast("int")
                return F.when(
                    n % 2 == 1, F.element_at(a, mid + 1)
                ).otherwise(
                    (F.element_at(a, mid) + F.element_at(a, mid + 1)) / 2.0
                )

            arr = F.sort_array(F.collect_list(v.cast("double")))
            med = _arr_median(arr)
            devs = F.sort_array(F.transform(arr, lambda x: F.abs(x - med)))
            return _arr_median(devs), VT_F64
        if fn == "stddev":  # population, per Prometheus
            return F.stddev_pop(v.cast("double")), VT_F64
        if fn == "stdvar":
            return F.var_pop(v.cast("double")), VT_F64
        if fn == "present":
            return F.max(F.lit(1.0)), VT_F64
        # ts_of_* (Prometheus 3.x experimental, promql functions.go
        # funcTsOfMaxOverTime family): the TIMESTAMP of the newest /
        # max / min sample, in native ts units as f64 (same unit
        # divergence as timestamp(), ast.CLOCK_FUNCS note). Prometheus
        # scans with >= / <=, so value ties resolve to the LATEST ts —
        # mirrored here by the (value, ts) / (value, -ts) struct orders.
        if fn == "ts_of_last":
            return F.max("ts").cast("double"), VT_F64
        if fn == "ts_of_max":
            return (
                F.max_by("ts", F.struct(v.cast("double"), F.col("ts")))
                .cast("double"),
                VT_F64,
            )
        if fn == "ts_of_min":
            return (
                F.min_by("ts", F.struct(v.cast("double"), -F.col("ts")))
                .cast("double"),
                VT_F64,
            )
        # last: newest sample, (ts, value) tie-break
        return F.max_by("value", F.struct("ts", "value")), child_vt

    def _over_time_func(self, node: ast.OverTimeFunc) -> Plan:
        """`avg_over_time(m[5m])` family: per-tumbling-window aggregation
        over a range vector (extension; parser guarantees a MatrixSelector
        or Subquery child). Same plan shape as _range_windowed: one scan +
        one hash shuffle on the window key, map-side partials."""
        fn = node.func[: -len("_over_time")]
        if isinstance(node.child, ast.Subquery):
            return self._over_time_subquery(fn, node.child, node.arg)
        msel = node.child
        child = self._selector(msel.selector)
        win = self._window_col(msel)
        agg, vt = self._over_time_agg(
            fn, child.value_type, node.arg,
            approx=getattr(self.conn, "approx_aggregates", False),
        )
        out = child.df.groupBy(*self._series_window_keys(child, win)).agg(
            agg.alias("value")
        )
        return Plan("vector", out, vt, streams=child.streams)

    def _subquery_inner(self, sub: ast.Subquery) -> tuple[Plan, int]:
        """Evaluate the subquery's inner expression on its STEP grid;
        returns (plan with ts = step-window start, grid anchor).

        Inner selector: the newest sample per (series, step window) — each
        grid point reports the latest value, PromQL's instant evaluation
        minus the fixed 5m lookback (a step with no samples yields nothing;
        divergence documented). Inner windowed function: built as-is; its
        window width must equal STEP so its output rows ARE the step grid."""
        if sub.at_ts is not None or sub.at_anchor or sub.offset:
            raise ValueError(
                "@/offset modifiers on subqueries are supported in "
                "query_range only (raw-sample subqueries are already an "
                "extension; pin the window there)"
            )
        inner = sub.child
        if isinstance(inner, ast.VectorSelector):
            child = self._selector(inner)
            anchor = self._effective_start(inner) or 0
            step = F.lit(sub.step)
            a = F.lit(anchor)
            win = ((F.col("ts") - a) - (F.col("ts") - a) % step + a).alias("ts")
            out = child.df.groupBy(*self._series_window_keys(child, win)).agg(
                F.max_by("value", F.struct("ts", "value")).alias("value")
            )
            return Plan("vector", out, child.value_type), anchor
        if isinstance(
            inner, (ast.RangeFunc, ast.OverTimeFunc, ast.RangeCountFunc, ast.DerivFunc)
        ):
            msel = inner.child
            if not isinstance(msel, ast.MatrixSelector):
                raise ValueError(
                    "subquery inner function must evaluate a range vector m[RANGE]"
                )
            if msel.range_ != sub.step:
                raise ValueError(
                    f"subquery step ({sub.step}) must equal the inner "
                    f"function's window width ({msel.range_}): the inner "
                    "function's tumbling grid IS the step grid"
                )
            return self.build(inner), self._effective_start(msel.selector) or 0
        # generic inner expression — `(a + b)[R:S]`, `abs(a)[R:S]`, ... :
        # evaluate raw (interpolating joins and all), then snap to the
        # step grid: the NEWEST derived row per (series?, step window) —
        # the same latest-per-step contract the plain-selector form uses
        child = self.build(inner)
        if child.kind != "vector":
            raise ValueError(
                "subquery inner expression must evaluate to a vector, got "
                f"{type(inner).__name__} -> {child.kind}"
            )
        anchor = self.start or 0
        step = F.lit(sub.step)
        a = F.lit(anchor)
        win = ((F.col("ts") - a) - (F.col("ts") - a) % step + a).alias("ts")
        keys = [F.col("stream_id")] if "stream_id" in child.df.columns else []
        out = child.df.groupBy(*keys, win).agg(
            F.max_by("value", F.struct("ts", "value")).alias("value")
        )
        return Plan("vector", out, child.value_type), anchor

    def _over_time_subquery(self, fn: str, sub: ast.Subquery, arg) -> Plan:
        """`max_over_time(rate(m[5m])[30m:5m])`: the inner expression's step
        grid re-aggregated per RANGE-wide outer tumbling window. Two hash
        shuffles total (inner grid + outer window), both map-side-partial —
        no per-step re-evaluation of the inner query (PromQL engines
        re-execute the inner expr per step; the grid IS one grouped scan
        here)."""
        inner_plan, anchor = self._subquery_inner(sub)
        width = F.lit(sub.range_)
        a = F.lit(anchor)
        win = ((F.col("ts") - a) - (F.col("ts") - a) % width + a).alias("ts")
        agg, vt = self._over_time_agg(
            fn, inner_plan.value_type, arg,
            approx=getattr(self.conn, "approx_aggregates", False),
        )
        keys = [win]
        if "stream_id" in inner_plan.df.columns:
            keys.insert(0, F.col("stream_id"))
        out = inner_plan.df.groupBy(*keys).agg(agg.alias("value"))
        return Plan("vector", out, vt)

    def _absent_over_time(self, node: ast.AbsentOverTime) -> Plan:
        """absent_over_time(m[RANGE]) on the raw path: 1 per tumbling
        window containing NO samples (the windowed dead-stream alert).
        The window grid is generated data (span/width rows); present
        windows anti-join it — one small exchange, no full scan beyond
        the selector's own pruned read. Windows share _window_col's
        anchor so they line up with every other windowed function."""
        msel = node.child
        width = msel.range_
        if self.start is None or self.end is None:
            raise ValueError(
                "absent_over_time requires an explicit query range"
            )
        if isinstance(msel, ast.Subquery):
            # absent_over_time(expr[R:S]) on the raw path: 1 per R-wide
            # tumbling window holding no inner INSTANT (the subquery's
            # S-grid, _subquery_inner — shared with every other windowed-
            # over-subquery form)
            try:
                inner_plan, anchor = self._subquery_inner(msel)
            except ValueError as e:
                if "no streams matched" in str(e):
                    n_win = max((self.end - self.start) // width + 1, 1)
                    grid = self.conn.spark.range(n_win).select(
                        (F.lit(self.start) + F.col("id") * F.lit(width))
                        .alias("ts"),
                        F.lit(1.0).alias("value"),
                    )
                    return Plan("vector", grid, VT_F64)
                raise
            a = F.lit(anchor)
            win = (
                (F.col("ts") - a) - (F.col("ts") - a) % F.lit(width) + a
            ).alias("ts")
            n_win = max((self.end - self.start) // width + 1, 1)
            grid = self.conn.spark.range(n_win).select(
                (F.lit(anchor) + F.col("id") * F.lit(width)).alias("ts"),
                F.lit(1.0).alias("value"),
            )
            present = inner_plan.df.select(win).distinct()
            return Plan(
                "vector", grid.join(present, "ts", "left_anti"), VT_F64
            )
        anchor = self._effective_start(msel.selector) or 0
        span = self.end - self.start
        n_win = max(span // width + 1, 1)
        grid = self.conn.spark.range(n_win).select(
            (F.lit(anchor) + F.col("id") * F.lit(width)).alias("ts"),
            F.lit(1.0).alias("value"),
        )
        try:
            child = self._selector(msel.selector)
        except ValueError as e:
            if "no streams matched" in str(e):
                return Plan("vector", grid, VT_F64)
            raise
        present = child.df.select(self._window_col(msel)).distinct()
        out = grid.join(present, "ts", "left_anti")
        return Plan("vector", out, VT_F64)

    def _absent(self, node: ast.AbsentFunc) -> Plan:
        """absent(v): 1 when v has no samples in range (unknown metric OR
        empty range), else empty — the dead-stream alerting primitive."""
        try:
            child = self.build(node.child)
        except ValueError as e:
            if "no streams matched" in str(e):
                one = self.conn.spark.range(1).select(F.lit(1.0).alias("value"))
                return Plan("scalar", one, VT_F64)
            raise
        if child.kind != "vector":
            raise ValueError("absent() requires a vector input")
        out = (
            child.df.agg(F.count("*").alias("__n"))
            .where(F.col("__n") == 0)
            .select(F.lit(1.0).alias("value"))
        )
        return Plan("scalar", out, VT_F64)

    def _label_func(self, node: ast.LabelFunc) -> Plan:
        """label_replace/label_join: rewrite each matched series' label set
        DRIVER-SIDE on Plan.streams (extension; absent from the reference).
        Zero cost in the distributed plan — grouping (`sum by`) and vector
        matching (`on()/group_left`) read labels from the plan's stream
        info, so they see the rewritten labels transparently."""
        child = self.build(node.child)
        if child.kind != "vector" or not child.streams:
            raise ValueError(
                f"{node.func} requires a label-carrying selector vector"
            )
        return replace(child, streams=rewrite_label_streams(node, child.streams))

    def _histogram_quantile(self, node: ast.HistogramQuantile) -> Plan:
        """histogram_quantile(phi, buckets): the selector's streams must
        carry an `le` label (cumulative bucket upper bounds; '+Inf'
        allowed). Buckets group per timestamp and per remaining-label set;
        the per-group quantile is functions/histogram.bucket_quantile —
        array HOFs over the (bounded) bucket list, no UDF.

        The child may be a bare selector or any expression that evaluates
        to a streams-carrying vector (e.g. `increase(m_bucket[1h])` —
        series identity propagates through windowed range functions), so
        the classic `histogram_quantile(phi, increase(m_bucket[1h]))`
        works in raw-sample mode too. Aggregate children (`sum by (le)`)
        belong to query_range, where instants exist per step; the raw
        engine's aggregates collapse time."""
        from tachyon_spark.functions.histogram import bucket_quantile

        out, multi, smap = self._le_bucket_eval(
            node.child, "histogram_quantile",
            lambda df, group_cols: bucket_quantile(
                df, node.phi, group_cols, le_col="__le"
            ),
        )
        if multi:
            return Plan(
                "grouped", out, VT_F64, group_cols=("series", "ts"),
                series_labels=smap,
            )
        return Plan("vector", out, VT_F64)

    def _le_bucket_eval(self, child_expr, fname: str, apply):
        """Shared raw-sample le-bucket evaluation for the histogram family:
        resolve the child to le-labeled bucket streams, broadcast-join the
        (stream_id -> le, series) frame, and run `apply(df, group_cols)`
        per timestamp (and per remaining-label series when more than one
        exists). Returns (df, multi, series_labels)."""
        from tachyon_spark.functions.histogram import le_series_frame

        child = self.build(child_expr)
        if child.kind != "vector" or not child.streams:
            raise ValueError(
                f"{fname} (raw-sample mode) requires le-labeled "
                "bucket series: a selector or a windowed function over one "
                "(aggregate inputs are a query_range shape — raw aggregates "
                "collapse time)"
            )
        le_map, multi, smap = le_series_frame(self.conn.spark, child.streams)
        df = child.df.join(F.broadcast(le_map), "stream_id")
        group_cols = (["__series"] if multi else []) + ["ts"]
        out = apply(df, group_cols)
        if multi:
            out = out.withColumnRenamed("__series", "series")
        return out, multi, smap

    def _histogram_agg(self, node: ast.HistogramAgg) -> Plan:
        """histogram_count/sum/avg(buckets): Prometheus 3.x classic-
        histogram helpers over the same le-frame machinery as
        histogram_quantile — count is the +Inf bucket's cumulative count,
        sum the midpoint estimate, avg their ratio
        (functions/histogram.bucket_agg)."""
        from tachyon_spark.functions.histogram import bucket_agg

        out, multi, smap = self._le_bucket_eval(
            node.child, f"histogram_{node.op}",
            lambda df, group_cols: bucket_agg(
                df, node.op, group_cols, le_col="__le"
            ),
        )
        if multi:
            return Plan(
                "grouped", out, VT_F64, group_cols=("series", "ts"),
                series_labels=smap,
            )
        return Plan("vector", out, VT_F64)

    def _histogram_fraction(self, node: ast.HistogramFraction) -> Plan:
        """histogram_fraction(lo, hi, buckets): interpolated in-range
        observation fraction (functions/histogram.bucket_fraction)."""
        from tachyon_spark.functions.histogram import bucket_fraction

        out, multi, smap = self._le_bucket_eval(
            node.child, "histogram_fraction",
            lambda df, group_cols: bucket_fraction(
                df, node.lo, node.hi, group_cols, le_col="__le"
            ),
        )
        if multi:
            return Plan(
                "grouped", out, VT_F64, group_cols=("series", "ts"),
                series_labels=smap,
            )
        return Plan("vector", out, VT_F64)

    def _deriv_func(self, node: ast.DerivFunc) -> Plan:
        """deriv(m[RANGE]): least-squares slope of value over ts per
        (series, window) — regr_slope is a plain mergeable aggregate, so
        this is the same single-shuffle shape as every windowed function.
        Slope is per native ts unit (multiply by 1e9 for per-second on ns
        data); windows without 2 distinct ts yield null and are dropped."""
        if isinstance(node.child, ast.Subquery):
            return self._windowed_subquery_func(
                "deriv", "deriv", node.child, None
            )
        msel = node.child
        child = self._selector(msel.selector)
        win = self._window_col(msel)
        return self._deriv_frame(child, win)

    def _deriv_frame(self, child: Plan, win) -> Plan:
        out = (
            child.df.groupBy(*self._series_window_keys(child, win))
            .agg(
                F.regr_slope(
                    F.col("value").cast("double"), F.col("ts").cast("double")
                ).alias("value")
            )
            .where(F.col("value").isNotNull())
        )
        return Plan("vector", out, VT_F64, streams=child.streams)

    def _predict_linear(self, node: ast.PredictLinearFunc) -> Plan:
        """predict_linear(m[RANGE], t): per (series, window) least-squares
        extrapolation to `t` past the window end — regr_intercept +
        regr_slope * (win_start + range + t). Both regr_* are mergeable
        aggregates: same single-shuffle shape as deriv (prometheus/promql
        functions.go funcPredictLinear, over raw tumbling windows)."""
        if isinstance(node.child, ast.Subquery):
            return self._windowed_subquery_func(
                "predict", "predict_linear", node.child, node.horizon
            )
        msel = node.child
        child = self._selector(msel.selector)
        win = self._window_col(msel)
        return self._predict_frame(child, win, msel.range_, node.horizon)

    def _predict_frame(
        self, child: Plan, win, width: int, horizon: float
    ) -> Plan:
        ts_d = F.col("ts").cast("double")
        v_d = F.col("value").cast("double")
        keys = self._series_window_keys(child, win)
        pred_t = F.col("__win") + F.lit(float(width) + horizon)
        out = (
            child.df.groupBy(*keys)
            .agg(
                F.regr_slope(v_d, ts_d).alias("__m"),
                F.regr_intercept(v_d, ts_d).alias("__b"),
            )
            .withColumnRenamed("ts", "__win")
            .where(F.col("__m").isNotNull())
            .select(
                *[c for c in ("stream_id",) if c in child.df.columns],
                F.col("__win").alias("ts"),
                (F.col("__b") + F.col("__m") * pred_t).alias("value"),
            )
        )
        return Plan("vector", out, VT_F64, streams=child.streams)

    @staticmethod
    def _holt_winters_value(sf: float, tf: float):
        """The holt_winters aggregate column: sorted collect_list fold —
        the recurrence is sequential BY DEFINITION, so the window's samples
        fold in one task (a window is range-width bounded, the same
        in-memory contract as Prometheus's own evaluation); windows
        distribute per (series, window) as usual. State carries
        (prev_s, cur_s, b, i); i==1 folds the b init = v1 - v0 into the
        general step (b' = v - cur there). Null (< 2 samples) drops."""
        pairs = F.sort_array(
            F.collect_list(F.struct(F.col("ts"), F.col("value").cast("double").alias("v")))
        )
        vals = F.transform(pairs, lambda p: p["v"])

        def step(acc, x):
            b1 = x - acc["cur"]  # i == 1: b init = v1 - v0
            bk = F.lit(tf) * (acc["cur"] - acc["prev"]) + F.lit(1.0 - tf) * acc["b"]
            return (
                F.when(
                    acc["i"] == 0,
                    F.struct(
                        F.lit(0.0).alias("prev"), x.alias("cur"),
                        F.lit(0.0).alias("b"), F.lit(1).alias("i"),
                    ),
                )
                .when(
                    acc["i"] == 1,
                    F.struct(
                        acc["cur"].alias("prev"),
                        (F.lit(sf) * x + F.lit(1.0 - sf) * (acc["cur"] + b1)).alias("cur"),
                        b1.alias("b"), F.lit(2).alias("i"),
                    ),
                )
                .otherwise(
                    F.struct(
                        acc["cur"].alias("prev"),
                        (F.lit(sf) * x + F.lit(1.0 - sf) * (acc["cur"] + bk)).alias("cur"),
                        bk.alias("b"), (acc["i"] + 1).alias("i"),
                    )
                )
            )

        zero = F.struct(
            F.lit(0.0).alias("prev"), F.lit(0.0).alias("cur"),
            F.lit(0.0).alias("b"), F.lit(0).alias("i"),
        )
        return F.aggregate(
            vals, zero, step,
            lambda acc: F.when(acc["i"] >= 2, acc["cur"]),
        )

    def _holt_winters(self, node: ast.HoltWintersFunc) -> Plan:
        if isinstance(node.child, ast.Subquery):
            return self._windowed_subquery_func(
                "holt", "holt_winters", node.child, (node.sf, node.tf)
            )
        msel = node.child
        child = self._selector(msel.selector)
        win = self._window_col(msel)
        return self._holt_frame(child, win, node.sf, node.tf)

    def _holt_frame(self, child: Plan, win, sf: float, tf: float) -> Plan:
        out = (
            child.df.groupBy(*self._series_window_keys(child, win))
            .agg(self._holt_winters_value(sf, tf).alias("value"))
            .where(F.col("value").isNotNull())
        )
        return Plan("vector", out, VT_F64, streams=child.streams)

    def _windowed_subquery_func(
        self, family: str, func: str, sub: ast.Subquery, arg
    ) -> Plan:
        """rate/increase/delta, resets/changes/irate/idelta, deriv,
        predict_linear and holt_winters over a SUBQUERY on the raw path —
        `rate((a + b)[30m:5m])`: the inner expression's instants on the
        S-step grid (_subquery_inner, shared with *_over_time), then the
        same per-(series, RANGE-wide tumbling window) evaluation the
        matrix-selector form runs — the frame helpers are literally the
        same code. Two hash shuffles total (inner grid + outer window),
        no per-step re-execution of the inner query."""
        inner_plan, anchor = self._subquery_inner(sub)
        width = sub.range_
        a = F.lit(anchor)
        win = (
            (F.col("ts") - a) - (F.col("ts") - a) % F.lit(width) + a
        ).alias("ts")
        if family == "range":
            return self._range_windowed_frame(func, inner_plan, win)
        if family == "count":
            return self._range_count_frame(func, inner_plan, win)
        if family == "deriv":
            return self._deriv_frame(inner_plan, win)
        if family == "predict":
            return self._predict_frame(inner_plan, win, width, arg)
        sf, tf = arg
        return self._holt_frame(inner_plan, win, sf, tf)

    def _clock_func(self, node: ast.ClockFunc) -> Plan:
        """Evaluation-clock functions on the raw-sample path (ts stays in
        NATIVE unitless units, ast.CLOCK_FUNCS note):

          time()       -> scalar: the query start (the raw path's
                          evaluation instant; the step grid form is in
                          plans/range_eval).
          timestamp(v) -> each sample's value becomes its own ts.
          vector(s)    -> one sample at the query start with value s.
          scalar(v)    -> the value if v has exactly ONE sample in range,
                          else NaN (Prometheus's one-series rule applied
                          to the raw result set).
        """
        if node.func == "time":
            return Plan("scalar", None, VT_F64, literal=float(self.start or 0))
        if node.func == "pi":
            import math as _m

            return Plan("scalar", None, VT_F64, literal=_m.pi)
        child = self.build(node.child)
        if node.func == "timestamp":
            if child.kind not in ("vector", "grouped"):
                raise ValueError("timestamp() requires a vector input")
            keep = [c for c in child.df.columns if c != "value"]
            out = child.df.select(*keep, F.col("ts").cast("double").alias("value"))
            return Plan(child.kind, out, VT_F64,
                        group_cols=child.group_cols, streams=child.streams)
        if node.func == "vector":
            if child.kind != "scalar":
                raise ValueError("vector() requires a scalar input")
            ts0 = int(self.start or 0)
            if child.literal is not None:
                df = self.conn.spark.range(1).select(
                    F.lit(ts0).cast("long").alias("ts"),
                    F.lit(float(child.literal)).alias("value"),
                )
            else:
                df = child.df.select(
                    F.lit(ts0).cast("long").alias("ts"),
                    F.col("value").cast("double").alias("value"),
                )
            return Plan("vector", df, VT_F64)
        # scalar(v)
        if child.kind != "vector":
            raise ValueError("scalar() requires a vector input")
        agg = child.df.agg(
            F.count("*").alias("__n"),
            F.first("value").alias("__v"),
        )
        out = agg.select(
            F.when(F.col("__n") == 1, F.col("__v").cast("double"))
            .otherwise(F.lit(float("nan")))
            .alias("value")
        )
        return Plan("scalar", out, VT_F64)

    def _range_count_func(self, node: ast.RangeCountFunc) -> Plan:
        """resets/changes per (series, tumbling window): a lag over
        (series, window) ordered by (ts, value), then a count of decreases
        (resets) or inequalities (changes) between consecutive samples.
        One shuffle on the (series, window) key; the lag window and the
        aggregation share that partitioning, so no second exchange."""
        if isinstance(node.child, ast.Subquery):
            return self._windowed_subquery_func(
                "count", node.func, node.child, None
            )
        msel = node.child
        child = self._selector(msel.selector)
        win = self._window_col(msel)
        return self._range_count_frame(node.func, child, win)

    def _range_count_frame(self, func: str, child: Plan, win) -> Plan:
        from pyspark.sql import Window as W

        df = child.df.select(
            *( ["stream_id"] if "stream_id" in child.df.columns else [] ),
            F.col("ts").alias("__ts"),
            "value",
            win.alias("__win"),
        )
        part = (["stream_id"] if "stream_id" in df.columns else []) + ["__win"]
        w = W.partitionBy(*part).orderBy("__ts", "value")
        prev = F.lag("value").over(w)
        keep = [c for c in ("stream_id",) if c in df.columns]
        if func in ("irate", "idelta"):
            # instant rate/delta: only the LAST consecutive pair per window.
            # irate is reset-aware like rate (a negative last delta means
            # the counter restarted: use v); idelta stays the raw gauge diff
            diff = (F.col("value") - prev).cast("double")
            tdiff = (F.col("__ts") - F.lag("__ts").over(w)).cast("double")
            if func == "irate":
                num = diff
                if not getattr(self.conn, "compat_rate_last_first", False):
                    num = F.when(diff >= 0, diff).otherwise(
                        F.col("value").cast("double")
                    )
                val = num / tdiff
            else:
                val = diff
            pairs = df.select(
                *part, "__ts", "value", val.alias("__v"), tdiff.alias("__dt")
            ).where(F.col("__v").isNotNull() & (F.col("__dt") > 0))
            out = pairs.groupBy(*part).agg(
                F.max_by("__v", F.struct("__ts", "value")).alias("value")
            )
            return Plan(
                "vector",
                out.select(*keep, F.col("__win").alias("ts"), "value"),
                VT_F64,
                streams=child.streams,
            )
        if func == "resets":
            flag = (F.col("value") < prev).cast("long")
        else:  # changes
            flag = (F.col("value") != prev).cast("long")
        flagged = df.select(*part, F.coalesce(flag, F.lit(0)).alias("__f"))
        out = flagged.groupBy(*part).agg(F.sum("__f").alias("value"))
        return Plan(
            "vector",
            out.select(*keep, F.col("__win").alias("ts"), "value"),
            VT_U64,
            streams=child.streams,
        )

    @staticmethod
    def _series_window_keys(child: Plan, win) -> list:
        """Windowed evaluation is PER SERIES (PromQL semantics): each stream
        gets its own window rows, and the output keeps stream_id so
        `sum by (label) (...)` composes downstream. Same single shuffle —
        the key is (stream_id, window) instead of (window)."""
        keys = [win]
        if "stream_id" in child.df.columns:
            keys.insert(0, F.col("stream_id"))
        return keys

    def _effective_start(self, sel: ast.VectorSelector) -> int | None:
        """The selector's effective scan start after @/offset modifiers —
        identical logic to _selector (planner.rs:162-180)."""
        start = self.start
        if sel.at_anchor == "start":
            start = 0
        elif sel.at_anchor == "end":
            start = U64_MAX
        elif sel.at_ts is not None:
            start = sel.at_ts
        if (sel.at_anchor or sel.at_ts is not None) and sel.offset:
            # saturating u64 arithmetic like the reference's
            # saturating_add/saturating_sub (negative offsets floor at 0,
            # @ end() + offset caps at u64::MAX)
            start = min(max((start or 0) + sel.offset, 0), U64_MAX)
        return start

    def _window_col(self, msel: ast.MatrixSelector):
        """Tumbling-window start column. Windows anchor at the SELECTOR's
        effective start (after @/offset), i.e. the first scanned timestamp's
        grid origin — so no scanned row sits left of the anchor and the
        modular bucketing never sees a negative offset."""
        width = msel.range_
        anchor = self._effective_start(msel.selector) or 0
        return (
            ((F.col("ts") - F.lit(anchor)) - (F.col("ts") - F.lit(anchor)) % F.lit(width))
            + F.lit(anchor)
        ).alias("ts")

    def _range_windowed(self, func: str, msel: ast.MatrixSelector) -> Plan:
        """Tumbling-window rate/increase/delta over a matrix selector.

        Windows are anchored at the query start (windows [start + k*w,
        start + (k+1)*w)); like the whole-range form, a window needs two
        distinct timestamps to report. rate/increase sum reset-adjusted
        deltas per (series, window) — see _range_func; delta stays
        last-first. Returns a VECTOR (ts = window start, value), freely
        composable downstream."""
        child = self._selector(msel.selector)
        win = self._window_col(msel)
        return self._range_windowed_frame(func, child, win)

    def _range_windowed_frame(self, func: str, child: Plan, win) -> Plan:
        compat = getattr(self.conn, "compat_rate_last_first", False)
        if func in ("rate", "increase") and not compat:
            return self._counter_windowed(func, child, win)
        agg = (
            child.df.groupBy(*self._series_window_keys(child, win))
            .agg(
                F.min_by("value", F.struct("ts", "value")).cast("double").alias("__first"),
                F.max_by("value", F.struct("ts", "value")).cast("double").alias("__last"),
                F.min("ts").alias("__t0"),
                F.max("ts").alias("__t1"),
            )
            .where(F.col("__t1") > F.col("__t0"))
        )
        diff = F.col("__last") - F.col("__first")
        if func == "rate":
            value = diff / (F.col("__t1") - F.col("__t0")).cast("double")
        else:  # increase | delta
            value = diff
        keep = [c for c in ("stream_id", "ts") if c in agg.columns]
        return Plan(
            "vector", agg.select(*keep, value.alias("value")), VT_F64,
            streams=child.streams,
        )

    def _counter_windowed(self, func: str, child: Plan, win) -> Plan:
        """Counter-reset-aware rate/increase per (series, tumbling window):
        lag over that key ordered by (ts, value), adjusted delta
        `v - prev` (growth) or `v` (reset: counter restarted from 0), then
        a sum. The lag window and the aggregation share one (series,
        window) partitioning — a single shuffle, mergeable partials."""
        from pyspark.sql import Window as W

        df = child.df.select(
            *(["stream_id"] if "stream_id" in child.df.columns else []),
            F.col("ts").alias("__ts"),
            "value",
            win.alias("__win"),
        )
        part = (["stream_id"] if "stream_id" in df.columns else []) + ["__win"]
        w = W.partitionBy(*part).orderBy("__ts", "value")
        v = F.col("value").cast("double")
        prev = F.lag(v).over(w)
        adj = F.when(prev.isNull(), F.lit(None)).when(v >= prev, v - prev).otherwise(v)
        agg = (
            df.select(*part, "__ts", adj.alias("__d"))
            .groupBy(*part)
            .agg(
                F.sum("__d").alias("__inc"),
                F.min("__ts").alias("__t0"),
                F.max("__ts").alias("__t1"),
            )
            .where(F.col("__t1") > F.col("__t0"))
        )
        value = F.col("__inc")
        if func == "rate":
            value = value / (F.col("__t1") - F.col("__t0")).cast("double")
        keep = [c for c in ("stream_id",) if c in df.columns]
        return Plan(
            "vector",
            agg.select(*keep, F.col("__win").alias("ts"), value.alias("value")),
            VT_F64,
            streams=child.streams,
        )

    # --------------------------------------------------------------- selector
    def _selector(self, sel: ast.VectorSelector) -> Plan:
        rows = self.conn.catalog.resolve(sel.name, sel.matchers, sel.or_groups)
        if not rows:
            raise ValueError(f"no streams matched selector {sel.name!r}")

        start, end = self._effective_start(sel), self.end

        vt = rows[0].value_type
        for r in rows[1:]:
            vt = promote(vt, r.value_type)

        ids = [r.stream_id for r in rows]
        n_sb = getattr(self.conn, "stream_buckets", 0) or 0
        buckets = None
        if n_sb:
            from tachyon_spark.connection import stream_bucket_py

            bset = {stream_bucket_py(i, n_sb) for i in ids}
            if len(bset) < n_sb:  # all-bucket filter prunes nothing — skip
                buckets = sorted(bset)
        if len(ids) > getattr(self.conn, "isin_threshold", 1_000):
            # High cardinality: no IN-list literal in the plan. The id frame
            # comes from the catalog parquet filtered IN-PLAN (resolve_df),
            # so executors — not the driver — carry the ids; the broadcast
            # semi-join replaces the reference's posting-list intersection.
            df = select_range(
                self.conn.samples_df(), None, start, end,
                time_bucket=self.conn.time_bucket,
                stream_ids_df=self.conn.catalog.resolve_df(
                    sel.name, sel.matchers, sel.or_groups
                ),
                id_count=len(ids),
                stream_buckets=buckets,
            )
        else:
            df = select_range(
                self.conn.samples_df(), ids, start, end,
                time_bucket=self.conn.time_bucket,
                stream_buckets=buckets,
            )
        value = self._value_expr({r.value_type for r in rows}, self.conn)
        df = df.select("stream_id", "ts", value.alias("value"))
        return Plan("vector", df, vt, streams=tuple(rows))

    @staticmethod
    def _value_expr(types: set, conn):
        """The promoted value column for a set of per-stream value types —
        shared by _selector and the grid evaluator's fused-operand scan
        (two selectors with EQUAL type sets read the identical column, so
        one scan can serve both)."""
        dec_u64 = conn.u64_decimal and VT_U64 in types
        if types == {VT_F64}:
            return F.col("value")
        if VT_F64 in types:  # mixed int/float streams -> promoted f64
            int_cols = [F.col("value_int").cast("double")]
            if dec_u64:
                int_cols.insert(0, F.col("value_dec").cast("double"))
            return F.coalesce(F.col("value"), *int_cols)
        if dec_u64:
            # u64-exact layout: full-range DECIMAL(20,0). Mixing with i64
            # promotes to i64 (lattice) — the long cast errors (ANSI) above
            # 2^63-1 rather than silently wrapping.
            if types == {VT_U64}:
                return F.col("value_dec")
            return F.coalesce(F.col("value_dec").cast("long"), F.col("value_int"))
        return F.col("value_int")

    # ----------------------------------------------------------------- binary
    def _binary(self, node: ast.BinaryOp) -> Plan:
        op = node.op
        lhs = self.build(node.lhs)
        rhs = self.build(node.rhs)
        if node.matching is not None:
            return self._matched_binop(op, lhs, rhs, node.matching)
        if op in ast.SET_OPS:
            return self._set_op(op, lhs, rhs)
        is_cmp = op in _CMP

        if lhs.kind in ("scalar", "topk") and rhs.kind in ("scalar", "topk"):
            if is_cmp:
                if not node.bool_mode:
                    raise ValueError(
                        "scalar comparison requires the bool modifier "
                        "(filter semantics are undefined; reference panics)"
                    )
                if lhs.literal is not None and rhs.literal is not None:
                    val = float(_CMP[op](lhs.literal, rhs.literal))
                    return Plan("scalar", None, VT_F64, literal=val)
                a = self._scalar_df(lhs, "__a")
                b = self._scalar_df(rhs, "__b")
                out = a.crossJoin(F.broadcast(b)).select(
                    _CMP[op](
                        F.col("__a").cast("double"), F.col("__b").cast("double")
                    ).cast("double").alias("value")
                )
                return Plan("scalar", out, VT_F64)
            return self._scalar_scalar(op, lhs, rhs)
        if lhs.kind == "vector" and rhs.kind in ("scalar", "topk"):
            return self._vector_scalar(
                op, lhs, rhs, scalar_on_left=False, bool_mode=node.bool_mode
            )
        if lhs.kind in ("scalar", "topk") and rhs.kind == "vector":
            # Correct written-order semantics (reference swaps: binary_op.rs:103-105)
            return self._vector_scalar(
                op, rhs, lhs, scalar_on_left=True, bool_mode=node.bool_mode
            )
        if lhs.kind == "vector" and rhs.kind == "vector":
            if is_cmp:
                raise ValueError("vector-to-vector comparison is not supported (reference panics)")
            vt = result_type(op, lhs.value_type, rhs.value_type)
            out = interpolated_binop(
                lhs.df.select("ts", "value"),
                rhs.df.select("ts", "value"),
                op,
                integer_result=is_integer(promote(lhs.value_type, rhs.value_type)),
            )
            return Plan("vector", out, vt)
        if lhs.kind == "grouped" and rhs.kind == "grouped":
            return self._grouped_grouped(op, lhs, rhs, node.bool_mode)
        if lhs.kind == "grouped" and rhs.kind in ("scalar",):
            return self._grouped_scalar(op, lhs, rhs, False, node.bool_mode)
        if lhs.kind == "scalar" and rhs.kind == "grouped":
            return self._grouped_scalar(op, rhs, lhs, True, node.bool_mode)
        raise ValueError(f"unsupported operand kinds: {lhs.kind} {op} {rhs.kind}")

    def _grouped_grouped(self, op: str, lhs: Plan, rhs: Plan, bool_mode: bool) -> Plan:
        """`sum by (s) (a) OP sum by (s) (b)` — the ratio-of-sums shape
        (extension): an equi-join on the shared group columns, one column
        expression. Both sides already shuffled on the group key, so the
        join reuses that partitioning. Comparisons filter (bool -> 0/1)."""
        keys = [c for c in lhs.group_cols if c != "ts"]
        if keys != [c for c in rhs.group_cols if c != "ts"]:
            raise ValueError(
                f"grouped operands must share grouping labels "
                f"({lhs.group_cols} vs {rhs.group_cols})"
            )
        has_ts = "ts" in lhs.group_cols and "ts" in rhs.group_cols
        on = keys + (["ts"] if has_ts else [])
        l_df = lhs.df.select(*on, F.col("value").alias("__va"))
        r_df = rhs.df.select(*on, F.col("value").alias("__vb"))
        joined = l_df.join(r_df, on)
        a, b = F.col("__va"), F.col("__vb")
        if op in _CMP:
            cond = _CMP[op](a.cast("double"), b.cast("double"))
            if bool_mode:
                out = joined.select(*on, cond.cast("double").alias("value"))
                return Plan("grouped", out, VT_F64, group_cols=tuple(on))
            out = joined.where(cond).select(*on, a.alias("value"))
            return Plan("grouped", out, lhs.value_type, group_cols=tuple(on))
        vt = result_type(op, lhs.value_type, rhs.value_type)
        if op in ("/", "%") or vt == VT_F64:
            a, b = a.cast("double"), b.cast("double")
        result = _ARITH[op](a, b)
        if is_integer(vt):
            result = result.cast("long")
        out = joined.select(*on, result.alias("value"))
        return Plan("grouped", out, vt, group_cols=tuple(on))

    def _grouped_scalar(
        self, op: str, grp: Plan, scalar: Plan, scalar_on_left: bool, bool_mode: bool
    ) -> Plan:
        """`sum by (s) (v) OP scalar` — narrow column expression over the
        grouped frame (extension); comparisons filter groups (bool -> 0/1)."""
        df = grp.df
        if scalar.literal is not None:
            s_col = F.lit(scalar.literal)
        else:
            df = df.crossJoin(F.broadcast(self._scalar_df(scalar, "__s")))
            s_col = F.col("__s")
        keep = list(grp.group_cols)
        v, s = F.col("value").cast("double"), s_col.cast("double")
        if scalar_on_left and getattr(self.conn, "compat_scalar_swap", False):
            scalar_on_left = False
        a, b = (s, v) if scalar_on_left else (v, s)
        if op in _CMP:
            cond = _CMP[op](a, b)
            if bool_mode:
                out = df.select(*keep, cond.cast("double").alias("value"))
                return Plan("grouped", out, VT_F64, group_cols=grp.group_cols)
            out = df.where(cond).select(*keep, "value")
            return Plan("grouped", out, grp.value_type, group_cols=grp.group_cols)
        vt = result_type(op, grp.value_type, scalar.value_type)
        av, bv = (F.col("value"), s_col)
        if vt == VT_F64 or op in ("/", "%"):
            av, bv = av.cast("double"), bv.cast("double")
        a2, b2 = (bv, av) if scalar_on_left else (av, bv)
        result = _ARITH[op](a2, b2)
        if is_integer(vt):
            result = result.cast("long")
        out = df.select(*keep, result.alias("value"))
        return Plan("grouped", out, vt, group_cols=grp.group_cols)

    # ------------------------------------------------------- vector matching
    @staticmethod
    def _match_key(info, matching: ast.VectorMatching) -> tuple:
        """A series' match-group key. on(): the named labels (missing label
        = "", Prometheus semantics); ignoring(): all labels except the named
        ones, canonically ordered."""
        if matching.on:
            return tuple(info.labels.get(l, "") for l in matching.labels)
        drop = set(matching.labels)
        return tuple(
            f"{k}={v}" for k, v in sorted(info.labels.items()) if k not in drop
        )

    def _keyed_side(self, plan: Plan, keys: dict, key_cols: list[str]) -> DataFrame:
        """Attach the driver-computed match-key columns to a sample frame via
        a broadcast join on stream_id (one row per SERIES, so the mapping
        frame is catalog-sized, never sample-sized; series absent from
        `keys` — no match partner — drop out via the inner join). The keys
        are computed once driver-side and used verbatim on both the Spark
        and the bookkeeping side, so they cannot diverge."""
        rows = [(sid,) + key for sid, key in keys.items()]
        map_df = self.conn.spark.createDataFrame(
            rows, ["stream_id"] + key_cols
        )
        return plan.df.join(F.broadcast(map_df), "stream_id")

    def _matched_binop(
        self, op: str, lhs: Plan, rhs: Plan, matching: ast.VectorMatching
    ) -> Plan:
        """`a OP on(l1,..)/ignoring(l1,..) [group_left/right] b` — the
        grouped interpolating join (extension: the reference has no vector
        matching at all; binary ops concatenate streams ignoring labels,
        vector_select.rs:78-105). Per match group, the same union-of-ts +
        linear interpolation semantics as the ungrouped binop
        (operators/interpolate.py), partitioned by the match key — each
        group's windows are independent, so this distributes perfectly."""
        if lhs.kind != "vector" or rhs.kind != "vector":
            raise ValueError("on()/ignoring() requires vector operands")
        if op in _CMP:
            raise ValueError(
                "vector-to-vector comparison is not supported (reference panics)"
            )
        if not lhs.streams or not rhs.streams:
            raise ValueError(
                "vector matching requires label-carrying selector vectors "
                "(derived vectors lost their series identity)"
            )
        if matching.on:
            key_cols = list(matching.labels)
            if not key_cols:
                raise ValueError("on() requires at least one label")
        else:
            key_cols = ["__match_key"]
        if set(matching.include) & set(key_cols):
            raise ValueError("group_left/right include labels overlap match labels")

        lkeys = {s.stream_id: self._key(s, matching) for s in lhs.streams}
        rkeys = {s.stream_id: self._key(s, matching) for s in rhs.streams}

        if op in ast.SET_OPS:
            return self._matched_set_op(op, lhs, rhs, lkeys, rkeys, key_cols, matching)

        common = set(lkeys.values()) & set(rkeys.values())
        lkeys = {sid: k for sid, k in lkeys.items() if k in common}
        rkeys = {sid: k for sid, k in rkeys.items() if k in common}
        if not common:
            raise ValueError("no matching label groups between operands")

        # cardinality contract (PromQL): the "one" side must be unique per
        # group; one-to-one requires both. Checked driver-side — free.
        def _assert_unique(keys: dict, side: str) -> None:
            from collections import Counter

            dup = [k for k, c in Counter(keys.values()).items() if c > 1]
            if dup:
                hint = (
                    " (use group_left/group_right for many-to-one)"
                    if matching.group is None
                    else ""
                )
                raise ValueError(
                    f"vector matching: multiple {side} series in match group "
                    f"{dup[0]!r}{hint}"
                )

        if matching.group in (None, "right"):
            _assert_unique(lkeys, "left")
        if matching.group in (None, "left"):
            _assert_unique(rkeys, "right")

        keyed_l = self._keyed_side(lhs, lkeys, key_cols)
        keyed_r = self._keyed_side(rhs, rkeys, key_cols)

        if matching.group is None:
            series = key_cols
            a_frame = keyed_l.drop("stream_id")
            b_frame = keyed_r.drop("stream_id")
        elif matching.group == "left":
            # many side = left; replicate the unique right series onto each
            # left series of its group (broadcast of a per-series frame)
            series = ["stream_id"] + key_cols
            lmap = self.conn.spark.createDataFrame(
                [(sid,) + k for sid, k in lkeys.items()], ["stream_id"] + key_cols
            )
            a_frame = keyed_l
            b_frame = keyed_r.drop("stream_id").join(F.broadcast(lmap), key_cols)
        else:  # group == 'right': many side = right
            series = ["stream_id"] + key_cols
            rmap = self.conn.spark.createDataFrame(
                [(sid,) + k for sid, k in rkeys.items()], ["stream_id"] + key_cols
            )
            a_frame = keyed_l.drop("stream_id").join(F.broadcast(rmap), key_cols)
            b_frame = keyed_r
        vt = result_type(op, lhs.value_type, rhs.value_type)
        out = interpolated_binop(
            a_frame.select(*series, "ts", "value"),
            b_frame.select(*series, "ts", "value"),
            op,
            integer_result=is_integer(promote(lhs.value_type, rhs.value_type)),
            series_cols=series,
        )
        if matching.include:
            out = self._attach_include(out, matching, key_cols, lkeys, rkeys, lhs, rhs)
        return Plan("grouped", out, vt, group_cols=tuple(series) + ("ts",))

    def _key(self, info, matching) -> tuple:
        k = self._match_key(info, matching)
        if not matching.on:
            return (",".join(k),)  # canonical single-string ignoring() key
        return k

    def _attach_include(
        self, out: DataFrame, matching, key_cols, lkeys, rkeys, lhs, rhs
    ) -> DataFrame:
        """group_left(l1,..)/group_right(l1,..): copy labels from the "one"
        side onto the result — the one side is unique per group, so the
        mapping (group key -> include values) is well-defined and tiny."""
        one_streams = rhs.streams if matching.group == "left" else lhs.streams
        one_keys = rkeys if matching.group == "left" else lkeys
        rows = []
        for s in one_streams:
            if s.stream_id in one_keys:
                rows.append(
                    one_keys[s.stream_id]
                    + tuple(s.labels.get(l, "") for l in matching.include)
                )
        inc_df = self.conn.spark.createDataFrame(
            rows, key_cols + list(matching.include)
        ).dropDuplicates(key_cols)
        return out.join(F.broadcast(inc_df), key_cols, "left")

    def _matched_set_op(
        self, op, lhs, rhs, lkeys, rkeys, key_cols, matching
    ) -> Plan:
        """and/or/unless with on()/ignoring(): set membership per (match
        group, ts) instead of bare ts. No interpolation (PromQL set ops
        don't interpolate); `or` keeps unmatched groups (no common-group
        restriction — that is its point)."""
        if matching.group is not None:
            raise ValueError("group_left/group_right do not apply to set operators")
        keyed_l = self._keyed_side(lhs, lkeys, key_cols).drop("stream_id")
        keyed_r = self._keyed_side(rhs, rkeys, key_cols).drop("stream_id")
        on = key_cols + ["ts"]
        if op == "and":
            out = keyed_l.join(keyed_r.select(*on).distinct(), on, "left_semi")
            return Plan("grouped", out, lhs.value_type, group_cols=tuple(on))
        if op == "unless":
            out = keyed_l.join(keyed_r.select(*on).distinct(), on, "left_anti")
            return Plan("grouped", out, lhs.value_type, group_cols=tuple(on))
        vt = promote(lhs.value_type, rhs.value_type)
        r_extra = keyed_r.join(keyed_l.select(*on).distinct(), on, "left_anti")
        out = keyed_l.select(
            *on, F.col("value").cast("double").alias("value")
        ).unionByName(r_extra.select(*on, F.col("value").cast("double").alias("value")))
        if is_integer(vt):
            out = out.select(*on, F.col("value").cast("long").alias("value"))
        return Plan("grouped", out, vt, group_cols=tuple(on))

    def _scalar_scalar(self, op: str, lhs: Plan, rhs: Plan) -> Plan:
        vt = result_type(op, lhs.value_type, rhs.value_type)
        if lhs.literal is not None and rhs.literal is not None:
            # Python fast path: same IEEE zero-divisor semantics as the
            # column path (plain Python 1/0 raises instead)
            val = py_arith(op, lhs.literal, rhs.literal)
            return Plan("scalar", None, VT_F64, literal=float(val))
        a_df = self._scalar_df(lhs, "__a")
        b_df = self._scalar_df(rhs, "__b")
        joined = a_df.crossJoin(F.broadcast(b_df))
        a, b = F.col("__a"), F.col("__b")
        if op in ("/", "%") or vt == VT_F64:
            a, b = a.cast("double"), b.cast("double")
        out = joined.select(_ARITH[op](a, b).alias("value"))
        return Plan("scalar", out, vt)

    def _scalar_df(self, plan: Plan, alias: str) -> DataFrame:
        if plan.kind == "topk":
            # topk/bottomk yields k rows; silently cross-joining it would
            # multiply the other operand by k. Reject rather than guess.
            raise ValueError(
                "topk/bottomk result is multi-row and cannot be used as a "
                "scalar operand; aggregate it first (e.g. sum(topk(...)))"
            )
        if plan.literal is not None:
            return self.conn.spark.range(1).select(F.lit(plan.literal).alias(alias))
        return plan.df.select(F.col("value").alias(alias))

    def _vector_scalar(
        self, op: str, vec: Plan, scalar: Plan, scalar_on_left: bool,
        bool_mode: bool = False,
    ) -> Plan:
        df = vec.df
        if scalar.literal is not None:
            s_col = F.lit(scalar.literal)
        else:
            df = df.crossJoin(F.broadcast(self._scalar_df(scalar, "__s")))
            s_col = F.col("__s")

        if op in _CMP:
            # written-order comparison (the reference swaps scalar-on-left
            # like arithmetic, binary_op.rs:103-105; compat flag replays it)
            v_cmp, s_cmp = F.col("value").cast("double"), s_col.cast("double")
            if scalar_on_left and getattr(self.conn, "compat_scalar_swap", False):
                scalar_on_left = False
            a, b = (s_cmp, v_cmp) if scalar_on_left else (v_cmp, s_cmp)
            cond = _CMP[op](a, b)
            keep = [c for c in ("stream_id", "ts") if c in df.columns]
            if bool_mode:
                # bool modifier: 0/1 result values, no filtering (extension)
                out = df.select(*keep, cond.cast("double").alias("value"))
                return Plan("vector", out, VT_F64, streams=vec.streams)
            # filter semantics: keep sample rows where the comparison holds
            out = df.where(cond)
            return Plan(
                "vector", out.select(*keep, "value"), vec.value_type,
                streams=vec.streams,
            )

        vt = result_type(op, vec.value_type, scalar.value_type)
        v_col = F.col("value")
        if vt == VT_F64:
            v_col, s_col = v_col.cast("double"), s_col.cast("double")
        if scalar_on_left and getattr(self.conn, "compat_scalar_swap", False):
            # reference bug-compat: `2 - v` evaluates as `v - 2`
            # (binary_op.rs:103-105 swaps operands). Off by default — we
            # evaluate written order; the flag makes golden-test migration
            # from the reference airtight.
            scalar_on_left = False
        a, b = (s_col, v_col) if scalar_on_left else (v_col, s_col)
        result = _ARITH[op](a, b)
        if is_integer(vt):
            result = result.cast("long")
        keep = [c for c in ("stream_id", "ts") if c in df.columns]
        return Plan(
            "vector", df.select(*keep, result.alias("value")), vt,
            streams=vec.streams,
        )

    # -------------------------------------------------------------- aggregate
    def _aggregate(self, node: ast.Aggregate) -> Plan:
        child = self.build(node.child)
        func = node.func
        if func in ("sum", "min", "max"):
            vt = child.value_type
        elif func == "count":
            vt = VT_U64
        else:  # avg
            vt = VT_F64
        if child.kind == "grouped":
            # composition over an already-grouped result (round 10,
            # mirroring range_eval._aggregate_grouped): raw grouped aggs
            # collapse the range per group, so re-aggregation runs over
            # the GROUP ROWS — `max(sum by (s) (m))` is the max of the
            # per-s sums (a scalar), `sum by (a) (... by (a,b) ...)`
            # re-keys on the surviving labels
            labels = [
                c
                for c in child.group_cols
                if c not in ("ts", "stream_id") and not c.startswith("__")
            ]
            approx = getattr(self.conn, "approx_aggregates", False)
            if "series" in labels and (node.by or node.without):
                # composite-keyed child (a `without` grouping): decompose
                # via the plan's series->labels map and re-key (ADVICE
                # r11 medium — regrouping the composite unchanged fails
                # to merge series differing only in the dropped labels;
                # dropping it collapsed these shapes to a scalar).
                if len(labels) > 1:
                    raise ValueError(
                        "cannot re-group a mixed composite/label-keyed "
                        "result"
                    )
                df, keys, new_sl = self._rekey_series(child, node)
                out = grouped_agg(
                    df, func, keys, param=node.param, approx=approx
                )
                return Plan(
                    "grouped", out, vt, group_cols=tuple(keys),
                    series_labels=new_sl,
                )
            labels = [c for c in labels if c != "series"]
            if node.by:
                missing = set(node.by) - set(labels)
                if missing:
                    raise ValueError(
                        f"grouping label(s) {sorted(missing)} not present "
                        f"in the grouped input (carries {labels})"
                    )
                out = grouped_agg(
                    child.df, func, list(node.by), param=node.param,
                    approx=approx,
                )
                return Plan("grouped", out, vt, group_cols=tuple(node.by))
            keys = (
                [c for c in labels if c not in set(node.without)]
                if node.without
                else []
            )
            if keys:
                out = grouped_agg(
                    child.df, func, keys, param=node.param, approx=approx
                )
                return Plan("grouped", out, vt, group_cols=tuple(keys))
            return Plan(
                "scalar",
                scalar_agg(child.df, func, param=node.param, approx=approx),
                vt,
            )
        if child.kind not in ("vector", "topk"):
            raise ValueError("aggregate requires a vector input")

        cdf = child.df
        if func == "avg":
            from pyspark.sql import types as T

            # avg is always f64; Spark's avg over DECIMAL (u64-exact layout)
            # would return DECIMAL — pre-cast only in that case so the long
            # path keeps its exact integer partial sums.
            if isinstance(cdf.schema["value"].dataType, T.DecimalType):
                cdf = cdf.withColumn("value", F.col("value").cast("double"))
        approx = getattr(self.conn, "approx_aggregates", False)
        if node.by:
            df = self._attach_labels(cdf, node.by, child.streams)
            out = grouped_agg(df, func, list(node.by), param=node.param, approx=approx)
            return Plan("grouped", out, vt, group_cols=tuple(node.by))
        if node.without:
            df, smap = self._attach_series_key(cdf, node.without, child.streams)
            out = grouped_agg(df, func, ["series"], param=node.param, approx=approx)
            return Plan(
                "grouped", out, vt, group_cols=("series",), series_labels=smap
            )
        return Plan(
            "scalar", scalar_agg(cdf, func, param=node.param, approx=approx), vt
        )

    @staticmethod
    def _series_key_rows(
        streams: tuple, drop: set
    ) -> tuple[list, tuple]:
        """Per-stream (stream_id, composite-series-key) rows plus the
        series-key -> remaining-labels map (Plan.series_labels) that lets
        an outer aggregation decompose the composite and re-key it."""
        rows, smap = [], {}
        for s in streams:
            kept = tuple(
                (k, v) for k, v in sorted(s.labels.items()) if k not in drop
            )
            key = ",".join(f"{k}={v}" for k, v in kept)
            rows.append((s.stream_id, key))
            smap.setdefault(key, kept)
        return rows, tuple(smap.items())

    def _rekey_series(
        self, child: "Plan", node
    ) -> tuple[DataFrame, list, tuple]:
        """Outer by/without over a composite-series-keyed child (a
        `without` grouping): decompose the opaque key via the plan's
        series -> labels map (broadcast, one row per GROUP, never data-
        sized) and re-key, so `sum without (c) (sum without (b) (m))`
        merges series differing only in c instead of regrouping the
        composite unchanged. Returns (df with new key cols, key col
        names, new series_labels for further nesting)."""
        smap = dict(child.series_labels)
        if not smap:
            raise ValueError(
                "cannot re-group an opaque series-keyed result (no "
                "series -> label map — histogram bucket composites and "
                "similar); group the inner expression with by (...) "
                "instead"
            )
        if node.by:
            have: set = set()
            for labs in smap.values():
                have.update(k for k, _ in labs)
            missing = set(node.by) - have
            if missing:
                raise ValueError(
                    f"grouping label(s) {sorted(missing)} not present in "
                    f"the grouped input (carries {sorted(have)})"
                )
            rows = [
                (series,) + tuple(dict(labs).get(b) for b in node.by)
                for series, labs in smap.items()
            ]
            schema = T.StructType(
                [T.StructField("series", T.StringType(), False)]
                + [T.StructField(b, T.StringType(), True) for b in node.by]
            )
            key_df = self.conn.spark.createDataFrame(rows, schema)
            df = child.df.join(F.broadcast(key_df), "series").drop("series")
            return df, list(node.by), ()
        drop = set(node.without)
        rows, new_map = [], {}
        for series, labs in smap.items():
            kept = tuple((k, v) for k, v in labs if k not in drop)
            nk = ",".join(f"{k}={v}" for k, v in kept)
            rows.append((series, nk))
            new_map.setdefault(nk, kept)
        key_df = self.conn.spark.createDataFrame(
            rows, "series string, __series_out string"
        )
        df = (
            child.df.join(F.broadcast(key_df), "series")
            .drop("series")
            .withColumnRenamed("__series_out", "series")
        )
        return df, ["series"], tuple(new_map.items())

    def _attach_series_key(
        self, cdf: DataFrame, without: tuple[str, ...], streams: tuple
    ) -> tuple[DataFrame, tuple]:
        """`without (l1,..)` grouping key: group by every label EXCEPT the
        listed ones — per-series canonical remaining-label key computed
        driver-side from the plan's stream info, attached as one broadcast
        map column named `series`. Also returns the series -> labels map
        for Plan.series_labels (outer re-grouping support)."""
        if "stream_id" not in cdf.columns or not streams:
            raise ValueError(
                "grouped aggregation (without ...) requires a "
                "label-carrying selector vector"
            )
        rows, smap = self._series_key_rows(streams, set(without))
        key_df = self.conn.spark.createDataFrame(
            rows, "stream_id string, series string"
        )
        return cdf.join(F.broadcast(key_df), "stream_id", "left"), smap

    def _grouping_cols(
        self, child: "Plan", by: tuple[str, ...], without: tuple[str, ...],
        what: str,
    ) -> tuple[DataFrame, tuple[str, ...]]:
        """Shared by/without grouping-column attachment for aggregation
        operators that group on labels plus their own key (count_values).
        Returns (df with group columns, group column names)."""
        if by:
            return self._attach_labels(child.df, by, child.streams), by
        if without:
            df, _ = self._attach_series_key(child.df, without, child.streams)
            return df, ("series",)
        return child.df, ()

    def _attach_labels(
        self, df: DataFrame, labels: tuple[str, ...], streams: tuple = ()
    ) -> DataFrame:
        if "stream_id" not in df.columns:
            # windowed / derived vectors no longer carry series identity
            raise ValueError(
                "grouped aggregation (by ...) requires a label-carrying "
                "vector — apply it to a selector, not a derived vector"
            )
        if streams:
            # plan-level label sets (they may have been rewritten by
            # label_replace/label_join — the catalog doesn't know)
            rows = [
                (s.stream_id,) + tuple(s.labels.get(l) for l in labels)
                for s in streams
            ]
            schema = T.StructType(
                [T.StructField("stream_id", T.StringType(), False)]
                + [T.StructField(l, T.StringType(), True) for l in labels]
            )
            cat = self.conn.spark.createDataFrame(rows, schema)
        else:
            cat = self.conn.catalog.df().select(
                "stream_id", *[F.col("labels").getItem(l).alias(l) for l in labels]
            )
        return df.join(F.broadcast(cat), "stream_id", "left")

    # ------------------------------------------------------------------ getk
    def _getk(self, node: ast.GetK) -> Plan:
        k_plan = self.build(node.k)
        if k_plan.kind not in ("scalar", "topk"):
            raise ValueError("topk/bottomk k must be a scalar expression")
        if k_plan.literal is not None:
            k = int(k_plan.literal)
        else:
            row = k_plan.df.select("value").collect()
            k = int(row[0].value) if row else 0
        child = self.build(node.child)
        if child.kind != "vector":
            raise ValueError("topk/bottomk requires a vector input")
        if node.by or node.without:
            # per-group k: rank window shares the group-key shuffle — no
            # global sort (extension; the reference's GetK is global only).
            # `without` groups on the canonical remaining-label series key
            # (same broadcast attach as Aggregate.without).
            from tachyon_spark.operators.topk import grouped_top_k

            if node.by:
                df = self._attach_labels(child.df, node.by, child.streams)
                cols = list(node.by)
            else:
                df, smap = self._attach_series_key(
                    child.df, node.without, child.streams
                )
                cols = ["series"]
            out = grouped_top_k(df, k, cols, desc=node.func == "topk")
            return Plan(
                "grouped", out, child.value_type, group_cols=tuple(cols),
                series_labels=smap if not node.by else (),
            )
        fn = top_k if node.func == "topk" else bottom_k
        return Plan("topk", fn(child.df, k), child.value_type)
