"""Hand-rolled lexer + recursive-descent parser for the PromQL subset.

The reference delegates to a PromQL parser submodule and then rejects
everything outside its subset (query/planner.rs:125-232). We parse exactly the
accepted subset directly, with standard PromQL precedence:
    ^                 (highest; right-associative, binds tighter than unary -)
    unary + -
    * / % atan2
    + -
    == != > < >= <=
    and unless
    or                (lowest)

Extensions beyond the reference: `by (l1, l2)` on aggregates, !=/=~/!~
matchers (fully anchored like Prometheus), unary +/-, ^/atan2, __name__
matchers and bare {matcher} selectors.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from tachyon_spark.promql import ast


class PromQLError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<number>\d+(\.\d+)?([eE][+-]?\d+)?)
  | (?P<ident>[a-zA-Z_][a-zA-Z0-9_]*)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<op>=~|!~|==|!=|>=|<=|[><=+\-*/%^(){},@\[\]:])
    """,
    re.VERBOSE,
)

# Outside a `[` ... `]` range context, ':' is part of identifiers so
# recording-rule metric names (`job:rate:sum`) lex as one token; inside
# brackets the plain rule applies so `m[30m:5m]` still lexes the subquery
# ':' as an operator.
_TOKEN_RE_COLON_IDENT = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<number>\d+(\.\d+)?([eE][+-]?\d+)?)
  | (?P<ident>[a-zA-Z_][a-zA-Z0-9_:]*)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<op>=~|!~|==|!=|>=|<=|[><=+\-*/%^(){},@\[\]:])
    """,
    re.VERBOSE,
)

# `m[5m]` durations: bare numbers are native ts units; suffixed units assume
# nanosecond timestamps (the samples tables' wall-clock unit).
DURATION_UNITS = {
    "ns": 1,
    "us": 1_000,
    "ms": 1_000_000,
    "s": 1_000_000_000,
    "m": 60 * 1_000_000_000,
    "h": 3_600 * 1_000_000_000,
    "d": 86_400 * 1_000_000_000,
    "w": 7 * 86_400 * 1_000_000_000,
}

KEYWORDS = (
    {"offset", "by", "without", "bool", "start", "end", "on", "ignoring", "group_left", "group_right"}
    | set(ast.ABSENT_FUNCS)
    | set(ast.ABSENT_OVER_FUNCS)
    | set(ast.COUNT_VALUES_FUNCS)
    | set(ast.ROUND_FUNCS)
    | set(ast.AGG_FUNCS)
    | set(ast.GETK_FUNCS)
    | set(ast.RANGE_FUNCS)
    | set(ast.OVER_TIME_FUNCS)
    | set(ast.RANGE_COUNT_FUNCS)
    | set(ast.DERIV_FUNCS)
    | set(ast.PREDICT_FUNCS)
    | set(ast.HOLT_FUNCS)
    | set(ast.CLOCK_FUNCS)
    | set(ast.MATH_FUNCS)
    | set(ast.CALENDAR_FUNCS)
    | set(ast.SET_OPS)
    | set(ast.SORT_FUNCS)
    | set(ast.SORT_BY_LABEL_FUNCS)
    | set(ast.LIMIT_FUNCS)
    | set(ast.CLAMP_FUNCS)
    | set(ast.HISTOGRAM_FUNCS)
    | set(ast.LABEL_FUNCS)
)


@dataclass
class Token:
    kind: str  # number | ident | string | op
    text: str
    pos: int


def tokenize(src: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    depth = 0  # open-'[' nesting: inside, ':' is the subquery separator
    while pos < len(src):
        m = (_TOKEN_RE if depth else _TOKEN_RE_COLON_IDENT).match(src, pos)
        if not m:
            raise PromQLError(f"unexpected character {src[pos]!r} at {pos} in {src!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "op":
            if text == "[":
                depth += 1
            elif text == "]":
                depth = max(0, depth - 1)
        tokens.append(Token(kind, text, m.start()))
    return tokens


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


class Parser:
    def __init__(self, src: str):
        self.src = src
        self.tokens = tokenize(src)
        self.i = 0

    def peek(self) -> Token | None:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self) -> Token:
        tok = self.peek()
        if tok is None:
            raise PromQLError(f"unexpected end of query: {self.src!r}")
        self.i += 1
        return tok

    def expect(self, text: str) -> Token:
        tok = self.next()
        if tok.text != text:
            raise PromQLError(f"expected {text!r}, got {tok.text!r} at {tok.pos} in {self.src!r}")
        return tok

    def at(self, text: str) -> bool:
        tok = self.peek()
        return tok is not None and tok.text == text

    # precedence climbing ---------------------------------------------------
    # PromQL precedence (low->high): or | and/unless | comparisons | +- | */%
    def parse(self):
        expr = self.parse_or()
        if self.peek() is not None:
            tok = self.peek()
            raise PromQLError(f"trailing input at {tok.pos}: {tok.text!r}")
        return expr

    def _parse_matching(self) -> ast.VectorMatching | None:
        """Optional `on(...)/ignoring(...)` [+ group_left/group_right] right
        after a binary operator token."""
        tok = self.peek()
        if tok is None or tok.text not in ("on", "ignoring"):
            return None
        on = self.next().text == "on"
        labels = tuple(self._parse_label_list())
        group = None
        include: tuple[str, ...] = ()
        tok = self.peek()
        if tok is not None and tok.text in ("group_left", "group_right"):
            group = "left" if self.next().text == "group_left" else "right"
            if self.at("("):
                include = tuple(self._parse_label_list())
        return ast.VectorMatching(on, labels, group, include)

    def _parse_grouping(
        self, func: str
    ) -> tuple[tuple[str, ...], tuple[str, ...]]:
        """Optional `by (...)` / `without (...)` at the CURRENT position.
        Prometheus accepts the grouping modifier both prefix
        (`sum by (job) (v)`) and postfix (`sum(v) by (job)`) on every
        aggregation — sum-family, topk/bottomk, quantile, count_values,
        limitk/limit_ratio. Callers invoke this before '(' and, if nothing
        was found, again after ')'."""
        by: tuple[str, ...] = ()
        without: tuple[str, ...] = ()
        if self.at("by"):
            self.next()
            by = tuple(self._parse_label_list())
        elif self.at("without"):
            self.next()
            without = tuple(self._parse_label_list())
        return by, without

    def _parse_label_list(self) -> list[str]:
        self.expect("(")
        labels = []
        while not self.at(")"):
            tok = self.next()
            if tok.kind != "ident":
                raise PromQLError(f"expected label name, got {tok.text!r}")
            labels.append(tok.text)
            if self.at(","):
                self.next()
        self.expect(")")
        return labels

    def parse_or(self):
        lhs = self.parse_and()
        while self.peek() and self.peek().text == "or":
            self.next()
            matching = self._parse_matching()
            rhs = self.parse_and()
            lhs = ast.BinaryOp("or", lhs, rhs, matching)
        return lhs

    def parse_and(self):
        lhs = self.parse_cmp()
        while self.peek() and self.peek().text in ("and", "unless"):
            op = self.next().text
            matching = self._parse_matching()
            rhs = self.parse_cmp()
            lhs = ast.BinaryOp(op, lhs, rhs, matching)
        return lhs

    def parse_cmp(self):
        lhs = self.parse_add()
        while self.peek() and self.peek().text in ast.CMP_OPS:
            op = self.next().text
            bool_mode = False
            if self.at("bool"):
                self.next()
                bool_mode = True
            matching = self._parse_matching()
            rhs = self.parse_add()
            lhs = ast.BinaryOp(op, lhs, rhs, matching, bool_mode)
        return lhs

    def parse_add(self):
        lhs = self.parse_mul()
        while self.peek() and self.peek().text in ("+", "-"):
            op = self.next().text
            matching = self._parse_matching()
            rhs = self.parse_mul()
            lhs = ast.BinaryOp(op, lhs, rhs, matching)
        return lhs

    def parse_mul(self):
        # atan2 sits at the * / % precedence level (Prometheus grammar);
        # it lexes as an ident but is unambiguous in operator position
        lhs = self.parse_unary()
        while self.peek() and self.peek().text in ("*", "/", "%", "atan2"):
            op = self.next().text
            matching = self._parse_matching()
            rhs = self.parse_unary()
            lhs = ast.BinaryOp(op, lhs, rhs, matching)
        return lhs

    def parse_unary(self):
        if self.at("+"):  # unary plus is identity (Prometheus)
            self.next()
            return self.parse_unary()
        if self.at("-"):
            self.next()
            child = self.parse_unary()
            if isinstance(child, ast.NumberLiteral):
                return ast.NumberLiteral(-child.value)
            return ast.BinaryOp("*", ast.NumberLiteral(-1.0), child)
        return self.parse_pow()

    def parse_pow(self):
        # ^ binds tighter than unary minus and is RIGHT-associative
        # (Prometheus: -2^2 = -(2^2), 2^3^2 = 2^(3^2)); the rhs parses
        # as unary so 2^-3 works
        lhs = self.parse_primary()
        if self.peek() and self.peek().text == "^":
            self.next()
            matching = self._parse_matching()
            rhs = self.parse_unary()
            return ast.BinaryOp("^", lhs, rhs, matching)
        return lhs

    def parse_primary(self):
        tok = self.peek()
        if tok is None:
            raise PromQLError(f"unexpected end of query: {self.src!r}")
        if tok.text == "(":
            self.next()
            inner = self.parse_or()
            self.expect(")")
            return self._maybe_subquery(inner)
        if tok.kind == "number":
            self.next()
            return ast.NumberLiteral(float(tok.text))
        if tok.kind == "ident":
            if tok.text in ast.AGG_FUNCS:
                return self._maybe_subquery(self.parse_aggregate())
            if tok.text in ast.GETK_FUNCS:
                return self.parse_getk()
            if tok.text in ast.RANGE_FUNCS:
                return self._maybe_subquery(self.parse_range_func())
            if tok.text in ast.OVER_TIME_FUNCS:
                return self._maybe_subquery(self.parse_over_time_func())
            if tok.text in ast.RANGE_COUNT_FUNCS:
                return self._maybe_subquery(self.parse_range_count_func())
            if tok.text in ast.PREDICT_FUNCS:
                return self.parse_predict_linear()
            if tok.text in ast.HOLT_FUNCS:
                return self.parse_holt_winters()
            if tok.text in ast.CLOCK_FUNCS:
                return self.parse_clock_func()
            if tok.text in ast.DERIV_FUNCS:
                return self._maybe_subquery(self.parse_deriv_func())
            if tok.text in ast.MATH_FUNCS:
                return self.parse_math_func()
            if tok.text in ast.CALENDAR_FUNCS:
                return self.parse_calendar_func()
            if tok.text in ast.SORT_FUNCS:
                return self.parse_sort_func()
            if tok.text in ast.SORT_BY_LABEL_FUNCS:
                return self.parse_sort_by_label()
            if tok.text in ast.LIMIT_FUNCS:
                return self.parse_limit_agg()
            if tok.text in ast.CLAMP_FUNCS:
                return self.parse_clamp_func()
            if tok.text in ast.HISTOGRAM_FUNCS:
                return self.parse_histogram_quantile()
            if tok.text in ast.HISTOGRAM_AGG_FUNCS:
                return self.parse_histogram_agg()
            if tok.text in ast.HISTOGRAM_FRACTION_FUNCS:
                return self.parse_histogram_fraction()
            if tok.text in ast.LABEL_FUNCS:
                return self.parse_label_func()
            if tok.text in ast.COUNT_VALUES_FUNCS:
                return self.parse_count_values()
            if tok.text in ast.ROUND_FUNCS:
                return self.parse_round()
            if tok.text in ast.ABSENT_OVER_FUNCS:
                self.next()
                self.expect("(")
                child = self.parse_or()
                self.expect(")")
                if not isinstance(child, (ast.MatrixSelector, ast.Subquery)):
                    raise PromQLError(
                        "absent_over_time requires a range vector "
                        "argument like m[5m] or a subquery like "
                        "(a + b)[30m:5m]"
                    )
                return ast.AbsentOverTime(child)
            if tok.text in ast.ABSENT_FUNCS:
                self.next()
                self.expect("(")
                child = self.parse_or()
                self.expect(")")
                return ast.AbsentFunc(child)
            return self.parse_selector()
        if tok.text == "{":
            # bare matcher selector {__name__="m", job="x"} (Prometheus:
            # a selector may omit the metric name when it has matchers)
            return self.parse_selector(bare=True)
        raise PromQLError(f"unexpected token {tok.text!r} at {tok.pos} in {self.src!r}")

    def _duration(self, allow_zero: bool = False) -> int:
        """<number>[unit] — bare numbers are native ts units; suffixed units
        assume nanosecond timestamps. Range selectors and subquery steps
        must be strictly positive; the offset modifier passes
        allow_zero=True (Prometheus accepts `offset 0`)."""
        num = self.next()
        if num.kind != "number":
            raise PromQLError(f"duration must be a number, got {num.text!r}")
        dur = float(num.text)
        nxt = self.peek()
        if nxt is not None and nxt.kind == "ident":
            if nxt.text not in DURATION_UNITS:
                raise PromQLError(f"unknown duration unit {nxt.text!r}")
            dur *= DURATION_UNITS[self.next().text]
        if dur < 0 or (dur == 0 and not allow_zero):
            raise PromQLError("duration must be positive")
        return int(dur)

    def _maybe_subquery(self, expr):
        """Postfix `[RANGE:STEP]` on a non-selector expression."""
        if not self.at("["):
            return expr
        self.next()
        range_ = self._duration()
        self.expect(":")
        step = self._duration()
        self.expect("]")
        at_ts, at_anchor, offset = self._parse_at_offset()
        return ast.Subquery(expr, range_, step, at_ts, at_anchor, offset)

    def parse_round(self):
        """round(v[, to_nearest])."""
        self.next()
        self.expect("(")
        child = self.parse_or()
        to_nearest = 1.0
        if self.at(","):
            self.next()
            tok = self.next()
            if tok.kind != "number":
                raise PromQLError(f"round to_nearest must be a number, got {tok.text!r}")
            to_nearest = float(tok.text)
            if to_nearest <= 0:
                raise PromQLError("round to_nearest must be positive")
        self.expect(")")
        return ast.RoundFunc(child, to_nearest)

    def parse_count_values(self):
        """count_values("label", v), optional by/without grouping prefix or
        postfix (PromQL: count_values is an aggregation operator)."""
        func = self.next().text
        by, without = self._parse_grouping(func)
        self.expect("(")
        tok = self.next()
        if tok.kind != "string":
            raise PromQLError(f"count_values label must be a string, got {tok.text!r}")
        label = _unquote(tok.text)
        if label in ("value", "ts", "stream_id"):
            # the output frame already has a 'value' (count) column; a
            # colliding label would yield two same-named columns
            raise PromQLError(
                f"count_values label {label!r} collides with a reserved "
                "output column (value/ts/stream_id)"
            )
        self.expect(",")
        child = self.parse_or()
        self.expect(")")
        if not by and not without:
            by, without = self._parse_grouping(func)
        if label in by:
            raise PromQLError(
                f"count_values label {label!r} collides with a grouping label"
            )
        return ast.CountValues(label, child, by, without)

    def parse_label_func(self):
        """label_replace(v, "dst", "repl", "src", "regex") /
        label_join(v, "dst", "sep", "src1", ...)."""
        func = self.next().text
        self.expect("(")
        child = self.parse_or()
        args = []
        while self.at(","):
            self.next()
            tok = self.next()
            if tok.kind != "string":
                raise PromQLError(f"{func} arguments must be strings, got {tok.text!r}")
            args.append(_unquote(tok.text))
        self.expect(")")
        if func == "label_replace" and len(args) != 4:
            raise PromQLError("label_replace takes (v, dst, replacement, src, regex)")
        if func == "label_join" and len(args) < 2:
            raise PromQLError("label_join takes (v, dst, separator, src...)")
        return ast.LabelFunc(func, child, tuple(args))

    def parse_histogram_quantile(self):
        """histogram_quantile(phi, selector) over le-labeled bucket series."""
        self.next()
        self.expect("(")
        neg = False
        if self.at("-"):
            self.next()
            neg = True
        tok = self.next()
        if tok.kind != "number":
            raise PromQLError(f"histogram_quantile phi must be a number, got {tok.text!r}")
        phi = -float(tok.text) if neg else float(tok.text)
        if not 0.0 <= phi <= 1.0:
            raise PromQLError(f"histogram_quantile phi must be in [0, 1], got {phi}")
        self.expect(",")
        child = self.parse_or()
        self.expect(")")
        if not isinstance(
            child,
            (ast.VectorSelector, ast.Aggregate, ast.RangeFunc, ast.OverTimeFunc),
        ):
            raise PromQLError(
                "histogram_quantile requires le-labeled bucket series (a "
                "selector, a windowed rate/increase/*_over_time over them, "
                "or an aggregate grouped by (le))"
            )
        return ast.HistogramQuantile(phi, child)

    def _histogram_child(self, fname: str):
        """Shared le-bucket child validation for the histogram helpers."""
        child = self.parse_or()
        if not isinstance(
            child,
            (ast.VectorSelector, ast.Aggregate, ast.RangeFunc, ast.OverTimeFunc),
        ):
            raise PromQLError(
                f"{fname} requires le-labeled bucket series (a selector, a "
                "windowed rate/increase/*_over_time over them, or an "
                "aggregate grouped by (le))"
            )
        return child

    def _signed_number(self, fname: str, arg: str) -> float:
        neg = False
        if self.at("-"):
            self.next()
            neg = True
        tok = self.next()
        if tok.kind != "number":
            raise PromQLError(
                f"{fname} {arg} must be a number, got {tok.text!r}"
            )
        return -float(tok.text) if neg else float(tok.text)

    def parse_histogram_agg(self):
        """histogram_count/sum/avg(selector) over le-labeled buckets."""
        fname = self.next().text
        self.expect("(")
        child = self._histogram_child(fname)
        self.expect(")")
        return ast.HistogramAgg(fname.removeprefix("histogram_"), child)

    def parse_histogram_fraction(self):
        """histogram_fraction(lo, hi, selector) over le-labeled buckets."""
        self.next()
        self.expect("(")
        lo = self._signed_number("histogram_fraction", "lower bound")
        self.expect(",")
        hi = self._signed_number("histogram_fraction", "upper bound")
        if hi < lo:
            raise PromQLError(
                f"histogram_fraction bounds must satisfy lo <= hi, got "
                f"({lo}, {hi})"
            )
        self.expect(",")
        child = self._histogram_child("histogram_fraction")
        self.expect(")")
        return ast.HistogramFraction(lo, hi, child)

    def parse_aggregate(self):
        func = self.next().text
        by, without = self._parse_grouping(func)
        self.expect("(")
        param = None
        if func == "quantile":  # quantile(phi, v)
            neg = False
            if self.at("-"):
                self.next()
                neg = True
            tok = self.next()
            if tok.kind != "number":
                raise PromQLError(f"quantile phi must be a number, got {tok.text!r}")
            param = -float(tok.text) if neg else float(tok.text)
            if not 0.0 <= param <= 1.0:
                raise PromQLError(f"quantile phi must be in [0, 1], got {param}")
            self.expect(",")
        child = self.parse_or()
        self.expect(")")
        if not by and not without:
            by, without = self._parse_grouping(func)
        return ast.Aggregate(func, child, by, without, param)

    def parse_range_func(self):
        func = self.next().text
        self.expect("(")
        child = self.parse_or()
        self.expect(")")
        return ast.RangeFunc(func, child)

    def parse_over_time_func(self):
        func = self.next().text
        self.expect("(")
        arg = None
        if func == "quantile_over_time":  # quantile_over_time(phi, m[5m])
            neg = False
            if self.at("-"):
                self.next()
                neg = True
            tok = self.next()
            if tok.kind != "number":
                raise PromQLError(f"quantile_over_time phi must be a number, got {tok.text!r}")
            arg = -float(tok.text) if neg else float(tok.text)
            if not 0.0 <= arg <= 1.0:
                raise PromQLError(f"quantile_over_time phi must be in [0, 1], got {arg}")
            self.expect(",")
        child = self.parse_or()
        self.expect(")")
        if not isinstance(child, (ast.MatrixSelector, ast.Subquery)):
            raise PromQLError(
                f"{func} requires a range vector argument like m[5m] "
                f"or a subquery like rate(m[5m])[30m:5m]"
            )
        return ast.OverTimeFunc(func, child, arg)

    def parse_range_count_func(self):
        func = self.next().text
        self.expect("(")
        child = self.parse_or()
        self.expect(")")
        if not isinstance(child, (ast.MatrixSelector, ast.Subquery)):
            raise PromQLError(
                f"{func} requires a range vector argument like m[5m] "
                f"or a subquery like (a + b)[30m:5m]"
            )
        return ast.RangeCountFunc(func, child)

    def parse_deriv_func(self):
        self.next()
        self.expect("(")
        child = self.parse_or()
        self.expect(")")
        if not isinstance(child, (ast.MatrixSelector, ast.Subquery)):
            raise PromQLError(
                "deriv requires a range vector argument like m[5m] "
                "or a subquery like (a + b)[30m:5m]"
            )
        return ast.DerivFunc(child)

    def parse_predict_linear(self):
        self.next()
        self.expect("(")
        child = self.parse_or()
        self.expect(",")
        neg = False
        if self.at("-"):
            self.next()
            neg = True
        tok = self.next()
        if tok.kind != "number":
            raise PromQLError(
                f"predict_linear horizon must be a number, got {tok.text!r}"
            )
        horizon = -float(tok.text) if neg else float(tok.text)
        self.expect(")")
        if not isinstance(child, (ast.MatrixSelector, ast.Subquery)):
            raise PromQLError(
                "predict_linear requires a range vector argument like m[5m] "
                "or a subquery like (a + b)[30m:5m]"
            )
        return ast.PredictLinearFunc(child, horizon)

    def parse_holt_winters(self):
        name = self.next().text
        self.expect("(")
        child = self.parse_or()
        args = []
        for what in ("smoothing factor sf", "trend factor tf"):
            self.expect(",")
            tok = self.next()
            if tok.kind != "number":
                raise PromQLError(
                    f"{name} {what} must be a number, got {tok.text!r}"
                )
            args.append(float(tok.text))
        self.expect(")")
        if not isinstance(child, (ast.MatrixSelector, ast.Subquery)):
            raise PromQLError(
                f"{name} requires a range vector argument like m[5m] "
                f"or a subquery like (a + b)[30m:5m]"
            )
        sf, tf = args
        if not 0.0 < sf < 1.0:
            raise PromQLError(f"{name} sf must be in (0, 1), got {sf}")
        if not 0.0 < tf <= 1.0:
            raise PromQLError(f"{name} tf must be in (0, 1], got {tf}")
        return ast.HoltWintersFunc(child, sf, tf)

    def parse_clock_func(self):
        func = self.next().text
        self.expect("(")
        if func in ("time", "pi"):
            self.expect(")")
            return ast.ClockFunc(func, None)
        child = self.parse_or()
        self.expect(")")
        return ast.ClockFunc(func, child)

    def parse_math_func(self):
        func = self.next().text
        self.expect("(")
        child = self.parse_or()
        self.expect(")")
        return ast.MathFunc(func, child)

    def parse_sort_by_label(self):
        """sort_by_label(v, "l1"[, "l2", ...]) — at least one label."""
        func = self.next().text
        self.expect("(")
        child = self.parse_or()
        labels: list[str] = []
        while self.at(","):
            self.next()
            tok = self.next()
            if tok.kind != "string":
                raise PromQLError(
                    f"{func} labels must be string literals, got {tok.text!r}"
                )
            labels.append(_unquote(tok.text))
        self.expect(")")
        if not labels:
            raise PromQLError(f"{func} requires at least one label argument")
        return ast.SortByLabelFunc(func, child, tuple(labels))

    def parse_limit_agg(self):
        """limitk(k, v) / limit_ratio(r, v), optional `by (...)` prefix or
        postfix (same grammar as topk)."""
        func = self.next().text
        by, without = self._parse_grouping(func)
        self.expect("(")
        param = self.parse_or()
        self.expect(",")
        child = self.parse_or()
        self.expect(")")
        if not by and not without:
            by, without = self._parse_grouping(func)
        return ast.LimitAgg(func, param, child, by, without)

    def parse_calendar_func(self):
        """month(v) / month() — zero-arg defaults to Prometheus's
        vector(time()) (ast.CalendarFunc docstring)."""
        func = self.next().text
        self.expect("(")
        nxt = self.peek()
        if nxt is not None and nxt.text == ")":
            self.next()
            return ast.CalendarFunc(func, None)
        child = self.parse_or()
        self.expect(")")
        return ast.CalendarFunc(func, child)

    def parse_sort_func(self):
        func = self.next().text
        self.expect("(")
        child = self.parse_or()
        self.expect(")")
        return ast.SortFunc(func, child)

    def parse_clamp_func(self):
        func = self.next().text
        self.expect("(")
        child = self.parse_or()
        args = []
        while self.at(","):
            self.next()
            neg = False
            if self.at("-"):
                self.next()
                neg = True
            tok = self.next()
            if tok.kind != "number":
                raise PromQLError(f"clamp bounds must be numbers, got {tok.text!r}")
            args.append(-float(tok.text) if neg else float(tok.text))
        self.expect(")")
        want = 2 if func == "clamp" else 1
        if len(args) != want:
            raise PromQLError(f"{func} takes {want} bound(s), got {len(args)}")
        return ast.ClampFunc(func, child, tuple(args))

    def parse_getk(self):
        func = self.next().text
        by, without = self._parse_grouping(func)
        self.expect("(")
        k = self.parse_or()
        self.expect(",")
        child = self.parse_or()
        self.expect(")")
        if not by and not without:
            by, without = self._parse_grouping(func)
        return ast.GetK(func, k, child, by, without)

    def parse_selector(self, bare: bool = False):
        if bare:
            name = ""
        else:
            name_tok = self.next()
            if name_tok.kind != "ident" or name_tok.text in KEYWORDS:
                raise PromQLError(
                    f"expected metric name, got {name_tok.text!r}"
                )
            name = name_tok.text
        # matcher groups: ',' continues the current conjunction, 'or'
        # starts a new one ({a="x" or b="y"} — the reference's forked
        # promql-parser extension; a stream matches ANY group)
        groups: list[list[ast.Matcher]] = [[]]
        if self.at("{"):
            self.next()
            while not self.at("}"):
                label = self.next()
                if label.kind != "ident":
                    raise PromQLError(f"expected label name, got {label.text!r}")
                op_tok = self.next()
                if op_tok.text not in ("=", "!=", "=~", "!~"):
                    raise PromQLError(f"bad matcher op {op_tok.text!r}")
                val = self.next()
                if val.kind != "string":
                    raise PromQLError(f"matcher value must be a string, got {val.text!r}")
                groups[-1].append(ast.Matcher(label.text, op_tok.text, _unquote(val.text)))
                if self.at(","):
                    self.next()
                elif self.at("or"):
                    self.next()
                    if self.at("}"):
                        raise PromQLError("dangling 'or' in matcher list")
                    groups.append([])
            self.expect("}")
        if len(groups) > 1:
            matchers: tuple = ()
            or_groups = tuple(tuple(g) for g in groups)
        else:
            matchers = tuple(groups[0])
            or_groups = ()
        if bare and not matchers and not or_groups:
            raise PromQLError(
                "a bare selector {} needs at least one matcher"
            )
        range_ = None
        step = None
        if self.at("["):
            self.next()
            range_ = self._duration()
            if self.at(":"):  # subquery on a bare selector: m[30m:5m]
                self.next()
                step = self._duration()
            self.expect("]")
        at_ts, at_anchor, offset = self._parse_at_offset()
        if step is not None:
            # Prometheus: modifiers after `[R:S]` bind to the SUBQUERY
            inner_sel = ast.VectorSelector(
                name, matchers, None, None, 0, or_groups
            )
            return ast.Subquery(
                inner_sel, range_, step, at_ts, at_anchor, offset
            )
        sel = ast.VectorSelector(
            name, matchers, at_ts, at_anchor, offset, or_groups
        )
        if range_ is not None:
            return ast.MatrixSelector(sel, range_)
        return sel

    def _parse_at_offset(self):
        """Trailing `@ T` / `@ start()/end()` / `offset d` modifiers (any
        order, each at most once in practice; signed offsets per the
        reference's Offset::Neg, planner.rs:171-176)."""
        at_ts = None
        at_anchor = None
        offset = 0
        while True:
            if self.at("@"):
                self.next()
                tok = self.next()
                if tok.kind == "number":
                    at_ts = int(float(tok.text))
                elif tok.text in ("start", "end"):
                    at_anchor = tok.text
                    self.expect("(")
                    self.expect(")")
                else:
                    raise PromQLError(f"bad @ modifier {tok.text!r}")
            elif self.at("offset"):
                self.next()
                neg = False
                if self.at("-"):
                    self.next()
                    neg = True
                offset = self._duration(allow_zero=True)
                if neg:
                    offset = -offset
            else:
                break
        return at_ts, at_anchor, offset


def parse(src: str):
    """Parse a PromQL-subset query string into an AST."""
    return Parser(src).parse()
