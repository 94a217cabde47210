"""AST for the supported PromQL subset.

Matches the surface the reference's planner accepts
(tachyon_core/src/query/planner.rs:234-261): vector selectors with matchers,
@/offset modifiers, number literals, + - * / %, comparison filters,
sum/count/avg/min/max/topk/bottomk, parens — plus our extensions: `by (label)`
grouping on aggregates, != / =~ / !~ matchers, ^ / atan2, __name__ matchers,
bare {matcher} selectors, and the windowed-function/subquery surface the
class docstrings below describe.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Matcher:
    label: str
    op: str  # '=', '!=', '=~', '!~'
    value: str


@dataclass(frozen=True)
class VectorSelector:
    name: str
    matchers: tuple[Matcher, ...] = ()
    at_ts: int | None = None  # `@ <ts>` pins start (planner.rs:162-180)
    at_anchor: str | None = None  # 'start' | 'end' for @ start()/@ end()
    offset: int = 0  # `offset <n>` shifts start (negative allowed)
    # `{a="x" or b="y"}` — the reference's forked promql-parser extends
    # matchers with OR groups (every planner.rs test uses them). When
    # non-empty this is the full disjunction-of-conjunctions and
    # `matchers` is empty; a stream matches if ANY group matches.
    or_groups: tuple[tuple[Matcher, ...], ...] = ()


@dataclass(frozen=True)
class MatrixSelector:
    """`m{...}[RANGE]` — a range vector (extension: the reference planner
    REJECTS matrix selectors, planner.rs:208-216, so parity did not require
    this). Only valid as the direct argument of a range function
    (rate/increase/delta, the *_over_time family, resets/changes,
    irate/idelta, deriv), which then evaluate per tumbling window of
    `range_` instead of once over the whole [start, end]."""

    selector: VectorSelector
    range_: int  # window width in native ts units (ns for wall-clock data)


@dataclass(frozen=True)
class Subquery:
    """`expr[RANGE:STEP]` — a subquery range vector (extension; the
    reference rejects subqueries, query/planner.rs:125-133). The inner
    expression is evaluated on a STEP-wide tumbling grid, and the enclosing
    *_over_time function aggregates the grid rows per RANGE-wide window.
    Inner forms: a plain selector (last sample per step; divergence from
    PromQL's 5m lookback documented) or a windowed range function whose
    window width must equal STEP."""

    child: object  # VectorSelector | RangeFunc | OverTimeFunc | ...
    range_: int
    step: int
    # `expr[R:S] @ T` / `offset o` pin/shift the SUBQUERY's evaluation
    # clock (Prometheus: modifiers after the brackets bind to the
    # subquery, not the inner expression). Grid mode evaluates them;
    # raw-sample mode rejects with a clear error.
    at_ts: int | None = None
    at_anchor: str | None = None  # 'start' | 'end'
    offset: int = 0


@dataclass(frozen=True)
class NumberLiteral:
    value: float  # always f64 (planner.rs:135-144)


@dataclass(frozen=True)
class VectorMatching:
    """`on()/ignoring()` + `group_left/group_right` modifiers on a binary op
    (extension: the reference ignores labels in binary ops entirely —
    streams are concatenated at scan, vector_select.rs:78-105 — so `a / b`
    there never aligns series; here matching routes into the grouped
    interpolating join).

    on=True: match on exactly `labels`; on=False: match on all labels
    EXCEPT `labels` (ignoring). group: None = one-to-one, 'left'/'right' =
    many-to-one with the many side named; `include` = extra labels copied
    from the "one" side onto the result (group_left(include...))."""

    on: bool
    labels: tuple[str, ...] = ()
    group: str | None = None  # None | 'left' | 'right'
    include: tuple[str, ...] = ()


@dataclass(frozen=True)
class BinaryOp:
    op: str  # + - * / % == != > < >= <=
    lhs: object
    rhs: object
    matching: VectorMatching | None = None  # on()/ignoring() vector matching
    # `v > bool 5`: comparison returns 0/1 values instead of filtering
    # (extension; PromQL bool modifier — the reference has no bool, its
    # comparisons always filter)
    bool_mode: bool = False


@dataclass(frozen=True)
class Aggregate:
    func: str  # sum count avg min max stddev stdvar quantile
    child: object
    by: tuple[str, ...] = ()  # grouping labels (extension; reference ignores `by`)
    # `without (l1,..)`: group by every label EXCEPT these (extension).
    # Output carries one canonical `series` string column ("k=v,k=v").
    without: tuple[str, ...] = ()
    # quantile(phi, v)'s phi (extension; exact interpolated percentile —
    # swap for approx_percentile's mergeable sketch at extreme scale)
    param: float | None = None


@dataclass(frozen=True)
class GetK:
    func: str  # topk | bottomk
    k: object  # scalar expression
    child: object
    by: tuple[str, ...] = ()  # `topk by (label) (k, v)`: per-group k (extension)
    # `topk without (label) (k, v)`: per-remaining-label-group k; output
    # carries the canonical `series` key column (same as Aggregate.without)
    without: tuple[str, ...] = ()


@dataclass(frozen=True)
class RangeFunc:
    """rate/increase/delta over the query's [start, end] window (extension —
    the reference rejects all function calls, planner.rs:218-222, because it
    has no matrix selectors). Raw-sample semantics: computed from the first
    and last samples in range; no counter-reset handling."""

    func: str  # rate | increase | delta
    child: object


@dataclass(frozen=True)
class RangeCountFunc:
    """Consecutive-sample functions over a range vector (extension; the
    reference rejects all function calls): `resets`/`changes` count value
    decreases / value changes between consecutive samples per (series,
    window); `irate`/`idelta` use only the LAST pair of samples in each
    window (instant rate / instant delta, PromQL semantics)."""

    func: str  # resets | changes | irate | idelta
    child: object  # MatrixSelector


@dataclass(frozen=True)
class DerivFunc:
    """`deriv(m[5m])`: per-series per-window least-squares slope of value
    over ts (PromQL simple linear regression; extension here). Windows
    with < 2 distinct points yield nothing."""

    child: object  # MatrixSelector


@dataclass(frozen=True)
class OverTimeFunc:
    """`avg_over_time(m[5m])` etc. — per-tumbling-window aggregation over a
    range vector (extension; requires a MatrixSelector child, like PromQL).
    One output row per non-empty window, ts = window start."""

    func: str  # {avg,sum,min,max,count,last,quantile}_over_time
    child: object  # MatrixSelector
    arg: float | None = None  # quantile_over_time's phi (0..1)


@dataclass(frozen=True)
class MathFunc:
    """Elementwise math over a vector (extension; the reference rejects all
    function calls, planner.rs:218-222). abs preserves the input value type;
    the rest compute in f64."""

    func: str  # abs ceil floor sqrt exp ln
    child: object


@dataclass(frozen=True)
class CalendarFunc:
    """minute/hour/day_of_week/day_of_month/day_of_year/days_in_month/
    month/year over a vector (extension; Prometheus calendar functions,
    prometheus/promql functions.go funcDaysInMonth..funcYear). Sample
    VALUES are interpreted as unix SECONDS in UTC — Prometheus's contract
    — even though this engine's ts column is native unitless units. The
    zero-arg form (`month()`) follows Prometheus's `v = vector(time())`
    default, converting time()'s native value to seconds under the same
    nanosecond-wall-clock assumption the duration suffixes use
    (parser.DURATION_UNITS)."""

    func: str  # minute hour day_of_week day_of_month day_of_year days_in_month month year
    child: object | None  # None = Prometheus's vector(time()) default


@dataclass(frozen=True)
class LabelFunc:
    """label_replace(v, dst, replacement, src, regex) / label_join(v, dst,
    sep, src...) — per-series label-set rewrites (extension; absent from
    the reference). Labels live driver-side on the plan's matched-stream
    info (Plan.streams), so these are pure metadata transformations: the
    distributed plan is untouched and downstream grouping/matching sees the
    rewritten labels."""

    func: str  # label_replace | label_join
    child: object
    args: tuple[str, ...]


@dataclass(frozen=True)
class HistogramQuantile:
    """histogram_quantile(phi, buckets) over cumulative le-labeled bucket
    series (extension; absent from the reference). Per timestamp (and per
    non-le label group), the Prometheus bucket interpolation: find the first
    bucket whose cumulative count reaches phi*total and linearly interpolate
    within its [prev_le, le] bounds; the +Inf bucket returns the highest
    finite le; the first bucket interpolates from 0."""

    phi: float
    child: object  # VectorSelector of bucket series


@dataclass(frozen=True)
class HistogramAgg:
    """histogram_count/sum/avg(buckets) — Prometheus 3.x classic-histogram
    helpers over cumulative le-labeled bucket series (extension; absent
    from the reference). count is the +Inf bucket's cumulative count
    (exact); sum is the midpoint estimate (+Inf bucket represented by the
    highest finite le, the same clamp histogram_quantile uses); avg is
    sum / count."""

    op: str  # "count" | "sum" | "avg"
    child: object


@dataclass(frozen=True)
class HistogramFraction:
    """histogram_fraction(lo, hi, buckets): estimated fraction of
    observations in [lo, hi] — interpolated cumulative count at hi minus
    at lo, over the total (extension; Prometheus 3.x helper re-expressed
    for classic cumulative buckets)."""

    lo: float
    hi: float
    child: object


@dataclass(frozen=True)
class AbsentFunc:
    """absent(v): one row with value 1 when the vector has NO samples in
    range, empty otherwise (extension; PromQL absent() adapted to the
    range-query model). The alerting primitive for dead streams."""

    child: object


@dataclass(frozen=True)
class SortFunc:
    """sort()/sort_desc(): vector reordered by value (extension)."""

    func: str  # sort | sort_desc
    child: object


@dataclass(frozen=True)
class SortByLabelFunc:
    """sort_by_label(v, "l1", ...) / sort_by_label_desc — vector reordered
    by the given label values (extension; Prometheus experimental
    functions, promql functions.go funcSortByLabel). Labels resolve
    driver-side from Plan.streams like label_replace; ties break on ts."""

    func: str  # sort_by_label | sort_by_label_desc
    child: object
    labels: tuple[str, ...]


@dataclass(frozen=True)
class LimitAgg:
    """limitk(k, v) / limit_ratio(r, v) — per-group series sampling
    (extension; Prometheus experimental aggregators, promql aggregations).
    Deterministic where Prometheus is arbitrary: limitk keeps the k
    smallest stream_ids per group; limit_ratio keeps series whose
    md5-fingerprint unit-interval hash u < r (or the exact complement
    u >= 1+r for negative r, so limit_ratio(r) and limit_ratio(-(1-r))
    partition the series set — the Prometheus complement contract)."""

    func: str  # limitk | limit_ratio
    param: object  # scalar expr: k (limitk) or ratio in [-1, 1]
    child: object
    by: tuple[str, ...] = ()
    without: tuple[str, ...] = ()  # group by every label EXCEPT these


@dataclass(frozen=True)
class ClampFunc:
    """clamp/clamp_min/clamp_max with literal bounds (extension).
    Results are f64 (PromQL semantics: all function results are floats)."""

    func: str
    child: object
    args: tuple[float, ...]


ARITH_OPS = frozenset({"+", "-", "*", "/", "%", "^", "atan2"})
CMP_OPS = frozenset({"==", "!=", ">", "<", ">=", "<="})
SET_OPS = frozenset({"and", "or", "unless"})  # extension (ts-key matching)
AGG_FUNCS = frozenset(
    {"sum", "count", "avg", "min", "max", "stddev", "stdvar", "quantile", "group"}
)
GETK_FUNCS = frozenset({"topk", "bottomk"})
RANGE_FUNCS = frozenset({"rate", "increase", "delta"})
RANGE_COUNT_FUNCS = frozenset({"resets", "changes", "irate", "idelta"})  # require m[RANGE]
DERIV_FUNCS = frozenset({"deriv"})  # least-squares slope; requires m[RANGE]
PREDICT_FUNCS = frozenset({"predict_linear"})  # predict_linear(m[RANGE], t)
# holt_winters was renamed double_exponential_smoothing in Prometheus 3;
# both names are accepted (prometheus/promql functions.go funcHoltWinters)
HOLT_FUNCS = frozenset({"holt_winters", "double_exponential_smoothing"})
# timestamp(v)/scalar(v)/vector(s)/time() — evaluation-clock functions.
# Timestamps in this engine are UNITLESS native units (SURVEY §1.2), so
# these return/consume native ts values, not seconds (documented
# divergence from Prometheus's seconds).
CLOCK_FUNCS = frozenset({"timestamp", "scalar", "vector", "time", "pi"})
OVER_TIME_FUNCS = frozenset(
    {
        "avg_over_time",
        "sum_over_time",
        "min_over_time",
        "max_over_time",
        "count_over_time",
        "last_over_time",
        "quantile_over_time",
        "stddev_over_time",
        "stdvar_over_time",
        "present_over_time",
        "mad_over_time",
        # Prometheus 3.x experimental: timestamp of the newest/max/min
        # sample per window (native ts units as f64, like timestamp())
        "ts_of_last_over_time",
        "ts_of_max_over_time",
        "ts_of_min_over_time",
    }
)
# calendar fields of sample values interpreted as unix seconds (UTC);
# see CalendarFunc. All return f64 per PromQL function semantics.
CALENDAR_FUNCS = frozenset(
    {
        "minute", "hour", "day_of_week", "day_of_month", "day_of_year",
        "days_in_month", "month", "year",
    }
)
MATH_FUNCS = frozenset(
    {
        "abs", "ceil", "floor", "sqrt", "exp", "ln", "sgn",
        "log2", "log10", "sin", "cos", "tan", "asin", "acos", "atan",
        "sinh", "cosh", "tanh", "asinh", "acosh", "atanh",
        "deg", "rad",
    }
)


@dataclass(frozen=True)
class PredictLinearFunc:
    """predict_linear(m[RANGE], t): least-squares extrapolation of each
    (series, window)'s samples to horizon t past the window end —
    value = intercept + slope * (window_start + range + t), per-native-ts
    units (Prometheus's simple linear regression, prometheus/promql
    functions.go funcPredictLinear, applied to raw tumbling windows)."""

    child: object  # MatrixSelector
    horizon: float


@dataclass(frozen=True)
class ClockFunc:
    """timestamp(v) (sample value := its own ts), scalar(v) (1-row vector
    -> scalar, NaN otherwise), vector(s) (scalar -> vector at the
    evaluation clock), time() (the evaluation clock itself)."""

    func: str
    child: object | None = None


@dataclass(frozen=True)
class HoltWintersFunc:
    """holt_winters(m[RANGE], sf, tf): Holt's linear (double exponential)
    smoothing per (series, window) — the final smoothed value after a
    sequential fold over the window's samples in (ts, value) order, with
    smoothing factor sf and trend factor tf (prometheus/promql
    functions.go funcHoltWinters: s1 init = v0, b init = v1-v0, then
    b_i = tf*(s_{i-1} - s_{i-2}) + (1-tf)*b_{i-1};
    s_i = sf*v_i + (1-sf)*(s_{i-1} + b_i)). Windows with < 2 samples drop.
    Requires 0 < sf < 1 and 0 < tf <= 1."""

    child: object  # MatrixSelector
    sf: float
    tf: float


@dataclass(frozen=True)
class RoundFunc:
    """round(v[, to_nearest]): nearest multiple of to_nearest (default 1),
    ties away from zero upward per PromQL (floor(v/t + 0.5) * t)."""

    child: object
    to_nearest: float = 1.0


ROUND_FUNCS = frozenset({"round"})
ABSENT_FUNCS = frozenset({"absent"})
ABSENT_OVER_FUNCS = frozenset({"absent_over_time"})  # requires m[RANGE]


@dataclass(frozen=True)
class AbsentOverTime:
    """absent_over_time(m[RANGE]): 1 for each window/step in which the
    range vector has NO samples, nothing otherwise (prometheus/promql
    functions.go funcAbsentOverTime) — the windowed dead-stream alert."""

    child: object  # MatrixSelector
COUNT_VALUES_FUNCS = frozenset({"count_values"})


@dataclass(frozen=True)
class CountValues:
    """count_values("label", v): one output row per distinct sample value
    with its occurrence count, value rendered into the named label column
    (extension; PromQL parity). A plain groupBy on the value — one shuffle,
    map-side partials."""

    label: str
    child: object
    # by/without grouping (PromQL: count_values is an aggregation operator;
    # `count_values ("v", m) by (job)` counts per (job, value) pair).
    by: tuple[str, ...] = ()
    without: tuple[str, ...] = ()
HISTOGRAM_FUNCS = frozenset({"histogram_quantile"})
HISTOGRAM_AGG_FUNCS = frozenset(
    {"histogram_count", "histogram_sum", "histogram_avg"}
)
HISTOGRAM_FRACTION_FUNCS = frozenset({"histogram_fraction"})
LABEL_FUNCS = frozenset({"label_replace", "label_join"})
SORT_FUNCS = frozenset({"sort", "sort_desc"})
SORT_BY_LABEL_FUNCS = frozenset({"sort_by_label", "sort_by_label_desc"})
LIMIT_FUNCS = frozenset({"limitk", "limit_ratio"})
CLAMP_FUNCS = frozenset({"clamp", "clamp_min", "clamp_max"})
