"""Stream catalog: the Spark-side replacement for the reference's SQLite
inverted index (tachyon_core/src/query/indexer.rs:63-270).

High-cardinality design (the 100 TB posture). The catalog is a PARQUET table
of one row per stream, not a single re-read/re-written JSON blob:

  db_dir/catalog/part-<seq>-<uuid>.parquet

* Writes are log-structured: each ``create_streams`` call appends ONE
  fragment file (written driver-side with pyarrow — no Spark job for a
  metadata op), so bulk-registering 100k streams is one file write.
  Fragments auto-compact past a threshold; deletes compact immediately so
  the on-disk table never carries tombstones.
* Driver-side resolution is cached and name-indexed: the table is loaded
  once per on-disk state (keyed by fragment names+sizes+mtimes) into a
  ``name -> [StreamInfo]`` dict, so a matcher only loops over ITS metric's
  streams, not the whole catalog.
* ``resolve_df`` expresses the same matcher semantics as Spark filters over
  the catalog parquet — the fully distributed path used by the query builder
  past its IN-list threshold, where the selector becomes a broadcast
  semi-join (no giant ``isin`` literal in the plan) and the driver never
  materializes the id list into the plan.
"""

from __future__ import annotations

import os
import re
import uuid
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tachyon_spark.types import VALID_TYPES

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("value_type", T.StringType(), False),
    ]
)

_ARROW_SCHEMA = pa.schema(
    [
        pa.field("stream_id", pa.string(), nullable=False),
        pa.field("name", pa.string(), nullable=False),
        pa.field("labels", pa.map_(pa.string(), pa.string()), nullable=False),
        pa.field("value_type", pa.string(), nullable=False),
    ]
)

# Past this many fragment files, loads compact the log back to one file.
COMPACT_FRAGMENTS = 64


@dataclass(frozen=True)
class StreamInfo:
    stream_id: str
    name: str
    labels: dict[str, str] = field(default_factory=dict)
    value_type: str = "f64"


def check_matcher_regexes(matchers) -> None:
    """Regex matchers run on BOTH engines: Python ``re.fullmatch``
    driver-side (``resolve``) and Java regex via anchored ``rlike`` in the
    distributed semi-join path (``resolve_df``); both are FULLY ANCHORED
    (Prometheus wraps every matcher regex in ``^(?:...)$`` —
    prometheus/common labels.NewMatcher — so ``env=~"prod"`` matches only
    exactly "prod", never "production").
    The supported subset is their intersection —
    literals, character classes, alternation, anchors, greedy/lazy
    quantifiers, plain/non-capturing groups, inline ``(?i)`` flags, and
    lookaround. Python-only constructs would silently match different
    streams in the two paths, so they are rejected up front."""
    for m in matchers:
        if m.op not in ("=~", "!~"):
            continue
        for bad, why in (("(?P", "named groups"), ("(?(", "conditional groups")):
            if bad in m.value:
                raise ValueError(
                    f"regex matcher {m.value!r} uses Python-only {why}; "
                    "use constructs portable to Java regex (the distributed "
                    "resolution path) — see Catalog docstring"
                )


def _matches(info: StreamInfo, matchers) -> bool:
    for m in matchers:
        # __name__ matches the metric name (Prometheus reserved label).
        # A MISSING label is the empty string (Prometheus
        # labels.Labels.Get, model/labels/labels.go) — so `{dc=""}`
        # matches series WITHOUT dc, `{dc!="x"}` matches missing
        # ("" != "x"), `=~".*"` matches missing, and `!~".*"` excludes
        # it (r14 conformance fix; the old None-propagation agreed with
        # Prometheus only for non-empty-matching patterns).
        val = (
            info.name
            if m.label == "__name__"
            else info.labels.get(m.label, "")
        )
        if m.op == "=":
            if val != m.value:
                return False
        elif m.op == "!=":
            if val == m.value:
                return False
        elif m.op == "=~":
            # fullmatch == Prometheus's ^(?:...)$ anchoring
            if not re.fullmatch(m.value, val):
                return False
        elif m.op == "!~":
            if re.fullmatch(m.value, val):
                return False
        else:
            raise ValueError(f"bad matcher op {m.op!r}")
    return True


def _matcher_matches_empty(m) -> bool:
    """Would this matcher accept the empty string (= a missing label)?
    Prometheus's promql parser requirement rides on this: a selector
    with no metric name must contain at least one matcher that does NOT
    match "" — otherwise it selects essentially every series."""
    if m.op == "=":
        return m.value == ""
    if m.op == "!=":
        return m.value != ""
    if m.op == "=~":
        return re.fullmatch(m.value, "") is not None
    if m.op == "!~":
        return re.fullmatch(m.value, "") is None
    raise ValueError(f"bad matcher op {m.op!r}")


def check_nonempty_selector(name: str, groups) -> None:
    """Prometheus conformance (r14, promql/parser ast.go
    VectorSelector checks): a nameless selector where EVERY matcher of
    some conjunction matches the empty string would select every
    series in the database — reject it up front, like Prometheus's
    'vector selector must contain at least one non-empty matcher'.
    Doubles as the accidental-full-catalog-scan guard at 10^7 series."""
    if name:
        return
    for g in groups:
        if not g or all(_matcher_matches_empty(m) for m in g):
            raise ValueError(
                "vector selector must contain at least one non-empty "
                "matcher (a bare {dc=~\".*\"}-style selector matches "
                "every series)"
            )


def matcher_predicate(matchers) -> Column:
    """The SAME matcher semantics as ``_matches``, as a Spark Column over the
    catalog schema — used by the distributed resolution path. A MISSING
    label is the empty string (Prometheus labels.Labels.Get — coalesce
    to "" before comparing, r14), so both engines agree on the
    empty-matcher family (``dc=""``, ``=~".*"``, ``!~".*"``);
    ``=~``/``!~`` are FULLY ANCHORED (``^(?:...)$`` around the pattern,
    like Prometheus's labels.NewMatcher) so the driver-side
    ``re.fullmatch`` and this ``rlike`` agree."""
    pred = F.lit(True)
    for m in matchers:
        lab = (
            F.col("name")
            if m.label == "__name__"
            else F.coalesce(
                F.col("labels").getItem(m.label), F.lit("")
            )
        )
        if m.op == "=":
            cond = lab == m.value
        elif m.op == "!=":
            cond = lab != m.value
        elif m.op == "=~":
            cond = lab.rlike("^(?:" + m.value + ")$")
        elif m.op == "!~":
            cond = ~lab.rlike("^(?:" + m.value + ")$")
        else:
            raise ValueError(f"bad matcher op {m.op!r}")
        pred = pred & cond
    return pred


class Catalog:
    def __init__(self, spark: SparkSession, db_dir: str):
        self.spark = spark
        self.dir = os.path.join(db_dir, "catalog")
        self._legacy_json = os.path.join(db_dir, "catalog.json")
        # cache: (state key) -> (list[StreamInfo], name index)
        self._cache_key: tuple | None = None
        self._cache: list[StreamInfo] = []
        self._by_name: dict[str, list[StreamInfo]] = {}
        self._migrate_legacy()

    # ------------------------------------------------------------------ io
    def _migrate_legacy(self) -> None:
        """One-time upgrade of a round-1/2 JSON catalog to the parquet log."""
        if not os.path.exists(self._legacy_json) or os.path.isdir(self.dir):
            return
        import json

        with open(self._legacy_json) as f:
            rows = [StreamInfo(**row) for row in json.load(f)]
        self._write_fragment(rows)
        os.replace(self._legacy_json, self._legacy_json + ".migrated")

    def _fragments(self) -> list[str]:
        if not os.path.isdir(self.dir):
            return []
        return sorted(
            f for f in os.listdir(self.dir) if f.endswith(".parquet")
        )

    def _state_key(self) -> tuple:
        out = []
        for f in self._fragments():
            st = os.stat(os.path.join(self.dir, f))
            out.append((f, st.st_size, st.st_mtime_ns))
        return tuple(out)

    def _write_fragment(self, rows: list[StreamInfo]) -> None:
        os.makedirs(self.dir, exist_ok=True)
        seq = len(self._fragments())
        name = f"part-{seq:06d}-{uuid.uuid4().hex[:8]}.parquet"
        tbl = pa.Table.from_pylist(
            [
                {
                    "stream_id": s.stream_id,
                    "name": s.name,
                    "labels": list(s.labels.items()),
                    "value_type": s.value_type,
                }
                for s in rows
            ],
            schema=_ARROW_SCHEMA,
        )
        tmp = os.path.join(self.dir, name + ".tmp")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(self.dir, name))

    def _rewrite(self, rows: list[StreamInfo]) -> None:
        """Compact the log to a single fragment holding exactly ``rows``."""
        old = self._fragments()
        self._write_fragment(rows)
        for f in old:
            os.remove(os.path.join(self.dir, f))

    def _load(self) -> list[StreamInfo]:
        key = self._state_key()
        if key == self._cache_key:
            return self._cache
        rows: list[StreamInfo] = []
        for f in self._fragments():
            tbl = pq.read_table(os.path.join(self.dir, f))
            for rec in tbl.to_pylist():
                rows.append(
                    StreamInfo(
                        rec["stream_id"],
                        rec["name"],
                        dict(rec["labels"] or []),
                        rec["value_type"],
                    )
                )
        if len(key) > COMPACT_FRAGMENTS:
            self._rewrite(rows)
            key = self._state_key()
        # publish order matters: concurrent plan builders (the pooled
        # query_range builds) read without a lock, so the data must be
        # visible BEFORE the key that declares it fresh (ADVICE r15 #2 —
        # key-first let a racing reader resolve against a stale stream
        # list). CPython attribute stores are atomic; key-last makes the
        # worst race a harmless reload.
        by_name: dict = {}
        for s in rows:
            by_name.setdefault(s.name, []).append(s)
        self._cache = rows
        self._by_name = by_name
        self._cache_key = key
        return rows

    # ----------------------------------------------------------------- api
    def df(self) -> DataFrame:
        """The catalog as a DataFrame read straight from parquet — the
        distributed side of resolution and label attachment."""
        frags = self._fragments()
        if not frags:
            return self.spark.createDataFrame([], CATALOG_SCHEMA)
        return self.spark.read.schema(CATALOG_SCHEMA).parquet(self.dir)

    def all_streams(self) -> list[StreamInfo]:
        return self._load()

    def create_stream(self, name: str, labels: dict[str, str], value_type: str) -> str:
        return self.create_streams([(name, labels, value_type)])[0]

    def create_streams(
        self, specs: list[tuple[str, dict[str, str], str]]
    ) -> list[str]:
        """Bulk stream registration: one parquet fragment for the whole
        batch. 100k streams land in a single sub-second driver-side write."""
        self._load()
        seen = {(s.name, tuple(sorted(s.labels.items()))) for s in self._cache}
        new_rows: list[StreamInfo] = []
        ids: list[str] = []
        for name, labels, value_type in specs:
            if value_type not in VALID_TYPES:
                raise ValueError(f"value_type must be one of {sorted(VALID_TYPES)}")
            dkey = (name, tuple(sorted(labels.items())))
            if dkey in seen:
                raise ValueError(f"stream already exists: {name}{labels}")
            seen.add(dkey)
            sid = str(uuid.uuid4())
            ids.append(sid)
            new_rows.append(StreamInfo(sid, name, dict(labels), value_type))
        self._write_fragment(new_rows)
        return ids

    def register_streams_df(self, reg: DataFrame) -> None:
        """Fully DISTRIBUTED bulk registration — the million-series path
        (recording rules whose group-by explodes into huge stream families).
        ``reg`` must carry the catalog schema columns (stream_id, name,
        labels, value_type); rows never visit the driver: the duplicate
        check is a join against the catalog parquet and the write is a
        Spark append of new fragment files into the log directory.

        Raises ValueError if any (name, labels) combination already exists
        (same contract as ``create_streams``). Callers are responsible for
        ``reg`` itself being duplicate-free (e.g. built from a distinct)."""

        def canon(df: DataFrame) -> DataFrame:
            entries = F.array_sort(F.map_entries("labels"))
            kv = F.transform(
                entries,
                lambda e: F.concat(
                    e["key"],
                    F.lit("\x01"),
                    F.coalesce(e["value"], F.lit("\x03null\x03")),
                ),
            )
            return df.withColumn(
                "__canon",
                F.concat(F.col("name"), F.lit("\x00"), F.array_join(kv, "\x02")),
            )

        dup = (
            canon(reg)
            .join(canon(self.df()).select("__canon"), "__canon", "left_semi")
            .select("name", "labels")
            .first()
        )
        if dup is not None:
            raise ValueError(
                f"stream already exists: {dup['name']}{dict(dup['labels'])}"
            )
        reg.select("stream_id", "name", "labels", "value_type").write.mode(
            "append"
        ).parquet(self.dir)
        # Spark names its files part-<task>-<uuid>...parquet — same suffix
        # the fragment listing keys on, so loads/compaction pick them up;
        # the _SUCCESS marker fails the .parquet filter and is ignored.

    def delete_stream(self, stream_id: str) -> None:
        self.delete_streams([stream_id])

    def delete_streams(self, stream_ids) -> None:
        """Batch delete: ONE compaction rewrite for the whole id set (a
        per-id loop would rewrite the full catalog O(n) times)."""
        drop = set(stream_ids)
        rows = [s for s in self._load() if s.stream_id not in drop]
        self._rewrite(rows)

    def resolve(self, name: str, matchers=(), or_groups=()) -> list[StreamInfo]:
        """Streams matching metric name + all matchers, ordered by stream_id.
        `or_groups` is the forked-parser `{a="x" or b="y"}` disjunction
        (ast.VectorSelector.or_groups): a stream matches if ANY group's
        conjunction matches.

        Driver path: the name index narrows the loop to one metric's streams
        (the inverted-index role of indexer.rs:493-516). For plans that must
        not carry the id list at all, see ``resolve_df``."""
        groups = or_groups or (tuple(matchers),)
        for g in groups:
            check_matcher_regexes(g)
        check_nonempty_selector(name, groups)
        self._load()
        # empty name = bare matcher selector {__name__=~"..."}: the pool
        # is every stream; matchers (usually on __name__) narrow it
        pool = (
            self._by_name.get(name, ())
            if name
            else [s for ss in self._by_name.values() for s in ss]
        )
        hits = [s for s in pool if any(_matches(s, g) for g in groups)]
        return sorted(hits, key=lambda s: s.stream_id)

    def resolve_df(self, name: str, matchers=(), or_groups=()) -> DataFrame:
        """Distributed resolution: catalog parquet scan -> name + matcher
        filter (OR of the per-group conjunctions when `or_groups` is set).
        The builder semi-joins samples against this frame when the match
        cardinality is too high for an IN-list literal."""
        groups = or_groups or (tuple(matchers),)
        # regex validation FIRST, matching resolve(): a nameless selector
        # with a bad regex must raise the documented ValueError, not an
        # re.error out of check_nonempty_selector's empty-matcher probe
        # (ADVICE r14 #2)
        for g in groups:
            check_matcher_regexes(g)
        check_nonempty_selector(name, groups)
        pred = F.lit(False)
        for g in groups:
            pred = pred | matcher_predicate(g)
        name_pred = (F.col("name") == name) if name else F.lit(True)
        return self.df().where(name_pred & pred)
