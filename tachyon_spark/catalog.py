"""Stream catalog: the Spark-side replacement for the reference's SQLite
inverted index (tachyon_core/src/query/indexer.rs:63-270).

The catalog is *driver-side metadata* — one row per stream, tiny relative to
samples — exactly as the reference keeps it in SQLite next to the data files.
We keep it in a JSON file in the database directory; matcher resolution
(the posting-list intersection of indexer.rs:493-516) is pure driver work, and
the resolved stream_ids then drive Parquet partition pruning on the samples
table. ``df()`` materializes it as a DataFrame when a distributed join is
needed (e.g. grouped aggregation attaching label columns).
"""

from __future__ import annotations

import json
import os
import re
import uuid
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
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


@dataclass(frozen=True)
class StreamInfo:
    stream_id: str
    name: str
    labels: dict[str, str] = field(default_factory=dict)
    value_type: str = "f64"


def _matches(info: StreamInfo, matchers) -> bool:
    for m in matchers:
        val = info.labels.get(m.label)
        if m.op == "=":
            if val != m.value:
                return False
        elif m.op == "!=":
            if val is not None and val == m.value:
                return False
        elif m.op == "=~":
            if val is None or not re.search(m.value, val):
                return False
        elif m.op == "!~":
            if val is not None and re.search(m.value, val):
                return False
        else:
            raise ValueError(f"bad matcher op {m.op!r}")
    return True


class Catalog:
    def __init__(self, spark: SparkSession, db_dir: str):
        self.spark = spark
        self.path = os.path.join(db_dir, "catalog.json")

    def _load(self) -> list[StreamInfo]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [StreamInfo(**row) for row in json.load(f)]

    def _save(self, streams: list[StreamInfo]) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump([vars(s) for s in streams], f, indent=1)
        os.replace(tmp, self.path)

    def df(self):
        rows = [(s.stream_id, s.name, s.labels, s.value_type) for s in self._load()]
        return self.spark.createDataFrame(rows, CATALOG_SCHEMA)

    def all_streams(self) -> list[StreamInfo]:
        return self._load()

    def create_stream(self, name: str, labels: dict[str, str], value_type: str) -> str:
        if value_type not in VALID_TYPES:
            raise ValueError(f"value_type must be one of {sorted(VALID_TYPES)}")
        streams = self._load()
        for s in streams:
            if s.name == name and s.labels == labels:
                raise ValueError(f"stream already exists: {name}{labels}")
        stream_id = str(uuid.uuid4())
        streams.append(StreamInfo(stream_id, name, dict(labels), value_type))
        self._save(streams)
        return stream_id

    def delete_stream(self, stream_id: str) -> None:
        self._save([s for s in self._load() if s.stream_id != stream_id])

    def resolve(self, name: str, matchers=()) -> list[StreamInfo]:
        """Streams matching metric name + all matchers, ordered by stream_id."""
        hits = [s for s in self._load() if s.name == name and _matches(s, matchers)]
        return sorted(hits, key=lambda s: s.stream_id)
