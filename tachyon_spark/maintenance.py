"""Table maintenance: compaction, retention, and targeted deletion.

The reference has none of these (files are immutable once rotated and
there is no retention, SURVEY §1.4); all are required for a real
append-heavy deployment: many small Inserter flushes produce many small
parquet files (degrading scan parallelism bookkeeping), time-series data
ages out, and operational cleanups (a bad scrape, a misconfigured
relabel, GDPR-style removals) need Prometheus's delete_series.

Compaction rewrites one samples partition's files into few large, sorted
files (write-to-temp, then swap). Retention drops whole `ts_bucket`
partition directories below a cutoff — metadata-only, no rewrite — and is
therefore only offered on time-bucketed layouts; on unbucketed layouts
deleting mid-file rows would require rewriting every file of every stream.
`delete_samples` (Prometheus /api/v1/admin/tsdb/delete_series semantics:
matchers + optional time range) rewrites ONLY the partitions that can
hold matching rows — stream-hash partitions prune by the matched ids,
ts_bucket subdirectories by the range — and skips any partition a cheap
match-count probe shows untouched.

All work on either samples layout: legacy `stream_id=<uuid>` dirs or the
high-cardinality `stream_bucket=<k>` hash dirs (connection.py), where the
unit of compaction is the bucket (all of its streams, re-clustered by
(stream_id, ts) so row-group stats keep pruning per-stream reads).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

_PART_PREFIXES = ("stream_id=", "stream_bucket=")


def _partition_dir_for_stream(conn, stream_id: str) -> str:
    if conn.stream_buckets:
        from tachyon_spark.connection import stream_bucket_py

        b = stream_bucket_py(stream_id, conn.stream_buckets)
        return os.path.join(conn.samples_path, f"stream_bucket={b}")
    return os.path.join(conn.samples_path, f"stream_id={stream_id}")


def _top_level_partitions(conn) -> list[str]:
    if not os.path.isdir(conn.samples_path):
        return []
    return sorted(
        d
        for d in os.listdir(conn.samples_path)
        if d.startswith(_PART_PREFIXES)
        and os.path.isdir(os.path.join(conn.samples_path, d))
    )


def compact_partition(conn, part_dir: str, target_files: int = 1) -> int:
    """Rewrite one top-level samples partition into `target_files` sorted
    files (per ts_bucket subdirectory when time-bucketed). Returns the
    number of parquet files before the rewrite."""
    conn.uncache_samples()
    if not os.path.isdir(part_dir):
        return 0
    n_before = sum(
        len([f for f in fs if f.endswith(".parquet")]) for _, _, fs in os.walk(part_dir)
    )

    sub_dirs = (
        [d for d in os.listdir(part_dir) if d.startswith("ts_bucket=")]
        if conn.time_bucket
        else [None]
    )
    sort_cols = ["stream_id", "ts"] if conn.stream_buckets else ["ts"]
    # Stage the rewrite OUTSIDE the samples tree: a temp dir inside it would
    # be picked up by concurrent partition discovery as a bogus partition
    # (and a crash mid-swap could leave the partition's data invisible).
    stage_root = os.path.join(conn.db_dir, "_compact_tmp")
    base = os.path.basename(part_dir)
    for i, sub in enumerate(sub_dirs):
        src = part_dir if sub is None else os.path.join(part_dir, sub)
        df = conn.spark.read.parquet(src)
        tmp = os.path.join(stage_root, f"{base}.{i}")
        shutil.rmtree(tmp, ignore_errors=True)
        (
            df.repartition(target_files)
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # Swap (shared _swap_in): old-aside -> new-in -> delete-old.
        # Near-atomic: a reader racing the swap sees either the old or
        # the new files, except in the brief window between the two
        # renames where the partition dir is absent — a concurrent
        # listing in that window should retry (or compact with readers
        # quiesced). A crash leaves `old` on disk for manual recovery
        # rather than losing the data.
        _swap_in(src, tmp, stage_root, f"{base}.{i}")
    shutil.rmtree(stage_root, ignore_errors=True)
    return n_before


def compact_stream(conn, stream_id: str, target_files: int = 1) -> int:
    """Compact the partition holding `stream_id` (the whole hash bucket on
    bucketed layouts). Returns files before."""
    return compact_partition(conn, _partition_dir_for_stream(conn, stream_id), target_files)


def compact_all(conn, target_files: int = 1) -> dict[str, int]:
    """Compact every samples partition; returns {partition_dir: files_before}."""
    return {
        d: compact_partition(conn, os.path.join(conn.samples_path, d), target_files)
        for d in _top_level_partitions(conn)
    }


def _swap_in(src: str, tmp: str, stage_root: str, tag: str) -> None:
    """The compact_partition swap, shared: old-aside -> new-in ->
    delete-old (crash leaves `old` on disk for manual recovery)."""
    old = os.path.join(stage_root, f"{tag}.old")
    shutil.rmtree(old, ignore_errors=True)
    marker = os.path.join(tmp, "_SUCCESS")
    if os.path.exists(marker):
        os.remove(marker)
    os.replace(src, old)
    os.replace(tmp, src)
    shutil.rmtree(old)


def delete_samples(
    conn, selector: str, start: int | None = None, end: int | None = None
) -> int:
    """Delete samples of the streams matching `selector` within
    [start, end] (either side open when None) — Prometheus's
    delete_series admin operation, as a partition-pruned rewrite:

      1. the selector resolves to stream ids at METADATA altitude;
      2. only partitions that can hold those ids rewrite (their hash
         buckets / legacy id dirs), and on time-bucketed layouts only
         the ts_bucket subdirectories overlapping the range;
      3. each candidate runs a match-count probe first (row-group stats
         prune it to near-zero when nothing matches) and is left
         byte-identical when the count is 0;
      4. matching rows drop via the same staged write + near-atomic
         swap compaction uses, keeping the (stream_id, ts) clustering
         and the partition's file granularity.

    Stream metadata stays registered (an empty series is queryable as
    empty, like Prometheus until the next head GC). Returns the number
    of samples deleted."""
    conn.uncache_samples()
    sel = conn._parse_selector(selector)
    infos = conn.catalog.resolve(sel.name, sel.matchers, getattr(sel, "or_groups", ()))
    ids = sorted(s.stream_id for s in infos)
    if not ids:
        return 0
    parts = sorted({_partition_dir_for_stream(conn, sid) for sid in ids})
    # layout-aware predicate: hash buckets store stream_id as a DATA
    # column (many streams per dir); legacy stream_id= dirs encode the
    # stream in the PATH only — membership is implied by which dirs made
    # `parts`, and the in-file predicate is the ts range alone
    pred = F.lit(True)
    if conn.stream_buckets:
        pred = F.col("stream_id").isin(ids)
    if start is not None:
        pred = pred & (F.col("ts") >= int(start))
    if end is not None:
        pred = pred & (F.col("ts") <= int(end))

    stage_root = os.path.join(conn.db_dir, "_delete_tmp")
    deleted = 0
    for part_dir in parts:
        if not os.path.isdir(part_dir):
            continue
        if conn.time_bucket:
            subs = []
            for d in os.listdir(part_dir):
                if not d.startswith("ts_bucket="):
                    continue
                b = int(d.split("=", 1)[1])
                lo, hi = b * conn.time_bucket, (b + 1) * conn.time_bucket - 1
                if (start is None or hi >= int(start)) and (
                    end is None or lo <= int(end)
                ):
                    subs.append(d)
        else:
            subs = [None]
        base = os.path.basename(part_dir)
        for i, sub in enumerate(sorted(s for s in subs if s is not None) or subs):
            src = part_dir if sub is None else os.path.join(part_dir, sub)
            df = conn.spark.read.parquet(src)
            n_match = df.where(pred).count()
            if n_match == 0:
                continue
            sort_cols = ["stream_id", "ts"] if conn.stream_buckets else ["ts"]
            n_files = len(
                [f for f in os.listdir(src) if f.endswith(".parquet")]
            )
            tmp = os.path.join(stage_root, f"{base}.{i}")
            shutil.rmtree(tmp, ignore_errors=True)
            (
                df.where(~pred)
                .repartition(max(n_files, 1))
                .sortWithinPartitions(*sort_cols)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            _swap_in(src, tmp, stage_root, f"{base}.{i}")
            deleted += n_match
    shutil.rmtree(stage_root, ignore_errors=True)
    return deleted


def expire_before(conn, cutoff_ts: int) -> int:
    """Drop whole ts_bucket partitions strictly below the cutoff.

    Requires a time-bucketed layout; only buckets FULLY below the cutoff are
    dropped (bucket k covers [k*W, (k+1)*W)), so no partial-file rewrite and
    no sample at/after the cutoff is ever removed. Returns dropped dirs."""
    if not conn.time_bucket:
        raise ValueError("retention requires a time-bucketed layout (Connection(time_bucket=N))")
    conn.uncache_samples()
    cutoff_bucket = cutoff_ts // conn.time_bucket  # buckets < this are fully below
    dropped = 0
    for part in _top_level_partitions(conn):
        full = os.path.join(conn.samples_path, part)
        for sub in os.listdir(full):
            if not sub.startswith("ts_bucket="):
                continue
            bucket = int(sub.split("=", 1)[1])
            if bucket < cutoff_bucket:
                shutil.rmtree(os.path.join(full, sub))
                dropped += 1
    return dropped
