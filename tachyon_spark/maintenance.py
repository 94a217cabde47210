"""Table maintenance: compaction and retention.

The reference has neither (files are immutable once rotated and there is no
retention, SURVEY §1.4); both are required for a real append-heavy
deployment: many small Inserter flushes produce many small parquet files
(degrading scan parallelism bookkeeping), and time-series data ages out.

Compaction rewrites one stream partition's files into few large, ts-sorted
files (write-to-temp, then swap). Retention drops whole `ts_bucket`
partition directories below a cutoff — metadata-only, no rewrite — and is
therefore only offered on time-bucketed layouts; on unbucketed layouts
deleting mid-file rows would require rewriting every file of every stream.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F


def compact_stream(conn, stream_id: str, target_files: int = 1) -> int:
    """Rewrite one stream's samples into `target_files` ts-sorted files
    (per ts_bucket subdirectory when bucketed). Returns files before."""
    part_dir = os.path.join(conn.samples_path, f"stream_id={stream_id}")
    if not os.path.isdir(part_dir):
        return 0
    n_before = sum(len([f for f in fs if f.endswith(".parquet")]) for _, _, fs in os.walk(part_dir))

    sub_dirs = (
        [d for d in os.listdir(part_dir) if d.startswith("ts_bucket=")]
        if conn.time_bucket
        else [None]
    )
    # Stage the rewrite OUTSIDE the samples tree: a temp dir inside it would
    # be picked up by concurrent partition discovery as a bogus partition
    # (and a crash mid-swap could leave the stream's data invisible).
    stage_root = os.path.join(conn.db_dir, "_compact_tmp")
    for i, sub in enumerate(sub_dirs):
        src = part_dir if sub is None else os.path.join(part_dir, sub)
        df = conn.spark.read.parquet(src)
        tmp = os.path.join(stage_root, f"{stream_id}.{i}")
        old = os.path.join(stage_root, f"{stream_id}.{i}.old")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        (
            df.repartition(target_files)
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # drop spark's _SUCCESS marker; partition dirs hold only data files
        marker = os.path.join(tmp, "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)
        # Swap: old-aside -> new-in -> delete-old. Readers racing the swap see
        # either the old files or the new files, never a missing partition or
        # a non-partition dir inside the tree; a crash leaves `old` on disk
        # for manual recovery rather than losing the data.
        os.replace(src, old)
        os.replace(tmp, src)
        shutil.rmtree(old)
    shutil.rmtree(stage_root, ignore_errors=True)
    return n_before


def compact_all(conn, target_files: int = 1) -> dict[str, int]:
    """Compact every stream; returns {stream_id: files_before}."""
    return {
        s.stream_id: compact_stream(conn, s.stream_id, target_files)
        for s in conn.get_all_streams()
    }


def expire_before(conn, cutoff_ts: int) -> int:
    """Drop whole ts_bucket partitions strictly below the cutoff.

    Requires a time-bucketed layout; only buckets FULLY below the cutoff are
    dropped (bucket k covers [k*W, (k+1)*W)), so no partial-file rewrite and
    no sample at/after the cutoff is ever removed. Returns dropped dirs."""
    if not conn.time_bucket:
        raise ValueError("retention requires a time-bucketed layout (Connection(time_bucket=N))")
    cutoff_bucket = cutoff_ts // conn.time_bucket  # buckets < this are fully below
    dropped = 0
    if not os.path.isdir(conn.samples_path):
        return 0
    for stream_dir in os.listdir(conn.samples_path):
        full = os.path.join(conn.samples_path, stream_dir)
        if not (stream_dir.startswith("stream_id=") and os.path.isdir(full)):
            continue
        for sub in os.listdir(full):
            if not sub.startswith("ts_bucket="):
                continue
            bucket = int(sub.split("=", 1)[1])
            if bucket < cutoff_bucket:
                shutil.rmtree(os.path.join(full, sub))
                dropped += 1
    return dropped
