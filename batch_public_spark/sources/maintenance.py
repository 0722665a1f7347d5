"""Lake maintenance: small-file compaction.

Streaming sinks, per-cron micro-batches, and over-parallel writers leave
directories of thousands of tiny parquet files; scan planning then pays a
per-file open/footer cost that dwarfs the IO (the classic small-file
problem). ``compact_parquet`` rewrites a directory into ~target-sized
files:

- target file count = ceil(total_bytes / target_bytes), so output sizing
  tracks the DATA, not the incoming partitioning;
- rewrite goes to a temp sibling then atomically swaps directories, so a
  concurrent reader sees either the old layout or the new one, never a
  half-written mix;
- ``coalesce`` (no shuffle) when reducing file count — compaction must
  not pay a full exchange of the data it is merely re-binning;
  ``repartition`` only when the caller asks to SPLIT oversized files.

At 100 TB this runs per-partition-directory (date=.../source=...) from a
scheduler; on table formats (Delta/Iceberg) OPTIMIZE replaces it — this is
the plain-parquet equivalent.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith((".", "_")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _data_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith((".", "_")):
                out.append(os.path.join(root, f))
    return out


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_mb: int = 128,
    allow_split: bool = False,
) -> dict:
    """Compact a parquet directory to ~``target_mb`` files, atomically.

    Returns a summary dict: files/bytes before and after, rows verified.
    ``allow_split=True`` also repartitions (shuffle) when files are
    OVERSIZED; default only merges small files (shuffle-free coalesce).
    """
    before_files = len(_data_files(path))
    before_bytes = _dir_bytes(path)
    target_bytes = target_mb << 20
    n_out = max(1, math.ceil(before_bytes / target_bytes))

    df = spark.read.parquet(path)
    n_rows = df.count()
    current_parts = df.rdd.getNumPartitions()
    if n_out < current_parts:
        out_df = df.coalesce(n_out)
    elif allow_split and n_out > current_parts:
        out_df = df.repartition(n_out)
    else:
        out_df = df

    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    out_df.write.parquet(tmp)

    # verify BEFORE swapping — a bad rewrite must never replace good data
    n_check = spark.read.parquet(tmp).count()
    if n_check != n_rows:
        shutil.rmtree(tmp)
        raise RuntimeError(f"compaction row mismatch: {n_rows} -> {n_check}; aborted")

    # atomic-enough swap: two renames; a reader races onto either full layout
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)

    return {
        "files_before": before_files,
        "files_after": len(_data_files(path)),
        "bytes_before": before_bytes,
        "bytes_after": _dir_bytes(path),
        "rows": n_rows,
    }
