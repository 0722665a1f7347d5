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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _content_checksum(df: DataFrame) -> tuple[int, object]:
    """(row count, order-independent content checksum) in one pass.

    xxhash64 over the full row struct, summed as decimal(38,0) so the
    aggregate can neither overflow (ANSI) nor depend on row order."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(F.struct(*df.columns)).cast("decimal(38,0)")).alias("chk"),
    ).collect()[0]
    return row["n"], row["chk"]


def _data_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith((".", "_")):
                out.append(os.path.join(root, f))
    return out


def _dir_bytes(path: str) -> int:
    return sum(os.path.getsize(f) for f in _data_files(path))


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

    The path must be on a LOCAL/POSIX filesystem: the swap relies on
    atomic same-device ``os.rename``, which object stores (s3://, gs://)
    do not provide — there, use the table format's OPTIMIZE instead. The
    previous layout is kept as an underscore-hidden ``.compact_old``
    sibling until the NEXT successful compaction, so one manual rollback
    step is always available.
    """
    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            f"compact_parquet requires a local filesystem path, got {path!r}; "
            "object-store tables should use the table format's OPTIMIZE"
        )
    path = path.removeprefix("file://")
    base = path.rstrip("/")
    # Leading '_' so Spark/Hadoop directory listings and partition
    # discovery over the PARENT skip the work dirs (the same convention
    # _data_files itself applies) — no double counting mid-compaction.
    tmp = os.path.join(os.path.dirname(base), "_" + os.path.basename(base) + ".compact_tmp")
    old = os.path.join(os.path.dirname(base), "_" + os.path.basename(base) + ".compact_old")

    # Crash recovery: a previous run killed between the two swap renames
    # left the data under the old-dir; restore it before anything else.
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)

    before_files = len(_data_files(path))
    before_bytes = _dir_bytes(path)
    target_bytes = target_mb << 20
    n_out = max(1, math.ceil(before_bytes / target_bytes))

    if before_files <= n_out and not allow_split:
        # already at/below target: a rewrite would be pure wasted IO plus
        # an unnecessary swap window
        return {
            "files_before": before_files,
            "files_after": before_files,
            "bytes_before": before_bytes,
            "bytes_after": before_bytes,
            "rows": None,
            "skipped": "already compact",
        }

    df = spark.read.parquet(path)
    n_rows, checksum = _content_checksum(df)
    current_parts = df.rdd.getNumPartitions()
    if n_out < current_parts:
        out_df = df.coalesce(n_out)
    elif allow_split and n_out > current_parts:
        out_df = df.repartition(n_out)
    else:
        out_df = df

    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    out_df.write.parquet(tmp)

    # verify BEFORE swapping — a bad rewrite must never replace good data.
    # Row count AND order-independent content checksum: a rewrite that
    # drops one row and duplicates another would pass a count-only check.
    n_check, chk_check = _content_checksum(spark.read.parquet(tmp))
    if n_check != n_rows or chk_check != checksum:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compaction verify mismatch: rows {n_rows} -> {n_check}, "
            f"checksum {checksum} -> {chk_check}; aborted"
        )

    # Swap via two renames. A concurrent reader of THIS exact path can hit
    # a brief not-exists window between them (parent-directory readers are
    # unaffected — the work dirs are underscore-hidden); a crash in the
    # window is healed by the restore-from-old step above on the next run.
    # The old layout is deliberately KEPT after the swap — it is this
    # run's rollback copy, reclaimed by the next successful compaction.
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)

    return {
        "files_before": before_files,
        "files_after": len(_data_files(path)),
        "bytes_before": before_bytes,
        "bytes_after": _dir_bytes(path),
        "rows": n_rows,
    }
