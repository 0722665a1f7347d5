"""Bucketed tables: pre-shuffled storage for co-located joins and aggs.

At 100 TB the same fact-to-fact join (orders ⋈ lineitem on orderkey) runs
daily; shuffling both sides every run is the single biggest avoidable
cost. Bucketing persists the shuffle INTO the table layout: both tables
hash-partitioned into the same bucket count on the join key at write time,
so every later equi-join or aggregation on that key reads bucket-aligned
files and skips the Exchange entirely (verified in tests/test_bucketing.py
by asserting the join plan has no Exchange under a disabled broadcast
threshold).

Cluster notes: bucket count should be sized so one bucket ≈ one task's
worth of data at target scale (and kept stable across writers — Spark only
elides the shuffle when both sides' bucket counts match or divide evenly);
``sortBy`` on the key additionally removes the per-task sort under
sort-merge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    buckets: int,
    path: str,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and optionally
    sorted) on ``key``. Bucketing metadata lives in the session catalog —
    readers must go through ``spark.table(table)``, not raw paths.

    The pre-write ``repartition(buckets, key)`` uses the SAME murmur3
    HashPartitioning as the bucket assignment, so each write task holds
    exactly one bucket: the write runs ``buckets``-wide in parallel and
    emits ONE file per bucket, instead of (input tasks × buckets) small
    files from however many tasks the upstream plan happens to have
    (bucketBy never shuffles on its own — a 1-task upstream serializes
    the whole encode, a 32-task upstream sprays 32 files per bucket).
    Guide §6 output-file sizing + §2 shuffle-width discipline."""
    df = df.repartition(buckets, F.col(key))
    w = df.write.format("parquet").mode(mode).option("path", path).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves the bucketing-derived output partitioning."""
    return spark.table(table)
