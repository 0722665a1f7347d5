"""Keyed deduplication operators (reference op D1 + exact-dedup family).

The reference dedups within one fetch on a priority key, first-seen-wins in
scan order (dynamo_fetcher.py:317-360). In a shuffled world "scan order"
needs an explicit total-order column (SURVEY §7 risk D1) — callers pass one
(a PK, an ingest `monotonically_increasing_id`, or (ts, pk)).

Scale notes: `first_wins` is one shuffle on the key; AQE splits skewed key
partitions. When ANY survivor is acceptable, `dropDuplicates` is cheaper
(partial dedup map-side before the shuffle) — exposed as `any_wins`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def first_wins(df: DataFrame, key, order) -> DataFrame:
    """Deterministic first-wins dedup: keep the row with the smallest
    ``order`` per ``key``; rows with NULL key are kept verbatim (the
    reference only dedups rows that produced a key, dynamo_fetcher.py:351).
    """
    key_col = key if isinstance(key, Column) else F.col(key)
    order_col = order if isinstance(order, Column) else F.col(order)
    keyed = df.withColumn("_dk", key_col)
    w = W.partitionBy("_dk").orderBy(order_col)
    deduped = (
        keyed.filter(F.col("_dk").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return deduped.unionByName(keyed.filter(F.col("_dk").isNull())).drop("_dk")


def any_wins(df: DataFrame, *cols: str) -> DataFrame:
    """Nondeterministic-survivor dedup — ``dropDuplicates`` with map-side
    partial aggregation; the cheap path when order doesn't matter."""
    return df.dropDuplicates(list(cols))


def incremental_filter(df: DataFrame, ts_col, last_ts: int | None) -> DataFrame:
    """Watermark incremental filter (reference F3, main.py:219): drop rows
    with ts ≤ last persisted watermark — strictly-greater survives. No
    watermark yet → full look-back passes through."""
    if last_ts is None:
        return df
    ts = ts_col if isinstance(ts_col, Column) else F.col(ts_col)
    return df.filter(ts > F.lit(int(last_ts)))
