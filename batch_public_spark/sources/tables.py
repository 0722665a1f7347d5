"""Batch table sources over the driver-generated parquet star schema.

Reference parity: the reference's only batch source is a paginated DynamoDB
Scan with client-side filtering (reference dynamo_fetcher.py:171-373, S1 in
SURVEY §2a). Here the source abstraction is Spark's DataSource V2 parquet
reader — columnar, with predicate pushdown, column pruning and partition
pruning supplied by Catalyst. A production DynamoDB path would be the
S3-export → parquet route (preferred at 100 TB) or a parallel Segment scan
mapped one-segment-per-partition; both land in the same ``load_table`` shape.

The catalog-listing affordance (reference main.py:624-634, S2) maps to
``spark.catalog.listTables`` once views are registered.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Full driver testdata catalog (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table. Lazy: no IO until an action runs, so filters
    and projections applied downstream push into the parquet scan."""
    if name == "events":
        # Must work on ANY session (the driver builds its own), so set the
        # nanos conf at runtime rather than relying on our session factory.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS); with nanosAsLong it surfaces as a
        # bigint of epoch-nanos. Truncate to micros (exactly what DuckDB's
        # micro-precision timestamps do) and restore TimestampType.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer `div`, NOT `/`: float division loses the last microsecond
            # at epoch-nanos magnitude (~1.7e18 overflows double's 53-bit mantissa)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure ``df`` has at least ``min_parts`` (default: cluster default
    parallelism) partitions before compute-heavy narrow stages.

    Rationale: Spark splits parquet scans at ROW-GROUP boundaries; a corpus
    written as few large row groups scans as few tasks, serializing every
    downstream per-row stage (signature UDFs, shingle hashing) no matter how
    many cores exist. When per-row compute dwarfs scan cost, one small
    round-robin exchange of the raw rows buys full-width parallelism.

    Self-disabling at scale: a real multi-file corpus already scans as
    thousands of splits, so the width check makes this a no-op exactly when
    the exchange would be waste. The check reads Catalyst's plan statistics
    (``optimizedPlan().stats().sizeInBytes`` / ``files.maxPartitionBytes``
    ≈ scan split count) — pure planning, no job, no RDD conversion (a
    ``df.rdd.getNumPartitions()`` probe costs ~1 s of physical planning per
    call). Do NOT use ahead of scan-bound stages (plain aggregates) — there
    the read IS the work and an exchange only adds IO."""
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    try:
        size = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
        max_bytes = int(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b").lower().rstrip("b"))
        est_parts = max(1, size // max(max_bytes, 1))
    except Exception:  # stats unavailable (e.g. streaming plan) → assume narrow
        est_parts = 1
    if est_parts >= target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view so spark.sql() queries and
    spark.catalog.listTables() (reference S2) work against the catalog."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def list_tables(spark: SparkSession) -> list[str]:
    """Catalog listing (reference main.py:624-634)."""
    return [t.name for t in spark.catalog.listTables()]
