"""partsupp synthesis (VERDICT r2 #8 — Q2/Q11/Q16/Q17/Q20 fidelity note).

The driver testdata carries no ``partsupp`` table, so the TPC-H suite ships
documented partsupp-free analogues (plans/tpch_suite.py — each affected
query's docstring states its adaptation). This module provides the flip
path: a deterministic partsupp-shaped view derived from lineitem's distinct
(partkey, suppkey) pairs, so the suite can move to spec-shaped queries the
moment a real ``partsupp.parquet`` ships — ``load_partsupp`` prefers the
real file and synthesizes only in its absence.

Synthesis is pure column expressions seeded by ``xxhash64(partkey,
suppkey)``: stable across runs/partitionings, no shuffle beyond the one
distinct. TPC-H domains respected: ``ps_availqty`` ∈ [1, 9999],
``ps_supplycost`` ∈ [1.00, 1000.00].

NOTE: the registered analogues keep their current shapes and hashes — this
view is opt-in (``SPARK_GRAFT_SYNTH_PARTSUPP=1`` for ``register_views``
callers, or call these functions directly).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic partsupp derived from lineitem distinct pairs."""
    from batch_public_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    seed = F.abs(F.xxhash64("ps_partkey", "ps_suppkey"))
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        (seed % F.lit(9999) + 1).cast("int").alias("ps_availqty"),
        ((seed % F.lit(99900)) / 100.0 + 1.0).cast("decimal(15,2)").alias("ps_supplycost"),
        F.lit("synthesized from lineitem distinct pairs").alias("ps_comment"),
    )


def load_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real ``partsupp.parquet`` when the driver ships one; the synthesized
    view otherwise."""
    path = os.path.join(sf_dir, "partsupp.parquet")
    if os.path.exists(path):
        return spark.read.parquet(path)
    return synth_partsupp(spark, sf_dir)
