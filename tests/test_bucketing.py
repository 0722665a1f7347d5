"""Bucketed-join plan audit: co-located storage must elide the Exchange.

This is the strongest static scale guarantee the engine offers — the
orders ⋈ lineitem shuffle disappears because both tables were written
hash-bucketed on the join key.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_public_spark.sources.bucketing import read_bucketed, write_bucketed
from batch_public_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "orderkey"),
        "bps_orders_b",
        key="orderkey",
        buckets=4,
        path=str(base / "orders"),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"),
        "bps_lineitem_b",
        key="orderkey",
        buckets=4,
        path=str(base / "lineitem"),
    )
    yield "bps_orders_b", "bps_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS bps_orders_b")
    spark.sql("DROP TABLE IF EXISTS bps_lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ot, lt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, ot).join(read_bucketed(spark, lt), "orderkey")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    ot, lt = bucketed_tables
    bucketed = (
        read_bucketed(spark, ot)
        .join(read_bucketed(spark, lt), "orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        load_table(spark, SF_DIR, "orders")
        .join(
            load_table(spark, SF_DIR, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    """groupBy on the bucket key also reuses the stored partitioning."""
    _, lt = bucketed_tables
    agg = read_bucketed(spark, lt).groupBy("orderkey").agg(F.count("*").alias("n"))
    plan = agg._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        agg._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
