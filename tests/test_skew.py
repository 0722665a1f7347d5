"""Salted aggregation / salted join equivalence with their unsalted forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_public_spark.operators.skew import salted_group_agg, salted_join
from batch_public_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_salted_agg_matches_plain(spark):
    ev = load_table(spark, SF_DIR, "events")
    salted = salted_group_agg(
        ev,
        ["event_type"],
        [("count", "", "n"), ("min", "value", "mn"), ("max", "value", "mx")],
        buckets=8,
        salt_on=F.col("event_id"),
    )
    plain = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain(spark):
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        cust,
        ["c_custkey"],
        buckets=4,
        salt_on=F.col("o_orderkey"),
    ).select("o_orderkey", "c_name")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_name")
    )
    assert salted.count() == plain.count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_non_algebraic_agg_rejected(spark):
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_group_agg(ev, ["event_type"], [("median", "value", "m")])
