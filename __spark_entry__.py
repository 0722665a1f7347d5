"""Driver contract for the spark-graft builder (PySpark target).

Thin façade over :mod:`batch_public_spark.plans` — the declared query corpus
lives there (one registry entry per implemented operator from SURVEY.md §2),
each paired with a DuckDB-runnable ANSI-SQL oracle where SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

FLAGSHIP = "q1_pricing_summary"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from batch_public_spark.plans import QUERIES

    return QUERIES[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from batch_public_spark.plans import QUERIES

    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted → rows-only check."""
    from batch_public_spark.plans import QUERIES

    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
