"""Declared query corpus.

Importing this package registers every query into ``registry.QUERIES``.
The driver contract (``__spark_entry__.py``) and the test harness both
consume the registry.
"""

from batch_public_spark.plans.registry import QUERIES, QuerySpec

# Import for registration side effects.
from batch_public_spark.plans import relational  # noqa: F401
from batch_public_spark.plans import pipeline_queries  # noqa: F401
from batch_public_spark.plans import llmops_queries  # noqa: F401
from batch_public_spark.plans import streaming_queries  # noqa: F401

__all__ = ["QUERIES", "QuerySpec"]
