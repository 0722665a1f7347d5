"""Query registry: name → (spark_fn, oracle_sql).

Every operator claimed in SURVEY §2 is declared here as a query over the
driver testdata tables, paired (where SQL-expressible) with an ANSI-SQL
oracle string that DuckDB runs on the same parquet files. The driver's
correctness gate compares row-count + schema + order-insensitive value hash.

Determinism discipline (how we make Spark and DuckDB hash-identical):

* **Money/measure aggregates go through DECIMAL.** Doubles summed in
  different orders differ in the last bits; a DECIMAL(18,4) cast is an
  engine-independent rounding of the exact binary double, and decimal
  sums/products are exact in both engines. Pattern:
  ``round(sum(cast(x as decimal(18,4))), 2) :: double``.
* **Averages/ratios divide exact components as doubles** then round to 6;
  the only error is 1-2 ulp from the final division, far from any rounding
  boundary.
* **Timestamps are never returned raw** — formatted to strings
  (``date_format`` / ``strftime``) or epoch integers, avoiding tz/precision
  representation mismatches between engines.
* **Ordering-sensitive queries (top-k, window ranks) always carry a total
  tie-break key** computed over exact (decimal/int) values.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: Optional[str]  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


def query(name: str, oracle: Optional[str] = None, doc: str = ""):
    """Register a declared query. ``oracle=None`` marks a genuinely
    non-SQL-expressible operator (driver records a rows-only check)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
