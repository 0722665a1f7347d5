"""Differential test: every declared query vs its DuckDB oracle.

This mirrors the driver's t2 correctness gate (sorted-column, order-
insensitive value comparison) so regressions show up locally before the
round verify. Queries with ``oracle=None`` get a rows-run smoke check.
"""

from __future__ import annotations

import pytest

from batch_public_spark.plans import QUERIES
from tests.conftest import SF_DIR, assert_parity

_ORACLE = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
_ROWS_ONLY = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", _ORACLE)
def test_oracle_parity(spark, ddb, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_DIR)
    rel = ddb.sql(spec.oracle)
    assert_parity(sdf, rel, name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_DIR)
    n = sdf.count()
    assert n >= 0
    assert len(sdf.schema.fields) > 0
