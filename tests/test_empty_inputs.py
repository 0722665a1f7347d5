"""Empty-input sweep: every registry query must tolerate zero-row tables.

The reference's F7 operator is an empty-input short-circuit for the
pipeline; at 100 TB the analytic surface meets the same condition as
empty partitions, empty days, and empty tenant slices — a query that
throws DIVIDE_BY_ZERO / INVALID_ARRAY_INDEX / UNABLE_TO_INFER_SCHEMA on
an empty slice takes down the whole job under ANSI mode (Spark 4
default). The r11 sweep found six such crashes (knn-audit and
forecast-backtest ANSI divisions, markov-stationary driver-side 1/k,
two partitioned write→read schema inferences, binaryFile's missing
partition column); each fix is value-neutral at every fixture SF
(re-attested by parity + stress) and this gate keeps the class closed."""

from __future__ import annotations

import duckdb
import pytest

from batch_public_spark.plans import QUERIES

_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory):
    """Schema-identical zero-row mirror of the fixture star schema."""
    d = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet' LIMIT 0)"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


def test_every_query_tolerates_empty_inputs(spark, empty_sf_dir):
    failures = []
    for name, spec in QUERIES.items():
        try:
            spec.fn(spark, empty_sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — collecting the full list
            failures.append((name, str(e).splitlines()[0][:140]))
    assert not failures, failures
