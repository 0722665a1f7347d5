"""Pathological-row sweep: every registry query must tolerate NULL text,
NULL/empty embeddings, NULL timestamps/values, empty strings, and
single-row slices.

The sibling gate of tests/test_empty_inputs.py (zero rows); this one is
rows that EXIST but are degenerate — what 100 TB of real crawl/telemetry
actually contains. The r11 sweep found 16 crashes: numpy-batched vector
paths np.vstack-ing NULL/[] embeddings (fixed by the valid_vectors
ingest guard in operators/semantic.py and the NULL-text filter in
simhash_signatures), and ANSI DIVIDE_BY_ZERO in statistics whose
divisors (n−1, token totals, at-risk counts, zero-length docs) a
degenerate slice can zero (fixed with try_divide / explicit weight>0
filters). Every fix is value-neutral at every fixture SF — re-attested
by parity + sf0.1 stress — and this gate keeps the class closed.

Contract choices the fixes encode (documented value judgments):
- a NULL/empty vector or NULL text cannot be anyone's neighbor — numpy
  dedup/ANN paths DROP malformed rows at ingest;
- hygiene/audit queries REPORT degenerate rows (NULL measures) rather
  than dropping them;
- a zero-weight doc is unsampleable under length-weighted sampling.
"""

from __future__ import annotations

import duckdb
import pytest

from batch_public_spark.plans import QUERIES

_LIMITS = {
    "region": 5, "nation": 5, "customer": 20, "supplier": 20, "part": 20,
    "orders": 50, "lineitem": 50, "events": 50, "documents": 20,
    "embeddings": 20,
}


@pytest.fixture(scope="session")
def pathological_sf_dir(tmp_path_factory):
    """Small real slices plus degenerate rows in the three tables whose
    payloads queries compute over (documents/events/embeddings)."""
    d = tmp_path_factory.mktemp("sf_nulls")
    con = duckdb.connect()
    base = "/root/testdata/sf0.001"
    for t, n in _LIMITS.items():
        con.execute(
            f"CREATE OR REPLACE TABLE tmp_{t} AS "
            f"SELECT * FROM '{base}/{t}.parquet' LIMIT {n}"
        )
    con.execute("""INSERT INTO tmp_documents VALUES
      (900001, NULL, NULL, NULL, NULL),
      (900002, '', 'en', 'web', 0),
      (900003, '   ', 'en', 'web', 3),
      (900004, 'x', NULL, '', 1)""")
    con.execute("""INSERT INTO tmp_events VALUES
      (900001, NULL, 42, NULL, NULL, NULL),
      (900002, TIMESTAMP '2024-01-05 00:00:00', NULL, 'click', 0.0, NULL),
      (900003, TIMESTAMP '2024-01-06 00:00:00', 43, '', NULL, '{}')""")
    con.execute(
        "INSERT INTO tmp_embeddings VALUES (900001, NULL, NULL), (900002, [], 0)"
    )
    for t in _LIMITS:
        con.execute(f"COPY tmp_{t} TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    return str(d)


def test_every_query_tolerates_pathological_rows(spark, pathological_sf_dir):
    failures = []
    for name, spec in QUERIES.items():
        try:
            spec.fn(spark, pathological_sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — collecting the full list
            failures.append((name, str(e).splitlines()[0][:140]))
    assert not failures, failures
