#!/usr/bin/env python
"""Drive the driver contract the way the round driver does (verify skill):
vanilla SparkSession (no session.py conf), sf0.01, every declared query vs
its DuckDB oracle with the sorted-columns order-insensitive comparator.

Usage: python tools/drive_contract.py [name_substring ...]
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.01"

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

n = mod.entry(spark).count()
assert n > 0, "entry() returned no rows"
print(f"entry(): {n} rows OK", flush=True)

ddb = duckdb.connect()
for t in (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
):
    ddb.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

from tests.conftest import assert_parity  # noqa: E402

queries = mod.queries()
oracles = mod.oracle_sql()
filters = sys.argv[1:]
names = sorted(
    nm for nm in queries
    if not filters or any(f in nm for f in filters)
)
fails = []
for i, nm in enumerate(names):
    try:
        sdf = queries[nm](spark, SF)
        if nm in oracles:
            assert_parity(sdf, ddb.sql(oracles[nm]), nm)
        else:
            assert sdf.count() >= 0
    except Exception as e:  # noqa: BLE001
        fails.append((nm, str(e)[:300]))
        print(f"FAIL {nm}: {str(e)[:200]}", flush=True)
    if (i + 1) % 50 == 0:
        print(f"  ...{i + 1}/{len(names)}", flush=True)

print(f"{len(names) - len(fails)}/{len(names)} green", flush=True)
sys.exit(1 if fails else 0)
