"""Semantic invariants of the round-4 temporal/maintenance operators.

Oracle equality (tests/test_oracle_parity.py) proves both engines compute
the same thing; these tests pin down WHAT that thing is — the structural
properties a user relies on (interval contiguity, grid density, algebraic
consistency between grains) that a matching-but-wrong pair of queries
could silently violate.
"""

from __future__ import annotations

from collections import defaultdict

from batch_public_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _rows(spark, name):
    return QUERIES[name].fn(spark, SF_DIR).collect()


def test_scd2_intervals_contiguous_and_single_current(spark):
    """Per user: versions are 1..n in (valid_from) order, each interval's
    valid_to equals the next interval's valid_from (half-open chain with
    no gaps or overlaps), and exactly the LAST interval is current."""
    by_user = defaultdict(list)
    for r in _rows(spark, "scd2_event_type_history"):
        by_user[r.user_id].append(r)
    assert by_user
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.version)
        assert [r.version for r in ivs] == list(range(1, len(ivs) + 1)), user
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from, user
            assert not a.is_current, user
            # consecutive runs must actually change type (collapse worked)
            assert a.event_type != b.event_type, user
        assert ivs[-1].is_current and ivs[-1].valid_to is None, user


def test_gapfill_grid_dense_and_locf_non_null(spark):
    """Per type: hourly buckets form a dense, duplicate-free grid from the
    type's first bucket to the global max, and the LOCF value never goes
    null after the first observation (which anchors each type's grid)."""
    from datetime import datetime, timedelta

    by_type = defaultdict(list)
    for r in _rows(spark, "events_gapfill_locf"):
        by_type[r.event_type].append(r)
    assert by_type
    fmt = "%Y-%m-%d %H:%M:%S"
    hi = max(
        datetime.strptime(r.bucket, fmt) for rows in by_type.values() for r in rows
    )
    for etype, rows in by_type.items():
        ts = sorted(datetime.strptime(r.bucket, fmt) for r in rows)
        assert len(set(ts)) == len(ts), etype
        assert ts[-1] == hi, etype  # every grid reaches the global end
        for a, b in zip(ts, ts[1:]):
            assert b - a == timedelta(hours=1), etype  # dense
        assert all(r.avg_value_locf is not None for r in rows), etype


def test_hypertable_rollup_grains_consistent(spark):
    """Algebraic consistency across grains: per type, the day buckets sum
    to the type total, the week buckets sum to the type total, and both
    counts agree — one GROUPING SETS pass must be self-consistent."""
    rows = _rows(spark, "events_hypertable_rollup")
    by_type = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_type[r.event_type][r.grain].append(r)
    assert by_type
    for etype, grains in by_type.items():
        [total] = grains["type"]
        assert total.bucket == "ALL"
        for grain in ("day", "week"):
            assert sum(r.n for r in grains[grain]) == total.n, (etype, grain)
            # decimal-exact pipeline: grain sums match the total to the cent
            assert abs(sum(r.sum_value for r in grains[grain]) - total.sum_value) < 0.01, (
                etype,
                grain,
            )


def test_cdc_outcomes_partition_the_keyspace(spark):
    """insert/update/delete/unchanged counts must partition |base ∪
    changes| exactly (every key classified once), with the fixture's
    deterministic change recipe recomputed independently here."""
    import duckdb

    out = {r.outcome: r.n for r in _rows(spark, "cdc_snapshot_merge")}
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'"
    )
    n_even, n_odd, n_upd, n_del = con.sql(
        """
        SELECT count(*) FILTER (o_orderkey % 2 = 0),
               count(*) FILTER (o_orderkey % 2 = 1),
               count(*) FILTER (o_orderkey % 2 = 0 AND o_orderkey % 7 = 0
                                AND o_orderkey % 11 <> 0),
               count(*) FILTER (o_orderkey % 2 = 0 AND o_orderkey % 11 = 0)
        FROM orders
        """
    ).fetchone()
    assert out.get("inserted", 0) == n_odd
    assert out.get("updated", 0) == n_upd
    assert out.get("deleted", 0) == n_del
    assert out.get("unchanged", 0) == n_even - n_upd - n_del
    assert sum(out.values()) == n_even + n_odd


def test_zorder_code_bijective_on_domain(spark):
    """The 16-bit Morton interleave must be a bijection on the 256x256
    input grid — any collision or gap breaks the data-skipping argument."""
    from pyspark.sql import functions as F

    from batch_public_spark.plans.temporal_queries import _z_interleave

    grid = (
        spark.range(256)
        .select(F.col("id").alias("x"))
        .crossJoin(spark.range(256).select(F.col("id").alias("y")))
    )
    z = grid.select(_z_interleave(F.col("x"), F.col("y")).alias("z"))
    stats = z.agg(
        F.count_distinct("z").alias("d"), F.min("z").alias("lo"), F.max("z").alias("hi")
    ).collect()[0]
    assert (stats.d, stats.lo, stats.hi) == (65536, 0, 65535)


def test_rolling_distinct_bounds(spark):
    """Each day's rolling-7d distinct count is >= that day's own distinct
    users and <= the sum of the window's daily distincts."""
    import duckdb

    rolling = {r.day: r.rolling_7d_users for r in _rows(spark, "events_rolling_distinct_users")}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    daily = dict(
        con.sql(
            """
            SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d'),
                   count(DISTINCT user_id)
            FROM events GROUP BY 1
            """
        ).fetchall()
    )
    from datetime import datetime, timedelta

    assert rolling
    for day, n in rolling.items():
        d = datetime.strptime(day, "%Y-%m-%d").date()
        window_days = [
            (d - timedelta(days=i)).strftime("%Y-%m-%d") for i in range(7)
        ]
        own = daily.get(day, 0)
        cap = sum(daily.get(w, 0) for w in window_days)
        assert own <= n <= cap, (day, own, n, cap)
