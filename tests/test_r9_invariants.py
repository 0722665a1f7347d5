"""Binding-case tests for the r9 hot-key caps.

The fixture SFs never trip the caps (sf0.1 max co-presence bucket = 12
participants, max per-user event count = 99), so the driver hash attests
the capped MEASURE but never exercises the cap itself. These tests plant
synthetic hot keys ABOVE each cap and verify the capped plans end-to-end
— Spark query vs the registered DuckDB oracle over the same synthetic
parquet — so an engine that ignored its cap would hash-mismatch here:

* co-presence per-bucket participant cap (PRESENCE_BUCKET_CAP = 256;
  analytics_queries._capped_presence, mirrored in every graph oracle's
  ``pres`` CTE) — untyped (graph_kcore_peel) and typed
  (graph_label_propagation) paths;
* link-prediction super-hub witness cap (deg(w) > 1000 excluded from
  wedge enumeration; mirrored in the oracle's ``adjw`` CTE);
* events_rate_limit_sim per-user event cap (first 100 000 events).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from batch_public_spark.plans import QUERIES
from batch_public_spark.plans.analytics_queries import (
    PRESENCE_BUCKET_CAP,
    _capped_presence,
)
from tests.conftest import assert_parity

BASE_TS = pd.Timestamp("2024-03-01 00:00:00")


def _write_events(tmpdir, rows: pd.DataFrame) -> str:
    """Write a synthetic events table with the exact testdata schema."""
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype="int64"),
            "ts": rows["ts"].astype("datetime64[us]"),
            "user_id": rows["user_id"].astype("int64"),
            "event_type": rows.get("event_type", pd.Series(["view"] * len(rows))).astype(
                str
            ),
            "value": np.ones(len(rows), dtype="float64"),
            "props": ["{}"] * len(rows),
        }
    )
    path = str(tmpdir)
    df.to_parquet(f"{path}/events.parquet", index=False)
    return path


_CONS: dict = {}  # keep connections alive until their relations are read


def _oracle(sf_dir: str, name: str):
    con = _CONS.get(sf_dir)
    if con is None:
        con = _CONS[sf_dir] = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    return con.sql(QUERIES[name].oracle)


def test_capped_presence_unit_matches_duckdb(spark):
    """_capped_presence vs the oracle row_number idiom on a skewed grid:
    exact set equality of survivors, including at the cap boundary."""
    rng = np.random.default_rng(7)
    users = rng.integers(0, 2000, size=6000)
    buckets = np.concatenate(
        [np.zeros(3000, dtype="int64"), rng.integers(1, 40, size=3000)]
    )
    pdf = pd.DataFrame({"u": users, "b": buckets}).drop_duplicates()
    sdf = _capped_presence(spark.createDataFrame(pdf), "b")
    got = {(r.u, r.b) for r in sdf.collect()}
    con = duckdb.connect()
    con.register("pres0", pdf)
    want = {
        (r[0], r[1])
        for r in con.sql(
            f"""SELECT u, b FROM (
                  SELECT u, b, row_number() OVER (PARTITION BY b ORDER BY u) rn
                  FROM pres0)
                WHERE rn <= {PRESENCE_BUCKET_CAP}"""
        ).fetchall()
    }
    assert got == want
    hot = pdf[pdf.b == 0].u.nunique()
    assert hot > PRESENCE_BUCKET_CAP, "fixture must exceed the cap"
    assert sum(1 for (_, b) in got if b == 0) == PRESENCE_BUCKET_CAP


@pytest.fixture(scope="module")
def hot_bucket_dir(tmp_path_factory):
    """One minute bucket with 300 distinct users (> cap 256) plus sparse
    background activity so the graph has non-degenerate structure."""
    rows = []
    # hot minute: 300 users, same event_type (trips typed AND untyped caps)
    for u in range(300):
        rows.append((BASE_TS + pd.Timedelta(seconds=u % 60), 10_000 + u, "view"))
    # background: 20 users across 10 cold minutes, two types
    for m in range(1, 11):
        for u in range(20):
            rows.append(
                (
                    BASE_TS + pd.Timedelta(minutes=m, seconds=u),
                    20_000 + (u + m) % 25,
                    "view" if u % 2 else "click",
                )
            )
    pdf = pd.DataFrame(rows, columns=["ts", "user_id", "event_type"])
    return _write_events(tmp_path_factory.mktemp("hotbucket"), pdf)


def test_kcore_hot_bucket_capped_parity(spark, hot_bucket_dir):
    """Untyped cap path: the 300-user minute must enter the k-core graph
    as exactly 256 participants in BOTH engines (clique edges 256·255/2),
    and full query output must match the oracle."""
    sdf = QUERIES["graph_kcore_peel"].fn(spark, hot_bucket_dir)
    rel = _oracle(hot_bucket_dir, "graph_kcore_peel")
    assert_parity(sdf, rel, "graph_kcore_peel[hot-bucket]")
    r1 = {r.round: r for r in sdf.collect()}[1]
    cap_clique = PRESENCE_BUCKET_CAP * (PRESENCE_BUCKET_CAP - 1) // 2
    uncapped_clique = 300 * 299 // 2
    assert r1.n_edges < uncapped_clique, "cap did not bind"
    # hot-bucket clique survives k=12 peeling intact; background users are
    # capped-irrelevant (bucket size ≤ 25) and may add a few edges
    assert r1.n_edges >= cap_clique
    assert r1.n_nodes >= PRESENCE_BUCKET_CAP


def test_label_propagation_hot_bucket_capped_parity(spark, hot_bucket_dir):
    """Typed cap path ((bucket, event_type) key): LPA's biggest community
    is the CAPPED hot clique — 256, not 300 — in both engines."""
    sdf = QUERIES["graph_label_propagation"].fn(spark, hot_bucket_dir)
    rel = _oracle(hot_bucket_dir, "graph_label_propagation")
    assert_parity(sdf, rel, "graph_label_propagation")
    sizes = [r.community_size for r in sdf.collect()]
    assert max(sizes) == PRESENCE_BUCKET_CAP, sizes


@pytest.fixture(scope="module")
def hub_witness_dir(tmp_path_factory):
    """A hub user co-present in 40 small buckets (degree > 1000) plus
    bridge users linking consecutive buckets, so open wedges exist that
    are witnessed ONLY by capped-in witnesses. Bucket sizes alternate
    (29/25) and every third gap gets a SECOND bridge, so the surviving
    candidates span distinct (common_neighbors, jaccard, adamic_adar)
    values — non-vacuous by construction."""
    rows = []
    for b in range(40):
        t0 = BASE_TS + pd.Timedelta(minutes=b)
        rows.append((t0, 0, "view"))  # the hub
        size = 29 if b % 2 == 0 else 25
        for i in range(size):
            rows.append((t0 + pd.Timedelta(seconds=1 + i), 1000 * (b + 1) + i, "view"))
        if b > 0:  # bridge: first member of bucket b also in bucket b-1
            rows.append(
                (t0 - pd.Timedelta(seconds=10), 1000 * (b + 1), "view")
            )
        if b > 0 and b % 3 == 0:  # second bridge every third gap
            rows.append(
                (t0 - pd.Timedelta(seconds=9), 1000 * (b + 1) + 1, "view")
            )
    pdf = pd.DataFrame(rows, columns=["ts", "user_id", "event_type"])
    return _write_events(tmp_path_factory.mktemp("hubwitness"), pdf)


def test_link_prediction_witness_cap_parity(spark, hub_witness_dir):
    """The hub (degree 1044) must be EXCLUDED as a wedge witness in both
    engines: candidate pairs bridged only by the hub disappear, and
    surviving scores count only sub-cap witnesses. An engine that ignored
    the witness cap would score cross-bucket pairs through the hub and
    mismatch here."""
    sdf = QUERIES["graph_link_prediction"].fn(spark, hub_witness_dir)
    rel = _oracle(hub_witness_dir, "graph_link_prediction")
    assert_parity(sdf, rel, "graph_link_prediction[hub-witness]")
    rows = sdf.collect()
    assert rows, "open wedges must survive the cap (bridge-witnessed)"
    import math

    for r in rows:
        # with the hub capped out, every witness has degree ≤ 60ish and
        # each AA term ≥ 1/ln(100); hub terms would be 1/ln(1044) ≈ 0.144
        assert r.adamic_adar >= r.common_neighbors / math.log(100.0) - 1e-9, r


@pytest.fixture(scope="module")
def hot_user_dir(tmp_path_factory):
    """One user with 100 500 events (> per-key cap 100 000) at 1-second
    gaps, plus one cold user for a second rollup bucket."""
    n = 100_500
    ts = BASE_TS + pd.to_timedelta(np.arange(n), unit="s")
    hot = pd.DataFrame({"ts": ts, "user_id": np.full(n, 7, dtype="int64")})
    cold = pd.DataFrame(
        {
            "ts": BASE_TS + pd.to_timedelta(np.arange(5) * 3600 * 6, unit="s"),
            "user_id": np.full(5, 4, dtype="int64"),
        }
    )
    pdf = pd.concat([hot, cold], ignore_index=True)
    pdf["event_type"] = "view"
    return _write_events(tmp_path_factory.mktemp("hotuser"), pdf)


def test_rate_limit_per_user_cap_binds(spark, hot_user_dir):
    """The fold must see exactly the first 100 000 events of the hot user
    — n_events reports the CAPPED stream, so one pathological key can't
    materialize its whole history in a single task row. (The DuckDB
    recursive oracle mirrors the cap via its ev CTE's i <= 100000 filter;
    running 100k recursion steps in-process is impractical, so the oracle
    side here is pinned textually + by the sf-fixture hash.)"""
    sdf = QUERIES["events_rate_limit_sim"].fn(spark, hot_user_dir)
    rows = {r.user_bucket: r for r in sdf.collect()}
    assert rows[7].n_events == 100_000
    assert rows[4].n_events == 5
    # 1-second gaps against a 7200 s/token refill: essentially everything
    # after the 2-token burst is rejected
    assert rows[7].n_rejected >= 99_000
    assert "i <= 100000" in QUERIES["events_rate_limit_sim"].oracle


# --- invariants for the r9 additions (properties the parity hash can't
# express: identities, bounds, stochasticity) ---


def _rows(spark, name):
    from tests.conftest import SF_DIR

    return QUERIES[name].fn(spark, SF_DIR).collect()


def test_markov_rows_are_stochastic(spark):
    """Smoothed probabilities in each prev-row sum to 1 (within rounding)
    and every cell is strictly positive (Laplace floor)."""
    rows = _rows(spark, "events_markov_transitions")
    assert len(rows) == 25
    by_prev: dict = {}
    for r in rows:
        assert r.p_smoothed > 0, r
        by_prev.setdefault(r.prev, []).append(r.p_smoothed)
    for prev, ps in by_prev.items():
        assert abs(sum(ps) - 1.0) < 5e-6, (prev, sum(ps))


def test_mase_components_positive_and_ratio_consistent(spark):
    for r in _rows(spark, "events_seasonal_mase"):
        assert r.mae_naive > 0 and r.mae_snaive > 0, r
        assert abs(r.mase_ratio - r.mae_snaive / r.mae_naive) < 1e-5, r


def test_gopher_reject_counts_bounded_by_docs(spark):
    rows = _rows(spark, "llmops_gopher_reject_rates")
    assert rows
    for r in rows:
        for c in ("rej_ttr", "rej_topword", "rej_wordlen", "rej_stopword"):
            assert 0 <= getattr(r, c) <= r.n_docs, r
        assert 0 <= r.reject_rate_any <= 1, r
        # any-rate can't be below the largest single rule's rate
        assert r.reject_rate_any * r.n_docs + 1e-6 >= max(
            r.rej_ttr, r.rej_topword, r.rej_wordlen, r.rej_stopword
        ), r


def test_domain_reweight_weights_clamped_and_consistent(spark):
    rows = _rows(spark, "llmops_domain_reweight")
    assert rows
    for r in rows:
        assert 0.1 <= r.weight <= 2.0, r
        if r.capped:
            assert r.weight == 2.0, r
        assert abs(r.effective_tokens - r.n_tokens * r.weight) <= 0.5 + 1e-6 * r.n_tokens, r
    # shares are a distribution
    assert abs(sum(r.actual_share for r in rows) - 1.0) < 5e-5


def test_knn_audit_counts_consistent(spark):
    (r,) = _rows(spark, "llmops_knn_graph_audit")
    assert r.n_edges == r.n_queries * 5
    assert r.n_neighbors <= r.n_edges
    assert 0 <= r.n_reciprocal <= r.n_edges
    assert abs(r.mean_k_occurrence - r.n_edges / r.n_neighbors) < 1e-5
    assert r.max_k_occurrence >= 1


def test_modularity_bounds(spark):
    (r,) = _rows(spark, "graph_modularity_score")
    # Newman modularity is bounded in [-1/2, 1)
    assert -0.5 <= r.modularity < 1.0, r


def test_length_bias_measures_bounded(spark):
    (r,) = _rows(spark, "llmops_response_length_bias")
    assert 0 <= r.frac_chosen_longer <= 1
    assert -1 <= r.corr_margin_len_delta <= 1
    assert r.n_chosen_longer <= r.n_pairs


def test_arrival_gap_rates_consistent(spark):
    for r in _rows(spark, "dq_arrival_gap_audit"):
        assert r.max_gap_s >= r.mean_gap_s, r
        assert 0 <= r.stall_rate <= 1, r
        assert r.n_gaps_gt_1h <= r.n_gaps, r


def test_lifecycle_identity_and_flow_balance(spark):
    rows = sorted(_rows(spark, "events_user_lifecycle_states"), key=lambda r: r.day_index)
    assert rows
    for r in rows:
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected, r
    # flow balance: active_t = active_{t-1} + new_t + resurrected_t - churned_t
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_active == prev.n_active + cur.n_new + cur.n_resurrected - cur.n_churned, (
            prev,
            cur,
        )
    # daily grain must exercise every state somewhere in the window
    assert sum(r.n_resurrected for r in rows) > 0
    assert sum(r.n_churned for r in rows) > 0


def test_ratio_ci_brackets_point_estimate(spark):
    for r in _rows(spark, "agg_ratio_delta_method_ci"):
        assert r.se > 0, r
        assert r.ci_lo < r.ratio_cents_per_order < r.ci_hi, r
        assert abs((r.ci_hi - r.ci_lo) - 2 * 1.96 * r.se) < 2e-5, r
