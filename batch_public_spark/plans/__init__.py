"""Declared query corpus.

Importing this package registers every query into ``registry.QUERIES``.
The driver contract (``__spark_entry__.py``) and the test harness both
consume the registry.

Registration order is deliberate: the round driver's correctness gate
checks a bounded prefix of ``queries()`` (each round records exactly the
first 50 entries), so the prefix carries the queries with the least prior
verification on record: never-driver-verified first, then queries whose
plan or parameters changed this round (results must be re-attested), then
this round's additions. Everything after the prefix has a green row in a
prior round's CORRECTNESS record.
"""

from batch_public_spark.plans.registry import QUERIES, QuerySpec

# Import for registration side effects.
from batch_public_spark.plans import relational  # noqa: F401
from batch_public_spark.plans import tpch_suite  # noqa: F401
from batch_public_spark.plans import sql_surface  # noqa: F401
from batch_public_spark.plans import pipeline_queries  # noqa: F401
from batch_public_spark.plans import llmops_queries  # noqa: F401
from batch_public_spark.plans import curation_queries  # noqa: F401
from batch_public_spark.plans import streaming_queries  # noqa: F401
from batch_public_spark.plans import analytics_queries  # noqa: F401
from batch_public_spark.plans import temporal_queries  # noqa: F401
from batch_public_spark.plans import stats_queries  # noqa: F401
from batch_public_spark.plans import eval_mining_queries  # noqa: F401  # eval/mining/allocation family

# Names pinned to the front of the registry, in order (see module docstring).
# tests/test_registry_rotation.py enforces that every registered query is
# driver-attested, in this window, or in _NEXT_WINDOW (and that
# _NEXT_WINDOW fits a single future window).
_PRIORITY = [
    # Round 11 rotation. r10 attested its full 50-entry window hash-green
    # (cumulative union 374/374; _NEXT_WINDOW was empty, so no overflow
    # head this round). The window carries every query whose plan,
    # oracle, or calibration changed in r11, then the two r11 additions,
    # then ALL remaining r1-attested names plus one r2 name — after this
    # round no attestation predates r2 (the verdict's "max age ≤ 5
    # rounds by r12" is met a round early for the r1 cohort).
    # --- changed in r11 (re-attest per rotation policy) ---
    # O(|V|) degree-table broadcast hints dropped (plan-only; values
    # unchanged — the r10-verdict headline fix):
    "graph_link_prediction",
    # banded theta-join rewrite (plan rebuilt; values unchanged):
    "join_theta_acctbal",
    # forced broadcasts of SF-scaled frames dropped (plan-only):
    "join_salted_hotkey",
    "dq_orders_constraints",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_volume",
    "q19_disjunctive_revenue",
    "q20_part_volume_suppliers",
    "q21_waiting_supplier",
    # canonical_url r10-ADVICE edge fixes + six-variant fixture (VALUES
    # changed — the new no-path/leading-utm variants are in the hash):
    "llmops_url_canonical_dedup",
    # session-hygiene try/finally + UNCACHE (values unchanged):
    "sql_scripting_battery",
    # --- added in r11 ---
    "llmops_repeated_span_removal",
    "llmops_minhash_index_merge",
    # --- stalest-first refreshes: the entire remaining r1 cohort (25)
    # plus the alphabetically-first r2 name to fill the window at 50 ---
    "join_left_order_counts",
    "join_range_late_shipments",
    "join_semi_customers_with_orders",
    "json_funcs_events",
    "math_funcs_lineitem",
    "pipeline_dedup_first_wins",
    "pipeline_json_repair",
    "pipeline_text_extract",
    "pipeline_ts_normalize",
    "pivot_flag_status",
    "rollup_flag_status",
    "sample_deterministic_hash",
    "setop_intersect_nations",
    "setop_union_nations",
    "string_funcs_part",
    "subquery_exists_correlated",
    "subquery_having_big_orders",
    "subquery_scalar_small_qty",
    "topk_orders_per_customer",
    "unpivot_lineitem_measures",
    "window_lag_lead_gaps",
    "window_ntile_quartiles",
    "window_range_frame",
    "window_rank_orders",
    "window_running_revenue",
    "agg_bitwise_lineno",
]

# Overflow queue for names that do not fit the current 50-entry window;
# they are the mandatory head of the next round's _PRIORITY rotation.
# tests/test_registry_rotation.py fails if a registered query is in none of
# {driver-attested union, _PRIORITY[:50], _NEXT_WINDOW}.
_NEXT_WINDOW: list[str] = [
    # r11 additions landed after the 50-entry window filled; mandatory
    # head of the r12 rotation (each parity/lint/stress-verified in-tree).
    # From llmops_knn_graph_audit on: late-r11 degenerate-input-safety
    # fixes (F7 contract, tests/test_empty_inputs.py +
    # tests/test_pathological_inputs.py): value-neutral guards
    # (try_divide, valid_vectors ingest filters), re-attest per the
    # changed-plan rotation policy.
    "llmops_bitext_margin_mining",
    "agg_bitmap_distinct_rollup",
    "llmops_quality_survivorship",
    "llmops_sorted_neighborhood_blocking",
    "llmops_rendezvous_shard_routing",
    "eval_conformal_coverage",
    "eval_ips_policy_value",
    "events_did_estimator",
    "dq_fdr_bh_gate",
    "stream_changelog_tail_agg",
    "llmops_minhash_index_expire",
    "eval_bradley_terry_ratings",
    "eval_woe_iv_binning",
    "llmops_knn_graph_audit",
    "events_markov_stationary",
    "events_forecast_backtest",
    "source_partitioned_pruning",
    "source_binaryfile_ingest",
    "join_dynamic_partition_pruning",
    "llmops_simhash_neardup",
    "llmops_embedding_neardup",
    "llmops_ann_lsh",
    "llmops_ann_ivf",
    "llmops_ann_ivf_lloyd_recall",
    "llmops_ann_nprobe_sweep",
    "llmops_embedding_normalize",
    "llmops_embedding_norm_arrow",
    "llmops_domain_reweight",
    "llmops_token_count_compare",
    "events_survival_curve",
    "llmops_weighted_sample",
    "dq_welch_ttest_drift",
    "llmops_code_detect",
    "dq_arrival_gap_audit",
]


def _reorder() -> None:
    missing = [n for n in (*_PRIORITY, *_NEXT_WINDOW) if n not in QUERIES]
    if missing:  # registration drift is a bug, not a silent downgrade
        raise RuntimeError(f"priority list references unregistered queries: {missing}")
    ordered = {n: QUERIES[n] for n in _PRIORITY}
    ordered.update({n: s for n, s in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "QuerySpec"]
