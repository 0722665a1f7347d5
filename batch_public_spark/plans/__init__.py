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
    # Round 14 rotation. Head = the ENTIRE r13 _NEXT_WINDOW (31 names,
    # verdict-r13 item #1): 12 r3-cohort stale refreshes (after they land,
    # no attestation predates r5), then the 19 r13 additions with zero
    # driver attestations (judge-verified r13, attestation pinned here).
    # Tail = 19 stalest refreshes from the r5-attested cohort (42 names,
    # alphabetical; the remaining 23 lead _NEXT_WINDOW — verdict-r13
    # item #3 schedules the cohort's completion for the r15 head).
    # --- r3-cohort refreshes (final 12, scheduled r13) ---
    "pipeline_dedup_key_priority",
    "pipeline_llm_roundtrip",
    "pipeline_parse_outputs",
    "pipeline_request_build",
    "pipeline_watermark_filter",
    "scalar_try_cast_battery",
    "stream_dedup_watermark",
    "stream_session_windows",
    "stream_sliding_counts",
    "stream_stateful_running_max",
    "string_funcs_extended",
    "window_cume_dist_orders",
    # --- r13 additions, never in a CORRECTNESS record ---
    "llmops_bpe_train_merges",
    "eval_conformal_mondrian",
    "dq_dp_budget_accountant",
    "llmops_corpus_build_e2e",
    "eval_calibration_ece",
    "llmops_semantic_decontaminate",
    "llmops_wordpiece_train_merges",
    "dq_l_diversity",
    "dq_mann_kendall_trend",
    "events_logrank_test",
    "llmops_nb_quality_distill",
    "llmops_dsir_selection",
    "dq_t_closeness",
    "dq_permutation_test",
    "events_cuped_adjustment",
    "events_hits_bipartite",
    "llmops_good_turing_unseen",
    "llmops_cdc_chunking",
    "agg_ddsketch_quantiles",
    # --- stalest-first refreshes: 19 of the 42 r5-attested names
    # (alphabetical; the other 23 lead _NEXT_WINDOW) ---
    "agg_approx_distinct_accuracy",
    "agg_approx_percentile_accuracy",
    "agg_conditional_battery",
    "agg_mode_orders",
    "cdc_snapshot_merge",
    "cust_rfm_segments",
    "dq_orders_mad_outliers",
    "events_cohort_retention_matrix",
    "events_gapfill_locf",
    "events_hypertable_rollup",
    "events_idle_gap_stats",
    "events_rate_spike_detect",
    "events_rolling_distinct_users",
    "graph_triangle_count",
    "join_bucketed_colocated",
    "join_orders_within_week",
    "join_range_containment",
    "llmops_bloom_incremental_roundtrip",
    "llmops_bm25_topk",
]

# Overflow queue for names that do not fit the current 50-entry window;
# they are the mandatory head of the next round's _PRIORITY rotation.
# tests/test_registry_rotation.py fails if a registered query is in none of
# {driver-attested union, _PRIORITY[:50], _NEXT_WINDOW}.
_NEXT_WINDOW: list[str] = [
    # The last 23 of the r5-attested stale cohort (refresh scheduled for
    # the r15 window head; after it lands, no attestation predates r6 and
    # the cohort math closes verdict-r13 item #3).
    "llmops_bpe_first_merges",
    "llmops_dataset_card",
    "llmops_embedding_pca_power",
    "llmops_groupwise_zscore",
    "llmops_label_encode",
    "llmops_minhash_estimator_accuracy",
    "llmops_multimodal_frames",
    "llmops_pmi_collocations",
    "llmops_prefix_dedup_groups",
    "llmops_rouge_overlap_pairs",
    "llmops_span_corruption_stats",
    "llmops_term_pagerank",
    "llmops_url_canonicalize",
    "maintenance_zorder_stats",
    "mv_incremental_refresh",
    "sample_deterministic_per_group",
    "scalar_variant_props_battery",
    "scd2_event_type_history",
    "source_csv_roundtrip",
    "source_orc_roundtrip",
    "stream_stream_join",
    "window_rolling_7day_spend",
    "window_value_functions_battery",
    # --- r14 additions (registered this round, attest in r15) ---
    "llmops_kn_lm_perplexity",
    "events_cox_hazard",
    "llmops_substring_dedup",
    "llmops_unigram_lm_train",
    "dq_bh_fdr",
    "llmops_ql_dirichlet_topk",
    "llmops_heaps_law",
    "eval_isotonic_calibration",
    "events_nelson_aalen",
    "events_jackknife_ratio",
    "events_sprt_monitor",
    "eval_platt_scaling",
    "cust_uplift_qini",
    "events_overdispersion",
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
