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
    # Round 12 rotation. Head = the ENTIRE r11 _NEXT_WINDOW backlog (34
    # names, verdict-r11 item #1): 13 r11 additions with no driver
    # attestation on record, then the 21 post-rotation/degenerate-guard
    # re-attests. The r11-ADVICE fixes (try_divide in did/zstat/MAPE,
    # simhash pre-spread NULL filter, changelog permissive type guard)
    # all touch names inside this head, so they attest with the fixes in.
    # Tail = 16 stalest refreshes (the r2-attested cohort, stalest-first
    # per verdict item #7); the remaining 16 r2 names are scheduled in
    # _NEXT_WINDOW below.
    # --- r11 additions, never in a CORRECTNESS record ---
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
    # --- late-r11 degenerate-guard / post-rotation re-attests ---
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
    # --- stalest-first refreshes: 16 of the 32 remaining r2-attested
    # names (alphabetical; the other 16 are first in _NEXT_WINDOW) ---
    "agg_bool_filtered",
    "agg_median_orders",
    "agg_string_concat",
    "array_sequence_fold",
    "lateral_top2_per_nation",
    "llmops_bloom_dedup",
    "llmops_chunk_documents",
    "llmops_decontaminate",
    "llmops_dedup_exact",
    "llmops_domain_mix",
    "llmops_pii_redact",
    "llmops_quality_classifier",
    "llmops_repetition_filter",
    "llmops_sequence_pack",
    "llmops_source_overlap",
    "llmops_stratified_sample",
]

# Overflow queue for names that do not fit the current 50-entry window;
# they are the mandatory head of the next round's _PRIORITY rotation.
# tests/test_registry_rotation.py fails if a registered query is in none of
# {driver-attested union, _PRIORITY[:50], _NEXT_WINDOW}.
_NEXT_WINDOW: list[str] = [
    # The second half of the r2-attested stale cohort (refresh scheduled
    # for the r13 window head; after it lands, no attestation predates
    # r3 and the cohort math closes verdict-r11 item #7).
    "llmops_tfidf_top_terms",
    "llmops_train_shuffle",
    "q12_late_priority",
    "q13_customer_distribution",
    "q22_low_activity_customers",
    "q4_priority_exists",
    "scalar_map_access",
    "scalar_null_battery",
    "scalar_regexp_extract_all",
    "sql_recursive_date_spine",
    "stream_static_enrich",
    "udaf_grouped_median_quantity",
    "udtf_top_bigrams",
    "values_inline_dim_join",
    "window_first_last_nth",
    "window_percent_rank",
    # --- r12 additions (registered this round, attest in r13) ---
    "eval_dr_policy_value",
    "eval_conformal_approx",
    "llmops_bitext_margin_ann",
    "stream_changelog_segmented_agg",
    "eval_poisson_bootstrap_ci",
    "llmops_ngram_lm_perplexity",
    "dq_cusum_changepoint",
    "dq_dp_noisy_release",
    "llmops_unicode_nfc_dedup",
    "llmops_source_ablation",
    "llmops_filter_disparity_audit",
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
