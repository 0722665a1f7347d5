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
# Round 7 rotation (verdict-r6 items #2/#3): the 31 names carried in r6's
# _NEXT_WINDOW lead this window (completing 276/276 cumulative driver
# attestation), followed by the plans whose expressions changed in r7 and
# therefore need re-attestation under the rotation policy:
#   - llmops_embedding_quantize_error / events_bounce_rate_daily changed
#     this round but were already in the 31 (denormal scale guard; (ts,
#     event_id) running-sum tiebreak);
#   - agg_skew_kurtosis_exact gained a derived-divisor guard (NULL shape
#     moments for constant groups);
#   - the cosine() denormal guard (operators/semantic.py) is inside the
#     plan expression of every ANN query → re-attest llmops_ann_bruteforce,
#     llmops_ann_lsh (rows-only), llmops_ann_ivf, llmops_ann_ivf_lloyd_recall,
#     llmops_hard_negatives;
#   - the kvscan permissive Arrow fallback changed the custom DataSource →
#     re-attest source_kvscan_segmented.
# Remaining slots carry this round's additions. tests/test_registry_rotation.py
# enforces that every registered query is driver-attested, in this window,
# or in _NEXT_WINDOW (and that _NEXT_WINDOW fits a single future window).
_PRIORITY = [
    # --- the 31 never-driver-verified names pinned by r6's _NEXT_WINDOW ---
    "setop_bag_semantics",
    "agg_multi_distinct",
    "subquery_not_in_null_trap",
    "source_jsonl_roundtrip",
    "date_interval_battery",
    "window_order_streaks",
    "dq_schema_contract_check",
    "events_dow_hour_profile",
    "llmops_boilerplate_sentence_filter",
    "events_journey_pattern_match",
    "llmops_dataset_mixture_epochs",
    "events_time_to_convert",
    "dq_benford_first_digit",
    "agg_gini_daily_revenue",
    "llmops_kl_source_divergence",
    "join_salted_hotkey",
    "llmops_domain_quota_cap",
    "llmops_group_split_leakage_safe",
    "llmops_stratified_sample_exact",
    "llmops_intradoc_repetition",
    "events_funnel_steps",
    "llmops_embedding_quantize_error",  # also changed r7: scale>0 denormal guard
    "llmops_importance_resample",
    "events_bounce_rate_daily",  # also changed r7: (ts, event_id) tiebreak
    "dq_dp_noisy_counts",
    "join_asof_direction_battery",
    "llmops_embedding_centroid_drift",
    "llmops_dup_cluster_size_dist",
    "events_interarrival_histogram",
    "llmops_vocab_coverage_curve",
    "llmops_char_entropy_quality",
    # --- changed in r7 after last driver check: re-attest ---
    "agg_skew_kurtosis_exact",
    "llmops_ann_bruteforce",
    "llmops_ann_lsh",
    "llmops_ann_ivf",
    "llmops_ann_ivf_lloyd_recall",
    "llmops_hard_negatives",
    "source_kvscan_segmented",
    # --- recalibrated in r7 (vacuous-fixture audit): plans whose fixture
    # output was constant or empty, so their hash-matches verified nothing;
    # each changed in both engines → re-attest ---
    "join_anti_customers_without_orders",
    "llmops_token_count_compare",
    "llmops_text_metrics",
    "llmops_tokenizer_fertility",
    "llmops_sentence_stats",
    "llmops_oov_rate",
    "llmops_temperature_mix",
    "graph_clustering_coefficient",
    # --- added in r7 (4 slots; attested placeholders below are swapped
    # out one-for-one as r7 queries land — re-attesting them is harmless) ---
    "udtf_corruption_spans",
    "llmops_rater_agreement_kappa",
    "dq_mannwhitney_length_drift",
    "llmops_pair_sim_histogram",
]

# Overflow queue for names that do not fit the current 50-entry window;
# they are the mandatory head of the next round's _PRIORITY rotation.
# tests/test_registry_rotation.py fails if a registered query is in none of
# {driver-attested union, _PRIORITY[:50], _NEXT_WINDOW}.
_NEXT_WINDOW: list[str] = []


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
