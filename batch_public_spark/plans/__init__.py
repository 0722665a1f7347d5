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
    # Round 8 rotation. The cumulative driver-attested union reached
    # 280/280 in r7, so this window carries only (a) plans changed in r8
    # (re-attest per the rotation policy) and (b) r8 additions, appended
    # as they land.
    # --- changed in r8 (r7 ADVICE fixes) after last driver check ---
    "dq_mannwhitney_length_drift",  # sigma>0 / n>1 derived-divisor guard
    "agg_skew_kurtosis_exact",  # oracle: nested guard, sqrt only on var>0
    "udtf_corruption_spans",  # explicit [ \t\n\r\f] whitespace class, both engines
    "source_kvscan_segmented",  # permissive-mode drop counters + warning
    # cosine() now divides sequentially (dot/na/nb) — inside every ANN plan:
    "llmops_ann_bruteforce",
    "llmops_ann_lsh",
    "llmops_ann_ivf",
    "llmops_ann_ivf_lloyd_recall",
    "llmops_hard_negatives",
    # llmops_boilerplate_sentence_filter: one-exchange rewrite (two-level
    # agg + sh-window replaces the df join; xxhash64 segment keys)
    "llmops_boilerplate_sentence_filter",
    # --- added in r8 ---
    "dq_cramers_v",
    "dq_js_divergence",
    "llmops_mojibake_detect",
    "llmops_readability_score",
    "llmops_containment_neardup",
    "llmops_chunk_boundary_dup",
    "llmops_pq_codebook",
    "llmops_jl_projection_distortion",
    "graph_kcore_peel",
    "stream_stream_leftouter",
    "stream_chained_agg",
    "dq_autocorr_lag",
    "agg_grouping_id_battery",
    "llmops_ann_pq_adc",
    "graph_bfs_distance",
    "graph_label_propagation",
    "sql_listagg_group_by_all",
    "window_ignore_nulls_battery",
    "scalar_try_arithmetic_battery",
    "llmops_semdedup_clusters",
    "llmops_curriculum_phases",
    "llmops_lsh_param_planner",
    "stream_stream_fullouter",
    "events_survival_curve",
    "events_session_window_builtin",
    "dq_welch_ttest_drift",
    "graph_link_prediction",
    "hof_array_battery",
    "map_funcs_battery",
    "scalar_xml_roundtrip",
    "llmops_preference_pairs",
    "events_holt_linear",
    "agg_ols_two_feature",
    "agg_theil_sen_slope",
    "events_burstiness",
    "source_binaryfile_ingest",
    "dq_fk_orphan_audit",
    "llmops_code_detect",
    # --- placeholders (stalest-attested names, all r1; swapped out
    # one-for-one as r8 queries land — re-attesting them is harmless and
    # refreshes the oldest evidence) ---
    "join_broadcast_geo",
    "join_cross_region_segment",
]

# Overflow queue for names that do not fit the current 50-entry window;
# they are the mandatory head of the next round's _PRIORITY rotation.
# tests/test_registry_rotation.py fails if a registered query is in none of
# {driver-attested union, _PRIORITY[:50], _NEXT_WINDOW}.
_NEXT_WINDOW: list[str] = [
    # r8 additions that did not fit the 50-entry r8 window — mandatory
    # head of the r9 rotation.
    "sql_pivot_unpivot_roundtrip",
    "scalar_csv_funcs",
    "llmops_uncertainty_sample",
    "llmops_hybrid_rrf_fusion",
    "llmops_matryoshka_recall",
    "scalar_url_funcs",
    "udaf_trimmed_mean_price",
    "llmops_winnowing_fingerprints",
    "events_top_paths",
    "llmops_binary_embedding_recall",
    "events_forecast_backtest",
    "llmops_ann_nprobe_sweep",
    "llmops_cluster_label_nmi",
    "llmops_shuffle_quality_audit",
    "llmops_kcenter_seeding",
    "events_cohort_ltv_matrix",
    "scalar_rounding_battery",
    "source_schema_evolution_merge",
    "llmops_spec_decode_acceptance",
    "llmops_rerank_cascade_recall",
    "join_dynamic_partition_pruning",
    "llmops_maxsim_multivector",
    "llmops_mmr_diversified_topk",
    "llmops_bpe_apply_merges",
    "llmops_entropy_rate_bigram",
    "llmops_watermark_detect",
    "events_rate_limit_sim",
    "dq_effective_sample_size",
    "llmops_best_of_n_curve",
    "pipeline_cost_accounting",
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
