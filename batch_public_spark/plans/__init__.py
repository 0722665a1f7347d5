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
    # Round 10 rotation. r9 attested its full 50-entry window hash-green
    # (cumulative union 361/362). The window leads with r9's 12-name
    # _NEXT_WINDOW (mandatory head — attesting them reaches 362/362
    # before this round's changes), then every query whose plan, oracle,
    # or calibration changed in r10, then the r10 additions, then stale
    # r1-attested names to refresh the oldest evidence and keep the
    # window exactly 50.
    # --- r9 overflow (_NEXT_WINDOW of r9, mandatory head) ---
    "llmops_ann_bruteforce",
    "llmops_ann_ivf_lloyd_recall",
    "llmops_ann_lsh",
    "llmops_ann_ivf",
    "llmops_hard_negatives",
    "llmops_minhash_incremental_dedup",
    "setop_except_nations",
    "events_bounce_rate_daily",
    "stream_tumbling_counts",
    "agg_theil_sen_slope",
    "llmops_ngram_jaccard_pairs",
    "llmops_dedup_cc",
    # --- changed in r10 (re-attest per rotation policy) ---
    # fixed-count hash-rank sample (results changed):
    "llmops_knn_graph_audit",
    # O(|V|) broadcast hints dropped (plan-only; hashes unchanged):
    "graph_modularity_score",
    "graph_bfs_distance",
    "q17_small_quantity_revenue",
    "llmops_containment_neardup",
    # SF-proportional data-derived calibrations (q11 hash unchanged at
    # sf0.01; try battery's guarded_sum changed with the new modulus):
    "q11_important_stock",
    "scalar_try_arithmetic_battery",
    # oracle byte-accounting fix (ADVICE r9; hash unchanged on the
    # ASCII fixture):
    "llmops_multimodal_format_sniff",
    # smoothing constants now derived from data cardinality in both
    # engines (ADVICE r9; hashes unchanged at fixture cardinalities):
    "events_markov_transitions",
    "llmops_domain_reweight",
    # --- added in r10 ---
    "llmops_minhash_index_roundtrip",
    "sql_scripting_battery",
    "sql_named_parameters",
    "llmops_url_canonical_dedup",
    "dq_quarantine_bitmap",
    "sql_pipe_syntax_battery",
    "scalar_collation_battery",
    "agg_listagg_within_group",
    "agg_approx_top_k_accuracy",
    "llmops_repeated_span_extract",
    "events_session_anomaly_score",
    "sql_udf_battery",
    # --- placeholders (stalest-attested names, all r1; re-attesting
    # refreshes the oldest evidence and keeps the window exactly 50;
    # r10 additions displace from the BOTTOM of this list) ---
    "agg_approx_distinct",
    "agg_corr_quantity_price",
    "agg_distinct_parts",
    "agg_percentiles_lineitem",
    "agg_salted_hotkey_counts",
    "agg_stats_orders",
    "array_funcs_documents",
    "case_when_segmentation",
    "cube_status_priority",
    "date_funcs_orders",
    "distinct_segments",
    "explode_word_counts",
    "grouping_sets_geo",
    "histogram_totalprice",
    "join_asof_last_click",
    "join_full_outer_daily_priority",
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
