"""Declared query corpus.

Importing this package registers every query into ``registry.QUERIES``.
The driver contract (``__spark_entry__.py``) and the test harness both
consume the registry.

Registration order is deliberate: the round driver's correctness gate
checks a bounded prefix of ``queries()`` (round 1 recorded exactly the
first 50 entries), so the prefix carries the queries with the least prior
verification on record — this round's new suites, the llmops family, and
the pipeline entries the round-1 window missed. Queries already
hash-verified in CORRECTNESS_r01.json sit after them; streaming (rows-only
checks by nature) goes last.
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

# Names pinned to the front of the registry, in order (see module docstring).
_PRIORITY = [
    # Newest additions — no prior correctness record at all.
    "llmops_bloom_dedup",
    "llmops_quality_classifier",
    "llmops_chunk_documents",
    "llmops_weighted_sample",
    "llmops_source_overlap",
    "llmops_pii_redact",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q20_part_volume_suppliers",
    "llmops_decontaminate",
    "llmops_train_shuffle",
    "llmops_domain_mix",
    "llmops_sequence_pack",
    "llmops_multimodal_frames",
    "stream_static_enrich",
    "sql_recursive_date_spine",
    "udaf_grouped_median_quantity",
    "udtf_top_bigrams",
    "llmops_stratified_sample",
    "llmops_repetition_filter",
    "llmops_tfidf_top_terms",
    # Extended TPC-H suite (new last round).
    "q4_priority_exists",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_late_priority",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_variety",
    "q18_large_volume",
    "q19_disjunctive_revenue",
    "q21_waiting_supplier",
    "q22_low_activity_customers",
    # SQL-surface long tail (new this round).
    "window_percent_rank",
    "window_first_last_nth",
    "agg_string_concat",
    "agg_median_orders",
    "agg_bool_filtered",
    "agg_bitwise_lineno",
    "scalar_regexp_extract_all",
    "array_sequence_fold",
    "scalar_map_access",
    "lateral_top2_per_nation",
    "values_inline_dim_join",
    "scalar_null_battery",
    # LLM-data-pipeline operators (first-class; round-1 window missed them).
    "llmops_dedup_exact",
    "llmops_ngram_jaccard_pairs",
    "llmops_minhash_candidates",
    "llmops_minhash_dedup",
    "llmops_simhash_neardup",
    "llmops_embedding_neardup",
    "llmops_ann_bruteforce",
    "llmops_ann_lsh",
    "llmops_ann_ivf",
    "llmops_dedup_cc",
    "llmops_text_metrics",
    "llmops_lang_id",
    "llmops_language_split",
    "llmops_quality_filter",
    "llmops_embedding_normalize",
    "llmops_multimodal_metadata",
    "llmops_multimodal_features",
    "llmops_fingerprint_md5",
    "llmops_fingerprint_modp_pairs",
    # Pipeline entries the round-1 window cut off.
    "pipeline_watermark_filter",
    "pipeline_request_build",
    "pipeline_parse_outputs",
    "pipeline_llm_roundtrip",
    "pipeline_dedup_key_priority",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:  # registration drift is a bug, not a silent downgrade
        raise RuntimeError(f"priority list references unregistered queries: {missing}")
    ordered = {n: QUERIES[n] for n in _PRIORITY}
    ordered.update({n: s for n, s in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "QuerySpec"]
