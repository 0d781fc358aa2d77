"""Single registry of every implemented query/operator (SURVEY.md §2).

QUERIES: name -> callable(spark, sf_dir) -> DataFrame
ORACLES: name -> equivalent DuckDB SQL (omitted for non-SQL-expressible
ops; the driver then records a rows-only check).
"""

from __future__ import annotations

from saurav_nayak_recipe_etl_project_spark.plans.analytics import (
    ANALYTICS_ORACLES,
    ANALYTICS_QUERIES,
)

QUERIES = {}
ORACLES = {}

QUERIES.update(ANALYTICS_QUERIES)
ORACLES.update(ANALYTICS_ORACLES)


def _register(queries: dict, oracles: dict) -> None:
    QUERIES.update(queries)
    ORACLES.update(oracles)


# Optional suites: each module registers its queries; import errors must
# not take down the whole registry (mirrors import-try gating for libs
# that may be absent).
def _load_optional() -> None:
    import importlib

    for mod, q_attr, o_attr in [
        ("saurav_nayak_recipe_etl_project_spark.operators.normalize", "NORMALIZE_QUERIES", "NORMALIZE_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.validation", "VALIDATION_QUERIES", "VALIDATION_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.dedup", "DEDUP_QUERIES", "DEDUP_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.similarity", "SIMILARITY_QUERIES", "SIMILARITY_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.text", "TEXT_QUERIES", "TEXT_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.multimodal", "MULTIMODAL_QUERIES", "MULTIMODAL_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.asof", "ASOF_QUERIES", "ASOF_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.plans.advanced", "ADVANCED_QUERIES", "ADVANCED_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.events", "STREAMING_QUERIES", "STREAMING_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.sessions", "STREAMING_SESSION_QUERIES", "STREAMING_SESSION_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.joins", "STREAM_JOIN_QUERIES", "STREAM_JOIN_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.doc_dedup", "STREAM_DOC_DEDUP_QUERIES", "STREAM_DOC_DEDUP_ORACLES"),
    ]:
        try:
            m = importlib.import_module(mod)
        except ImportError:
            continue
        _register(getattr(m, q_attr, {}), getattr(m, o_attr, {}))


_load_optional()


# The driver oracles only the FIRST 50 registry entries per round.  Round 1
# verified the original first 50; round 2 front-loads the 30 queries that
# had no driver row yet (advanced/streaming/multimodal/text tail) plus any
# new round-2 queries, then the most load-bearing repeats, so every query
# earns an externally-confirmed CORRECTNESS row across rounds.
_DRIVER_PRIORITY = [
    # -- never driver-verified in round 1 (registry tail [50:80]) --
    "text_langid",
    "text_fingerprint",
    "multimodal_meta",
    "multimodal_frames",
    "multimodal_byte_histogram",
    "asof_latest_order",
    "lineitem_stats",
    "severity_by_status",
    "event_anomalies",
    "parts_bought_together",
    "part_degree_distribution",
    "price_histogram",
    "monthly_revenue_growth",
    "sample_documents",
    "split_assignment",
    "redact_numbers",
    "event_value_quartiles",
    "customer_part_baskets",
    "view_purchase_funnel",
    "docs_by_source",
    "revenue_rollup",
    "orders_status_pivot",
    "price_quantiles",
    "price_quantiles_approx",
    "rolling_weekly_revenue",
    "tfidf_top_terms",
    "stream_events_window",
    "top_event_users",
    "sessionize_events",
    "view_purchase_attribution",
    # -- new in round 2 (registered by their suites; no-op if absent) --
    "ann_recall_at_k",
    "text_langid_ngram",
    "dedup_stream_lsh_batch",
    # -- load-bearing repeats from the round-1 driver-verified set --
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_orders",
    "q14_promo_effect",
    "validation_report",
    "dedup_exact",
    "dedup_lsh_verified",
    "dedup_embedding",
    "dedup_contamination",
    "documents_deduped",
    "ann_cosine_topk",
    "ann_knn_label_accuracy",
    "text_token_count",
    "text_quality",
]


def _reorder() -> None:
    """Mutate QUERIES in place so iteration follows _DRIVER_PRIORITY."""
    ordered = {n: QUERIES[n] for n in _DRIVER_PRIORITY if n in QUERIES}
    for name, fn in list(QUERIES.items()):
        ordered.setdefault(name, fn)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()
