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
        ("saurav_nayak_recipe_etl_project_spark.operators.delta", "DELTA_QUERIES", "DELTA_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.rangejoin", "RANGEJOIN_QUERIES", "RANGEJOIN_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.topk", "TOPK_QUERIES", "TOPK_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.packing", "PACKING_QUERIES", "PACKING_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.plans.temporal", "TEMPORAL_QUERIES", "TEMPORAL_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.plans.profiling", "PROFILING_QUERIES", "PROFILING_ORACLES"),
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


# The driver oracles only the FIRST 50 registry entries per round.  The
# r1-r4 union covers all 107 queries; round 5 front-loads the three
# entries whose semantics/oracles changed this round (fixed-size kNN
# sample, the recall-bounds harness, the newly-oracled LSH-verified
# dedup), then the broad repeats.
_DRIVER_PRIORITY = [
    # -- new in round 5 --
    "pack_sequences",
    "rebalance_sources",
    "orders_grouping_sets",
    # -- changed in round 5: need fresh driver rows --
    "ann_knn_label_accuracy",
    "ann_recall_at_k",
    "dedup_lsh_verified",
    "dedup_clusters",
    # -- round-2 snapshot-commit TPC-H tail --
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "q21_returned_alone_suppliers",
    "q22_idle_customers",
    # -- embedding dedup: bucketed scale path is now the default
    #    (rows-only) with the exact form as its oracle twin --
    "dedup_embedding",
    "dedup_embedding_exact",
    # -- new in round 3 --
    "q12_priority_by_linestatus",
    "q16_supplier_part_counts",
    "cohort_retention",
    "event_transitions",
    "gapfill_daily_revenue",
    "snapshot_diff",
    "cdc_apply",
    "stratified_sample",
    "approx_distinct_bounds",
    "skew_diagnostics",
    "range_join_windows",
    "quality_filter_pipeline",
    "ann_nearest_centroid",
    "topk_parts_per_brand",
    "weekly_active_breakdown",
    # -- semantics changed in round 3: needs fresh external rows --
    "dedup_ngram_jaccard",
    "price_quantiles_approx",
    # -- rows-only ANN/sketch tail last verified in round 1 --
    "ann_lsh_bucketed",
    "ann_ivf_topk",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # -- streaming batch twins: the round-5 unit fix touched their
    #    shared reader, so they need fresh driver rows this round --
    "stream_events_window",
    "sessionize_events",
    "dedup_stream_lsh_batch",
    # -- load-bearing repeats (stable green rows; trimmed so the
    #    round-5 additions fit the driver's 50-entry window) --
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "validation_report",
    "dedup_exact",
    "dedup_contamination",
    "documents_deduped",
    "ann_cosine_topk",
    "text_token_count",
    "text_quality",
    "text_langid_ngram",
]


def _reorder() -> None:
    """Mutate QUERIES in place so iteration follows _DRIVER_PRIORITY."""
    ordered = {n: QUERIES[n] for n in _DRIVER_PRIORITY if n in QUERIES}
    for name, fn in list(QUERIES.items()):
        ordered.setdefault(name, fn)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()
