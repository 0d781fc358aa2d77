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
        ("saurav_nayak_recipe_etl_project_spark.operators.linedup", "LINEDUP_QUERIES", "LINEDUP_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.similarity", "SIMILARITY_QUERIES", "SIMILARITY_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.text", "TEXT_QUERIES", "TEXT_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.multimodal", "MULTIMODAL_QUERIES", "MULTIMODAL_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.asof", "ASOF_QUERIES", "ASOF_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.delta", "DELTA_QUERIES", "DELTA_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.rangejoin", "RANGEJOIN_QUERIES", "RANGEJOIN_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.topk", "TOPK_QUERIES", "TOPK_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.packing", "PACKING_QUERIES", "PACKING_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.retrieval", "RETRIEVAL_QUERIES", "RETRIEVAL_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.semdedup", "SEMDEDUP_QUERIES", "SEMDEDUP_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.vector_index", "VECTOR_INDEX_QUERIES", "VECTOR_INDEX_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.graph", "GRAPH_QUERIES", "GRAPH_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.fuzzy", "FUZZY_QUERIES", "FUZZY_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.skyline", "SKYLINE_QUERIES", "SKYLINE_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.privacy", "PRIVACY_QUERIES", "PRIVACY_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.linalg", "LINALG_QUERIES", "LINALG_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.operators.kmeans", "KMEANS_QUERIES", "KMEANS_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.pipelines", "PIPELINE_QUERIES", "PIPELINE_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.plans.temporal", "TEMPORAL_QUERIES", "TEMPORAL_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.plans.profiling", "PROFILING_QUERIES", "PROFILING_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.plans.advanced", "ADVANCED_QUERIES", "ADVANCED_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.plans.relational_ext", "RELATIONAL_EXT_QUERIES", "RELATIONAL_EXT_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.plans.regression", "REGRESSION_QUERIES", "REGRESSION_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.plans.sqlfeatures", "SQLFEATURES_QUERIES", "SQLFEATURES_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.events", "STREAMING_QUERIES", "STREAMING_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.sessions", "STREAMING_SESSION_QUERIES", "STREAMING_SESSION_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.joins", "STREAM_JOIN_QUERIES", "STREAM_JOIN_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.doc_dedup", "STREAM_DOC_DEDUP_QUERIES", "STREAM_DOC_DEDUP_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.mv", "STREAM_MV_QUERIES", "STREAM_MV_ORACLES"),
    ]:
        try:
            m = importlib.import_module(mod)
        except ImportError:
            continue
        _register(getattr(m, q_attr, {}), getattr(m, o_attr, {}))


_load_optional()


# The driver oracles only the FIRST 50 registry entries per round.
# ROTATION POLICY (round 6 onward): each round's 50-entry window is
#   (1) every entry whose semantics, oracle, or load-bearing internals
#       changed this round (front-loaded — fresh external rows for
#       every change), then
#   (2) the STALEST entries first — ordered by the round each was last
#       externally verified in (computed from the CORRECTNESS_r*.json
#       union) — until the window is full.
# With 186 entries and a 50-entry window, stalest-first re-verifies
# every entry within ~6 rounds even in an additive round. Round-8
# window composition, per the round-7 rotation plan (staleness
# computed from the CORRECTNESS_r1..r7 union: 17 entries last
# verified r1, 30 r2, 3 r4, 43 r5):
#   (1) entries whose implementation or load-bearing internals
#       changed in round 8 — the de-weaked global-window plans
#       (pareto/ABC cumsum ranks, window-free vocab coverage, bm25
#       TakeOrdered query terms), the DECIMAL-widened top-p
#       coverage, and every caller migrated to data-derived rank
#       band widths (derive_band_widths + LM-frame checkpoint);
#   (2) new round-8 entries — the Spark-4 SQL surface, then the
#       continuation-session additions (profile / fuzzy / attribution
#       / entropy / k-core / KMV algebra / decayed value / gaps /
#       bounded as-of / PSI / funnel3 / bounce / brand triples) and
#       the two entries migrated to the two-phase salted top-k;
#   (3) stalest-first fill: ALL 17 remaining r1 entries, then the
#       r2 tail alphabetically until the window cuts at 50. With 31
#       changed/new names up front the window is 31 + 17 r1 + the
#       first 2 r2 names — the r1 debt still fully retires this
#       round; r9's fill starts at the r2 remainder (~28) + r4 trio,
#       then the r5 block (full rotation closes ~r11).
_DRIVER_PRIORITY = [
    # -- (1) changed in round 8 --
    "part_revenue_pareto",
    "part_abc_classification",
    "vocab_coverage",
    "bm25_search",
    "source_topp_coverage",
    "customer_rfm",
    "perplexity_buckets",
    "quality_lm_spearman",
    "price_quantity_decile_heatmap",
    "funnel_time_to_convert",
    # -- (2) new in round 8 (inserted as they land) --
    "orders_groupby_all",
    "customer_segments_orderby_all",
    "order_metrics_unpivot_nulls",
    "ann_hard_negatives",
    "region_nation_roster",
    "event_type_frequency_sketch",
    "table_profile_lineitem",
    "part_name_near_collisions",
    "attribution_credit",
    "source_token_entropy",
    "copurchase_kcore",
    "kmv_user_overlap",
    "segment_decayed_value",
    "orderkey_gap_islands",
    "asof_latest_view_30m",
    "order_value_psi",
    "funnel_three_step",
    "session_bounce_rate",
    "brand_triples",
    # changed late-r8: two-phase salted per-group top-k replaced the
    # group-sized windows (sketch trim + stratum sample)
    "kmv_distinct_users",
    "stratified_sample",
    # -- (3a) stalest: last externally verified in round 1 (all 17) --
    "part_revenue_rank",
    "parts_in_urgent_orders",
    "priority_distribution",
    "q4_priority_with_big_items",
    "q7_volume_shipping",
    "returned_vs_global",
    "schema_map_orders",
    "text_repetition",
    "top_customers",
    "top_open_order_part",
    "top_parts",
    "validate_customer",
    "validate_events",
    "validate_lineitem",
    "validate_orders",
    "validate_part",
    "validate_supplier",
    # -- (2b) new in the second continuation session: placed BELOW the
    #    r1-stale block (unlike earlier new entries) so the round-8
    #    window still retires the whole r1 debt — these were verified
    #    at 3 SFs locally at birth, while the r1 entries carry 7
    #    rounds of drift exposure; whatever misses the 50-cut leads
    #    round 9 (the benford-at-position-51 precedent from r6) --
    "session_concurrency_peak",
    "order_line_proration",
    "brand_audience_overlap",
    "rrf_hybrid_search",
    "distinctive_terms_logodds",
    "part_name_entity_resolution",
    "part_price_size_skyline",
    "key_candidate_profile",
    "embedding_label_separation",
    "ann_matryoshka_recall",
    "segment_trend_theilsen",
    "phrase_bigram_scores",
    "source_js_divergence",
    "langid_agreement",
    "pseudonymized_segment_report",
    "neyman_allocation",
    "customer_feature_store",
    "embedding_gram_matrix",
    "session_daily_load",
    "view_purchase_lead_lag",
    "embedding_kmeans",
    "daily_event_acf",
    # -- (3b) next-stalest: last verified in round 2, alphabetical
    #    (the window cuts at 50 inside this block) --
    "asof_latest_order",
    "customer_part_baskets",
    "docs_by_source",
    "event_anomalies",
    "event_value_quartiles",
    "lineitem_stats",
    "monthly_revenue_growth",
    "multimodal_byte_histogram",
    "multimodal_frames",
    "multimodal_meta",
    "orders_status_pivot",
    "part_degree_distribution",
    "parts_bought_together",
    "price_histogram",
    "price_quantiles",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_large_orders",
    "redact_numbers",
    "revenue_rollup",
    # -- below the 50-cut: the r2 leftovers, then the r4 trio —
    #    round 9's fill leads here --
    "rolling_weekly_revenue",
    "sample_documents",
    "severity_by_status",
    "split_assignment",
    "text_fingerprint",
    "text_langid",
    "tfidf_top_terms",
    "top_event_users",
    "view_purchase_attribution",
    "view_purchase_funnel",
    "text_langid_ngram",
    "text_quality",
    "text_token_count",
]


def _reorder() -> None:
    """Mutate QUERIES in place so iteration follows _DRIVER_PRIORITY."""
    ordered = {n: QUERIES[n] for n in _DRIVER_PRIORITY if n in QUERIES}
    for name, fn in list(QUERIES.items()):
        ordered.setdefault(name, fn)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()
