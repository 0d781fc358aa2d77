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
        ("saurav_nayak_recipe_etl_project_spark.operators.corpus_audit", "CORPUS_AUDIT_QUERIES", "CORPUS_AUDIT_ORACLES"),
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
        ("saurav_nayak_recipe_etl_project_spark.plans.twosample", "TWOSAMPLE_QUERIES", "TWOSAMPLE_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.plans.sqlfeatures", "SQLFEATURES_QUERIES", "SQLFEATURES_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.events", "STREAMING_QUERIES", "STREAMING_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.sessions", "STREAMING_SESSION_QUERIES", "STREAMING_SESSION_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.joins", "STREAM_JOIN_QUERIES", "STREAM_JOIN_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.doc_dedup", "STREAM_DOC_DEDUP_QUERIES", "STREAM_DOC_DEDUP_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.mv", "STREAM_MV_QUERIES", "STREAM_MV_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.pair_mv", "STREAM_PAIR_MV_QUERIES", "STREAM_PAIR_MV_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.drift", "STREAM_DRIFT_QUERIES", "STREAM_DRIFT_ORACLES"),
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
# Round-10 window composition, per the round-9 verdict directive
# (staleness computed fresh from the CORRECTNESS_r1..r9 union at
# round-10 start: 27 never driver-windowed — all judge-verified green
# at sf0.01 in VERDICT r9 — 9 r2, 3 r4, 42 r5, 33 r6, 41 r7, 50 r8,
# 50 r9):
#   (1) changed in round 10: the two DECIMAL-output fixes
#       (embedding_kmeans → BIGINT inertia/norm with loud overflow
#       guards; embedding_gram_matrix → plain-digit STRING g), the
#       NINE with_grouped_rank callers (null-safe group-key joins —
#       the r9 ADVICE fix; values proven unchanged at 2 SFs + plain
#       NY), simhash_radius_audit (pair-frame checkpoint + codes
#       unpersist), and q11_analog_supply_share (supplier broadcast
#       hint dropped — planner/AQE chooses);
#   (2) the remaining never-driver-windowed r9 entries (23 after the
#       4-entry overlap with (1));
#   (3) stalest fill: the 9 r2 + 3 r4 blocks in full, then the r5
#       block alphabetically — the cut lands after
#       ann_knn_label_accuracy (2 of 42 r5 fit).
# ROUND-11 FILL PLAN (computed at r10 close so the window stays
# mechanical): after r11's changed entries (front), the NINE r10-born
# entries (below the cut this round per the r8c precedent — verified
# at 2 SFs + plain NY + hostile local[3]/AQE-off/Tokyo at birth:
# source_mixture_weights, token_fertility_by_lang,
# embedding_dim_clip_stats, diversity_sample_balanced,
# q2_analog_min_cost_supplier, q20_analog_dominant_shippers,
# shingle_df_spectrum, embedding_qc_pipeline, text_char_entropy),
# then the r5 block alphabetically from ann_nearest_centroid (40
# remaining), then the r6 block (33) — full rotation closes ~r12-r13.
_DRIVER_PRIORITY = [
    # -- (1) changed in round 10 --
    "embedding_kmeans",
    "embedding_gram_matrix",
    # the nine with_grouped_rank callers (null-safe group-key joins)
    "event_anomalies_mad",
    "order_value_median_mode",
    "order_value_trimmed_mean",
    "event_value_quartiles",
    "weighted_median_price",
    "monthly_order_value_percentiles",
    "event_interarrival_disc",
    "event_value_percentiles_exact",
    "customer_interpurchase_time",
    # cache-leak fix (pair-frame localCheckpoint + codes unpersist)
    "simhash_radius_audit",
    # supplier broadcast hint dropped
    "q11_analog_supply_share",
    # -- (2) never driver-windowed (r9 additions, judge-verified
    #    green at sf0.01 in VERDICT r9) --
    "brand_price_dispersion",
    "corpus_release_pipeline",
    "daily_error_rate_wilson",
    "daily_type_mix_drift",
    "dedup_keep_best",
    "dedup_source_matrix",
    "embedding_outliers_mad",
    "k_anonymity_audit",
    "monthly_revenue_stl",
    "order_value_ks_test",
    "orders_backlog_aging",
    "orders_pipe_summary",
    "part_recommendations_topn",
    "priority_value_anova",
    "priority_value_mannwhitney",
    "quality_threshold_sweep",
    "quantity_discount_kendall",
    "revenue_anomalies_stl",
    "revenue_forecast_backtest",
    "segment_priority_pmi",
    "source_dup_exposure",
    "split_leakage",
    "split_leakage_repair",
    # -- (3) stalest fill: the full r2 block (last verified round 2,
    #    alphabetical) --
    "sample_documents",
    "severity_by_status",
    "split_assignment",
    "text_fingerprint",
    "text_langid",
    "tfidf_top_terms",
    "top_event_users",
    "view_purchase_attribution",
    "view_purchase_funnel",
    # -- the full r4 trio --
    "text_langid_ngram",
    "text_quality",
    "text_token_count",
    # -- r5 block alphabetically; the 50-cut lands after
    #    ann_knn_label_accuracy --
    "ann_cosine_topk",
    "ann_knn_label_accuracy",
    # -- below the 50-cut: the r5 leftovers continue alphabetically
    #    (round 11's fill leads here), then the r6 block --
    "ann_nearest_centroid",
    "approx_distinct_bounds",
    "cdc_apply",
    "cohort_retention",
    "dedup_clusters",
    "dedup_contamination",
    "dedup_embedding_exact",
    "dedup_exact",
    "dedup_lsh_verified",
    "dedup_ngram_jaccard",
    "documents_deduped",
    "event_transitions",
    "gapfill_daily_revenue",
    "orders_grouping_sets",
    "pack_sequences",
    "price_quantiles_approx",
    "q12_priority_by_linestatus",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "q1_pricing_summary",
    "q21_returned_alone_suppliers",
    "q22_idle_customers",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "quality_filter_pipeline",
    "range_join_windows",
    "rebalance_sources",
    "sessionize_events",
    "skew_diagnostics",
    "snapshot_diff",
    "stream_events_window",
    "topk_parts_per_brand",
    "validation_report",
    "weekly_active_breakdown",
]


def _reorder() -> None:
    """Mutate QUERIES in place so iteration follows _DRIVER_PRIORITY."""
    ordered = {n: QUERIES[n] for n in _DRIVER_PRIORITY if n in QUERIES}
    for name, fn in list(QUERIES.items()):
        ordered.setdefault(name, fn)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()
