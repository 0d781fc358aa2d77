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
        ("saurav_nayak_recipe_etl_project_spark.streaming.ann_mv", "ANN_MV_QUERY_FNS", "ANN_MV_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.sources.txlog", "TXLOG_QUERIES", "TXLOG_ORACLES"),
        ("saurav_nayak_recipe_etl_project_spark.streaming.scorecard_mv", "SCORECARD_MV_QUERIES", "SCORECARD_MV_ORACLES"),
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
# Round-11 window composition, per the round-10 verdict directive
# (staleness computed fresh from the CORRECTNESS_r1..r10 union at
# round-11 start: 13 never driver-windowed — ALL judge-verified green
# at sf0.01 in VERDICT r10 — 40 r5, 33 r6, 41 r7, 50 r8, 41 r9,
# 50 r10):
#   (1) changed in round 11: acid_orders_ledger + acid_orders_merge
#       + acid_orders_cdf (NEW — the log-structured ACID table's
#       4-commit life, row-level MERGE, and touched-file change data
#       feed, strict snapshot oracles), stream_ann_index
#       (NEW — the
#       incrementally-maintained IVF index MV, strict full-replay
#       train/assign/probe/rerank oracle), stream_dup_pairs (NEW —
#       the foreachBatch-maintained verified-pair MV, strict
#       exact-pair-set oracle), stream_quality_scorecard (NEW — the
#       F75 dashboard as an additive-counts MV, F75 oracle verbatim),
#       the four r10-ADVICE fixes
#       (token_fertility_by_lang + source_mixture_weights divisor
#       guards, quality_threshold_sweep + dup_exposure_by_quality via
#       the now-total quality_score_micro, simhash_radius_audit via
#       the materialize-gated simhash_banded_pairs) — values proven
#       unchanged at 2 SFs + plain NY + hostile local[3]/AQE-off/
#       Tokyo;
#   (2) ALL remaining never-driver-windowed r10-born entries (10
#       after the 3-entry overlap with (1); the r10 verdict's "13
#       late borns" corrected here — the prior plan comment named
#       only 9, missing F75-F78);
#   (3) stalest fill: the r5 block alphabetically from
#       ann_nearest_centroid — the 50-cut lands after
#       q8_market_share (29 of 40 r5 fit).
# ROUND-12 FILL PLAN (computed at r11 close so the window stays
# mechanical): after r12's changed entries (front), the 11 r5
# leftovers (q9_profit_by_nation_year, quality_filter_pipeline,
# range_join_windows, rebalance_sources, sessionize_events,
# skew_diagnostics, snapshot_diff, stream_events_window,
# topk_parts_per_brand, validation_report,
# weekly_active_breakdown), then the r6 block alphabetically from
# ab_experiment_report (33) — ~44 slots absorbs both blocks, closing
# the full rotation in r12 as planned (oldest staleness becomes r7).
_DRIVER_PRIORITY = [
    # -- (1) changed in round 11 --
    "acid_orders_ledger",
    "acid_orders_merge",
    "acid_orders_cdf",
    "stream_ann_index",
    "stream_dup_pairs",
    "stream_quality_scorecard",
    "token_fertility_by_lang",
    "source_mixture_weights",
    "quality_threshold_sweep",
    "dup_exposure_by_quality",
    "simhash_radius_audit",
    # -- (2) ALL remaining never-driver-windowed r10-born
    #    entries (judge-verified 13/13 green at sf0.01 in
    #    VERDICT r10; 3 of the 13 are already in (1)) --
    "diversity_sample_balanced",
    "doc_length_psi_by_source",
    "embedding_dim_clip_stats",
    "embedding_qc_pipeline",
    "leakage_by_source",
    "q20_analog_dominant_shippers",
    "q2_analog_min_cost_supplier",
    "shingle_df_spectrum",
    "source_quality_scorecard",
    "text_char_entropy",
    # -- (3) stalest fill: the r5 block alphabetically from
    #    ann_nearest_centroid; the 50-cut lands after
    #    q8_market_share --
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
    # -- below the 50-cut: the 11 r5 leftovers (round 12 leads
    #    here), then the r6 block --
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
    "ab_experiment_report",
    "ann_hnsw_topk",
    "ann_index_partitioned_search",
    "ann_index_stream_batch",
    "ann_ivf_topk",
    "ann_lsh_bucketed",
    "ann_recall_at_k",
    "cms_user_counts",
    "decontaminate_5gram",
    "dedup_clusters_star",
    "dedup_embedding",
    "dedup_minhash_lsh",
    "dedup_segments",
    "dedup_semantic",
    "dedup_simhash",
    "dedup_stream_lsh_batch",
    "events_sliding_window",
    "kfold_assignment",
    "length_bucketing",
    "lineitem_corr_matrix",
    "lineitem_hist2d",
    "lineitem_metrics_unpivot",
    "nation_account_setops",
    "order_reconciliation",
    "orders_cube",
    "part_pagerank",
    "priority_status_chi2",
    "quality_weighted_sample",
    "revenue_cusum",
    "revenue_growth_decomposition",
    "session_top_paths",
    "stream_mv_user_stats",
    "training_data_pipeline",
]


def _reorder() -> None:
    """Mutate QUERIES in place so iteration follows _DRIVER_PRIORITY."""
    ordered = {n: QUERIES[n] for n in _DRIVER_PRIORITY if n in QUERIES}
    for name, fn in list(QUERIES.items()):
        ordered.setdefault(name, fn)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()
