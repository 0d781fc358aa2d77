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
        ("saurav_nayak_recipe_etl_project_spark.streaming.clipstats_mv", "CLIPSTATS_MV_QUERIES", "CLIPSTATS_MV_ORACLES"),
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
# Round-12 window composition (executing the plan computed at r11
# close, which this window completes — the full rotation closes and
# the oldest external verification anywhere becomes r7):
#   (1) changed in round 12 (10): the five acid_* entries (txlog grew
#       log checkpointing + _last_checkpoint resolution, the tx_append
#       base-capture TOCTOU fix, horizon-first vacuum, no-op delete
#       suppression — all three existing entries read through the new
#       resolve path; acid_orders_merge_delete is NEW — MERGE
#       delete/conditional-update clauses through a checkpointed+
#       cleaned log, strict clause-by-clause SQL oracle),
#       stream_ann_index (ann_mv_process_batch now maintains the
#       occupancy side-state; oracle unchanged, values proven
#       unchanged), stream_ann_drift (NEW — the frozen-quantizer
#       drift alarm, strict assignment-replay + G22-JS oracle),
#       ann_recall_at_k (exact top-k computed once and re-shipped
#       literal; values proven unchanged at 2 SFs), stream_clip_stats
#       (NEW — the F71 clip calibration as a weighted-rank counts MV,
#       F71 oracle verbatim), acid_orders_restore (NEW — metadata-only
#       RESTORE TO VERSION AS OF, strict 4-commit-ledger oracle),
#       stream_ann_rebuild (NEW — the drift alarm's response: full
#       quantizer retrain + single-fold reassignment, strict
#       full-corpus-seed replay oracle);
#   (2) the 11 r5 leftovers (q9_profit_by_nation_year ..
#       weekly_active_breakdown, alphabetical);
#   (3) the r6 block alphabetically from ab_experiment_report — 32
#       after ann_recall_at_k moved to (1); 10 + 11 + 32 = 53, so the
#       50-cut drops the block's last three names (session_top_paths,
#       stream_mv_user_stats, training_data_pipeline — r6-verified,
#       they lead the r13 stale fill).
# ROUND-13 FILL PLAN (computed now so the window stays mechanical):
# after r13's changed entries (front), the three r6 leftovers below
# this cut (session_top_paths, stream_mv_user_stats,
# training_data_pipeline), then the stalest block: r7
# (41 entries: events_json_extract, events_json_typed,
# events_variant_stats, normalize_explode_structs, and the rest of
# the r7-verified set per the CORRECTNESS_r7 window) — ~41 slots plus
# changed entries fills the window; overflow spills to the r8 block
# alphabetically.
_DRIVER_PRIORITY = [
    # -- (1) changed in round 12 --
    "acid_orders_ledger",
    "acid_orders_merge",
    "acid_orders_cdf",
    "acid_orders_merge_delete",
    "stream_ann_index",
    "stream_ann_drift",
    "ann_recall_at_k",
    "stream_clip_stats",
    "acid_orders_restore",
    "stream_ann_rebuild",
    # -- (2) the 11 r5 leftovers --
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
    # -- (3) the r6 block, alphabetical from ab_experiment_report
    #    (ann_recall_at_k is in (1)); the 50-cut drops the block's
    #    last three names below --
    "ab_experiment_report",
    "ann_hnsw_topk",
    "ann_index_partitioned_search",
    "ann_index_stream_batch",
    "ann_ivf_topk",
    "ann_lsh_bucketed",
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
    # -- below the 50-cut: the three r6 leftovers lead r13 --
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
