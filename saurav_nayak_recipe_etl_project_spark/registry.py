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
# Round-13 window composition (executing the r12 plan; after this
# window lands in CORRECTNESS_r13, the oldest external verification
# anywhere becomes r7x4 — the four alphabetical-tail r7 names below
# the cut — then r8):
#   (1) changed/new in round 13 (13): txsource_mv (NEW — the A18
#       txlog DataSource driven end-to-end: three commits consumed by
#       the real readStream.format('txlog') across two checkpoint-
#       sharing lifetimes feeding the G9 user-stats MV; strict
#       one-shot-SQL oracle), the five acid_* entries (txlog reads
#       are now pinned-committed-schema with lossless type widening;
#       tx_merge captures base before its schema check — the r12
#       ADVICE TOCTOU; checkpoint pointer monotonic; clean-log
#       threshold = pointer), and the four ann/clip MV entries
#       (crashed-swap self-recovery in every maintenance entry
#       point), and stream_clip_drift (NEW — the G30 value-histogram
#       drift alarm over the G28 counts state, planted-shift entry,
#       strict analytic-histogram + G22-JS oracle);
#   (2) the three r6 leftovers (session_top_paths,
#       stream_mv_user_stats, training_data_pipeline);
#   (3) the 41-entry r7 block, alphabetical — 13 + 3 + 41 = 57, so
#       the 50-cut drops its last seven names (segment_revenue_trend,
#       segment_supplier_hhi, supplier_scorecard, text_lm_score,
#       text_type_token_ratio, weighted_sample_norep, zipf_slope) —
#       they lead round 14's stale fill, then the r8 block.
_DRIVER_PRIORITY = [
    # -- (1) changed/new in round 13 --
    "txsource_mv",
    "acid_orders_ledger",
    "acid_orders_merge",
    "acid_orders_cdf",
    "acid_orders_merge_delete",
    "acid_orders_restore",
    "acid_orders_dv",
    "stream_ann_index",
    "stream_ann_drift",
    "stream_ann_rebuild",
    "stream_clip_stats",
    "stream_clip_drift",
    "multimodal_audio_features",
    # -- (2) the three r6 leftovers --
    "session_top_paths",
    "stream_mv_user_stats",
    "training_data_pipeline",
    # -- (3) the r7 block, alphabetical; the 50-cut falls after
    #    segment_order_gini (entry 50) --
    "analytics_mart_pipeline",
    "avg_lineitems_per_order",
    "avg_order_value",
    "benford_digit_audit",
    "brand_return_rates",
    "cohort_ltv",
    "copurchase_reach3",
    "copurchase_triangles",
    "corpus_shuffle",
    "customer_latest_order_lateral",
    "customers_without_urgent_orders",
    "dedup_subset_containment",
    "discount_band_effect",
    "doc_chunks_overlapping",
    "doc_novelty_5gram",
    "event_dow_hour_heatmap",
    "event_time_weighted_avg",
    "events_json_extract",
    "events_json_typed",
    "events_session_window",
    "events_variant_stats",
    "monthly_new_vs_repeat",
    "monthly_revenue",
    "monthly_seasonality_index",
    "multimodal_thumbnail",
    "nation_trade_balance",
    "nest_unnest_roundtrip",
    "normalize_explode_structs",
    "normalize_posexplode",
    "order_most_lineitems",
    "orders_by_segment",
    "part_pair_lift",
    "rolling_weekly_active_users",
    "segment_order_gini",
    "segment_revenue_trend",
    "segment_supplier_hhi",
    "supplier_scorecard",
    "text_lm_score",
    "text_type_token_ratio",
    "weighted_sample_norep",
    "zipf_slope",
]


def _reorder() -> None:
    """Mutate QUERIES in place so iteration follows _DRIVER_PRIORITY."""
    ordered = {n: QUERIES[n] for n in _DRIVER_PRIORITY if n in QUERIES}
    for name, fn in list(QUERIES.items()):
        ordered.setdefault(name, fn)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()
