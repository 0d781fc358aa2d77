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
    ]:
        try:
            m = importlib.import_module(mod)
        except ImportError:
            continue
        _register(getattr(m, q_attr, {}), getattr(m, o_attr, {}))


_load_optional()
