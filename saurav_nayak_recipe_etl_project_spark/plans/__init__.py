from saurav_nayak_recipe_etl_project_spark.plans.analytics import ANALYTICS_ORACLES, ANALYTICS_QUERIES

__all__ = ["ANALYTICS_QUERIES", "ANALYTICS_ORACLES"]
