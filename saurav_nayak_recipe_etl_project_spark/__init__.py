"""PySpark-native analytics engine with the capabilities of the
Sauravn04/saurav-nayak-recipe-ETL-project reference (see SURVEY.md).

Everything is declarative DataFrame/SQL so Catalyst + AQE choose the
physical plan; Python UDFs appear only where built-ins cannot express
the semantics (and then always Arrow-batched).
"""

from saurav_nayak_recipe_etl_project_spark.session import get_spark


def queries():
    """Registry of all named queries: name -> fn(spark, sf_dir)."""
    from saurav_nayak_recipe_etl_project_spark.registry import QUERIES

    return dict(QUERIES)


def oracles():
    """DuckDB oracle SQL per oracle-able query name."""
    from saurav_nayak_recipe_etl_project_spark.registry import ORACLES

    return dict(ORACLES)


__all__ = ["get_spark", "queries", "oracles"]
