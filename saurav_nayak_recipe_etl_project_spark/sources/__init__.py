from saurav_nayak_recipe_etl_project_spark.sources.catalog import TABLES, load_table, load_all

__all__ = ["TABLES", "load_table", "load_all"]
