"""The catalog registers temp views so users can drive everything via
spark.sql — the BigQuery-console equivalent surface."""

from __future__ import annotations

from saurav_nayak_recipe_etl_project_spark.sources.catalog import register_views


def test_catalog_contracts_hold(spark, sf_dir):
    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        check_catalog_contracts,
    )

    assert check_catalog_contracts(spark, sf_dir) == {}


def test_sql_over_registered_views(spark, sf_dir):
    register_views(spark, sf_dir)
    row = spark.sql(
        """
        SELECT n_name, COUNT(*) AS customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY customers DESC, n_name LIMIT 1
        """
    ).collect()[0]
    assert row["customers"] > 0

    ev = spark.sql("SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM events").collect()[0]
    assert ev["lo"] is not None and ev["hi"] > ev["lo"]
