"""End-to-end document ETL pipeline — the reference's full flow,
Spark-first.

Reference flow (src/etl_pipeline.py / cloud_function/main.py):
  Firestore docs → Python loops explode nested arrays → 5 CSVs →
  bucket backup → BigQuery WRITE_TRUNCATE load → SQL validation.

This pipeline:
  JSONL docs → declarative explode/posexplode normalization →
  CSV lake backup + parquet warehouse truncate-load → validation
  report — every stage a distributed DataFrame op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.sources.documents import read_documents
from saurav_nayak_recipe_etl_project_spark.sources.sinks import (
    load_warehouse_table,
    table_path,
    write_csv_lake,
)


def normalize_documents(docs: DataFrame) -> dict[str, DataFrame]:
    """Nested order-docs → star schema: a fact table plus an ordered
    bridge table (the reference's recipes/ingredients/steps split,
    src/etl_pipeline.py:56-84)."""
    # PERMISSIVE mode nulls every data field on a malformed line, so a
    # required-field filter quarantines bad docs without touching the
    # _corrupt_record column (which Spark only allows on cached plans).
    good = docs.filter(F.col("order_id").isNotNull()).drop("_corrupt_record")
    orders = good.select("order_id", "user_id", "status", "total", "order_date")
    items = good.select(
        "order_id", F.posexplode("items").alias("pos", "it")
    ).select(
        "order_id",
        (F.col("pos") + 1).cast("long").alias("step_number"),
        F.col("it.line").alias("line"),
        F.col("it.part_id").alias("part_id"),
        F.col("it.quantity").alias("quantity"),
    )
    return {"orders": orders, "order_items": items}


def run_document_etl(spark: SparkSession, source_path: str,
                     lake_dir: str, warehouse_dir: str) -> dict[str, int]:
    """Extract → normalize → lake backup → warehouse load.
    Returns per-table row counts (the reference prints these)."""
    docs = read_documents(spark, source_path)
    tables = normalize_documents(docs)
    counts: dict[str, int] = {}
    for name, df in tables.items():
        write_csv_lake(df, table_path(lake_dir, name))
        load_warehouse_table(df, table_path(warehouse_dir, name))
        counts[name] = df.count()
    return counts


def run_full_star_etl(spark: SparkSession, users_path: str, orders_path: str,
                      interactions_path: str, lake_dir: str,
                      warehouse_dir: str) -> dict[str, int]:
    """The reference's complete flow: three document collections →
    four-table star schema (users, orders fact, order_items ordered
    bridge, interactions log) → lake + warehouse
    (src/etl_pipeline.py:28-134 end-to-end)."""
    from saurav_nayak_recipe_etl_project_spark.sources.documents import (
        INTERACTION_DOC_SCHEMA,
        USER_DOC_SCHEMA,
    )

    users = read_documents(spark, users_path, USER_DOC_SCHEMA).filter(
        F.col("user_id").isNotNull()
    ).drop("_corrupt_record")
    interactions = read_documents(
        spark, interactions_path, INTERACTION_DOC_SCHEMA
    ).filter(F.col("interaction_id").isNotNull()).drop("_corrupt_record")
    tables = normalize_documents(read_documents(spark, orders_path))
    tables["users"] = users
    tables["interactions"] = interactions

    counts: dict[str, int] = {}
    for name, df in tables.items():
        write_csv_lake(df, table_path(lake_dir, name))
        load_warehouse_table(df, table_path(warehouse_dir, name))
        counts[name] = df.count()
    return counts
