"""Normalization operators — the reference's ETL transform core.

The reference walks Firestore docs in Python and hand-builds rows
(reference src/etl_pipeline.py:44-98: schema mapping, nested-array
explode for ingredients, enumerate() for step_number, timestamp→ISO).
Here the same semantics are single declarative expressions: `explode`
and `posexplode` run inside whole-stage codegen and scale per-partition
with zero driver involvement.

The nested-document shape is rebuilt from the relational testdata with
`collect_list(struct(...))` (sorted for determinism), then re-normalized
— proving both directions of the doc ⇄ star-schema mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table


def nest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build Firestore-style nested docs: one row per order with an
    `items` array-of-struct ordered by line number (the inverse of the
    reference's explode; src/etl_pipeline.py:71-84)."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    return (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("l_linenumber", "l_partkey", "l_quantity"))
            ).alias("items")
        )
    )


def schema_map_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1+B4 — projection/rename + timestamp→ISO cleaning
    (src/etl_pipeline.py:60-68, cloud_function/main.py:57)."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("user_id"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_iso"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("total"),
    )


def normalize_explode_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 — explode array-of-struct back to a bridge table
    (src/etl_pipeline.py:71-79, ingredients)."""
    nested = nest_orders(spark, sf_dir)
    return nested.select(
        F.col("l_orderkey").alias("order_id"), F.explode("items").alias("it")
    ).select(
        "order_id",
        F.col("it.l_partkey").alias("part_id"),
        F.col("it.l_quantity").alias("quantity"),
    )


def normalize_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 — positional explode: 1-based step_number preserving array
    order (src/etl_pipeline.py:81-84, steps)."""
    nested = nest_orders(spark, sf_dir)
    return nested.select(
        F.col("l_orderkey").alias("order_id"),
        F.posexplode("items").alias("pos", "it"),
    ).select(
        "order_id",
        (F.col("pos") + 1).cast("long").alias("step_number"),
        F.col("it.l_partkey").alias("part_id"),
    )


def nest_unnest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 — round-trip integrity: nested array sizes equal the original
    per-order row counts."""
    nested = nest_orders(spark, sf_dir)
    return nested.select(
        F.col("l_orderkey").alias("order_id"),
        F.size("items").cast("long").alias("n_items"),
    )


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — semi-structured JSON field extraction (the Firestore doc
    field access in src/etl_pipeline.py:44-53, as a codegen expression)."""
    events = load_table(spark, "events", sf_dir)
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


def events_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6b — TYPED JSON parsing (from_json with an explicit schema, vs
    events_json_extract's per-path string access): the whole props
    object lands as a struct in one parse, wrong-type/corrupt payloads
    become NULL (counted), and the struct fields feed a normal rollup.
    One scan; the parse is codegen'd Jackson, not a Python UDF."""
    events = load_table(spark, "events", sf_dir)
    parsed = events.select(
        "event_type",
        F.from_json("props", "k INT").alias("p"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count("p.k").alias("n_parsed"),
        F.min("p.k").cast("long").alias("min_k"),
        F.max("p.k").cast("long").alias("max_k"),
        F.sum("p.k").cast("long").alias("sum_k"),
    )


def events_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6c — the VARIANT semi-structured path (Spark 4): props parsed
    once into the shredded binary VARIANT encoding (try_parse_json),
    fields extracted by path with try_variant_get — the
    schema-on-read story for payloads whose shape isn't known at
    pipeline-build time (from_json needs the schema up front; VARIANT
    defers it to the read expression and stays binary-columnar in
    between). Malformed JSON and wrong-type fields become NULL, never
    failures. Same rollup shape as events_json_typed so the two
    parsing stories are directly comparable."""
    events = load_table(spark, "events", sf_dir)
    parsed = events.select(
        "event_type",
        F.try_variant_get(
            F.try_parse_json("props"), "$.k", "int"
        ).alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count("k").alias("n_parsed"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.sum("k").cast("long").alias("sum_k"),
    )


NORMALIZE_QUERIES = {
    "schema_map_orders": schema_map_orders,
    "events_json_typed": events_json_typed,
    "events_variant_stats": events_variant_stats,
    "normalize_explode_structs": normalize_explode_structs,
    "normalize_posexplode": normalize_posexplode,
    "nest_unnest_roundtrip": nest_unnest_roundtrip,
    "events_json_extract": events_json_extract,
}

NORMALIZE_ORACLES = {
    "events_variant_stats": """
        -- the VARIANT path has the same NULL semantics as from_json
        -- for this single-field extraction: invalid JSON or a
        -- non-numeric k -> NULL (try_variant_get), mirrored by
        -- json_valid + TRY_CAST.
        WITH typed AS (
          SELECT event_type,
            CASE WHEN json_valid(props)
                 THEN TRY_CAST(props->>'$.k' AS INT) END AS k
          FROM events
        )
        SELECT event_type, COUNT(*) AS n,
          COUNT(k) AS n_parsed,
          CAST(MIN(k) AS BIGINT) AS min_k,
          CAST(MAX(k) AS BIGINT) AS max_k,
          CAST(SUM(k) AS BIGINT) AS sum_k
        FROM typed GROUP BY event_type
    """,
    "events_json_typed": """
        -- json_valid + TRY_CAST mirror from_json's PERMISSIVE NULLs:
        -- malformed JSON or a non-numeric k must yield NULL, not fail
        -- the whole oracle query (a plain CAST errors on bad rows).
        -- Residual asymmetry (documented): a JSON STRING number like
        -- {"k":"5"} is NULL for Spark's k INT schema but 5 through
        -- TRY_CAST; the generated props never encode numbers as
        -- strings, and a future generator change would surface as a
        -- hash mismatch, not a silent pass.
        WITH typed AS (
          SELECT event_type,
            CASE WHEN json_valid(props)
                 THEN TRY_CAST(props->>'$.k' AS INT) END AS k
          FROM events
        )
        SELECT event_type, COUNT(*) AS n,
          COUNT(k) AS n_parsed,
          CAST(MIN(k) AS BIGINT) AS min_k,
          CAST(MAX(k) AS BIGINT) AS max_k,
          CAST(SUM(k) AS BIGINT) AS sum_k
        FROM typed GROUP BY event_type
    """,
    "schema_map_orders": """
        SELECT o_orderkey AS order_id, o_custkey AS user_id,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date_iso,
               o_orderpriority AS priority, o_totalprice AS total
        FROM orders
    """,
    "normalize_explode_structs": """
        SELECT l_orderkey AS order_id, l_partkey AS part_id,
               l_quantity AS quantity
        FROM lineitem
    """,
    "normalize_posexplode": """
        SELECT l_orderkey AS order_id,
               ROW_NUMBER() OVER (
                 PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey, l_quantity
               ) AS step_number,
               l_partkey AS part_id
        FROM lineitem
    """,
    "nest_unnest_roundtrip": """
        SELECT l_orderkey AS order_id, COUNT(*) AS n_items
        FROM lineitem GROUP BY l_orderkey
    """,
    "events_json_extract": """
        SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS prop_k
        FROM events
    """,
}
