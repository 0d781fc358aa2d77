"""Deterministic synthetic document seeder.

Parity with reference src/insert_recipe.py (1-181): one hand-authored
seed document plus N machine-generated ones with nested arrays, users,
and an interaction log. Differences, Spark-first: generation is
`spark.range`-driven (distributed, no driver loop, no Faker), fully
deterministic from xxhash64 so any cluster regenerates the same seed
corpus, and output is JSONL ready for sources/documents.read_documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ADJECTIVES = ["Delicious", "Creamy", "Vegan", "Spicy", "Cheesy", "Quick"]
FOODS = ["Pasta", "Curry", "Salad", "Soup", "Cake", "Stir Fry", "Tacos"]
STATUSES = ["O", "F", "P"]


def _pick(options: list[str], seed_col) -> F.Column:
    """Deterministic choice from a list, keyed by a hash column."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(seed_col, F.lit(len(options))) + 1).cast("int"))


def generate_order_documents(spark: SparkSession, n_docs: int = 100,
                             max_items: int = 8) -> DataFrame:
    """N synthetic nested order-docs (title-style status/total fields +
    an items array), generated distributively with spark.range."""
    base = spark.range(1, n_docs + 1).select(
        F.col("id").alias("order_id"),
        F.pmod(F.xxhash64("id", F.lit("user")), F.lit(50)).alias("user_id"),
        _pick(STATUSES, F.xxhash64("id", F.lit("status"))).alias("status"),
        F.round(
            (F.pmod(F.xxhash64("id", F.lit("total")), F.lit(100000)) + 100) / 100.0, 2
        ).alias("total"),
        F.concat(
            F.lit("2024-01-"),
            F.lpad(
                (F.pmod(F.xxhash64("id", F.lit("day")), F.lit(28)) + 1).cast("string"),
                2, "0",
            ),
        ).alias("order_date"),
        (F.pmod(F.xxhash64("id", F.lit("n")), F.lit(max_items)) + 1)
        .cast("int").alias("n_items"),
    )
    items = F.transform(
        F.sequence(F.lit(1), F.col("n_items")),
        lambda i: F.struct(
            i.cast("int").alias("line"),
            F.pmod(F.xxhash64(F.col("order_id"), i), F.lit(200)).alias("part_id"),
            (F.pmod(F.xxhash64(F.col("order_id"), i, F.lit("q")), F.lit(50)) + 1)
            .cast("double").alias("quantity"),
        ),
    )
    return base.select(
        "order_id", "user_id", "status", "total", "order_date",
        items.alias("items"),
    )


def seed_document(spark: SparkSession) -> DataFrame:
    """The hand-authored seed doc (the reference's 'Chicken Gravy'
    analog, insert_recipe.py:19-50): order 0 with a fixed item list."""
    return spark.createDataFrame(
        [
            (
                0, 0, "O", 99.99, "2024-01-01",
                [(1, 7, 2.0), (2, 42, 1.0), (3, 7, 3.0)],
            )
        ],
        "order_id long, user_id long, status string, total double, "
        "order_date string, items array<struct<line:int,part_id:long,quantity:double>>",
    )


def seed_corpus(spark: SparkSession, path: str, n_docs: int = 100) -> None:
    """Write seed + synthetic docs as JSONL (the Firestore-populate
    step, minus Firestore)."""
    docs = seed_document(spark).unionByName(generate_order_documents(spark, n_docs))
    docs.write.mode("overwrite").json(path)
