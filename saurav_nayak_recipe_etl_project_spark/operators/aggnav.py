"""Aggregate navigator: summary-table routing (the plain-parquet form
of BigQuery materialized-view smart tuning / Oracle query rewrite).

Reference parity: the reference's dashboards re-run full-table GROUP
BYs in BigQuery on every refresh (README.md §6); BigQuery silently
answers some of those from materialized views. This module makes that
capability explicit and testable: build a summary table at a declared
grain once, then answer any query at a COARSER grain from the summary
instead of the fact table.

Correctness rule: a summary at grain g can answer a request at grain
G iff every G bucket is a union of whole g buckets (here: day rolls
up to month/quarter/year because the summary carries the epoch day
and the calendar mapping is a pure function of it) AND every requested
measure is re-aggregable from the stored partial measures (SUM/COUNT
re-aggregate; MIN/MAX do; AVG must be stored as SUM+COUNT — exactly
the mergeable-partial discipline streaming/mv.py uses per batch).

Scale: the summary is |days| rows — calendar-bounded no matter how
large the fact table; routed queries never touch the fact scan, which
tests assert on real inputFiles() evidence.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

# grains answerable from the daily summary, as pure epoch-day exprs
_GRAINS = {
    "day": "epoch_day",
    "month": "(year(date_add(date '1970-01-01', cast(epoch_day as int)))"
             " - 1970) * 12"
             " + month(date_add(date '1970-01-01', cast(epoch_day as int)))"
             " - 1",
    "year": "year(date_add(date '1970-01-01', cast(epoch_day as int)))",
}


def build_daily_order_summary(spark: SparkSession, sf_dir: str,
                              path: str) -> None:
    """One fact-table pass -> the daily summary with MERGEABLE partial
    measures (integer-cents sum + count, min/max cents): everything a
    coarser-grain query needs, nothing that can't re-aggregate."""
    orders = load_table(spark, "orders", sf_dir)
    (
        orders.groupBy(
            F.expr("datediff(cast(o_orderdate as date), date '1970-01-01')")
            .cast("long").alias("epoch_day")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("cents"),
            F.min(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("min_cents"),
            F.max(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("max_cents"),
        )
        .write.mode("overwrite").parquet(path)
    )


def route_revenue_rollup(spark: SparkSession, summary_path: str,
                         grain: str) -> DataFrame:
    """Answer a revenue rollup at `grain` FROM THE SUMMARY ONLY.
    Raises for a grain the summary cannot legally serve — routing must
    fail loudly, never silently fall back to a fact scan the caller
    believed was avoided."""
    if grain not in _GRAINS:
        raise ValueError(
            f"grain {grain!r} not answerable from the daily summary; "
            f"legal: {sorted(_GRAINS)}"
        )
    s = spark.read.parquet(summary_path)
    return (
        s.groupBy(F.expr(_GRAINS[grain]).cast("long").alias("bucket"))
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("cents").alias("cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
        .select(
            "bucket", "n_orders",
            F.round(F.col("cents") / F.lit(100.0), 2).alias("revenue"),
            "min_cents", "max_cents",
        )
    )


def fact_revenue_rollup(spark: SparkSession, sf_dir: str,
                        grain: str) -> DataFrame:
    """The same rollup straight off the fact table — the equivalence
    twin the tests hold the routed form against."""
    orders = load_table(spark, "orders", sf_dir)
    day = "datediff(cast(o_orderdate as date), date '1970-01-01')"
    o = orders.select(
        F.expr(day).cast("long").alias("epoch_day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    return (
        o.groupBy(F.expr(_GRAINS[grain]).cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("c").alias("cents"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
        )
        .select(
            "bucket", "n_orders",
            F.round(F.col("cents") / F.lit(100.0), 2).alias("revenue"),
            "min_cents", "max_cents",
        )
    )


def scan_paths(df: DataFrame) -> set[str]:
    """Directories the plan actually reads — the evidence the routing
    tests pin (a routed query whose inputFiles include the fact
    parquet is a broken navigator, whatever its rows say)."""
    return {os.path.dirname(p) for p in df.inputFiles()}
