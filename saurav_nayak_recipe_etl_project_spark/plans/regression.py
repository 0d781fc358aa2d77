"""Grouped linear-regression analytics (exact-sum OLS).

The classic warehouse trend question — "is this segment growing, and
how fast" — answered with per-group ordinary least squares fitted
INSIDE the aggregation layer: OLS over (x, y) needs only the five
sufficient statistics n, Σx, Σy, Σx², Σxy, which are one map-side-
combined groupBy away. No iteration, no ML library, no driver math —
the whole fit is a single shuffle at any scale.

Portability (the 100 TB float problem): the sufficient statistics are
INTEGERS (epoch-month index × revenue cents) accumulated in
DECIMAL(38,0) (HUGEINT on the oracle side — month×cents products pass
int64 around sf1), and the reported slope/intercept are integer
micro-unit floor divisions of those exact sums — engine-identical.
The human-readable dollar columns are then single double divisions of
those integers by constants, which IEEE guarantees bit-equal.

Reference parity: the reference stops at GROUP BY aggregates
(README.md §6 queries 1-10); trend fitting is part of the mandated
analytics extension. Cite: reference analysis_queries.py has no
regression surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

_EPOCH_MONTH = (
    "(year(cast(o_orderdate as date)) - 1970) * 12"
    " + month(cast(o_orderdate as date)) - 1"
)


def segment_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment revenue trend: OLS slope/intercept of monthly
    revenue (cents) against the epoch-month index.

    slope_micro_cents = (n·Σxy − Σx·Σy)·10⁶ DIV (n·Σx² − (Σx)²) —
    cents of monthly-revenue growth per month, in exact micro-units;
    intercept_micro_cents = (Σy·den − num·Σx)·10⁶ DIV (den·n). Both
    floor divisions of DECIMAL(38,0) exact sums (truncation toward
    zero matches DuckDB's // on negatives — a shrinking segment's
    negative slope is exact too). slope_dollars / intercept_dollars
    are the same integers divided by 1e8 as doubles.

    Plan: orders×customer broadcast dim join, groupBy (segment, month)
    with integer cents, then a 5-accumulator groupBy per segment —
    two map-side-combined shuffles, no window, no collect."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    monthly = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", F.expr(_EPOCH_MONTH).alias("m"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("cents")
        )
    )
    stats = monthly.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_months"),
        F.sum("m").alias("sx"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("m") * F.col("m")).alias("sxx"),
        F.sum(F.col("m").cast("decimal(38,0)") * F.col("cents"))
        .alias("sxy"),
    )
    return stats.select(
        "c_mktsegment",
        "n_months",
        F.expr(
            "cast((n_months * sxy - sx * sy) * 1000000"
            " DIV (n_months * sxx - sx * sx) as bigint)"
        ).alias("slope_micro_cents"),
        F.expr(
            "cast((sy * (n_months * sxx - sx * sx)"
            " - (n_months * sxy - sx * sy) * sx) * 1000000"
            " DIV ((n_months * sxx - sx * sx) * n_months) as bigint)"
        ).alias("intercept_micro_cents"),
    ).select(
        "c_mktsegment",
        "n_months",
        "slope_micro_cents",
        "intercept_micro_cents",
        (F.col("slope_micro_cents").cast("double") / F.lit(1e8))
        .alias("slope_dollars_per_month"),
        (F.col("intercept_micro_cents").cast("double") / F.lit(1e8))
        .alias("intercept_dollars"),
    )


REGRESSION_QUERIES = {
    "segment_revenue_trend": segment_revenue_trend,
}

REGRESSION_ORACLES = {
    "segment_revenue_trend": """
        WITH monthly AS (
          SELECT c_mktsegment,
            (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1 AS m,
            SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment,
            (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1
        ),
        stats AS (
          SELECT c_mktsegment,
            COUNT(*) AS n_months,
            CAST(SUM(m) AS BIGINT) AS sx,
            CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS sy,
            CAST(SUM(m * m) AS BIGINT) AS sxx,
            CAST(SUM(CAST(m AS HUGEINT) * cents) AS HUGEINT) AS sxy
          FROM monthly GROUP BY c_mktsegment
        ),
        fit AS (
          SELECT c_mktsegment, n_months,
            CAST((n_months * sxy - sx * sy) * 1000000
                 // (n_months * sxx - sx * sx) AS BIGINT)
              AS slope_micro_cents,
            CAST((sy * (n_months * sxx - sx * sx)
                  - (n_months * sxy - sx * sy) * sx) * 1000000
                 // ((n_months * sxx - sx * sx) * n_months) AS BIGINT)
              AS intercept_micro_cents
          FROM stats
        )
        SELECT c_mktsegment, n_months, slope_micro_cents,
          intercept_micro_cents,
          CAST(slope_micro_cents AS DOUBLE) / 1e8
            AS slope_dollars_per_month,
          CAST(intercept_micro_cents AS DOUBLE) / 1e8 AS intercept_dollars
        FROM fit
    """,
}
