"""Bucketed range (interval) join: point-in-interval matching without
an equi-key, made shuffle-joinable.

Spark has no native interval-join physical operator for batch; the
naive formulation (`a JOIN b ON a.p BETWEEN b.lo AND b.hi`) plans as a
broadcast-nested-loop or cartesian product — O(N·M) at scale. The
standard fix (used by every time-series engine): quantize the range
dimension into fixed-width buckets, explode each interval into the
buckets it overlaps, and equi-join on the bucket id. A point falls in
exactly ONE bucket, so each (point, interval) pair meets at most once
— no post-join dedup needed. Cost: O(N + M·w/width) shuffle rows and
a hash join instead of a nested loop.

Bucket width tunes the tradeoff: wider buckets -> fewer exploded
interval rows but more non-matching pairs to filter; set it near the
typical interval length so each interval spans ~2 buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

WINDOW_DAYS = 7
WINDOW_EVERY = 251  # sample stride for the demo window table


def bucketed_interval_join(points: DataFrame, intervals: DataFrame,
                           point_col: str, start_col: str, end_col: str,
                           width: int) -> DataFrame:
    """Equi-joinable point-in-[start, end) join on integer domains.

    Both inputs shuffle on the synthetic `bucket` key — a plain hash
    join, broadcastable when the exploded interval side is small.
    Returns points ⋈ intervals with all columns from both sides.
    """
    p = points.withColumn("bucket", F.floor(F.col(point_col) / width))
    iv = intervals.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / width),
                # end is exclusive: a bucket is joined only if the
                # interval overlaps it, so back off one when end lands
                # exactly on a bucket boundary.
                F.floor((F.col(end_col) - 1) / width),
            )
        ),
    )
    return (
        p.join(iv, "bucket")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("bucket")
    )


def _epoch_day(col: str) -> Column:
    return F.expr(f"datediff(cast({col} as date), date '1970-01-01')")


def range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo: count orders landing inside 7-day windows anchored at
    every 251st order's date. The probe side is the full fact table;
    the window side stays small by construction and the join runs as
    a bucket equi-join, never a nested loop."""
    orders = load_table(spark, "orders", sf_dir)
    points = orders.select(_epoch_day("o_orderdate").alias("day"))
    windows = orders.filter(F.col("o_orderkey") % WINDOW_EVERY == 0).select(
        F.col("o_orderkey").alias("window_key"),
        _epoch_day("o_orderdate").alias("start_day"),
        (_epoch_day("o_orderdate") + WINDOW_DAYS).alias("end_day"),
    )
    joined = bucketed_interval_join(
        points, windows, "day", "start_day", "end_day", WINDOW_DAYS
    )
    return joined.groupBy("window_key").agg(
        F.min("start_day").cast("long").alias("start_day"),
        F.count("*").alias("n_orders"),
    )


RANGEJOIN_QUERIES = {
    "range_join_windows": range_join_windows,
}

RANGEJOIN_ORACLES = {
    # the oracle states the SEMANTICS (plain inequality join); the
    # Spark side must produce identical rows via the bucketed plan.
    "range_join_windows": f"""
        WITH pts AS (
          SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day
          FROM orders
        ),
        win AS (
          SELECT o_orderkey AS window_key,
            date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS start_day
          FROM orders WHERE o_orderkey % {WINDOW_EVERY} = 0
        )
        SELECT window_key, CAST(MIN(start_day) AS BIGINT) AS start_day,
               COUNT(*) AS n_orders
        FROM pts JOIN win
          ON pts.day >= win.start_day AND pts.day < win.start_day + {WINDOW_DAYS}
        GROUP BY window_key
    """,
}
