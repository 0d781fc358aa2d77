"""As-of (point-in-time) join — the union+window pattern.

For each left row, find the most recent right row at-or-before its
timestamp per key. Instead of a per-row correlated subquery (O(N·M))
or a range cross-join, union both sides, sort once per key, and carry
the last-seen right value forward with a running `last(..., ignore
nulls)` window. One shuffle on the key, linear scan after sorting —
the canonical distributed as-of used for feature backfills at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, key: str, left_ts: str,
              right_ts: str, value: str, out_col: str = "asof_value") -> DataFrame:
    """Left rows + `out_col` = latest `value` from right with
    right_ts <= left_ts for the same key (ties on the right broken by
    max value, deterministically)."""
    l = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"), F.lit(None).cast("long").alias("_v"),
        F.struct(*left.columns).alias("_row"),
    )
    r = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"), F.col(value).cast("long").alias("_v"),
        F.lit(None).cast(l.schema["_row"].dataType).alias("_row"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", F.coalesce("_v", F.lit(-1)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).withColumn(
        out_col, F.last("_v", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).select("_row.*", out_col)


def latest_order_before_event(spark, sf_dir: str) -> DataFrame:
    """Registry query: for every event, the user's most recent order
    at-or-before the event time; the oracle mirrors the same
    union+window construction."""
    from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

    events = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts")
    orders = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate"),
        F.col("o_orderkey"),
    )
    return asof_join(
        events, orders, key="user_id", left_ts="ts", right_ts="o_orderdate",
        value="o_orderkey", out_col="last_orderkey",
    ).select("event_id", "user_id", "last_orderkey")


ASOF_TOLERANCE_US = 30 * 60 * 1_000_000  # 30-minute staleness bound


def latest_view_before_purchase_tolerance(spark, sf_dir: str) -> DataFrame:
    """As-of join WITH STALENESS BOUND — the feature-backfill contract
    real feature stores enforce (a week-old 'latest view' is not a
    session feature, it's a leak): for every purchase event, the same
    user's latest view event, NULLED when it is more than 30 minutes
    stale. Same union+window shape as asof_latest_order; the match
    timestamp is carried forward through the SAME window as the value
    (one extra last() over the one shuffle — no second pass), so the
    staleness test is exact per row in integer µs. The feed is bursty,
    so both fresh matches and stale-nulled rows occur — the test pins
    that neither set is empty."""
    from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

    ev = load_table(spark, "events", sf_dir)
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    l = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("_k"), us.alias("_t"),
        F.lit(1).alias("_side"), F.lit(None).cast("long").alias("_v"),
        "event_id",
    )
    r = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("_k"), us.alias("_t"),
        F.lit(0).alias("_side"), F.col("event_id").cast("long").alias("_v"),
        F.lit(None).cast("long").alias("event_id"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", F.coalesce("_v", F.lit(-1)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r)
        .withColumn("_av", F.last("_v", ignorenulls=True).over(w))
        .withColumn(
            "_at",
            F.last(F.when(F.col("_side") == 0, F.col("_t")),
                   ignorenulls=True).over(w),
        )
    )
    fresh = (F.col("_t") - F.col("_at")) <= ASOF_TOLERANCE_US
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            "event_id",
            F.col("_k").alias("user_id"),
            F.when(fresh, F.col("_av")).alias("last_view_id_30m"),
        )
    )


ASOF_QUERIES = {
    "asof_latest_order": latest_order_before_event,
    "asof_latest_view_30m": latest_view_before_purchase_tolerance,
}

ASOF_ORACLES = {
    "asof_latest_order": """
        WITH u AS (
          SELECT user_id AS k, ts AS t, 1 AS side,
                 CAST(NULL AS BIGINT) AS v, event_id
          FROM events
          UNION ALL
          SELECT o_custkey AS k, o_orderdate AS t, 0 AS side,
                 o_orderkey AS v, NULL AS event_id
          FROM orders
        ),
        carried AS (
          SELECT k, side, event_id,
            last_value(v IGNORE NULLS) OVER (
              PARTITION BY k ORDER BY t, side, COALESCE(v, -1)
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS last_orderkey
          FROM u
        )
        SELECT event_id, k AS user_id, last_orderkey
        FROM carried WHERE side = 1
    """,
    "asof_latest_view_30m": f"""
        WITH u AS (
          SELECT user_id AS k, epoch_us(ts) AS t, 1 AS side,
                 CAST(NULL AS BIGINT) AS v, event_id
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id AS k, epoch_us(ts) AS t, 0 AS side,
                 event_id AS v, NULL AS event_id
          FROM events WHERE event_type = 'view'
        ),
        carried AS (
          SELECT k, side, event_id, t,
            last_value(v IGNORE NULLS) OVER (
              PARTITION BY k ORDER BY t, side, COALESCE(v, -1)
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS av,
            last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER (
              PARTITION BY k ORDER BY t, side, COALESCE(v, -1)
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS at
          FROM u
        )
        SELECT event_id, k AS user_id,
          CASE WHEN t - at <= {ASOF_TOLERANCE_US}
               THEN av END AS last_view_id_30m
        FROM carried WHERE side = 1
    """,
}
