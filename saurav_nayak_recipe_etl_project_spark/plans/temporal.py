"""Temporal / lifecycle analytics: cohort retention, event-transition
matrix, gap-filled time series.

These are the time-dimension shapes a warehouse team layers on top of
the reference's event feed (reference src/etl_pipeline.py keeps only a
flat event log; retention/transition reporting is left to BigQuery).
All three are pure DataFrame algebra — no UDFs, no driver loops.

Scale notes:
- cohort_retention shuffles twice on user_id (first-week min, then the
  activity join); both are map-side-combined aggs and the join is
  co-partitioned on the same key, so AQE coalesces into one exchange
  reuse. Cohort-size table is per-week (tiny) and broadcast.
- event_transitions is one window (partition user_id) + one groupBy on
  the (prev, next) pair space — bounded by |event_type|^2, tiny.
- gapfill_daily_revenue aggregates to per-day rows first (bounded by
  calendar span, ~2.4k rows for 7 years, <40k for a century), so the
  single-partition ordered window over the spine is bounded no matter
  how large the fact table is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

_EPOCH_WEEK = "datediff(cast(ts as date), date '1970-01-01') div 7"


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-active week,
    share of each cohort still active k weeks later."""
    ev = load_table(spark, "events", sf_dir)
    weeks = ev.select("user_id", F.expr(_EPOCH_WEEK).alias("week")).distinct()
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    active = (
        weeks.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )
    return active.join(F.broadcast(sizes), "cohort_week").select(
        F.col("cohort_week").cast("long").alias("cohort_week"),
        F.col("week_offset").cast("long").alias("week_offset"),
        "n_active",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | prev_type) with observation counts."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    counts = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    total = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(total), 6).alias("p"),
    )


def gapfill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily revenue series: a generated date spine joined
    to per-day sums, zero-filling silent days, plus days-since-last-sale
    via an IGNORE NULLS forward-fill window."""
    orders = load_table(spark, "orders", sf_dir)
    daily = orders.groupBy(
        F.expr(
            "datediff(cast(o_orderdate as date), date '1970-01-01')"
        ).alias("epoch_day")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    spine = (
        daily.agg(F.min("epoch_day").alias("mn"), F.max("epoch_day").alias("mx"))
        .select(F.explode(F.sequence("mn", "mx")).alias("epoch_day"))
    )
    g = spine.join(daily, "epoch_day", "left")
    w = Window.orderBy("epoch_day").rowsBetween(Window.unboundedPreceding, 0)
    last_sale = F.last(
        F.when(F.col("cents").isNotNull(), F.col("epoch_day")), ignorenulls=True
    ).over(w)
    return g.select(
        F.col("epoch_day").cast("long").alias("epoch_day"),
        F.round(F.coalesce(F.col("cents"), F.lit(0)) / F.lit(100.0), 2).alias(
            "day_revenue"
        ),
        (F.col("epoch_day") - last_sale).cast("long").alias("days_since_sale"),
    )


def weekly_active_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly active users split into new vs returning — the product
    health view on top of the cohort machinery: same (user, week)
    distinct + first-week join, one more groupBy on week."""
    ev = load_table(spark, "events", sf_dir)
    weeks = ev.select("user_id", F.expr(_EPOCH_WEEK).alias("week")).distinct()
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(cohort, "user_id")
        .groupBy(F.col("week").cast("long").alias("week"))
        .agg(
            F.count("*").alias("n_active"),
            F.sum((F.col("week") == F.col("cohort_week")).cast("long")).alias(
                "n_new"
            ),
            (
                F.count("*")
                - F.sum((F.col("week") == F.col("cohort_week")).cast("long"))
            ).alias("n_returning"),
        )
    )


TEMPORAL_QUERIES = {
    "cohort_retention": cohort_retention,
    "weekly_active_breakdown": weekly_active_breakdown,
    "event_transitions": event_transitions,
    "gapfill_daily_revenue": gapfill_daily_revenue,
}

TEMPORAL_ORACLES = {
    "weekly_active_breakdown": """
        WITH weeks AS (
          SELECT DISTINCT user_id,
            date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS week
          FROM events
        ),
        cohort AS (
          SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id
        )
        SELECT CAST(week AS BIGINT) AS week,
          COUNT(*) AS n_active,
          CAST(SUM(CASE WHEN week = cohort_week THEN 1 ELSE 0 END) AS BIGINT)
            AS n_new,
          CAST(COUNT(*) - SUM(CASE WHEN week = cohort_week THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returning
        FROM weeks JOIN cohort USING (user_id)
        GROUP BY week
    """,
    "cohort_retention": """
        WITH weeks AS (
          SELECT DISTINCT user_id,
            date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS week
          FROM events
        ),
        cohort AS (
          SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id
        ),
        sizes AS (
          SELECT cohort_week, COUNT(*) AS cohort_size
          FROM cohort GROUP BY cohort_week
        ),
        active AS (
          SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
                 COUNT(*) AS n_active
          FROM weeks w JOIN cohort c ON w.user_id = c.user_id
          GROUP BY c.cohort_week, week_offset
        )
        SELECT CAST(a.cohort_week AS BIGINT) AS cohort_week,
               CAST(week_offset AS BIGINT) AS week_offset,
               n_active,
               ROUND(n_active * 1.0 / cohort_size, 6) AS retention
        FROM active a JOIN sizes s ON a.cohort_week = s.cohort_week
    """,
    "event_transitions": """
        WITH seq AS (
          SELECT event_type AS next_type,
            lag(event_type) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
            ) AS prev_type
          FROM events
        ),
        counts AS (
          SELECT prev_type, next_type, COUNT(*) AS n
          FROM seq WHERE prev_type IS NOT NULL
          GROUP BY prev_type, next_type
        )
        SELECT prev_type, next_type, n,
          ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
        FROM counts
    """,
    "gapfill_daily_revenue": """
        WITH daily AS (
          SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS epoch_day,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
          FROM orders GROUP BY epoch_day
        ),
        spine AS (
          SELECT unnest(generate_series(
            (SELECT MIN(epoch_day) FROM daily),
            (SELECT MAX(epoch_day) FROM daily))) AS epoch_day
        )
        SELECT CAST(s.epoch_day AS BIGINT) AS epoch_day,
          ROUND(COALESCE(d.cents, 0) / 100.0, 2) AS day_revenue,
          CAST(s.epoch_day - last_value(
            CASE WHEN d.cents IS NOT NULL THEN s.epoch_day END IGNORE NULLS
          ) OVER (ORDER BY s.epoch_day) AS BIGINT) AS days_since_sale
        FROM spine s LEFT JOIN daily d ON s.epoch_day = d.epoch_day
    """,
}
