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

from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
    derive_band_width,
    with_global_rank,
)
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


def monthly_order_value_percentiles(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Monthly p50/p90/max order value — the quantile TREND monitor
    (a mean hides the tail; a global quantile hides the drift; the
    dashboard wants the percentile PER month). Discrete rank picks
    (percentile_disc form, the event_interarrival_disc idiom): integer
    cents, the value AT rank ceil(q*n) with orderkey tie-break, so the
    series is engine-exact. r9 scale migration: the ranks now run the
    with_grouped_rank (month, cents-band) lane the old docstring
    promised for extreme per-month volumes — no month-sized window
    partition remains; values hash-identical."""
    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        derive_band_width,
        with_grouped_rank,
    )

    orders = load_table(spark, "orders", sf_dir)
    d = orders.select(
        F.expr(
            "(year(cast(o_orderdate as date)) - 1970) * 12"
            " + month(cast(o_orderdate as date)) - 1"
        ).cast("long").alias("month"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    width = derive_band_width(d, "cents")
    ranked = with_grouped_rank(
        d, ["month"], ["cents", "o_orderkey"],
        bucket=F.floor(F.col("cents") / F.lit(width)),
        rank_col="rn", count_col="n",
    )
    pick = lambda q: F.max(
        F.when(F.col("rn") == F.expr(f"cast(ceil(n * {q}) as bigint)"),
               F.col("cents"))
    )
    return ranked.groupBy("month").agg(
        F.max("n").alias("n_orders"),
        (pick(0.5) / F.lit(100.0)).alias("p50_value"),
        (pick(0.9) / F.lit(100.0)).alias("p90_value"),
        (F.max("cents") / F.lit(100.0)).alias("max_value"),
    )


def rolling_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day distinct active users per day (rolling
    WAU), plus same-day DAU and the DAU/WAU stickiness ratio — the
    product-health headline a RANGE window cannot produce (windowed
    COUNT(DISTINCT) isn't supported, and approximate sketches change
    the number).

    The scale-safe exact form: distinct (user, day) rows FAN OUT to
    the <=7 window-end days each supports (a bounded explode — 7x the
    per-day-distinct frame, NOT 7x the event count), then one
    countDistinct groupBy per window-end day. Window ends are clamped
    to the observed [min_day, max_day] span via a broadcast 1-row
    bounds frame. All integers until the final stickiness ratio."""
    ev = load_table(spark, "events", sf_dir)
    du = ev.select(
        "user_id",
        F.expr("datediff(cast(ts as date), date '1970-01-01')").alias("day"),
    ).distinct()
    bounds = du.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    fan = du.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("wday"),
    )
    wau = fan.groupBy("wday").agg(F.countDistinct("user_id").alias("wau"))
    dau = du.groupBy(F.col("day").alias("wday")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    return (
        wau.join(dau, "wday", "left")
        .crossJoin(F.broadcast(bounds))
        .where((F.col("wday") >= F.col("mn")) & (F.col("wday") <= F.col("mx")))
        .select(
            F.col("wday").cast("long").alias("epoch_day"),
            "wau",
            F.coalesce(F.col("dau"), F.lit(0)).alias("dau"),
            F.round(
                F.coalesce(F.col("dau"), F.lit(0)).cast("double")
                / F.col("wau").cast("double"), 6
            ).alias("stickiness"),
        )
    )


def event_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the event value per user — the
    irregular-series aggregate a plain AVG gets wrong (a value held for
    an hour must weigh 3600x one held for a second).

    Each event's value is held until the user's NEXT event (lead
    window); the last event has no holding interval and drops out.
    All arithmetic stays integer until the final division: weights are
    microsecond gaps (timestampdiff), values are cents, and the
    weighted sum accumulates in DECIMAL(38,0) — matching the oracle's
    HUGEINT, because cents x year-scale-microsecond products exceed
    int64 after a few dozen intervals and a BIGINT sum would silently
    wrap where the oracle doesn't. Spark and the oracle divide the
    SAME two integers and the double quotient is bit-identical.
    One shuffle (user_id window); the groupBy rides the same
    partitioning. Degenerate all-same-timestamp users (zero total
    span) are excluded rather than emitting NaN."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id", "ts", "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .withColumn("next_ts", F.lead("ts").over(w))
        .where(F.col("next_ts").isNotNull())
        .withColumn(
            "dur_us", F.expr("timestampdiff(MICROSECOND, ts, next_ts)")
        )
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("dur_us").alias("span_us"),
            F.sum(F.col("cents").cast("decimal(38,0)")
                  * F.col("dur_us")).alias("wsum"),
        )
        .where(F.col("span_us") > 0)
        .select(
            "user_id",
            "n_intervals",
            "span_us",
            (
                F.col("wsum").cast("double")
                / F.col("span_us").cast("double")
                / F.lit(100.0)
            ).alias("twa_value"),
        )
    )


def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event type — the resampling shape every
    time-series store exposes (open/high/low/close + count + volume).

    Open/close are picked deterministically as the cents of the
    MIN/MAX (ts, event_id, cents) struct — (ts, event_id) is unique,
    so the lexicographic struct extreme IS the first/last event, with
    no dependence on partition order (unlike first()/last()).

    r9 scale migration: the original two ROW_NUMBER windows sorted
    every (type, day) cell — cells are rate-bounded but at 100 TB a
    hot day of one type is still a giant single-task sort. Struct
    min/max are ASSOCIATIVE aggregates, so the whole bar computes
    map-side-combined in ONE shuffle with no window and no sort at
    all — the ideal resampling shape. Values hash-identical (same
    deterministic pick)."""
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    first = F.min(F.struct("ts", "event_id", "cents"))
    last = F.max(F.struct("ts", "event_id", "cents"))
    return base.groupBy("event_type", "day").agg(
        F.count("*").alias("n_events"),
        (first["cents"] / F.lit(100.0)).alias("open"),
        (F.max("cents") / F.lit(100.0)).alias("high"),
        (F.min("cents") / F.lit(100.0)).alias("low"),
        (last["cents"] / F.lit(100.0)).alias("close"),
        (F.sum("cents") / F.lit(100.0)).alias("volume"),
    )


def session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 session opening paths: the first three event types of
    every 30-min-gap session, '>'-joined (the product-analytics "what
    do users do first" report, and the same composition the sessionize
    operator feeds at 100 TB).

    Session ids come from the lag+cumsum idiom (one user_id window);
    the first-3 pick is the codegen conditional-MAX pivot on the
    in-session row number (no collect_list ordering hazard); the final
    top-10 is a count rollup over a path space bounded by
    |event_type|^3. Ties rank deterministically (count desc, path)."""
    ev = load_table(spark, "events", sf_dir)
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_sess = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_ts", F.lag("ts").over(w_u))
        .withColumn(
            "new_s",
            # microsecond-exact gap (a SECOND diff truncates: a
            # 1800.5s gap would merge here but split in the oracle)
            F.when(
                F.col("prev_ts").isNull()
                | (F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
                   > 1800 * 1_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_s").over(
            w_u.rowsBetween(Window.unboundedPreceding, 0)))
    )
    w_s = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    first3 = (
        with_sess.withColumn("rn", F.row_number().over(w_s))
        .where(F.col("rn") <= 3)
        .groupBy("user_id", "session_id")
        .agg(
            F.concat_ws(
                ">",
                *[
                    F.max(F.when(F.col("rn") == i, F.col("event_type")))
                    for i in (1, 2, 3)
                ],
            ).alias("path")
        )
    )
    w_rank = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return (
        first3.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .where(F.col("rank") <= 10)
    )


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (1-day window, 6-hour slide): every
    event lands in 4 overlapping windows — the smoothing shape tumbling
    windows can't express. Spark's window() emits the per-event window
    list map-side (an Expand, like CUBE); the oracle reproduces it by
    cross-joining each event with its 4 slide offsets. Money is
    integer cents; window bounds are emitted as epoch seconds (integer,
    TZ-free)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 day", "6 hours"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long"))
                / F.lit(100.0), 2
            ).alias("sum_value"),
        )
        .select(
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                " window.start)"
            ).cast("long").alias("window_start_s"),
            "event_type",
            "n",
            "sum_value",
        )
    )


KM_HORIZON_S = 7 * 24 * 3600  # right-censor at 7 days


def km_risk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier risk table for time-to-purchase after first view:
    per distinct event time (relative seconds, floored), the number at
    risk, converting, and censored — the survival-analysis primitive.

    Deliberately INTEGER-ONLY: the K-M survival curve is a running
    PRODUCT of rationals, and neither a float product nor exp(sum(ln))
    is bit-portable; the risk table carries the full information (any
    client can fold the product locally) and hash-verifies exactly.
    Users with no purchase inside the horizon are right-censored AT
    the horizon. Two user_id-co-partitioned aggs + one time rollup;
    the n-at-risk reverse cumsum runs through the banded two-pass
    idiom (functions/ranking.py) — the time grid is horizon-bounded
    (≤ 604,801 distinct seconds) but that is still too many rows for
    the single task a global ORDER BY window would force, so fixed
    4096-second bands (~148 parallel windows; the band range is a
    CONSTANT of the operator, so no data-derived width is needed)
    carry the running sum instead."""
    ev = load_table(spark, "events", sf_dir)
    first_view = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ft"))
    )
    to_purchase = (
        ev.join(first_view, "user_id")
        .where(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("ft"))
        )
        .groupBy("user_id")
        .agg(
            F.min(F.expr("timestampdiff(MICROSECOND, ft, ts) DIV 1000000"))
            .alias("t_conv")
        )
    )
    per_user = first_view.join(to_purchase, "user_id", "left").select(
        F.when(
            F.col("t_conv").isNotNull() & (F.col("t_conv") <= KM_HORIZON_S),
            F.col("t_conv"),
        ).otherwise(F.lit(KM_HORIZON_S)).alias("t"),
        F.when(
            F.col("t_conv").isNotNull() & (F.col("t_conv") <= KM_HORIZON_S),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("converted"),
    )
    events_t = per_user.groupBy("t").agg(
        F.sum("converted").alias("d"),
        F.sum(F.expr("1 - converted")).alias("c"),
    )
    # reverse cumsum (sum over t' >= t) = forward cumsum over -t;
    # bucket floor(-t / 4096) is monotone in the sort key, so the
    # banded rank+cumsum equals the global desc-t window exactly
    banded = with_global_rank(
        events_t.withColumn("neg_t", -F.col("t"))
        .withColumn("risk", F.col("d") + F.col("c")),
        ["neg_t"],
        F.floor(F.col("neg_t") / F.lit(4096)),
        cumsum_of="risk",
        cumsum_col="n_at_risk",
    )
    return banded.select(
        F.col("t").cast("long").alias("t_seconds"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("n_converted"),
        F.col("c").cast("long").alias("n_censored"),
    )


def revenue_growth_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: each month's revenue delta split into a
    VOLUME effect (order-count change at the previous month's average
    ticket) and a VALUE effect (everything else) — the BI decomposition
    behind every 'why did revenue move' review.

    Exact integer accounting identity: volume_cents = delta_n *
    (prev_cents DIV prev_n) and value_cents = delta_cents -
    volume_cents, so the two effects sum to the delta TO THE CENT in
    every row (no leakage term; pinned in tests). One month rollup +
    one lag window over the month-sized frame."""
    orders = load_table(spark, "orders", sf_dir)
    monthly = orders.groupBy(
        F.date_format(F.col("o_orderdate"), "yyyy-MM").alias("month")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    )
    w = Window.orderBy("month")
    d = (
        monthly.withColumn("prev_n", F.lag("n_orders").over(w))
        .withColumn("prev_cents", F.lag("cents").over(w))
        .where(F.col("prev_n").isNotNull())
        .withColumn("delta_cents", F.col("cents") - F.col("prev_cents"))
        .withColumn(
            "volume_cents",
            (F.col("n_orders") - F.col("prev_n"))
            * F.expr("prev_cents DIV prev_n"),
        )
    )
    return d.select(
        "month",
        "n_orders",
        (F.col("cents") / F.lit(100.0)).alias("revenue"),
        (F.col("delta_cents") / F.lit(100.0)).alias("delta_revenue"),
        (F.col("volume_cents") / F.lit(100.0)).alias("volume_effect"),
        ((F.col("delta_cents") - F.col("volume_cents")) / F.lit(100.0))
        .alias("value_effect"),
    )


def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency distribution: seconds from a user's FIRST view
    to their FIRST subsequent purchase, summarized as discrete
    percentiles (percentile_disc form: the value AT rank
    ceil(q * n) — an integer pick, no interpolation, so the report is
    engine-exact; the interpolated twin is price_quantiles).
    Completes the funnel suite: view_purchase_funnel counts WHO
    converts, km_risk_table shows the hazard curve, this reports HOW
    FAST. All µs-floored integer seconds; one user_id-co-partitioned
    rollup. Ranking is the two-pass distributed form
    (functions/ranking.py) bucketed by latency hour — per-bucket
    parallel row_number + broadcast offsets, no single-partition
    window; the rank picked at ceil(q*n) yields the same t_s value
    regardless of tie order inside equal t_s, so output is identical
    to the global-window form."""
    ev = load_table(spark, "events", sf_dir)
    first_view = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ft"))
    )
    conv = (
        ev.join(first_view, "user_id")
        .where(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("ft"))
        )
        .groupBy("user_id")
        .agg(
            F.min(F.expr("timestampdiff(MICROSECOND, ft, ts) DIV 1000000"))
            .alias("t_s")
        )
    )
    # the conversion-latency frame feeds three actions (count, the
    # width probe, the rank query) — checkpoint so the events
    # self-join runs once
    conv = conv.localCheckpoint(eager=False)
    n = conv.agg(F.count("*").alias("_n"))
    # latency band width derived from the data (hour-bands collapse if
    # conversions cluster in minutes, or explode over a years-long log)
    width = derive_band_width(conv, "t_s")
    ranked = with_global_rank(
        conv,
        ["t_s", "user_id"],
        bucket=F.floor(F.col("t_s") / F.lit(width)),
        rank_col="rn",
    ).crossJoin(F.broadcast(n))
    pick = lambda q: F.max(
        F.when(F.col("rn") == F.expr(f"cast(ceil(_n * {q}) as bigint)"),
               F.col("t_s"))
    )
    return ranked.agg(
        F.max("_n").alias("n_converters"),
        pick(0.5).alias("p50_seconds"),
        pick(0.9).alias("p90_seconds"),
        F.max("t_s").alias("max_seconds"),
    )


def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: cumulative spend per cohort MEMBER
    by week offset — the revenue companion to cohort_retention
    (activity says who came back; LTV says what they were worth).
    Spend is integer cents; the cumulative window runs over the
    bounded (cohort_week x offset) frame; per-member LTV is one raw
    double division of two integers (cum_cents / cohort_size / 100)."""
    ev = load_table(spark, "events", sf_dir)
    weeks = ev.select(
        "user_id",
        F.expr(_EPOCH_WEEK).alias("week"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size"))
    spend = (
        weeks.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.sum("cents").alias("week_cents"))
    )
    w = Window.partitionBy("cohort_week").orderBy("week_offset").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        spend.withColumn("cum_cents", F.sum("week_cents").over(w))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            F.col("week_offset").cast("long").alias("week_offset"),
            "cohort_size",
            (F.col("week_cents") / F.lit(100.0)).alias("week_revenue"),
            (
                F.col("cum_cents").cast("double")
                / F.col("cohort_size").cast("double") / F.lit(100.0)
            ).alias("ltv_per_member"),
        )
    )


def monthly_new_vs_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split into NEW customers (first-ever order that
    month) vs REPEAT — the acquisition-vs-retention revenue mix every
    growth review opens with. A customer's orders in their first month
    all count as new (month granularity). Two shuffles: the
    per-customer first-month min and the month rollup; integer cents
    throughout; raw double division only at the display share."""
    orders = load_table(spark, "orders", sf_dir)
    om = orders.select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    first_month = om.groupBy("o_custkey").agg(
        F.min("month").alias("first_month"))
    tagged = om.join(first_month, "o_custkey").withColumn(
        "is_new", (F.col("month") == F.col("first_month")).cast("int")
    )
    return (
        tagged.groupBy("month")
        .agg(
            F.sum(F.when(F.col("is_new") == 1, F.col("cents"))
                  .otherwise(0)).alias("new_cents"),
            F.sum(F.when(F.col("is_new") == 0, F.col("cents"))
                  .otherwise(0)).alias("repeat_cents"),
            F.countDistinct(
                F.when(F.col("is_new") == 1, F.col("o_custkey"))
            ).alias("n_new_customers"),
        )
        .select(
            "month",
            (F.col("new_cents") / F.lit(100.0)).alias("new_revenue"),
            (F.col("repeat_cents") / F.lit(100.0)).alias("repeat_revenue"),
            "n_new_customers",
            (
                F.col("new_cents").cast("double")
                / (F.col("new_cents") + F.col("repeat_cents")).cast("double")
            ).alias("new_share"),
        )
    )


def event_interarrival_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival latency percentiles (global stream,
    ordered by ts, event_id): p50/p90/max gap in µs-floored seconds,
    percentile_disc rank picks — the feed-health monitor that tells a
    pipeline how bursty each event class is.

    r9 scale migration: both per-type passes were whole-group windows
    (corpus/5 per task). The LAG becomes a banded rank + an adjacency
    self-join on (type, rank == rank-1) — one extra co-partitioned
    shuffle, no group-sized sort; the percentile ranks run the same
    grouped banded lane. Values hash-identical (adjacency under a
    strict total order is band-independent)."""
    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        derive_band_width,
        with_grouped_rank,
    )

    ev = load_table(spark, "events", sf_dir)
    base = ev.select("event_type", "ts", "event_id").withColumn(
        "tsec",
        F.expr(
            "timestampdiff(SECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).cast("long"),
    )
    twidth = derive_band_width(base, "tsec")
    seq = with_grouped_rank(
        base, ["event_type"], ["ts", "event_id"],
        bucket=F.floor(F.col("tsec") / F.lit(twidth)),
        rank_col="seq",
    )
    prev = seq.select(
        "event_type",
        (F.col("seq") + 1).alias("seq"),
        F.col("ts").alias("prev_ts"),
    )
    gaps = (
        seq.join(prev, ["event_type", "seq"])
        .select(
            "event_type",
            "event_id",
            F.expr("timestampdiff(MICROSECOND, prev_ts, ts) DIV 1000000")
            .alias("gap_s"),
        )
    )
    gwidth = derive_band_width(gaps, "gap_s")
    ranked = with_grouped_rank(
        gaps, ["event_type"], ["gap_s", "event_id"],
        bucket=F.floor(F.col("gap_s") / F.lit(gwidth)),
        rank_col="rn", count_col="n",
    )
    pick = lambda q: F.max(
        F.when(F.col("rn") == F.expr(f"cast(ceil(n * {q}) as bigint)"),
               F.col("gap_s"))
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n_gaps"),
        pick(0.5).alias("p50_gap_s"),
        pick(0.9).alias("p90_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


def event_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap — the seasonality
    profile behind batch scheduling and anomaly baselines. DOW and
    hour come from pure epoch-second integer arithmetic
    ((epoch_day + 4) % 7: 1970-01-01 was a Thursday, 0 = Sunday) —
    NOT dayofweek()/hour(), whose numbering and TZ behavior differ
    across engines. One map-side-combined rollup, 7x24-bounded."""
    ev = load_table(spark, "events", sf_dir)
    es = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    return (
        ev.select(
            ((es / 86400).cast("long") + 4).alias("ed"),
            ((es % 86400) / 3600).cast("long").alias("hour"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .select((F.col("ed") % 7).alias("dow"), "hour", "cents")
        .groupBy("dow", "hour")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("cents") / F.lit(100.0), 2).alias("sum_value"),
        )
    )


ATTR_WINDOW_US = 7 * 86400 * 1_000_000  # 7-day lookback, integer µs


def attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch purchase attribution under three industry models in
    one pass: each purchase's cents are credited to the user's view
    events in the 7 days before it — all to the FIRST touch, all to
    the LAST touch, or split LINEARly — then rolled up by the touch's
    day-of-week (the epoch-integer DOW of event_dow_hour_heatmap), so
    the report answers "which day's browsing actually drives revenue"
    per model. Purchases with no view in the window surface as
    dow = -1 (never silently dropped — the unattributed share is the
    report's honesty column).

    Integer end-to-end: µs timestamps, integer cents, linear split as
    cents * 1e6 DIV n_touches micro-cents (floor; the remainder is
    deliberately NOT redistributed so every engine computes the same
    cell). Scale shape: one user-keyed equi-join bounded by the 7-day
    predicate, per-PURCHASE windows (a user's weekly view count bounds
    every frame), 3x row fan-out via stack, then a 3-model x 8-dow
    bounded rollup. No global window, no theta join."""
    ev = load_table(spark, "events", sf_dir)
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        us.alias("pts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"),
        F.col("user_id").alias("vu"),
        us.alias("vts"),
    )
    j = purchases.join(
        views,
        (F.col("pu") == F.col("vu"))
        & (F.col("vts") < F.col("pts"))
        & (F.col("pts") - F.col("vts") <= F.lit(ATTR_WINDOW_US)),
        "left",
    )
    wp = Window.partitionBy("pid")
    touched = j.select(
        "pid", "cents", "vid", "vts",
        F.count("vid").over(wp).alias("n_touch"),
        F.row_number().over(wp.orderBy(F.asc_nulls_last("vts"), "vid"))
        .alias("rn_first"),
        F.row_number().over(
            wp.orderBy(F.desc_nulls_last("vts"), F.desc_nulls_last("vid"))
        ).alias("rn_last"),
    )
    full = (F.col("cents") * F.lit(1_000_000)).cast("long")
    credited = touched.select(
        F.when(F.col("vid").isNull(), F.lit(-1))
        .otherwise(F.expr("(vts div 1000000 div 86400 + 4) % 7"))
        .cast("long")
        .alias("dow"),
        F.when(F.col("n_touch") == 0, full)
        .when(F.col("rn_first") == 1, full).otherwise(F.lit(0))
        .alias("first"),
        F.when(F.col("n_touch") == 0, full)
        .when(F.col("rn_last") == 1, full).otherwise(F.lit(0))
        .alias("last"),
        F.when(F.col("n_touch") == 0, full)
        .otherwise(F.expr("cents * 1000000 DIV n_touch").cast("long"))
        .alias("linear"),
    )
    return (
        credited.select(
            "dow",
            F.expr(
                "stack(3, 'first', first, 'last', last, 'linear', linear)"
                " as (model, credit_micro)"
            ),
        )
        .groupBy("model", "dow")
        .agg(
            F.count("*").alias("n_touches"),
            F.sum("credit_micro").alias("credit_micro"),
        )
        # zero-credit touches are real rows (non-first views under the
        # first-touch model); keep them — they carry n_touches
    )


ATTRIBUTION_ORACLE = f"""
    WITH p AS (
      SELECT event_id AS pid, user_id AS pu, epoch_us(ts) AS pts,
        CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT event_id AS vid, user_id AS vu, epoch_us(ts) AS vts
      FROM events WHERE event_type = 'view'
    ),
    j AS (
      SELECT p.pid, p.cents, v.vid, v.vts
      FROM p LEFT JOIN v
        ON p.pu = v.vu AND v.vts < p.pts
        AND p.pts - v.vts <= {ATTR_WINDOW_US}
    ),
    t AS (
      SELECT pid, cents, vid, vts,
        COUNT(vid) OVER (PARTITION BY pid) AS n_touch,
        ROW_NUMBER() OVER (PARTITION BY pid
          ORDER BY vts ASC NULLS LAST, vid ASC NULLS LAST) AS rn_first,
        ROW_NUMBER() OVER (PARTITION BY pid
          ORDER BY vts DESC NULLS LAST, vid DESC NULLS LAST) AS rn_last
      FROM j
    ),
    c AS (
      SELECT
        CAST(CASE WHEN vid IS NULL THEN -1
             ELSE ((vts // 1000000) // 86400 + 4) % 7 END AS BIGINT)
          AS dow,
        CASE WHEN n_touch = 0 THEN cents * 1000000
             WHEN rn_first = 1 THEN cents * 1000000 ELSE 0 END AS f_c,
        CASE WHEN n_touch = 0 THEN cents * 1000000
             WHEN rn_last = 1 THEN cents * 1000000 ELSE 0 END AS l_c,
        CASE WHEN n_touch = 0 THEN cents * 1000000
             ELSE cents * 1000000 // n_touch END AS lin_c
      FROM t
    ),
    m AS (
      SELECT dow, 'first' AS model, f_c AS credit FROM c
      UNION ALL SELECT dow, 'last', l_c FROM c
      UNION ALL SELECT dow, 'linear', lin_c FROM c
    )
    SELECT model, dow, CAST(COUNT(*) AS BIGINT) AS n_touches,
      CAST(SUM(credit) AS BIGINT) AS credit_micro
    FROM m GROUP BY model, dow
"""


def funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order WINDOWED 3-step funnel (view -> click within 24h ->
    purchase within 24h of that click): a user counts at each step only
    if the step's FIRST qualifying occurrence is strictly after the
    previous step's and inside the step window — the ordered-sequence
    semantics MATCH_RECOGNIZE sells, composed from three per-user min
    aggregates instead (each an integer-µs groupBy; the three shuffles
    share the user_id partitioning, which AQE reuses). One summary row:
    per-step user counts + integer-ppm step and overall conversion.
    The 2-step funnel (view_purchase_funnel) and the latency view
    (funnel_time_to_convert) are this report's siblings."""
    ev = load_table(spark, "events", sf_dir)
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    typed = ev.select("user_id", "event_type", us.alias("t"))
    v = (
        typed.where(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("t").alias("vt"))
    )
    c = (
        typed.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where((F.col("t") > F.col("vt"))
               & (F.col("t") - F.col("vt") <= F.lit(FUNNEL3_STEP_US)))
        .groupBy("user_id").agg(F.min("t").alias("ct"))
    )
    p = (
        typed.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where((F.col("t") > F.col("ct"))
               & (F.col("t") - F.col("ct") <= F.lit(FUNNEL3_STEP_US)))
        .groupBy("user_id").agg(F.min("t").alias("pt"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase")))
        .select(
            "n_view", "n_click", "n_purchase",
            F.expr("n_click * 1000000 DIV n_view").alias("click_ppm"),
            F.expr("n_purchase * 1000000 DIV n_click")
            .alias("purchase_ppm"),
            F.expr("n_purchase * 1000000 DIV n_view").alias("overall_ppm"),
        )
    )


FUNNEL3_STEP_US = 24 * 3600 * 1_000_000  # per-step conversion window


FUNNEL3_ORACLE = f"""
    WITH typed AS (
      SELECT user_id, event_type, epoch_us(ts) AS t FROM events
    ),
    v AS (
      SELECT user_id, MIN(t) AS vt FROM typed
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT typed.user_id, MIN(t) AS ct FROM typed
      JOIN v USING (user_id)
      WHERE event_type = 'click' AND t > vt
        AND t - vt <= {FUNNEL3_STEP_US} GROUP BY typed.user_id
    ),
    p AS (
      SELECT typed.user_id, MIN(t) AS pt FROM typed
      JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND t > ct
        AND t - ct <= {FUNNEL3_STEP_US} GROUP BY typed.user_id
    )
    SELECT
      CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
      CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click,
      CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase,
      CAST((SELECT COUNT(*) FROM c) * 1000000
           // (SELECT COUNT(*) FROM v) AS BIGINT) AS click_ppm,
      CAST((SELECT COUNT(*) FROM p) * 1000000
           // (SELECT COUNT(*) FROM c) AS BIGINT) AS purchase_ppm,
      CAST((SELECT COUNT(*) FROM p) * 1000000
           // (SELECT COUNT(*) FROM v) AS BIGINT) AS overall_ppm
"""


def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entry-type session bounce report: sessions grouped by their
    FIRST event's type, with bounce share (single-event sessions) and
    average session depth — 'which landing action loses people'. Same
    30-min lag+cumsum sessionization as session_top_paths (one user_id
    window); everything after is a session-sized rollup bounded by
    |event_type|. Integer ppm / micro-depth divisions."""
    ev = load_table(spark, "events", sf_dir)
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_sess = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_ts", F.lag("ts").over(w_u))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev_ts").isNull()
                | (F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
                   > 1800 * 1_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sess",
            F.sum("new_s").over(
                w_u.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    w_s = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    sessions = (
        with_sess.withColumn("rn", F.row_number().over(w_s))
        .groupBy("user_id", "sess")
        .agg(
            F.count("*").alias("depth"),
            F.max(F.when(F.col("rn") == 1, F.col("event_type")))
            .alias("entry_type"),
        )
    )
    return (
        sessions.groupBy("entry_type")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(F.when(F.col("depth") == 1, 1).otherwise(0))
            .alias("n_bounces"),
            F.sum("depth").alias("total_events"),
        )
        .select(
            "entry_type", "n_sessions", "n_bounces",
            F.expr("n_bounces * 1000000 DIV n_sessions")
            .alias("bounce_ppm"),
            F.expr("total_events * 1000000 DIV n_sessions")
            .alias("depth_micro"),
        )
    )


BOUNCE_ORACLE = """
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL
        OR date_diff('microsecond', prev_ts, ts) > 1800 * 1000000
        THEN 1 ELSE 0 END AS new_s
      FROM e
    ),
    with_sess AS (
      SELECT user_id, ts, event_id, event_type,
        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM flagged
    ),
    sess AS (
      SELECT user_id, sess, event_type,
        ROW_NUMBER() OVER (PARTITION BY user_id, sess
          ORDER BY ts, event_id) AS rn
      FROM with_sess
    ),
    per_session AS (
      SELECT user_id, sess, COUNT(*) AS depth,
        MAX(CASE WHEN rn = 1 THEN event_type END) AS entry_type
      FROM sess GROUP BY user_id, sess
    )
    SELECT entry_type,
      CAST(COUNT(*) AS BIGINT) AS n_sessions,
      CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_bounces,
      CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END) * 1000000
           // COUNT(*) AS BIGINT) AS bounce_ppm,
      CAST(SUM(depth) * 1000000 // COUNT(*) AS BIGINT) AS depth_micro
    FROM per_session GROUP BY entry_type
"""


def session_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day peak concurrent sessions (capacity-planning sweep line):
    every 30-min-gap session becomes a [first_event, last_event]
    interval; intervals are split at midnight into per-day pieces, each
    piece emits a +1 mark at its clamped start and a -1 mark one µs
    after its clamped end (so two sessions meeting at an instant both
    count at that instant), and the day's peak is the max running sum
    over marks ordered by (t, delta) — delta ascending puts the -1
    first at a tied timestamp, because a session whose last event was
    at t-1µs is gone by t.

    Scale shape: the running sum is NOT one window over a day's marks
    (a day's sessions grow with data). Marks are bucketed by hour
    offset within the day; the within-bucket running sum runs on
    (day, hour) partitions and a calendar-bounded (<=25 rows/day)
    window of bucket totals supplies the cross-bucket offsets — the
    with_global_rank two-pass decomposition, valid per day because
    every piece opens AND closes inside its day (per-day deltas sum to
    zero). The oracle runs the classic one-window sweep, so agreement
    proves the decomposition."""
    ev = load_table(spark, "events", sf_dir)
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_sess = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("prev_ts", F.lag("ts").over(w_u))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev_ts").isNull()
                | (F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
                   > 1800 * 1_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sess",
            F.sum("new_s").over(
                w_u.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    sessions = with_sess.groupBy("user_id", "sess").agg(
        F.min("ts").alias("s_ts"), F.max("ts").alias("e_ts")
    )
    pieces = (
        sessions
        .withColumn(
            "day", F.explode(F.expr("sequence(to_date(s_ts), to_date(e_ts))"))
        )
        .withColumn("day_start", F.col("day").cast("timestamp_ntz"))
        .withColumn(
            "next_day",
            F.expr("timestampadd(DAY, 1, cast(day as timestamp_ntz))"),
        )
        .withColumn("m_start", F.greatest("s_ts", "day_start"))
        .withColumn(
            "m_end",
            F.least(
                F.expr("timestampadd(MICROSECOND, 1, e_ts)"), F.col("next_day")
            ),
        )
    )
    marks = pieces.select(
        "day", F.col("m_start").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        pieces.select("day", F.col("m_end").alias("t"), F.lit(-1).alias("delta"))
    ).withColumn(
        # hour offset FROM day start (a -1 mark clamped to next
        # midnight lands in bucket 24, after every in-day mark —
        # hour(t) alone would missort it to bucket 0)
        "hr",
        F.expr("timestampdiff(HOUR, cast(day as timestamp_ntz), t)"),
    )
    bucket_tot = marks.groupBy("day", "hr").agg(F.sum("delta").alias("btot"))
    w_b = Window.partitionBy("day").orderBy("hr")
    offsets = bucket_tot.withColumn(
        "off",
        F.sum("btot").over(w_b.rowsBetween(Window.unboundedPreceding, 0))
        - F.col("btot"),
    )
    w_in = Window.partitionBy("day", "hr").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    run = marks.join(offsets.select("day", "hr", "off"), ["day", "hr"]).withColumn(
        "run", F.col("off") + F.sum("delta").over(w_in)
    )
    return run.groupBy("day").agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("n_sessions"),
        F.max("run").alias("peak_concurrent"),
    )


def session_daily_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day session LOAD INTEGRAL: total concurrent-session time
    (the area under the concurrency curve session_concurrency_peak
    takes the max of) plus the implied average concurrency. The
    integral needs NO sweep at all — ∫concurrency dt = Σ interval
    durations — so this is a pure rollup over the same midnight-split
    session pieces: exact µs sums (half-open [start, end+1µs) pieces,
    so single-event sessions still carry 1µs of load), average
    concurrency as integer ppm of the day."""
    ev = load_table(spark, "events", sf_dir)
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_sess = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("prev_ts", F.lag("ts").over(w_u))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev_ts").isNull()
                | (F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
                   > 1800 * 1_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sess",
            F.sum("new_s").over(
                w_u.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    sessions = with_sess.groupBy("user_id", "sess").agg(
        F.min("ts").alias("s_ts"), F.max("ts").alias("e_ts")
    )
    pieces = (
        sessions
        .withColumn(
            "day", F.explode(F.expr("sequence(to_date(s_ts), to_date(e_ts))"))
        )
        .withColumn("day_start", F.col("day").cast("timestamp_ntz"))
        .withColumn(
            "next_day",
            F.expr("timestampadd(DAY, 1, cast(day as timestamp_ntz))"),
        )
        .withColumn("m_start", F.greatest("s_ts", "day_start"))
        .withColumn(
            "m_end",
            F.least(
                F.expr("timestampadd(MICROSECOND, 1, e_ts)"), F.col("next_day")
            ),
        )
    )
    day_us = 86_400_000_000
    return pieces.groupBy("day").agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.expr("timestampdiff(MICROSECOND, m_start, m_end)"))
        .alias("load_us"),
    ).select(
        "day", "n_sessions", "load_us",
        F.expr(f"load_us * 1000000 DIV {day_us}")
        .alias("avg_concurrency_ppm"),
    )


LEADLAG_MAX = 3


def view_purchase_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation: Pearson corr between daily VIEW
    counts and daily PURCHASE value at day offsets -3..+3 — 'does view
    volume lead purchase revenue, and by how many days' (positive lag
    = views lead). The CCF is the causality-screening tool one corr
    number can't provide.

    Exactness: the five sufficient statistics are exact integer sums
    (DECIMAL(38,0)); the only irrationals are the two sqrt calls,
    which IEEE-754 requires to be CORRECTLY ROUNDED (the
    neyman_allocation finding) — so numerator, radicands, and the
    final quotient are engine-deterministic, rounded once at the
    output. Frames: two calendar-bounded daily rollups, a 7-way
    bounded offset join, one 7-row aggregate."""
    ev = load_table(spark, "events", sf_dir)
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("x"))
    )
    buys = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("y")
        )
    )
    lags = spark.range(-LEADLAG_MAX, LEADLAG_MAX + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    pairs = (
        views.crossJoin(F.broadcast(lags))
        .join(
            buys.select(F.col("d").alias("d2"), "y"),
            F.expr("date_add(d, lag) = d2"),
        )
    )
    stats = pairs.groupBy("lag").agg(
        F.count("*").alias("n_days"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.expr("cast(x as decimal(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("cast(y as decimal(38,0)) * y")).alias("syy"),
        F.sum(F.expr("cast(x as decimal(38,0)) * y")).alias("sxy"),
    )
    return stats.select(
        "lag", "n_days",
        F.round(
            F.expr(
                "cast(n_days * sxy - sx * sy as double)"
                " / (sqrt(cast(n_days * sxx - sx * sx as double))"
                "    * sqrt(cast(n_days * syy - sy * sy as double)))"
            ),
            6,
        ).alias("corr"),
    )


ACF_MAX = 7


def daily_event_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily event counts at lags 1..7 —
    the periodicity detector (a weekly cycle surfaces as a lag-7
    peak), completing the time-series toolkit next to the cross-series
    CCF (view_purchase_lead_lag) and the calendar seasonality index.
    Identical exactness discipline: integer sufficient statistics per
    lag over the aligned day pairs, IEEE-correctly-rounded sqrt, one
    rounding at the output. Calendar-bounded daily frame, 7-way offset
    self-join."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("x")
    )
    lags = spark.range(1, ACF_MAX + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    pairs = (
        daily.crossJoin(F.broadcast(lags))
        .join(
            daily.select(F.col("d").alias("d2"), F.col("x").alias("y")),
            F.expr("date_add(d, lag) = d2"),
        )
    )
    stats = pairs.groupBy("lag").agg(
        F.count("*").alias("n_days"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.expr("cast(x as decimal(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("cast(y as decimal(38,0)) * y")).alias("syy"),
        F.sum(F.expr("cast(x as decimal(38,0)) * y")).alias("sxy"),
    )
    return stats.select(
        "lag", "n_days",
        F.round(
            F.expr(
                "cast(n_days * sxy - sx * sy as double)"
                " / (sqrt(cast(n_days * sxx - sx * sx as double))"
                "    * sqrt(cast(n_days * syy - sy * sy as double)))"
            ),
            6,
        ).alias("acf"),
    )


ACF_ORACLE = f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    lags AS (SELECT UNNEST(range(1, {ACF_MAX} + 1)) AS lag),
    pairs AS (
      SELECT lag, a.x AS x, b.x AS y
      FROM daily a CROSS JOIN lags
      JOIN daily b ON b.d = a.d + CAST(lag AS INTEGER)
    ),
    stats AS (
      SELECT lag, COUNT(*) AS n_days,
        SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
        SUM(CAST(x AS HUGEINT) * x) AS sxx,
        SUM(CAST(y AS HUGEINT) * y) AS syy,
        SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INTEGER) AS lag, CAST(n_days AS BIGINT) AS n_days,
      ROUND(
        CAST(n_days * sxy - sx * sy AS DOUBLE)
        / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
           * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE))), 6) AS acf
    FROM stats
"""


LEADLAG_ORACLE = f"""
    WITH views AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x
      FROM events WHERE event_type = 'view' GROUP BY CAST(ts AS DATE)
    ),
    buys AS (
      SELECT CAST(ts AS DATE) AS d,
        SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
      FROM events WHERE event_type = 'purchase'
      GROUP BY CAST(ts AS DATE)
    ),
    lags AS (
      SELECT UNNEST(range(-{LEADLAG_MAX}, {LEADLAG_MAX} + 1)) AS lag
    ),
    pairs AS (
      SELECT lag, x, y
      FROM views CROSS JOIN lags
      JOIN buys ON buys.d = views.d + CAST(lag AS INTEGER)
    ),
    stats AS (
      SELECT lag, COUNT(*) AS n_days,
        SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
        SUM(CAST(x AS HUGEINT) * x) AS sxx,
        SUM(CAST(y AS HUGEINT) * y) AS syy,
        SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INTEGER) AS lag, CAST(n_days AS BIGINT) AS n_days,
      ROUND(
        CAST(n_days * sxy - sx * sy AS DOUBLE)
        / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
           * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE))), 6) AS corr
    FROM stats
"""


DAILY_LOAD_ORACLE = """
    WITH e AS (
      SELECT user_id, ts, event_id,
        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL
        OR date_diff('microsecond', prev_ts, ts) > 1800 * 1000000
        THEN 1 ELSE 0 END AS new_s
      FROM e
    ),
    with_sess AS (
      SELECT user_id, ts, event_id,
        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, sess, MIN(ts) AS s_ts, MAX(ts) AS e_ts
      FROM with_sess GROUP BY user_id, sess
    ),
    pieces AS (
      SELECT
        CAST(UNNEST(generate_series(CAST(s_ts AS DATE), CAST(e_ts AS DATE),
                                    INTERVAL 1 DAY)) AS DATE) AS day,
        s_ts, e_ts
      FROM sessions
    ),
    spans AS (
      SELECT day,
        GREATEST(s_ts, CAST(day AS TIMESTAMP)) AS m_start,
        LEAST(e_ts + INTERVAL 1 MICROSECOND,
              CAST(day AS TIMESTAMP) + INTERVAL 1 DAY) AS m_end
      FROM pieces
    )
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_sessions,
      CAST(SUM(date_diff('microsecond', m_start, m_end)) AS BIGINT)
        AS load_us,
      CAST(SUM(date_diff('microsecond', m_start, m_end)) * 1000000
           // 86400000000 AS BIGINT) AS avg_concurrency_ppm
    FROM spans GROUP BY day
"""


CONCURRENCY_ORACLE = """
    WITH e AS (
      SELECT user_id, ts, event_id,
        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL
        OR date_diff('microsecond', prev_ts, ts) > 1800 * 1000000
        THEN 1 ELSE 0 END AS new_s
      FROM e
    ),
    with_sess AS (
      SELECT user_id, ts, event_id,
        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, sess, MIN(ts) AS s_ts, MAX(ts) AS e_ts
      FROM with_sess GROUP BY user_id, sess
    ),
    pieces AS (
      SELECT user_id, sess, s_ts, e_ts,
        CAST(UNNEST(generate_series(CAST(s_ts AS DATE), CAST(e_ts AS DATE),
                                    INTERVAL 1 DAY)) AS DATE) AS day
      FROM sessions
    ),
    marks AS (
      SELECT day, GREATEST(s_ts, CAST(day AS TIMESTAMP)) AS t, 1 AS delta
      FROM pieces
      UNION ALL
      SELECT day,
        LEAST(e_ts + INTERVAL 1 MICROSECOND,
              CAST(day AS TIMESTAMP) + INTERVAL 1 DAY),
        -1
      FROM pieces
    ),
    run AS (
      SELECT day, delta,
        SUM(delta) OVER (PARTITION BY day ORDER BY t, delta
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM marks
    )
    SELECT day,
      CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_sessions,
      CAST(MAX(run) AS BIGINT) AS peak_concurrent
    FROM run GROUP BY day
"""


def monthly_revenue_stl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of monthly revenue:
    trend (centered 12-month moving average), per-calendar-month
    seasonal component, residual — the E90/E94 pair gives slope and a
    multiplicative index; this gives the full trend/seasonal/residual
    split an anomaly monitor subtracts before flagging.

    Exactness: the centered MA has half-weights at the +/-6 ends, so
    everything is carried in x24 units — trend_x24 = m[t-6] +
    2*sum(m[t-5..t+5]) + m[t+6], an exact integer; detrended_x24 =
    24*m[t] - trend_x24; seasonal_x24 = per-calendar-month floor mean
    (truncating DIV, cross-engine-identical on negatives); residual
    closes the identity residual_x24 = detrended_x24 - seasonal_x24
    exactly (law pinned). Trend is NULL at the 6-month edges (and
    wherever the 13-month window is incomplete) in both engines.

    Scale: the month frame is CALENDAR-BOUNDED (~84 rows at any
    corpus size), so the ordered windows here are constant-size — the
    documented exception to the banded-window rule. RANGE frames on
    the month index (not ROWS) keep the arithmetic correct even if a
    month has no orders."""
    orders = load_table(spark, "orders", sf_dir)
    m = orders.groupBy(
        F.expr(
            "(year(cast(o_orderdate as date)) - 1970) * 12"
            " + month(cast(o_orderdate as date)) - 1"
        ).alias("idx"),
        F.expr("month(cast(o_orderdate as date))").alias("cal_month"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .alias("rev")
    )
    w = Window.orderBy("idx")
    full = m.select(
        "idx",
        "cal_month",
        "rev",
        F.count("*").over(w.rangeBetween(-6, 6)).alias("n13"),
        F.sum("rev").over(w.rangeBetween(-6, -6)).alias("lo"),
        F.sum("rev").over(w.rangeBetween(-5, 5)).alias("mid"),
        F.sum("rev").over(w.rangeBetween(6, 6)).alias("hi"),
    ).withColumn(
        "trend_x24",
        F.when(
            F.col("n13") == 13,
            F.col("lo") + 2 * F.col("mid") + F.col("hi"),
        ),
    ).withColumn(
        "detrended_x24", 24 * F.col("rev") - F.col("trend_x24")
    )
    seasonal = (
        full.where(F.col("trend_x24").isNotNull())
        .groupBy("cal_month")
        .agg(
            F.expr(
                "CAST(sum(detrended_x24) DIV count(*) AS BIGINT)"
            ).alias("seasonal_x24")
        )
    )
    return (
        full.join(F.broadcast(seasonal), "cal_month", "left")
        .select(
            "idx",
            "cal_month",
            F.col("rev").alias("revenue_cents"),
            "trend_x24",
            "seasonal_x24",
            (F.col("detrended_x24") - F.col("seasonal_x24"))
            .alias("residual_x24"),
        )
    )


_STL_ORACLE = """
    WITH m AS (
      SELECT (year(CAST(o_orderdate AS DATE)) - 1970) * 12
               + month(CAST(o_orderdate AS DATE)) - 1 AS idx,
             CAST(month(CAST(o_orderdate AS DATE)) AS INTEGER)
               AS cal_month,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1, 2
    ),
    full_f AS (
      SELECT idx, cal_month, rev,
        CASE WHEN COUNT(*) OVER
               (ORDER BY idx RANGE BETWEEN 6 PRECEDING AND 6 FOLLOWING)
             = 13 THEN
          SUM(rev) OVER
            (ORDER BY idx RANGE BETWEEN 6 PRECEDING AND 6 PRECEDING)
          + 2 * SUM(rev) OVER
            (ORDER BY idx RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)
          + SUM(rev) OVER
            (ORDER BY idx RANGE BETWEEN 6 FOLLOWING AND 6 FOLLOWING)
        END AS trend_x24
      FROM m
    ),
    det AS (
      SELECT *, 24 * rev - trend_x24 AS detrended_x24 FROM full_f
    ),
    seasonal AS (
      SELECT cal_month,
             CAST(SUM(detrended_x24) // COUNT(*) AS BIGINT)
               AS seasonal_x24
      FROM det WHERE trend_x24 IS NOT NULL GROUP BY cal_month
    )
    SELECT idx, det.cal_month, rev AS revenue_cents,
           CAST(trend_x24 AS BIGINT) AS trend_x24,
           seasonal_x24,
           CAST(detrended_x24 - seasonal_x24 AS BIGINT) AS residual_x24
    FROM det LEFT JOIN seasonal ON det.cal_month = seasonal.cal_month
"""


def revenue_anomalies_stl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly flags: the E135 decomposition's
    residuals put through the E68 robust MAD cut (|r - median| >
    3*1.4826*MAD) — the monitor that does NOT fire on Decembers just
    for being December, because trend and month-shape were subtracted
    first. Composes the two entries; the oracle recomputes the whole
    chain so a drift in either half goes red here too.

    Integer end-to-end: residuals are exact x24 units; the median and
    MAD use the doubled-value idiom (med_x2 = the two middle values
    summed; mad_x4 = doubled median of dev_x2 = |2r - med_x2|), and
    the cut is the cross-multiplied integer predicate
    dev_x2 * 20000 > 22239 * mad_x4 — no float at the flag boundary.
    Frame is the interior-month set (calendar-bounded, ~72 rows), so
    the two rank windows are constant-size."""
    stl = monthly_revenue_stl(spark, sf_dir).where(
        F.col("residual_x24").isNotNull()
    ).select("idx", "cal_month", "revenue_cents", "residual_x24")
    w = Window.orderBy("residual_x24", "idx")
    ranked = stl.withColumn("rn", F.row_number().over(w))
    n = ranked.agg(F.count("*").alias("n"))
    med = (
        ranked.crossJoin(F.broadcast(n))
        .where(
            (F.col("rn") == F.expr("(n + 1) DIV 2"))
            | (F.col("rn") == F.expr("(n + 2) DIV 2"))
        )
        .agg(
            F.expr(
                "CASE WHEN count(*) = 1 THEN 2 * min(residual_x24)"
                " ELSE sum(residual_x24) END"
            ).alias("med_x2")
        )
    )
    dev = ranked.crossJoin(F.broadcast(med)).withColumn(
        "dev_x2", F.abs(2 * F.col("residual_x24") - F.col("med_x2"))
    )
    wd = Window.orderBy("dev_x2", "idx")
    dranked = dev.withColumn("dn", F.row_number().over(wd))
    mad = (
        dranked.crossJoin(F.broadcast(n))
        .where(
            (F.col("dn") == F.expr("(n + 1) DIV 2"))
            | (F.col("dn") == F.expr("(n + 2) DIV 2"))
        )
        .agg(
            F.expr(
                "CASE WHEN count(*) = 1 THEN 2 * min(dev_x2)"
                " ELSE sum(dev_x2) END"
            ).alias("mad_x4")
        )
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            "idx",
            "cal_month",
            "revenue_cents",
            "residual_x24",
            (F.col("dev_x2") * 20000 > 22239 * F.col("mad_x4"))
            .alias("is_anomaly"),
        )
    )


_STL_ANOM_ORACLE = f"""
    WITH stl AS (
      SELECT * FROM ({_STL_ORACLE}) WHERE residual_x24 IS NOT NULL
    ),
    ranked AS (
      SELECT idx, cal_month, revenue_cents, residual_x24,
        ROW_NUMBER() OVER (ORDER BY residual_x24, idx) AS rn
      FROM stl
    ),
    nn AS (SELECT COUNT(*) AS n FROM ranked),
    med AS (
      SELECT CASE WHEN COUNT(*) = 1 THEN 2 * MIN(residual_x24)
             ELSE SUM(residual_x24) END AS med_x2
      FROM ranked, nn
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    ),
    dev AS (
      SELECT r.*, ABS(2 * residual_x24 - med_x2) AS dev_x2
      FROM ranked r, med
    ),
    dranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY dev_x2, idx) AS dn FROM dev
    ),
    mad AS (
      SELECT CASE WHEN COUNT(*) = 1 THEN 2 * MIN(dev_x2)
             ELSE SUM(dev_x2) END AS mad_x4
      FROM dranked, nn
      WHERE dn = (n + 1) // 2 OR dn = (n + 2) // 2
    )
    SELECT idx, cal_month, revenue_cents, residual_x24,
      dev_x2 * 20000 > 22239 * mad_x4 AS is_anomaly
    FROM dev, mad
"""


def revenue_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the two zero-parameter forecasting
    baselines every real forecast must beat: naive (next month = this
    month) and seasonal-naive (next month = same month last year) —
    the missing EVALUATION leg of the time-series toolkit (E90 fits
    trend, E94/E135 fit seasonality, E131 detects periodicity; this
    says which baseline your data actually rewards, and any model
    that can't beat the winner here isn't worth shipping).

    One row per method over the months where BOTH forecasts exist
    (same eval set — otherwise the comparison is apples/oranges):
    n_months, MAE in exact cents (floor mean), and MAPE in ppm
    (per-month |err|*1e6 DIV actual — one truncating division per
    month in the calendar-bounded frame — then a floor mean).

    Plan: month rollup, two lag self-joins on the month index
    (calendar-bounded), a 2-method rollup. No windows at all."""
    orders = load_table(spark, "orders", sf_dir)
    m = orders.groupBy(
        F.expr(
            "(year(cast(o_orderdate as date)) - 1970) * 12"
            " + month(cast(o_orderdate as date)) - 1"
        ).alias("idx")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .alias("rev")
    )
    lag1 = m.select((F.col("idx") + 1).alias("idx"), F.col("rev").alias("f_naive"))
    lag12 = m.select(
        (F.col("idx") + 12).alias("idx"), F.col("rev").alias("f_snaive")
    )
    j = m.join(lag1, "idx").join(lag12, "idx")
    methods = j.select(
        "idx", "rev", F.lit("naive").alias("method"),
        F.col("f_naive").alias("f"),
    ).unionByName(
        j.select(
            "idx", "rev", F.lit("seasonal_naive").alias("method"),
            F.col("f_snaive").alias("f"),
        )
    )
    per = methods.select(
        "method",
        F.abs(F.col("rev") - F.col("f")).alias("ae"),
        F.expr(
            "CAST(abs(rev - f) AS DECIMAL(38,0)) * 1000000 DIV rev"
        ).alias("ape_ppm"),
    )
    return per.groupBy("method").agg(
        F.count("*").alias("n_months"),
        F.expr("CAST(sum(ae) DIV count(*) AS BIGINT)").alias("mae_cents"),
        F.expr(
            "CAST(sum(ape_ppm) DIV count(*) AS BIGINT)"
        ).alias("mape_ppm"),
    )


_BACKTEST_ORACLE = """
    WITH m AS (
      SELECT (year(CAST(o_orderdate AS DATE)) - 1970) * 12
               + month(CAST(o_orderdate AS DATE)) - 1 AS idx,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    j AS (
      SELECT a.idx, a.rev, l1.rev AS f_naive, l12.rev AS f_snaive
      FROM m a
      JOIN m l1 ON l1.idx = a.idx - 1
      JOIN m l12 ON l12.idx = a.idx - 12
    ),
    methods AS (
      SELECT idx, rev, 'naive' AS method, f_naive AS f FROM j
      UNION ALL
      SELECT idx, rev, 'seasonal_naive', f_snaive FROM j
    ),
    per AS (
      SELECT method, ABS(rev - f) AS ae,
             CAST(ABS(rev - f) AS HUGEINT) * 1000000 // rev AS ape_ppm
      FROM methods
    )
    SELECT method, CAST(COUNT(*) AS BIGINT) AS n_months,
      CAST(SUM(ae) // COUNT(*) AS BIGINT) AS mae_cents,
      CAST(SUM(ape_ppm) // COUNT(*) AS BIGINT) AS mape_ppm
    FROM per GROUP BY method
"""


def customer_interpurchase_time(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Median days between consecutive orders per market segment —
    the purchase-cadence KPI behind replenishment reminders and churn
    windows (a segment whose median gap stretches is quietly
    churning).

    Two-lane composition: per-customer adjacent gaps come from a
    PER-ENTITY window (partition key = custkey — bounded by one
    customer's order count, always safe), then the per-SEGMENT median
    of those gaps runs the with_grouped_rank banded lane (segments
    are corpus/5-sized — the whole-group-window class this round
    retired). x2 median idiom keeps the day count integer-exact; the
    display double is a raw halving."""
    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        derive_band_width,
        with_grouped_rank,
    )

    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    o = orders.select(
        "o_custkey", "o_orderkey",
        F.expr("datediff(cast(o_orderdate as date), date '1970-01-01')")
        .alias("d"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (
        o.withColumn("prev_d", F.lag("d").over(w))
        .where(F.col("prev_d").isNotNull())
        .select(
            "o_custkey", "o_orderkey",
            (F.col("d") - F.col("prev_d")).cast("long").alias("gap_days"),
        )
        .join(
            customer.select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            ),
            "o_custkey",
        )
    )
    width = derive_band_width(gaps, "gap_days")
    ranked = with_grouped_rank(
        gaps, ["c_mktsegment"], ["gap_days", "o_custkey", "o_orderkey"],
        bucket=F.floor(F.col("gap_days") / F.lit(width)),
        rank_col="rn", count_col="n",
    )
    return (
        ranked.where(
            (F.col("rn") == F.expr("(n + 1) DIV 2"))
            | (F.col("rn") == F.expr("(n + 2) DIV 2"))
        )
        .groupBy("c_mktsegment")
        .agg(
            F.max("n").alias("n_gaps"),
            F.when(F.count("*") == 1, F.sum("gap_days") * 2)
            .otherwise(F.sum("gap_days"))
            .cast("long")
            .alias("median_gap_x2_days"),
        )
        .select(
            "c_mktsegment",
            "n_gaps",
            "median_gap_x2_days",
            (F.col("median_gap_x2_days") / F.lit(2.0))
            .alias("median_gap_days"),
        )
    )


_INTERPURCHASE_ORACLE = """
    WITH o AS (
      SELECT o_custkey, o_orderkey,
             datediff('day', DATE '1970-01-01',
                      CAST(o_orderdate AS DATE)) AS d
      FROM orders
    ),
    gaps AS (
      SELECT o_custkey, o_orderkey,
             d - LAG(d) OVER (
               PARTITION BY o_custkey ORDER BY d, o_orderkey
             ) AS gap_days
      FROM o
    ),
    lab AS (
      SELECT g.o_custkey, g.o_orderkey,
             CAST(g.gap_days AS BIGINT) AS gap_days, c.c_mktsegment
      FROM gaps g JOIN customer c ON c.c_custkey = g.o_custkey
      WHERE g.gap_days IS NOT NULL
    ),
    ranked AS (
      SELECT *,
        ROW_NUMBER() OVER (
          PARTITION BY c_mktsegment
          ORDER BY gap_days, o_custkey, o_orderkey
        ) AS rn,
        COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM lab
    )
    SELECT c_mktsegment,
      CAST(MAX(n) AS BIGINT) AS n_gaps,
      CAST(CASE WHEN COUNT(*) = 1 THEN 2 * SUM(gap_days)
           ELSE SUM(gap_days) END AS BIGINT) AS median_gap_x2_days,
      CAST(CASE WHEN COUNT(*) = 1 THEN 2 * SUM(gap_days)
           ELSE SUM(gap_days) END AS BIGINT) / 2.0 AS median_gap_days
    FROM ranked
    WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    GROUP BY c_mktsegment
"""


def daily_error_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day error-event share with Wilson 95% score bounds — the
    rate monitor done right: a plain k/n with no interval flaps on
    quiet days (k=3, n=40 looks like a 7.5% spike; the Wilson lower
    bound says it is indistinguishable from 2%). Wilson beats the
    normal approximation exactly where monitors need it (small n,
    extreme p) and never leaves [0, 1].

    Portability: with z^2 = 3.8416 carried as the exact integer
    38416/1e4, the interval reduces to
      (1e4*k + 19208 -/+ 196*sqrt(1e4*k*(n-k) + 9604*n)/sqrt(n))
      / (1e4*n + 38416)
    — BOTH sqrt radicands are exact integers (DECIMAL products,
    converted to double once each), sqrt is IEEE-correctly-rounded
    (the F57 lane), and each bound is micro-rounded once. Everything
    else is exact integer arithmetic. One day-grain groupBy."""
    ev = load_table(spark, "events", sf_dir)
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("k"),
    )
    root = ("sqrt(CAST(10000 * CAST(k AS DECIMAL(38,0)) * (n - k)"
            " + 9604 * CAST(n AS DECIMAL(38,0)) AS DOUBLE))"
            " / sqrt(CAST(n AS DOUBLE))")
    den = "(10000 * CAST(n AS DECIMAL(38,0)) + 38416)"
    return d.select(
        "day",
        "n",
        "k",
        F.expr(
            "CAST(CAST(k AS DECIMAL(38,0)) * 1000000 DIV n AS BIGINT)"
        ).alias("rate_ppm"),
        F.expr(
            f"CAST(round((CAST(10000 * CAST(k AS DECIMAL(38,0))"
            f" + 19208 AS DOUBLE) - 196 * {root})"
            f" * 1000000 / CAST({den} AS DOUBLE)) AS BIGINT)"
        ).alias("wilson_lo_ppm"),
        F.expr(
            f"CAST(round((CAST(10000 * CAST(k AS DECIMAL(38,0))"
            f" + 19208 AS DOUBLE) + 196 * {root})"
            f" * 1000000 / CAST({den} AS DOUBLE)) AS BIGINT)"
        ).alias("wilson_hi_ppm"),
    )


_WILSON_ORACLE = """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM events GROUP BY 1
    )
    SELECT day, n, k,
      CAST(CAST(k AS HUGEINT) * 1000000 // n AS BIGINT) AS rate_ppm,
      CAST(ROUND((CAST(10000 * CAST(k AS HUGEINT) + 19208 AS DOUBLE)
           - 196 * sqrt(CAST(10000 * CAST(k AS HUGEINT) * (n - k)
                             + 9604 * CAST(n AS HUGEINT) AS DOUBLE))
                 / sqrt(CAST(n AS DOUBLE)))
           * 1000000
           / CAST(10000 * CAST(n AS HUGEINT) + 38416 AS DOUBLE))
        AS BIGINT) AS wilson_lo_ppm,
      CAST(ROUND((CAST(10000 * CAST(k AS HUGEINT) + 19208 AS DOUBLE)
           + 196 * sqrt(CAST(10000 * CAST(k AS HUGEINT) * (n - k)
                             + 9604 * CAST(n AS HUGEINT) AS DOUBLE))
                 / sqrt(CAST(n AS DOUBLE)))
           * 1000000
           / CAST(10000 * CAST(n AS HUGEINT) + 38416 AS DOUBLE))
        AS BIGINT) AS wilson_hi_ppm
    FROM d
"""


TEMPORAL_QUERIES = {
    "daily_error_rate_wilson": daily_error_rate_wilson,
    "daily_event_acf": daily_event_acf,
    "monthly_revenue_stl": monthly_revenue_stl,
    "revenue_anomalies_stl": revenue_anomalies_stl,
    "revenue_forecast_backtest": revenue_forecast_backtest,
    "customer_interpurchase_time": customer_interpurchase_time,
    "view_purchase_lead_lag": view_purchase_lead_lag,
    "session_daily_load": session_daily_load,
    "session_concurrency_peak": session_concurrency_peak,
    "attribution_credit": attribution_credit,
    "funnel_three_step": funnel_three_step,
    "session_bounce_rate": session_bounce_rate,
    "session_top_paths": session_top_paths,
    "km_risk_table": km_risk_table,
    "revenue_growth_decomposition": revenue_growth_decomposition,
    "funnel_time_to_convert": funnel_time_to_convert,
    "cohort_ltv": cohort_ltv,
    "monthly_new_vs_repeat": monthly_new_vs_repeat,
    "event_interarrival_disc": event_interarrival_disc,
    "event_dow_hour_heatmap": event_dow_hour_heatmap,
    "events_sliding_window": events_sliding_window,
    "cohort_retention": cohort_retention,
    "rolling_weekly_active_users": rolling_weekly_active_users,
    "monthly_order_value_percentiles": monthly_order_value_percentiles,
    "weekly_active_breakdown": weekly_active_breakdown,
    "event_transitions": event_transitions,
    "gapfill_daily_revenue": gapfill_daily_revenue,
    "event_time_weighted_avg": event_time_weighted_avg,
    "events_ohlc": events_ohlc,
}

TEMPORAL_ORACLES = {
    "daily_event_acf": ACF_ORACLE,
    "monthly_revenue_stl": _STL_ORACLE,
    "revenue_anomalies_stl": _STL_ANOM_ORACLE,
    "revenue_forecast_backtest": _BACKTEST_ORACLE,
    "customer_interpurchase_time": _INTERPURCHASE_ORACLE,
    "daily_error_rate_wilson": _WILSON_ORACLE,
    "view_purchase_lead_lag": LEADLAG_ORACLE,
    "session_daily_load": DAILY_LOAD_ORACLE,
    "session_concurrency_peak": CONCURRENCY_ORACLE,
    "attribution_credit": ATTRIBUTION_ORACLE,
    "funnel_three_step": FUNNEL3_ORACLE,
    "session_bounce_rate": BOUNCE_ORACLE,
    "monthly_order_value_percentiles": """
        WITH d AS (
          SELECT (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1
                   AS month,
                 o_orderkey,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        r AS (
          SELECT month, cents,
            ROW_NUMBER() OVER (PARTITION BY month
                               ORDER BY cents, o_orderkey) AS rn,
            COUNT(*) OVER (PARTITION BY month) AS n
          FROM d
        )
        SELECT CAST(month AS BIGINT) AS month,
          CAST(MAX(n) AS BIGINT) AS n_orders,
          MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
              THEN cents END) / 100.0 AS p50_value,
          MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT)
              THEN cents END) / 100.0 AS p90_value,
          MAX(cents) / 100.0 AS max_value
        FROM r GROUP BY month
    """,
    "rolling_weekly_active_users": """
        WITH du AS (
          SELECT DISTINCT user_id,
            date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
          FROM events
        ),
        b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM du),
        fan AS (
          SELECT user_id, day + off AS wday
          FROM du CROSS JOIN (
            SELECT unnest(generate_series(0, 6)) AS off
          ) offs
        ),
        wau AS (
          SELECT wday, COUNT(DISTINCT user_id) AS wau FROM fan GROUP BY wday
        ),
        dau AS (
          SELECT day AS wday, COUNT(DISTINCT user_id) AS dau
          FROM du GROUP BY day
        )
        SELECT CAST(wau.wday AS BIGINT) AS epoch_day, wau,
          COALESCE(dau, 0) AS dau,
          ROUND(CAST(COALESCE(dau, 0) AS DOUBLE) / CAST(wau AS DOUBLE), 6)
            AS stickiness
        FROM wau LEFT JOIN dau USING (wday) CROSS JOIN b
        WHERE wau.wday >= mn AND wau.wday <= mx
    """,
    "event_dow_hour_heatmap": """
        WITH e AS (
          SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
            CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events
        )
        SELECT (es // 86400 + 4) % 7 AS dow,
          (es % 86400) // 3600 AS hour,
          COUNT(*) AS n,
          ROUND(SUM(cents) / 100.0, 2) AS sum_value
        FROM e GROUP BY dow, hour
    """,
    "event_interarrival_disc": """
        WITH gaps AS (
          SELECT event_type, event_id,
            date_diff('microsecond',
              LAG(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id),
              ts) // 1000000 AS gap_s
          FROM events
        ),
        g AS (SELECT * FROM gaps WHERE gap_s IS NOT NULL),
        ranked AS (
          SELECT event_type, gap_s,
            ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY gap_s, event_id) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM g
        )
        SELECT event_type,
          CAST(MAX(n) AS BIGINT) AS n_gaps,
          CAST(MAX(CASE WHEN rn = CAST(CEIL(n * 0.5) AS BIGINT)
               THEN gap_s END) AS BIGINT) AS p50_gap_s,
          CAST(MAX(CASE WHEN rn = CAST(CEIL(n * 0.9) AS BIGINT)
               THEN gap_s END) AS BIGINT) AS p90_gap_s,
          CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
        FROM ranked GROUP BY event_type
    """,
    "monthly_new_vs_repeat": """
        WITH om AS (
          SELECT o_custkey,
            strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
            CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        fm AS (
          SELECT o_custkey, MIN(month) AS first_month FROM om
          GROUP BY o_custkey
        ),
        tagged AS (
          SELECT om.month, om.cents, om.o_custkey,
            CASE WHEN om.month = fm.first_month THEN 1 ELSE 0 END AS is_new
          FROM om JOIN fm ON om.o_custkey = fm.o_custkey
        )
        SELECT month,
          CAST(SUM(CASE WHEN is_new = 1 THEN cents ELSE 0 END) AS BIGINT)
            / 100.0 AS new_revenue,
          CAST(SUM(CASE WHEN is_new = 0 THEN cents ELSE 0 END) AS BIGINT)
            / 100.0 AS repeat_revenue,
          CAST(COUNT(DISTINCT CASE WHEN is_new = 1 THEN o_custkey END)
            AS BIGINT) AS n_new_customers,
          CAST(SUM(CASE WHEN is_new = 1 THEN cents ELSE 0 END) AS DOUBLE)
            / CAST(SUM(cents) AS DOUBLE) AS new_share
        FROM tagged GROUP BY month
    """,
    "cohort_ltv": """
        WITH weeks AS (
          SELECT user_id,
            date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
              AS week,
            CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events
        ),
        cohort AS (
          SELECT user_id, MIN(week) AS cohort_week FROM weeks
          GROUP BY user_id
        ),
        sizes AS (
          SELECT cohort_week, COUNT(*) AS cohort_size FROM cohort
          GROUP BY cohort_week
        ),
        spend AS (
          SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
            SUM(w.cents) AS week_cents
          FROM weeks w JOIN cohort c ON w.user_id = c.user_id
          GROUP BY c.cohort_week, week_offset
        ),
        cum AS (
          SELECT cohort_week, week_offset, week_cents,
            SUM(week_cents) OVER (PARTITION BY cohort_week
              ORDER BY week_offset
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
          FROM spend
        )
        SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
          CAST(week_offset AS BIGINT) AS week_offset,
          s.cohort_size,
          week_cents / 100.0 AS week_revenue,
          CAST(cum_cents AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) / 100.0
            AS ltv_per_member
        FROM cum c JOIN sizes s ON c.cohort_week = s.cohort_week
    """,
    "funnel_time_to_convert": """
        WITH fv AS (
          SELECT user_id, MIN(ts) AS ft FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        conv AS (
          SELECT e.user_id,
            MIN(date_diff('microsecond', fv.ft, e.ts) // 1000000) AS t_s
          FROM events e JOIN fv ON e.user_id = fv.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= fv.ft
          GROUP BY e.user_id
        ),
        ranked AS (
          SELECT t_s,
            ROW_NUMBER() OVER (ORDER BY t_s, user_id) AS rn,
            COUNT(*) OVER () AS n
          FROM conv
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_converters,
          CAST(MAX(CASE WHEN rn = CAST(CEIL(n * 0.5) AS BIGINT)
               THEN t_s END) AS BIGINT) AS p50_seconds,
          CAST(MAX(CASE WHEN rn = CAST(CEIL(n * 0.9) AS BIGINT)
               THEN t_s END) AS BIGINT) AS p90_seconds,
          CAST(MAX(t_s) AS BIGINT) AS max_seconds
        FROM ranked
    """,
    "revenue_growth_decomposition": """
        WITH monthly AS (
          SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
            COUNT(*) AS n_orders,
            SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
          FROM orders GROUP BY month
        ),
        d AS (
          SELECT month, n_orders, cents,
            LAG(n_orders) OVER (ORDER BY month) AS prev_n,
            LAG(cents) OVER (ORDER BY month) AS prev_cents
          FROM monthly
        )
        SELECT month, n_orders,
          cents / 100.0 AS revenue,
          (cents - prev_cents) / 100.0 AS delta_revenue,
          ((n_orders - prev_n) * (prev_cents // prev_n)) / 100.0
            AS volume_effect,
          ((cents - prev_cents)
           - (n_orders - prev_n) * (prev_cents // prev_n)) / 100.0
            AS value_effect
        FROM d WHERE prev_n IS NOT NULL
    """,
    "km_risk_table": f"""
        WITH fv AS (
          SELECT user_id, MIN(ts) AS ft FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        tp AS (
          SELECT e.user_id,
            MIN(date_diff('microsecond', fv.ft, e.ts) // 1000000) AS t_conv
          FROM events e JOIN fv ON e.user_id = fv.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= fv.ft
          GROUP BY e.user_id
        ),
        per_user AS (
          SELECT
            CASE WHEN tp.t_conv IS NOT NULL
                  AND tp.t_conv <= {KM_HORIZON_S}
                 THEN tp.t_conv ELSE {KM_HORIZON_S} END AS t,
            CASE WHEN tp.t_conv IS NOT NULL
                  AND tp.t_conv <= {KM_HORIZON_S}
                 THEN 1 ELSE 0 END AS converted
          FROM fv LEFT JOIN tp ON fv.user_id = tp.user_id
        ),
        et AS (
          SELECT t, SUM(converted) AS d, SUM(1 - converted) AS c
          FROM per_user GROUP BY t
        )
        SELECT CAST(t AS BIGINT) AS t_seconds,
          CAST(SUM(d + c) OVER (ORDER BY t DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS n_at_risk,
          CAST(d AS BIGINT) AS n_converted,
          CAST(c AS BIGINT) AS n_censored
        FROM et
    """,
    "events_sliding_window": """
        WITH e AS (
          SELECT event_type,
            CAST(ROUND(value * 100) AS BIGINT) AS cents,
            CAST(FLOOR(epoch(ts)) AS BIGINT) AS es
          FROM events
        ),
        w AS (
          SELECT event_type, cents,
            (es // 21600) * 21600 - j * 21600 AS window_start_s
          FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
        )
        SELECT window_start_s, event_type, COUNT(*) AS n,
          ROUND(SUM(cents) / 100.0, 2) AS sum_value
        FROM w GROUP BY window_start_s, event_type
    """,
    "session_top_paths": """
        WITH g AS (
          SELECT user_id, ts, event_id, event_type,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                 THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT user_id, ts, event_id, event_type,
            SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
          FROM g
        ),
        r AS (
          SELECT user_id, session_id, event_type,
            ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                               ORDER BY ts, event_id) AS rn
          FROM s
        ),
        p AS (
          SELECT user_id, session_id,
            concat_ws('>',
              MAX(CASE WHEN rn = 1 THEN event_type END),
              MAX(CASE WHEN rn = 2 THEN event_type END),
              MAX(CASE WHEN rn = 3 THEN event_type END)) AS path
          FROM r WHERE rn <= 3 GROUP BY user_id, session_id
        ),
        c AS (SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path)
        SELECT path, n_sessions, rank FROM (
          SELECT path, n_sessions,
            CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path)
                 AS BIGINT) AS rank
          FROM c
        ) WHERE rank <= 10
    """,
    "event_time_weighted_avg": """
        WITH gaps AS (
          SELECT user_id,
            CAST(ROUND(value * 100) AS BIGINT) AS cents,
            date_diff('microsecond', ts,
              LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
              AS dur_us
          FROM events
        )
        SELECT user_id,
          COUNT(*) AS n_intervals,
          CAST(SUM(dur_us) AS BIGINT) AS span_us,
          CAST(SUM(cents * dur_us) AS DOUBLE)
            / CAST(SUM(dur_us) AS DOUBLE) / 100.0 AS twa_value
        FROM gaps
        WHERE dur_us IS NOT NULL
        GROUP BY user_id
        HAVING SUM(dur_us) > 0
    """,
    "events_ohlc": """
        WITH base AS (
          SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id,
            CAST(ROUND(value * 100) AS BIGINT) AS cents,
            ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                               ORDER BY ts ASC, event_id ASC) AS rn_a,
            ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                               ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events
        )
        SELECT event_type, day,
          COUNT(*) AS n_events,
          MAX(CASE WHEN rn_a = 1 THEN cents END) / 100.0 AS open,
          MAX(cents) / 100.0 AS high,
          MIN(cents) / 100.0 AS low,
          MAX(CASE WHEN rn_d = 1 THEN cents END) / 100.0 AS close,
          SUM(cents) / 100.0 AS volume
        FROM base
        GROUP BY event_type, day
    """,
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
