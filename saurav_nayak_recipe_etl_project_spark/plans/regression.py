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
from pyspark.sql.window import Window

from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
    with_global_rank,
)
from saurav_nayak_recipe_etl_project_spark.functions.text_fn import tokens
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


def monthly_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month seasonality index: each calendar month's average
    monthly revenue relative to the all-months average, as an exact
    rational in ppm — the multiplicative seasonal profile that
    deseasonalizes the E90 trend (classical decomposition, index
    form). index_ppm = (cents_m · n_months_total · 10⁶) DIV
    (n_months_m · total_cents): one integer floor division of exact
    DECIMAL(38)/HUGEINT products, no float until the derived ratio.
    Plan: one groupBy to (calendar-month, epoch-month) cells, a
    12-row rollup, and a broadcast 1-row total."""
    orders = load_table(spark, "orders", sf_dir)
    monthly = orders.groupBy(
        F.expr("month(cast(o_orderdate as date))").alias("cal_month"),
        F.expr(_EPOCH_MONTH).alias("m"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .alias("cents")
    )
    per_cal = monthly.groupBy("cal_month").agg(
        F.count("*").alias("n_months"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("cents"),
    )
    total = per_cal.agg(
        F.sum("n_months").alias("n_total"),
        F.sum("cents").alias("total_cents"),
    )
    return (
        per_cal.crossJoin(F.broadcast(total))
        .select(
            F.col("cal_month").cast("long").alias("cal_month"),
            "n_months",
            (F.col("cents").cast("double") / F.lit(100.0)).alias("revenue"),
            F.expr(
                "cast(cents * n_total * 1000000"
                " DIV (n_months * total_cents) as bigint)"
            ).alias("index_ppm"),
        )
    )


ZIPF_MIN_COUNT = 1


def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of
    ln(frequency) against ln(rank) — natural text sits near −1;
    templated/ID-soup corpora flatten or steepen it, so the single
    number is a cheap corpus-health gate next to text_type_token_ratio.

    Rank is the distributed two-pass rank (functions/ranking.py) over
    (count DESC, word) — bucketed by the negated count, so the hapax
    tie-run is the worst bucket and no global window exists. Both log
    terms are micro-rounded ONCE to integers (the E51/BM25 fixed-point
    pattern), the five OLS sums run in DECIMAL(38,0)/HUGEINT, and the
    reported slope is an integer micro-unit floor division —
    engine-exact end to end."""
    docs = load_table(spark, "documents", sf_dir)
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= ZIPF_MIN_COUNT)
    )
    ranked = with_global_rank(
        words.select("w", "n", (-F.col("n")).alias("_neg")),
        ["_neg", "w"],
        bucket=F.col("_neg"),
    )
    pts = ranked.select(
        F.expr("cast(round(ln(cast(rank as double)) * 1000000) as bigint)")
        .alias("x"),
        F.expr("cast(round(ln(cast(n as double)) * 1000000) as bigint)")
        .alias("y"),
    )
    stats = pts.agg(
        F.count("*").alias("n_types"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
    )
    return stats.select(
        "n_types",
        F.expr(
            "cast((n_types * sxy - sx * sy) * 1000000"
            " DIV (n_types * sxx - sx * sx) as bigint)"
        ).alias("slope_micro"),
    ).select(
        "n_types",
        "slope_micro",
        (F.col("slope_micro").cast("double") / F.lit(1e6))
        .alias("zipf_slope"),
    )


def segment_trend_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per segment: the MEDIAN of all pairwise
    monthly-revenue slopes — 29.3% breakdown point where the E90 OLS
    slope is dragged by a single outlier month (the robust-regression
    twin, same relationship as event_anomalies_mad to event_anomalies).

    Exact integer pipeline: per-pair slope = (Δcents·10⁶) DIV Δmonth
    (truncation toward zero — Spark DIV and DuckDB integer // agree on
    negatives, verified); the median is the x2 idiom (sum of the two
    middle ranks, or twice the middle one) so no half-unit rounding
    hazard. The pair frame is CALENDAR-bounded — months² per segment
    (~3k pairs at 80 months), independent of row count — so both the
    pair join and the rank window cost O(calendar²), never O(data)."""
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
    a = monthly.select(
        F.col("c_mktsegment").alias("seg"), F.col("m").alias("m1"),
        F.col("cents").alias("c1"),
    )
    b = monthly.select(
        F.col("c_mktsegment").alias("seg"), F.col("m").alias("m2"),
        F.col("cents").alias("c2"),
    )
    # DECIMAL(38,0) widening (round-8 advisory): monthly segment cents
    # reach ~1e15 at the 100 TB target, so (c2-c1)*10^6 would wrap in
    # BIGINT with ANSI off (and error in DuckDB) — the same hazard the
    # sibling ops (source_topp_coverage, phrase_bigram_scores,
    # source_js_divergence) were widened for. Spark decimal DIV and
    # DuckDB HUGEINT // both truncate toward zero (verified on
    # negatives) and both return BIGINT here, so slope_micro's type
    # and values are unchanged on non-overflowing inputs.
    pairs = a.join(b, ["seg"]).where(F.col("m2") > F.col("m1")).select(
        "seg", "m1", "m2",
        F.expr(
            "(CAST(c2 - c1 AS DECIMAL(38,0)) * 1000000) DIV (m2 - m1)"
        ).alias("slope_micro"),
    )
    w_rn = Window.partitionBy("seg").orderBy("slope_micro", "m1", "m2")
    w_n = Window.partitionBy("seg")
    ranked = pairs.withColumn("rn", F.row_number().over(w_rn)).withColumn(
        "np", F.count("*").over(w_n)
    )
    contrib = F.expr(
        "CASE WHEN np % 2 = 0 AND rn IN (np DIV 2, np DIV 2 + 1)"
        " THEN slope_micro"
        " WHEN np % 2 = 1 AND rn = (np + 1) DIV 2 THEN 2 * slope_micro"
        " ELSE 0 END"
    )
    out = ranked.groupBy("seg").agg(
        F.count("*").alias("n_pairs"),
        F.sum(contrib).alias("theilsen_x2_micro"),
    )
    months = monthly.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_months")
    )
    return (
        out.join(months, out.seg == months.c_mktsegment)
        .select(
            "c_mktsegment", "n_months", "n_pairs", "theilsen_x2_micro",
            (F.col("theilsen_x2_micro").cast("double") / F.lit(2e8))
            .alias("slope_dollars_per_month"),
        )
    )


THEILSEN_ORACLE = f"""
    WITH monthly AS (
      SELECT c_mktsegment AS seg, {_EPOCH_MONTH} AS m,
        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, {_EPOCH_MONTH}
    ),
    pairs AS (
      SELECT a.seg, a.m AS m1, b.m AS m2,
        CAST((CAST(b.cents - a.cents AS HUGEINT) * 1000000)
             // (b.m - a.m) AS BIGINT) AS slope_micro
      FROM monthly a JOIN monthly b
        ON a.seg = b.seg AND b.m > a.m
    ),
    ranked AS (
      SELECT seg, slope_micro,
        ROW_NUMBER() OVER (PARTITION BY seg
          ORDER BY slope_micro, m1, m2) AS rn,
        COUNT(*) OVER (PARTITION BY seg) AS np
      FROM pairs
    ),
    agg AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(SUM(CASE
          WHEN np % 2 = 0 AND rn IN (np // 2, np // 2 + 1)
            THEN slope_micro
          WHEN np % 2 = 1 AND rn = (np + 1) // 2 THEN 2 * slope_micro
          ELSE 0 END) AS BIGINT) AS theilsen_x2_micro
      FROM ranked GROUP BY seg
    ),
    months AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_months
      FROM monthly GROUP BY seg
    )
    SELECT agg.seg AS c_mktsegment, n_months, n_pairs, theilsen_x2_micro,
      CAST(theilsen_x2_micro AS DOUBLE) / 200000000.0
        AS slope_dollars_per_month
    FROM agg JOIN months ON agg.seg = months.seg
"""


REGRESSION_QUERIES = {
    "segment_trend_theilsen": segment_trend_theilsen,
    "segment_revenue_trend": segment_revenue_trend,
    "monthly_seasonality_index": monthly_seasonality_index,
    "zipf_slope": zipf_slope,
}

REGRESSION_ORACLES = {
    "segment_trend_theilsen": THEILSEN_ORACLE,
    "monthly_seasonality_index": """
        WITH monthly AS (
          SELECT month(o_orderdate) AS cal_month,
            (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1 AS m,
            SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
          FROM orders
          GROUP BY month(o_orderdate),
            (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1
        ),
        per_cal AS (
          SELECT cal_month, COUNT(*) AS n_months,
            SUM(CAST(cents AS HUGEINT)) AS cents
          FROM monthly GROUP BY cal_month
        ),
        total AS (
          SELECT CAST(SUM(n_months) AS BIGINT) AS n_total,
            SUM(cents) AS total_cents
          FROM per_cal
        )
        SELECT CAST(cal_month AS BIGINT) AS cal_month, n_months,
          CAST(cents AS DOUBLE) / 100.0 AS revenue,
          CAST(cents * n_total * 1000000
               // (n_months * total_cents) AS BIGINT) AS index_ppm
        FROM per_cal CROSS JOIN total
    """,
    "zipf_slope": """
        WITH words AS (
          SELECT w, COUNT(*) AS n FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents
          ) GROUP BY w
        ),
        ranked AS (
          SELECT n,
            ROW_NUMBER() OVER (ORDER BY -n, w) AS rank
          FROM words
        ),
        pts AS (
          SELECT
            CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT) AS x,
            CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS y
          FROM ranked
        ),
        stats AS (
          SELECT COUNT(*) AS n_types,
            SUM(CAST(x AS HUGEINT)) AS sx,
            SUM(CAST(y AS HUGEINT)) AS sy,
            SUM(CAST(x AS HUGEINT) * x) AS sxx,
            SUM(CAST(x AS HUGEINT) * y) AS sxy
          FROM pts
        )
        SELECT n_types,
          CAST((n_types * sxy - sx * sy) * 1000000
               // (n_types * sxx - sx * sx) AS BIGINT) AS slope_micro,
          CAST(CAST((n_types * sxy - sx * sy) * 1000000
               // (n_types * sxx - sx * sx) AS BIGINT) AS DOUBLE) / 1e6
            AS zipf_slope
        FROM stats
    """,
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
