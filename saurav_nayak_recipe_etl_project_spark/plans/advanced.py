"""Advanced relational shapes: rollup, pivot, exact quantiles, TF-IDF.

All declarative; the pivot is a fixed-column conditional aggregation
(never a dynamic driver-side pivot discovery pass), and quantiles use
exact `percentile` with linear interpolation — both reproducible by
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from saurav_nayak_recipe_etl_project_spark.functions.text_fn import tokens
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (priority, status): subtotal rows materialize the
    report hierarchy in one pass (one shuffle, grouping-set expansion
    is map-side)."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / F.lit(100.0), 2
            ).alias("revenue"),
        )
    )


def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS beyond ROLLUP's strict hierarchy:
    (priority, status), (status), () — the (status)-only subtotal is
    NOT a rollup prefix, which is the point. One shuffle; the
    grouping-set expansion is map-side like rollup/cube. GROUPING()
    flags disambiguate real NULL keys from subtotal rows."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderstatus"], []],
            "o_orderpriority", "o_orderstatus",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / F.lit(100.0), 2
            ).alias("revenue"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
        )
    )


def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts by status per priority — fixed pivot columns
    so the plan is a single conditional aggregation."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_pending"),
    )


def price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of order value per segment.
    (`approx_percentile` is the sketch variant for wide keys at scale;
    exact `percentile` keeps the oracle bridge.)"""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        )
    )


def rolling_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per day, the trailing-7-day revenue sum.
    Ordered on integer epoch-days so the range frame is engine-exact;
    daily revenue uses the integer-cents sum to stay order-stable."""
    orders = load_table(spark, "orders", sf_dir)
    daily = (
        orders.groupBy(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz"))
            .alias("epoch_day")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
        )
    )
    w = (
        Window.orderBy("epoch_day")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        F.col("epoch_day").cast("long").alias("epoch_day"),
        F.round(F.col("cents") / F.lit(100.0), 2).alias("day_revenue"),
        F.round(F.sum("cents").over(w) / F.lit(100.0), 2).alias("trailing_7d"),
    )


def price_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch variant of price_quantiles with a PORTABLE bounds oracle.

    approx_percentile (GK sketch, accuracy=1000) is the operator to use
    when the key space is wide enough that exact per-group sorting is
    the bottleneck: bounded rank error (≤ n/accuracy), no full sort,
    mergeable across partitions. Sketch VALUES are engine-specific, so
    the oracle checks the GUARANTEE instead: the returned value's rank
    interval [count(<v)+1, count(≤v)] must overlap the permitted
    interval [(q-ε)·n, (q+ε)·n]. Both sides are exact integer counts
    (cross-multiplied by accuracy=1000 — no float rank math), so the
    all-true boolean output hash-matches a constant-true oracle iff
    every sketch value honors its bound. Raw sketch values are pinned
    against the exact operator in tests/test_properties.py."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    j = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select("c_mktsegment", "o_totalprice")
    )
    approx = j.groupBy("c_mktsegment").agg(
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("a50"),
        F.expr("approx_percentile(o_totalprice, 0.9, 1000)").alias("a90"),
    )
    counted = (
        j.join(F.broadcast(approx), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("o_totalprice") < F.col("a50")).cast("long")).alias("lo50"),
            F.sum((F.col("o_totalprice") <= F.col("a50")).cast("long")).alias("hi50"),
            F.sum((F.col("o_totalprice") < F.col("a90")).cast("long")).alias("lo90"),
            F.sum((F.col("o_totalprice") <= F.col("a90")).cast("long")).alias("hi90"),
        )
    )
    # the sketch's permitted rank interval is [floor((q-ε)n), ceil((q+ε)n)]
    # (the target rank itself is the DISCRETE ⌈q·n⌉); the value's own rank
    # interval is [lo+1, hi].  Overlap, in pure integers (ε=1/1000):
    #   lo+1 ≤ ceil((q+ε)n)  ⇔  lo·1000 < (q·1000+1)·n
    #   hi   ≥ floor((q-ε)n) ⇔  (hi+1)·1000 > (q·1000-1)·n
    return counted.select(
        "c_mktsegment",
        (
            (F.col("lo50") * 1000 < 501 * F.col("n"))
            & ((F.col("hi50") + 1) * 1000 > 499 * F.col("n"))
        ).alias("p50_ok"),
        (
            (F.col("lo90") * 1000 < 901 * F.col("n"))
            & ((F.col("hi90") + 1) * 1000 > 899 * F.col("n"))
        ).alias("p90_ok"),
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Per-document top-k terms by TF-IDF: explode → tf, df aggs →
    idf join (tiny, broadcast) → per-doc window top-k. The canonical
    two-shuffle text-weighting pipeline."""
    docs = load_table(spark, "documents", sf_dir)
    n_docs = docs.count()  # scalar; one cheap job
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id", "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", F.round("score", 6).alias("tfidf"), "rnk")
    )


def event_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank semantics: quartile label and exact
    percentile position of every event's value within its type.

    r9 scale migration: the original per-type ntile/percent_rank
    windows put a whole corpus/5-sized group through one task; both
    are now ARITHMETIC over the with_grouped_rank (type, band) lane —
    quartile via ntile_from_rank (bit-equal to NTILE(4) by its
    property test) and pct_rank = (rank-1)/(n-1) (equal to
    percent_rank because the (value, event_id) order is strict, so
    rank == row_number == RANK)."""
    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        derive_band_width,
        ntile_from_rank,
        with_grouped_rank,
    )

    events = load_table(spark, "events", sf_dir)
    d = events.select("event_id", "event_type", "value")
    width = derive_band_width(d, "value")
    ranked = with_grouped_rank(
        d, ["event_type"], ["value", "event_id"],
        bucket=F.floor(F.col("value") / F.lit(width)),
        count_col="n",
    )
    return ranked.select(
        "event_id",
        "event_type",
        ntile_from_rank(
            F.col("rank"), F.col("n").cast("long"), 4
        ).cast("long").alias("quartile"),
        F.round(
            F.when(F.col("n") == 1, F.lit(0.0)).otherwise(
                (F.col("rank") - 1) / (F.col("n") - 1)
            ),
            6,
        ).alias("pct_rank"),
    )


def customer_part_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type aggregation: per customer, the sorted distinct set
    of brands they ordered plus basket stats — collect_set stays
    map-side combined; sorting makes the array deterministic."""
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.array_sort(F.collect_set("p_brand")).alias("brands"),
            F.countDistinct("p_partkey").alias("n_parts"),
        )
        .select(
            "custkey",
            F.concat_ws(",", "brands").alias("brands_csv"),
            F.size("brands").cast("long").alias("n_brands"),
            "n_parts",
        )
    )


def view_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel: of users who viewed, how many purchased strictly after
    their first view — two tiny aggregates joined, no event-level
    shuffle survives past the first groupBy."""
    events = load_table(spark, "events", sf_dir)
    first_view = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view_ts"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    converted = (
        first_view.join(purchases, "user_id")
        .filter(F.col("p_ts") > F.col("first_view_ts"))
        .select("user_id").distinct()
    )
    return first_view.agg(
        F.count("*").alias("viewers"),
    ).crossJoin(converted.agg(F.count("*").alias("converted"))).select(
        "viewers",
        "converted",
        F.round(F.col("converted") / F.col("viewers"), 6).alias("conversion_rate"),
    )


def docs_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile by source × lang: volume and size stats."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


PRIORITY_SEVERITY = {
    "1-URGENT": 5, "2-HIGH": 4, "3-MEDIUM": 3, "4-NOT SPECIFIED": 2, "5-LOW": 1,
}


def event_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly flags on event values: the standard
    streaming-adjacent monitor. Stats come from one tiny agg joined
    back broadcast; the z computation stays row-local codegen."""
    events = load_table(spark, "events", sf_dir)
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("_mu"), F.stddev_samp("value").alias("_sd")
    )
    z = (F.col("value") - F.col("_mu")) / F.col("_sd")
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.5)
        .select(
            "event_id", "event_type",
            F.round("value", 4).alias("value"),
            F.round(z, 4).alias("z_score"),
        )
    )


def severity_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal-map dim lookup: tiny static dimensions don't need a
    broadcast join at all — a compile-time `create_map` keeps the
    lookup inside codegen with zero exchange."""
    orders = load_table(spark, "orders", sf_dir)
    m = F.create_map(
        *[F.lit(x) for kv in PRIORITY_SEVERITY.items() for x in kv]
    )
    return (
        orders.withColumn("severity", m[F.col("o_orderpriority")])
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.avg("severity"), 4).alias("avg_severity"),
            F.count("*").alias("n_orders"),
        )
    )


def lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per return flag: stddev + correlation.
    Rounded at 4dp — both engines use numerically-stable single-pass
    formulations whose results agree well past that precision."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    return lineitem.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
    )


def parts_bought_together(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: top part pairs co-occurring in an
    order. The self-join is keyed on l_orderkey so pair blowup is
    bounded by per-order basket size (small by construction), never
    corpus-quadratic."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    items = lineitem.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .groupBy(
            F.col("a.l_partkey").alias("pk_a"), F.col("b.l_partkey").alias("pk_b")
        )
        .agg(F.count("*").alias("n_orders"))
    )
    pa = part.select(F.col("p_partkey").alias("pk_a"), F.col("p_name").alias("part_a"))
    pb = part.select(F.col("p_partkey").alias("pk_b"), F.col("p_name").alias("part_b"))
    return (
        pairs.join(F.broadcast(pa), "pk_a").join(F.broadcast(pb), "pk_b")
        .select("part_a", "part_b", "n_orders")
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(10)
    )


def part_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase graph degree distribution: how many distinct
    co-ordered partners each part has, histogrammed. The graph never
    materializes globally — degrees come straight off the
    order-bounded pair join."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    items = lineitem.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    degrees = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") != F.col("b.l_partkey")))
        .groupBy(F.col("a.l_partkey").alias("pk"))
        .agg(F.countDistinct(F.col("b.l_partkey")).alias("degree"))
    )
    return degrees.groupBy("degree").agg(F.count("*").alias("n_parts"))


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value (50k buckets) — the
    profiling primitive; integer bucketing, no sort."""
    orders = load_table(spark, "orders", sf_dir)
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_orders")
    )


def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window over an aggregate: month-over-month revenue delta."""
    monthly = (
        load_table(spark, "orders", sf_dir)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / F.lit(100.0), 2
            ).alias("revenue")
        )
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        F.round(F.col("revenue") - F.lag("revenue").over(w), 2).alias("mom_delta"),
    )


def split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (75/12.5/12.5, md5-hex
    ranges of the content): stable under repartitioning and re-runs,
    and keyed on content so exact duplicates always land in the same
    split — no train/test leakage through dup copies."""
    docs = load_table(spark, "documents", sf_dir)
    h = F.md5("text")
    split = (
        F.when(h < "c", "train")           # 12/16 of the hex space
        .when(h < "e", "val")              # 2/16
        .otherwise("test")                 # 2/16
    )
    return docs.select("doc_id", split.alias("split"))


def sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling (~25%): md5-hex threshold
    compare — reproducible on any engine/cluster, no RNG state, and
    the sample is stable under repartitioning (keyed on content, not
    position)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.filter(F.md5("text") < "4").select("doc_id", "lang", "source")


def redact_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrub: digit runs → <NUM>; output the redacted-text
    hash + counts so the result stays small at any scale."""
    docs = load_table(spark, "documents", sf_dir)
    redacted = F.regexp_replace("text", "[0-9]+", "<NUM>")
    return docs.select(
        "doc_id",
        F.md5(redacted).alias("redacted_hash"),
        (F.length("text") - F.length(F.regexp_replace("text", "[0-9]", "")))
        .cast("long").alias("n_digits"),
    )


ADVANCED_QUERIES = {
    "lineitem_stats": lineitem_stats,
    "severity_by_status": severity_by_status,
    "event_anomalies": event_anomalies,
    "parts_bought_together": parts_bought_together,
    "part_degree_distribution": part_degree_distribution,
    "price_histogram": price_histogram,
    "monthly_revenue_growth": monthly_revenue_growth,
    "sample_documents": sample_documents,
    "split_assignment": split_assignment,
    "redact_numbers": redact_numbers,
    "event_value_quartiles": event_value_quartiles,
    "customer_part_baskets": customer_part_baskets,
    "view_purchase_funnel": view_purchase_funnel,
    "docs_by_source": docs_by_source,
    "revenue_rollup": revenue_rollup,
    "orders_grouping_sets": orders_grouping_sets,
    "orders_status_pivot": orders_status_pivot,
    "price_quantiles": price_quantiles,
    "price_quantiles_approx": price_quantiles_approx,
    "rolling_weekly_revenue": rolling_weekly_revenue,
    "tfidf_top_terms": tfidf_top_terms,
}

ADVANCED_ORACLES = {
    "lineitem_stats": """
        SELECT l_returnflag, COUNT(*) AS n,
          ROUND(stddev_samp(l_quantity), 4) AS qty_stddev,
          ROUND(stddev_samp(l_extendedprice), 4) AS price_stddev,
          ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr
        FROM lineitem GROUP BY l_returnflag
    """,
    "parts_bought_together": """
        WITH items AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pairs AS (
          SELECT a.l_partkey AS pk_a, b.l_partkey AS pk_b,
                 COUNT(*) AS n_orders
          FROM items a JOIN items b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY a.l_partkey, b.l_partkey
        )
        SELECT pa.p_name AS part_a, pb.p_name AS part_b, n_orders
        FROM pairs
        JOIN part pa ON pa.p_partkey = pk_a
        JOIN part pb ON pb.p_partkey = pk_b
        ORDER BY n_orders DESC, part_a, part_b LIMIT 10
    """,
    "part_degree_distribution": """
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        degrees AS (
          SELECT a.l_partkey AS pk, COUNT(DISTINCT b.l_partkey) AS degree
          FROM items a JOIN items b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
          GROUP BY a.l_partkey
        )
        SELECT degree, COUNT(*) AS n_parts FROM degrees GROUP BY degree
    """,
    "price_histogram": """
        SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
               COUNT(*) AS n_orders
        FROM orders GROUP BY bucket
    """,
    "monthly_revenue_growth": """
        WITH m AS (
          SELECT strftime(o_orderdate, '%Y-%m') AS month,
            ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
              AS revenue
          FROM orders GROUP BY month
        )
        SELECT month, revenue,
          ROUND(revenue - lag(revenue) OVER (ORDER BY month), 2) AS mom_delta
        FROM m
    """,
    "sample_documents": """
        SELECT doc_id, lang, source FROM documents WHERE md5(text) < '4'
    """,
    "split_assignment": """
        SELECT doc_id,
          CASE WHEN md5(text) < 'c' THEN 'train'
               WHEN md5(text) < 'e' THEN 'val'
               ELSE 'test' END AS split
        FROM documents
    """,
    "redact_numbers": """
        SELECT doc_id,
          md5(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS redacted_hash,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
            AS n_digits
        FROM documents
    """,
    "view_purchase_funnel": """
        WITH fv AS (
          SELECT user_id, MIN(ts) AS first_view_ts
          FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        conv AS (
          SELECT DISTINCT fv.user_id
          FROM fv JOIN events e ON e.user_id = fv.user_id
          WHERE e.event_type = 'purchase' AND e.ts > fv.first_view_ts
        )
        SELECT (SELECT COUNT(*) FROM fv) AS viewers,
               (SELECT COUNT(*) FROM conv) AS converted,
               ROUND((SELECT COUNT(*) FROM conv) * 1.0 /
                     (SELECT COUNT(*) FROM fv), 6) AS conversion_rate
    """,
    "docs_by_source": """
        SELECT source, lang, COUNT(*) AS n_docs,
          ROUND(AVG(n_chars), 4) AS avg_chars,
          MAX(n_chars) AS max_chars
        FROM documents GROUP BY source, lang
    """,
    "event_anomalies": """
        WITH s AS (
          SELECT event_type, AVG(value) AS mu, stddev_samp(value) AS sd
          FROM events GROUP BY event_type
        )
        SELECT event_id, e.event_type,
          ROUND(value, 4) AS value,
          ROUND((value - mu) / sd, 4) AS z_score
        FROM events e JOIN s ON e.event_type = s.event_type
        WHERE abs((value - mu) / sd) > 2.5
    """,
    "severity_by_status": """
        SELECT o_orderstatus,
          ROUND(AVG(CASE o_orderpriority
            WHEN '1-URGENT' THEN 5 WHEN '2-HIGH' THEN 4
            WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 2
            WHEN '5-LOW' THEN 1 END), 4) AS avg_severity,
          COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """,
    "rolling_weekly_revenue": """
        WITH daily AS (
          SELECT date_diff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
                   AS epoch_day,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
          FROM orders GROUP BY epoch_day
        )
        SELECT CAST(epoch_day AS BIGINT) AS epoch_day,
          ROUND(cents / 100.0, 2) AS day_revenue,
          ROUND(SUM(cents) OVER (
            ORDER BY epoch_day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
          ) / 100.0, 2) AS trailing_7d
        FROM daily
    """,
    "event_value_quartiles": """
        SELECT event_id, event_type,
          ntile(4) OVER (
            PARTITION BY event_type ORDER BY value, event_id
          ) AS quartile,
          ROUND(percent_rank() OVER (
            PARTITION BY event_type ORDER BY value, event_id
          ), 6) AS pct_rank
        FROM events
    """,
    "customer_part_baskets": """
        SELECT o_custkey AS custkey,
          array_to_string(list_sort(list(DISTINCT p_brand)), ',') AS brands_csv,
          len(list_sort(list(DISTINCT p_brand))) AS n_brands,
          COUNT(DISTINCT p_partkey) AS n_parts
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY o_custkey
    """,
    "revenue_rollup": """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
          ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
            AS revenue
        FROM orders
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    "orders_grouping_sets": """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
          ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
            AS revenue,
          CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
          CAST(GROUPING(o_orderstatus) AS INT) AS g_status
        FROM orders
        GROUP BY GROUPING SETS (
          (o_orderpriority, o_orderstatus), (o_orderstatus), ()
        )
    """,
    "orders_status_pivot": """
        SELECT o_orderpriority,
          COUNT(*) FILTER (o_orderstatus = 'O') AS n_open,
          COUNT(*) FILTER (o_orderstatus = 'F') AS n_filled,
          COUNT(*) FILTER (o_orderstatus = 'P') AS n_pending
        FROM orders GROUP BY o_orderpriority
    """,
    "price_quantiles": """
        SELECT c_mktsegment,
          ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
          ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
          ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    # bounds oracle: the GK sketch GUARANTEES rank error ≤ n/accuracy,
    # so the Spark side's exact integer rank-interval check must come
    # back all-true for every segment — constant-true rows here are a
    # real assertion, not a tautology (any out-of-bounds sketch value
    # hash-mismatches this oracle).
    "price_quantiles_approx": """
        SELECT c_mktsegment, TRUE AS p50_ok, TRUE AS p90_ok
        FROM (SELECT DISTINCT c_mktsegment
              FROM orders JOIN customer ON o_custkey = c_custkey)
    """,
    "tfidf_top_terms": """
        WITH tok AS (
          SELECT doc_id,
            unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
          FROM documents
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
        ),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        scored AS (
          SELECT tf.doc_id, tf.term,
            tf.tf * ln((SELECT COUNT(*) FROM documents) / (1.0 * df.df))
              AS score
          FROM tf JOIN df ON tf.term = df.term
        )
        SELECT doc_id, term, ROUND(score, 6) AS tfidf, rnk FROM (
          SELECT doc_id, term, score,
            ROW_NUMBER() OVER (
              PARTITION BY doc_id ORDER BY score DESC, term
            ) AS rnk
          FROM scored
        ) WHERE rnk <= 3
    """,
}
