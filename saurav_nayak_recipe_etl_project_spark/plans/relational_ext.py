"""Relational surface extensions: CUBE, set operations, exact
median/mode, and UNPIVOT (wide->long melt).

Derived from the reference's aggregation-report surface
(analysis_queries.py's GROUP BY reports): these are the remaining ANSI
relational shapes a user of that surface reaches for next. All
declarative single-plan DataFrame algebra; every query carries a
DuckDB oracle.

Portability notes (hard-won, see NOTES.md):
- money sums use the integer-cents idiom (order-independent);
- the exact median is emitted as `median_x2_cents` (sum of the two
  middle cents values, or twice the middle one) plus a raw double
  division — integer-exact in both engines, no ROUND-at-boundary
  hazard;
- mode tie-break is deterministic (max count, then lexicographic min).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
    derive_band_width,
    derive_band_widths,
    ntile_from_rank,
    with_global_rank,
)
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.functions.localframe import (
    local_frame,
)

def _cents():
    # Column construction needs an active session -> build lazily.
    return F.round(F.col("o_totalprice") * 100).cast("long")


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (priority, status): all four grouping sets in ONE
    shuffle (the Expand is map-side, same physical shape as rollup /
    grouping sets — 4x the map rows, not 4 scans). GROUPING() flags
    disambiguate subtotal rows from real NULL keys."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(_cents()) / F.lit(100.0), 2).alias("revenue"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
        )
    )


def nation_account_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT membership report: nations whose AVERAGE
    customer balance clears a bar vs nations whose average supplier
    balance does, classified as both / customers_only / suppliers_only.

    Set semantics (distinct) on purpose — Spark's intersect/subtract
    are the ANSI operators (planned as left-semi / left-anti over
    distinct aggregates). Both inputs shrink to <=25 nation keys before
    the set ops, so each set op is a broadcast-sized join; the heavy
    lifting is two map-side-combined aggregations. The avg threshold is
    the pure-integer form sum(cents) > bar*count (no double compare at
    the cut — engine-exact)."""
    nation = load_table(spark, "nation", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)

    def _avg_over(df, bal_col, key_col):
        cents = F.round(F.col(bal_col) * 100).cast("long")
        return (
            df.join(F.broadcast(nation), F.col(key_col) == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.sum(cents).alias("sc"), F.count("*").alias("c"))
            .where(F.col("sc") > F.lit(450000) * F.col("c"))
            .select("n_name")
        )

    cust_n = _avg_over(customer, "c_acctbal", "c_nationkey")
    supp_n = _avg_over(supplier, "s_acctbal", "s_nationkey")
    both = cust_n.intersect(supp_n).select("n_name", F.lit("both").alias("membership"))
    c_only = cust_n.subtract(supp_n).select(
        "n_name", F.lit("customers_only").alias("membership")
    )
    s_only = supp_n.subtract(cust_n).select(
        "n_name", F.lit("suppliers_only").alias("membership")
    )
    return both.unionByName(c_only).unionByName(s_only)


def order_value_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median and mode — the two aggregates the
    approx-sketch path (price_quantiles_approx) trades away.

    Median: one shuffle on the group key, one window sort; the two
    middle ranks are summed as INTEGER cents (`median_x2_cents`) so the
    oracle compare is engine-exact; the display double is a raw
    division of that integer. Mode: per-(group, value) counts, then a
    deterministic rank (max count, lexicographic min value).
    At 100 TB the median path is the one to watch: a full per-group
    sort. For wide keys switch to price_quantiles_approx (GK sketch);
    this operator is the exact form for report-sized group counts."""
    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        derive_band_width,
        with_grouped_rank,
    )

    orders = load_table(spark, "orders", sf_dir)
    d = orders.select(
        "o_orderpriority", "o_orderstatus", "o_orderkey",
        _cents().alias("cents"),
    )
    # r9 scale migration: the median rank pass ran a whole-group
    # partitionBy(priority) window (corpus/5 per task); it now runs
    # the with_grouped_rank (priority, band) lane — selected values
    # identical (position-k of a sorted multiset is tie-order-free).
    width = derive_band_width(d, "cents")
    ranked = with_grouped_rank(
        d.select("o_orderpriority", "cents", "o_orderkey"),
        ["o_orderpriority"], ["cents", "o_orderkey"],
        bucket=F.floor(F.col("cents") / F.lit(width)),
        rank_col="rn", count_col="n",
    )
    med = (
        ranked.where(
            (F.col("rn") == F.expr("(n + 1) DIV 2"))
            | (F.col("rn") == F.expr("(n + 2) DIV 2"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n_orders"),
            # odd n selects ONE row -> double it; even n selects two
            F.when(F.count("*") == 1, F.sum("cents") * 2)
            .otherwise(F.sum("cents"))
            .cast("long")
            .alias("median_x2_cents"),
        )
        .withColumn("median_value", F.col("median_x2_cents") / F.lit(200.0))
    )
    cnt = d.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("status_n")
    )
    w_mode = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("status_n"), F.asc("o_orderstatus")
    )
    mode = (
        cnt.withColumn("rk", F.row_number().over(w_mode))
        .where(F.col("rk") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            F.col("status_n").alias("mode_count"),
        )
    )
    return med.join(F.broadcast(mode), "o_orderpriority")


def lineitem_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide->long melt): aggregate first, melt after. The
    four measure sums collapse to |flags| rows BEFORE the melt, so the
    unpivot is over a report-sized frame — never melt the fact table
    itself (4x the scan rows for no information). Sums use integer
    cents / integer hundredths so the melted doubles are engine-exact."""
    li = load_table(spark, "lineitem", sf_dir)
    agg = li.groupBy("l_returnflag").agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("q"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("p"),
        F.sum(F.round(F.col("l_discount") * 100).cast("long")).alias("d"),
        F.sum(F.round(F.col("l_tax") * 100).cast("long")).alias("t"),
    )
    wide = agg.select(
        "l_returnflag",
        (F.col("q") / F.lit(100.0)).alias("sum_qty"),
        (F.col("p") / F.lit(100.0)).alias("sum_base_price"),
        (F.col("d") / F.lit(100.0)).alias("sum_discount"),
        (F.col("t") / F.lit(100.0)).alias("sum_tax"),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_base_price", "sum_discount", "sum_tax"],
        "metric",
        "value",
    )


def part_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / cumulative-contribution analysis: the smallest set of
    parts covering the first 25% of total revenue, with each part's
    running share. The inclusion cut is the PURE-INTEGER predicate
    (cum - own) * 4 < total — no double compare at the boundary, so
    the emitted row set is engine-exact; only the display share is a
    raw double division.

    Scale shape (r8): parts grow ~200k x SF, so the global ordered
    window the first cut used is a single-task sort at 100 TB. The
    rank AND the running revenue sum now come from the two-pass
    distributed shape (functions/ranking.py with_global_rank +
    cumsum_of) over revenue bands whose width is DERIVED from an
    approxQuantile sample of the rollup (derive_band_width) — a
    value-range drift can't collapse the bands into a handful of
    giant windows."""
    li = load_table(spark, "lineitem", sf_dir)
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
        ).alias("cents")
    )
    keyed = rev.select(
        "l_partkey", "cents", (-F.col("cents")).alias("_neg")
    ).localCheckpoint(eager=False)  # probe + rank + total: scan once
    width = derive_band_width(keyed, "_neg")
    ranked = with_global_rank(
        keyed,
        ["_neg", "l_partkey"],
        bucket=F.floor(F.col("_neg") / F.lit(width)),
        cumsum_of="cents",
        cumsum_col="cum_cents",
    )
    total = keyed.agg(F.sum("cents").alias("total_cents"))
    return (
        ranked
        .crossJoin(F.broadcast(total))
        .where((F.col("cum_cents") - F.col("cents")) * 4 < F.col("total_cents"))
        .select(
            "l_partkey",
            "rank",
            (F.col("cents") / F.lit(100.0)).alias("revenue"),
            (F.col("cum_cents") / F.lit(100.0)).alias("cum_revenue"),
            (F.col("cum_cents").cast("double") / F.col("total_cents"))
            .alias("cum_share"),
        )
    )


def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency / frequency / monetary
    quintiles (NTILE(5) semantics), the classic CRM scoring shape.
    Each ordering carries the custkey tie-break, so bucket edges are
    deterministic and engine-identical; monetary is integer cents.

    No global ntile window: each score is the two-pass distributed
    rank (functions/ranking.py) over an ascending (negated-metric,
    custkey) key — per-bucket parallel row_number + broadcast offsets
    — then the SQL-standard NTILE bucket recomputed arithmetically
    from (rank, n). Band widths are DERIVED from one shared
    approxQuantile pass over the three metric keys
    (derive_band_widths) rather than hand-tuned literals, so a value-
    range drift (a catalog 100x pricier, a decade-longer history)
    can't collapse the buckets; skew is bounded by the metric's tie
    runs, never |rows|. Output is bit-identical to ntile(5) OVER
    (ORDER BY metric DESC, custkey) in both Spark and DuckDB."""
    orders = load_table(spark, "orders", sf_dir)
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    )
    # O(customers) rollup feeds FIVE separate actions (the quantile
    # probe, three rank queries, the final join) — checkpoint it so
    # the orders scan+groupBy runs once, not per action
    per_cust = per_cust.localCheckpoint(eager=False)
    n = per_cust.agg(F.count("*").alias("_n"))
    negs = {
        # score col -> ascending negated sort key
        "r_score": F.datediff(
            F.lit("1970-01-01").cast("date"), F.col("last_day")
        ),
        "f_score": -F.col("n_orders"),
        "m_score": -F.col("cents"),
    }
    keyed_all = per_cust.select(
        "o_custkey",
        *[neg.cast("long").alias(f"_neg_{s}") for s, neg in negs.items()],
    )
    widths = dict(zip(
        negs,
        derive_band_widths(keyed_all, [f"_neg_{s}" for s in negs]),
    ))
    out = per_cust
    for score_col in negs:
        keyed = keyed_all.select(
            "o_custkey", F.col(f"_neg_{score_col}").alias("_neg")
        )
        ranked = with_global_rank(
            keyed,
            ["_neg", "o_custkey"],
            bucket=F.floor(F.col("_neg") / F.lit(widths[score_col])),
        ).crossJoin(F.broadcast(n))
        scored = ranked.select(
            "o_custkey",
            ntile_from_rank(F.col("rank"), F.col("_n"), 5).alias(score_col),
        )
        out = out.join(scored, "o_custkey")
    return out.select(
        "o_custkey",
        "last_day",
        "n_orders",
        (F.col("cents") / F.lit(100.0)).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
    )


def order_value_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean per priority — the robust-mean report that
    drops each tail before averaging (outlier-resistant KPI). The trim
    cut is rank-based and integer-exact: keep rows with
    trim < rn <= n - trim where trim = n DIV 20; the mean is the raw
    double division of an integer cents sum by an integer count."""
    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        derive_band_width,
        with_grouped_rank,
    )

    orders = load_table(spark, "orders", sf_dir)
    d = orders.select(
        "o_orderpriority", "o_orderkey", _cents().alias("cents")
    )
    # r9 scale migration onto the (priority, band) grouped lane; the
    # kept VALUE multiset is tie-order-free (boundary ties share the
    # same cents), so the sum is unchanged.
    width = derive_band_width(d, "cents")
    ranked = with_grouped_rank(
        d, ["o_orderpriority"], ["cents", "o_orderkey"],
        bucket=F.floor(F.col("cents") / F.lit(width)),
        rank_col="rn", count_col="n",
    )
    return (
        ranked
        .withColumn("trim", F.expr("n DIV 20"))
        .where((F.col("rn") > F.col("trim"))
               & (F.col("rn") <= F.col("n") - F.col("trim")))
        .groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n_orders"),
            F.count("*").alias("n_kept"),
            F.sum("cents").alias("kept_cents"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            "n_kept",
            (F.col("kept_cents").cast("double")
             / F.col("n_kept").cast("double") / F.lit(100.0))
            .alias("trimmed_mean"),
        )
    )


def priority_status_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence crosstab between order priority and
    status — the categorical-association data-quality check.

    Per-cell statistic in FIXED-POINT integer arithmetic (the
    retrieval.py log trick): term_ppm = (o*N - rt*ct)^2 * 1e6 DIV
    (rt*ct*N) — one floor division per cell, integer sums, so the
    statistic is bit-portable; a float (o-e)^2/e accumulates
    engine-ordered rounding. The intermediate (o*N - rt*ct)^2 grows as
    N^4, so it runs in DECIMAL(38,0) (HUGEINT on the oracle side) —
    plain BIGINT overflows right at sf0.1. One count shuffle; the
    margins are a 15-row broadcast."""
    orders = load_table(spark, "orders", sf_dir)
    cell = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("o")
    )
    rt = cell.groupBy("o_orderpriority").agg(F.sum("o").alias("rt"))
    ct = cell.groupBy("o_orderstatus").agg(F.sum("o").alias("ct"))
    n = cell.agg(F.sum("o").alias("n"))
    big = "CAST({} AS DECIMAL(38,0))"
    d = (f"({big.format('o')} * n - {big.format('rt')} * ct)")
    return (
        cell.join(F.broadcast(rt), "o_orderpriority")
        .join(F.broadcast(ct), "o_orderstatus")
        .crossJoin(F.broadcast(n))
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "o",
            F.expr(f"CAST({big.format('rt')} * ct DIV n AS BIGINT)")
            .alias("expected_floor"),
            F.expr(
                f"CAST({d} * {d} * 1000000"
                f" DIV ({big.format('rt')} * ct * n) AS BIGINT)"
            ).alias("term_ppm"),
        )
    )


def segment_priority_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between customer market segment
    and order priority — the information-theoretic sibling of the
    chi-square crosstab above: chi2 says WHETHER the two columns
    associate; the per-cell PMI says WHERE (which segment over/under-
    orders which priority) in interpretable nats, and the mi_term
    column sums to the total mutual information.

    Exactness: pmi = ln(o*N) - ln(r*c) — ln of INTEGER arguments only
    (the source_js_divergence discipline: each ln arg is an exact
    DECIMAL(38,0) product, micro-rounded once per cell in a
    25-row-bounded frame). mi_term_nano = o * pmi_micro * 1000 DIV N
    (nano-nats, truncating division shared by both engines; negative
    PMI truncates toward zero identically — the Theil-Sen-verified
    behavior).

    Plan: one orders-x-customer key join (segment rides the customer
    row; no broadcast assumption — AQE picks the strategy, and at
    100 TB this is a plain co-partitioned shuffle join), a
    (segment, priority) count shuffle, then broadcast margins — the
    chi2 plan with one extra dim join."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    cell = (
        orders.join(
            customer, orders.o_custkey == customer.c_custkey
        )
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("o"))
    )
    rt = cell.groupBy("c_mktsegment").agg(F.sum("o").alias("rt"))
    ct = cell.groupBy("o_orderpriority").agg(F.sum("o").alias("ct"))
    n = cell.agg(F.sum("o").alias("n"))

    def _lnmu(expr: str) -> str:
        return (f"cast(round(ln(cast({expr} as double)) * 1000000)"
                " as bigint)")

    big = "CAST({} AS DECIMAL(38,0))"
    return (
        cell.join(F.broadcast(rt), "c_mktsegment")
        .join(F.broadcast(ct), "o_orderpriority")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "pmi_micro",
            F.expr(_lnmu(f"{big.format('o')} * n"))
            - F.expr(_lnmu(f"{big.format('rt')} * ct")),
        )
        .select(
            "c_mktsegment",
            "o_orderpriority",
            "o",
            "pmi_micro",
            F.expr(
                f"CAST({big.format('o')} * pmi_micro * 1000 DIV n"
                " AS BIGINT)"
            ).alias("mi_term_nano"),
        )
    )


def event_anomalies_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (MAD) anomaly detection — the median-based twin of the
    z-score monitor (plans/advanced.event_anomalies). Mean/stddev are
    themselves dragged by the outliers they hunt; median absolute
    deviation is not (50% breakdown point, the robust-statistics
    standard).

    Everything stays integer: medians use the x2-cents idiom
    (dev_x2 = |2*cents - med_x2| half-cent units, mad_x4 = doubled
    median of dev_x2), and the 3 * 1.4826 * MAD cut is the cross-
    multiplied integer predicate dev_x2 * 20000 > 22239 * mad_x4 — no
    float at the flag boundary, engine-exact row set.

    Scale (migrated r9): the two per-type rank passes originally ran
    plain partitionBy(event_type) windows — each group is corpus/5,
    so at 100 TB every rank pass funnels a fifth of the corpus
    through ONE task. Both now run the with_grouped_rank banded lane
    ((type, band) window partitions + broadcast per-group offsets);
    the SELECTED median/MAD values are unchanged (the value at rank k
    of a sorted multiset does not depend on the tie order the added
    event_id tiebreak fixes), so the entry stays hash-identical —
    re-verified against the unchanged oracle at both SFs."""
    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        derive_band_width,
        with_grouped_rank,
    )

    ev = load_table(spark, "events", sf_dir)
    d = ev.select(
        "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    width = derive_band_width(d, "cents")
    ranked = with_grouped_rank(
        d, ["event_type"], ["cents", "event_id"],
        bucket=F.floor(F.col("cents") / F.lit(width)),
        rank_col="rn", count_col="n",
    )
    med = (
        ranked.where((F.col("rn") == F.expr("(n + 1) DIV 2"))
                     | (F.col("rn") == F.expr("(n + 2) DIV 2")))
        .groupBy("event_type")
        .agg(F.when(F.count("*") == 1, F.sum("cents") * 2)
             .otherwise(F.sum("cents")).cast("long").alias("med_x2"))
    )
    dev = d.join(F.broadcast(med), "event_type").withColumn(
        "dev_x2", F.abs(F.col("cents") * 2 - F.col("med_x2"))
    )
    width2 = derive_band_width(dev, "dev_x2")
    dranked = with_grouped_rank(
        dev.select("event_type", "event_id", "dev_x2"),
        ["event_type"], ["dev_x2", "event_id"],
        bucket=F.floor(F.col("dev_x2") / F.lit(width2)),
        rank_col="rn", count_col="n",
    )
    mad = (
        dranked.where((F.col("rn") == F.expr("(n + 1) DIV 2"))
                      | (F.col("rn") == F.expr("(n + 2) DIV 2")))
        .groupBy("event_type")
        .agg(F.when(F.count("*") == 1, F.sum("dev_x2") * 2)
             .otherwise(F.sum("dev_x2")).cast("long").alias("mad_x4"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("dev_x2") * 20000 > F.lit(22239) * F.col("mad_x4"))
        .select(
            "event_id", "event_type",
            (F.col("cents") / F.lit(100.0)).alias("value"),
            "dev_x2", "mad_x4",
        )
    )


AB_WINDOW_MIN = 120


def ab_experiment_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users hash-split into two arms,
    conversion = purchase within AB_WINDOW_MIN minutes of the user's
    FIRST view (the windowed funnel definition — 'ever purchased'
    saturates at 100% on any long-lived user base and measures
    nothing), and the two-proportion z-SQUARED statistic
    (z^2 > 3.8415 <=> p < 0.05 two-sided).

    Why z^2: the z statistic needs a square root, which is not
    bit-portable across engines; z^2 is a RATIONAL function of the
    four counts, so it computes exactly in DECIMAL(38,0)/HUGEINT
    micro-units and the whole report (significance verdict included)
    hash-verifies. Assignment is md5-based (stable, cross-run,
    repartition-proof). Two user_id-co-partitioned aggregates;
    everything after is arithmetic on a 2-row frame."""
    ev = load_table(spark, "events", sf_dir)
    arm = (
        F.expr("cast(conv(substring(md5(cast(user_id as string)), 1, 6),"
               " 16, 10) as bigint) % 2")
    )
    first_view = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ft"))
    )
    per_user = (
        ev.join(first_view, "user_id")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("ft"))
                    & (F.expr("timestampdiff(MICROSECOND, ft, ts)")
                       <= AB_WINDOW_MIN * 60 * 1_000_000),
                    1,
                ).otherwise(0)
            ).alias("purchased"),
        )
        .select(arm.alias("arm"), "purchased")
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        F.sum("purchased").alias("n_converted"),
    )
    # literal arm spine: an arm with zero assigned users still reports
    # (n=0, c=0) instead of making the whole readout vanish
    spine = local_frame(spark, [(0,), (1,)], "arm long")
    arms = (
        spine.join(arms, "arm", "left")
        .select(
            "arm",
            F.coalesce("n_users", F.lit(0)).alias("n_users"),
            F.coalesce("n_converted", F.lit(0)).alias("n_converted"),
        )
    )
    a = arms.where(F.col("arm") == 0).select(
        F.col("n_users").alias("n0"), F.col("n_converted").alias("c0"))
    b = arms.where(F.col("arm") == 1).select(
        F.col("n_users").alias("n1"), F.col("n_converted").alias("c1"))
    # z^2 = (p0-p1)^2 / (p(1-p)(1/n0+1/n1)), all over common
    # denominators: with N=n0+n1, C=c0+c1,
    # z^2 = (c0*n1 - c1*n0)^2 * N / (n0*n1*C*(N-C))
    big = "CAST({} AS DECIMAL(38,0))"
    # degenerate pooled variance (all or none converted) -> zero
    # evidence of a difference by definition, not a crash
    z2_micro = (
        f"CASE WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0"
        f" OR n0 + n1 - c0 - c1 = 0"
        f" THEN CAST(0 AS BIGINT) ELSE "
        f"CAST(({big.format('c0')} * n1 - {big.format('c1')} * n0)"
        f" * ({big.format('c0')} * n1 - {big.format('c1')} * n0)"
        f" * (n0 + n1) * 1000000"
        f" DIV ({big.format('n0')} * n1 * (c0 + c1)"
        f" * (n0 + n1 - c0 - c1)) AS BIGINT) END"
    )
    return (
        a.crossJoin(F.broadcast(b))  # 1x1 scalar combine, broadcast form
        .select(
            "n0", "c0", "n1", "c1",
            F.expr(
                f"CASE WHEN n0 = 0 THEN CAST(0 AS BIGINT) ELSE"
                f" CAST({big.format('c0')} * 1000000 DIV n0 AS BIGINT) END"
            ).alias("conv0_ppm"),
            F.expr(
                f"CASE WHEN n1 = 0 THEN CAST(0 AS BIGINT) ELSE"
                f" CAST({big.format('c1')} * 1000000 DIV n1 AS BIGINT) END"
            ).alias("conv1_ppm"),
            F.expr(z2_micro).alias("z2_micro"),
            (F.expr(z2_micro) > 3841459).alias("significant_05"),
        )
    )


FOLDS = 5


def kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-keyed k-fold split (k=5) with per-(lang, fold) balance
    counts — cross-validation assignment that is stable under
    repartitioning and puts exact duplicates in the SAME fold (no
    leakage through dup copies), the k-fold generalization of
    split_assignment."""
    docs = load_table(spark, "documents", sf_dir)
    fold = F.expr(
        "cast(conv(substring(md5(text), 1, 6), 16, 10) as bigint)"
        f" % {FOLDS}"
    )
    return (
        docs.select("lang", fold.alias("fold"))
        .groupBy("lang", "fold")
        .agg(F.count("*").alias("n_docs"))
    )


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTITY-weighted median unit price per return flag: the
    median of the plain row stream answers 'the middle line item';
    the weighted form answers 'the price at which half the UNITS
    moved' — the inventory-valuation quantile.

    Integer-exact cut: rows sorted by price cents, cumulative quantity
    (integer) compared to total via cross-multiplication (2*cum >=
    total picks the lower weighted median).

    r9 scale migration: originally THREE whole-group
    partitionBy(l_returnflag) windows (corpus/3 rows per task); the
    running quantity now rides with_grouped_rank's grouped cumsum on
    (flag, price-band) partitions, the total is a plain group
    aggregate, and the pick is a MIN over qualifying rows (the first
    crossing row's PRICE is tie-order-free) — no whole-group window
    anywhere, values hash-identical."""
    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        derive_band_width,
        with_grouped_rank,
    )

    li = load_table(spark, "lineitem", sf_dir)
    d = li.select(
        "l_returnflag", "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    width = derive_band_width(d, "cents")
    ranked = with_grouped_rank(
        d, ["l_returnflag"], ["cents", "l_orderkey", "l_linenumber"],
        bucket=F.floor(F.col("cents") / F.lit(width)),
        cumsum_of="qty", cumsum_col="cum_qty",
    )
    totals = d.groupBy("l_returnflag").agg(
        F.sum("qty").alias("total_qty")
    )
    return (
        ranked.join(F.broadcast(totals), "l_returnflag")
        .where(F.col("cum_qty") * 2 >= F.col("total_qty"))
        .groupBy("l_returnflag")
        .agg(
            F.max("total_qty").alias("total_qty"),
            F.min("cents").alias("_mc"),
        )
        .select(
            "l_returnflag",
            "total_qty",
            (F.col("_mc") / F.lit(100.0)).alias("weighted_median_price"),
        )
    )


def revenue_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point curve over daily revenue: the classic drift
    detector, in EXACT integers. CUSUM_t = sum_{i<=t}(x_i - mean)
    multiplied through by n_days to clear the rational mean:
    scaled_cusum = n * prefix_t - t * total (cents·days). The curve's
    |max| day is the best single change-point estimate (flagged).
    Day rollup first, so the ordered window runs over the calendar-
    bounded frame."""
    orders = load_table(spark, "orders", sf_dir)
    daily = orders.groupBy(
        F.expr("datediff(cast(o_orderdate as date), date '1970-01-01')")
        .alias("epoch_day")
    ).agg(F.sum(_cents()).alias("day_cents"))
    w = Window.orderBy("epoch_day")
    d = (
        daily.withColumn(
            "t", F.row_number().over(w).cast("long"))
        .withColumn(
            "prefix",
            F.sum("day_cents").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("n_days", F.count("*").over(
            Window.partitionBy(F.lit(1))))
        .withColumn("total", F.sum("day_cents").over(
            Window.partitionBy(F.lit(1))))
        .withColumn(
            "scaled_cusum",
            F.col("n_days") * F.col("prefix") - F.col("t") * F.col("total"),
        )
    )
    w_abs = Window.orderBy(F.desc(F.abs(F.col("scaled_cusum"))), F.asc("epoch_day"))
    return (
        d.withColumn("drift_rank", F.row_number().over(w_abs).cast("long"))
        .select(
            F.col("epoch_day").cast("long").alias("epoch_day"),
            (F.col("day_cents") / F.lit(100.0)).alias("day_revenue"),
            "scaled_cusum",
            (F.col("drift_rank") == 1).alias("is_changepoint"),
        )
    )


def part_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification — the operational follow-on to the
    Pareto frontier: EVERY part classed A (first 50% of revenue),
    B (next 30%), C (tail), reported as per-class part counts and
    revenue. Class cuts are the same pure-integer predicates as the
    frontier ((cum-own)*2 < total for A, *10 < 8*total for B), so the
    class assignment is engine-exact; the summary is class-bounded
    (3 rows).

    Scale shape (r8): same de-weak as part_revenue_pareto — the
    part-level frame grows with data, so the running sum comes from
    the two-pass distributed rank (cumsum_of) over auto-derived
    revenue bands, never a global single-task window."""
    li = load_table(spark, "lineitem", sf_dir)
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
        ).alias("cents")
    )
    keyed = rev.select(
        "l_partkey", "cents", (-F.col("cents")).alias("_neg")
    ).localCheckpoint(eager=False)  # probe + rank + total: scan once
    width = derive_band_width(keyed, "_neg")
    total = keyed.agg(F.sum("cents").alias("total_cents"))
    classed = (
        with_global_rank(
            keyed,
            ["_neg", "l_partkey"],
            bucket=F.floor(F.col("_neg") / F.lit(width)),
            cumsum_of="cents",
            cumsum_col="cum_cents",
        )
        .crossJoin(F.broadcast(total))
        .withColumn(
            "abc_class",
            F.when(
                (F.col("cum_cents") - F.col("cents")) * 2
                < F.col("total_cents"), "A")
            .when(
                (F.col("cum_cents") - F.col("cents")) * 10
                < F.col("total_cents") * 8, "B")
            .otherwise("C"),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            (F.sum("cents") / F.lit(100.0)).alias("revenue"),
        )
    )


def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier performance scorecard — the multi-metric mart row a
    procurement review reads: volume, integer-cents revenue, breadth
    (distinct parts), return share, and average ship lead time
    (o_orderdate -> l_shipdate, integer days). One fact scan joined to
    a broadcast order-date projection; ratios are raw integer-over-
    integer doubles."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    j = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    return (
        j.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        * 100).cast("long")
            ).alias("rev_cents"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .alias("n_returned"),
            F.sum(
                F.expr("datediff(cast(l_shipdate as date),"
                       " cast(o_orderdate as date))")
            ).alias("lead_days_sum"),
        )
        .select(
            "l_suppkey",
            "n_items",
            (F.col("rev_cents") / F.lit(100.0)).alias("revenue"),
            "n_parts",
            (F.col("n_returned").cast("double")
             / F.col("n_items").cast("double")).alias("return_share"),
            (F.col("lead_days_sum").cast("double")
             / F.col("n_items").cast("double")).alias("avg_lead_days"),
        )
    )


def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation trade balance: demand (what the nation's customers
    spend, via orders) vs supply (what its suppliers ship, via
    lineitem revenue), and the integer-cents balance — a two-sided
    mart joining both fact paths to the same conformed dimension.
    Each side is one rollup to <=25 nation rows; the final join is
    dimension-sized; FULL OUTER + coalesce keeps one-sided nations."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    demand = (
        orders.join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
                    orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
             .alias("demand_cents"))
    )
    supply = (
        li.join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100).cast("long")).alias("supply_cents"))
    )
    return (
        demand.join(supply, "nation", "full_outer")
        .select(
            "nation",
            (F.coalesce("demand_cents", F.lit(0)) / F.lit(100.0))
            .alias("demand"),
            (F.coalesce("supply_cents", F.lit(0)) / F.lit(100.0))
            .alias("supply"),
            ((F.coalesce("supply_cents", F.lit(0))
              - F.coalesce("demand_cents", F.lit(0))) / F.lit(100.0))
            .alias("balance"),
        )
    )


def brand_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate league table per part brand: items, returned items
    ('R' flag), return share, and returned revenue — the supplier-
    quality slice of the returns story (q10 ranks customers, the
    scorecard ranks suppliers; this ranks the CATALOG). One fact scan
    joined to the broadcast part dim; shares are raw integer-over-
    integer doubles."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .alias("n_returned"),
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R",
                    F.round(F.col("l_extendedprice") * 100).cast("long"),
                ).otherwise(0)
            ).alias("ret_cents"),
        )
        .select(
            "p_brand",
            "n_items",
            "n_returned",
            (F.col("n_returned").cast("double")
             / F.col("n_items").cast("double")).alias("return_share"),
            (F.col("ret_cents") / F.lit(100.0)).alias("returned_revenue"),
        )
    )


def discount_band_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-band effectiveness: volume, gross and net revenue, and
    given-away margin per discount band (integer hundredths: bands
    0, 1-2, 3-5, 6-8, 9-10 percent) — the pricing-team view q6 only
    samples one slice of. Band edges are integer CASE cuts on the
    integer discount hundredths (a float BETWEEN at band edges is the
    q19-class portability trap); money stays integer cents."""
    li = load_table(spark, "lineitem", sf_dir)
    disc_h = F.round(F.col("l_discount") * 100).cast("long")
    band = (
        F.when(disc_h == 0, "0%")
        .when(disc_h <= 2, "1-2%")
        .when(disc_h <= 5, "3-5%")
        .when(disc_h <= 8, "6-8%")
        .otherwise("9-10%")
    )
    gross = F.round(F.col("l_extendedprice") * 100).cast("long")
    net = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.select(band.alias("band"), gross.alias("g"), net.alias("n"),
                  F.col("l_quantity").cast("long").alias("qty"))
        .groupBy("band")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("qty").alias("units"),
            (F.sum("g") / F.lit(100.0)).alias("gross_revenue"),
            (F.sum("n") / F.lit(100.0)).alias("net_revenue"),
            ((F.sum("g") - F.sum("n")) / F.lit(100.0)).alias("discount_given"),
        )
    )


def segment_order_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of order value per market segment — the
    inequality statistic behind 'how head-heavy is this segment'.
    Exact rational form on ranked integer cents:
      G = 2*sum(rank*x) / (n*sum(x)) - (n+1)/n,
    emitted as integer ppm with each division a floor over exact
    integers (HUGEINT/DECIMAL(38) intermediates — rank*cents sums
    reach ~1e16 at sf0.1 and grow quadratically) — bit-portable, no
    float subtraction at the boundary. One shuffle + one ordered rank
    window per segment."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    d = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select("c_mktsegment", _cents().alias("cents"), "o_orderkey")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "o_orderkey")
    ranked = d.withColumn("rn", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.sum(F.expr("cast(rn as decimal(38,0)) * cents"))
            .alias("rank_weighted"),
        )
        .select(
            "c_mktsegment",
            "n_orders",
            (F.col("sum_cents") / F.lit(100.0)).alias("revenue"),
            F.expr(
                "cast(2 * rank_weighted * 1000000"
                " DIV (cast(n_orders as decimal(38,0)) * sum_cents)"
                " - (cast(n_orders as decimal(38,0)) + 1) * 1000000"
                " DIV n_orders as bigint)"
            ).alias("gini_ppm"),
        )
    )


def segment_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supplier-concentration index per market
    segment: HHI = Σ share_i² over each supplier's revenue share of
    the segment — the antitrust-style concentration measure
    (Gini asks how unequal ORDERS are; HHI asks how captured the
    SUPPLY side is; >2500 ppm-of-10000 reads as concentrated).
    Exact rational: hhi_ppm = Σ(cents_i²)·1e6 DIV (Σcents)² in
    HUGEINT/DECIMAL(38) (squares pass BIGINT at sf0.1). Two rollups
    (supplier-in-segment, then segment), both map-side combined."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    per_supp = (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_mktsegment")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "l_suppkey")
        .agg(F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100).cast("long")).alias("cents"))
    )
    return (
        per_supp.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum("cents").alias("sum_cents"),
            F.sum(F.expr("cast(cents as decimal(38,0)) * cents"))
            .alias("sq_sum"),
        )
        .select(
            "c_mktsegment",
            "n_suppliers",
            (F.col("sum_cents") / F.lit(100.0)).alias("revenue"),
            F.expr(
                "cast(sq_sum * 1000000"
                " DIV (cast(sum_cents as decimal(38,0)) * sum_cents)"
                " as bigint)"
            ).alias("hhi_ppm"),
        )
    )


def part_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket LIFT for the top co-purchased part pairs:
    lift = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b) — the
    normalization that separates 'popular with everything' from
    genuinely associated (parts_bought_together ranks raw counts;
    lift > 1e6 ppm reads as positive association). Exact rational in
    HUGEINT ppm; support floor n_ab >= 3 bounds the pair set; top 20
    by (lift, pair) deterministic. The order count N is a 1-row agg
    frame combined via broadcast crossJoin (the house scalar-combine
    shape) — never an eager .count() at plan-build time."""
    li = load_table(spark, "lineitem", sf_dir)
    items = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n = items.agg(F.countDistinct("o").alias("n_orders"))
    per_part = items.groupBy("p").agg(F.count("*").alias("n_p"))
    b = items.select(F.col("o"), F.col("p").alias("q"))
    pairs = (
        items.join(b, "o")
        .where(F.col("p") < F.col("q"))
        .groupBy("p", "q")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 3)
    )
    na = per_part.withColumnRenamed("p", "pa").withColumnRenamed("n_p", "n_a")
    nb = per_part.withColumnRenamed("p", "pb").withColumnRenamed("n_p", "n_b")
    return (
        pairs.join(F.broadcast(na), pairs.p == na.pa)
        .join(F.broadcast(nb), pairs.q == nb.pb)
        .crossJoin(F.broadcast(n))
        .select(
            F.col("p").alias("part_a"),
            F.col("q").alias("part_b"),
            "n_ab",
            F.expr(
                "cast(cast(n_ab as decimal(38,0)) * n_orders * 1000000"
                " DIV (cast(n_a as decimal(38,0)) * n_b) as bigint)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


def part_recommendations_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item recommendation serving table: for every anchor part,
    its top-3 co-purchase recommendations by lift — the materialized
    'customers who bought X also bought' surface (part_pair_lift above
    ranks the global pair list; a recommender needs the PER-ANCHOR
    ranking, symmetrized, with deterministic tie-breaks).

    Same exact-rational lift ppm and n_ab >= 3 support floor as the
    lift entry; pairs symmetrized so both endpoints serve as anchors;
    rank = row_number over (lift desc, n_ab desc, rec asc) inside a
    PARTITIONED window (per-anchor — bounded by co-purchase degree,
    never corpus-sized). Output is anchor x <=3 rows, the shape a
    key-value store loads verbatim."""
    li = load_table(spark, "lineitem", sf_dir)
    items = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n = items.agg(F.countDistinct("o").alias("n_orders"))
    per_part = items.groupBy("p").agg(F.count("*").alias("n_p"))
    b = items.select(F.col("o"), F.col("p").alias("q"))
    pairs = (
        items.join(b, "o")
        .where(F.col("p") < F.col("q"))
        .groupBy("p", "q")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 3)
    )
    sym = pairs.select(
        F.col("p").alias("part_id"), F.col("q").alias("rec_part_id"), "n_ab"
    ).unionByName(
        pairs.select(
            F.col("q").alias("part_id"), F.col("p").alias("rec_part_id"),
            "n_ab",
        )
    )
    na = per_part.withColumnRenamed("p", "pa").withColumnRenamed("n_p", "n_a")
    nb = per_part.withColumnRenamed("p", "pb").withColumnRenamed("n_p", "n_b")
    scored = (
        sym.join(F.broadcast(na), sym.part_id == na.pa)
        .join(F.broadcast(nb), sym.rec_part_id == nb.pb)
        .crossJoin(F.broadcast(n))
        .select(
            "part_id", "rec_part_id", "n_ab",
            F.expr(
                "cast(cast(n_ab as decimal(38,0)) * n_orders * 1000000"
                " DIV (cast(n_a as decimal(38,0)) * n_b) as bigint)"
            ).alias("lift_ppm"),
        )
    )
    w = Window.partitionBy("part_id").orderBy(
        F.desc("lift_ppm"), F.desc("n_ab"), F.asc("rec_part_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("part_id", "rank", "rec_part_id", "n_ab", "lift_ppm")
    )


RECS_TOPN_ORACLE = """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT o) AS HUGEINT) AS n_orders FROM items),
    per_part AS (SELECT p, COUNT(*) AS n_p FROM items GROUP BY p),
    pairs AS (
      SELECT a.p, b.p AS q, COUNT(*) AS n_ab
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= 3
    ),
    sym AS (
      SELECT p AS part_id, q AS rec_part_id, n_ab FROM pairs
      UNION ALL
      SELECT q, p, n_ab FROM pairs
    ),
    scored AS (
      SELECT part_id, rec_part_id, CAST(n_ab AS BIGINT) AS n_ab,
        CAST(CAST(n_ab AS HUGEINT) * n_orders * 1000000
             // (CAST(na.n_p AS HUGEINT) * nb.n_p) AS BIGINT)
          AS lift_ppm
      FROM sym
      JOIN per_part na ON na.p = part_id
      JOIN per_part nb ON nb.p = rec_part_id
      CROSS JOIN n
    )
    SELECT part_id, CAST(rank AS BIGINT) AS rank, rec_part_id, n_ab,
           lift_ppm
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY part_id
        ORDER BY lift_ppm DESC, n_ab DESC, rec_part_id
      ) AS rank
      FROM scored
    ) WHERE rank <= 3
"""


def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: orders still in status 'O', bucketed
    into 90-day age bands as of the corpus's latest order date, with
    count and tied-up value per (band, priority) — the ops report
    that says WHAT is stuck, HOW old, and HOW much money it holds
    (an average age hides a bimodal backlog; the banded histogram
    doesn't).

    Exact integers throughout: age in days against a 1-row broadcast
    max-date frame (the house scalar-combine — no eager collect),
    band = age DIV 90, value in cents. One filtered scan + one
    (band, priority) groupBy, map-side combined."""
    orders = load_table(spark, "orders", sf_dir)
    mx = orders.agg(
        F.max(F.expr("cast(o_orderdate as date)")).alias("max_d")
    )
    return (
        orders.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(mx))
        .select(
            "o_orderpriority",
            F.expr(
                "datediff(max_d, cast(o_orderdate as date)) DIV 90"
            ).alias("age_band"),
            _cents().alias("cents"),
        )
        .groupBy("age_band", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("backlog_cents"),
        )
        .withColumn("band_start_days", F.col("age_band") * 90)
    )


def brand_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative price dispersion (coefficient of variation, ppm) per
    part brand — the assortment-consistency stat that a raw stddev
    hides (a premium brand's $50 spread means nothing next to a
    budget brand's $50 spread; CV normalizes by the mean).

    Exactness (the F57 sqrt lane): the variance radicand n·Σx² − S²
    is an exact DECIMAL(38,0) integer per brand; population
    CV = sqrt(n·Q − S²)/S, so cv_ppm = round(1e6 · sqrt(radicand)/S)
    — IEEE sqrt is correctly rounded and the radicand converts to
    double ONCE, so the value is bit-portable; one rounding site.
    Plan: one map-side-combined groupBy on the brand catalog."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    d = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
    )
    agg = d.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
        F.sum(F.expr(
            "CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))"
        )).alias("q"),
    )
    return agg.select(
        "p_brand",
        F.col("n").cast("long").alias("n_items"),
        F.expr("CAST(s DIV n AS BIGINT)").alias("mean_cents"),
        F.expr(
            "CAST(round(sqrt(CAST(CAST(n AS DECIMAL(38,0)) * q - s * s"
            " AS DOUBLE)) * 1000000 / CAST(s AS DOUBLE)) AS BIGINT)"
        ).alias("cv_ppm"),
    )


BRAND_DISPERSION_ORACLE = """
    WITH d AS (
      SELECT p.p_brand,
        CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    agg AS (
      SELECT p_brand, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(c) AS HUGEINT) AS s,
             SUM(CAST(c AS HUGEINT) * c) AS q
      FROM d GROUP BY p_brand
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n_items,
      CAST(s // n AS BIGINT) AS mean_cents,
      CAST(ROUND(sqrt(CAST(n * q - s * s AS DOUBLE)) * 1000000
           / CAST(s AS DOUBLE)) AS BIGINT) AS cv_ppm
    FROM agg
"""


BACKLOG_AGING_ORACLE = """
    WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS max_d FROM orders)
    SELECT CAST(datediff('day', CAST(o_orderdate AS DATE), max_d) // 90
                AS BIGINT) AS age_band,
           o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS backlog_cents,
           CAST(datediff('day', CAST(o_orderdate AS DATE), max_d) // 90
                AS BIGINT) * 90 AS band_start_days
    FROM orders CROSS JOIN mx
    WHERE o_orderstatus = 'O'
    GROUP BY 1, 2, 5
"""


DECAY_TAU_DAYS = 365  # e-folding time constant of the recency weight


def segment_decayed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed revenue per market segment — the
    recency-weighted LTV companion to customer_rfm: each order's cents
    are weighted by w = exp(-age_days / tau) relative to the NEWEST
    order date, so a segment whose revenue is all old scores low even
    when its raw total matches a fresh one.

    Bit-portability: exp is the same transcendental hazard as ln, so
    the weight is micro-rounded ONCE per DISTINCT age (the zipf/BM25
    fixed-point discipline) in a calendar-bounded frame (~2.5k ages),
    broadcast back onto the fact rows; cents * w_micro accumulates in
    DECIMAL(38,0)/HUGEINT (the product is ~1e13 per row at sf0.1 —
    the width that dies first at 100 TB). Scale shape: one scalar
    max-date aggregate, one bounded weight table (broadcast), one
    broadcast customer->segment join... customer is NOT broadcast-
    small in general — the segment tag rides the orders scan's
    shuffled join on custkey; here Catalyst/AQE picks broadcast from
    stats, both correct."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    day = "datediff(cast(o_orderdate as date), date '1970-01-01')"
    o = orders.select(
        "o_custkey",
        F.expr(day).cast("long").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    ref = o.agg(F.max("d").alias("ref_d"))
    aged = o.crossJoin(F.broadcast(ref)).withColumn(
        "age", F.col("ref_d") - F.col("d")
    )
    weights = (
        aged.select("age").distinct()
        .withColumn(
            "w_micro",
            F.expr(
                f"cast(round(exp(-cast(age as double) / {DECAY_TAU_DAYS})"
                " * 1000000) as bigint)"
            ),
        )
    )
    return (
        aged.join(F.broadcast(weights), "age")
        .join(cust.select(F.col("c_custkey").alias("o_custkey"),
                          "c_mktsegment"), "o_custkey")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("raw_cents"),
            F.sum(F.col("cents").cast("decimal(38,0)") * F.col("w_micro"))
            .alias("_dec"),
        )
        .select(
            "segment", "n_orders", "raw_cents",
            # micro-cents of decayed value, floor to integer cents
            F.expr("cast(_dec DIV 1000000 as bigint)")
            .alias("decayed_cents"),
        )
    )


SEGMENT_DECAYED_ORACLE = f"""
    WITH o AS (
      SELECT o_custkey,
        CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    ref AS (SELECT MAX(d) AS ref_d FROM o),
    aged AS (SELECT o_custkey, cents, ref_d - d AS age FROM o, ref),
    weights AS (
      SELECT age,
        CAST(ROUND(exp(-CAST(age AS DOUBLE) / {DECAY_TAU_DAYS})
             * 1000000) AS BIGINT) AS w_micro
      FROM (SELECT DISTINCT age FROM aged)
    )
    SELECT c.c_mktsegment AS segment,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(cents) AS BIGINT) AS raw_cents,
      CAST(SUM(CAST(cents AS HUGEINT) * w_micro) // 1000000 AS BIGINT)
        AS decayed_cents
    FROM aged a
    JOIN weights w USING (age)
    JOIN customer c ON a.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
"""


GAP_TOP_N = 10


def orderkey_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands audit over lineitem's referenced-orderkey
    sequence: the TOP-10
    largest missing-key runs, each row also carrying the global gap
    count and total missing keys — the sequence-integrity check a
    warehouse runs on any surrogate key feed (a big gap = a lost batch,
    not random attrition).

    Classic SQL does LEAD over the full distinct-key list — a global
    window over a data-sized frame. Here the boundary-pairing form
    replaces it: a gap's left edge is a key k with k+1 absent (one
    self-anti-join), its right edge a key m with m-1 absent; islands
    alternate, so the r-th smallest left edge pairs with the r-th
    smallest right edge above it. Both boundary sets rank through the
    banded two-pass rank (functions/ranking.py — frames are
    gap-count-sized but unbounded in principle, same treatment as the
    vocabulary), the pair join is on rank, and the top-10 pick plans
    as TakeOrderedAndProject (O(10) driver). The oracle runs the
    classic LEAD form — agreement proves the pairing argument."""
    li = load_table(spark, "lineitem", sf_dir)
    keys = li.select(F.col("l_orderkey").alias("k")).distinct() \
        .localCheckpoint()  # feeds 2 anti-joins, 2 rank passes, bounds
    bounds = keys.agg(F.min("k").alias("mn"), F.max("k").alias("mx"))
    succ = keys.select((F.col("k") - 1).alias("k"))
    ends = (
        keys.join(succ, "k", "anti")  # k+1 absent
        .crossJoin(F.broadcast(bounds))
        .where(F.col("k") < F.col("mx"))
        .select("k")
    )
    pred = keys.select((F.col("k") + 1).alias("k"))
    starts = (
        keys.join(pred, "k", "anti")  # k-1 absent
        .crossJoin(F.broadcast(bounds))
        .where(F.col("k") > F.col("mn"))
        .select("k")
    )
    band = F.floor(F.col("k") / F.lit(1 << 12))
    e = with_global_rank(ends, ["k"], bucket=band).select(
        F.col("k").alias("gap_end_k"), F.col("rank").alias("r")
    )
    s = with_global_rank(starts, ["k"], bucket=band).select(
        F.col("k").alias("gap_start_k"), F.col("rank").alias("r")
    )
    gaps = e.join(s, "r").select(
        (F.col("gap_end_k") + 1).alias("gap_start"),
        (F.col("gap_start_k") - 1).alias("gap_end"),
        (F.col("gap_start_k") - F.col("gap_end_k") - 1).alias("gap_len"),
    )
    summary = gaps.agg(
        F.count("*").alias("n_gaps"),
        F.coalesce(F.sum("gap_len"), F.lit(0)).alias("total_missing"),
    )
    return (
        gaps.orderBy(F.desc("gap_len"), F.asc("gap_start"))
        .limit(GAP_TOP_N)
        .crossJoin(F.broadcast(summary))
    )


GAP_ISLANDS_ORACLE = f"""
    WITH keys AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
    n AS (SELECT k, LEAD(k) OVER (ORDER BY k) AS nk FROM keys),
    gaps AS (
      SELECT k + 1 AS gap_start, nk - 1 AS gap_end,
             nk - k - 1 AS gap_len
      FROM n WHERE nk > k + 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(COALESCE(SUM(gap_len), 0) AS BIGINT) AS total_missing
      FROM gaps
    )
    SELECT gap_start, gap_end, gap_len, n_gaps, total_missing
    FROM (
      SELECT * FROM gaps
      ORDER BY gap_len DESC, gap_start ASC LIMIT {GAP_TOP_N}
    ), s
"""


TRIPLE_MIN_SUPPORT = 2
TRIPLE_TOP_N = 20


def brand_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent brand 3-itemsets — the market-basket step past pairs
    (E21/E88): top-20 brand TRIPLES co-occurring in an order, with
    each member's solo order count alongside so the reader sees
    whether the trio is association or just three bestsellers (the
    lift question, at arity 3). Brand-level deliberately: partkey
    triples stop recurring once the catalog outgrows the basket
    (measured: 94 support-2 triples at sf0.001, 0 at sf0.1), while
    the brand dimension stays dense at every scale — choose the
    itemset grain by the dimension's density, not habit.

    Scale shape: enumeration is per-order (two self-joins on the
    order key with b1 < b2 < b3), so candidate volume is bounded by
    distinct-brands-per-basket choose 3 — baskets are <= 7 lines, 35
    triples max, and at any scale the basket bound (not the catalog)
    governs; classic a-priori pruning only matters when baskets are
    huge. The brand tag rides a broadcast dim join before the
    distinct. Support filter + deterministic top-20
    (TakeOrderedAndProject); solo counts are a |brands|-sized
    broadcast."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    items = (
        li.select("l_orderkey", "l_partkey")
        .join(F.broadcast(part.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("o"),
                F.col("p_brand").alias("b"))
        .distinct()
    )
    a = items.select("o", F.col("b").alias("b1"))
    bb = items.select("o", F.col("b").alias("b2"))
    c = items.select("o", F.col("b").alias("b3"))
    triples = (
        a.join(bb, "o").where(F.col("b1") < F.col("b2"))
        .join(c, "o").where(F.col("b2") < F.col("b3"))
        .groupBy("b1", "b2", "b3")
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= TRIPLE_MIN_SUPPORT)
    )
    solo = items.groupBy("b").agg(F.count("*").alias("n_solo"))
    for i in (1, 2, 3):
        triples = triples.join(
            F.broadcast(solo.select(
                F.col("b").alias(f"b{i}"),
                F.col("n_solo").alias(f"n{i}"),
            )),
            f"b{i}",
        )
    return (
        triples.select("b1", "b2", "b3", "n_orders", "n1", "n2", "n3")
        .orderBy(F.desc("n_orders"), "b1", "b2", "b3")
        .limit(TRIPLE_TOP_N)
    )


BRAND_TRIPLES_ORACLE = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, p_brand AS b
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    triples AS (
      SELECT a.b AS b1, x.b AS b2, c.b AS b3,
        CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM items a
      JOIN items x ON a.o = x.o AND a.b < x.b
      JOIN items c ON x.o = c.o AND x.b < c.b
      GROUP BY a.b, x.b, c.b
      HAVING COUNT(*) >= {TRIPLE_MIN_SUPPORT}
    ),
    solo AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS n_solo FROM items GROUP BY b
    )
    SELECT b1, b2, b3, n_orders,
      s1.n_solo AS n1, s2.n_solo AS n2, s3.n_solo AS n3
    FROM triples
    JOIN solo s1 ON b1 = s1.b
    JOIN solo s2 ON b2 = s2.b
    JOIN solo s3 ON b3 = s3.b
    ORDER BY n_orders DESC, b1, b2, b3
    LIMIT {TRIPLE_TOP_N}
"""


def order_line_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder proration: each order's HEADER total is
    allocated across its lineitems proportionally to line price, in
    integer cents, with the rounding shortfall distributed one cent at
    a time to the lines with the largest division remainders — so the
    per-order allocations sum to the header total EXACTLY (the invoice
    /ledger allocation rule; float proration never reconciles). On
    this corpus header totals are independent of line rollups (see
    order_reconciliation), which is precisely when proration is
    needed.

    All integer: base = total*line // sum_lines (products bounded well
    under BIGINT at any TPC-H SF: cents x cents of one order), the
    bump pick is (remainder DESC, line_seq). Line identity is an
    occurrence index per order — (l_orderkey, l_linenumber) is NOT
    unique in this testdata (NOTES.md r7). Every window is bounded by
    the order's own lines (<=7)."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    lines = li.select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long")
        .alias("line_cents"),
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
    )
    w_o = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "line_cents", "l_quantity"
    )
    ranked = lines.withColumn("line_seq", F.row_number().over(w_o))
    tot = ranked.groupBy("l_orderkey").agg(
        F.sum("line_cents").alias("sum_cents")
    )
    hdr = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long")
        .alias("total_cents"),
    )
    j = (
        ranked.join(tot, "l_orderkey")
        .join(hdr, ranked.l_orderkey == hdr.o_orderkey)
        .withColumn("base", F.expr("(total_cents * line_cents) DIV sum_cents"))
        .withColumn("frac", F.expr("(total_cents * line_cents) % sum_cents"))
    )
    w_sum = Window.partitionBy("l_orderkey")
    w_bump = Window.partitionBy("l_orderkey").orderBy(
        F.desc("frac"), F.asc("line_seq")
    )
    return (
        j.withColumn(
            "shortfall", F.col("total_cents") - F.sum("base").over(w_sum)
        )
        .withColumn("bump_rank", F.row_number().over(w_bump))
        .select(
            "l_orderkey",
            "line_seq",
            "line_cents",
            (
                F.col("base")
                + F.when(F.col("bump_rank") <= F.col("shortfall"), 1)
                .otherwise(0)
            ).alias("alloc_cents"),
        )
    )


PRORATION_ORACLE = """
    WITH lines AS (
      SELECT l_orderkey,
        CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS line_cents,
        ROW_NUMBER() OVER (PARTITION BY l_orderkey
          ORDER BY l_linenumber, l_partkey, l_suppkey,
            CAST(ROUND(l_extendedprice * 100) AS BIGINT), l_quantity)
          AS line_seq
      FROM lineitem
    ),
    tot AS (
      SELECT l_orderkey, CAST(SUM(line_cents) AS BIGINT) AS sum_cents
      FROM lines GROUP BY l_orderkey
    ),
    j AS (
      SELECT l.l_orderkey, l.line_seq, l.line_cents, t.sum_cents,
        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
      FROM lines l
      JOIN tot t USING (l_orderkey)
      JOIN orders ON l.l_orderkey = o_orderkey
    ),
    b AS (
      SELECT *,
        total_cents * line_cents // sum_cents AS base,
        (total_cents * line_cents) % sum_cents AS frac
      FROM j
    ),
    r AS (
      SELECT *,
        total_cents - SUM(base) OVER (PARTITION BY l_orderkey)
          AS shortfall,
        ROW_NUMBER() OVER (PARTITION BY l_orderkey
          ORDER BY frac DESC, line_seq) AS bump_rank
      FROM b
    )
    SELECT l_orderkey, CAST(line_seq AS INTEGER) AS line_seq, line_cents,
      CAST(base + CASE WHEN bump_rank <= shortfall THEN 1 ELSE 0 END
           AS BIGINT) AS alloc_cents
    FROM r
"""


def brand_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand audience-overlap matrix (set-similarity join): Jaccard of
    the distinct-customer sets of every brand pair, top-20 by overlap
    — 'which catalog brands share buyers' (the cross-sell/cannibal
    question). Pair enumeration is per CUSTOMER over that customer's
    distinct brand list, so fan-out is bounded by |brands|-choose-2
    (~300) per customer regardless of how many rows the customer has —
    never a brand x brand x fact blowup. Jaccard as integer ppm over
    |A∩B| / (|A|+|B|-|A∩B|); deterministic (jaccard DESC, brand pair)
    top-20 plans as TakeOrderedAndProject."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    part = load_table(spark, "part", sf_dir)
    cb = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("o_custkey").alias("cust"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    sizes = cb.groupBy("brand").agg(F.count("*").alias("n"))
    a = cb.alias("a")
    b = cb.alias("b")
    inter = (
        a.join(b, (F.col("a.cust") == F.col("b.cust"))
               & (F.col("a.brand") < F.col("b.brand")))
        .groupBy(F.col("a.brand").alias("brand_a"),
                 F.col("b.brand").alias("brand_b"))
        .agg(F.count("*").alias("n_both"))
    )
    sa = sizes.select(F.col("brand").alias("brand_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("brand").alias("brand_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .select(
            "brand_a", "brand_b", "n_a", "n_b", "n_both",
            F.expr("n_both * 1000000 DIV (n_a + n_b - n_both)")
            .alias("jaccard_ppm"),
        )
        .orderBy(F.desc("jaccard_ppm"), "brand_a", "brand_b")
        .limit(20)
    )


AUDIENCE_OVERLAP_ORACLE = """
    WITH cb AS (
      SELECT DISTINCT o_custkey AS cust, p_brand AS brand
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
    ),
    sizes AS (SELECT brand, COUNT(*) AS n FROM cb GROUP BY brand),
    inter AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_both
      FROM cb a JOIN cb b ON a.cust = b.cust AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )
    SELECT brand_a, brand_b,
      CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
      CAST(n_both AS BIGINT) AS n_both,
      CAST(n_both * 1000000 // (sa.n + sb.n - n_both) AS BIGINT)
        AS jaccard_ppm
    FROM inter
    JOIN sizes sa ON brand_a = sa.brand
    JOIN sizes sb ON brand_b = sb.brand
    ORDER BY jaccard_ppm DESC, brand_a, brand_b
    LIMIT 20
"""


RELATIONAL_EXT_QUERIES = {
    "order_line_proration": order_line_proration,
    "brand_audience_overlap": brand_audience_overlap,
    "segment_decayed_value": segment_decayed_value,
    "orderkey_gap_islands": orderkey_gap_islands,
    "brand_triples": brand_triples,
    "weighted_median_price": weighted_median_price,
    "part_abc_classification": part_abc_classification,
    "supplier_scorecard": supplier_scorecard,
    "nation_trade_balance": nation_trade_balance,
    "brand_return_rates": brand_return_rates,
    "discount_band_effect": discount_band_effect,
    "segment_order_gini": segment_order_gini,
    "segment_supplier_hhi": segment_supplier_hhi,
    "part_pair_lift": part_pair_lift,
    "revenue_cusum": revenue_cusum,
    "ab_experiment_report": ab_experiment_report,
    "kfold_assignment": kfold_assignment,
    "event_anomalies_mad": event_anomalies_mad,
    "orders_cube": orders_cube,
    "nation_account_setops": nation_account_setops,
    "order_value_median_mode": order_value_median_mode,
    "lineitem_metrics_unpivot": lineitem_metrics_unpivot,
    "part_revenue_pareto": part_revenue_pareto,
    "customer_rfm": customer_rfm,
    "order_value_trimmed_mean": order_value_trimmed_mean,
    "priority_status_chi2": priority_status_chi2,
    "segment_priority_pmi": segment_priority_pmi,
    "part_recommendations_topn": part_recommendations_topn,
    "orders_backlog_aging": orders_backlog_aging,
    "brand_price_dispersion": brand_price_dispersion,
}

RELATIONAL_EXT_ORACLES = {
    "order_line_proration": PRORATION_ORACLE,
    "brand_audience_overlap": AUDIENCE_OVERLAP_ORACLE,
    "segment_decayed_value": SEGMENT_DECAYED_ORACLE,
    "orderkey_gap_islands": GAP_ISLANDS_ORACLE,
    "brand_triples": BRAND_TRIPLES_ORACLE,
    "part_recommendations_topn": RECS_TOPN_ORACLE,
    "orders_backlog_aging": BACKLOG_AGING_ORACLE,
    "brand_price_dispersion": BRAND_DISPERSION_ORACLE,
    "part_pair_lift": """
        WITH items AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        ),
        n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM items),
        per_part AS (SELECT p, COUNT(*) AS n_p FROM items GROUP BY p),
        pairs AS (
          SELECT a.p, b.p AS q, COUNT(*) AS n_ab
          FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
          GROUP BY a.p, b.p HAVING COUNT(*) >= 3
        )
        SELECT pairs.p AS part_a, pairs.q AS part_b, n_ab,
          CAST(CAST(n_ab AS HUGEINT) * n_orders * 1000000
               // (CAST(na.n_p AS HUGEINT) * nb.n_p) AS BIGINT) AS lift_ppm
        FROM pairs
        JOIN per_part na ON pairs.p = na.p
        JOIN per_part nb ON pairs.q = nb.p
        CROSS JOIN n
        ORDER BY lift_ppm DESC, part_a, part_b
        LIMIT 20
    """,
    "segment_supplier_hhi": """
        WITH per_supp AS (
          SELECT c_mktsegment, l_suppkey,
            SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS cents
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment, l_suppkey
        )
        SELECT c_mktsegment,
          COUNT(*) AS n_suppliers,
          CAST(SUM(cents) AS BIGINT) / 100.0 AS revenue,
          CAST(SUM(CAST(cents AS HUGEINT) * cents) * 1000000
               // (CAST(SUM(cents) AS HUGEINT) * SUM(cents))
               AS BIGINT) AS hhi_ppm
        FROM per_supp GROUP BY c_mktsegment
    """,
    "segment_order_gini": """
        WITH d AS (
          SELECT c_mktsegment,
            CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
            o_orderkey
          FROM orders JOIN customer ON o_custkey = c_custkey
        ),
        ranked AS (
          SELECT c_mktsegment, cents,
            ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                               ORDER BY cents, o_orderkey) AS rn
          FROM d
        ),
        agg AS (
          SELECT c_mktsegment, COUNT(*) AS n_orders,
            CAST(SUM(cents) AS HUGEINT) AS sum_cents,
            SUM(CAST(rn AS HUGEINT) * cents) AS rank_weighted
          FROM ranked GROUP BY c_mktsegment
        )
        SELECT c_mktsegment, n_orders,
          CAST(sum_cents AS BIGINT) / 100.0 AS revenue,
          CAST(2 * rank_weighted * 1000000
               // (CAST(n_orders AS HUGEINT) * sum_cents)
               - (CAST(n_orders AS HUGEINT) + 1) * 1000000 // n_orders
               AS BIGINT) AS gini_ppm
        FROM agg
    """,
    "discount_band_effect": """
        WITH d AS (
          SELECT
            CASE WHEN CAST(ROUND(l_discount * 100) AS BIGINT) = 0 THEN '0%'
                 WHEN CAST(ROUND(l_discount * 100) AS BIGINT) <= 2 THEN '1-2%'
                 WHEN CAST(ROUND(l_discount * 100) AS BIGINT) <= 5 THEN '3-5%'
                 WHEN CAST(ROUND(l_discount * 100) AS BIGINT) <= 8 THEN '6-8%'
                 ELSE '9-10%' END AS band,
            CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS g,
            CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
              AS n,
            CAST(l_quantity AS BIGINT) AS qty
          FROM lineitem
        )
        SELECT band, COUNT(*) AS n_items,
          CAST(SUM(qty) AS BIGINT) AS units,
          CAST(SUM(g) AS BIGINT) / 100.0 AS gross_revenue,
          CAST(SUM(n) AS BIGINT) / 100.0 AS net_revenue,
          CAST(SUM(g) - SUM(n) AS BIGINT) / 100.0 AS discount_given
        FROM d GROUP BY band
    """,
    "brand_return_rates": """
        SELECT p_brand,
          COUNT(*) AS n_items,
          CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_returned,
          CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS return_share,
          CAST(SUM(CASE WHEN l_returnflag = 'R'
               THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               ELSE 0 END) AS BIGINT) / 100.0 AS returned_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "nation_trade_balance": """
        WITH demand AS (
          SELECT n_name AS nation,
            SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS demand_cents
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name
        ),
        supply AS (
          SELECT n_name AS nation,
            SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS supply_cents
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          GROUP BY n_name
        )
        SELECT COALESCE(d.nation, s.nation) AS nation,
          COALESCE(demand_cents, 0) / 100.0 AS demand,
          COALESCE(supply_cents, 0) / 100.0 AS supply,
          (COALESCE(supply_cents, 0) - COALESCE(demand_cents, 0)) / 100.0
            AS balance
        FROM demand d FULL OUTER JOIN supply s ON d.nation = s.nation
    """,
    "supplier_scorecard": """
        SELECT l_suppkey,
          COUNT(*) AS n_items,
          SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
              AS BIGINT)) / 100.0 AS revenue,
          CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
          CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS return_share,
          CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE),
                             CAST(l_shipdate AS DATE))) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS avg_lead_days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_suppkey
    """,
    "part_abc_classification": """
        WITH rev AS (
          SELECT l_partkey,
            SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS cents
          FROM lineitem GROUP BY l_partkey
        ),
        c AS (
          SELECT cents,
            SUM(cents) OVER (ORDER BY cents DESC, l_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents,
            (SELECT SUM(cents) FROM rev) AS total_cents
          FROM rev
        ),
        k AS (
          SELECT cents,
            CASE WHEN (cum_cents - cents) * 2 < total_cents THEN 'A'
                 WHEN (cum_cents - cents) * 10 < total_cents * 8 THEN 'B'
                 ELSE 'C' END AS abc_class
          FROM c
        )
        SELECT abc_class, COUNT(*) AS n_parts,
          SUM(cents) / 100.0 AS revenue
        FROM k GROUP BY abc_class
    """,
    "weighted_median_price": """
        WITH d AS (
          SELECT l_returnflag,
            CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
            CAST(l_quantity AS BIGINT) AS qty
          FROM lineitem
        ),
        ranked AS (
          SELECT l_returnflag, cents,
            SUM(qty) OVER (PARTITION BY l_returnflag ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_qty,
            SUM(qty) OVER (PARTITION BY l_returnflag) AS total_qty
          FROM d
        ),
        q AS (
          SELECT l_returnflag, cents, cum_qty,
                 CAST(total_qty AS BIGINT) AS total_qty
          FROM ranked WHERE cum_qty * 2 >= total_qty
        )
        SELECT l_returnflag, total_qty,
               cents / 100.0 AS weighted_median_price
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                       ORDER BY cents, cum_qty) AS rk
          FROM q
        ) WHERE rk = 1
    """,
    "revenue_cusum": """
        WITH daily AS (
          SELECT date_diff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS epoch_day,
            SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS day_cents
          FROM orders GROUP BY epoch_day
        ),
        d AS (
          SELECT epoch_day, day_cents,
            ROW_NUMBER() OVER (ORDER BY epoch_day) AS t,
            SUM(day_cents) OVER (ORDER BY epoch_day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
            COUNT(*) OVER () AS n_days,
            SUM(day_cents) OVER () AS total
          FROM daily
        ),
        c AS (
          SELECT epoch_day, day_cents,
            CAST(n_days * prefix - t * total AS BIGINT) AS scaled_cusum
          FROM d
        )
        SELECT CAST(epoch_day AS BIGINT) AS epoch_day,
          day_cents / 100.0 AS day_revenue,
          scaled_cusum,
          ROW_NUMBER() OVER (ORDER BY ABS(scaled_cusum) DESC, epoch_day)
            = 1 AS is_changepoint
        FROM c
    """,
    "ab_experiment_report": """
        WITH fv AS (
          SELECT user_id, MIN(ts) AS ft FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        per_user AS (
          SELECT
            ('0x' || substr(md5(CAST(e.user_id AS VARCHAR)), 1, 6))::BIGINT
              % 2 AS arm,
            MAX(CASE WHEN e.event_type = 'purchase' AND e.ts >= fv.ft
                      AND date_diff('microsecond', fv.ft, e.ts)
                          <= CAST(7200 AS BIGINT) * 1000000
                     THEN 1 ELSE 0 END) AS purchased
          FROM events e JOIN fv ON e.user_id = fv.user_id
          GROUP BY e.user_id
        ),
        arms AS (
          SELECT arm, COUNT(*) AS n, CAST(SUM(purchased) AS BIGINT) AS c
          FROM per_user GROUP BY arm
        ),
        w AS (
          SELECT
            COALESCE((SELECT n FROM arms WHERE arm = 0), 0) AS n0,
            COALESCE((SELECT c FROM arms WHERE arm = 0), 0) AS c0,
            COALESCE((SELECT n FROM arms WHERE arm = 1), 0) AS n1,
            COALESCE((SELECT c FROM arms WHERE arm = 1), 0) AS c1
        )
        SELECT n0, c0, n1, c1,
          CASE WHEN n0 = 0 THEN CAST(0 AS BIGINT)
               ELSE CAST(CAST(c0 AS HUGEINT) * 1000000 // n0 AS BIGINT)
          END AS conv0_ppm,
          CASE WHEN n1 = 0 THEN CAST(0 AS BIGINT)
               ELSE CAST(CAST(c1 AS HUGEINT) * 1000000 // n1 AS BIGINT)
          END AS conv1_ppm,
          CASE WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0
               OR n0 + n1 - c0 - c1 = 0
               THEN CAST(0 AS BIGINT)
               ELSE CAST((CAST(c0 AS HUGEINT) * n1 - CAST(c1 AS HUGEINT) * n0)
               * (CAST(c0 AS HUGEINT) * n1 - CAST(c1 AS HUGEINT) * n0)
               * (n0 + n1) * 1000000
               // (CAST(n0 AS HUGEINT) * n1 * (c0 + c1)
                   * (n0 + n1 - c0 - c1)) AS BIGINT) END AS z2_micro,
          CASE WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0
               OR n0 + n1 - c0 - c1 = 0
               THEN CAST(0 AS BIGINT)
               ELSE CAST((CAST(c0 AS HUGEINT) * n1 - CAST(c1 AS HUGEINT) * n0)
               * (CAST(c0 AS HUGEINT) * n1 - CAST(c1 AS HUGEINT) * n0)
               * (n0 + n1) * 1000000
               // (CAST(n0 AS HUGEINT) * n1 * (c0 + c1)
                   * (n0 + n1 - c0 - c1)) AS BIGINT) END > 3841459
            AS significant_05
        FROM w
    """,
    "kfold_assignment": """
        SELECT lang,
          ('0x' || substr(md5(text), 1, 6))::BIGINT % 5 AS fold,
          COUNT(*) AS n_docs
        FROM documents
        GROUP BY lang, fold
    """,
    "event_anomalies_mad": """
        WITH d AS (
          SELECT event_id, event_type,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events
        ),
        r1 AS (
          SELECT event_type, cents,
            ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM d
        ),
        med AS (
          SELECT event_type,
            CAST(CASE WHEN COUNT(*) = 1 THEN SUM(cents) * 2
                 ELSE SUM(cents) END AS BIGINT) AS med_x2
          FROM r1 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
          GROUP BY event_type
        ),
        dev AS (
          SELECT d.event_id, d.event_type, d.cents,
                 ABS(d.cents * 2 - med.med_x2) AS dev_x2
          FROM d JOIN med ON d.event_type = med.event_type
        ),
        r2 AS (
          SELECT event_type, dev_x2,
            ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev_x2) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM dev
        ),
        mad AS (
          SELECT event_type,
            CAST(CASE WHEN COUNT(*) = 1 THEN SUM(dev_x2) * 2
                 ELSE SUM(dev_x2) END AS BIGINT) AS mad_x4
          FROM r2 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
          GROUP BY event_type
        )
        SELECT dev.event_id, dev.event_type,
               dev.cents / 100.0 AS value,
               dev.dev_x2, mad.mad_x4
        FROM dev JOIN mad ON dev.event_type = mad.event_type
        WHERE dev.dev_x2 * 20000 > 22239 * mad.mad_x4
    """,
    "order_value_trimmed_mean": """
        WITH d AS (
          SELECT o_orderpriority,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        ranked AS (
          SELECT o_orderpriority, cents,
            ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY cents) AS rn,
            COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM d
        )
        SELECT o_orderpriority, MAX(n) AS n_orders,
          COUNT(*) AS n_kept,
          CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0
            AS trimmed_mean
        FROM ranked
        WHERE rn > n // 20 AND rn <= n - n // 20
        GROUP BY o_orderpriority
    """,
    "segment_priority_pmi": """
        WITH cell AS (
          SELECT c_mktsegment, o_orderpriority, COUNT(*) AS o
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment, o_orderpriority
        ),
        rt AS (
          SELECT c_mktsegment, SUM(o) AS rt FROM cell
          GROUP BY c_mktsegment
        ),
        ct AS (
          SELECT o_orderpriority, SUM(o) AS ct FROM cell
          GROUP BY o_orderpriority
        ),
        n AS (SELECT SUM(o) AS n FROM cell)
        SELECT c_mktsegment, o_orderpriority, o,
          CAST(round(ln(CAST(CAST(o AS HUGEINT) * n AS DOUBLE))
               * 1000000) AS BIGINT)
          - CAST(round(ln(CAST(CAST(rt AS HUGEINT) * ct AS DOUBLE))
               * 1000000) AS BIGINT) AS pmi_micro,
          CAST(CAST(o AS HUGEINT)
               * (CAST(round(ln(CAST(CAST(o AS HUGEINT) * n AS DOUBLE))
                    * 1000000) AS BIGINT)
                  - CAST(round(ln(CAST(CAST(rt AS HUGEINT) * ct
                    AS DOUBLE)) * 1000000) AS BIGINT))
               * 1000 // n AS BIGINT) AS mi_term_nano
        FROM cell
        JOIN rt USING (c_mktsegment)
        JOIN ct USING (o_orderpriority)
        CROSS JOIN n
    """,
    "priority_status_chi2": """
        WITH cell AS (
          SELECT o_orderpriority, o_orderstatus, COUNT(*) AS o
          FROM orders GROUP BY o_orderpriority, o_orderstatus
        ),
        rt AS (
          SELECT o_orderpriority, SUM(o) AS rt FROM cell
          GROUP BY o_orderpriority
        ),
        ct AS (
          SELECT o_orderstatus, SUM(o) AS ct FROM cell
          GROUP BY o_orderstatus
        ),
        n AS (SELECT SUM(o) AS n FROM cell)
        SELECT o_orderpriority, o_orderstatus, o,
          CAST(CAST(rt AS HUGEINT) * ct // n AS BIGINT) AS expected_floor,
          CAST((CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
               * (CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
               * 1000000 // (CAST(rt AS HUGEINT) * ct * n) AS BIGINT)
            AS term_ppm
        FROM cell
        JOIN rt USING (o_orderpriority)
        JOIN ct USING (o_orderstatus)
        CROSS JOIN n
    """,
    "part_revenue_pareto": """
        WITH rev AS (
          SELECT l_partkey,
            SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS cents
          FROM lineitem GROUP BY l_partkey
        ),
        ranked AS (
          SELECT l_partkey, cents,
            ROW_NUMBER() OVER (ORDER BY cents DESC, l_partkey) AS rank,
            SUM(cents) OVER (ORDER BY cents DESC, l_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents,
            (SELECT SUM(cents) FROM rev) AS total_cents
          FROM rev
        )
        SELECT l_partkey, CAST(rank AS BIGINT) AS rank,
          cents / 100.0 AS revenue,
          cum_cents / 100.0 AS cum_revenue,
          CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
            AS cum_share
        FROM ranked
        WHERE (cum_cents - cents) * 4 < total_cents
    """,
    "customer_rfm": """
        WITH per_cust AS (
          SELECT o_custkey,
            MAX(CAST(o_orderdate AS DATE)) AS last_day,
            COUNT(*) AS n_orders,
            SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
          FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey, last_day, n_orders,
          cents / 100.0 AS monetary,
          CAST(NTILE(5) OVER (ORDER BY last_day DESC, o_custkey) AS BIGINT)
            AS r_score,
          CAST(NTILE(5) OVER (ORDER BY n_orders DESC, o_custkey) AS BIGINT)
            AS f_score,
          CAST(NTILE(5) OVER (ORDER BY cents DESC, o_custkey) AS BIGINT)
            AS m_score
        FROM per_cust
    """,
    "orders_cube": """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
          ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
            AS revenue,
          CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
          CAST(GROUPING(o_orderstatus) AS INT) AS g_status
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    "nation_account_setops": """
        WITH cust_n AS (
          SELECT n_name FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name
          HAVING SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                 > 450000 * COUNT(*)
        ),
        supp_n AS (
          SELECT n_name FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          GROUP BY n_name
          HAVING SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT))
                 > 450000 * COUNT(*)
        )
        SELECT n_name, 'both' AS membership
          FROM (SELECT n_name FROM cust_n INTERSECT SELECT n_name FROM supp_n)
        UNION ALL
        SELECT n_name, 'customers_only' AS membership
          FROM (SELECT n_name FROM cust_n EXCEPT SELECT n_name FROM supp_n)
        UNION ALL
        SELECT n_name, 'suppliers_only' AS membership
          FROM (SELECT n_name FROM supp_n EXCEPT SELECT n_name FROM cust_n)
    """,
    "order_value_median_mode": """
        WITH d AS (
          SELECT o_orderpriority, o_orderstatus,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        ranked AS (
          SELECT o_orderpriority, cents,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY cents) AS rn,
                 COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM d
        ),
        med AS (
          SELECT o_orderpriority, MAX(n) AS n_orders,
                 CAST(CASE WHEN COUNT(*) = 1 THEN SUM(cents) * 2
                      ELSE SUM(cents) END AS BIGINT) AS median_x2_cents
          FROM ranked
          WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
          GROUP BY o_orderpriority
        ),
        cnt AS (
          SELECT o_orderpriority, o_orderstatus, COUNT(*) AS status_n
          FROM d GROUP BY o_orderpriority, o_orderstatus
        ),
        mode AS (
          SELECT o_orderpriority, o_orderstatus AS mode_status,
                 status_n AS mode_count
          FROM (
            SELECT *, ROW_NUMBER() OVER (
                     PARTITION BY o_orderpriority
                     ORDER BY status_n DESC, o_orderstatus ASC) AS rk
            FROM cnt
          ) WHERE rk = 1
        )
        SELECT med.o_orderpriority, n_orders, median_x2_cents,
               median_x2_cents / 200.0 AS median_value,
               mode_status, mode_count
        FROM med JOIN mode ON med.o_orderpriority = mode.o_orderpriority
    """,
    "lineitem_metrics_unpivot": """
        WITH agg AS (
          SELECT l_returnflag,
            SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0
              AS sum_qty,
            SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0
              AS sum_base_price,
            SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) / 100.0
              AS sum_discount,
            SUM(CAST(ROUND(l_tax * 100) AS BIGINT)) / 100.0 AS sum_tax
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
        UNION ALL
        SELECT l_returnflag, 'sum_base_price', sum_base_price FROM agg
        UNION ALL
        SELECT l_returnflag, 'sum_discount', sum_discount FROM agg
        UNION ALL
        SELECT l_returnflag, 'sum_tax', sum_tax FROM agg
    """,
}
