"""Analytics query surface.

Re-hosts the reference's 10 BigQuery analytics queries (reference
README.md §6) on the TPC-H-ish testdata with the same query *shapes*
(top-N frequency, filtered averages, distributions, scalar-subquery
comparison, bridge joins), plus core relational queries (TPC-H Q1/Q5
style, windows, rollups, anti-joins) that prove the engine at scale.

Every query is declarative DataFrame API → Catalyst gets full pushdown
and join planning; dimension sides are broadcast explicitly where the
optimizer may lack stats. Each Spark query has a DuckDB oracle with
IDENTICAL output column names; deterministic ORDER BY tiebreakers on
every LIMIT; doubles rounded so summation order can't flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table


def _money_sum(expr):
    """Order-independent currency sum: per-row exact integer cents →
    long sum (associative, exact) → back to dollars. Immune to the
    float-accumulation-order differences that flip ROUND(SUM(double))
    at a cent boundary between cluster sizes (or vs the oracle)."""
    return F.round(
        F.sum(F.round(expr * 100).cast("long")) / F.lit(100.0), 2
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# --- D suite: the reference's 10 analytics queries, re-hosted ---------------

def top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 — top-5 most frequent parts (reference README.md §6.1:
    top-5 most common ingredients)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_name")
        .agg(F.count("*").alias("frequency"))
        .orderBy(F.desc("frequency"), F.asc("p_name"))
        .limit(5)
    )


def avg_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 — global filtered average (reference §6.2: average prep time)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_totalprice") > 0)
        .agg(F.round(F.avg("o_totalprice"), 2).alias("avg_order_value"))
    )


def priority_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 — categorical distribution (reference §6.3: difficulty counts)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(F.count("*").alias("cnt"))


def returned_vs_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 — scalar-subquery comparison (reference §6.4: global vs liked
    avg prep time)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    glob = lineitem.agg(F.round(F.avg("l_extendedprice"), 2).alias("global_avg_price"))
    ret = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .agg(F.round(F.avg("l_extendedprice"), 2).alias("returned_avg_price"))
    )
    return glob.crossJoin(ret)


def top_open_order_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 — 3-way join + top-1 (reference §6.5: most viewed recipe)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .filter(F.col("o_orderstatus") == "O")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_name")
        .agg(F.count("*").alias("order_lines"))
        .orderBy(F.desc("order_lines"), F.asc("p_name"))
        .limit(1)
    )


def parts_in_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 — bridge join under a fact filter (reference §6.6: ingredients
    in liked recipes)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part")
    return (
        lineitem.join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_name")
        .agg(F.count("*").alias("urgent_lines"))
        .orderBy(F.desc("urgent_lines"), F.asc("p_name"))
        .limit(5)
    )


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 — most active users (reference §6.7)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_name")
        .agg(F.count("*").alias("actions"))
        .orderBy(F.desc("actions"), F.asc("c_name"))
        .limit(3)
    )


def order_most_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 — max per-group count (reference §6.8: most complex recipe)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy(F.col("l_orderkey").alias("order_id"))
        .agg(F.count("*").alias("n_lines"))
        .orderBy(F.desc("n_lines"), F.asc("order_id"))
        .limit(1)
    )


def avg_lineitems_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 — average of per-group counts (reference §6.9: avg ingredient
    count per recipe)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    per_order = lineitem.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    return per_order.agg(F.round(F.avg("cnt"), 4).alias("avg_lineitems"))


def orders_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D10 — join distribution (reference §6.10: views by difficulty)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("order_count"))
    )


# --- E suite: core relational engine --------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 — TPC-H Q1 pricing summary (flagship): single wide scan →
    map-side partial agg → tiny shuffle; the shape every 100 TB rollup
    takes. All arithmetic stays in whole-stage codegen."""
    lineitem = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _money_sum(disc_price).alias("sum_disc_price"),
            _money_sum(charge).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 — TPC-H Q5 shape: 6-way join, dims broadcast, one shuffle on
    the fact keys; revenue by nation for one region and year."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            ),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(customer), F.col("o_custkey") == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == supplier.s_suppkey)
            & (F.col("c_nationkey") == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == region.r_regionkey,
        )
        .groupBy("n_name")
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 — TPC-H Q3 shape: segment-filtered 3-way join, revenue
    top-10. Filters sit on each scan (pushdown), customer broadcasts."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-06-01").cast("timestamp_ntz")
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == customer.c_custkey,
        )
        .groupBy(
            F.col("l_orderkey").alias("order_id"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("order_id"))
        .limit(10)
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 — TPC-H Q6 shape: pure scan-filter-aggregate; every predicate
    must reach the parquet reader (PushedFilters)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money_sum(F.col("l_extendedprice") * F.col("l_discount"))
            .alias("revenue")
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 — TPC-H Q10 shape: who returned the most value in a quarter."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    nation = _t(spark, sf_dir, "nation")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
            ),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(customer), F.col("o_custkey") == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


def q4_priority_with_big_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-suite, TPC-H Q4 shape: EXISTS semi-join — order counts by
    priority for orders containing at least one high-quantity line.
    LEFT SEMI keeps the fact table un-duplicated (no fan-out, no
    distinct needed)."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    big = lineitem.filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — revenue by (supplier
    nation, customer nation, year) for one nation pair, both
    directions."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rev_pair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == customer.c_custkey)
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair | rev_pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio — share of revenue
    from one part-type family in one month, as a percentage."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    promo = F.when(F.col("p_type") == "ECONOMY", rev_cents).otherwise(0)
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-06-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(promo) * 100.0 / F.sum(rev_cents), 6
            ).alias("promo_revenue_pct")
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9 — TPC-H Q18 shape: join against an aggregated-and-filtered
    subquery (HAVING). The inner agg shrinks the fact table before the
    join, so the join input is tiny at any scale."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    # filter on the UNROUNDED sum (matching the oracle's HAVING) and
    # round only in the projection — rounding before the threshold
    # would flip groups at the 150 boundary
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_raw_qty"))
        .filter(F.col("_raw_qty") > 150)
        .select("l_orderkey", F.round(F.col("_raw_qty"), 2).alias("total_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == customer.c_custkey)
        .select(
            F.col("c_name").alias("name"),
            F.col("l_orderkey").alias("order_id"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").alias("total"),
            "total_qty",
        )
        .orderBy(F.desc("total"), F.asc("order_id"))
        .limit(20)
    )


def part_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 — window function: top-3 parts by revenue within each brand.
    row_number over rounded revenue with name tiebreak → deterministic."""
    from pyspark.sql.window import Window

    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    base = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_name")
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_name"))
    return (
        base.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )


def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 — time rollup: revenue and order count by calendar month."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            _money_sum(F.col("o_totalprice")).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 — anti-join: customers with no URGENT order."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way join, national market share of one nation
    inside one region's ECONOMY-part market by order year. Every
    dimension side broadcasts; the only shuffle is the year groupBy.
    Ratio of two conditional money sums (integer-cents exact)."""
    part = _t(spark, sf_dir, "part")
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    n1 = nation.alias("n1")   # customer nation → region filter
    n2 = nation.alias("n2")   # supplier nation → market-share target
    vol_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    base = (
        lineitem
        .join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
              F.col("l_partkey") == part.p_partkey)
        .join(orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        ), F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == customer.c_custkey)
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              F.col("n1.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
    )
    return (
        base.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("n2.n_name") == "NATION_3", vol_cents)
                  .otherwise(F.lit(0))).alias("_nat"),
            F.sum(vol_cents).alias("_all"),
        )
        .select(
            "o_year",
            F.round(F.col("_nat") / F.col("_all"), 6).alias("mkt_share"),
        )
    )


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table, so profit =
    revenue without supply cost): PROMO-part profit per supplier
    nation per order year. Part/supplier/nation broadcast; one shuffle
    on the groupBy keys."""
    part = _t(spark, sf_dir, "part")
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        lineitem
        .join(F.broadcast(part.filter(F.col("p_type") == "PROMO")),
              F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_profit")
        )
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT join customer→orders, two-phase
    aggregation (orders per customer, then customers per order-count).
    The left join keeps zero-order customers — the bucket the inner
    join silently drops."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            customer.c_custkey == orders.o_custkey, "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view over a quarter, then the
    supplier(s) hitting the MAX — scalar-subquery compare on exact
    integer cents (1×1 cross join, the cleared combine shape)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        * 100).cast("long")
            ).alias("_cents")
        )
    )
    top = revenue.agg(F.max("_cents").alias("_max"))
    return (
        revenue.crossJoin(top)
        .filter(F.col("_cents") == F.col("_max"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.round(F.col("_cents") / F.lit(100.0), 2).alias("total_revenue"),
        )
    )


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (container → brand+size filter; this schema has
    no p_container): yearly revenue lost to small-quantity orders of
    one brand's small parts. The per-part average is a second
    aggregate over the SAME semi-joined lineitem subset; the
    threshold compare is cross-multiplied (qty·5·cnt < sum_qty) so no
    float division can flip a boundary row."""
    part = _t(spark, sf_dir, "part")
    lineitem = _t(spark, sf_dir, "lineitem")
    target = part.filter(
        (F.col("p_brand") == "Brand#11") & (F.col("p_size") < 10)
    ).select("p_partkey")
    li = lineitem.join(
        F.broadcast(target), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("_sum_qty"),
        F.count("*").alias("_cnt"),
    ).withColumnRenamed("l_partkey", "_pk")
    small = li.join(per_part, F.col("l_partkey") == F.col("_pk")).filter(
        F.col("l_quantity") * 5 * F.col("_cnt") < F.col("_sum_qty")
    )
    return small.agg(
        F.round(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            / F.lit(100.0) / F.lit(7.0), 2
        ).alias("avg_yearly")
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a DISJUNCTION of conjunctive
    brand/size/quantity ranges (container/shipinstruct columns absent
    here). Catalyst pushes the common join key and per-branch
    predicates; one broadcast join, one aggregate."""
    part = _t(spark, sf_dir, "part")
    lineitem = _t(spark, sf_dir, "lineitem")
    joined = lineitem.join(
        F.broadcast(part), F.col("l_partkey") == part.p_partkey
    )
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#13") & (F.col("p_size").between(1, 10))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#14") & (F.col("p_size").between(1, 15))
           & (F.col("l_quantity").between(20, 30)))
    )
    return joined.filter(cond).agg(
        _money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue")
    )


def q21_returned_alone_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: no commit/receipt dates, so the
    "failed the order" marker is l_returnflag = 'R'): suppliers whose
    returned lineitem is the ONLY return in a multi-supplier finished
    order. The EXISTS/NOT-EXISTS pair becomes one per-order aggregate
    (distinct suppliers, distinct returning suppliers) joined back —
    no correlated re-scans of the fact table."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    li = lineitem.join(
        orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"), "left_semi",
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("_n_supp_r"),
    )
    returners = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    blamed = returners.join(
        per_order.filter(
            (F.col("_n_supp") > 1) & (F.col("_n_supp_r") == 1)
        ).select("l_orderkey"),
        "l_orderkey", "left_semi",
    )
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select(F.col("s_name").alias("name"), "numwait")
        .orderBy(F.desc("numwait"), F.asc("name"))
        .limit(20)
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (no c_phone → group by nation directly):
    well-funded customers who never ordered, counted per nation.
    Scalar average via exact integer cents (cross-multiplied compare),
    anti join against orders, nation broadcast."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    bal_cents = F.round(F.col("c_acctbal") * 100).cast("long")
    avg_pos = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal_cents).alias("_sum_c"), F.count("*").alias("_n_c")
    )
    return (
        customer.crossJoin(avg_pos)
        .filter(bal_cents * F.col("_n_c") > F.col("_sum_c"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            _money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no l_shipmode/commit/receipt dates in this
    schema, so the mode dimension is l_linestatus and the date window
    is on l_shipdate): per line status, count of high-priority vs
    low-priority orders shipped in one year. One broadcast-free join
    (orders side is the probe), conditional counts — a single shuffle
    on the 2-value groupBy key, map-side combined."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("linestatus")
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (no partsupp table — the part↔supplier bridge
    is the distinct (l_partkey, l_suppkey) pairs observed in lineitem;
    no 'complaints' text — the excluded-supplier analog is
    s_acctbal < 1000): distinct supplier count per (brand, type, size)
    for non-ECONOMY parts outside Brand#11, excluding flagged
    suppliers. The NOT-IN becomes a broadcast left_anti join (the
    flagged-supplier set is tiny at any scale); part broadcasts; the
    distinct + count-distinct shuffle on the group keys."""
    part = _t(spark, sf_dir, "part")
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    flagged = supplier.filter(F.col("s_acctbal") < 1000).select("s_suppkey")
    target = part.filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bridge = lineitem.select("l_partkey", "l_suppkey").distinct()
    return (
        bridge.join(F.broadcast(flagged),
                    F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(target), F.col("l_partkey") == target.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "brand", "type", "size")
    )


def q11_analog_supply_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape re-hosted WITHOUT partsupp (the declared
    schema gap): 'important stock' per nation = parts whose supply
    value inside a nation exceeds 1/1000 of that nation's total,
    with value derived from the nation's suppliers' lineitem revenue
    instead of ps_supplycost * ps_availqty — same GROUP BY + HAVING
    share-of-scalar-subquery skeleton, same output shape.

    Exact integers: revenue cents, the HAVING cut as the
    cross-multiplied predicate value*1000 > nation_total (no float at
    the boundary), share_ppm a truncating DIV. Plan: nation (fixed 25
    rows) is hint-broadcast; supplier grows LINEARLY with scale
    factor, so its join strategy is left to the planner/AQE —
    broadcast at report SFs, shuffle join when a 100 TB supplier
    outgrows the threshold (the r9 ADVICE fix: a forced broadcast
    hint contradicted the entry's stated scale claim). Then one
    (nation, part) shuffle and a 25-row national total broadcast
    back — Q11's correlated scalar subquery decorrelates to exactly
    this."""
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        lineitem.join(
            supplier,
            F.col("l_suppkey") == supplier.s_suppkey,
        )
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation.n_nationkey,
        )
        .select(
            "n_name",
            "l_partkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long").alias("cents"),
        )
    )
    per = rev.groupBy("n_name", "l_partkey").agg(
        F.sum("cents").alias("value_cents")
    )
    tot = per.groupBy("n_name").agg(
        F.sum("value_cents").alias("nation_cents")
    )
    return (
        per.join(F.broadcast(tot), "n_name")
        .where(
            F.expr(
                "CAST(value_cents AS DECIMAL(38,0)) * 1000 > nation_cents"
            )
        )
        .select(
            "n_name",
            "l_partkey",
            "value_cents",
            F.expr(
                "CAST(CAST(value_cents AS DECIMAL(38,0)) * 1000000"
                " DIV nation_cents AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


Q11_ANALOG_ORACLE = """
    WITH rev AS (
      SELECT n.n_name, l.l_partkey,
        CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
             AS BIGINT) AS cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
    ),
    per AS (
      SELECT n_name, l_partkey,
             CAST(SUM(cents) AS BIGINT) AS value_cents
      FROM rev GROUP BY n_name, l_partkey
    ),
    tot AS (
      SELECT n_name, CAST(SUM(value_cents) AS BIGINT) AS nation_cents
      FROM per GROUP BY n_name
    )
    SELECT per.n_name, l_partkey, value_cents,
      CAST(CAST(value_cents AS HUGEINT) * 1000000 // nation_cents
           AS BIGINT) AS share_ppm
    FROM per JOIN tot ON per.n_name = tot.n_name
    WHERE CAST(value_cents AS HUGEINT) * 1000 > nation_cents
"""


def q2_analog_min_cost_supplier(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape re-hosted WITHOUT partsupp (the last declared
    schema-gap shape after r9's q11 analog): cheapest supplier per
    qualifying part within one region — Q2's correlated MIN subquery
    over ps_supplycost, with realized unit cost from lineitem
    (Σ extendedprice / Σ quantity per (part, supplier)) standing in
    for the missing ps_supplycost. Same skeleton: part filter
    (type + size), region-restricted supplier set, per-part argmin,
    dim columns of the winner.

    Exactness: unit cost as an exact integer — decicents per unit,
    (Σ cents · 10) DIV Σ qty in DECIMAL — ties broken on s_suppkey.
    Scale: the per-part argmin is an associative min(struct(...))
    AGGREGATION, not a window — a part shipped by every supplier
    still reduces map-side (the dedup_keep_best discipline); nation/
    region are fixed-size broadcast hints, supplier/part joins stay
    planner-chosen (the q11 lesson: both grow with SF)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    pk = part.where(
        (F.col("p_type") == "PROMO") & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_name")
    geo = (
        supplier.join(
            F.broadcast(nation),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == region.r_regionkey,
        )
        .where(F.col("r_name") == "AFRICA")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        lineitem.join(pk, F.col("l_partkey") == pk.p_partkey)
        .join(geo, F.col("l_suppkey") == geo.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("cents"),
            F.sum(F.round("l_quantity").cast("long")).alias("qty"),
        )
        .select(
            "l_partkey", "l_suppkey",
            F.expr(
                "CAST(CAST(cents AS DECIMAL(38,0)) * 10 DIV qty"
                " AS BIGINT)"
            ).alias("cost_decicents"),
        )
    )
    best = cost.groupBy("l_partkey").agg(
        F.min(F.struct("cost_decicents", "l_suppkey")).alias("b")
    ).select(
        F.col("l_partkey").alias("p_partkey"),
        F.col("b.cost_decicents").alias("cost_decicents"),
        F.col("b.l_suppkey").alias("s_suppkey"),
    )
    return (
        best.join(pk, "p_partkey")
        .join(geo, "s_suppkey")
        .select(
            "p_partkey", "p_name", "cost_decicents",
            "s_suppkey", "s_name",
            "s_acctbal",  # raw parquet double: bit-identical both engines
            "n_name",
        )
    )


Q2_ANALOG_ORACLE = """
    WITH pk AS (
      SELECT p_partkey, p_name FROM part
      WHERE p_type = 'PROMO' AND p_size <= 15
    ),
    geo AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'AFRICA'
    ),
    cost AS (
      SELECT l_partkey, l_suppkey,
        CAST(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
             AS HUGEINT) * 10
             // SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
          AS cost_decicents
      FROM lineitem
      JOIN pk ON p_partkey = l_partkey
      JOIN geo ON s_suppkey = l_suppkey
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey AS p_partkey, cost_decicents,
             l_suppkey AS s_suppkey
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY l_partkey ORDER BY cost_decicents, l_suppkey
        ) AS rn FROM cost
      ) WHERE rn = 1
    )
    SELECT p_partkey, p_name, cost_decicents, s_suppkey, s_name,
      s_acctbal, n_name
    FROM best JOIN pk USING (p_partkey) JOIN geo USING (s_suppkey)
"""


def q20_analog_dominant_shippers(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape re-hosted WITHOUT partsupp: suppliers holding
    a dominant position in a name-filtered part family over one year
    — Q20's 'availqty > half the year's shipments' excess-stock
    predicate, with realized shipment share standing in for
    ps_availqty: a supplier DOMINATES a part when its 1996 shipped
    quantity exceeds half the part's total across all suppliers.
    Same skeleton: LIKE-prefixed part semi-join, per-(part, supplier)
    year aggregate, correlated per-part total, the half-share cut as
    the cross-multiplied integer predicate qty·2 > total (no float),
    then the supplier rollup with dim names.

    Scale: two shuffles ((part, supplier) agg, then per-part totals
    re-joined on the already-reduced frame), planner-chosen fact
    joins, nation broadcast-hinted (fixed 25 rows)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    pk = part.where(F.col("p_name").like("small%")).select("p_partkey")
    q = (
        lineitem.where(
            (F.col("l_shipdate")
             >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate")
               < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(pk, F.col("l_partkey") == pk.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("qty"))
    )
    tot = q.groupBy("l_partkey").agg(F.sum("qty").alias("part_total"))
    dom = q.join(tot, "l_partkey").where(
        F.col("qty") * 2 > F.col("part_total")
    )
    return (
        dom.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_dominant_parts"),
            F.sum("qty").alias("qty_dominated"),
        )
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation.n_nationkey,
        )
        .select(
            "s_suppkey", "s_name", "n_name",
            "n_dominant_parts", "qty_dominated",
        )
    )


Q20_ANALOG_ORACLE = """
    WITH pk AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ),
    q AS (
      SELECT l_partkey, l_suppkey,
        CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem JOIN pk ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
      SELECT l_partkey, SUM(qty) AS part_total FROM q GROUP BY 1
    ),
    dom AS (
      SELECT q.* FROM q JOIN tot USING (l_partkey)
      WHERE qty * 2 > part_total
    )
    SELECT s_suppkey, s_name, n_name,
      CAST(COUNT(*) AS BIGINT) AS n_dominant_parts,
      CAST(SUM(qty) AS BIGINT) AS qty_dominated
    FROM dom
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    GROUP BY s_suppkey, s_name, n_name
"""


ANALYTICS_QUERIES = {
    "q2_analog_min_cost_supplier": q2_analog_min_cost_supplier,
    "q20_analog_dominant_shippers": q20_analog_dominant_shippers,
    "q11_analog_supply_share": q11_analog_supply_share,
    "top_parts": top_parts,
    "avg_order_value": avg_order_value,
    "priority_distribution": priority_distribution,
    "returned_vs_global": returned_vs_global,
    "top_open_order_part": top_open_order_part,
    "parts_in_urgent_orders": parts_in_urgent_orders,
    "top_customers": top_customers,
    "order_most_lineitems": order_most_lineitems,
    "avg_lineitems_per_order": avg_lineitems_per_order,
    "orders_by_segment": orders_by_segment,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q18_large_orders": q18_large_orders,
    "q4_priority_with_big_items": q4_priority_with_big_items,
    "q7_volume_shipping": q7_volume_shipping,
    "q14_promo_effect": q14_promo_effect,
    "part_revenue_rank": part_revenue_rank,
    "monthly_revenue": monthly_revenue,
    "customers_without_urgent_orders": customers_without_urgent_orders,
    "q8_market_share": q8_market_share,
    "q9_profit_by_nation_year": q9_profit_by_nation_year,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q21_returned_alone_suppliers": q21_returned_alone_suppliers,
    "q22_idle_customers": q22_idle_customers,
    "q12_priority_by_linestatus": q12_priority_by_linestatus,
    "q16_supplier_part_counts": q16_supplier_part_counts,
}

ANALYTICS_ORACLES = {
    "q2_analog_min_cost_supplier": Q2_ANALOG_ORACLE,
    "q20_analog_dominant_shippers": Q20_ANALOG_ORACLE,
    "q11_analog_supply_share": Q11_ANALOG_ORACLE,
    "top_parts": """
        SELECT p_name, COUNT(*) AS frequency
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_name ORDER BY frequency DESC, p_name LIMIT 5
    """,
    "avg_order_value": """
        SELECT ROUND(AVG(o_totalprice), 2) AS avg_order_value
        FROM orders WHERE o_totalprice > 0
    """,
    "priority_distribution": """
        SELECT o_orderpriority, COUNT(*) AS cnt FROM orders GROUP BY o_orderpriority
    """,
    "returned_vs_global": """
        SELECT
          (SELECT ROUND(AVG(l_extendedprice), 2) FROM lineitem) AS global_avg_price,
          (SELECT ROUND(AVG(l_extendedprice), 2) FROM lineitem
            WHERE l_returnflag = 'R') AS returned_avg_price
    """,
    "top_open_order_part": """
        SELECT p_name, COUNT(*) AS order_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE o_orderstatus = 'O'
        GROUP BY p_name ORDER BY order_lines DESC, p_name LIMIT 1
    """,
    "parts_in_urgent_orders": """
        SELECT p_name, COUNT(*) AS urgent_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY p_name ORDER BY urgent_lines DESC, p_name LIMIT 5
    """,
    "top_customers": """
        SELECT c_name, COUNT(*) AS actions
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_name ORDER BY actions DESC, c_name LIMIT 3
    """,
    "order_most_lineitems": """
        SELECT l_orderkey AS order_id, COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
        ORDER BY n_lines DESC, order_id LIMIT 1
    """,
    "avg_lineitems_per_order": """
        SELECT ROUND(AVG(cnt), 4) AS avg_lineitems FROM (
          SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey
        )
    """,
    "orders_by_segment": """
        SELECT c_mktsegment, COUNT(*) AS order_count
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
          ROUND(SUM(l_quantity), 2) AS sum_qty,
          ROUND(SUM(CAST(ROUND((l_extendedprice) * 100) AS BIGINT)) / 100.0, 2) AS sum_base_price,
          ROUND(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100.0, 2) AS sum_disc_price,
          ROUND(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100) AS BIGINT)) / 100.0, 2) AS sum_charge,
          ROUND(AVG(l_quantity), 4) AS avg_qty,
          ROUND(AVG(l_extendedprice), 4) AS avg_price,
          ROUND(AVG(l_discount), 6) AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey AS order_id,
          strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
          o_orderpriority AS priority,
          ROUND(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100.0, 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, order_id LIMIT 10
    """,
    "q6_forecast_revenue": """
        SELECT ROUND(SUM(CAST(ROUND((l_extendedprice * l_discount) * 100) AS BIGINT)) / 100.0, 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q10_returned_items": """
        SELECT c_custkey AS custkey, c_name AS name, n_name AS nation,
          ROUND(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100.0, 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, custkey LIMIT 20
    """,
    "q5_local_supplier_volume": """
        SELECT n_name,
          ROUND(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100.0, 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
    "q4_priority_with_big_items": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_quantity > 45
        )
        GROUP BY o_orderpriority
    """,
    "q7_volume_shipping": """
        SELECT supp_nation, cust_nation, order_year,
          ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) / 100.0, 2) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
            CAST(year(o_orderdate) AS BIGINT) AS order_year,
            l_extendedprice, l_discount
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        )
        GROUP BY supp_nation, cust_nation, order_year
    """,
    "q14_promo_effect": """
        SELECT ROUND(
          SUM(CASE WHEN p_type = 'ECONOMY'
              THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                   AS BIGINT) ELSE 0 END) * 100.0
          / SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)), 6) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
    """,
    "q18_large_orders": """
        SELECT c_name AS name, l_orderkey AS order_id,
          strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
          o_totalprice AS total, total_qty
        FROM (
          SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
          FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
        )
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total DESC, order_id LIMIT 20
    """,
    "part_revenue_rank": """
        SELECT p_brand, p_name, revenue, rnk FROM (
          SELECT p_brand, p_name, revenue,
            ROW_NUMBER() OVER (
              PARTITION BY p_brand ORDER BY revenue DESC, p_name
            ) AS rnk
          FROM (
            SELECT p_brand, p_name,
              ROUND(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100.0, 2) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand, p_name
          )
        ) WHERE rnk <= 3
    """,
    "monthly_revenue": """
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
          ROUND(SUM(CAST(ROUND((o_totalprice) * 100) AS BIGINT)) / 100.0, 2) AS revenue,
          COUNT(*) AS n_orders
        FROM orders GROUP BY month
    """,
    "customers_without_urgent_orders": """
        SELECT c_custkey AS custkey, c_name AS name
        FROM customer
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
    """,
    "q8_market_share": """
        SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
          ROUND(
            SUM(CASE WHEN n2.n_name = 'NATION_3'
                THEN CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
                ELSE 0 END)
            * 1.0 /
            SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)),
            6) AS mkt_share
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_year
    """,
    "q9_profit_by_nation_year": """
        SELECT n_name AS nation,
          EXTRACT(YEAR FROM o_orderdate) AS o_year,
          ROUND(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100.0, 2)
            AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    """,
    "q13_order_count_distribution": """
        SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        ) GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q15_top_supplier": """
        WITH revenue AS (
          SELECT l_suppkey,
            SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT))
              AS cents
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey AS suppkey, s_name AS name,
          ROUND(cents / 100.0, 2) AS total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE cents = (SELECT MAX(cents) FROM revenue)
    """,
    "q17_small_qty_revenue": """
        WITH target AS (
          SELECT p_partkey FROM part
          WHERE p_brand = 'Brand#11' AND p_size < 10
        ),
        li AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN target ON l_partkey = p_partkey
        ),
        per_part AS (
          SELECT l_partkey AS pk, SUM(l_quantity) AS sum_qty,
                 COUNT(*) AS cnt
          FROM li GROUP BY l_partkey
        )
        SELECT ROUND(
          SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0, 2
        ) AS avg_yearly
        FROM li JOIN per_part ON l_partkey = pk
        WHERE l_quantity * 5 * cnt < sum_qty
    """,
    "q19_disjunctive_revenue": """
        SELECT
          ROUND(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100.0, 2)
            AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q21_returned_alone_suppliers": """
        WITH li AS (
          SELECT l_orderkey, l_suppkey, l_returnflag
          FROM lineitem
          WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
          )
        ),
        per_order AS (
          SELECT l_orderkey,
            COUNT(DISTINCT l_suppkey) AS n_supp,
            COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                THEN l_suppkey END) AS n_supp_r
          FROM li GROUP BY l_orderkey
        ),
        blamed AS (
          SELECT DISTINCT r.l_orderkey, r.l_suppkey
          FROM li r
          WHERE r.l_returnflag = 'R'
            AND r.l_orderkey IN (
              SELECT l_orderkey FROM per_order
              WHERE n_supp > 1 AND n_supp_r = 1
            )
        )
        SELECT s_name AS name, COUNT(*) AS numwait
        FROM blamed JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
        ORDER BY numwait DESC, name
        LIMIT 20
    """,
    "q22_idle_customers": """
        WITH avg_pos AS (
          SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sum_c,
                 COUNT(*) AS n_c
          FROM customer WHERE c_acctbal > 0
        )
        SELECT n_name AS nation, COUNT(*) AS numcust,
          ROUND(SUM(CAST(ROUND((c_acctbal) * 100) AS BIGINT)) / 100.0, 2)
            AS totacctbal
        FROM customer CROSS JOIN avg_pos
        JOIN nation ON c_nationkey = n_nationkey
        WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * n_c > sum_c
          AND c_custkey NOT IN (SELECT o_custkey FROM orders)
        GROUP BY 1
    """,
    "q12_priority_by_linestatus": """
        SELECT l_linestatus AS linestatus,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_linestatus
        ORDER BY linestatus
    """,
    "q16_supplier_part_counts": """
        SELECT p_brand AS brand, p_type AS type, p_size AS size,
          COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#11'
          AND p_type <> 'ECONOMY'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
          )
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, brand, type, size
    """,
}
