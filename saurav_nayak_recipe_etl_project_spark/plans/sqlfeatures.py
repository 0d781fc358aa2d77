"""Modern SQL-surface queries: LATERAL correlated subqueries and
recursive CTEs, run through `spark.sql` so Catalyst's decorrelation
and recursion execution are exercised as USER-FACING SQL — the same
text a BigQuery-console user of the reference would write, not a
DataFrame re-encoding. The oracle side runs (near-)identical SQL in
DuckDB, so the feature semantics themselves are cross-checked.

Scale notes:
- LATERAL per-group top-1 decorrelates into a join + per-key limit —
  Catalyst rewrites the correlated subquery; no per-row re-execution.
- The recursive CTE is DEPTH-BOUNDED (depth < 3 guard, DISTINCT per
  iteration): each step is one distributed join + dedup over the
  support-pruned co-purchase edge list. Spark 4 recursion only
  supports UNION ALL, so unbounded reachability would not terminate
  on a cyclic graph — the bounded form is the correct SQL-surface
  citizen; the unbounded answer at 100 TB is the O(log²n)
  star-contraction CC (operators/dedup.py), not recursion.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from saurav_nayak_recipe_etl_project_spark.operators.graph import (
    TRI_MIN_SUPPORT,
)
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table


def _view(spark: SparkSession, name: str, sf_dir: str) -> str:
    """Register `name` from sf_dir as a temp view tagged by the dir
    (so two sf_dirs in one session can't poison each other) and return
    the view name."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    vname = f"{name}_{tag}"
    load_table(spark, name, sf_dir).createOrReplaceTempView(vname)
    return vname


def customer_latest_order_lateral(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Top-10 customers with their LATEST order via a LATERAL
    correlated subquery (ORDER BY ... LIMIT 1 per outer row) — the
    'for each X give me its best Y' idiom SQL users reach for before
    they learn window functions. Catalyst decorrelates it into a
    join + group-limit; the DataFrame twin is topk_parts_per_brand's
    window form."""
    orders = _view(spark, "orders", sf_dir)
    return spark.sql(f"""
        WITH top_cust AS (
          SELECT o_custkey, COUNT(*) AS n_orders
          FROM {orders} GROUP BY o_custkey
          ORDER BY n_orders DESC, o_custkey LIMIT 10
        )
        SELECT c.o_custkey AS custkey, c.n_orders,
               t.last_date, t.last_total
        FROM top_cust c,
        LATERAL (
          SELECT CAST(o.o_orderdate AS DATE) AS last_date,
                 o.o_totalprice AS last_total
          FROM {orders} o WHERE o.o_custkey = c.o_custkey
          ORDER BY CAST(o.o_orderdate AS DATE) DESC, o.o_orderkey DESC
          LIMIT 1
        ) t
    """)


LATERAL_LATEST_ORACLE = """
    WITH top_cust AS (
      SELECT o_custkey, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
      ORDER BY n_orders DESC, o_custkey LIMIT 10
    )
    SELECT c.o_custkey AS custkey, c.n_orders,
           t.last_date, t.last_total
    FROM top_cust c,
    LATERAL (
      SELECT CAST(o.o_orderdate AS DATE) AS last_date,
             o.o_totalprice AS last_total
      FROM orders o WHERE o.o_custkey = c.o_custkey
      ORDER BY CAST(o.o_orderdate AS DATE) DESC, o.o_orderkey DESC
      LIMIT 1
    ) t
"""


REACH_DEPTH = 3


def copurchase_reach3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth transitive reachability over the support-pruned
    co-purchase graph via a RECURSIVE CTE: how many part pairs become
    reachable within 1, 2, 3 hops (min-hop semantics — each pair
    counted at its shortest distance). The 'neighborhood growth curve'
    a recommender checks before trusting graph features.

    Depth guard + per-iteration DISTINCT keep the UNION ALL recursion
    terminating and polynomial; the final min-depth GROUP BY collapses
    rediscoveries at deeper levels."""
    lineitem = _view(spark, "lineitem", sf_dir)
    return spark.sql(_reach_sql(lineitem))


def _reach_sql(lineitem_rel: str) -> str:
    return f"""
        WITH RECURSIVE
        items AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p
          FROM {lineitem_rel}
        ),
        edges AS (
          SELECT a.p AS pa, b.p AS pb
          FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
          GROUP BY a.p, b.p
          HAVING COUNT(*) >= {TRI_MIN_SUPPORT}
        ),
        reach(src, node, depth) AS (
          SELECT pa AS src, pb AS node, 1 AS depth FROM edges
          UNION ALL
          SELECT pb AS src, pa AS node, 1 AS depth FROM edges
          UNION ALL
          SELECT DISTINCT r.src,
            CASE WHEN e.pa = r.node THEN e.pb ELSE e.pa END AS node,
            r.depth + 1 AS depth
          FROM reach r
          JOIN edges e ON e.pa = r.node OR e.pb = r.node
          WHERE r.depth < {REACH_DEPTH}
        ),
        mind AS (
          SELECT src, node, MIN(depth) AS hops
          FROM reach WHERE node <> src GROUP BY src, node
        )
        SELECT hops, COUNT(*) AS n_pairs,
          COUNT(DISTINCT src) AS n_srcs
        FROM mind GROUP BY hops
    """


def _groupby_all_sql(orders_rel: str) -> str:
    """GROUP BY ALL + ORDER BY ALL (Spark 4 / DuckDB shared form):
    the engine derives the grouping keys from the non-aggregate
    select items and the total order from the full output row. Same
    status x priority rollup either way — the feature under test is
    the SQL-surface inference, cross-checked between engines."""
    return f"""
        SELECT o_orderstatus AS status,
               o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM {orders_rel}
        GROUP BY ALL
        ORDER BY ALL
    """


def orders_groupby_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status x priority order rollup written with GROUP BY ALL /
    ORDER BY ALL — the grouping keys and output order are INFERRED by
    the analyzer from the select list, not spelled out. Plans
    identically to the explicit GROUP BY (one partial+final hash
    aggregate over the 15-ish key pairs); the capability is the
    Spark-4 SQL surface itself, value-checked against DuckDB's
    implementation of the same inference."""
    return spark.sql(_groupby_all_sql(_view(spark, "orders", sf_dir)))


def _orderby_all_sql(customer_rel: str, nation_rel: str,
                     region_rel: str) -> str:
    """ORDER BY ALL over a snowflake-join projection: deterministic
    total order from the full output row (region, nation, segment are
    a unique key here, so ALL is a stable sort in both engines)."""
    return f"""
        SELECT r.r_name AS region, n.n_name AS nation,
               c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                    AS BIGINT) AS acctbal_cents
        FROM {customer_rel} c
        JOIN {nation_rel} n ON c.c_nationkey = n.n_nationkey
        JOIN {region_rel} r ON n.n_regionkey = r.r_regionkey
        GROUP BY ALL
        ORDER BY ALL
    """


def customer_segments_orderby_all(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Region / nation / market-segment customer census ordered with
    ORDER BY ALL. The nation+region dims broadcast (25/5 rows) so the
    snowflake join is shuffle-free on the fact side; GROUP BY ALL
    infers the three keys. Cross-engine value-check pins that both
    analyzers resolve ALL to the same column sequence."""
    return spark.sql(_orderby_all_sql(
        _view(spark, "customer", sf_dir),
        _view(spark, "nation", sf_dir),
        _view(spark, "region", sf_dir),
    ))


def _unpivot_nulls_sql(lineitem_rel: str) -> str:
    """UNPIVOT INCLUDE NULLS over per-order conditional metrics.
    The FILTERed SUMs are NULL for orders where the metric never
    applies (no returned line / no promo line / no high-tax line) —
    INCLUDE NULLS keeps those rows in the long form so the per-metric
    coverage count is over ALL orders, which the default
    EXCLUDE-NULLS unpivot (plans/relational_ext.py E55) would
    silently drop."""
    return f"""
        WITH per_order AS (
          SELECT l_orderkey,
                 SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                     * 100) AS BIGINT))
                   FILTER (WHERE l_returnflag = 'R') AS returned_cents,
                 SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                     * 100) AS BIGINT))
                   FILTER (WHERE l_discount > 0.05) AS promo_cents,
                 SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                     * 100) AS BIGINT))
                   FILTER (WHERE l_tax > 0.04) AS taxed_cents
          FROM {lineitem_rel}
          GROUP BY l_orderkey
        )
        SELECT metric,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(*) FILTER (WHERE cents IS NULL) AS BIGINT)
                 AS n_missing,
               CAST(SUM(cents) AS BIGINT) AS total_cents
        FROM per_order
          UNPIVOT INCLUDE NULLS (
            cents FOR metric IN (returned_cents, promo_cents,
                                 taxed_cents))
        GROUP BY metric
        ORDER BY metric
    """


def order_metrics_unpivot_nulls(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Per-order conditional revenue metrics melted with UNPIVOT
    INCLUDE NULLS: each metric reports how many orders it covers, how
    many have NO qualifying line (the NULL rows INCLUDE NULLS
    preserves), and total revenue. One map-side Expand over the
    per-order rollup — 3x row multiply on the aggregated frame
    (|orders| rows), never on lineitem itself, then a 3-group
    re-aggregate; no shuffle beyond the two groupBys."""
    return spark.sql(_unpivot_nulls_sql(_view(spark, "lineitem", sf_dir)))


def region_nation_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region report row: nation count, customer count, and the
    alphabetized comma-joined nation roster via Spark 4's LISTAGG
    (DISTINCT ... WITHIN GROUP (ORDER BY ...)) — the ordered string
    aggregation report sheets are full of, newly a first-class SQL
    function. Deterministic because the WITHIN GROUP order is total.

    Scale note: LISTAGG state is O(group's distinct values) — correct
    for dimension-bounded groups like nations-per-region (<=25);
    for data-growing groups use collect_set + slicing or a top-k
    first, never an unbounded string. The per-nation rollup happens
    FIRST (two-level aggregate), so the string agg sees one row per
    nation — no DISTINCT-in-listagg, which both engines distinct-
    rewrite poorly (Spark 4.1 throws a SortOrder ClassCastException
    mixing listagg DISTINCT WITHIN GROUP with other distinct aggs)."""
    customer = _view(spark, "customer", sf_dir)
    nation = _view(spark, "nation", sf_dir)
    region = _view(spark, "region", sf_dir)
    return spark.sql(f"""
        WITH per_nation AS (
          SELECT r.r_name, n.n_name,
                 COUNT(*) AS n_cust
          FROM {customer} c
          JOIN {nation} n ON c.c_nationkey = n.n_nationkey
          JOIN {region} r ON n.n_regionkey = r.r_regionkey
          GROUP BY r.r_name, n.n_name
        )
        SELECT r_name AS region,
               CAST(COUNT(*) AS BIGINT) AS n_nations,
               CAST(SUM(n_cust) AS BIGINT) AS n_customers,
               listagg(n_name, ', ')
                 WITHIN GROUP (ORDER BY n_name) AS nation_roster
        FROM per_nation
        GROUP BY r_name
        ORDER BY region
    """)


REGION_ROSTER_ORACLE = """
    WITH per_nation AS (
      SELECT r.r_name, n.n_name, COUNT(*) AS n_cust
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT r_name AS region,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           CAST(SUM(n_cust) AS BIGINT) AS n_customers,
           string_agg(n_name, ', ' ORDER BY n_name) AS nation_roster
    FROM per_nation
    GROUP BY r_name
    ORDER BY region
"""


TOPK_SKETCH_K = 16  # > |event_type| (5) at every SF: sketch is EXACT


def event_type_frequency_sketch(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Heavy-hitters via Spark 4's approx_top_k aggregate — the
    ONE-PASS mergeable frequent-items sketch (each partition keeps a
    bounded tracked-items map, partials merge associatively), the
    shape that replaces a full groupBy when only the top of a
    billion-key distribution matters. `inline` explodes the
    array-of-struct result back to rows.

    Oracled EXACTLY: k (16) and maxItemsTracked exceed the column's
    cardinality (5 event types at every SF), and the sketch is
    provably exact while nothing is evicted — so the DuckDB exact
    GROUP BY is a legitimate value oracle, not a bounds check. At
    real heavy-hitter scale (k << distinct) the guarantee weakens to
    frequency error <= n/maxItemsTracked; cms_user_counts
    (plans/profiling.py F23b) covers that regime with explicit
    error-bound gates."""
    events = _view(spark, "events", sf_dir)
    return spark.sql(f"""
        SELECT s.item AS event_type, CAST(s.count AS BIGINT) AS n
        FROM (
          SELECT inline(approx_top_k(event_type, {TOPK_SKETCH_K}))
            AS (item, count)
          FROM {events}
        ) s
        ORDER BY n DESC, event_type
    """)


TOPK_SKETCH_ORACLE = """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    ORDER BY n DESC, event_type
"""


def orders_pipe_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status x priority revenue rollup written in Spark 4 SQL PIPE
    syntax (FROM ... |> WHERE |> EXTEND |> AGGREGATE |> EXTEND) — the
    linear query style GoogleSQL introduced and Spark 4.0 adopted;
    each |> stage sees only the previous stage's columns, so the
    query reads top-to-bottom like a DataFrame chain. Catalyst plans
    it identically to the classic form (same optimized plan), which
    is exactly what the classic-SQL DuckDB oracle proves. Money in
    integer cents; avg is a truncating DIV (cents-bounded
    quotient)."""
    orders = _view(spark, "orders", sf_dir)
    return spark.sql(f"""
        FROM {orders}
        |> WHERE o_orderstatus IN ('F', 'O')
        |> EXTEND CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |> AGGREGATE COUNT(*) AS n_orders, SUM(cents) AS revenue_cents
           GROUP BY o_orderstatus, o_orderpriority
        |> EXTEND revenue_cents DIV n_orders AS avg_cents
    """)


PIPE_SUMMARY_ORACLE = """
    SELECT o_orderstatus, o_orderpriority,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        AS revenue_cents,
      CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
           // COUNT(*) AS BIGINT) AS avg_cents
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
    GROUP BY o_orderstatus, o_orderpriority
"""


SQLFEATURES_QUERIES = {
    "orders_pipe_summary": orders_pipe_summary,
    "customer_latest_order_lateral": customer_latest_order_lateral,
    "copurchase_reach3": copurchase_reach3,
    "orders_groupby_all": orders_groupby_all,
    "customer_segments_orderby_all": customer_segments_orderby_all,
    "order_metrics_unpivot_nulls": order_metrics_unpivot_nulls,
    "region_nation_roster": region_nation_roster,
    "event_type_frequency_sketch": event_type_frequency_sketch,
}

SQLFEATURES_ORACLES = {
    "orders_pipe_summary": PIPE_SUMMARY_ORACLE,
    "customer_latest_order_lateral": LATERAL_LATEST_ORACLE,
    "copurchase_reach3": (
        _reach_sql("lineitem")
        .replace("COUNT(*) AS n_pairs", "CAST(COUNT(*) AS BIGINT) AS n_pairs")
        .replace("COUNT(DISTINCT src) AS n_srcs",
                 "CAST(COUNT(DISTINCT src) AS BIGINT) AS n_srcs")
    ),
    # identical text both engines: the feature IS the shared surface
    "orders_groupby_all": _groupby_all_sql("orders"),
    "customer_segments_orderby_all": _orderby_all_sql(
        "customer", "nation", "region"),
    "order_metrics_unpivot_nulls": _unpivot_nulls_sql("lineitem"),
    # DuckDB spells ordered string aggregation string_agg(... ORDER
    # BY) rather than listagg WITHIN GROUP — equivalent semantics
    "region_nation_roster": REGION_ROSTER_ORACLE,
    # exact GROUP BY oracle: the sketch is exact while k and
    # maxItemsTracked exceed the column's cardinality (see docstring)
    "event_type_frequency_sketch": TOPK_SKETCH_ORACLE,
}
