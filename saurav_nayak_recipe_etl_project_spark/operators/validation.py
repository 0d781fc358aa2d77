"""Data-quality validation suite.

Re-hosts reference src/data_validation.py (1-200) Spark-first: the
reference loads CSVs into Python dicts and loops row-by-row checking
required fields (:104-127), numeric ranges (:110,:153), domain sets
(:18-19,:114,:141), email-format regex (:44-46) and orphaned foreign
keys via in-memory ID sets (:137-140,:150), then writes a
(Table, Record_ID, Status, Issues) report (:176-187).

Here every rule is a null-skipping `concat_ws` of `when(...)` flag
expressions — one codegen'd projection per table — and orphan checks
are LEFT joins against (broadcast) key sets, so the whole report is a
single distributed pass with no driver loop. At 100 TB the report is
just another DataFrame: filterable, aggregable, writable.

Each `*_issues` function takes DataFrames (so tests can inject dirty
data); the registered queries wrap them with catalog loads.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.functions.localframe import (
    local_frame,
)

VALID_ORDER_STATUS = ("O", "F", "P")
VALID_ORDER_PRIORITY = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)
VALID_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
CUSTOMER_NAME_RE = "^Customer#[0-9]+$"


def _report(table: str, record_id: Column, *flags: Column) -> list[Column]:
    """(Table, Record_ID, Status, Issues) columns, reference
    data_validation.py:86-94 semantics: FAIL iff any issue, issues
    joined with '; ', 'OK' when clean."""
    issues = F.concat_ws("; ", *flags)
    return [
        F.lit(table).alias("table_name"),
        record_id.cast("string").alias("record_id"),
        F.when(issues == "", "PASS").otherwise("FAIL").alias("status"),
        F.when(issues == "", "OK").otherwise(issues).alias("issues"),
    ]


def _missing(col: str) -> Column:
    return F.when(F.col(col).isNull(), f"Missing {col}")


def orders_issues(orders: DataFrame) -> DataFrame:
    return orders.select(
        *_report(
            "orders",
            F.col("o_orderkey"),
            _missing("o_orderkey"),
            _missing("o_custkey"),
            _missing("o_totalprice"),
            F.when(F.col("o_totalprice") <= 0, "Invalid totalprice"),
            F.when(
                ~F.col("o_orderstatus").isin(*VALID_ORDER_STATUS)
                | F.col("o_orderstatus").isNull(),
                "Invalid status",
            ),
            F.when(
                ~F.col("o_orderpriority").isin(*VALID_ORDER_PRIORITY)
                | F.col("o_orderpriority").isNull(),
                "Invalid priority",
            ),
        )
    )


def lineitem_issues(lineitem: DataFrame, orders: DataFrame, part: DataFrame) -> DataFrame:
    """Range + referential checks; orphans via LEFT joins on key-only
    projections (the distributed version of data_validation.py's
    in-memory ID sets, :59-63,:150)."""
    order_keys = orders.select(F.col("o_orderkey").alias("_ok")).distinct()
    part_keys = part.select(F.col("p_partkey").alias("_pk")).distinct()
    joined = (
        lineitem.join(order_keys, lineitem.l_orderkey == F.col("_ok"), "left")
        .join(F.broadcast(part_keys), lineitem.l_partkey == F.col("_pk"), "left")
    )
    return joined.select(
        *_report(
            "lineitem",
            F.concat_ws("-", "l_orderkey", "l_linenumber"),
            _missing("l_orderkey"),
            _missing("l_quantity"),
            F.when(F.col("l_quantity") <= 0, "Zero/Negative quantity"),
            F.when(F.col("l_extendedprice") <= 0, "Zero/Negative price"),
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
                "Discount out of range",
            ),
            F.when(F.col("_ok").isNull(), "Links to non-existent order"),
            F.when(F.col("_pk").isNull(), "Links to non-existent part"),
        )
    )


def events_issues(events: DataFrame, customer: DataFrame) -> DataFrame:
    cust_keys = customer.select(F.col("c_custkey").alias("_ck")).distinct()
    joined = events.join(
        F.broadcast(cust_keys), events.user_id == F.col("_ck"), "left"
    )
    return joined.select(
        *_report(
            "events",
            F.col("event_id"),
            _missing("event_id"),
            _missing("ts"),
            _missing("user_id"),
            F.when(
                ~F.col("event_type").isin(*VALID_EVENT_TYPES)
                | F.col("event_type").isNull(),
                "Invalid type",
            ),
            F.when(F.col("_ck").isNull(), "Orphaned User ID"),
        )
    )


def part_issues(part: DataFrame) -> DataFrame:
    return part.select(
        *_report(
            "part",
            F.col("p_partkey"),
            _missing("p_partkey"),
            _missing("p_name"),
            F.when(F.col("p_size") <= 0, "Invalid size"),
            F.when(F.col("p_retailprice") <= 0, "Invalid retailprice"),
            F.when(
                ~F.col("p_brand").rlike("^Brand#[0-9]+$")
                | F.col("p_brand").isNull(),
                "Invalid brand format",
            ),
        )
    )


def supplier_issues(supplier: DataFrame) -> DataFrame:
    return supplier.select(
        *_report(
            "supplier",
            F.col("s_suppkey"),
            _missing("s_suppkey"),
            _missing("s_name"),
            F.when(
                ~F.col("s_name").rlike("^Supplier#[0-9]+$")
                | F.col("s_name").isNull(),
                "Invalid name format",
            ),
            F.when(F.col("s_acctbal") < 0, "Negative acctbal"),
        )
    )


def customer_issues(customer: DataFrame) -> DataFrame:
    return customer.select(
        *_report(
            "customer",
            F.col("c_custkey"),
            _missing("c_custkey"),
            _missing("c_name"),
            F.when(
                ~F.col("c_name").rlike(CUSTOMER_NAME_RE) | F.col("c_name").isNull(),
                "Invalid name format",
            ),
            F.when(F.col("c_acctbal") < 0, "Negative acctbal"),
        )
    )


# --- registered queries -----------------------------------------------------

def validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quality report for orders (nulls, ranges, domains)."""
    return orders_issues(load_table(spark, "orders", sf_dir))


def validate_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quality report for lineitem (ranges, FK orphans)."""
    return lineitem_issues(
        load_table(spark, "lineitem", sf_dir),
        load_table(spark, "orders", sf_dir),
        load_table(spark, "part", sf_dir),
    )


def validate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quality report for events (domain, orphans, nulls)."""
    return events_issues(
        load_table(spark, "events", sf_dir),
        load_table(spark, "customer", sf_dir),
    )


def validate_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quality report for customer (nulls, name format, balance)."""
    return customer_issues(load_table(spark, "customer", sf_dir))


def validate_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quality report for part (size, price, brand format)."""
    return part_issues(load_table(spark, "part", sf_dir))


def validate_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quality report for supplier (name format, balance)."""
    return supplier_issues(load_table(spark, "supplier", sf_dir))


def validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 — the full report, one UNION of all per-table passes
    (reference data_validation.py:168-187), summarized per table so the
    output stays small at any scale."""
    full = reduce(
        DataFrame.unionByName,
        [
            validate_orders(spark, sf_dir),
            validate_lineitem(spark, sf_dir),
            validate_events(spark, sf_dir),
            validate_customer(spark, sf_dir),
            validate_part(spark, sf_dir),
            validate_supplier(spark, sf_dir),
        ],
    )
    return full.groupBy("table_name", "status").agg(
        F.count("*").alias("n_records")
    )


def order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table FINANCIAL reconciliation: does o_totalprice equal
    the sum of its lineitems' extendedprice? The audit every finance
    pipeline runs nightly — and on this synthetic corpus the verdict
    is 'never' (header totals are generated independently of lines),
    which is precisely the finding the report must surface rather than
    hide. One lineitem rollup co-partitioned with the orders join;
    one-row integer summary (reconciled = |diff| <= 1 cent)."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    li_sum = li.groupBy("l_orderkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .alias("li_cents")
    )
    j = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("o_cents"),
    ).join(li_sum, orders.o_orderkey == li_sum.l_orderkey, "left")
    diff = F.abs(F.col("o_cents") - F.col("li_cents"))
    return j.agg(
        F.count("*").alias("n_orders"),
        F.count("li_cents").alias("n_with_items"),
        F.sum(F.when(F.col("li_cents").isNull(), 1).otherwise(0))
        .cast("long").alias("n_orphan_headers"),
        F.sum(F.when(diff <= 1, 1).otherwise(0)).cast("long")
        .alias("n_reconciled"),
        F.max(diff).alias("max_diff_cents"),
        F.sum(diff).alias("total_abs_diff_cents"),
    )




# Benford first-digit expectation, ppm (log10(1+1/d) — fixed literals,
# no cross-engine log at query time).
BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992,
               51153, 45757]


def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-numbers detector. Emits per digit: observed count,
    observed share (ppm, integer floor), and the Benford expectation
    as FIXED ppm literals (so no engine computes a log). The deviation
    verdict is left to the reader/report: for naturally-ranged
    invoice data a chi-square against these ppm is the follow-up
    (priority_status_chi2 shows the fixed-point recipe). One scan,
    9-row output."""
    orders = load_table(spark, "orders", sf_dir)
    digit = F.expr("cast(substring(cast(cast(round(o_totalprice * 100)"
                   " as bigint) as string), 1, 1) as int)")
    counts = (
        orders.select(digit.alias("digit"))
        .where(F.col("digit") >= 1)
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("total"))
    bz = local_frame(
        spark, [(d + 1, ppm) for d, ppm in enumerate(BENFORD_PPM)],
        "digit int, benford_ppm long",
    )
    return (
        bz.join(counts, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.expr("cast(coalesce(n, 0) * 1000000 DIV total as bigint)")
            .alias("share_ppm"),
            "benford_ppm",
        )
    )

VALIDATION_QUERIES = {
    "benford_digit_audit": benford_digit_audit,
    "order_reconciliation": order_reconciliation,
    "validate_orders": validate_orders,
    "validate_lineitem": validate_lineitem,
    "validate_events": validate_events,
    "validate_customer": validate_customer,
    "validate_part": validate_part,
    "validate_supplier": validate_supplier,
    "validation_report": validation_report,
}

_PART_SQL = """
    SELECT 'part' AS table_name, CAST(p_partkey AS VARCHAR) AS record_id,
      CASE WHEN iss = '' THEN 'PASS' ELSE 'FAIL' END AS status,
      CASE WHEN iss = '' THEN 'OK' ELSE iss END AS issues
    FROM (
      SELECT p_partkey, concat_ws('; ',
        CASE WHEN p_partkey IS NULL THEN 'Missing p_partkey' END,
        CASE WHEN p_name IS NULL THEN 'Missing p_name' END,
        CASE WHEN p_size <= 0 THEN 'Invalid size' END,
        CASE WHEN p_retailprice <= 0 THEN 'Invalid retailprice' END,
        CASE WHEN NOT regexp_matches(p_brand, '^Brand#[0-9]+$')
               OR p_brand IS NULL THEN 'Invalid brand format' END
      ) AS iss FROM part
    )
"""

_SUPPLIER_SQL = """
    SELECT 'supplier' AS table_name, CAST(s_suppkey AS VARCHAR) AS record_id,
      CASE WHEN iss = '' THEN 'PASS' ELSE 'FAIL' END AS status,
      CASE WHEN iss = '' THEN 'OK' ELSE iss END AS issues
    FROM (
      SELECT s_suppkey, concat_ws('; ',
        CASE WHEN s_suppkey IS NULL THEN 'Missing s_suppkey' END,
        CASE WHEN s_name IS NULL THEN 'Missing s_name' END,
        CASE WHEN NOT regexp_matches(s_name, '^Supplier#[0-9]+$')
               OR s_name IS NULL THEN 'Invalid name format' END,
        CASE WHEN s_acctbal < 0 THEN 'Negative acctbal' END
      ) AS iss FROM supplier
    )
"""

_ORDERS_SQL = """
    SELECT 'orders' AS table_name, CAST(o_orderkey AS VARCHAR) AS record_id,
      CASE WHEN iss = '' THEN 'PASS' ELSE 'FAIL' END AS status,
      CASE WHEN iss = '' THEN 'OK' ELSE iss END AS issues
    FROM (
      SELECT o_orderkey, concat_ws('; ',
        CASE WHEN o_orderkey IS NULL THEN 'Missing o_orderkey' END,
        CASE WHEN o_custkey IS NULL THEN 'Missing o_custkey' END,
        CASE WHEN o_totalprice IS NULL THEN 'Missing o_totalprice' END,
        CASE WHEN o_totalprice <= 0 THEN 'Invalid totalprice' END,
        CASE WHEN o_orderstatus NOT IN ('O','F','P')
               OR o_orderstatus IS NULL THEN 'Invalid status' END,
        CASE WHEN o_orderpriority NOT IN
               ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
               OR o_orderpriority IS NULL THEN 'Invalid priority' END
      ) AS iss FROM orders
    )
"""

_LINEITEM_SQL = """
    SELECT 'lineitem' AS table_name,
      concat_ws('-', CAST(l_orderkey AS VARCHAR),
                     CAST(l_linenumber AS VARCHAR)) AS record_id,
      CASE WHEN iss = '' THEN 'PASS' ELSE 'FAIL' END AS status,
      CASE WHEN iss = '' THEN 'OK' ELSE iss END AS issues
    FROM (
      SELECT l_orderkey, l_linenumber, concat_ws('; ',
        CASE WHEN l_orderkey IS NULL THEN 'Missing l_orderkey' END,
        CASE WHEN l_quantity IS NULL THEN 'Missing l_quantity' END,
        CASE WHEN l_quantity <= 0 THEN 'Zero/Negative quantity' END,
        CASE WHEN l_extendedprice <= 0 THEN 'Zero/Negative price' END,
        CASE WHEN l_discount < 0 OR l_discount > 1
             THEN 'Discount out of range' END,
        CASE WHEN o.o_orderkey IS NULL THEN 'Links to non-existent order' END,
        CASE WHEN p.p_partkey IS NULL THEN 'Links to non-existent part' END
      ) AS iss
      FROM lineitem l
      LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        ON l.l_orderkey = o.o_orderkey
      LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
        ON l.l_partkey = p.p_partkey
    )
"""

_EVENTS_SQL = """
    SELECT 'events' AS table_name, CAST(event_id AS VARCHAR) AS record_id,
      CASE WHEN iss = '' THEN 'PASS' ELSE 'FAIL' END AS status,
      CASE WHEN iss = '' THEN 'OK' ELSE iss END AS issues
    FROM (
      SELECT event_id, concat_ws('; ',
        CASE WHEN event_id IS NULL THEN 'Missing event_id' END,
        CASE WHEN ts IS NULL THEN 'Missing ts' END,
        CASE WHEN user_id IS NULL THEN 'Missing user_id' END,
        CASE WHEN event_type NOT IN ('view','click','purchase','signup','error')
               OR event_type IS NULL THEN 'Invalid type' END,
        CASE WHEN c.c_custkey IS NULL THEN 'Orphaned User ID' END
      ) AS iss
      FROM events e
      LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON e.user_id = c.c_custkey
    )
"""

_CUSTOMER_SQL = """
    SELECT 'customer' AS table_name, CAST(c_custkey AS VARCHAR) AS record_id,
      CASE WHEN iss = '' THEN 'PASS' ELSE 'FAIL' END AS status,
      CASE WHEN iss = '' THEN 'OK' ELSE iss END AS issues
    FROM (
      SELECT c_custkey, concat_ws('; ',
        CASE WHEN c_custkey IS NULL THEN 'Missing c_custkey' END,
        CASE WHEN c_name IS NULL THEN 'Missing c_name' END,
        CASE WHEN NOT regexp_matches(c_name, '^Customer#[0-9]+$')
               OR c_name IS NULL THEN 'Invalid name format' END,
        CASE WHEN c_acctbal < 0 THEN 'Negative acctbal' END
      ) AS iss FROM customer
    )
"""

VALIDATION_ORACLES = {
    "benford_digit_audit": """
        WITH counts AS (
          SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                     AS VARCHAR), 1, 1) AS INT) AS digit,
                 COUNT(*) AS n
          FROM orders
          GROUP BY digit HAVING digit >= 1
        ),
        t AS (SELECT SUM(n) AS total FROM counts),
        bz AS (
          SELECT unnest(generate_series(1, 9)) AS digit,
                 unnest([301030, 176091, 124939, 96910, 79181, 66947,
                         57992, 51153, 45757]) AS benford_ppm
        )
        SELECT bz.digit, COALESCE(counts.n, 0) AS n,
          CAST(CAST(COALESCE(counts.n, 0) AS HUGEINT) * 1000000 // total
               AS BIGINT) AS share_ppm,
          CAST(benford_ppm AS BIGINT) AS benford_ppm
        FROM bz LEFT JOIN counts ON bz.digit = counts.digit
        CROSS JOIN t
    """,
    "order_reconciliation": """
        WITH li AS (
          SELECT l_orderkey,
            SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS li_cents
          FROM lineitem GROUP BY l_orderkey
        ),
        j AS (
          SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS o_cents,
                 li.li_cents
          FROM orders LEFT JOIN li ON o_orderkey = li.l_orderkey
        )
        SELECT COUNT(*) AS n_orders,
          COUNT(li_cents) AS n_with_items,
          CAST(SUM(CASE WHEN li_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_orphan_headers,
          CAST(SUM(CASE WHEN ABS(o_cents - li_cents) <= 1
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_reconciled,
          CAST(MAX(ABS(o_cents - li_cents)) AS BIGINT) AS max_diff_cents,
          CAST(SUM(ABS(o_cents - li_cents)) AS BIGINT)
            AS total_abs_diff_cents
        FROM j
    """,
    "validate_orders": _ORDERS_SQL,
    "validate_lineitem": _LINEITEM_SQL,
    "validate_events": _EVENTS_SQL,
    "validate_customer": _CUSTOMER_SQL,
    "validate_part": _PART_SQL,
    "validate_supplier": _SUPPLIER_SQL,
    "validation_report": f"""
        SELECT table_name, status, COUNT(*) AS n_records FROM (
          {_ORDERS_SQL} UNION ALL {_LINEITEM_SQL}
          UNION ALL {_EVENTS_SQL} UNION ALL {_CUSTOMER_SQL}
          UNION ALL {_PART_SQL} UNION ALL {_SUPPLIER_SQL}
        ) GROUP BY table_name, status
    """,
}
