"""Privacy / governance operators: deterministic keyed pseudonymization
with referential integrity.

The reference's only privacy surface is nothing — it loads raw user
docs into the warehouse; this repo already has subject erasure
(operators/maintenance.py forget_subject, E25) and digit redaction
(redact_numbers, F15). Pseudonymization is the third leg: replace
identifiers with keyed tokens sha2(secret|value) so analysts never see
the raw key, while EQUAL inputs map to EQUAL tokens — joins,
group-bys, and distinct counts still work in pseudonymized space
(unlike redaction, which destroys joinability; unlike erasure, which
destroys the rows). Rotating the secret re-keys the whole lake.

Scale: a per-row codegen'd hash — map-only, no shuffle added beyond
whatever the query already does. The secret lives in the plan as a
literal here; production would inject it from a KMS at submit time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

PSEUDO_SECRET = "k1"  # fixed so the DuckDB oracle can replay the tokens


def pseudonymize(df: DataFrame, cols: list, secret: str = PSEUDO_SECRET) -> DataFrame:
    """Replace each column in `cols` with sha2(secret|value, 256) —
    deterministic, so referential integrity across tables is
    preserved as long as they tokenize with the same secret.

    NULLs stay NULL (round-8 advisory): concat_ws skips NULL args, so
    without the guard every NULL would collapse to the one constant
    token sha2(secret) — NULL keys would then equal each other (and
    across tables) in pseudonymized joins/distincts, unlike raw SQL
    NULLs which never join, and any oracle's `'k'||'|'||NULL -> NULL`
    propagation would diverge. Mirror the same NULL propagation in
    any oracle that tokenizes a nullable column."""
    out = df
    for c in cols:
        tok = F.sha2(
            F.concat_ws("|", F.lit(secret), F.col(c).cast("string")), 256
        )
        out = out.withColumn(
            c,
            F.when(F.col(c).isNull(), F.lit(None).cast("string"))
            .otherwise(tok),
        )
    return out


def pseudonymized_segment_report(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Segment revenue report computed ENTIRELY in pseudonymized
    space: orders and customers are tokenized INDEPENDENTLY (each side
    runs its own sha2 pass — no shared lookup table), then joined on
    the token. Values hash-match the oracle's replayed-token join, and
    n_customers (distinct tokens) carried next to n_custkeys (distinct
    raw keys, computed before tokenization) pins zero collisions in
    the result itself."""
    orders = pseudonymize(
        load_table(spark, "orders", sf_dir).select("o_custkey", "o_totalprice"),
        ["o_custkey"],
    )
    cust_raw = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_mktsegment"
    )
    cust = pseudonymize(cust_raw, ["c_custkey"])
    raw_counts = cust_raw.groupBy("c_mktsegment").agg(
        F.count_distinct("c_custkey").alias("n_custkeys")
    )
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    rep = joined.groupBy("c_mktsegment").agg(
        F.count_distinct("c_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            / F.lit(100.0), 2
        ).alias("revenue"),
    )
    return rep.join(F.broadcast(raw_counts), "c_mktsegment").select(
        "c_mktsegment", "n_customers", "n_custkeys", "n_orders", "revenue",
        (F.col("n_custkeys") - F.col("n_customers")).alias("token_collisions"),
    )


PSEUDO_REPORT_ORACLE = f"""
    WITH o AS (
      SELECT sha256('{PSEUDO_SECRET}' || '|' || CAST(o_custkey AS VARCHAR))
               AS tok,
        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    c AS (
      SELECT sha256('{PSEUDO_SECRET}' || '|' || CAST(c_custkey AS VARCHAR))
               AS tok,
        c_mktsegment
      FROM customer
    ),
    raw AS (
      SELECT c_mktsegment,
        CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_custkeys
      FROM customer GROUP BY c_mktsegment
    ),
    rep AS (
      SELECT c_mktsegment,
        CAST(COUNT(DISTINCT c.tok) AS BIGINT) AS n_customers,
        CAST(COUNT(*) AS BIGINT) AS n_orders,
        ROUND(CAST(SUM(cents) AS BIGINT) / 100.0, 2) AS revenue
      FROM o JOIN c ON o.tok = c.tok
      GROUP BY c_mktsegment
    )
    SELECT rep.c_mktsegment, n_customers, n_custkeys, n_orders, revenue,
      CAST(n_custkeys - n_customers AS BIGINT) AS token_collisions
    FROM rep JOIN raw ON rep.c_mktsegment = raw.c_mktsegment
"""

def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity exposure report over the customer quasi-identifier
    (segment, nation, $1000 account-balance band): for each candidate
    k in {2, 5, 10, 25}, how many QI groups and how many CUSTOMERS sit
    in groups smaller than k — the re-identification exposure a
    release-review reads before publishing "anonymized" microdata
    (pseudonymization above hides the key; it does NOT hide a unique
    quasi-identifier combination, which is what k-anonymity measures).

    All integer: one QI groupBy (map-side combined; the QI grid is
    catalog x balance-range bounded, never customer-sized), a 4-row
    broadcast threshold grid over the GROUP-SIZE frame, exposure
    shares as ppm floor divisions. floor(c_acctbal/1000) is exact
    IEEE on both engines (negative balances land in their own
    band)."""
    customer = load_table(spark, "customer", sf_dir)
    g = customer.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").alias(
            "bal_band"
        ),
    ).agg(F.count("*").alias("n"))
    ks = spark.range(0, 4).select(
        F.element_at(
            F.array(F.lit(2), F.lit(5), F.lit(10), F.lit(25)),
            (F.col("id") + 1).cast("int"),
        ).alias("k")
    )
    tot = g.agg(
        F.count("*").alias("n_groups"), F.sum("n").alias("n_rows")
    )
    return (
        g.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("n") < F.col("k"), 1).otherwise(0))
            .alias("groups_below"),
            F.sum(F.when(F.col("n") < F.col("k"), F.col("n")).otherwise(0))
            .alias("rows_below"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "groups_below",
            "rows_below",
            "n_groups",
            F.expr(
                "CAST(CAST(rows_below AS DECIMAL(38,0)) * 1000000"
                " DIV n_rows AS BIGINT)"
            ).alias("exposure_ppm"),
        )
    )


K_ANON_ORACLE = """
    WITH g AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2, 3
    ),
    ks AS (SELECT UNNEST([2, 5, 10, 25]) AS k),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(n) AS BIGINT) AS n_rows
      FROM g
    )
    SELECT k,
      CAST(SUM(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT)
        AS groups_below,
      CAST(SUM(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
        AS rows_below,
      n_groups,
      CAST(SUM(CASE WHEN n < k THEN n ELSE 0 END)
           * CAST(1000000 AS HUGEINT) // n_rows AS BIGINT)
        AS exposure_ppm
    FROM g CROSS JOIN ks CROSS JOIN tot
    GROUP BY k, n_groups, n_rows
"""

PRIVACY_QUERIES = {
    "pseudonymized_segment_report": pseudonymized_segment_report,
    "k_anonymity_audit": k_anonymity_audit,
}

PRIVACY_ORACLES = {
    "pseudonymized_segment_report": PSEUDO_REPORT_ORACLE,
    "k_anonymity_audit": K_ANON_ORACLE,
}
