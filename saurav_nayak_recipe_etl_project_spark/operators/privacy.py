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

PRIVACY_QUERIES = {
    "pseudonymized_segment_report": pseudonymized_segment_report,
}

PRIVACY_ORACLES = {
    "pseudonymized_segment_report": PSEUDO_REPORT_ORACLE,
}
