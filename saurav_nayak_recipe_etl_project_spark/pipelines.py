"""End-to-end training-data export: the capstone composition proving
the pipeline operators CHAIN — quality filter → exact dedup → sequence
packing — in one declarative plan Catalyst optimizes as a whole (the
filter and the dedup window both run before the packing shuffle; no
intermediate materialization needed).

Stage order is the standard corpus-prep order: drop junk first
(cheapest test, biggest volume cut), dedup what's left (keeper = min
doc_id per content hash), then pack survivors into fixed-token-budget
training sequences per (lang, shard). The output is the SHARD
MANIFEST a training job consumes: one row per packed sequence with
its doc count, token count, and first doc — and the whole thing is
hash-verified against a single composed SQL oracle, so a change to
ANY stage's semantics (filter rule, keeper rule, packing math) goes
RED at the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.operators.dedup import (
    drop_exact_duplicates,
)
from saurav_nayak_recipe_etl_project_spark.operators.packing import (
    SEQ_BUDGET,
    SHARD_SIZE,
    pack_sequences_df,
)
from saurav_nayak_recipe_etl_project_spark.functions.text_fn import tokens
from saurav_nayak_recipe_etl_project_spark.operators.corpus_audit import (
    _SPLIT,
    keep_best_mapping,
)
from saurav_nayak_recipe_etl_project_spark.operators.text import (
    quality_reasons,
)
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table


def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter → exact-dedup → pack, emitting the per-sequence
    shard manifest (lang, shard, seq_id, n_docs, seq_tokens,
    first_doc_id)."""
    docs = load_table(spark, "documents", sf_dir)
    # inline filter on the same scan — no self-join against a second
    # load of the table (quality_reasons is a pure Column)
    kept = docs.filter(quality_reasons() == "")
    deduped = drop_exact_duplicates(kept)
    packed = pack_sequences_df(deduped)
    return packed.groupBy("lang", "shard", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc_id"),
    )


_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


def corpus_release_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — corpus release manifest: quality filter → NEAR-dup
    keep-longest canonicalization → content-hash split → per
    (split, source) doc/token report, one declarative plan.

    Stage ORDER is the load-bearing design choice: canonicalizing
    near-dup clusters BEFORE splitting means every cluster
    contributes exactly one keeper, so no near-dup pair can straddle
    a split boundary — the split_leakage_repair pass becomes
    provably unnecessary (zero verified pairs exist among keepers;
    law pinned in tests). Split-then-dedup would need the repair.

    The near-dup stage is the sub-quadratic LSH→verify path
    (operators/dedup.py) over quality survivors only — filtering
    first shrinks the shingle explode, the pipeline's dominant cost.
    Composed oracle: filter rules + survivor-scoped recursive
    closure + keep-longest + split + rollup in one SQL."""
    docs = load_table(spark, "documents", sf_dir)
    surv = docs.filter(quality_reasons() == "")
    stats = surv.select(
        "doc_id",
        "source",
        F.expr(_SPLIT).alias("split"),
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )
    keepers = keep_best_mapping(surv).where("keep").select("doc_id")
    return (
        stats.join(keepers, "doc_id")
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_tokens").cast("long")).alias("n_tokens"),
        )
    )


def analytics_mart_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — end-to-end analytics mart build in ONE declarative plan:
    validated facts (the C-suite rules inline as a scan filter) ->
    conformed customer/nation dims (broadcast) -> per-(nation, month)
    mart rollup (orders, integer-cents revenue, distinct customers).
    The relational counterpart of training_data_pipeline: the composed
    oracle replays all three stages in one SQL, so a semantics drift
    in ANY stage (a validation rule, the dim join, the rollup) goes
    RED as a unit. Catalyst fuses the whole thing into one scan +
    two broadcast joins + one aggregation — the point of declaring
    the pipeline instead of materializing stage boundaries."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    valid = orders.where(
        F.col("o_orderkey").isNotNull()
        & (F.col("o_totalprice") > 0)
        & F.col("o_orderstatus").isin("O", "F", "P")
    )
    conformed = valid.join(
        F.broadcast(customer.select("c_custkey", "c_nationkey")),
        valid.o_custkey == F.col("c_custkey"),
    ).join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        conformed.groupBy(
            "n_name",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / F.lit(100.0), 2
            ).alias("revenue"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )




def customer_feature_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — per-customer ML feature materialization in ONE declarative
    plan: the feature-store build step (churn/LTV model inputs) that
    normally accretes as a dozen ad-hoc scripts. Coverage is the FULL
    customer dimension (left joins — a customer with no orders is a
    feature row of zeros, not a missing row, because serving-time
    lookups must never miss); all features are exact integers (cents,
    days, ppm) so the wide row hash-verifies.

    Features: order recency/tenure (days vs the corpus max order
    date, -1 for never-ordered), frequency (n_orders, distinct active
    months), monetary (total/avg cents), basket breadth (line items,
    distinct parts), and return behavior (ppm of lines returned).
    Plan shape: two fact rollups (orders by customer; lineitem by
    customer via a broadcast-dim-free orderkey join) + one broadcast
    1-row max-date frame + left joins onto the dimension — three
    shuffles total at any scale."""
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_mktsegment"
    )
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)

    maxd = orders.agg(F.max("o_orderdate").alias("maxd"))
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .alias("total_cents"),
        F.max("o_orderdate").alias("last_d"),
        F.min("o_orderdate").alias("first_d"),
        F.countDistinct(F.expr(
            "(year(cast(o_orderdate as date)) - 1970) * 12"
            " + month(cast(o_orderdate as date)) - 1"
        )).alias("active_months"),
    )
    lines = (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_items"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .alias("n_returned"),
        )
    )
    out = (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .drop("o_custkey")
        .join(lines, cust.c_custkey == lines.o_custkey, "left")
        .drop("o_custkey")
        .crossJoin(F.broadcast(maxd))
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    return out.select(
        "c_custkey",
        "c_mktsegment",
        z("n_orders").alias("n_orders"),
        z("total_cents").alias("total_cents"),
        F.expr("CASE WHEN n_orders IS NULL THEN 0"
               " ELSE total_cents DIV n_orders END")
        .alias("avg_order_cents"),
        F.expr("CASE WHEN last_d IS NULL THEN -1"
               " ELSE datediff(cast(maxd as date), cast(last_d as date))"
               " END").cast("long").alias("recency_days"),
        F.expr("CASE WHEN first_d IS NULL THEN -1"
               " ELSE datediff(cast(maxd as date), cast(first_d as date))"
               " END").cast("long").alias("tenure_days"),
        z("active_months").alias("active_months"),
        z("n_items").alias("n_items"),
        z("distinct_parts").alias("distinct_parts"),
        F.expr("CASE WHEN n_items IS NULL THEN 0"
               " ELSE n_returned * 1000000 DIV n_items END")
        .alias("return_rate_ppm"),
    )


def embedding_qc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — embedding QC capstone: MAD outlier filter → per-dim clip
    calibration on the SURVIVORS, one declarative plan — the pass a
    vector pipeline runs between encode and int8-quantized ANN
    indexing (calibrating clip bounds on a corpus still containing
    its corrupt encodes is how a quantizer loses a bit of range to
    garbage; filter first, then calibrate).

    Stage REUSE is the point: the filter is the F66 entry's own
    `outlier_flags` frame, the calibration the F71 entry's
    `dim_clip_stats` — both already hash-verified standalone; this
    composition re-verifies them CHAINED through one composed oracle
    (the P1–P5 discipline: semantics drift in either stage reds both
    its own entry and this one). Output: the F71 schema over
    survivors + the constant n_dropped rider."""
    from saurav_nayak_recipe_etl_project_spark.operators.linalg import (
        dim_clip_stats,
        outlier_flags,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    flags = outlier_flags(emb)
    surv = emb.join(
        flags.where(~F.col("is_outlier")).select("vec_id"), "vec_id"
    )
    dropped = flags.agg(
        F.sum(F.col("is_outlier").cast("long")).alias("n_dropped")
    )
    return dim_clip_stats(surv).crossJoin(F.broadcast(dropped))


PIPELINE_QUERIES = {
    "embedding_qc_pipeline": embedding_qc_pipeline,
    "customer_feature_store": customer_feature_store,
    "training_data_pipeline": training_data_pipeline,
    "analytics_mart_pipeline": analytics_mart_pipeline,
    "corpus_release_pipeline": corpus_release_pipeline,
}

# One composed oracle for the full chain. The rule constants are
# intentionally repeated from the per-stage oracles: if any stage's
# semantics drift from its oracle, BOTH that stage's entry and this
# composition hash-mismatch — double coverage, not duplication debt.
PIPELINE_ORACLES = {
    "training_data_pipeline": f"""
        WITH q AS (
          SELECT doc_id FROM (
            SELECT doc_id,
              length(text) AS n_chars,
              len({_TOKS}) AS n_tokens,
              len(list_distinct({_TOKS})) AS distinct_toks,
              length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                AS digits,
              length(text) - length(regexp_replace(text, '\\s', '', 'g'))
                AS spaces
            FROM documents
          )
          WHERE NOT (digits / n_chars > 0.2)
            AND NOT (n_tokens >= 5 AND distinct_toks / n_tokens < 0.3)
            AND NOT (spaces / n_chars > 0.5)
            AND NOT (n_chars > 20000)
            AND NOT (n_chars < 20)
        ),
        kept AS (
          SELECT d.* FROM documents d JOIN q USING (doc_id)
        ),
        deduped AS (
          SELECT doc_id, lang, text FROM (
            SELECT doc_id, lang, text,
              ROW_NUMBER() OVER (
                PARTITION BY md5(text) ORDER BY doc_id
              ) AS rn
            FROM kept
          ) WHERE rn = 1
        ),
        t AS (
          SELECT doc_id, lang, doc_id // {SHARD_SIZE} AS shard,
            CAST(len({_TOKS}) AS BIGINT) AS n_tokens
          FROM deduped
        ),
        c AS (
          SELECT doc_id, lang, shard, n_tokens,
            CAST(COALESCE(SUM(n_tokens) OVER (
              PARTITION BY lang, shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            ), 0) AS BIGINT) AS tokens_before
          FROM t
        )
        SELECT lang, shard, tokens_before // {SEQ_BUDGET} AS seq_id,
          COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
          MIN(doc_id) AS first_doc_id
        FROM c GROUP BY lang, shard, tokens_before // {SEQ_BUDGET}
    """,
}

# P5: the survivor-scoped closure repeats the corpus_audit pair CTE
# with `documents` swapped for the quality-survivor set — same
# double-coverage rationale as above.
PIPELINE_ORACLES["corpus_release_pipeline"] = f"""
    WITH RECURSIVE q AS (
      SELECT doc_id FROM (
        SELECT doc_id,
          length(text) AS n_chars,
          len({_TOKS}) AS n_tokens,
          len(list_distinct({_TOKS})) AS distinct_toks,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
            AS digits,
          length(text) - length(regexp_replace(text, '\\s', '', 'g'))
            AS spaces
        FROM documents
      )
      WHERE NOT (digits / n_chars > 0.2)
        AND NOT (n_tokens >= 5 AND distinct_toks / n_tokens < 0.3)
        AND NOT (spaces / n_chars > 0.5)
        AND NOT (n_chars > 20000)
        AND NOT (n_chars < 20)
    ),
    surv AS (
      SELECT d.doc_id, d.text, d.source FROM documents d JOIN q USING (doc_id)
    ),
    t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM surv
    ),
    sh AS (
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 3 THEN list_distinct(
          list_transform(generate_series(1, len(toks) - 2),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        ELSE [] END) AS shingle
      FROM t
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.5
    ),
    sym AS (
      SELECT doc_a AS s, doc_b AS d FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(doc, peer) AS (
      SELECT doc_id, doc_id FROM surv
      UNION
      SELECT r.doc, s.d FROM reach r JOIN sym s ON r.peer = s.s
    ),
    clab AS (
      SELECT doc AS doc_id, MIN(peer) AS cluster_id FROM reach GROUP BY doc
    ),
    nt AS (
      SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+'))
        AS n_tokens
      FROM surv
    ),
    sel AS (
      SELECT doc_id AS keeper_id FROM (
        SELECT c.cluster_id, c.doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY c.cluster_id
                 ORDER BY nt.n_tokens DESC, c.doc_id
               ) AS rn
        FROM clab c JOIN nt ON nt.doc_id = c.doc_id
      ) WHERE rn = 1
    )
    SELECT {_SPLIT.replace('md5(text)', 'md5(surv.text)')} AS split,
           surv.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt.n_tokens) AS BIGINT) AS n_tokens
    FROM sel
    JOIN surv ON surv.doc_id = sel.keeper_id
    JOIN nt ON nt.doc_id = sel.keeper_id
    GROUP BY 1, 2
    """

PIPELINE_ORACLES["analytics_mart_pipeline"] = """
    WITH valid AS (
      SELECT * FROM orders
      WHERE o_orderkey IS NOT NULL AND o_totalprice > 0
        AND o_orderstatus IN ('O', 'F', 'P')
    ),
    conformed AS (
      SELECT v.*, n.n_name
      FROM valid v
      JOIN customer c ON v.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT n_name, strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
      COUNT(*) AS n_orders,
      ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
        AS revenue,
      CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM conformed GROUP BY n_name, month
"""

PIPELINE_ORACLES["customer_feature_store"] = """
    WITH maxd AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    per_cust AS (
      SELECT o_custkey,
        CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          AS total_cents,
        MAX(o_orderdate) AS last_d,
        MIN(o_orderdate) AS first_d,
        CAST(COUNT(DISTINCT (year(CAST(o_orderdate AS DATE)) - 1970) * 12
             + month(CAST(o_orderdate AS DATE)) - 1) AS BIGINT)
          AS active_months
      FROM orders GROUP BY o_custkey
    ),
    lines AS (
      SELECT o_custkey,
        CAST(COUNT(*) AS BIGINT) AS n_items,
        CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_returned
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
    )
    SELECT c_custkey, c_mktsegment,
      COALESCE(n_orders, 0) AS n_orders,
      COALESCE(total_cents, 0) AS total_cents,
      CAST(CASE WHEN n_orders IS NULL THEN 0
           ELSE total_cents // n_orders END AS BIGINT) AS avg_order_cents,
      CAST(CASE WHEN last_d IS NULL THEN -1
           ELSE date_diff('day', CAST(last_d AS DATE), CAST(maxd AS DATE))
           END AS BIGINT) AS recency_days,
      CAST(CASE WHEN first_d IS NULL THEN -1
           ELSE date_diff('day', CAST(first_d AS DATE), CAST(maxd AS DATE))
           END AS BIGINT) AS tenure_days,
      COALESCE(active_months, 0) AS active_months,
      COALESCE(n_items, 0) AS n_items,
      COALESCE(distinct_parts, 0) AS distinct_parts,
      CAST(CASE WHEN n_items IS NULL THEN 0
           ELSE n_returned * 1000000 // n_items END AS BIGINT)
        AS return_rate_ppm
    FROM customer
    LEFT JOIN per_cust ON c_custkey = per_cust.o_custkey
    LEFT JOIN lines ON c_custkey = lines.o_custkey
    CROSS JOIN maxd
"""

# P6 composed oracle: the F66 outlier chain verbatim as a nested CTE,
# survivors filtered, then the F71 clip chain restricted to them.
def _qc_oracle() -> str:
    from saurav_nayak_recipe_etl_project_spark.operators.linalg import (
        MICRO,
        OUTLIERS_ORACLE,
    )

    return f"""
    WITH outl AS ({OUTLIERS_ORACLE}),
    surv AS (SELECT vec_id FROM outl WHERE NOT is_outlier),
    nd AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_dropped
      FROM outl WHERE is_outlier
    ),
    dims_s AS (
      SELECT e.vec_id, i.i AS dim,
        CAST(round(CAST(e.embedding[i.i + 1] AS DOUBLE) * {MICRO})
             AS BIGINT) AS v
      FROM embeddings e
      JOIN surv ON surv.vec_id = e.vec_id,
        UNNEST(range(0, len(e.embedding))) AS i(i)
    ),
    ranked AS (
      SELECT dim, v,
        ROW_NUMBER() OVER (PARTITION BY dim ORDER BY v, vec_id)
          AS rank,
        COUNT(*) OVER (PARTITION BY dim) AS n_g
      FROM dims_s
    ),
    pct AS (
      SELECT dim, MAX(n_g) AS n,
        MIN(CASE WHEN rank = (n_g * 1 + 99) // 100 THEN v END)
          AS p01_micro,
        MIN(CASE WHEN rank = (n_g * 50 + 99) // 100 THEN v END)
          AS p50_micro,
        MIN(CASE WHEN rank = (n_g * 99 + 99) // 100 THEN v END)
          AS p99_micro
      FROM ranked GROUP BY dim
    )
    SELECT CAST(d.dim AS INTEGER) AS dim, CAST(MAX(n) AS BIGINT) AS n,
      MAX(p01_micro) AS p01_micro, MAX(p50_micro) AS p50_micro,
      MAX(p99_micro) AS p99_micro,
      CAST(SUM(CASE WHEN v < p01_micro THEN 1 ELSE 0 END) AS BIGINT)
        AS n_below,
      CAST(SUM(CASE WHEN v > p99_micro THEN 1 ELSE 0 END) AS BIGINT)
        AS n_above,
      MAX(n_dropped) AS n_dropped
    FROM dims_s d JOIN pct ON d.dim = pct.dim CROSS JOIN nd
    GROUP BY d.dim
    """


PIPELINE_ORACLES["embedding_qc_pipeline"] = _qc_oracle()
