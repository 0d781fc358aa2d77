"""Corpus provenance audits over the near-duplicate pair set: which
SOURCES mirror each other, and how much near-duplicate content LEAKS
across train/val/test splits.

Two facts make these audits necessary at 100 TB:

- Web-scale sources syndicate each other; a per-source dedup budget
  or a source-mixing weight (rebalance_sources) computed without the
  cross-source duplication matrix double-counts mirrored content.
- A content-keyed split (plans/advanced.py split_assignment) provably
  sends EXACT duplicates to one split, but NEAR-duplicates (the
  paraphrase/boilerplate-variant class) still straddle the boundary —
  the leakage every eval-contamination postmortem rediscovers. The
  split_leakage matrix is the audit that quantifies it BEFORE
  training.

Both audits reuse the production two-stage pair generator
(operators/dedup.py lsh_verified_pairs: LSH band candidates → exact
Jaccard verify), so the pair set is output-proportional — no all-pairs
shape. The label joins shuffle only the (small) pair set against the
doc-sized label frame, and the final rollup is label-cardinality
bounded (#sources² / 6 split pairs). Per-pair Jaccards are summed as
micro-ints (each ROUND(j,6) double is bit-identical cross-engine —
IEEE division of exact ints — but a float SUM is order-dependent, so
the sum is taken over exact integers instead).

Oracles run the UNBLOCKED exact tau=0.5 pair form (the
dedup_lsh_verified oracle's CTE) + the label join in DuckDB, so
hash-equality re-proves banding losslessness through the rollup.

Reference scope: the reference has no dedup surface at all (it loads
Firestore documents as-is); these extend the mandated
training-data-pipeline suite (SURVEY §2 F).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.functions.text_fn import tokens
from saurav_nayak_recipe_etl_project_spark.operators.dedup import (
    dup_clusters,
    lsh_verified_pairs,
)
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

# Same split rule as plans/advanced.py split_assignment (md5-hex
# ranges, 75/12.5/12.5) — duplicated as an expression so this module
# and its oracle stay in lockstep with that entry's contract.
_SPLIT = (
    "CASE WHEN md5(text) < 'c' THEN 'train' "
    "WHEN md5(text) < 'e' THEN 'val' ELSE 'test' END"
)


def pair_label_matrix(pairs: DataFrame, labels: DataFrame,
                      label_col: str) -> DataFrame:
    """Roll a (doc_a, doc_b, jaccard) pair set up to an unordered
    label-pair matrix: n_pairs and the exact micro-int Jaccard sum
    per (label_a <= label_b) cell."""
    la = labels.select(
        F.col("doc_id").alias("doc_a"), F.col(label_col).alias("_la")
    )
    lb = labels.select(
        F.col("doc_id").alias("doc_b"), F.col(label_col).alias("_lb")
    )
    return (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .groupBy(
            F.least("_la", "_lb").alias(f"{label_col}_a"),
            F.greatest("_la", "_lb").alias(f"{label_col}_b"),
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.round(F.col("jaccard") * 1000000).cast("long"))
            .alias("jacc_micro_sum"),
        )
    )


def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplication matrix: for each unordered source
    pair, how many verified near-dup pairs (tau=0.5) connect them and
    the summed similarity mass — the input to any syndication-aware
    dedup budget or source-mixing correction."""
    docs = load_table(spark, "documents", sf_dir)
    return pair_label_matrix(
        lsh_verified_pairs(docs), docs.select("doc_id", "source"), "source"
    )


def split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test near-dup leakage matrix. Diagonal cells
    (split_a = split_b) are benign duplication inside one split;
    off-diagonal cells are LEAKAGE — near-duplicate content the
    content-keyed split could not co-locate because the texts differ.
    Exact duplicates never appear off-diagonal by construction (same
    text ⇒ same md5 ⇒ same split), so every off-diagonal pair is a
    genuine paraphrase-class leak."""
    docs = load_table(spark, "documents", sf_dir)
    labels = docs.select("doc_id", F.expr(_SPLIT).alias("split"))
    return pair_label_matrix(lsh_verified_pairs(docs), labels, "split")


def split_leakage_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTION the split_leakage audit calls for: any near-dup
    CLUSTER that spans more than one split is reassigned wholesale to
    'train' (quarantining leaked content on the training side keeps
    val/test clean without discarding data). Component-level — not
    pair-level — reassignment is what makes the repair a FIXPOINT:
    moving single pair endpoints can create new cross-split pairs
    against their remaining neighbors; moving whole components cannot
    (post-repair zero-off-diagonal law pinned in tests).

    Output is the bounded MOVED set only (doc_id, old_split,
    new_split) — the patch a pipeline applies, not a corpus copy."""
    docs = load_table(spark, "documents", sf_dir)
    lab = dup_clusters(docs).join(
        docs.select("doc_id", F.expr(_SPLIT).alias("old_split")), "doc_id"
    )
    mixed = (
        lab.groupBy("cluster_id")
        .agg(F.countDistinct("old_split").alias("ns"))
        .where("ns > 1")
        .select("cluster_id")
    )
    return (
        lab.join(mixed, "cluster_id")
        .where(F.col("old_split") != F.lit("train"))
        .select(
            "doc_id", "old_split", F.lit("train").alias("new_split")
        )
    )


def keep_best_mapping(docs: DataFrame) -> DataFrame:
    """Near-dup cluster canonicalization over any documents frame:
    per transitive duplicate cluster keep the LONGEST document (max
    token count, min doc_id on ties — the keep-longest policy
    near-dedup pipelines default to, since the longest variant
    usually supersets its near-copies; documents_deduped's exact-dup
    keeper can't do this because exact copies have equal length).
    Integer keys only — a float quality-score argmax would hinge
    cross-engine on last-bit float order.

    Plan: cluster labels from the sub-quadratic pair path, one token
    count per doc riding the scan, keeper = max(struct(n_tokens,
    -doc_id)) per cluster (map-side combined), broadcast-joined back.
    Output is the full doc -> keeper mapping with a keep flag."""
    lab = dup_clusters(docs).join(
        docs.select(
            "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
        ),
        "doc_id",
    )
    keeper = (
        lab.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(
                    F.col("n_tokens"), (-F.col("doc_id")).alias("neg_id")
                )
            ).alias("m")
        )
        .select("cluster_id", (-F.col("m.neg_id")).alias("keeper_id"))
    )
    return lab.join(keeper, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "keeper_id",
        (F.col("doc_id") == F.col("keeper_id")).alias("keep"),
    )


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the keep-longest mapping over the full
    documents table (see keep_best_mapping)."""
    return keep_best_mapping(load_table(spark, "documents", sf_dir))


# The exact un-pruned tau=0.5 pair CTE (operators/dedup.py
# dedup_lsh_verified oracle) + label join. Kept textually local so a
# change to either side is a conscious contract change.
_PAIR_CTE = r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
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
      SELECT doc_a, doc_b,
             ROUND(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.5
    )
"""


def _matrix_oracle(label_select: str, label_col: str) -> str:
    return f"""{_PAIR_CTE},
    lab AS (SELECT doc_id, {label_select} AS lbl FROM documents),
    j AS (
      SELECT least(la.lbl, lb.lbl) AS {label_col}_a,
             greatest(la.lbl, lb.lbl) AS {label_col}_b,
             jaccard
      FROM pairs
      JOIN lab la ON la.doc_id = doc_a
      JOIN lab lb ON lb.doc_id = doc_b
    )
    SELECT {label_col}_a, {label_col}_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(ROUND(jaccard * 1000000) AS BIGINT)) AS BIGINT)
             AS jacc_micro_sum
    FROM j GROUP BY {label_col}_a, {label_col}_b
    """


def source_dup_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication exposure: how many of a source's
    documents sit in at least one verified near-dup pair (either
    endpoint, either side of the source boundary) — the scalar each
    source's dedup BUDGET starts from (F61's matrix says who mirrors
    whom; this says how much of each source is mirrored at all).
    exposure_ppm is a truncating integer share.

    Plan: the shared output-proportional pair set, exploded to
    distinct endpoint doc_ids (2x pairs, then distinct), joined to
    the doc->source labels, one source-catalog-bounded rollup."""
    docs = load_table(spark, "documents", sf_dir)
    pairs = lsh_verified_pairs(docs)
    endpoints = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    lab = docs.select("doc_id", "source").join(endpoints, "doc_id", "left")
    return (
        lab.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("_dup", F.lit(0))).alias("n_dup_docs"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_docs",
            F.expr(
                "CAST(CAST(n_dup_docs AS DECIMAL(38,0)) * 1000000"
                " DIV n_docs AS BIGINT)"
            ).alias("exposure_ppm"),
        )
    )


# Transitive-closure extension of the pair CTE (the dedup_clusters
# oracle's recursive shape spliced onto the shared pair set).
_CLOSURE = _PAIR_CTE.replace("WITH t AS", "WITH RECURSIVE t AS", 1) + """,
    sym AS (
      SELECT doc_a AS s, doc_b AS d FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(doc, peer) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.doc, s.d FROM reach r JOIN sym s ON r.peer = s.s
    ),
    clab AS (
      SELECT doc AS doc_id, CAST(MIN(peer) AS BIGINT) AS cluster_id
      FROM reach GROUP BY doc
    )
"""

_REPAIR_ORACLE = f"""{_CLOSURE},
    lab AS (
      SELECT d.doc_id, clab.cluster_id, {_SPLIT} AS old_split
      FROM documents d JOIN clab ON clab.doc_id = d.doc_id
    ),
    mixed AS (
      SELECT cluster_id FROM lab
      GROUP BY cluster_id HAVING COUNT(DISTINCT old_split) > 1
    )
    SELECT doc_id, old_split, 'train' AS new_split
    FROM lab JOIN mixed USING (cluster_id)
    WHERE old_split <> 'train'
    """

_KEEP_BEST_ORACLE = f"""{_CLOSURE},
    nt AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
      FROM documents
    ),
    sel AS (
      SELECT cluster_id, doc_id AS keeper_id FROM (
        SELECT c.cluster_id, c.doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY c.cluster_id
                 ORDER BY nt.n_tokens DESC, c.doc_id
               ) AS rn
        FROM clab c JOIN nt ON nt.doc_id = c.doc_id
      ) WHERE rn = 1
    )
    SELECT c.doc_id, c.cluster_id, CAST(sel.keeper_id AS BIGINT) AS keeper_id,
           c.doc_id = sel.keeper_id AS keep
    FROM clab c JOIN sel USING (cluster_id)
    """

_EXPOSURE_ORACLE = f"""{_PAIR_CTE},
    eps AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM pairs
        UNION ALL SELECT doc_b FROM pairs
      )
    )
    SELECT d.source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_dup_docs,
      CAST(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)
           * CAST(1000000 AS HUGEINT) // COUNT(*) AS BIGINT)
        AS exposure_ppm
    FROM documents d LEFT JOIN eps e ON e.doc_id = d.doc_id
    GROUP BY d.source
    """

def dup_exposure_by_quality(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """F77 — duplication exposure by quality band: the share of docs
    in each fifth of the quality-score scale that sit in ≥1 verified
    near-dup pair — the "are the dups concentrated in junk?" question
    that decides whether dedup should run before or after the quality
    filter (dups concentrated in low bands ⇒ filter-first removes
    most of them for free, the P5 stage-order argument quantified).

    Plan: the shared output-proportional pair set (never all-pairs),
    2× endpoints distinct, left-joined onto the per-doc banded score
    (quality_score_micro — the F8 integer score, so band edges are
    INTEGER comparisons), one ≤5-row rollup.

    Degenerate-doc contract (r10 ADVICE): an empty/tokenless doc has
    a NULL score (divide-by-zero inside the F8 blend), and both
    engines' LEAST() skips NULLs — which would silently file the doc
    in TOP band 4. The score is coalesced to 0 first, so degenerate
    docs land deliberately in band 0 (worst quality), consistent
    with quality_threshold_sweep where the same NULL score fails
    every `score >= t` cutoff."""
    from saurav_nayak_recipe_etl_project_spark.operators.text import (
        quality_score_micro,
    )

    docs = load_table(spark, "documents", sf_dir)
    pairs = lsh_verified_pairs(docs)
    endpoints = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    banded = docs.select(
        "doc_id",
        F.least(
            F.floor(
                F.coalesce(quality_score_micro(), F.lit(0))
                / F.lit(200000)
            ),
            F.lit(4),
        ).cast("int").alias("quality_band"),
    )
    return (
        banded.join(endpoints, "doc_id", "left")
        .groupBy("quality_band")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("_dup", F.lit(0))).alias("n_dup_docs"),
        )
        .select(
            "quality_band", "n_docs", "n_dup_docs",
            F.expr(
                "CAST(CAST(n_dup_docs AS DECIMAL(38,0)) * 1000000"
                " DIV n_docs AS BIGINT)"
            ).alias("exposure_ppm"),
        )
    )


def leakage_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F78 — cross-split leakage attributed to sources: for each
    source, how many of its docs sit in a verified near-dup pair
    whose endpoints land in DIFFERENT content-hash splits — the
    "which source is contaminating eval" attribution that turns
    F62's split×split matrix into an actionable per-source list
    (the F63 repair fixes the split; this tells you which FEED to
    dedup harder upstream).

    Plan: the shared output-proportional pair set labeled with both
    endpoints' splits, cross-split pairs only, 2× endpoints
    distinct, doc→source join, source-catalog rollup — the
    source_dup_exposure shape restricted to boundary-crossing
    pairs."""
    docs = load_table(spark, "documents", sf_dir)
    pairs = lsh_verified_pairs(docs)
    lab = docs.select("doc_id", F.expr(_SPLIT).alias("split"))
    cross = (
        pairs.join(
            lab.select(F.col("doc_id").alias("doc_a"),
                       F.col("split").alias("_sa")), "doc_a")
        .join(
            lab.select(F.col("doc_id").alias("doc_b"),
                       F.col("split").alias("_sb")), "doc_b")
        .where(F.col("_sa") != F.col("_sb"))
    )
    endpoints = (
        cross.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cross.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("_leak", F.lit(1))
    )
    return (
        docs.select("doc_id", "source")
        .join(endpoints, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("_leak", F.lit(0))).alias("n_leak_docs"),
        )
        .select(
            "source", "n_docs", "n_leak_docs",
            F.expr(
                "CAST(CAST(n_leak_docs AS DECIMAL(38,0)) * 1000000"
                " DIV n_docs AS BIGINT)"
            ).alias("leak_ppm"),
        )
    )


CORPUS_AUDIT_QUERIES = {
    "dup_exposure_by_quality": dup_exposure_by_quality,
    "leakage_by_source": leakage_by_source,
    "dedup_source_matrix": dedup_source_matrix,
    "split_leakage": split_leakage,
    "split_leakage_repair": split_leakage_repair,
    "dedup_keep_best": dedup_keep_best,
    "source_dup_exposure": source_dup_exposure,
}

_TOKS_SQL = "regexp_split_to_array(trim(text), '\\s+')"

_QUALITY_EXPOSURE_ORACLE = f"""{_PAIR_CTE},
    eps AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM pairs
        UNION ALL SELECT doc_b FROM pairs
      )
    ),
    banded AS (
      SELECT doc_id, CAST(LEAST(COALESCE(s, 0) // 200000, 4)
        AS INTEGER) AS quality_band
      FROM (
        SELECT doc_id, CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(ROUND((
            LEAST(1.0, n_tokens / 50.0) * 0.5
            + (1 - punct_chars / n_chars) * 0.3
            + LEAST(1.0, (stop_hits / n_tokens) * 5) * 0.2
          ) * 1000000) AS BIGINT) END AS s
        FROM (
          SELECT doc_id,
            length(text) AS n_chars,
            len({_TOKS_SQL}) AS n_tokens,
            length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
              AS punct_chars,
            len(list_filter({_TOKS_SQL},
              t -> t IN ('the','a','and','of','to','in','is','it')))
              AS stop_hits
          FROM documents
        )
      )
    )
    SELECT b.quality_band,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_dup_docs,
      CAST(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)
           * CAST(1000000 AS HUGEINT) // COUNT(*) AS BIGINT)
        AS exposure_ppm
    FROM banded b LEFT JOIN eps e ON e.doc_id = b.doc_id
    GROUP BY b.quality_band
    """

_LEAKAGE_BY_SOURCE_ORACLE = f"""{_PAIR_CTE},
    lab AS (SELECT doc_id, {_SPLIT} AS split FROM documents),
    cross_pairs AS (
      SELECT doc_a, doc_b FROM pairs
      JOIN lab la ON la.doc_id = doc_a
      JOIN lab lb ON lb.doc_id = doc_b
      WHERE la.split <> lb.split
    ),
    eps AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM cross_pairs
        UNION ALL SELECT doc_b FROM cross_pairs
      )
    )
    SELECT d.source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_leak_docs,
      CAST(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)
           * CAST(1000000 AS HUGEINT) // COUNT(*) AS BIGINT)
        AS leak_ppm
    FROM documents d LEFT JOIN eps e ON e.doc_id = d.doc_id
    GROUP BY d.source
    """

CORPUS_AUDIT_ORACLES = {
    "dup_exposure_by_quality": _QUALITY_EXPOSURE_ORACLE,
    "leakage_by_source": _LEAKAGE_BY_SOURCE_ORACLE,
    "dedup_source_matrix": _matrix_oracle("source", "source"),
    "split_leakage": _matrix_oracle(_SPLIT, "split"),
    "split_leakage_repair": _REPAIR_ORACLE,
    "dedup_keep_best": _KEEP_BEST_ORACLE,
    "source_dup_exposure": _EXPOSURE_ORACLE,
}
