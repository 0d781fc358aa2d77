"""Training-batch assembly operators over the `documents` table:
token-budget sequence packing and temperature-scaled source mixing.

Both are standard large-scale LLM-pretraining data steps (beyond the
reference's own surface, like the dedup/similarity suites): packing
turns variable-length documents into fixed-token-budget training
sequences; temperature mixing rebalances a source/domain distribution
so head sources don't drown the tail (the n^alpha sampling rule used
for multilingual corpora).

Scale design:
- Packing is the concat-then-chunk scheme: documents are concatenated
  in a deterministic order and cut into BUDGET-token chunks; a doc is
  assigned to the chunk where it BEGINS. The prefix-sum that implies is
  computed per (lang, shard) — shard = doc_id div SHARD_SIZE — so every
  window partition is bounded by SHARD_SIZE docs and the whole op
  parallelizes by shard count regardless of corpus size (a single
  global ordering would serialize the prefix sum into one task).
- Mixing computes one tiny per-source count aggregate (map-side
  combined), derives integer quotas from it (integer-scaled sqrt
  weights, so the arithmetic is associative and bit-portable to the
  SQL oracle — a float Σ√n would round differently per engine), and
  keeps the first quota docs per source by md5 content rank: the same
  content-keyed, repartition-stable sampling used by
  plans/profiling.stratified_sample.
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

SEQ_BUDGET = 256     # tokens per packed training sequence
SHARD_SIZE = 100     # docs per packing shard (bounds each window task)
MIX_ALPHA_SQRT = True  # temperature alpha = 0.5 (sqrt weighting)
MIX_BUDGET = 200     # total docs the rebalanced mix keeps
WEIGHT_SCALE = 1_000_000  # integer weight scale: round(sqrt(n) * 1e6)


def pack_sequences_df(docs: DataFrame) -> DataFrame:
    """Core of F25 (see pack_sequences): per (lang, shard), documents
    are laid end-to-end in doc_id order and the token stream is cut
    every SEQ_BUDGET tokens; each doc reports the sequence where it
    starts and its offset within it. The window partition key includes
    shard = doc_id div SHARD_SIZE, so NO partition ever exceeds
    SHARD_SIZE docs — a 99%-one-lang corpus still splits into bounded
    window tasks (pinned in tests/test_packing.py skew test)."""
    w = Window.partitionBy("lang", "shard").orderBy("doc_id")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.expr(f"doc_id div {SHARD_SIZE}").alias("shard"),
            F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
        .withColumn(
            "tokens_before",
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0).cast("long"),
            ),
        )
        .select(
            "doc_id",
            "lang",
            "shard",
            "n_tokens",
            F.expr(f"tokens_before div {SEQ_BUDGET}").alias("seq_id"),
            F.expr(f"tokens_before % {SEQ_BUDGET}").alias("seq_offset"),
        )
    )


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F25 — token-budget sequence packing (concat-then-chunk): one
    bounded window per shard; no Python in the row path."""
    return pack_sequences_df(load_table(spark, "documents", sf_dir))


def rebalance_sources_df(docs: DataFrame,
                         budget: int = MIX_BUDGET) -> DataFrame:
    """Core of F26 (see rebalance_sources): per-source quotas ∝
    √n_source (normalized to `budget` docs, integer floor arithmetic
    end-to-end), filled by md5 content rank so the kept set is
    deterministic and stable under repartitioning. Head sources are
    capped, tail sources keep proportionally more, and every source
    keeps AT LEAST one doc (the greatest(1, ·) floor — a single-doc
    tail source is never silently dropped; pinned in
    tests/test_packing.py skew test). The quota table is one row per
    source (broadcast); the only full-data pass is the rank window,
    partitioned by source."""
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    weights = counts.select(
        "source",
        "n_docs",
        F.round(F.sqrt(F.col("n_docs")) * WEIGHT_SCALE).cast("long").alias("w"),
    )
    total_w = weights.agg(F.sum("w").alias("sum_w"))
    quotas = (
        weights.crossJoin(total_w)  # scalar combine: one row × n_sources
        .select(
            "source",
            F.least(
                F.col("n_docs"),
                F.greatest(
                    F.lit(1).cast("long"),
                    F.expr(f"(w * {budget}) div sum_w"),
                ),
            ).alias("quota"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat_ws("|", "doc_id", "text")), "doc_id"
    )
    ranked = docs.withColumn("rn", F.row_number().over(w).cast("long"))
    return (
        ranked.join(F.broadcast(quotas), "source")
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", "source", "rn", "quota")
    )


def rebalance_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F26 — temperature-scaled source mixing (alpha = 0.5) over the
    documents table; see rebalance_sources_df."""
    return rebalance_sources_df(load_table(spark, "documents", sf_dir))


LENGTH_BUCKETS = [16, 32, 64, 128, 256, 512, 1024]


def length_bucketing_df(docs: DataFrame) -> DataFrame:
    """Padding-waste report for batched inference: documents grouped
    into power-of-two token-length buckets (the dynamic-batching shape
    every serving stack uses — uniform bucket length, pad-to-bucket),
    with the padding overhead each (lang, bucket) batch pays.

    The bucket edge is a fixed CASE chain over integers — NOT
    pow(2, ceil(log2(n))): the float log at an exact power of two is
    engine-dependent in its last bit and flips the bucket. waste_ppm
    is all-integer (floor division); docs beyond the top bucket are
    capped there, so a NEGATIVE waste_ppm on the top bucket reads as
    "these docs need truncation", deliberately visible in the report."""
    n_tok = F.size(tokens(F.col("text"))).cast("long")
    bucket = F.lit(LENGTH_BUCKETS[-1])
    for b in reversed(LENGTH_BUCKETS):
        bucket = F.when(n_tok <= b, F.lit(b)).otherwise(bucket)
    return (
        docs.select("doc_id", "lang", n_tok.alias("n_tokens"),
                    bucket.cast("long").alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select(
            "lang",
            "bucket",
            "n_docs",
            "sum_tokens",
            (F.col("n_docs") * F.col("bucket")).alias("padded_tokens"),
            F.expr(
                "(n_docs * bucket - sum_tokens) * 1000000"
                " DIV (n_docs * bucket)"
            ).alias("waste_ppm"),
        )
    )


def length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F35 — power-of-two length bucketing + padding-waste report."""
    return length_bucketing_df(load_table(spark, "documents", sf_dir))


SHUFFLE_SEED = "epoch1"
SHUFFLE_SHARD_DOCS = 100


def corpus_shuffle_df(docs: DataFrame, seed: str = SHUFFLE_SEED,
                      shard_docs: int = SHUFFLE_SHARD_DOCS) -> DataFrame:
    """Deterministic global training-order shuffle: every doc gets a
    reproducible position and output shard for epoch `seed`.

    The order key is md5(seed | doc_id) — changing the seed re-deals
    the whole ordering (per-epoch reshuffle), same seed always deals
    identically (resumable training, bit-equal across clusters).

    Ranking is the two-pass distributed form (functions/ranking.py):
    the md5 hex key is uniform, so its first two hex chars are 256
    order-preserving, deterministically balanced buckets — per-bucket
    parallel row_number + broadcast bucket offsets replaces the old
    single ordered window over (key, doc_id), with bit-identical
    rank/shard/pos output. No single-partition stage at any corpus
    size."""
    key = F.md5(F.concat(F.lit(seed + "|"), F.col("doc_id").cast("string")))
    keyed = docs.select("doc_id", key.alias("shuffle_key"))
    return (
        with_global_rank(
            keyed,
            ["shuffle_key", "doc_id"],
            bucket=F.substring("shuffle_key", 1, 2),
        )
        .select(
            "doc_id",
            "shuffle_key",
            "rank",
            F.expr(f"(rank - 1) DIV {shard_docs}").alias("shard"),
            F.expr(f"(rank - 1) % {shard_docs}").alias("pos_in_shard"),
        )
    )


def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F36 — seeded deterministic epoch shuffle of the corpus."""
    return corpus_shuffle_df(load_table(spark, "documents", sf_dir))


TOPP_PPM = 900_000  # keep the smallest source set covering 90% of tokens


def source_topp_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus-style (top-p) source selection per language: rank each
    language's sources by token mass and keep the smallest prefix
    covering TOPP_PPM of the language's tokens — the data-mixing twin
    of top-p sampling (cut the long tail of micro-sources; keep
    everything load-bearing). Emits EVERY source with its exact ppm
    share, cumulative share, and the keep verdict, so the cut is
    auditable.

    Keep rule (integer-exact): a source is kept if the mass BEFORE it
    (cum - own) has not yet reached TOPP_PPM of the total — i.e.
    (cum_tokens - tokens) * 1e6 < TOPP_PPM * lang_tokens — the first
    crossing source is included, everything after it is cut. Windows
    partition by lang and hold sources-per-lang rows (bounded by the
    source catalog, never by corpus size); token counting is one
    explode-free size() scan + (lang, source) groupBy."""
    docs = load_table(spark, "documents", sf_dir)
    mass = (
        docs.select(
            "lang", "source",
            F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
        )
        .groupBy("lang", "source")
        .agg(F.sum("n_tok").alias("tokens"))
    )
    w_rank = Window.partitionBy("lang").orderBy(
        F.desc("tokens"), F.asc("source")
    )
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.partitionBy("lang")
    return mass.select(
        "lang",
        "source",
        "tokens",
        F.row_number().over(w_rank).cast("long").alias("rank"),
        F.sum("tokens").over(w_cum).alias("cum_tokens"),
        F.sum("tokens").over(w_tot).alias("lang_tokens"),
    ).select(
        # ppm products widen through DECIMAL(38,0) (HUGEINT in the
        # oracle): past ~9.2e12 tokens per language BIGINT * 1e6
        # silently wraps with ANSI off — the exact shape the sibling
        # part_pair_lift / regression ops already widen for.
        "lang", "source", "tokens", "rank",
        F.expr(
            "cast(cast(tokens as decimal(38,0)) * 1000000"
            " DIV lang_tokens as bigint)"
        ).alias("share_ppm"),
        F.expr(
            "cast(cast(cum_tokens as decimal(38,0)) * 1000000"
            " DIV lang_tokens as bigint)"
        ).alias("cum_ppm"),
        F.expr(
            "cast(cum_tokens - tokens as decimal(38,0)) * 1000000"
            f" < cast({TOPP_PPM} as decimal(38,0)) * lang_tokens"
        ).alias("kept"),
    )


PACKING_QUERIES = {
    "pack_sequences": pack_sequences,
    "rebalance_sources": rebalance_sources,
    "length_bucketing": length_bucketing,
    "corpus_shuffle": corpus_shuffle,
    "source_topp_coverage": source_topp_coverage,
}

_BUCKET_CASE = "CASE " + " ".join(
    f"WHEN n_tokens <= {b} THEN {b}" for b in LENGTH_BUCKETS
) + f" ELSE {LENGTH_BUCKETS[-1]} END"

PACKING_ORACLES = {
    "source_topp_coverage": f"""
        WITH mass AS (
          SELECT lang, source,
            CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
                 AS BIGINT) AS tokens
          FROM documents GROUP BY lang, source
        ),
        ranked AS (
          SELECT lang, source, tokens,
            CAST(ROW_NUMBER() OVER (
              PARTITION BY lang ORDER BY tokens DESC, source) AS BIGINT)
              AS rank,
            CAST(SUM(tokens) OVER (
              PARTITION BY lang ORDER BY tokens DESC, source
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
            CAST(SUM(tokens) OVER (PARTITION BY lang) AS BIGINT)
              AS lang_tokens
          FROM mass
        )
        SELECT lang, source, tokens, rank,
          CAST(CAST(tokens AS HUGEINT) * 1000000 // lang_tokens
               AS BIGINT) AS share_ppm,
          CAST(CAST(cum_tokens AS HUGEINT) * 1000000 // lang_tokens
               AS BIGINT) AS cum_ppm,
          CAST(cum_tokens - tokens AS HUGEINT) * 1000000
            < CAST({TOPP_PPM} AS HUGEINT) * lang_tokens AS kept
        FROM ranked
    """,
    "corpus_shuffle": f"""
        WITH keyed AS (
          SELECT doc_id,
            md5('{SHUFFLE_SEED}' || '|' || CAST(doc_id AS VARCHAR))
              AS shuffle_key
          FROM documents
        ),
        ranked AS (
          SELECT doc_id, shuffle_key,
            CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id)
                 AS BIGINT) AS rank
          FROM keyed
        )
        SELECT doc_id, shuffle_key, rank,
          (rank - 1) // {SHUFFLE_SHARD_DOCS} AS shard,
          (rank - 1) % {SHUFFLE_SHARD_DOCS} AS pos_in_shard
        FROM ranked
    """,
    "length_bucketing": f"""
        WITH t AS (
          SELECT lang,
            CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
              AS n_tokens
          FROM documents
        ),
        b AS (
          SELECT lang, CAST({_BUCKET_CASE} AS BIGINT) AS bucket, n_tokens
          FROM t
        )
        SELECT lang, bucket, COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
          COUNT(*) * bucket AS padded_tokens,
          CAST((COUNT(*) * bucket - SUM(n_tokens)) * 1000000
            // (COUNT(*) * bucket) AS BIGINT) AS waste_ppm
        FROM b GROUP BY lang, bucket
    """,
    "pack_sequences": f"""
        WITH t AS (
          SELECT doc_id, lang, doc_id // {SHARD_SIZE} AS shard,
            CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
              AS n_tokens
          FROM documents
        ),
        c AS (
          SELECT doc_id, lang, shard, n_tokens,
            CAST(COALESCE(SUM(n_tokens) OVER (
              PARTITION BY lang, shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            ), 0) AS BIGINT) AS tokens_before
          FROM t
        )
        SELECT doc_id, lang, shard, n_tokens,
          tokens_before // {SEQ_BUDGET} AS seq_id,
          tokens_before % {SEQ_BUDGET} AS seq_offset
        FROM c
    """,
    "rebalance_sources": f"""
        WITH counts AS (
          SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        ),
        weights AS (
          SELECT source, n_docs,
            CAST(ROUND(SQRT(n_docs) * {WEIGHT_SCALE}) AS BIGINT) AS w
          FROM counts
        ),
        quotas AS (
          SELECT source,
            LEAST(n_docs, GREATEST(1,
              (w * {MIX_BUDGET}) // (SELECT SUM(w) FROM weights))) AS quota
          FROM weights
        ),
        ranked AS (
          SELECT doc_id, source,
            CAST(ROW_NUMBER() OVER (
              PARTITION BY source
              ORDER BY md5(doc_id || '|' || text), doc_id
            ) AS BIGINT) AS rn
          FROM documents
        )
        SELECT doc_id, ranked.source AS source, rn, CAST(quota AS BIGINT) AS quota
        FROM ranked JOIN quotas ON ranked.source = quotas.source
        WHERE rn <= quota
    """,
}
