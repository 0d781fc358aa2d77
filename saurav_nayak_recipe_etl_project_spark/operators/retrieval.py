"""Corpus-statistics scoring operators: BM25 retrieval and a
char-trigram language-model likelihood score.

Training-data pipelines need both directions of lexical scoring:
retrieval (find the documents matching a query — dataset curation,
targeted decontamination, eval-set mining) and likelihood (score every
document under a corpus-fitted LM — the classic KenLM-style quality
filter from CCNet/RedPajama-style pipelines). Both are pure DataFrame
algebra over one token/trigram explode — the inverted-index and count
-model shapes — with no Python in the row path.

Float portability (the ln() problem): Java's Math.log and other
engines' libm disagree in the last ulp on ~7% of inputs (measured:
4574/60000 idf-domain values differ between Spark and DuckDB), so raw
log scores cannot hash-verify. The established fixed-point pattern
(SURVEY E51 PageRank) applies: every log term is rounded ONCE to
integer micro-nats (round(ln(x)*1e6) — a 1-ulp input difference flips
the rounded value only with probability ~1e-9), and all downstream
sums are integer sums — associative, shuffle-order-free, engine-exact.
All other arithmetic (+,-,*,/) is IEEE exact-rounded and written with
identical association on both sides, so it is bit-portable as doubles.

Reference scope: the reference's query surface is exact-match SQL
filters (README.md §6); ranked retrieval and LM scoring are part of
the mandated training-data-pipeline extension, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
    derive_band_width,
    ntile_from_rank,
    with_global_rank,
)
from saurav_nayak_recipe_etl_project_spark.functions.text_fn import tokens
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

# BM25 constants (Robertson/Lucene defaults).
BM25_K1 = 1.2
BM25_B = 0.75
# Query derivation: vocabulary ranks [RANK_LO, RANK_LO + 2*N_QUERIES)
# feed N_QUERIES two-term queries — rank r maps to query (r - RANK_LO)
# mod N_QUERIES, so each query pairs a more-frequent with a
# less-frequent term. Skipping the top-10 ranks avoids stopword-like
# terms that match every document.
BM25_RANK_LO = 10
N_BM25_QUERIES = 4
BM25_TOP_K = 10

MICRO = 1000000.0  # fixed-point scale for log terms (micro-nats)


def _query_terms(words: DataFrame) -> DataFrame:
    """(query_id, w) from the ranked vocabulary — deterministic
    (count desc, word asc) ranking, 2 terms per query.

    r8 de-weak: the first cut ranked the ENTIRE vocabulary with a
    global row_number window just to pick ranks [RANK_LO,
    RANK_LO+2N). Now the top RANK_LO+2N-1 terms come from
    ``orderBy().limit()`` — TakeOrderedAndProject, distributed
    per-partition top-k, O(17) driver — and the rank within that
    17-row frame is a broadcast triangle self-join (1 + count of
    rows sorting strictly earlier), so the vocabulary is never
    globally windowed and the plan has no window node here."""
    top_n = BM25_RANK_LO + 2 * N_BM25_QUERIES - 1
    top = words.orderBy(F.desc("n"), F.asc("w")).limit(top_n)
    earlier = top.select(F.col("n").alias("_n2"), F.col("w").alias("_w2"))
    return (
        top.join(
            F.broadcast(earlier),
            (F.col("_n2") > F.col("n"))
            | ((F.col("_n2") == F.col("n")) & (F.col("_w2") < F.col("w"))),
            "left",
        )
        .groupBy("w")
        .agg((F.count("_w2") + 1).cast("int").alias("rank"))
        .filter(F.col("rank") >= BM25_RANK_LO)
        .select(
            ((F.col("rank") - BM25_RANK_LO) % N_BM25_QUERIES)
            .cast("long").alias("query_id"),
            "w",
        )
    )


def bm25_topk(docs: DataFrame, k: int = BM25_TOP_K,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BM25 ranked retrieval, inverted-index shape.

    The corpus is exploded ONCE into token occurrences; joining the
    (broadcast, 2·N_QUERIES-row) query-term table immediately after the
    explode is the posting-list intersection — only occurrences of
    query terms survive the join, so everything downstream (tf, df,
    scoring, ranking) runs on posting-list-sized data, never
    corpus-sized. df/doclen/avgdl are one map-side-combined aggregation
    each. Per-term BM25 contributions are rounded to integer
    micro-units and integer-summed per (query, doc) — the portable
    fixed-point form (module docstring); ranking orders by the integer
    score with doc-id tie-break, so ranks are engine-exact too.

    At 100 TB: the token explode is the standard inverted-index build
    (shuffle keyed by term = posting lists); query terms are a tiny
    broadcast; the rank window partitions by query_id (Q partitions,
    each posting-union-sized). No driver-side state beyond Q×k rows.
    """
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(F.col(text_col)).alias("toks"))
    doclen = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    occ = toks.select("doc_id", F.explode("toks").alias("w"))
    words = occ.groupBy("w").agg(F.count("*").alias("n"))
    qterms = _query_terms(words)

    stats = doclen.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    ).withColumn("avgdl", F.col("total_dl") / F.col("n_docs"))

    hits = occ.join(F.broadcast(qterms), "w")
    tf = hits.groupBy("query_id", "w", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    # df: documents containing the term (term-level, not per-query).
    df_tbl = (
        hits.select("w", "doc_id").distinct()
        .groupBy("w").agg(F.count("*").cast("long").alias("df"))
    )

    scored = (
        tf.join(F.broadcast(df_tbl), "w")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    # Association mirrored EXACTLY in the SQL oracle (left-to-right):
    # idf = ln(1 + (N - df + 0.5) / (df + 0.5))
    # c   = idf * ((tf * (k1+1)) / (tf + k1 * ((1-b) + b * (dl/avgdl))))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    c = idf * (
        (F.col("tf") * F.lit(BM25_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl") / F.col("avgdl")))
        )
    )
    contrib = scored.select(
        "query_id", "doc_id",
        F.round(c * F.lit(MICRO)).cast("long").alias("c_micro"),
    )
    per_doc = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c_micro").alias("score_micro"),
        F.count("*").cast("long").alias("n_terms_hit"),
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    qlabels = qterms.groupBy("query_id").agg(
        F.array_join(F.array_sort(F.collect_list("w")), " ").alias("terms")
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= k)
        .join(F.broadcast(qlabels), "query_id")
        .select(
            "query_id", "terms", "doc_id", "n_terms_hit", "score_micro",
            (F.col("score_micro") / F.lit(MICRO)).alias("score"), "rank",
        )
    )


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered BM25 retrieval: top-10 documents for each of the
    self-derived two-term queries over `documents`."""
    return bm25_topk(load_table(spark, "documents", sf_dir))


# Dirichlet smoothing mass for the query-likelihood ranker (the
# classic Zhai/Lafferty default scale) and the reciprocal-rank-fusion
# damping constant (Cormack et al.'s k=60).
QL_MU = 2000.0
RRF_K = 60


def rrf_hybrid_topk(docs: DataFrame, k: int = BM25_TOP_K,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the same queries
    ranked by TWO independent retrieval models — BM25 and a
    Dirichlet-smoothed query-likelihood LM (Zhai/Lafferty) — fused as
    RRF = Σ 1/(60+rank). The RAG hybrid-search shape: rank fusion is
    score-scale-free, so models whose scores live on incomparable
    scales (tf-idf units vs log-probabilities) combine without
    calibration.

    Both models score the SAME candidate set (documents containing at
    least one query term), so the fused ranks are comparable; QL sums
    over ALL query terms with tf=0 falling back to the collection
    model mu*(cf/T)/(dl+mu) — the smoothing that distinguishes QL from
    a plain tf product. Each ln is micro-rounded once per candidate
    row (module docstring) and the fusion arithmetic is pure integer:
    1e6 DIV (60+r) summed over the two systems, so scores AND ranks
    hash-verify cross-engine.

    Scale: shares the bm25 inverted-index shape — one token explode,
    broadcast query terms prune to posting lists immediately, rank
    windows partition by query_id (posting-union-sized frames). The
    QL term fan-out is |candidates| x |query terms| (2), not corpus x
    vocab."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(F.col(text_col)).alias("toks"))
    doclen = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    occ = toks.select("doc_id", F.explode("toks").alias("w"))
    words = occ.groupBy("w").agg(F.count("*").alias("n"))
    qterms = _query_terms(words)

    stats = doclen.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    ).withColumn("avgdl", F.col("total_dl") / F.col("n_docs"))

    hits = occ.join(F.broadcast(qterms), "w")
    tf = hits.groupBy("query_id", "w", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    df_tbl = (
        hits.select("w", "doc_id").distinct()
        .groupBy("w").agg(F.count("*").cast("long").alias("df"))
    )

    # --- BM25 per-candidate score (same association as bm25_topk) ---
    bm_scored = (
        tf.join(F.broadcast(df_tbl), "w")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    c = idf * (
        (F.col("tf") * F.lit(BM25_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl") / F.col("avgdl")))
        )
    )
    bm_per_doc = (
        bm_scored.select(
            "query_id", "doc_id",
            F.round(c * F.lit(MICRO)).cast("long").alias("c_micro"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c_micro").alias("bm25_micro"))
    )

    # --- Query-likelihood per-candidate score -----------------------
    cand = hits.select("query_id", "doc_id").distinct()
    qcf = qterms.join(words, "w").select(
        "query_id", "w", F.col("n").cast("long").alias("cf")
    )
    ql_per_doc = (
        cand.join(F.broadcast(qcf), "query_id")
        .join(tf, ["query_id", "w", "doc_id"], "left")
        .withColumn("tf", F.coalesce(F.col("tf"), F.lit(0).cast("long")))
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id", "doc_id",
            F.round(
                F.log(
                    (F.col("tf") + F.lit(QL_MU)
                     * (F.col("cf") / F.col("total_dl")))
                    / (F.col("dl") + F.lit(QL_MU))
                )
                * F.lit(MICRO)
            ).cast("long").alias("q_micro"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("q_micro").alias("ql_micro"))
    )

    both = bm_per_doc.join(ql_per_doc, ["query_id", "doc_id"])
    w_bm = Window.partitionBy("query_id").orderBy(
        F.desc("bm25_micro"), F.asc("doc_id")
    )
    w_ql = Window.partitionBy("query_id").orderBy(
        F.desc("ql_micro"), F.asc("doc_id")
    )
    fused = (
        both.withColumn("r_bm25", F.row_number().over(w_bm).cast("long"))
        .withColumn("r_ql", F.row_number().over(w_ql).cast("long"))
        .withColumn(
            "rrf_ppm",
            F.expr(f"1000000 DIV ({RRF_K} + r_bm25)"
                   f" + 1000000 DIV ({RRF_K} + r_ql)"),
        )
    )
    w_rrf = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_ppm"), F.asc("doc_id")
    )
    qlabels = qterms.groupBy("query_id").agg(
        F.array_join(F.array_sort(F.collect_list("w")), " ").alias("terms")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w_rrf).cast("long"))
        .filter(F.col("rank") <= k)
        .join(F.broadcast(qlabels), "query_id")
        .select("query_id", "terms", "doc_id", "r_bm25", "r_ql",
                "rrf_ppm", "rank")
    )


def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered hybrid retrieval: RRF fusion of BM25 and
    query-likelihood top-10 over `documents`."""
    return rrf_hybrid_topk(load_table(spark, "documents", sf_dir))


def lm_score(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Char-trigram LM likelihood score (corpus-fitted, add-one
    smoothed): avg negative log-likelihood per trigram, in nats.

    P(c3 | c1c2) = (count(c1c2c3) + 1) / (count(c1c2·) + V), with V the
    corpus third-character alphabet size and count(c1c2·) the trigram
    occurrences sharing the context. The per-trigram log term is
    rounded once to micro-nats IN THE MODEL TABLE (trigram-vocab-sized,
    so the ulp-straddle surface is the vocabulary, not the corpus) and
    per-doc totals are integer sums. Low avg_nll = well-modeled,
    natural text; high = gibberish/noise — the quality-filter signal
    (perplexity = exp(avg_nll); the exp is left to callers because it
    is not bit-portable and adds no ranking information).

    Scale: one trigram explode; model counts are two map-side-combined
    aggregations that shrink the corpus to its trigram vocabulary
    (bounded by charset³); scoring is one vocab-keyed shuffle join.
    Docs shorter than 3 chars have no trigrams and are excluded (same
    filter in the oracle)."""
    from saurav_nayak_recipe_etl_project_spark.operators.text import _char_trigrams

    occ = _char_trigrams(docs.select(F.col(id_col).alias("doc_id"),
                                     F.col(text_col).alias("text")), "doc_id")
    c3 = occ.groupBy("tg").agg(F.count("*").alias("c3"))
    c2 = (
        occ.select(F.col("tg").substr(1, 2).alias("ctx"))
        .groupBy("ctx").agg(F.count("*").alias("c2"))
    )
    vsize = occ.select(F.col("tg").substr(3, 1).alias("last")).agg(
        F.count_distinct("last").cast("long").alias("v")
    )
    # lp_micro computed once per DISTINCT trigram: ln((c3+1)/(c2+V)).
    model = (
        c3.withColumn("ctx", F.col("tg").substr(1, 2))
        .join(c2, "ctx")
        .crossJoin(F.broadcast(vsize))
        .select(
            "tg",
            F.round(
                F.log((F.col("c3") + F.lit(1.0)) / (F.col("c2") + F.col("v")))
                * F.lit(MICRO)
            ).cast("long").alias("lp_micro"),
        )
    )
    return (
        # the model is trigram-VOCAB-sized (bounded by charset^3) while
        # occ is corpus-sized: broadcast the model so the scoring join
        # never shuffles the corpus on the trigram key
        occ.join(F.broadcast(model), "tg")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_trigrams"),
            F.sum("lp_micro").alias("sum_lp_micro"),
        )
        .select(
            "doc_id", "n_trigrams", "sum_lp_micro",
            F.round(
                (-F.col("sum_lp_micro")).cast("double")
                / F.col("n_trigrams") / F.lit(MICRO), 6
            ).alias("avg_nll"),
        )
    )


def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered LM quality score over `documents`."""
    return lm_score(load_table(spark, "documents", sf_dir))


PPL_BUCKETS = 3  # CCNet convention: head / middle / tail


def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: every document ranked by its
    LM score (avg negative log-likelihood, best first) and split into
    corpus-wide head/middle/tail TERCILES — the curation step that
    keeps head+middle and drops (or downweights) tail, reported here
    as per-(lang, bucket) mass so the filter's language skew is
    visible before anyone pulls the trigger.

    The tercile assignment is the distributed two-pass rank
    (functions/ranking.py) over the per-doc score frame — nll value
    bands auto-derived from an approxQuantile sample of the observed
    spread (derive_band_width; a hand-tuned nat fraction collapses or
    over-splits when the LM or corpus changes), no global ntile
    window. The sort key is the raw
    double quotient of two per-doc INTEGERS (micro-nat sum /
    trigram count, both < 2^53 so the doubles are exact), doc_id
    tie-break — engine-identical ordering. Per-bucket nll re-derives
    from DECIMAL(38,0)/HUGEINT integer sums, not averaged averages."""
    docs = load_table(spark, "documents", sf_dir)
    per_doc = lm_score(docs).join(docs.select("doc_id", "lang"), "doc_id")
    keyed = per_doc.select(
        "doc_id", "lang", "n_trigrams", "sum_lp_micro",
        (
            (-F.col("sum_lp_micro")).cast("double")
            / F.col("n_trigrams").cast("double")
        ).alias("_nll"),
    )
    # nll band width derived from the observed spread (derive_band_
    # width) — the round-7 hand-tuned sixteenth-nat literal assumed a
    # ~2-nat spread and would collapse under a different LM/corpus.
    # The quantile probe is an extra ACTION: checkpoint the per-doc
    # frame (|docs| rows — tiny next to the trigram pipeline that
    # builds it) so LM scoring runs once, not once per pass
    # (measured: 15.3s -> ~5s at sf0.1 without the checkpoint/with
    # the recompute).
    keyed = keyed.localCheckpoint(eager=False)
    n = keyed.agg(F.count("*").alias("_n"))
    width = derive_band_width(keyed, "_nll")
    ranked = with_global_rank(
        keyed,
        ["_nll", "doc_id"],
        bucket=F.floor(F.col("_nll") / F.lit(width)),
        rank_col="_r",
    ).crossJoin(F.broadcast(n))
    bucketed = ranked.select(
        "lang", "n_trigrams", "sum_lp_micro",
        ntile_from_rank(F.col("_r"), F.col("_n"), PPL_BUCKETS)
        .alias("bucket"),
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_trigrams").alias("n_trigrams_total"),
            F.sum(F.col("sum_lp_micro").cast("decimal(38,0)"))
            .alias("_sum_lp"),
        )
        .select(
            "lang",
            "bucket",
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 2, "middle")
            .otherwise("tail")
            .alias("bucket_label"),
            "n_docs",
            "n_trigrams_total",
            F.round(
                (-F.col("_sum_lp")).cast("double")
                / F.col("n_trigrams_total").cast("double") / F.lit(MICRO),
                6,
            ).alias("avg_nll"),
        )
    )


def quality_lm_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the two independent quality
    signals — the heuristic 5/3/2 ppm blend (operators/text.py) and
    the trigram-LM score — the calibration check a curation pipeline
    runs before trusting either filter alone (agreeing signals can
    gate aggressively; disagreement means the heuristic is measuring
    something else).

    Exact integer end to end: both rankings are distributed two-pass
    ranks over 'better first' orderings with doc_id tie-breaks (a
    PERMUTATION Spearman — ties broken identically on both sides, no
    fractional average ranks, so every quantity stays integral), then
    rho = 1 − 6·Σd²/(n³−n) as a single DECIMAL(38)/HUGEINT floor
    division in micro-units. NULL on a degenerate <2-doc corpus
    instead of a divide-by-zero."""
    from saurav_nayak_recipe_etl_project_spark.operators.text import (
        _quality_weights,
    )

    docs = load_table(spark, "documents", sf_dir)
    q = _quality_weights(docs).select("doc_id", "w_ppm")
    lm = lm_score(docs).select("doc_id", "n_trigrams", "sum_lp_micro")
    j = q.join(lm, "doc_id")
    rq = with_global_rank(
        j.select("doc_id", (-F.col("w_ppm")).alias("_negw")),
        ["_negw", "doc_id"],
        bucket=F.floor(F.col("_negw") / F.lit(50_000)),
        rank_col="rank_q",
    ).select("doc_id", "rank_q")
    lm_keyed = j.select(
        "doc_id",
        (
            (-F.col("sum_lp_micro")).cast("double")
            / F.col("n_trigrams").cast("double")
        ).alias("_nll"),
    ).localCheckpoint(eager=False)  # LM pipeline runs once, not per pass
    # nll band width derived from the observed spread, not a
    # hand-tuned sixteenth-nat literal
    nll_width = derive_band_width(lm_keyed, "_nll")
    rl = with_global_rank(
        lm_keyed,
        ["_nll", "doc_id"],
        bucket=F.floor(F.col("_nll") / F.lit(nll_width)),
        rank_col="rank_lm",
    ).select("doc_id", "rank_lm")
    stats = (
        rq.join(rl, "doc_id")
        .select((F.col("rank_q") - F.col("rank_lm")).alias("d"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("d").cast("decimal(38,0)") * F.col("d"))
            .alias("sd2"),
        )
    )
    return stats.select(
        F.col("n").alias("n_docs"),
        F.expr(
            "cast(1000000 - (6000000 * sd2) DIV nullif("
            "cast(n as decimal(38,0)) * n * n - n, 0) as bigint)"
        ).alias("rho_micro"),
    ).select(
        "n_docs",
        "rho_micro",
        (F.col("rho_micro").cast("double") / F.lit(1e6)).alias("rho"),
    )


RETRIEVAL_QUERIES = {
    "rrf_hybrid_search": rrf_hybrid_search,
    "bm25_search": bm25_search,
    "text_lm_score": text_lm_score,
    "perplexity_buckets": perplexity_buckets,
    "quality_lm_spearman": quality_lm_spearman,
}

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"

RETRIEVAL_ORACLES = {
    # Identical arithmetic association as the Spark expressions; the
    # only transcendental (ln) is immediately micro-rounded on both
    # sides (module docstring).
    "rrf_hybrid_search": f"""
        WITH toks AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        doclen AS (
          SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks
        ),
        occ AS (
          SELECT doc_id, unnest(toks) AS w FROM toks
        ),
        words AS (
          SELECT w, COUNT(*) AS n FROM occ GROUP BY w
        ),
        qterms AS (
          SELECT CAST((rank - {BM25_RANK_LO}) % {N_BM25_QUERIES} AS BIGINT)
                   AS query_id, w
          FROM (
            SELECT w, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rank
            FROM words
          )
          WHERE rank >= {BM25_RANK_LO}
            AND rank < {BM25_RANK_LO + 2 * N_BM25_QUERIES}
        ),
        stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS total_dl,
                 CAST(SUM(dl) AS BIGINT) * 1.0 / CAST(COUNT(*) AS BIGINT)
                   AS avgdl
          FROM doclen
        ),
        hits AS (
          SELECT query_id, occ.w AS w, doc_id
          FROM occ JOIN qterms ON occ.w = qterms.w
        ),
        tf AS (
          SELECT query_id, w, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
          FROM hits GROUP BY query_id, w, doc_id
        ),
        df_tbl AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS df
          FROM (SELECT DISTINCT w, doc_id FROM hits) GROUP BY w
        ),
        bm_contrib AS (
          SELECT query_id, doc_id,
            CAST(ROUND(
              ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
              * ((tf * {BM25_K1 + 1.0}) /
                 (tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * (dl / avgdl))))
              * {MICRO}
            ) AS BIGINT) AS c_micro
          FROM tf
          JOIN df_tbl USING (w)
          JOIN doclen USING (doc_id)
          CROSS JOIN stats
        ),
        bm_per_doc AS (
          SELECT query_id, doc_id,
                 CAST(SUM(c_micro) AS BIGINT) AS bm25_micro
          FROM bm_contrib GROUP BY query_id, doc_id
        ),
        cand AS (
          SELECT DISTINCT query_id, doc_id FROM hits
        ),
        qcf AS (
          SELECT query_id, qterms.w AS w, CAST(n AS BIGINT) AS cf
          FROM qterms JOIN words ON qterms.w = words.w
        ),
        ql_contrib AS (
          SELECT cand.query_id, cand.doc_id,
            CAST(ROUND(
              ln((COALESCE(tf.tf, 0) + {QL_MU} * (qcf.cf / stats.total_dl))
                 / (doclen.dl + {QL_MU}))
              * {MICRO}
            ) AS BIGINT) AS q_micro
          FROM cand
          JOIN qcf ON cand.query_id = qcf.query_id
          LEFT JOIN tf ON cand.query_id = tf.query_id
            AND qcf.w = tf.w AND cand.doc_id = tf.doc_id
          JOIN doclen ON cand.doc_id = doclen.doc_id
          CROSS JOIN stats
        ),
        ql_per_doc AS (
          SELECT query_id, doc_id,
                 CAST(SUM(q_micro) AS BIGINT) AS ql_micro
          FROM ql_contrib GROUP BY query_id, doc_id
        ),
        fused AS (
          SELECT b.query_id, b.doc_id,
            CAST(ROW_NUMBER() OVER (PARTITION BY b.query_id
              ORDER BY b.bm25_micro DESC, b.doc_id) AS BIGINT) AS r_bm25,
            CAST(ROW_NUMBER() OVER (PARTITION BY b.query_id
              ORDER BY q.ql_micro DESC, b.doc_id) AS BIGINT) AS r_ql
          FROM bm_per_doc b
          JOIN ql_per_doc q
            ON b.query_id = q.query_id AND b.doc_id = q.doc_id
        ),
        rrf AS (
          SELECT query_id, doc_id, r_bm25, r_ql,
            CAST(1000000 // ({RRF_K} + r_bm25)
                 + 1000000 // ({RRF_K} + r_ql) AS BIGINT) AS rrf_ppm
          FROM fused
        ),
        qlabels AS (
          SELECT query_id, string_agg(w, ' ' ORDER BY w) AS terms
          FROM qterms GROUP BY query_id
        )
        SELECT query_id, terms, doc_id, r_bm25, r_ql, rrf_ppm,
               CAST(rank AS BIGINT) AS rank
        FROM (
          SELECT query_id, doc_id, r_bm25, r_ql, rrf_ppm,
            ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY rrf_ppm DESC, doc_id
            ) AS rank
          FROM rrf
        )
        JOIN qlabels USING (query_id)
        WHERE rank <= {BM25_TOP_K}
    """,
    "bm25_search": f"""
        WITH toks AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        doclen AS (
          SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks
        ),
        occ AS (
          SELECT doc_id, unnest(toks) AS w FROM toks
        ),
        words AS (
          SELECT w, COUNT(*) AS n FROM occ GROUP BY w
        ),
        qterms AS (
          SELECT CAST((rank - {BM25_RANK_LO}) % {N_BM25_QUERIES} AS BIGINT)
                   AS query_id, w
          FROM (
            SELECT w, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rank
            FROM words
          )
          WHERE rank >= {BM25_RANK_LO}
            AND rank < {BM25_RANK_LO + 2 * N_BM25_QUERIES}
        ),
        stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS total_dl,
                 CAST(SUM(dl) AS BIGINT) * 1.0 / CAST(COUNT(*) AS BIGINT)
                   AS avgdl
          FROM doclen
        ),
        hits AS (
          SELECT query_id, occ.w AS w, doc_id
          FROM occ JOIN qterms ON occ.w = qterms.w
        ),
        tf AS (
          SELECT query_id, w, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
          FROM hits GROUP BY query_id, w, doc_id
        ),
        df_tbl AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS df
          FROM (SELECT DISTINCT w, doc_id FROM hits) GROUP BY w
        ),
        contrib AS (
          SELECT query_id, doc_id,
            CAST(ROUND(
              ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
              * ((tf * {BM25_K1 + 1.0}) /
                 (tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * (dl / avgdl))))
              * {MICRO}
            ) AS BIGINT) AS c_micro
          FROM tf
          JOIN df_tbl USING (w)
          JOIN doclen USING (doc_id)
          CROSS JOIN stats
        ),
        per_doc AS (
          SELECT query_id, doc_id,
                 CAST(SUM(c_micro) AS BIGINT) AS score_micro,
                 CAST(COUNT(*) AS BIGINT) AS n_terms_hit
          FROM contrib GROUP BY query_id, doc_id
        ),
        qlabels AS (
          SELECT query_id, string_agg(w, ' ' ORDER BY w) AS terms
          FROM qterms GROUP BY query_id
        )
        SELECT query_id, terms, doc_id, n_terms_hit, score_micro,
               score_micro / {MICRO} AS score,
               CAST(rank AS BIGINT) AS rank
        FROM (
          SELECT query_id, doc_id, score_micro, n_terms_hit,
            ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY score_micro DESC, doc_id
            ) AS rank
          FROM per_doc
        )
        JOIN qlabels USING (query_id)
        WHERE rank <= {BM25_TOP_K}
    """,
    "text_lm_score": f"""
        WITH {{lm_ctes}}
        SELECT doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_trigrams,
          CAST(SUM(lp_micro) AS BIGINT) AS sum_lp_micro,
          ROUND(CAST(-SUM(lp_micro) AS DOUBLE) / COUNT(*) / {MICRO}, 6)
            AS avg_nll
        FROM occ JOIN model USING (tg)
        GROUP BY doc_id
    """,
    "perplexity_buckets": f"""
        WITH {{lm_ctes}},
        per_doc AS (
          SELECT doc_id,
            CAST(COUNT(*) AS BIGINT) AS n_trigrams,
            CAST(SUM(lp_micro) AS BIGINT) AS sum_lp
          FROM occ JOIN model USING (tg)
          GROUP BY doc_id
        ),
        ranked AS (
          SELECT d.doc_id, docs.lang, d.n_trigrams, d.sum_lp,
            CAST(NTILE({PPL_BUCKETS}) OVER (
              ORDER BY CAST(-d.sum_lp AS DOUBLE)
                       / CAST(d.n_trigrams AS DOUBLE),
                       d.doc_id) AS BIGINT) AS bucket
          FROM per_doc d JOIN documents docs USING (doc_id)
        )
        SELECT lang, bucket,
          CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
               ELSE 'tail' END AS bucket_label,
          COUNT(*) AS n_docs,
          CAST(SUM(n_trigrams) AS BIGINT) AS n_trigrams_total,
          ROUND(CAST(-SUM(CAST(sum_lp AS HUGEINT)) AS DOUBLE)
                / CAST(SUM(n_trigrams) AS DOUBLE) / {MICRO}, 6)
            AS avg_nll
        FROM ranked GROUP BY lang, bucket
    """,
}

# The trigram-LM model CTEs are shared by text_lm_score and
# perplexity_buckets — one definition, spliced into both oracles.
_LM_CTES = f"""occ AS (
          SELECT doc_id,
            unnest(list_transform(generate_series(1, length(text) - 2),
                                  i -> substr(text, CAST(i AS INT), 3)))
              AS tg
          FROM documents WHERE length(text) >= 3
        ),
        c3 AS (SELECT tg, COUNT(*) AS c3 FROM occ GROUP BY tg),
        c2 AS (
          SELECT substr(tg, 1, 2) AS ctx, COUNT(*) AS c2
          FROM occ GROUP BY substr(tg, 1, 2)
        ),
        vsize AS (
          SELECT CAST(COUNT(DISTINCT substr(tg, 3, 1)) AS BIGINT) AS v
          FROM occ
        ),
        model AS (
          SELECT tg,
            CAST(ROUND(ln((c3 + 1.0) / (c2 + v)) * {MICRO}) AS BIGINT)
              AS lp_micro
          FROM c3
          JOIN c2 ON substr(c3.tg, 1, 2) = c2.ctx
          CROSS JOIN vsize
        )"""

def _quality_w_ppm_sql() -> str:
    """The heuristic quality-weight CTEs (pre/qw), shared with
    operators/text.py's sampler oracles — built lazily to avoid a
    module-level circular import."""
    from saurav_nayak_recipe_etl_project_spark.operators.text import (
        _STOP_SQL,
        _TOKS,
    )

    return f"""pre AS (
          SELECT doc_id,
            GREATEST(length(text), 1) AS n_chars,
            GREATEST(len({_TOKS}), 1) AS n_tokens,
            length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
              AS punct_chars,
            len(list_filter({_TOKS}, t -> t IN {_STOP_SQL['en']}))
              AS stop_hits
          FROM documents
        ),
        qw AS (
          SELECT doc_id,
            (LEAST(n_tokens * 20000, 1000000) * 5
             + (1000000 - punct_chars * 1000000 // n_chars) * 3
             + LEAST(stop_hits * 5000000 // n_tokens, 1000000) * 2) // 10
              AS w_ppm
          FROM pre
        )"""


RETRIEVAL_ORACLES["quality_lm_spearman"] = f"""
        WITH {{lm_ctes}},
        {{qw_ctes}},
        per_doc AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
                 CAST(SUM(lp_micro) AS BIGINT) AS sum_lp
          FROM occ JOIN model USING (tg) GROUP BY doc_id
        ),
        ranked AS (
          SELECT q.doc_id,
            ROW_NUMBER() OVER (ORDER BY -q.w_ppm, q.doc_id) AS rank_q,
            ROW_NUMBER() OVER (
              ORDER BY CAST(-p.sum_lp AS DOUBLE)
                       / CAST(p.n_trigrams AS DOUBLE), p.doc_id) AS rank_lm
          FROM qw q JOIN per_doc p USING (doc_id)
        ),
        stats AS (
          SELECT COUNT(*) AS n,
            SUM(CAST(rank_q - rank_lm AS HUGEINT) * (rank_q - rank_lm))
              AS sd2
          FROM ranked
        )
        SELECT CAST(n AS BIGINT) AS n_docs,
          CAST(1000000 - (6000000 * sd2)
               // NULLIF(CAST(n AS HUGEINT) * n * n - n, 0) AS BIGINT)
            AS rho_micro,
          CAST(CAST(1000000 - (6000000 * sd2)
               // NULLIF(CAST(n AS HUGEINT) * n * n - n, 0) AS BIGINT)
               AS DOUBLE) / 1e6 AS rho
        FROM stats
    """

for _name in ("text_lm_score", "perplexity_buckets"):
    RETRIEVAL_ORACLES[_name] = RETRIEVAL_ORACLES[_name].format(
        lm_ctes=_LM_CTES
    )
RETRIEVAL_ORACLES["quality_lm_spearman"] = RETRIEVAL_ORACLES[
    "quality_lm_spearman"
].format(lm_ctes=_LM_CTES, qw_ctes=_quality_w_ppm_sql())
