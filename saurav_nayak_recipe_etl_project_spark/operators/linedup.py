"""Sub-document dedup + benchmark decontamination.

Two training-corpus hygiene operators the document-level dedup family
(operators/dedup.py) does not cover:

- segment-level exact dedup (the CCNet/RefinedWeb "line dedup" shape):
  boilerplate repeats ACROSS documents that are not duplicates of each
  other; dedup at segment granularity and reassemble the survivors.
- n-gram decontamination (the GPT-3 appendix-C shape): flag training
  documents that share any word n-gram with a held-out benchmark
  corpus, with per-doc overlap statistics.

Reference parity: the reference pipeline dedups nothing (Firestore
doc-ids are unique by construction; see src/etl_pipeline.py); these
extend its corpus hygiene the way a training-data pipeline needs.

Scale notes:
- Segment grouping is (doc_id, seg_idx) — co-partitioned with the
  token explode, bounded groups (seg_words tokens). The global
  keep-first decision is ONE shuffle on the segment text (in
  production: on xxhash64(segment) — string keys kept here only for
  oracle portability). Reassembly rides the doc_id partitioning.
- Decontamination joins distinct (doc, gram) rows on the gram key:
  an inverted-index equi-join, never a doc x doc cross product. The
  benchmark side is the small one; at 100 TB hash the gram to a long
  and let AQE pick broadcast when the benchmark fits.
- Everything is whole-stage-codegen Column algebra: the per-segment
  token pivot is |seg_words| conditional MAXes + concat_ws (no
  interpreted HOF in the hot path); only report-sized reassembly uses
  an array HOF over per-doc segment lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from saurav_nayak_recipe_etl_project_spark.functions.text_fn import tokens
from saurav_nayak_recipe_etl_project_spark.operators.dedup import shingle_rows
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

SEG_WORDS = 10
DECON_N = 5


def segment_rows(docs: DataFrame, seg_words: int = SEG_WORDS,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, seg_idx, segment): consecutive seg_words-token chunks.

    The within-segment token order is rebuilt with seg_words
    conditional MAX picks + concat_ws (concat_ws skips the NULLs of a
    short tail segment) — all codegen, no collect_list/HOF."""
    toks = tokens(F.col(text_col))
    t = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.posexplode(toks).alias("pos", "tok"))
        .withColumn("seg_idx", F.expr(f"pos DIV {seg_words}"))
    )
    picks = [
        F.max(F.when(F.col("pos") % seg_words == k, F.col("tok")))
        for k in range(seg_words)
    ]
    return t.groupBy("doc_id", "seg_idx").agg(
        F.concat_ws(" ", *picks).alias("segment")
    )


def segment_dedup(docs: DataFrame, seg_words: int = SEG_WORDS,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Segment-level exact dedup with first-occurrence keepers.

    A segment survives only in the (doc_id, seg_idx)-earliest document
    that contains it; every doc is returned (n_kept = 0 and empty
    kept_text when everything it had was boilerplate)."""
    seg = segment_rows(docs, seg_words, text_col, id_col)
    w = Window.partitionBy("segment").orderBy("doc_id", "seg_idx")
    kept = seg.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    totals = seg.groupBy("doc_id").agg(F.count("*").alias("n_segments"))
    re = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(seg_idx, "
            "segment))), s -> s.segment), ' ')"
        ).alias("kept_text"),
    )
    return (
        totals.join(re, "doc_id", "left")
        .select(
            "doc_id",
            "n_segments",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("kept_text"), F.lit("")).alias("kept_text"),
        )
    )


def ngram_decontaminate(train: DataFrame, benchmark: DataFrame,
                        n: int = DECON_N, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Per-train-doc benchmark overlap: distinct word n-grams shared
    with ANY benchmark document. Returns only contaminated docs —
    anti-join the result against the corpus to get the clean set."""
    tr = shingle_rows(train, n, text_col, id_col)
    be = (
        shingle_rows(benchmark, n, text_col, id_col)
        .select("shingle")
        .distinct()
    )
    sizes = tr.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        tr.join(be, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "n_grams",
        "n_shared",
        F.round(F.col("n_shared") / F.col("n_grams"), 6).alias("share"),
    )


def containment_pairs(docs: DataFrame, tau: float = 0.8, n: int = 3,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """ASYMMETRIC near-dup: containment(A in B) = |grams(A) ∩ grams(B)|
    / |grams(A)|. Jaccard misses a short document quoted inside a long
    one (the union term swamps it); containment is the standard fix
    (Broder's resemblance vs containment distinction). Same
    inverted-index gram join as the Jaccard path — pairs only form on
    shared grams, never doc x doc — then BOTH directions are evaluated
    and rows emitted as (contained_id, container_id). Equal-size
    mutual containment emits both directions by design (the caller's
    keeper policy picks)."""
    sh = shingle_rows(docs, n, text_col, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    a = sh.withColumnRenamed("doc_id", "a_id")
    b = sh.withColumnRenamed("doc_id", "b_id")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a_id") != F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed(
        "n_grams", "n_a")
    cont = F.col("inter") / F.col("n_a")
    # pure-integer threshold (tau as a per-mille rational) — no double
    # compare at the inclusion boundary, and 0.001 granularity so a
    # caller-supplied tau like 0.85 is honored exactly (a coarser
    # 0.1-scale quantization silently loosened it to 0.8)
    tau_num = int(round(tau * 1000))
    return (
        inter.join(na, "a_id")
        .where(F.col("inter") * 1000 >= F.lit(tau_num) * F.col("n_a"))
        .select(
            F.col("a_id").alias("contained_id"),
            F.col("b_id").alias("container_id"),
            F.round(cont, 6).alias("containment"),
        )
    )


def dedup_subset_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: containment >= 0.8 pairs over documents."""
    return containment_pairs(load_table(spark, "documents", sf_dir))


def dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: 10-word segment dedup over the documents table."""
    return segment_dedup(load_table(spark, "documents", sf_dir))


def decontaminate_5gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: treat source 'src0' as the held-out benchmark
    corpus and flag 5-gram overlap in the other sources' documents."""
    docs = load_table(spark, "documents", sf_dir)
    return ngram_decontaminate(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=DECON_N,
    )


def ngram_novelty(docs: DataFrame, n: int = DECON_N,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document n-gram NOVELTY against everything that came before
    it in doc_id order — the corpus-curation curve (RefinedWeb /
    FineWeb ablations track it) that says how much genuinely new text
    each marginal document contributes; a falling novelty share is the
    signal to stop crawling a source.

    first-owner(shingle) = MIN(doc_id) over the docs containing it —
    one groupBy on the shingle key (inverted index, never doc x doc);
    a doc's novelty is the share of its DISTINCT shingles it owns.
    novelty_ppm is integer floor-division (engine-exact); docs shorter
    than n tokens have no shingles and drop out (both engines).
    Scale: two shuffles (shingle key, then doc_id rollup), both
    map-side combined; at 100 TB hash the shingle to a long first."""
    sh = shingle_rows(docs, n, text_col, id_col)
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
            .alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        F.expr("n_novel * 1000000 DIV n_shingles").alias("novelty_ppm"),
    )


def doc_novelty_5gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: 5-gram novelty share per document."""
    return ngram_novelty(load_table(spark, "documents", sf_dir))


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def overlapping_chunks(docs: DataFrame, chunk_tokens: int = CHUNK_TOKENS,
                       stride: int = CHUNK_STRIDE, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Sliding-window document chunking — the RAG / pretraining prep
    step (chunk_tokens-token windows every stride tokens, overlap =
    chunk_tokens - stride so no boundary sentence is ever lost to a
    hard cut). Chunk starts are 0, stride, 2·stride, ... while start <
    n_tokens (so a short doc yields one chunk and a doc ending just
    past a stride boundary yields a short tail chunk — both engines
    agree by construction).

    Pure column algebra: one sequence() of starts + transform/slice
    over the token array — no explode-then-window, no UDF; the row
    expansion is the final posexplode of per-doc chunk arrays. Scales
    as a map-only operator (zero shuffles; output rows ~ n_tokens /
    stride per doc)."""
    toks = tokens(F.col(text_col))
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        F.size(toks).alias("_n"),
    ).where(F.col("_n") > 0)
    starts = F.sequence(
        F.lit(0),
        F.col("_n") - 1,
        F.lit(stride),
    )
    chunks = F.transform(
        starts,
        lambda s: F.concat_ws(
            " ", F.slice(F.col("_toks"), s + 1, chunk_tokens)
        ),
    )
    return (
        t.select("doc_id", "_n", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * stride).cast("long").alias("start_tok"),
            F.least(
                F.lit(chunk_tokens), F.col("_n") - F.col("chunk_idx") * stride
            ).cast("long").alias("n_tokens"),
            "chunk",
        )
    )


def doc_chunks_overlapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: 64-token windows, stride 48, over documents."""
    return overlapping_chunks(load_table(spark, "documents", sf_dir))


# 5-gram analog of dedup.py's _SHINGLES oracle macro.
_GRAMS5 = """
    CASE WHEN len(toks) >= 5 THEN list_distinct(
      list_transform(generate_series(1, len(toks) - 4),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             || ' ' || toks[i+3] || ' ' || toks[i+4]))
    ELSE [] END
"""

LINEDUP_QUERIES = {
    "dedup_segments": dedup_segments,
    "decontaminate_5gram": decontaminate_5gram,
    "dedup_subset_containment": dedup_subset_containment,
    "doc_novelty_5gram": doc_novelty_5gram,
    "doc_chunks_overlapping": doc_chunks_overlapping,
}

# 3-gram analog reused from dedup.py's oracle macro shape.
_GRAMS3 = """
    CASE WHEN len(toks) >= 3 THEN list_distinct(
      list_transform(generate_series(1, len(toks) - 2),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
    ELSE [] END
"""

LINEDUP_ORACLES = {
    "dedup_subset_containment": f"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents
        ),
        sh AS (
          SELECT doc_id, unnest({_GRAMS3}) AS shingle FROM t
        ),
        sizes AS (
          SELECT doc_id, COUNT(*) AS n_grams FROM sh GROUP BY doc_id
        ),
        inter AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT a_id AS contained_id, b_id AS container_id,
          ROUND(inter * 1.0 / n_grams, 6) AS containment
        FROM inter JOIN sizes ON inter.a_id = sizes.doc_id
        WHERE inter * 1000 >= 800 * n_grams
    """,
    "dedup_segments": """
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok,
                 generate_subscripts(
                   regexp_split_to_array(trim(text), '\\s+'), 1) - 1 AS pos
          FROM documents
        ),
        seg AS (
          SELECT doc_id, pos // 10 AS seg_idx,
                 string_agg(tok, ' ' ORDER BY pos) AS segment
          FROM toks GROUP BY doc_id, pos // 10
        ),
        kept AS (
          SELECT doc_id, seg_idx, segment,
                 ROW_NUMBER() OVER (PARTITION BY segment
                                    ORDER BY doc_id, seg_idx) AS rn
          FROM seg
        ),
        totals AS (
          SELECT doc_id, COUNT(*) AS n_segments FROM seg GROUP BY doc_id
        ),
        re AS (
          SELECT doc_id, COUNT(*) AS n_kept,
                 string_agg(segment, ' ' ORDER BY seg_idx) AS kept_text
          FROM kept WHERE rn = 1 GROUP BY doc_id
        )
        SELECT t.doc_id, t.n_segments,
               COALESCE(re.n_kept, 0) AS n_kept,
               COALESCE(re.kept_text, '') AS kept_text
        FROM totals t LEFT JOIN re ON t.doc_id = re.doc_id
    """,
    "doc_chunks_overlapping": f"""
        WITH t AS (
          SELECT doc_id,
            regexp_split_to_array(trim(text), '\\s+') AS toks,
            len(regexp_split_to_array(trim(text), '\\s+')) AS n
          FROM documents
        ),
        starts AS (
          SELECT doc_id, n, toks,
            unnest(generate_series(0, CAST(n - 1 AS BIGINT),
                                   {CHUNK_STRIDE})) AS s
          FROM t WHERE n > 0
        )
        SELECT doc_id,
          CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
          CAST(s AS BIGINT) AS start_tok,
          CAST(LEAST({CHUNK_TOKENS}, n - s) AS BIGINT) AS n_tokens,
          array_to_string(
            toks[CAST(s + 1 AS BIGINT):CAST(s + {CHUNK_TOKENS} AS BIGINT)],
            ' ') AS chunk
        FROM starts
    """,
    "doc_novelty_5gram": f"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents
        ),
        sh AS (
          SELECT doc_id, unnest({_GRAMS5}) AS shingle FROM t
        ),
        firsts AS (
          SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
        )
        SELECT sh.doc_id,
          COUNT(*) AS n_shingles,
          CAST(SUM(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_novel,
          CAST(SUM(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
               * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
        FROM sh JOIN firsts USING (shingle)
        GROUP BY sh.doc_id
    """,
    "decontaminate_5gram": f"""
        WITH t AS (
          SELECT doc_id, source,
                 regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents
        ),
        grams AS (
          SELECT doc_id, source, unnest({_GRAMS5}) AS shingle FROM t
        ),
        bench AS (
          SELECT DISTINCT shingle FROM grams WHERE source = 'src0'
        ),
        train AS (
          SELECT doc_id, shingle FROM grams WHERE source <> 'src0'
        ),
        sizes AS (
          SELECT doc_id, COUNT(*) AS n_grams FROM train GROUP BY doc_id
        ),
        hits AS (
          SELECT doc_id, COUNT(*) AS n_shared
          FROM train JOIN bench USING (shingle)
          GROUP BY doc_id
        )
        SELECT h.doc_id, s.n_grams, h.n_shared,
               ROUND(h.n_shared * 1.0 / s.n_grams, 6) AS share
        FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
    """,
}
