"""Text-analysis operators over the `documents` table.

The training-data-pipeline extensions mandated beyond the reference's
own surface: token counting (whitespace + BPE-ish regex), quality
scoring (length/punct/stopword ratios), language ID (stopword-hit
heuristic), and content fingerprinting (set-signature + rolling hash).

Everything is built-in-function Column algebra — split, regexp,
higher-order folds — zero Python in the row path, so throughput is
whole-stage-codegen bound and the operators scale to 100 TB of text by
partition count alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.functions.text_fn import (
    BPE_PIECE,
    rolling_hash,
    tokens,
)
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

STOPWORDS = {
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "ein"),
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "pour"),
    "zh": ("的", "是", "在", "了", "我", "有", "和", "不"),
}
# Flat english-ish stoplist for the quality score.
QUALITY_STOPWORDS = STOPWORDS["en"]


def _hits(toks, words) -> F.Column:
    lst = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lst, t)))


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — whitespace and BPE-ish token counts per document."""
    docs = load_table(spark, "documents", sf_dir)
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PIECE), 0)).cast("long")
        .alias("bpe_tokens"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — quality scoring: length, punctuation ratio, stopword ratio,
    blended score. Pure integer counts + one division each, so the
    values are bit-identical across engines."""
    docs = load_table(spark, "documents", sf_dir)
    toks = tokens(F.col("text"))
    n_chars = F.length("text")
    n_tokens = F.size(toks)
    punct_chars = F.length(F.regexp_replace("text", "[A-Za-z0-9\\s]", ""))
    stop_hits = _hits(toks, QUALITY_STOPWORDS)
    punct_ratio = punct_chars / n_chars
    stop_ratio = stop_hits / n_tokens
    score = (
        F.least(F.lit(1.0), n_tokens / F.lit(50.0)) * 0.5
        + (1 - punct_ratio) * 0.3
        + F.least(F.lit(1.0), stop_ratio * 5) * 0.2
    )
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def stopword_langid(docs: DataFrame) -> DataFrame:
    """Language ID by per-language stopword hits; deterministic argmax
    with alphabetical tiebreak via an explicit CASE chain."""
    toks = tokens(F.col("text"))
    hit_cols = {lang: _hits(toks, words) for lang, words in STOPWORDS.items()}
    with_hits = docs.select(
        "doc_id", F.col("lang").alias("labeled_lang"),
        *[c.alias(f"h_{lang}") for lang, c in hit_cols.items()],
    )
    best = F.greatest(*[F.col(f"h_{lang}") for lang in STOPWORDS])
    pred = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(F.col(f"h_{lang}") == best, lang).otherwise(pred)
    return with_hits.select(
        "doc_id",
        "labeled_lang",
        F.when(best > 0, pred).otherwise("und").alias("predicted_lang"),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — language ID by per-language stopword hits."""
    return stopword_langid(load_table(spark, "documents", sf_dir))


N_PROFILE_TRIGRAMS = 64


def _char_trigrams(docs: DataFrame, *cols: str) -> DataFrame:
    """One row per char-3-gram occurrence (with multiplicity):
    explode a position sequence, then a codegen'd substr — the same
    explode-not-HOF shape as shingle_rows. Texts under 3 chars are
    filtered first (Spark's sequence(1, 0) DESCENDS, it isn't empty)."""
    return docs.filter(F.length("text") >= 3).select(
        *cols, "text",
        F.explode(F.sequence(F.lit(1), F.length("text") - 2)).alias("i"),
    ).select(*cols, F.col("text").substr(F.col("i"), F.lit(3)).alias("tg"))


def charngram_langid(docs: DataFrame,
                     profile_docs: DataFrame | None = None,
                     top_n: int = N_PROFILE_TRIGRAMS) -> DataFrame:
    """Char-3-gram-profile language ID.

    Profiles are the `top_n` most frequent character trigrams per
    labeled language in `profile_docs` (default: the corpus itself) —
    built distributed (explode → count → per-lang rank) but tiny
    (langs × top_n rows), so the scoring join broadcasts the profile.
    A doc's score for a language is how many of its trigram
    OCCURRENCES appear in that language's profile; argmax with
    alphabetical tiebreak, 'und' when nothing matches. Char profiles
    pick up orthography (accents, digraphs, CJK) that the stopword
    heuristic misses on stopword-free text."""
    from pyspark.sql.window import Window

    profile_src = profile_docs if profile_docs is not None else docs
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tg"))
    profile = (
        _char_trigrams(profile_src, "lang")
        .groupBy("lang", "tg")
        .agg(F.count("*").alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .select(F.col("lang").alias("p_lang"), "tg")
    )
    doc_tg = _char_trigrams(docs, "doc_id")
    hits = (
        doc_tg.join(F.broadcast(profile), "tg")
        .groupBy("doc_id")
        .agg(*[
            F.sum(F.when(F.col("p_lang") == lang, 1).otherwise(0))
            .alias(f"h_{lang}")
            for lang in STOPWORDS
        ])
    )
    scored = docs.select(
        "doc_id", F.col("lang").alias("labeled_lang")
    ).join(hits, "doc_id", "left").na.fill(0)
    best = F.greatest(*[F.col(f"h_{lang}") for lang in STOPWORDS])
    pred = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(F.col(f"h_{lang}") == best, lang).otherwise(pred)
    return scored.select(
        "doc_id",
        "labeled_lang",
        F.when(best > 0, pred).otherwise("und").alias("predicted_lang"),
    )


def text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-3-gram-profile language ID (profiles from the corpus)."""
    return charngram_langid(load_table(spark, "documents", sf_dir))


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 — two content fingerprints per doc: an order-insensitive
    set signature (md5 of sorted distinct tokens; dedup-grade) and an
    order-sensitive polynomial rolling hash."""
    docs = load_table(spark, "documents", sf_dir)
    toks = tokens(F.col("text"))
    set_sig = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    return docs.select(
        "doc_id",
        set_sig.alias("set_signature"),
        rolling_hash(F.col("text")).alias("rolling_hash"),
    )


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition score: fraction of all 3-gram occurrences taken by
    the single most repeated 3-gram — the boilerplate/spam signal
    training-data filters cut on. One explode + two aggregations."""
    from saurav_nayak_recipe_etl_project_spark.operators.dedup import shingle_rows

    docs = load_table(spark, "documents", sf_dir)
    sh = shingle_rows(docs, n=3, distinct=False)
    per_shingle = sh.groupBy("doc_id", "shingle").agg(F.count("*").alias("c"))
    return (
        per_shingle.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_shingles"),
            F.max("c").alias("max_repeat"),
        )
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("max_repeat").cast("long").alias("max_repeat"),
            F.round(F.col("max_repeat") / F.col("n_shingles"), 6)
            .alias("repetition_ratio"),
        )
    )


def quality_reasons(text_col: F.Column | None = None) -> F.Column:
    """Failure-reason CSV Column for the Gopher-style rule stack —
    exposed as a pure Column so composers (pipelines.py) can filter
    inline on the SAME scan instead of joining a second load."""
    text = text_col if text_col is not None else F.col("text")
    n_chars = F.length(text)
    toks = tokens(text)
    n_tokens = F.size(toks)
    digits = n_chars - F.length(F.regexp_replace(text, F.lit("[0-9]"), F.lit("")))
    spaces = n_chars - F.length(F.regexp_replace(text, F.lit("\\s"), F.lit("")))
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tokens
    return F.concat_ws(
        ",",
        F.when(digits / n_chars > 0.2, "digit_heavy"),
        F.when((n_tokens >= 5) & (distinct_ratio < 0.3), "repetitive"),
        F.when(spaces / n_chars > 0.5, "space_heavy"),
        F.when(n_chars > 20000, "too_long"),
        F.when(n_chars < 20, "too_short"),
    )


def quality_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite keep/drop document filter (Gopher-style rule stack),
    language-neutral so CJK text is not penalized for lacking spaces:
    char-length bounds, digit-ratio, whitespace-ratio, and a
    distinct-token repetition rule. Emits the failure reasons as a
    fixed-order CSV so a pipeline can report WHY rows dropped —
    pure Column algebra, one scan, no shuffle."""
    docs = load_table(spark, "documents", sf_dir)
    reasons = quality_reasons()
    return docs.select(
        "doc_id",
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def source_quality_scorecard(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """F75 — per-source rejection-reason breakdown: for every source,
    how many documents each Gopher-style rule flags (reasons are
    non-exclusive) plus the `_kept` row — the "WHY is src7 losing 40%
    of its docs" report a pipeline owner reads before renegotiating a
    source or retuning a rule. Shares are truncating ppm of the
    SOURCE's docs, so rows are comparable across differently-sized
    sources.

    One scan: quality_reasons() is a pure Column on the same pass,
    the reason explode is bounded by 5 rules/doc, and the rollup
    frame is (source × ≤6 reasons). Exact integers throughout."""
    docs = load_table(spark, "documents", sf_dir)
    flagged = docs.select("source", quality_reasons().alias("reasons"))
    per_src = flagged.groupBy("source").agg(
        F.count("*").alias("source_docs"),
        F.sum((F.col("reasons") == "").cast("long")).alias("n_kept"),
    )
    reason_rows = (
        flagged.where(F.col("reasons") != "")
        .select(
            "source",
            F.explode(F.split("reasons", ",")).alias("reason"),
        )
        .groupBy("source", "reason")
        .agg(F.count("*").alias("n_docs"))
    )
    kept_rows = per_src.select(
        "source", F.lit("_kept").alias("reason"),
        F.col("n_kept").alias("n_docs"),
    )
    return (
        reason_rows.unionByName(kept_rows)
        .join(
            F.broadcast(per_src.select("source", "source_docs")),
            "source",
        )
        .select(
            "source", "reason", "n_docs", "source_docs",
            F.expr(
                "CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000"
                " DIV source_docs AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


def quality_score_micro(text_col: F.Column | None = None) -> F.Column:
    """The F8 blended quality score micro-rounded ONCE — the shared
    integer score every downstream consumer (threshold sweep, dup
    exposure by quality) compares/bands on, so no float ever sits at
    a cutoff boundary. Same double expression the oracled F8 entry
    proves cross-engine.

    TOTAL on degenerate docs (r10 ADVICE): an empty text would zero
    the punct-ratio divisor — ANSI Spark raises, non-ANSI Spark
    yields NULL, and DuckDB raises/NULLs depending on the operator:
    three different behaviors for the same doc. The score is instead
    DEFINED as 0 (worst quality) when n_chars = 0, via a lazy CASE
    so the division never evaluates — every F8-score consumer then
    classifies degenerate docs deliberately and identically: the
    threshold sweep drops them at every cutoff, the dup-exposure
    banding files them in band 0. (NULL text still propagates NULL;
    consumers coalesce or drop it explicitly.)"""
    text = text_col if text_col is not None else F.col("text")
    toks = tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    punct = F.length(F.regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    stop_hits = _hits(toks, QUALITY_STOPWORDS)
    score = (
        F.least(F.lit(1.0), n_tokens / F.lit(50.0)) * 0.5
        + (1 - punct / n_chars) * 0.3
        + F.least(F.lit(1.0), (stop_hits / n_tokens) * 5) * 0.2
    )
    return (
        F.when(n_chars == 0, F.lit(0).cast("long"))
        .otherwise(F.round(score * 1000000).cast("long"))
    )


def quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention curve over quality-score cutoffs: for each candidate
    threshold (0.1 .. 0.9), how many documents and how many tokens
    survive `quality_score >= t` — the curve a pipeline owner reads
    BEFORE fixing a filter cutoff (F8 scores documents; this prices
    each cutoff in kept data). ppm shares make the trade-off explicit
    at any corpus size.

    Exactness: the score is micro-rounded ONCE per doc (the same
    double expression the oracled F8 entry proves cross-engine), so
    every threshold comparison is INTEGER >= INTEGER — no float at
    any cutoff boundary. Products run in DECIMAL(38,0) (token totals
    * 1e6 pass int64 around sf10).

    Scale shape: the text scan happens once into a per-doc
    (score_micro, n_tokens) stats frame; the 9-row threshold grid
    joins THAT, not the corpus text — 9x a two-column frame, one
    map-side-combined groupBy(threshold)."""
    docs = load_table(spark, "documents", sf_dir)
    per = docs.select(
        quality_score_micro().alias("s"),
        F.size(tokens(F.col("text"))).cast("long").alias("nt"),
    )
    grid = spark.range(1, 10).select(
        (F.col("id") * 100000).alias("thr_micro")
    )
    kept = (
        per.crossJoin(F.broadcast(grid))
        .groupBy("thr_micro")
        .agg(
            F.sum(
                F.when(F.col("s") >= F.col("thr_micro"), 1).otherwise(0)
            ).alias("n_docs_kept"),
            F.sum(
                F.when(F.col("s") >= F.col("thr_micro"), F.col("nt"))
                .otherwise(0)
            ).alias("tokens_kept"),
        )
    )
    tot = per.agg(
        F.count("*").alias("nd"), F.sum("nt").alias("ntt")
    )
    big = "CAST({} AS DECIMAL(38,0))"
    return kept.crossJoin(F.broadcast(tot)).select(
        "thr_micro",
        "n_docs_kept",
        "tokens_kept",
        F.expr(
            f"CAST({big.format('n_docs_kept')} * 1000000 DIV nd"
            " AS BIGINT)"
        ).alias("docs_kept_ppm"),
        F.expr(
            f"CAST({big.format('tokens_kept')} * 1000000 DIV ntt"
            " AS BIGINT)"
        ).alias("tokens_kept_ppm"),
    )


VOCAB_KS = (5, 20, 100, 10000)


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F28 — vocabulary coverage curve (tokenizer-training corpus
    stat): for each candidate vocab size K, the fraction of all token
    OCCURRENCES covered by the top-K word types (ranked by frequency,
    word tiebreak). This is the first number a BPE/word-piece
    training run needs — how big a vocab buys how much coverage.

    Scale shape (r8 de-weak): one token explode + one word groupBy
    (map-side combined) shrinks the corpus to its VOCABULARY — but
    the vocabulary itself grows with the corpus (Heaps' law), so the
    global rank-window + running-sum the first cut used was a
    single-task sort over billions of types at 100 TB. The curve only
    probes |VOCAB_KS| fixed ranks, so no per-type rank is needed at
    all: each K becomes one ``orderBy(...).limit(K)`` limb — Spark
    plans TakeOrderedAndProject (distributed per-partition top-K,
    O(K) merge) — summed and unioned. ReuseExchange shares the one
    vocabulary aggregation across limbs; the plan has NO window node
    (pinned in tests/test_plan_pins.py). Counts stay integer until
    the final ratio, so the oracle agrees bit-for-bit."""
    docs = load_table(spark, "documents", sf_dir)
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count("*").alias("n"))
    )
    totals = words.agg(
        F.sum("n").alias("total_tokens"),
        F.count("*").alias("vocab_size"),
    )
    per_k = None
    for k in VOCAB_KS:
        limb = (
            words.orderBy(F.desc("n"), F.asc("w")).limit(k)
            .agg(
                F.coalesce(F.sum("n"), F.lit(0)).cast("long")
                .alias("covered_tokens")
            )
            .select(F.lit(k).cast("long").alias("k"), "covered_tokens")
        )
        per_k = limb if per_k is None else per_k.unionByName(limb)
    return per_k.crossJoin(totals).select(
        "k",
        "vocab_size",
        "covered_tokens",
        "total_tokens",
        F.round(
            F.col("covered_tokens") / F.col("total_tokens"), 6
        ).alias("coverage"),
    )


def _quality_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, source, text, w_ppm): the integer 5/3/2 ppm
    quality blend (matching text_quality's weights) shared by the
    with-replacement coin sampler and the A-ES without-replacement
    sampler. All floor-division ppm arithmetic — engine-exact."""
    toks = tokens(F.col("text"))
    pre = docs.select(
        "doc_id", "lang", "source", "text",
        F.greatest(F.length("text"), F.lit(1)).alias("n_chars"),
        F.greatest(F.size(toks), F.lit(1)).alias("n_tokens"),
        F.length(F.regexp_replace("text", "[A-Za-z0-9\\s]", ""))
        .alias("punct_chars"),
        _hits(toks, QUALITY_STOPWORDS).alias("stop_hits"),
    )
    return pre.select(
        "doc_id", "lang", "source", "text",
        F.expr("least(n_tokens * 20000, 1000000)").alias("len_ppm"),
        F.expr("punct_chars * 1000000 DIV n_chars").alias("punct_ppm"),
        F.expr("least(stop_hits * 5000000 DIV n_tokens, 1000000)")
        .alias("stop_ppm"),
    ).select(
        "doc_id", "lang", "source", "text",
        F.expr(
            "(len_ppm * 5 + (1000000 - punct_ppm) * 3 + stop_ppm * 2) DIV 10"
        ).alias("w_ppm"),
    )


def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: each document is kept
    with probability proportional to an integer quality weight — the
    soft version of quality_filter_pipeline's hard cut (DoReMi/DCLM-
    style data curation keeps SOME low-quality mass on purpose).

    Every quantity is ppm-scaled INTEGER arithmetic (floor divisions,
    capped components, 5/3/2 blend matching text_quality's weights) and
    the coin is the content hash — so the keep decision is bit-portable
    across engines, stable under repartitioning, and duplicate texts
    always make the same decision (no dedup-order coupling). One scan,
    no shuffle, no RNG state to coordinate across 1000 executors."""
    docs = load_table(spark, "documents", sf_dir)
    scored = _quality_weights(docs).select(
        "doc_id", "lang", "source",
        F.expr(
            "cast(conv(substring(md5(text), 1, 8), 16, 10) as bigint)"
            " % 1000000"
        ).alias("u_ppm"),
        "w_ppm",
    )
    return scored.where(F.col("u_ppm") < F.col("w_ppm"))


AES_SEED = "aes1"
AES_K = 100
# 16^13 = 2^52: thirteen md5 hex chars read as a uniform fixed-point
# fraction; the divisor is a power of two so u is EXACTLY representable
# as a double on every engine.
AES_DENOM = "4503599627370496.0"


def weighted_sample_norep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (A-ES, Efraimidis &
    Spirakis 2006): the top-K documents by key u^(1/w) are exactly a
    w-weighted simple random sample without replacement — the form a
    curation pipeline needs when it must take a FIXED budget of docs
    biased toward quality (the coin sampler's output size is random).

    Portability: u comes from 13 md5 hex chars over a 2^52 divisor
    (exact double), and the only transcendental, ln(u), is rounded
    ONCE to integer micro-nats (the established E51/BM25 fixed-point
    pattern — a 1-ulp libm disagreement flips the rounded value with
    probability ~1e-9). Maximizing u^(1/w) == maximizing ln(u)/w, so
    the sort key is the raw double quotient of two INTEGERS
    (micro-nats / w_ppm) — bit-identical across engines, doc_id
    tiebreak. Top-K is TakeOrderedAndProject: per-partition heaps, no
    global sort materialization, O(K) driver memory at any corpus
    size."""
    docs = load_table(spark, "documents", sf_dir)
    scored = _quality_weights(docs)
    keyed = scored.select(
        "doc_id", "source", "w_ppm",
        F.expr(
            f"cast(round(ln(greatest(cast(conv(substring("
            f"md5(concat('{AES_SEED}|', cast(doc_id as string))), 1, 13),"
            f" 16, 10) as bigint), 1) / {AES_DENOM}) * 1000000)"
            " as bigint)"
        ).alias("lnu_micro"),
    )
    return (
        keyed.select(
            "doc_id", "source", "w_ppm", "lnu_micro",
            (
                F.col("lnu_micro").cast("double")
                / F.col("w_ppm").cast("double")
            ).alias("priority"),
        )
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(AES_K)
    )


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F74 — per-document character-level Shannon entropy (micro-nats)
    plus char counts — the gibberish/encoding-damage detector feature
    (mojibake, base64 blobs, and key-mash text sit far from a
    language's ~2.5–4.2 nat/char band; the CCNet-class filters cut on
    exactly this).

    Exactness: entropy = Σ c_i·(ln n − ln c_i) / n over per-char
    counts; each ln of an INTEGER is micro-rounded once (the
    JS-divergence discipline), the weighted sum and the final DIV are
    integer/DECIMAL — bit-identical across engines. Group sizes are
    per-document (bounded by doc length), one explode scan."""
    docs = load_table(spark, "documents", sf_dir)
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).where(F.col("ch") != "")
    per_char = chars.groupBy("doc_id", "ch").agg(
        F.count("*").alias("c")
    )
    lnmu = "cast(round(ln(cast({} as double)) * 1000000) as bigint)"
    return (
        per_char.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_chars"),
            F.count("*").alias("n_distinct_chars"),
            F.sum(F.expr(
                "cast(c as decimal(38,0)) * "
                f"(0 - {lnmu.format('c')})"
            )).alias("_wsum"),
        )
        .select(
            "doc_id", "n_chars", "n_distinct_chars",
            F.expr(
                "CAST((cast(n_chars as decimal(38,0)) * "
                + lnmu.format("n_chars")
                + " + _wsum) DIV n_chars AS BIGINT)"
            ).alias("entropy_micro"),
        )
    )


CHAR_ENTROPY_ORACLE = """
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch
      FROM documents
    ),
    per_char AS (
      SELECT doc_id, ch, COUNT(*) AS c
      FROM chars WHERE ch <> '' GROUP BY doc_id, ch
    ),
    agg AS (
      SELECT doc_id,
        SUM(c) AS n_chars,
        CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
        SUM(CAST(c AS HUGEINT) * (0 -
          CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)))
          AS wsum
      FROM per_char GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
      n_distinct_chars,
      CAST((CAST(n_chars AS HUGEINT)
            * CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1000000)
                   AS BIGINT)
            + wsum) // n_chars AS BIGINT) AS entropy_micro
    FROM agg
"""


def text_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical-diversity profile: token occurrences, distinct
    word types, hapax legomena (types seen once), type-token ratio and
    hapax share — the corpus-health companion to vocab_coverage (a
    source whose TTR collapses is templated/boilerplate text; a hapax
    share near 1 is OCR noise or ID soup). One token explode + one
    (source, word) groupBy (map-side combined) shrinks the corpus to
    vocabulary size; integer counts until the two final ratios."""
    docs = load_table(spark, "documents", sf_dir)
    wc = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("n"))
    )
    return (
        wc.groupBy("source")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.sum((F.col("n") == 1).cast("long")).alias("n_hapax"),
        )
        .select(
            "source", "n_tokens", "n_types", "n_hapax",
            F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("ttr"),
            F.round(F.col("n_hapax") / F.col("n_types"), 6)
            .alias("hapax_share"),
        )
    )


def source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram Shannon entropy — the information-density
    quality signal next to text_type_token_ratio: a templated source
    (few words carry most mass) scores low even when its TTR looks
    healthy, because entropy weighs the DISTRIBUTION, not just the
    type count. H = ln(N) − Σ c·ln(c) / N over the per-source word
    counts.

    Bit-portability: ln is micro-rounded ONCE per count in the
    vocabulary-sized frame (the zipf_slope / BM25 fixed-point
    pattern), the Σ c·lnµ(c) accumulator runs in DECIMAL(38,0) /
    HUGEINT (c·lnµ(c) alone is ~1e12 at sf0.1 — the product shape
    that overflows BIGINT first at 100 TB), and the reported
    entropy_micro is integer arithmetic end-to-end. Scale shape: one
    explode + one (source, word) map-side-combined groupBy shrinks
    the corpus to its vocabulary; the per-source rollup is
    source-catalog-bounded."""
    docs = load_table(spark, "documents", sf_dir)
    ln_mu = "cast(round(ln(cast(n as double)) * 1000000) as bigint)"
    wc = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("n"))
    )
    per_src = wc.groupBy("source").agg(
        F.sum("n").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.expr(f"cast(n as decimal(38,0)) * ({ln_mu})"))
        .alias("s_nlnn"),
    )
    return per_src.select(
        "source", "n_tokens", "n_types",
        F.expr(
            "cast(cast(round(ln(cast(n_tokens as double)) * 1000000)"
            " as bigint) - s_nlnn DIV n_tokens as bigint)"
        ).alias("entropy_micro"),
    ).select(
        "source", "n_tokens", "n_types", "entropy_micro",
        F.round(F.col("entropy_micro") / F.lit(1e6), 4).alias("entropy"),
    )


SOURCE_ENTROPY_ORACLE = """
    WITH wc AS (
      SELECT source, w, COUNT(*) AS n FROM (
        SELECT source,
          unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents
      ) GROUP BY source, w
    ),
    per_src AS (
      SELECT source,
        CAST(SUM(n) AS BIGINT) AS n_tokens,
        CAST(COUNT(*) AS BIGINT) AS n_types,
        SUM(CAST(n AS HUGEINT)
            * CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT))
          AS s_nlnn
      FROM wc GROUP BY source
    )
    SELECT source, n_tokens, n_types,
      CAST(CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
           - s_nlnn // n_tokens AS BIGINT) AS entropy_micro,
      ROUND((CAST(CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1000000)
                       AS BIGINT)
             - s_nlnn // n_tokens AS BIGINT)) / 1000000.0, 4) AS entropy
    FROM per_src
"""


def distinctive_terms_logodds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive vocabulary: top-5 terms by log-odds
    ratio of in-source vs rest-of-corpus token frequency (Monroe et
    al.'s "fightin' words" shape with the Haldane +1/2 prior, written
    as +1 on doubled counts so every ln argument stays an exact
    integer) — 'what does each source talk about that the others
    don't', the corpus-curation companion to source_token_entropy
    (which says HOW diverse a source is, not WHAT makes it distinct).

    delta = ln(2c+1) - ln(2(n_s-c)+1) - ln(2c_rest+1)
            + ln(2(n_rest-c_rest)+1), each ln micro-rounded once per
    (source, word) row (the BM25 fixed-point pattern), so deltas AND
    ranks hash-verify. Support floor c >= 5 keeps one-off typos out.

    Scale shape: one explode + (source, word) map-side-combined
    groupBy shrinks the corpus to |sources| x vocab; per-word and
    per-source totals are vocab-/catalog-sized; the top-5 pick runs
    through two_phase_group_top_k because a source's vocabulary grows
    with the corpus (Heaps' law) — never a source-sized window. The
    oracle runs the classic single-window form, so agreement proves
    the two-phase decomposition."""
    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        two_phase_group_top_k,
    )

    docs = load_table(spark, "documents", sf_dir)
    wc = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    totals = wc.groupBy("w").agg(F.sum("c").alias("cw"))
    per_src = wc.groupBy("source").agg(F.sum("c").alias("ns"))
    n_all = wc.agg(F.sum("c").alias("n"))

    def _lnmu(expr: str) -> str:
        return f"cast(round(ln(cast({expr} as double)) * 1000000) as bigint)"

    scored = (
        wc.where(F.col("c") >= 5)
        .join(totals, "w")
        .join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(n_all))
        .withColumn("c_rest", F.col("cw") - F.col("c"))
        .withColumn(
            "delta_micro",
            F.expr(
                f"{_lnmu('2 * c + 1')} - {_lnmu('2 * (ns - c) + 1')}"
                f" - {_lnmu('2 * c_rest + 1')}"
                f" + {_lnmu('2 * ((n - ns) - c_rest) + 1')}"
            ),
        )
    )
    return two_phase_group_top_k(
        scored,
        keys=["source"],
        sort_cols=[(-F.col("delta_micro")), F.col("w")],
        k=5,
    ).select(
        "source",
        F.col("w").alias("term"),
        F.col("c").alias("n_in_source"),
        F.col("c_rest").alias("n_elsewhere"),
        "delta_micro",
        "rank",
    )


DISTINCTIVE_TERMS_ORACLE = """
    WITH wc AS (
      SELECT source, w, COUNT(*) AS c FROM (
        SELECT source,
          unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents
      ) GROUP BY source, w
    ),
    tot AS (SELECT w, SUM(c) AS cw FROM wc GROUP BY w),
    ps AS (SELECT source, SUM(c) AS ns FROM wc GROUP BY source),
    nn AS (SELECT SUM(c) AS n FROM wc),
    d AS (
      SELECT source, wc.w, c, cw - c AS c_rest,
        CAST(round(ln(CAST(2 * c + 1 AS DOUBLE)) * 1000000) AS BIGINT)
        - CAST(round(ln(CAST(2 * (ns - c) + 1 AS DOUBLE)) * 1000000)
               AS BIGINT)
        - CAST(round(ln(CAST(2 * (cw - c) + 1 AS DOUBLE)) * 1000000)
               AS BIGINT)
        + CAST(round(ln(CAST(2 * ((n - ns) - (cw - c)) + 1 AS DOUBLE))
                     * 1000000) AS BIGINT)
          AS delta_micro
      FROM wc
      JOIN tot USING (w)
      JOIN ps USING (source)
      CROSS JOIN nn
      WHERE c >= 5
    )
    SELECT source, w AS term, CAST(c AS BIGINT) AS n_in_source,
      CAST(c_rest AS BIGINT) AS n_elsewhere, delta_micro,
      CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY delta_micro DESC, w) AS rank
      FROM d
    )
    WHERE rank <= 5
"""


PHRASE_DELTA = 5  # word2phrase discount: bigrams rarer than this score <= 0


def phrase_bigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase detection over ADJACENT word bigrams (Mikolov
    word2phrase): score = (c_ab − δ)·N / (c_a·c_b) in integer ppm —
    bigrams whose adjacency count beats chance become tokenizer merge
    /phrase candidates. Adjacency is the load-bearing difference from
    part_pair_lift-style co-occurrence: "new york" scores, "new …
    york" anywhere in the doc does not.

    Shape: posexplode + a doc-bounded lead window builds the bigram
    stream (the shingle idiom), then three map-side-combined counts
    (bigram, unigram, total). The score product runs in DECIMAL(38,0)
    / HUGEINT (c_ab·N·10⁶ passes int64 at scale); deterministic
    top-20 plans as TakeOrderedAndProject."""
    docs = load_table(spark, "documents", sf_dir)
    from pyspark.sql.window import Window

    occ = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "w")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        occ.withColumn("w2", F.lead("w").over(w_doc))
        .where(F.col("w2").isNotNull())
        .groupBy(F.col("w").alias("w1"), "w2")
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") > PHRASE_DELTA)
    )
    uni = occ.groupBy("w").agg(F.count("*").alias("c"))
    total = occ.agg(F.count("*").alias("n_tokens"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        bigrams.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1", "w2", "n_pair",
            F.expr(
                f"cast(cast(n_pair - {PHRASE_DELTA} as decimal(38,0))"
                " * n_tokens * 1000000"
                " DIV (cast(c1 as decimal(38,0)) * c2) as bigint)"
            ).alias("score_ppm"),
        )
        .orderBy(F.desc("score_ppm"), "w1", "w2")
        .limit(20)
    )


PHRASE_BIGRAM_ORACLE = f"""
    WITH occ AS (
      SELECT doc_id, i AS pos, toks[i] AS w
      FROM (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents
      ), UNNEST(range(1, len(toks) + 1)) AS t(i)
    ),
    bi AS (
      SELECT w AS w1,
        LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM occ
    ),
    bigrams AS (
      SELECT w1, w2, COUNT(*) AS n_pair FROM bi
      WHERE w2 IS NOT NULL
      GROUP BY w1, w2 HAVING COUNT(*) > {PHRASE_DELTA}
    ),
    uni AS (SELECT w, COUNT(*) AS c FROM occ GROUP BY w),
    total AS (SELECT COUNT(*) AS n_tokens FROM occ)
    SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair,
      CAST(CAST(n_pair - {PHRASE_DELTA} AS HUGEINT) * n_tokens * 1000000
           // (CAST(c1.c AS HUGEINT) * c2.c) AS BIGINT) AS score_ppm
    FROM bigrams
    JOIN uni c1 ON bigrams.w1 = c1.w
    JOIN uni c2 ON bigrams.w2 = c2.w
    CROSS JOIN total
    ORDER BY score_ppm DESC, w1, w2
    LIMIT 20
"""


def source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram distribution
    from the CORPUS distribution — 'how far is this source from the
    mixture', the statistic that sets source mixing weights next to
    rebalance_sources (entropy says how diverse a source is,
    distinctive-terms says WHAT differs; JS says HOW MUCH, bounded
    [0, ln 2] and symmetric, defined even where KL is infinite).

    Fixed-point trick: with P = c/n_s, Q = d/N, M = (P+Q)/2, the log
    ratios collapse to INTEGER ratios — P/M = 2cN/(cN + d·n_s) and
    Q/M = 2d·n_s/(cN + d·n_s) — so each ln argument is an exact
    integer (DECIMAL(38,0) products; c·N passes int64 at scale),
    micro-rounded once per (source, word) row. Accumulators Σc·Δ and
    Σd·Δ run in DECIMAL(38,0)/HUGEINT; js_micro = (KL(P‖M)+KL(Q‖M))
    DIV 2 with the truncating integer division both engines share.

    Scale shape: one explode + (source, word) groupBy to the
    vocab-sized frame; the Q-side needs EVERY corpus word per source
    (c=0 rows), built as vocab x broadcast source-catalog rows, never
    corpus-sized."""
    docs = load_table(spark, "documents", sf_dir)
    wc = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    totals = wc.groupBy("w").agg(F.sum("c").alias("d"))
    per_src = wc.groupBy("source").agg(F.sum("c").alias("ns"))
    n_all = wc.agg(F.sum("c").alias("nn"))

    def _lnmu(expr: str) -> str:
        return (f"cast(round(ln(cast({expr} as double)) * 1000000)"
                " as bigint)")

    # the full (source, word) grid INCLUDING c=0 cells: vocab x
    # |sources| rows (the Q-side KL sums over every corpus word)
    grid = (
        totals.crossJoin(F.broadcast(per_src))
        .join(wc, ["source", "w"], "left")
        .crossJoin(F.broadcast(n_all))
        .withColumn("c", F.coalesce("c", F.lit(0)))
        .withColumn(
            "den",
            F.expr("cast(c as decimal(38,0)) * nn"
                   " + cast(d as decimal(38,0)) * ns"),
        )
    )
    terms = grid.select(
        "source", "c", "d", "ns", "nn",
        # P/M term only exists where c > 0 (P ln(P/M) -> 0 as P -> 0)
        F.when(
            F.col("c") > 0,
            F.expr(_lnmu("2 * cast(c as decimal(38,0)) * nn"))
            - F.expr(_lnmu("den")),
        ).otherwise(F.lit(0)).alias("dp"),
        (F.expr(_lnmu("2 * cast(d as decimal(38,0)) * ns"))
         - F.expr(_lnmu("den"))).alias("dq"),
    )
    agg = terms.groupBy("source").agg(
        F.max("ns").alias("n_tokens"),
        F.max("nn").alias("nn"),
        F.sum(F.expr("cast(c as decimal(38,0)) * dp")).alias("sp"),
        F.sum(F.expr("cast(d as decimal(38,0)) * dq")).alias("sq"),
    )
    return agg.select(
        "source",
        "n_tokens",
        F.expr(
            "cast((sp DIV n_tokens + sq DIV nn) DIV 2 as bigint)"
        ).alias("js_micro"),
    ).select(
        "source", "n_tokens", "js_micro",
        F.round(F.col("js_micro") / F.lit(1e6), 4).alias("js_nats"),
    )


SOURCE_JS_ORACLE = """
    WITH wc AS (
      SELECT source, w, COUNT(*) AS c FROM (
        SELECT source,
          unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents
      ) GROUP BY source, w
    ),
    totals AS (SELECT w, SUM(c) AS d FROM wc GROUP BY w),
    per_src AS (SELECT source, SUM(c) AS ns FROM wc GROUP BY source),
    n_all AS (SELECT SUM(c) AS nn FROM wc),
    grid AS (
      SELECT per_src.source, totals.w, totals.d, per_src.ns, n_all.nn,
        COALESCE(wc.c, 0) AS c,
        CAST(COALESCE(wc.c, 0) AS HUGEINT) * nn
          + CAST(totals.d AS HUGEINT) * ns AS den
      FROM totals
      CROSS JOIN per_src
      LEFT JOIN wc ON wc.source = per_src.source AND wc.w = totals.w
      CROSS JOIN n_all
    ),
    terms AS (
      SELECT source, c, d, ns, nn,
        CASE WHEN c > 0 THEN
          CAST(round(ln(CAST(2 * CAST(c AS HUGEINT) * nn AS DOUBLE))
               * 1000000) AS BIGINT)
          - CAST(round(ln(CAST(den AS DOUBLE)) * 1000000) AS BIGINT)
        ELSE 0 END AS dp,
        CAST(round(ln(CAST(2 * CAST(d AS HUGEINT) * ns AS DOUBLE))
             * 1000000) AS BIGINT)
        - CAST(round(ln(CAST(den AS DOUBLE)) * 1000000) AS BIGINT)
          AS dq
      FROM grid
    ),
    agg AS (
      SELECT source,
        CAST(MAX(ns) AS BIGINT) AS n_tokens,
        CAST(MAX(nn) AS BIGINT) AS nn,
        SUM(CAST(c AS HUGEINT) * dp) AS sp,
        SUM(CAST(d AS HUGEINT) * dq) AS sq
      FROM terms GROUP BY source
    )
    SELECT source, n_tokens,
      CAST((sp // n_tokens + sq // nn) // 2 AS BIGINT) AS js_micro,
      ROUND(CAST((sp // n_tokens + sq // nn) // 2 AS BIGINT)
            / 1000000.0, 4) AS js_nats
    FROM agg
"""


def langid_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predictor-agreement crosstab for the two language-ID paths
    (stopword-hit vs char-3-gram profile) against the labeled
    language: one row per (labeled, pred_stopword, pred_ngram) cell —
    the eval that says WHERE the two heuristics disagree, which is
    exactly where a downstream language filter needs a third opinion.
    Composes the two already-oracled predictors; the oracle splices
    their SQL as subqueries, so the crosstab re-verifies both in one
    hash. Cell space bounded by |langs+und|^3."""
    docs = load_table(spark, "documents", sf_dir)
    sw = stopword_langid(docs).select(
        "doc_id", "labeled_lang",
        F.col("predicted_lang").alias("pred_stopword"),
    )
    ng = charngram_langid(docs).select(
        "doc_id", F.col("predicted_lang").alias("pred_ngram")
    )
    return (
        sw.join(ng, "doc_id")
        .groupBy("labeled_lang", "pred_stopword", "pred_ngram")
        .agg(F.count("*").alias("n_docs"))
    )


NEYMAN_BUDGET = 100


def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal sample allocation per language stratum: an
    eval-set budget split ∝ N_h·σ_h (big AND variable strata get more
    draws — minimum-variance stratified sampling, the design step
    ahead of stratified_sample's uniform per-stratum quota). With x =
    doc length, N_h·σ_h = sqrt(N_h·Σx² − (Σx)²) EXACTLY, an integer
    radicand.

    Portability note (new to this op): IEEE-754 requires sqrt to be
    CORRECTLY ROUNDED, so sqrt(double) of an exact integer is
    bit-identical across engines — unlike ln/exp, it needs no
    micro-rounding for its own sake. The weights are still
    micro-rounded to integers because the DOWNSTREAM sum of weights
    must be order-free (double summation order differs across
    engines); allocation then runs the largest-remainder machinery in
    pure integers, so Σ alloc == budget exactly (pinned). Stratum
    frame is language-catalog-sized; windows over it are bounded."""
    from pyspark.sql.window import Window

    docs = load_table(spark, "documents", sf_dir)
    stats = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_chars").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.expr("cast(n_chars as decimal(38,0)) * n_chars"))
        .alias("sxx"),
    )
    w = stats.select(
        "lang", "n_docs",
        F.expr(
            "cast(round(sqrt(cast(n_docs * sxx - sx * sx as double))"
            " * 1000000) as bigint)"
        ).alias("w_micro"),
    )
    tot = w.agg(F.sum("w_micro").alias("w_tot"))
    j = w.crossJoin(F.broadcast(tot)).select(
        "lang", "n_docs", "w_micro",
        F.expr(f"({NEYMAN_BUDGET} * w_micro) DIV w_tot").alias("base"),
        F.expr(f"({NEYMAN_BUDGET} * w_micro) % w_tot").alias("rem"),
    )
    w_all = Window.partitionBy()
    w_bump = Window.orderBy(F.desc("rem"), F.asc("lang"))
    return (
        j.withColumn(
            "shortfall", F.lit(NEYMAN_BUDGET) - F.sum("base").over(w_all)
        )
        .withColumn("bump_rank", F.row_number().over(w_bump))
        .select(
            "lang", "n_docs", "w_micro",
            (
                F.col("base")
                + F.when(F.col("bump_rank") <= F.col("shortfall"), 1)
                .otherwise(0)
            ).alias("alloc"),
        )
    )


NEYMAN_ORACLE = f"""
    WITH stats AS (
      SELECT lang, COUNT(*) AS n_docs,
        SUM(CAST(n_chars AS HUGEINT)) AS sx,
        SUM(CAST(n_chars AS HUGEINT) * n_chars) AS sxx
      FROM documents GROUP BY lang
    ),
    w AS (
      SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
        CAST(round(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE))
             * 1000000) AS BIGINT) AS w_micro
      FROM stats
    ),
    tot AS (SELECT SUM(w_micro) AS w_tot FROM w),
    j AS (
      SELECT lang, n_docs, w_micro,
        ({NEYMAN_BUDGET} * CAST(w_micro AS HUGEINT)) // w_tot AS base,
        ({NEYMAN_BUDGET} * CAST(w_micro AS HUGEINT)) % w_tot AS rem
      FROM w CROSS JOIN tot
    ),
    r AS (
      SELECT *, {NEYMAN_BUDGET} - SUM(base) OVER () AS shortfall,
        ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS bump_rank
      FROM j
    )
    SELECT lang, n_docs, w_micro,
      CAST(base + CASE WHEN bump_rank <= shortfall THEN 1 ELSE 0 END
           AS BIGINT) AS alloc
    FROM r
"""


MIXTURE_TAU = 0.7           # sampling temperature (mT5/PaLM-style)
MIXTURE_BUDGET = 1_000_000_000  # training-token budget for the epochs view


def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F69 — temperature-scaled source mixing weights: the sampling
    distribution a multi-source training run draws from, p_s ∝
    (token_share_s)^τ with τ = 0.7 — flattening toward uniform so
    small sources are upsampled (the mT5/PaLM mixing rule; τ = 1 is
    proportional, τ = 0 uniform). Per source: docs, BPE-ish tokens,
    raw share_ppm, temperature weight_ppm, and epochs_ppm — how many
    times the source is traversed at a 1e9-token budget (> 1e6 means
    the source repeats; the over-sampling early-warning the mixing
    literature caps at a few epochs).

    Exactness: the ONE transcendental (pow(share, τ)) is rounded to
    an integer nano-weight immediately (the Theil–Sen/JS-divergence
    discipline for non-correctly-rounded libm calls); everything
    after — normalization to ppm summing EXACTLY to 1e6 via
    largest-remainder, the epochs DIV — is integer. The stats frame
    is source-catalog-sized, so its windows are bounded; the corpus
    is touched by exactly one token-count scan.

    The weight rollup is split out as ``mixture_from_counts`` so the
    STREAMED token-accounting MV (streaming/token_mv.py maintains the
    same per-source additive counts continuously) feeds the identical
    arithmetic — the drift_from_counts split-of-labor pattern: stream
    and batch cannot diverge on the mixing math, only on the counts,
    and the twin test pins those."""
    docs = load_table(spark, "documents", sf_dir)
    stats = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.size(F.regexp_extract_all("text", F.lit(BPE_PIECE), 0))
            .cast("long")
        ).alias("tokens"),
    )
    return mixture_from_counts(stats)


def mixture_from_counts(stats: DataFrame) -> DataFrame:
    """Tempered mixing weights from ANY (source, n_docs, tokens)
    counts frame — shared verbatim by the batch entry above and the
    streamed MV twin (see source_mixture_weights docstring).

    Degenerate-corpus contract (r10 ADVICE): a source with tokens = 0
    (or an all-empty corpus, tok_tot = 0) would zero a DIV divisor —
    Spark non-ANSI DIV returns NULL where DuckDB `//` raises. Both
    divisors are guarded with a lazy CASE→raise_error so engine and
    oracle fail loudly and identically.

    Residual cross-engine risk (documented per the r10 ADVICE): the
    ONE transcendental, pow(share, 0.7), is a platform libm call
    (JVM Math.pow vs DuckDB's C libm) rounded ONCE to an integer
    nano-weight. pow is not correctly rounded on either platform, so
    a 1-ulp disagreement that lands within ~1e-7 of a *.5e-9 rounding
    boundary could flip w_nano by 1 and cascade through the
    largest-remainder normalization — the single-rounding discipline
    narrows the exposure to that boundary sliver (~1e-7 of parameter
    space per source) but cannot structurally eliminate it the way
    the pure-integer entries do. An exact integer-only tempering
    (share^{7/10} via integer 10th roots) needs intermediates near
    share_scaled^7 > 1e38 that overflow HUGEINT, so the documented
    trade is: keep the libm call, round once, accept the sliver."""
    from pyspark.sql.window import Window

    tot = stats.agg(F.sum("tokens").alias("tok_tot"))
    w = stats.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "tokens",
        F.expr(
            "CASE WHEN tok_tot = 0 THEN CAST(raise_error("
            "'mixture_from_counts: corpus with zero tokens')"
            " AS BIGINT)"
            " ELSE CAST(CAST(tokens AS DECIMAL(38,0)) * 1000000"
            " DIV tok_tot AS BIGINT) END"
        ).alias("share_ppm"),
        F.expr(
            f"CAST(round(pow(CAST(tokens AS DOUBLE) / tok_tot,"
            f" {MIXTURE_TAU}) * 1e9) AS BIGINT)"
        ).alias("w_nano"),
    )
    wtot = w.agg(F.sum("w_nano").alias("w_tot"))
    j = w.crossJoin(F.broadcast(wtot)).select(
        "source", "n_docs", "tokens", "share_ppm",
        F.expr(
            "CAST((1000000 * CAST(w_nano AS DECIMAL(38,0))) DIV w_tot"
            " AS BIGINT)"
        ).alias("base"),
        F.expr(
            "CAST((1000000 * CAST(w_nano AS DECIMAL(38,0))) % w_tot"
            " AS DECIMAL(38,0))"
        ).alias("rem"),
    )
    w_all = Window.partitionBy()
    w_bump = Window.orderBy(F.desc("rem"), F.asc("source"))
    return (
        j.withColumn(
            "shortfall", F.lit(1_000_000) - F.sum("base").over(w_all)
        )
        .withColumn("bump_rank", F.row_number().over(w_bump))
        .withColumn(
            "weight_ppm",
            F.col("base")
            + F.when(F.col("bump_rank") <= F.col("shortfall"), 1)
            .otherwise(0),
        )
        .select(
            "source", "n_docs", "tokens", "share_ppm", "weight_ppm",
            F.expr(
                "CASE WHEN tokens = 0 THEN CAST(raise_error("
                "'mixture_from_counts: source with zero tokens')"
                " AS BIGINT)"
                f" ELSE CAST(({MIXTURE_BUDGET} * CAST(weight_ppm AS"
                " DECIMAL(38,0))) DIV tokens AS BIGINT) END"
            ).alias("epochs_ppm"),
        )
    )


MIXTURE_ORACLE = f"""
    WITH stats AS (
      SELECT source, COUNT(*) AS n_docs,
        SUM(len(regexp_extract_all(text,
            '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))) AS tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(CAST(tokens AS HUGEINT)) AS tok_tot FROM stats),
    w AS (
      SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        CAST(tokens AS BIGINT) AS tokens,
        CAST(CAST(tokens AS HUGEINT) * 1000000 // tok_tot AS BIGINT)
          AS share_ppm,
        CAST(round(pow(CAST(tokens AS DOUBLE) / tok_tot,
             {MIXTURE_TAU}) * 1e9) AS BIGINT) AS w_nano
      FROM stats CROSS JOIN tot
    ),
    wtot AS (SELECT SUM(CAST(w_nano AS HUGEINT)) AS w_tot FROM w),
    j AS (
      SELECT source, n_docs, tokens, share_ppm,
        (1000000 * CAST(w_nano AS HUGEINT)) // w_tot AS base,
        (1000000 * CAST(w_nano AS HUGEINT)) % w_tot AS rem
      FROM w CROSS JOIN wtot
    ),
    r AS (
      SELECT *, 1000000 - SUM(base) OVER () AS shortfall,
        ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS bump_rank
      FROM j
    )
    SELECT source, n_docs, tokens, share_ppm,
      CAST(base + CASE WHEN bump_rank <= shortfall THEN 1 ELSE 0 END
           AS BIGINT) AS weight_ppm,
      CAST(({MIXTURE_BUDGET} * (base + CASE WHEN bump_rank <= shortfall
           THEN 1 ELSE 0 END)) // tokens AS BIGINT) AS epochs_ppm
    FROM r
"""


def token_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F70 — tokenizer fertility per language: BPE-ish pieces per
    whitespace word (fertility_ppm) and characters per piece
    (chars_per_bpe_ppm) by the corpus `lang` column — the
    multilingual-tokenizer health report (high fertility = the
    tokenizer fragments that language, inflating its effective cost
    per word; the standard readout when sizing per-language budgets).

    Pure integer counts per document summed per language, ratios as
    truncating DIVs in DECIMAL — bit-identical across engines. One
    scan; the language frame is catalog-bounded.

    Degenerate-corpus contract (r10 ADVICE): a lang whose documents
    have zero whitespace words / zero BPE pieces would make the DIV
    divisor 0 — DuckDB `//` raises, but Spark non-ANSI DIV returns
    NULL, silently diverging from the oracle. Both ratio columns
    therefore guard the divisor with a lazy CASE→raise_error so BOTH
    lanes fail loudly and identically instead of one emitting a NULL
    row."""
    docs = load_table(spark, "documents", sf_dir)
    per = docs.select(
        "lang",
        F.size(tokens(F.col("text"))).cast("long").alias("ws"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PIECE), 0))
        .cast("long").alias("bpe"),
        F.length("text").cast("long").alias("chars"),
    )
    return per.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws").alias("ws_tokens"),
        F.sum("bpe").alias("bpe_tokens"),
        F.expr(
            "CASE WHEN sum(ws) = 0 THEN CAST(raise_error("
            "'token_fertility_by_lang: lang with zero whitespace"
            " tokens') AS BIGINT)"
            " ELSE CAST(sum(CAST(bpe AS DECIMAL(38,0))) * 1000000"
            " DIV sum(ws) AS BIGINT) END"
        ).alias("fertility_ppm"),
        F.expr(
            "CASE WHEN sum(bpe) = 0 THEN CAST(raise_error("
            "'token_fertility_by_lang: lang with zero BPE pieces')"
            " AS BIGINT)"
            " ELSE CAST(sum(CAST(chars AS DECIMAL(38,0))) * 1000000"
            " DIV sum(bpe) AS BIGINT) END"
        ).alias("chars_per_bpe_ppm"),
    )


FERTILITY_ORACLE = f"""
    WITH per AS (
      SELECT lang,
        len(regexp_split_to_array(trim(text), '\\s+')) AS ws,
        len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))
          AS bpe,
        length(text) AS chars
      FROM documents
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(ws) AS BIGINT) AS ws_tokens,
      CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
      CAST(SUM(CAST(bpe AS HUGEINT)) * 1000000 // SUM(ws) AS BIGINT)
        AS fertility_ppm,
      CAST(SUM(CAST(chars AS HUGEINT)) * 1000000 // SUM(bpe) AS BIGINT)
        AS chars_per_bpe_ppm
    FROM per GROUP BY lang
"""


TEXT_QUERIES = {
    "source_quality_scorecard": source_quality_scorecard,
    "text_char_entropy": text_char_entropy,
    "source_mixture_weights": source_mixture_weights,
    "token_fertility_by_lang": token_fertility_by_lang,
    "neyman_allocation": neyman_allocation,
    "langid_agreement": langid_agreement,
    "source_js_divergence": source_js_divergence,
    "phrase_bigram_scores": phrase_bigram_scores,
    "distinctive_terms_logodds": distinctive_terms_logodds,
    "source_token_entropy": source_token_entropy,
    "vocab_coverage": vocab_coverage,
    "quality_weighted_sample": quality_weighted_sample,
    "weighted_sample_norep": weighted_sample_norep,
    "text_type_token_ratio": text_type_token_ratio,
    "quality_filter_pipeline": quality_filter_pipeline,
    "text_repetition": text_repetition,
    "text_token_count": text_token_count,
    "text_quality": text_quality,
    "quality_threshold_sweep": quality_threshold_sweep,
    "text_langid": text_langid,
    "text_langid_ngram": text_langid_ngram,
    "text_fingerprint": text_fingerprint,
}

_STOP_SQL = {
    lang: "(" + ", ".join(f"'{w}'" for w in words) + ")"
    for lang, words in STOPWORDS.items()
}

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"

SCORECARD_ORACLE = f"""
    WITH r AS (
      SELECT source, concat_ws(',',
        CASE WHEN digits / n_chars > 0.2 THEN 'digit_heavy' END,
        CASE WHEN n_tokens >= 5 AND distinct_toks / n_tokens < 0.3
             THEN 'repetitive' END,
        CASE WHEN spaces / n_chars > 0.5 THEN 'space_heavy' END,
        CASE WHEN n_chars > 20000 THEN 'too_long' END,
        CASE WHEN n_chars < 20 THEN 'too_short' END
      ) AS reasons FROM (
        SELECT source,
          length(text) AS n_chars,
          len({_TOKS}) AS n_tokens,
          len(list_distinct({_TOKS})) AS distinct_toks,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
            AS digits,
          length(text) - length(regexp_replace(text, '\\s', '', 'g'))
            AS spaces
        FROM documents
      )
    ),
    per_src AS (
      SELECT source, COUNT(*) AS source_docs,
        SUM(CASE WHEN reasons = '' THEN 1 ELSE 0 END) AS n_kept
      FROM r GROUP BY source
    ),
    reason_rows AS (
      SELECT source, unnest(string_split(reasons, ',')) AS reason,
        1 AS one
      FROM r WHERE reasons <> ''
    ),
    counted AS (
      SELECT source, reason, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM reason_rows GROUP BY source, reason
      UNION ALL
      SELECT source, '_kept' AS reason, CAST(n_kept AS BIGINT)
      FROM per_src
    )
    SELECT c.source, reason, n_docs,
      CAST(source_docs AS BIGINT) AS source_docs,
      CAST(CAST(n_docs AS HUGEINT) * 1000000 // source_docs AS BIGINT)
        AS share_ppm
    FROM counted c JOIN per_src p ON c.source = p.source
"""


TEXT_ORACLES = {
    "source_quality_scorecard": SCORECARD_ORACLE,
    "text_char_entropy": CHAR_ENTROPY_ORACLE,
    "source_mixture_weights": MIXTURE_ORACLE,
    "token_fertility_by_lang": FERTILITY_ORACLE,
    "neyman_allocation": NEYMAN_ORACLE,
    "source_js_divergence": SOURCE_JS_ORACLE,
    "phrase_bigram_scores": PHRASE_BIGRAM_ORACLE,
    "distinctive_terms_logodds": DISTINCTIVE_TERMS_ORACLE,
    "source_token_entropy": SOURCE_ENTROPY_ORACLE,
    "vocab_coverage": f"""
        WITH words AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS n
          FROM (SELECT unnest({_TOKS}) AS w FROM documents)
          GROUP BY w
        ),
        ranked AS (
          SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rank
          FROM words
        ),
        cum AS (
          SELECT rank, SUM(n) OVER (
            ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
          ) AS cum FROM ranked
        ),
        totals AS (
          SELECT CAST(SUM(n) AS BIGINT) AS total_tokens,
                 CAST(COUNT(*) AS BIGINT) AS vocab_size
          FROM words
        ),
        ks AS (SELECT CAST(unnest([5, 20, 100, 10000]) AS BIGINT) AS k),
        covered AS (
          SELECT k, MAX(cum) AS covered_tokens
          FROM cum JOIN ks ON rank <= k GROUP BY k
        )
        SELECT k, vocab_size,
          CAST(COALESCE(covered_tokens, 0) AS BIGINT) AS covered_tokens,
          total_tokens,
          ROUND(COALESCE(covered_tokens, 0) * 1.0 / total_tokens, 6)
            AS coverage
        FROM ks LEFT JOIN covered USING (k) CROSS JOIN totals
    """,
    "quality_filter_pipeline": f"""
        SELECT doc_id, reasons = '' AS keep, reasons FROM (
          SELECT doc_id, concat_ws(',',
            CASE WHEN digits / n_chars > 0.2 THEN 'digit_heavy' END,
            CASE WHEN n_tokens >= 5 AND distinct_toks / n_tokens < 0.3
                 THEN 'repetitive' END,
            CASE WHEN spaces / n_chars > 0.5 THEN 'space_heavy' END,
            CASE WHEN n_chars > 20000 THEN 'too_long' END,
            CASE WHEN n_chars < 20 THEN 'too_short' END
          ) AS reasons FROM (
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
        )
    """,
    "text_repetition": f"""
        WITH t AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        sh AS (
          SELECT doc_id,
            unnest(list_transform(
              generate_series(1, len(toks) - 2),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
            )) AS shingle
          FROM t WHERE len(toks) >= 3
        ),
        per AS (
          SELECT doc_id, shingle, COUNT(*) AS c FROM sh
          GROUP BY doc_id, shingle
        )
        SELECT doc_id,
          CAST(SUM(c) AS BIGINT) AS n_shingles,
          CAST(MAX(c) AS BIGINT) AS max_repeat,
          ROUND(MAX(c) * 1.0 / SUM(c), 6) AS repetition_ratio
        FROM per GROUP BY doc_id
    """,
    "text_token_count": f"""
        SELECT doc_id,
          len({_TOKS}) AS ws_tokens,
          len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))
            AS bpe_tokens
        FROM documents
    """,
    "quality_threshold_sweep": f"""
        WITH q AS (
          SELECT CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)
                 ELSE CAST(ROUND((
                   LEAST(1.0, n_tokens / 50.0) * 0.5
                   + (1 - punct_chars / n_chars) * 0.3
                   + LEAST(1.0, (stop_hits / n_tokens) * 5) * 0.2
                 ) * 1000000) AS BIGINT) END AS s,
                 CAST(n_tokens AS BIGINT) AS nt
          FROM (
            SELECT length(text) AS n_chars,
              len({_TOKS}) AS n_tokens,
              length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                AS punct_chars,
              len(list_filter({_TOKS}, t -> t IN {_STOP_SQL['en']}))
                AS stop_hits
            FROM documents
          )
        ),
        grid AS (SELECT i * 100000 AS thr_micro FROM range(1, 10) t(i)),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                 CAST(SUM(nt) AS BIGINT) AS ntt
          FROM q
        )
        SELECT thr_micro,
          CAST(SUM(CASE WHEN s >= thr_micro THEN 1 ELSE 0 END) AS BIGINT)
            AS n_docs_kept,
          CAST(SUM(CASE WHEN s >= thr_micro THEN nt ELSE 0 END) AS BIGINT)
            AS tokens_kept,
          CAST(SUM(CASE WHEN s >= thr_micro THEN 1 ELSE 0 END)
               * CAST(1000000 AS HUGEINT) // nd AS BIGINT)
            AS docs_kept_ppm,
          CAST(SUM(CASE WHEN s >= thr_micro THEN nt ELSE 0 END)
               * CAST(1000000 AS HUGEINT) // ntt AS BIGINT)
            AS tokens_kept_ppm
        FROM q CROSS JOIN grid CROSS JOIN tot
        GROUP BY thr_micro, nd, ntt
    """,
    "text_quality": f"""
        SELECT doc_id,
          CAST(n_chars AS BIGINT) AS n_chars,
          CAST(n_tokens AS BIGINT) AS n_tokens,
          ROUND(punct_chars / n_chars, 6) AS punct_ratio,
          ROUND(stop_hits / n_tokens, 6) AS stopword_ratio,
          ROUND(
            LEAST(1.0, n_tokens / 50.0) * 0.5
            + (1 - punct_chars / n_chars) * 0.3
            + LEAST(1.0, (stop_hits / n_tokens) * 5) * 0.2, 6
          ) AS quality_score
        FROM (
          SELECT doc_id,
            length(text) AS n_chars,
            len({_TOKS}) AS n_tokens,
            length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
              AS punct_chars,
            len(list_filter({_TOKS}, t -> t IN {_STOP_SQL['en']}))
              AS stop_hits
          FROM documents
        )
    """,
    "text_langid": f"""
        SELECT doc_id, labeled_lang,
          CASE WHEN best = 0 THEN 'und'
               WHEN h_de = best THEN 'de'
               WHEN h_en = best THEN 'en'
               WHEN h_es = best THEN 'es'
               WHEN h_fr = best THEN 'fr'
               WHEN h_zh = best THEN 'zh'
               ELSE 'und' END AS predicted_lang
        FROM (
          SELECT doc_id, lang AS labeled_lang,
            h_de, h_en, h_es, h_fr, h_zh,
            GREATEST(h_de, h_en, h_es, h_fr, h_zh) AS best
          FROM (
            SELECT doc_id, lang,
              len(list_filter({_TOKS}, t -> t IN {_STOP_SQL['de']})) AS h_de,
              len(list_filter({_TOKS}, t -> t IN {_STOP_SQL['en']})) AS h_en,
              len(list_filter({_TOKS}, t -> t IN {_STOP_SQL['es']})) AS h_es,
              len(list_filter({_TOKS}, t -> t IN {_STOP_SQL['fr']})) AS h_fr,
              len(list_filter({_TOKS}, t -> t IN {_STOP_SQL['zh']})) AS h_zh
            FROM documents
          )
        )
    """,
    "text_langid_ngram": """
        WITH tg AS (
          SELECT doc_id, lang,
            unnest(list_transform(generate_series(1, length(text) - 2),
                                  i -> substr(text, CAST(i AS INT), 3)))
              AS tg
          FROM documents WHERE length(text) >= 3
        ),
        prof AS (
          SELECT lang AS p_lang, tg FROM (
            SELECT lang, tg, COUNT(*) AS c,
              ROW_NUMBER() OVER (
                PARTITION BY lang ORDER BY COUNT(*) DESC, tg
              ) AS rn
            FROM tg GROUP BY lang, tg
          ) WHERE rn <= 64
        ),
        hits AS (
          SELECT d.doc_id,
            SUM(CASE WHEN p_lang = 'de' THEN 1 ELSE 0 END) AS h_de,
            SUM(CASE WHEN p_lang = 'en' THEN 1 ELSE 0 END) AS h_en,
            SUM(CASE WHEN p_lang = 'es' THEN 1 ELSE 0 END) AS h_es,
            SUM(CASE WHEN p_lang = 'fr' THEN 1 ELSE 0 END) AS h_fr,
            SUM(CASE WHEN p_lang = 'zh' THEN 1 ELSE 0 END) AS h_zh
          FROM tg d JOIN prof p USING (tg)
          GROUP BY d.doc_id
        )
        SELECT doc_id, labeled_lang,
          CASE WHEN best IS NULL OR best = 0 THEN 'und'
               WHEN h_de = best THEN 'de'
               WHEN h_en = best THEN 'en'
               WHEN h_es = best THEN 'es'
               WHEN h_fr = best THEN 'fr'
               WHEN h_zh = best THEN 'zh'
               ELSE 'und' END AS predicted_lang
        FROM (
          SELECT d.doc_id, d.lang AS labeled_lang,
            COALESCE(h_de, 0) AS h_de, COALESCE(h_en, 0) AS h_en,
            COALESCE(h_es, 0) AS h_es, COALESCE(h_fr, 0) AS h_fr,
            COALESCE(h_zh, 0) AS h_zh,
            GREATEST(COALESCE(h_de, 0), COALESCE(h_en, 0),
                     COALESCE(h_es, 0), COALESCE(h_fr, 0),
                     COALESCE(h_zh, 0)) AS best
          FROM documents d LEFT JOIN hits USING (doc_id)
        )
    """,
    "quality_weighted_sample": f"""
        WITH pre AS (
          SELECT doc_id, lang, source, text,
            GREATEST(length(text), 1) AS n_chars,
            GREATEST(len({_TOKS}), 1) AS n_tokens,
            length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
              AS punct_chars,
            len(list_filter({_TOKS}, t -> t IN {_STOP_SQL['en']}))
              AS stop_hits
          FROM documents
        ),
        scored AS (
          SELECT doc_id, lang, source,
            ('0x' || substr(md5(text), 1, 8))::BIGINT % 1000000 AS u_ppm,
            (LEAST(n_tokens * 20000, 1000000) * 5
             + (1000000 - punct_chars * 1000000 // n_chars) * 3
             + LEAST(stop_hits * 5000000 // n_tokens, 1000000) * 2) // 10
              AS w_ppm
          FROM pre
        )
        SELECT doc_id, lang, source, u_ppm, w_ppm
        FROM scored WHERE u_ppm < w_ppm
    """,
    "weighted_sample_norep": f"""
        WITH pre AS (
          SELECT doc_id, source,
            GREATEST(length(text), 1) AS n_chars,
            GREATEST(len({_TOKS}), 1) AS n_tokens,
            length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
              AS punct_chars,
            len(list_filter({_TOKS}, t -> t IN {_STOP_SQL['en']}))
              AS stop_hits
          FROM documents
        ),
        scored AS (
          SELECT doc_id, source,
            (LEAST(n_tokens * 20000, 1000000) * 5
             + (1000000 - punct_chars * 1000000 // n_chars) * 3
             + LEAST(stop_hits * 5000000 // n_tokens, 1000000) * 2) // 10
              AS w_ppm,
            CAST(round(ln(GREATEST(
              ('0x' || substr(md5('aes1|' || CAST(doc_id AS VARCHAR)),
                              1, 13))::BIGINT, 1)
              / 4503599627370496.0) * 1000000) AS BIGINT) AS lnu_micro
          FROM pre
        )
        SELECT doc_id, source, w_ppm, lnu_micro,
          CAST(lnu_micro AS DOUBLE) / CAST(w_ppm AS DOUBLE) AS priority
        FROM scored
        ORDER BY priority DESC, doc_id
        LIMIT 100
    """,
    "text_type_token_ratio": f"""
        WITH toks AS (
          SELECT source, unnest({_TOKS}) AS w FROM documents
        ),
        wc AS (
          SELECT source, w, COUNT(*) AS n FROM toks GROUP BY source, w
        )
        SELECT source,
          CAST(SUM(n) AS BIGINT) AS n_tokens,
          COUNT(*) AS n_types,
          CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_hapax,
          ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6)
            AS ttr,
          ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_share
        FROM wc GROUP BY source
    """,
    "text_fingerprint": f"""
        SELECT doc_id,
          md5(array_to_string(list_sort(list_distinct({_TOKS})), ' '))
            AS set_signature,
          list_reduce(
            list_prepend(CAST(0 AS BIGINT),
              list_transform(string_split(text, ''),
                             c -> CAST(ascii(c) AS BIGINT))),
            (a, c) -> (a * 31 + c) % 2147483647
          ) AS rolling_hash
        FROM documents
    """,
}


TEXT_ORACLES["langid_agreement"] = f"""
    SELECT a.labeled_lang,
      a.predicted_lang AS pred_stopword,
      b.predicted_lang AS pred_ngram,
      CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM ({TEXT_ORACLES['text_langid']}) a
    JOIN ({TEXT_ORACLES['text_langid_ngram']}) b USING (doc_id)
    GROUP BY a.labeled_lang, a.predicted_lang, b.predicted_lang
"""
