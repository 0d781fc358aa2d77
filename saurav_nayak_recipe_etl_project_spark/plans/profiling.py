"""Dataset profiling & sampling: fixed-size stratified sample,
approx-distinct verification, key-skew diagnostics.

Reference parity: the reference's only profiling artifact is the
validation_report CSV (src/data_validation.py); these add the profile
surface a 100 TB corpus actually needs before a training run — how
big is each stratum, how skewed are the join keys, and can we trust
the cheap cardinality sketch.

Scale notes:
- stratified_sample uses one window per stratum (shuffle on the
  stratum key). Strata are language-sized (few, large) so the sort is
  the cost; at extreme strata sizes swap the full sort for a two-phase
  per-partition top-n (same result, the window here keeps the oracle
  bridge exact).
- approx_distinct_bounds is the HLL++ counterpart of the GK
  rank-bounds oracle: the sketch value is engine-specific, so we
  assert the GUARANTEE (relative error vs the exact count) and emit
  booleans that hash-match a constant-true oracle.
- skew_diagnostics is two aggregations (per-key count, then global
  stats over the counts) — both map-side combined; output is one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
    derive_band_width,
    ntile_from_rank,
    two_phase_group_top_k,
    with_global_rank,
    with_grouped_rank,
)
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

SAMPLE_PER_STRATUM = 20
# approx_count_distinct rsd; acceptance band is 5% (≈5 sigma for the
# HLL++ estimator at rsd=0.01 — deterministic data, so stably green).
ADC_RSD = 0.01
ADC_TOL = 0.05


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size sample per language stratum: rank by
    md5(doc_id|text) inside each stratum, keep the first N. Content-
    keyed, so the sample is stable under repartitioning and re-runs —
    no RNG state, unlike df.sampleBy. Strata are language-sized (few,
    LARGE), so the per-stratum pick runs through the two-phase salted
    top-k (functions/ranking.py) — no task ever sorts a whole
    stratum; the md5 key is a strict total order, so the rows and
    ranks equal the single-window form the oracle encodes."""
    docs = load_table(spark, "documents", sf_dir)
    keyed = docs.select(
        "doc_id", "lang",
        F.md5(F.concat_ws("|", "doc_id", "text")).alias("_mk"),
    )
    return two_phase_group_top_k(
        keyed, ["lang"], ["_mk"], SAMPLE_PER_STRATUM, rank_col="rn"
    ).select("doc_id", "lang", "rn")


def approx_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ cardinality with an in-plan accuracy assertion: per event
    type, |approx - exact| must stay within ADC_TOL of exact (floor of
    1 for tiny groups). Emits booleans; the oracle is constant-true,
    so any out-of-band sketch value hash-mismatches."""
    ev = load_table(spark, "events", sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", ADC_RSD).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    err = F.abs(F.col("approx_users") - F.col("exact_users"))
    band = F.greatest(F.lit(1.0), F.col("exact_users") * ADC_TOL)
    return agg.select(
        "event_type", (err <= band).alias("distinct_ok")
    )


def skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for lineitem.l_partkey: key count, max and
    mean per-key frequency, p99 frequency, max/mean skew factor, and
    the hottest key's share of all rows — the numbers that decide
    whether a join needs salting or AQE skew handling."""
    li = load_table(spark, "lineitem", sf_dir)
    per_key = li.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.avg("cnt"), 4).alias("avg_cnt"),
        F.expr("percentile(cnt, 0.99)").alias("p99_cnt"),
        F.round(F.max("cnt") / F.avg("cnt"), 4).alias("skew_factor"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_share"),
    )


# Count-min sketch shape: d independent hash rows × w buckets. The
# sketch table is d*w rows — tiny, broadcastable — while the stream of
# updates is one groupBy, which is the whole point at 100 TB: frequency
# queries over unbounded keys in O(d*w) memory. Determinism: xxhash64
# row seeds. The ONE-SIDED guarantee (est >= true, always — collisions
# only ADD) is asserted exactly; the upper band is measured-based (the
# recall-floor pattern): observed max row-minimum overestimate across
# sf0.001/0.01/0.1, over ALL users (not just the top-N), is
# 1.52 * N/w; the gate uses 8 * N/w — a 5x margin that still catches
# a broken hash (which collapses buckets and blows the estimate by
# orders of magnitude).
CMS_D = 4
CMS_W = 1024
CMS_SLACK_FACTOR = 8
CMS_TOP_N = 20


def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch event-count estimates for the top-N busiest
    users, gated: emits (user_id, exact n_events value-verified by the
    oracle, cms_lower_ok = est >= exact — the deterministic CMS
    guarantee, cms_upper_ok = est <= exact + slack). Sketch build is
    one explode + one (d, bucket) groupBy; the query side joins the
    broadcast d*w sketch to the N user rows."""
    ev = load_table(spark, "events", sf_dir)
    rows = F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            F.pmod(F.xxhash64(F.col("user_id"), F.lit(d)), F.lit(CMS_W))
            .cast("int").alias("bucket"),
        )
        for d in range(CMS_D)
    ])
    sketch = (
        ev.select(F.explode(rows).alias("r"))
        .groupBy(F.col("r.d").alias("d"), F.col("r.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    totals = ev.agg(F.count("*").alias("n_total"))
    top = (
        ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(CMS_TOP_N)
    )
    probes = top.select(
        "user_id", "n_events",
        F.explode(F.array(*[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(F.xxhash64(F.col("user_id"), F.lit(d)), F.lit(CMS_W))
                .cast("int").alias("bucket"),
            )
            for d in range(CMS_D)
        ])).alias("r"),
    ).select("user_id", "n_events", F.col("r.d").alias("d"),
             F.col("r.bucket").alias("bucket"))
    est = (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("user_id", "n_events")
        .agg(F.min("cnt").alias("est"))
    )
    return est.crossJoin(totals).select(
        "user_id",
        "n_events",
        (F.col("est") >= F.col("n_events")).alias("cms_lower_ok"),
        (F.col("est") <= F.col("n_events")
         + F.lit(CMS_SLACK_FACTOR) * F.col("n_total") / F.lit(CMS_W))
        .alias("cms_upper_ok"),
    )


KMV_K = 128
KMV_SPACE = 1 << 60  # md5-15-hex hash space
_KMV_SALTS = 64


def _bottom_k_hashes(df: DataFrame, keys: list, k: int) -> DataFrame:
    """Exact bottom-k of `h` per `keys` group via the shared two-phase
    salted top-k (functions/ranking.py) — no group-sized window; the
    distinct hash column is the required strict total order. Returns
    (keys..., h, rk <= k)."""
    return two_phase_group_top_k(
        df.select(*keys, "h"), keys, ["h"], k,
        n_salts=_KMV_SALTS, rank_col="rk",
    )


def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch per event type — the MERGEABLE
    distinct counter whose SKETCH CONTENT is portable, unlike HLL
    (approx_count_distinct's registers are engine-private, hence
    approx_distinct_bounds' weaker bounds oracle; KMV's k smallest
    md5-derived hashes are identical in any engine, so this one
    hash-verifies EXACTLY — estimate included).

    Estimator: (K-1) * SPACE / kth_min (the classic KMV/bottom-k
    estimate, integer floor form). Sketches merge by union+re-trim —
    the union/intersect algebra HLL lacks (theta-sketch use cases);
    union-merge associativity is pinned in tests. One shuffle on
    (event_type); the per-type rank window trims to K=128 rows each."""
    ev = load_table(spark, "events", sf_dir)
    h = F.expr(
        "cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)"
        " as bigint)"
    )
    hashes = ev.select("event_type", h.alias("h")).distinct()
    kmv = _bottom_k_hashes(hashes, ["event_type"], KMV_K)
    return (
        kmv.groupBy("event_type")
        .agg(
            F.count("*").alias("k_used"),
            F.max("h").alias("kth_min_hash"),
        )
        .select(
            "event_type",
            "k_used",
            "kth_min_hash",
            # small groups (< K distinct) are exact: k_used itself
            F.when(F.col("k_used") < KMV_K, F.col("k_used"))
            .otherwise(
                F.expr(f"({KMV_K} - 1) * cast({KMV_SPACE} as decimal(38,0))"
                       " DIV kth_min_hash")
            )
            .cast("long")
            .alias("est_distinct"),
        )
    )


def kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set ALGEBRA — the theta-sketch intersection estimate the
    plain distinct counter can't give: how many users both viewed and
    purchased, from two bottom-K sketches alone. This is the sketch
    family's justification at 100 TB: exact distinct-intersection
    needs a shuffle of both full key sets; the sketch answer needs
    2K rows.

    Method (Dasgupta et al., theta sketch): trim each side to its
    bottom-K md5 hashes, theta = the union's K-th smallest hash;
    est_intersection = |A ∩ B ∩ {h < theta}| * SPACE / theta, and
    est_union = (K-1) * SPACE / theta. All sketch CONTENT is
    md5-derived and engine-identical, so the estimates — not just
    bounds — hash-verify exactly (the F38 portability argument). The
    exact intersection is carried next to the estimate so the driver
    row also witnesses the sketch's accuracy. Small-domain exactness:
    when the union has < K distinct hashes, theta covers everything
    and both estimates collapse to exact counts."""
    ev = load_table(spark, "events", sf_dir)
    h = F.expr(
        "cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)"
        " as bigint)"
    )
    hashes = (
        ev.where(F.col("event_type").isin("view", "purchase"))
        .select("event_type", h.alias("h"))
        .distinct()
    )
    trimmed = (
        _bottom_k_hashes(hashes, ["event_type"], KMV_K)
        .localCheckpoint()  # feeds theta, the pair join, and both
        # per-side counts; 2K rows, one job
    )
    wu = Window.orderBy("h")  # union frame: <= 2K rows, bounded
    theta_f = (
        trimmed.select("h").distinct()
        .withColumn("urk", F.row_number().over(wu))
        .agg(
            F.max(F.when(F.col("urk") == KMV_K, F.col("h")))
            .alias("theta"),
            F.count("*").alias("n_union_seen"),
        )
    )
    a = trimmed.where(F.col("event_type") == "view").select("h")
    b = trimmed.where(F.col("event_type") == "purchase").select("h")
    common = a.join(b, "h").crossJoin(F.broadcast(theta_f)).agg(
        F.coalesce(  # empty pair join -> 0, not NULL
            F.sum(
                F.when(
                    F.col("theta").isNull() | (F.col("h") < F.col("theta")),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).alias("n_common_below"),
    )
    exact = (
        ev.where(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("nt"))
        .agg(
            F.sum(F.when(F.col("nt") == 2, 1).otherwise(0))
            .alias("exact_intersection")
        )
    )
    est_i = (
        F.when(F.col("theta").isNull(),
               F.col("n_common_below"))
        .otherwise(
            F.expr(
                f"n_common_below * cast({KMV_SPACE} as decimal(38,0))"
                " DIV theta"
            ).cast("long")
        )
    )
    est_u = (
        F.when(F.col("theta").isNull(), F.col("n_union_seen"))
        .otherwise(
            F.expr(
                f"({KMV_K} - 1) * cast({KMV_SPACE} as decimal(38,0))"
                " DIV theta"
            ).cast("long")
        )
    )
    return (
        theta_f.crossJoin(common).crossJoin(exact)
        .select(
            F.coalesce("theta", F.lit(-1)).alias("theta"),
            F.col("n_common_below").cast("long").alias("n_common_below"),
            est_u.cast("long").alias("est_union"),
            est_i.cast("long").alias("est_intersection"),
            F.col("exact_intersection").cast("long")
            .alias("exact_intersection"),
        )
    )


KMV_OVERLAP_ORACLE = f"""
    WITH hashes AS (
      SELECT DISTINCT event_type,
        ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    trimmed AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
        FROM hashes
      ) WHERE rk <= {KMV_K}
    ),
    theta_f AS (
      SELECT MAX(CASE WHEN urk = {KMV_K} THEN h END) AS theta,
             COUNT(*) AS n_union_seen
      FROM (
        SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS urk
        FROM (SELECT DISTINCT h FROM trimmed)
      )
    ),
    common AS (
      SELECT COUNT(*) AS n_common_below
      FROM (SELECT h FROM trimmed WHERE event_type = 'view') a
      JOIN (SELECT h FROM trimmed WHERE event_type = 'purchase') b
        USING (h), theta_f
      WHERE theta IS NULL OR h < theta
    ),
    exact AS (
      SELECT COUNT(*) AS exact_intersection FROM (
        SELECT user_id FROM events
        WHERE event_type IN ('view', 'purchase')
        GROUP BY user_id
        HAVING COUNT(DISTINCT event_type) = 2
      )
    )
    SELECT COALESCE(theta, -1) AS theta,
      CAST(n_common_below AS BIGINT) AS n_common_below,
      CAST(CASE WHEN theta IS NULL THEN n_union_seen
           ELSE ({KMV_K} - 1) * CAST({KMV_SPACE} AS HUGEINT) // theta
           END AS BIGINT) AS est_union,
      CAST(CASE WHEN theta IS NULL THEN n_common_below
           ELSE n_common_below * CAST({KMV_SPACE} AS HUGEINT) // theta
           END AS BIGINT) AS est_intersection,
      CAST(exact_intersection AS BIGINT) AS exact_intersection
    FROM theta_f, common, exact
"""


PSI_BINS = 10


def order_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-value distribution,
    first calendar half vs second half — THE ml-ops drift monitor for
    a feature/score column (rule of thumb: PSI < 0.1 stable, > 0.25
    drifted). Baseline decile edges come from period A; both periods
    are binned against them; PSI = Σ (p−q)·ln(p/q).

    Deterministic end-to-end: the time split is the integer midpoint
    epoch day; edges are exact rank picks (banded two-pass rank over
    period A, the E91 discipline — no global window); bin assignment
    is a pure value comparison against the 9-edge broadcast array;
    shares are integer ppm with add-one-ppm smoothing for empty
    cells; ln(p/q) is micro-rounded ONCE per bin (a 10-row frame).
    Output: per-bin (bin, n_a, n_b, p_ppm, q_ppm, term_pico) + the
    summed psi_micro on every row (units: term_pico = ppm·micro-nats;
    PSI = Σterm/1e12)."""
    orders = load_table(spark, "orders", sf_dir)
    o = orders.select(
        F.expr("datediff(cast(o_orderdate as date), date '1970-01-01')")
        .cast("long").alias("d"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    span = o.agg(
        ((F.min("d") + F.max("d") + 1) / 2).cast("long").alias("mid")
    )
    tagged = o.crossJoin(F.broadcast(span)).withColumn(
        "period", F.when(F.col("d") < F.col("mid"), "a").otherwise("b")
    ).localCheckpoint()  # feeds the edge derivation AND both binning
    # legs; midpoint scalar resolved once
    a = tagged.where(F.col("period") == "a")
    width = derive_band_width(a, "cents")
    ranked = with_global_rank(
        a.select("cents", "o_orderkey"),
        ["cents", "o_orderkey"],
        bucket=F.floor(F.col("cents") / F.lit(width)),
    )
    n_a_f = a.agg(F.count("*").alias("n_a_total"))
    is_edge_rank = F.expr(
        " or ".join(
            f"rank = cast(ceil(n_a_total * {k} / {PSI_BINS}) as bigint)"
            for k in range(1, PSI_BINS)
        )
    )
    edges = (
        ranked.crossJoin(F.broadcast(n_a_f))
        .where(is_edge_rank)
        .groupBy()
        .agg(F.sort_array(F.collect_list("cents")).alias("edges"))
    )
    binned = (
        tagged.crossJoin(F.broadcast(edges))
        .select(
            "period",
            (
                F.size(
                    F.filter(
                        "edges", lambda e: e < F.col("cents")
                    )
                ) + 1
            ).cast("long").alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("period") == "a", 1).otherwise(0))
            .alias("n_a"),
            F.sum(F.when(F.col("period") == "b", 1).otherwise(0))
            .alias("n_b"),
        )
    )
    totals = binned.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    shares = binned.crossJoin(F.broadcast(totals)).select(
        "bin", "n_a", "n_b",
        F.greatest(F.expr("n_a * 1000000 DIV ta"), F.lit(1))
        .alias("p_ppm"),
        F.greatest(F.expr("n_b * 1000000 DIV tb"), F.lit(1))
        .alias("q_ppm"),
    ).withColumn(
        "term_pico",
        (F.col("p_ppm") - F.col("q_ppm"))
        * F.expr(
            "cast(round(ln(cast(p_ppm as double) / cast(q_ppm as double))"
            " * 1000000) as bigint)"
        ),
    )
    psi = shares.agg(F.sum("term_pico").alias("psi_pico"))
    return shares.crossJoin(F.broadcast(psi)).select(
        "bin", "n_a", "n_b", "p_ppm", "q_ppm", "term_pico", "psi_pico"
    )


def doc_length_psi_by_source(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """F76 — per-SOURCE Population Stability Index of the doc-length
    distribution vs the corpus: which sources' length profiles
    deviate from the blend (truncation damage, boilerplate floods,
    format drift) — the per-source drift scorecard companion to
    order_value_psi's time-split drift (same rule of thumb: < 0.1
    stable, > 0.25 investigate).

    Same determinism discipline as E118: corpus decile edges are
    exact rank picks (with_global_rank banded lane — no global
    window), bin assignment a pure comparison against the broadcast
    9-edge array, shares integer ppm with add-one smoothing, ln(p/q)
    micro-rounded ONCE per (source, bin) cell of a (sources × 10)
    frame. Output: per source — docs and psi_micro (PSI·1e6)."""
    docs = load_table(spark, "documents", sf_dir)
    d = docs.select("source", "doc_id",
                    F.col("n_chars").cast("long").alias("len"))
    width = derive_band_width(d, "len")
    ranked = with_global_rank(
        d.select("len", "doc_id"), ["len", "doc_id"],
        bucket=F.floor(F.col("len") / F.lit(width)),
    )
    n_f = d.agg(F.count("*").alias("n_total"))
    is_edge = F.expr(
        " or ".join(
            f"rank = cast(ceil(n_total * {k} / {PSI_BINS}) as bigint)"
            for k in range(1, PSI_BINS)
        )
    )
    edges = (
        ranked.crossJoin(F.broadcast(n_f))
        .where(is_edge)
        .groupBy()
        .agg(F.sort_array(F.collect_list("len")).alias("edges"))
    )
    binned = (
        d.crossJoin(F.broadcast(edges))
        .select(
            "source",
            (
                F.size(F.filter("edges", lambda e: e < F.col("len")))
                + 1
            ).cast("long").alias("bin"),
        )
        .groupBy("source", "bin")
        .agg(F.count("*").alias("n_sb"))
    )
    corpus_bins = binned.groupBy("bin").agg(
        F.sum("n_sb").alias("n_cb")
    )
    src_tot = binned.groupBy("source").agg(F.sum("n_sb").alias("n_s"))
    # dense (source x bin) grid so empty source-bins still contribute
    # their smoothed term (a source missing a decile IS drift)
    grid = (
        src_tot.crossJoin(F.broadcast(corpus_bins))
        .join(binned, ["source", "bin"], "left")
        .crossJoin(F.broadcast(n_f))
        .select(
            "source", "bin", "n_s", "n_total",
            F.coalesce("n_sb", F.lit(0)).alias("n_sb"),
            "n_cb",
        )
    )
    terms = grid.select(
        "source", "n_s",
        F.greatest(F.expr("n_sb * 1000000 DIV n_s"), F.lit(1))
        .alias("p_ppm"),
        F.greatest(F.expr("n_cb * 1000000 DIV n_total"), F.lit(1))
        .alias("q_ppm"),
    ).withColumn(
        "term_pico",
        (F.col("p_ppm") - F.col("q_ppm"))
        * F.expr(
            "cast(round(ln(cast(p_ppm as double) / cast(q_ppm as double))"
            " * 1000000) as bigint)"
        ),
    )
    return terms.groupBy("source").agg(
        F.max("n_s").alias("n_docs"),
        F.expr("CAST(sum(term_pico) DIV 1000000 AS BIGINT)")
        .alias("psi_micro"),
    )


def _doc_psi_oracle() -> str:
    edge_ranks = " OR ".join(
        f"rank = CAST(ceil(n_total * {k} / {PSI_BINS}) AS BIGINT)"
        for k in range(1, PSI_BINS)
    )
    return f"""
    WITH d AS (
      SELECT source, doc_id, CAST(n_chars AS BIGINT) AS len
      FROM documents
    ),
    nf AS (SELECT COUNT(*) AS n_total FROM d),
    ranked AS (
      SELECT len, ROW_NUMBER() OVER (ORDER BY len, doc_id) AS rank
      FROM d
    ),
    edges AS (
      SELECT list_sort(list(len)) AS edges
      FROM ranked, nf WHERE {edge_ranks}
    ),
    binned AS (
      SELECT source,
        CAST(len(list_filter(edges, e -> e < d.len)) + 1 AS BIGINT)
          AS bin,
        COUNT(*) AS n_sb
      FROM d, edges GROUP BY 1, 2
    ),
    corpus_bins AS (
      SELECT bin, SUM(n_sb) AS n_cb FROM binned GROUP BY bin
    ),
    src_tot AS (
      SELECT source, SUM(n_sb) AS n_s FROM binned GROUP BY source
    ),
    grid AS (
      SELECT s.source, c.bin, s.n_s, nf.n_total,
        COALESCE(b.n_sb, 0) AS n_sb, c.n_cb
      FROM src_tot s
      CROSS JOIN corpus_bins c
      LEFT JOIN binned b ON b.source = s.source AND b.bin = c.bin
      CROSS JOIN nf
    ),
    terms AS (
      SELECT source, n_s,
        GREATEST(n_sb * 1000000 // n_s, 1) AS p_ppm,
        GREATEST(n_cb * 1000000 // n_total, 1) AS q_ppm
      FROM grid
    ),
    scored AS (
      SELECT source, n_s,
        (p_ppm - q_ppm) * CAST(round(ln(CAST(p_ppm AS DOUBLE)
          / CAST(q_ppm AS DOUBLE)) * 1000000) AS BIGINT) AS term_pico
      FROM terms
    )
    SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_docs,
      CAST(SUM(term_pico) // 1000000 AS BIGINT) AS psi_micro
    FROM scored GROUP BY source
    """


def _psi_oracle() -> str:
    edge_ranks = " OR ".join(
        f"rank = CAST(ceil(n_a_total * {k} / {PSI_BINS}) AS BIGINT)"
        for k in range(1, PSI_BINS)
    )
    return f"""
    WITH o AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS d,
             o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    span AS (SELECT (MIN(d) + MAX(d) + 1) // 2 AS mid FROM o),
    tagged AS (
      SELECT cents, o_orderkey,
        CASE WHEN d < mid THEN 'a' ELSE 'b' END AS period
      FROM o, span
    ),
    a AS (SELECT * FROM tagged WHERE period = 'a'),
    ranked AS (
      SELECT cents,
        ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rank,
        COUNT(*) OVER () AS n_a_total
      FROM a
    ),
    edges AS (
      SELECT list_sort(list(cents)) AS es FROM ranked
      WHERE {edge_ranks}
    ),
    binned AS (
      SELECT CAST(len(list_filter(es, e -> e < cents)) + 1 AS BIGINT)
               AS bin,
             period
      FROM tagged, edges
    ),
    counts AS (
      SELECT bin,
        CAST(SUM(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_a,
        CAST(SUM(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_b
      FROM binned GROUP BY bin
    ),
    totals AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM counts),
    shares AS (
      SELECT bin, n_a, n_b,
        CAST(GREATEST(n_a * 1000000 // ta, 1) AS BIGINT) AS p_ppm,
        CAST(GREATEST(n_b * 1000000 // tb, 1) AS BIGINT) AS q_ppm
      FROM counts, totals
    ),
    terms AS (
      SELECT bin, n_a, n_b, p_ppm, q_ppm,
        (p_ppm - q_ppm)
          * CAST(ROUND(ln(CAST(p_ppm AS DOUBLE) / CAST(q_ppm AS DOUBLE))
                 * 1000000) AS BIGINT) AS term_pico
      FROM shares
    )
    SELECT bin, n_a, n_b, p_ppm, q_ppm, term_pico,
      (SELECT CAST(SUM(term_pico) AS BIGINT) FROM terms) AS psi_pico
    FROM terms
"""


HIST2D_QTY_BIN = 10        # l_quantity in [1,50] -> 5-6 bins
HIST2D_PRICE_BIN = 500000  # extendedprice cents bins of $5000


def lineitem_hist2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (quantity x price heatmap): the joint-distribution
    profile a 1-D histogram can't show (price scales with quantity —
    marginals look smooth while the joint is a ridge). Integer floor
    bins on integer cents, one map-side-combined groupBy; bin count is
    bounded by the value ranges, not the row count."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.select(
            F.expr(f"cast(l_quantity as bigint) DIV {HIST2D_QTY_BIN}")
            .alias("qty_bin"),
            F.expr(
                "cast(round(l_extendedprice * 100) as bigint)"
                f" DIV {HIST2D_PRICE_BIN}"
            ).alias("price_bin"),
        )
        .groupBy("qty_bin", "price_bin")
        .agg(F.count("*").alias("n"))
    )


def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem measures,
    long form (var_a < var_b) — the numeric-profile step before any
    modeling. One scan, all pairs in a single aggregate (six corr
    accumulators); rounded at the output boundary like lineitem_stats."""
    li = load_table(spark, "lineitem", sf_dir)
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    wide = li.agg(*[
        F.round(F.corr(a, b), 4).alias(f"c{i}")
        for i, (a, b) in enumerate(pairs)
    ])
    stack_args = ", ".join(
        f"'{a}', '{b}', c{i}" for i, (a, b) in enumerate(pairs)
    )
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (var_a, var_b, corr)"
    )


def price_quantity_decile_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint DECILE heatmap of price vs quantity — the rank-space twin
    of lineitem_hist2d: value-space bins show the raw ridge, decile
    bins show dependence with the marginals flattened (each row/column
    sums to ~n/10, so any off-uniform cell is pure association; this
    is a discretized Spearman view).

    Both decile assignments are the distributed two-pass rank
    (functions/ranking.py) over the FACT table — no global ntile
    window over |lineitem| anywhere: price ranks bucket by bands
    auto-derived from an approxQuantile probe of the price column
    (derive_band_width, ~256-bucket target; the round-7 hand-tuned
    2^22 width collapsed to 3 buckets over this catalog and
    serialized the window — the lesson behind the derivation),
    quantity ranks bucket by its own 50-value domain; NTILE(10) is
    reconstructed arithmetically from (rank, n) so the cells are
    bit-identical to the window form.

    Row identity: (l_orderkey, l_linenumber) is NOT unique in this
    testdata, so an `occ` occurrence index (row_number inside the
    duplicate group — arbitrary among bit-identical rows, hence
    harmless) completes a TOTAL order; both rankings are chained onto
    ONE frame, so the joint (price, qty) pairing never needs a
    row-key join and is engine-deterministic even through ties that
    straddle a decile edge."""
    li = load_table(spark, "lineitem", sf_dir)
    w_occ = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        "p_cents", "qty"
    )
    base = li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("p_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    ).withColumn("occ", F.row_number().over(w_occ))
    n = base.agg(F.count("*").alias("_n"))
    # price band width derived from the catalog's observed range —
    # the round-7 lesson: a hand-tuned 2^22-cent literal collapsed to
    # 3 buckets over this catalog and 9x'd the wall at 10x data. The
    # quantile probe runs on a bare single-column projection (parquet
    # prunes to l_extendedprice), NOT on `base`, whose occ window
    # would be recomputed just to be thrown away.
    p_width = derive_band_width(
        li.select(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            .alias("p_cents")
        ),
        "p_cents",
    )
    ranked = with_global_rank(
        with_global_rank(
            base,
            ["p_cents", "l_orderkey", "l_linenumber", "occ"],
            bucket=F.floor(F.col("p_cents") / F.lit(p_width)),
            rank_col="_rp",
        ),
        ["qty", "l_orderkey", "l_linenumber", "occ"],
        bucket=F.col("qty"),
        rank_col="_rq",
    ).crossJoin(F.broadcast(n))
    return (
        ranked.select(
            ntile_from_rank(F.col("_rp"), F.col("_n"), 10)
            .alias("price_decile"),
            ntile_from_rank(F.col("_rq"), F.col("_n"), 10)
            .alias("qty_decile"),
        )
        .groupBy("price_decile", "qty_decile")
        .agg(F.count("*").alias("n"))
    )


# One-pass table profile: every column's metrics in a SINGLE aggregate
# over lineitem. Spec rows: (column, spark integer-view expr, duckdb
# integer-view expr) — the integer view normalizes floats to cents /
# hundredths and timestamps to TZ-free epoch days so min/max are
# bit-portable; string columns profile NULL for min/max (distinct and
# null counts still run on the raw value).
_PROFILE_SPEC = [
    ("l_orderkey", "l_orderkey", "l_orderkey"),
    ("l_partkey", "l_partkey", "l_partkey"),
    ("l_suppkey", "l_suppkey", "l_suppkey"),
    ("l_linenumber", "cast(l_linenumber as bigint)",
     "CAST(l_linenumber AS BIGINT)"),
    ("l_quantity", "cast(l_quantity as bigint)",
     "CAST(l_quantity AS BIGINT)"),
    ("l_extendedprice", "cast(round(l_extendedprice * 100) as bigint)",
     "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"),
    ("l_discount", "cast(round(l_discount * 100) as bigint)",
     "CAST(ROUND(l_discount * 100) AS BIGINT)"),
    ("l_tax", "cast(round(l_tax * 100) as bigint)",
     "CAST(ROUND(l_tax * 100) AS BIGINT)"),
    ("l_returnflag", None, None),
    ("l_linestatus", None, None),
    ("l_shipdate",
     "cast(datediff(cast(l_shipdate as date), date '1970-01-01') as bigint)",
     "CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)"),
]


def table_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table column profile (deequ / `SUMMARIZE`-class): for every
    lineitem column, row count, null count, exact distinct count, and
    integer-normalized min/max — computed in ONE aggregate pass and
    emitted long-form via `stack` on the single aggregated row.

    Scale shape: the only data-sized work is the one scan + aggregate.
    The 11 exact COUNT(DISTINCT)s plan as a single Expand (fan-out 11)
    feeding one map-side-combined exchange — the documented cost of
    EXACT distincts in one pass; at 100 TB the same spec drops to
    approx_count_distinct per column (the sketch-vs-exact trade
    approx_distinct_bounds quantifies) without touching the shape.
    Everything after the aggregate is a 1-row project, so the stack
    melt is free. Min/max normalize to integer views (cents /
    hundredths / TZ-free epoch days) so the profile hash-verifies
    cross-engine; string columns report NULL min/max by design."""
    li = load_table(spark, "lineitem", sf_dir)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, (col, int_expr, _) in enumerate(_PROFILE_SPEC):
        aggs.append(F.count(col).alias(f"np_{i}"))
        aggs.append(F.countDistinct(col).alias(f"d_{i}"))
        v = F.expr(int_expr) if int_expr else F.lit(None).cast("long")
        aggs.append(F.min(v).alias(f"mn_{i}"))
        aggs.append(F.max(v).alias(f"mx_{i}"))
    row = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', np_{i}, d_{i}, mn_{i}, mx_{i}"
        for i, (col, _, _) in enumerate(_PROFILE_SPEC)
    )
    return row.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_SPEC)}, {stack_args})"
            " as (col_name, n_present, n_distinct, min_i, max_i)"
        ),
    ).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_present")).alias("n_null"),
        "n_distinct",
        "min_i",
        "max_i",
    )


def table_profile_approx(li: DataFrame, gate: bool = False) -> DataFrame:
    """The 100 TB default form of the table profile: every exact
    COUNT(DISTINCT) swapped for ``approx_count_distinct`` (HLL++ at
    ADC_RSD), which aggregates as a direct partial/final sketch merge
    — NO Expand node, so the scan feeds ONE map-side-combined
    aggregate instead of the fan-out-11 the exact profile pays (the
    plan difference is pinned in tests/test_plans.py).

    ``gate=True`` (the registered verification entry) additionally
    computes the exact distincts IN-PLAN and emits
    ``distinct_ok = |approx − exact| ≤ max(1, exact·ADC_TOL)`` per
    column — the approx_distinct_bounds accuracy-assertion pattern,
    so the DuckDB oracle (constant-true booleans over exact counts)
    hash-fails on any out-of-band sketch. Production callers pass
    ``gate=False`` and get the sketch-only plan.

    The gate lane runs the sketches and the exact distincts as TWO
    aggregates joined on their single output rows, NEVER one
    combined aggregate: multiple COUNT(DISTINCT)s plan via Expand,
    and a combined plan would materialize every non-distinct agg
    buffer — 11 HLL sketches ≈ 130 KB — PER EXPAND GROUP (one group
    per distinct value), which OOMs a default-1g-heap driver session
    at sf0.01 already (measured). Split, the sketch buffers exist
    exactly once and the Expand groups carry only long buffers, the
    same shape the exact profile already proved at scale."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, (col, int_expr, _) in enumerate(_PROFILE_SPEC):
        aggs.append(F.count(col).alias(f"np_{i}"))
        aggs.append(
            F.approx_count_distinct(col, ADC_RSD).alias(f"a_{i}")
        )
        v = F.expr(int_expr) if int_expr else F.lit(None).cast("long")
        aggs.append(F.min(v).alias(f"mn_{i}"))
        aggs.append(F.max(v).alias(f"mx_{i}"))
    row = li.agg(*aggs)
    if gate:
        exact_row = li.agg(*[
            F.countDistinct(col).alias(f"d_{i}")
            for i, (col, _, _) in enumerate(_PROFILE_SPEC)
        ])
        row = row.crossJoin(F.broadcast(exact_row))  # 1 row × 1 row
        ok = ", ".join(
            f"'{col}', np_{i}, "
            f"abs(a_{i} - d_{i}) <= greatest(1.0D, d_{i} * {ADC_TOL}D), "
            f"mn_{i}, mx_{i}"
            for i, (col, _, _) in enumerate(_PROFILE_SPEC)
        )
        melt = (f"stack({len(_PROFILE_SPEC)}, {ok})"
                " as (col_name, n_present, distinct_ok, min_i, max_i)")
        return row.select("n_rows", F.expr(melt)).select(
            "col_name",
            "n_rows",
            (F.col("n_rows") - F.col("n_present")).alias("n_null"),
            "distinct_ok",
            "min_i",
            "max_i",
        )
    vals = ", ".join(
        f"'{col}', np_{i}, a_{i}, mn_{i}, mx_{i}"
        for i, (col, _, _) in enumerate(_PROFILE_SPEC)
    )
    melt = (f"stack({len(_PROFILE_SPEC)}, {vals})"
            " as (col_name, n_present, approx_distinct, min_i, max_i)")
    return row.select("n_rows", F.expr(melt)).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_present")).alias("n_null"),
        "approx_distinct",
        "min_i",
        "max_i",
    )


def table_profile_lineitem_approx(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Registered gated form of the approx profile over lineitem —
    the sibling entry that makes table_profile_lineitem's "at 100 TB
    drop to approx_count_distinct" docstring claim exist as code."""
    return table_profile_approx(
        load_table(spark, "lineitem", sf_dir), gate=True
    )


def _profile_approx_oracle() -> str:
    parts = []
    for col, _, duck_expr in _PROFILE_SPEC:
        mn = f"CAST(MIN({duck_expr}) AS BIGINT)" if duck_expr \
            else "CAST(NULL AS BIGINT)"
        mx = f"CAST(MAX({duck_expr}) AS BIGINT)" if duck_expr \
            else "CAST(NULL AS BIGINT)"
        parts.append(f"""
        SELECT '{col}' AS col_name,
          CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
          TRUE AS distinct_ok,
          {mn} AS min_i, {mx} AS max_i
        FROM lineitem""")
    return "\nUNION ALL\n".join(parts)


def _profile_oracle() -> str:
    parts = []
    for col, _, duck_expr in _PROFILE_SPEC:
        mn = f"CAST(MIN({duck_expr}) AS BIGINT)" if duck_expr \
            else "CAST(NULL AS BIGINT)"
        mx = f"CAST(MAX({duck_expr}) AS BIGINT)" if duck_expr \
            else "CAST(NULL AS BIGINT)"
        parts.append(f"""
        SELECT '{col}' AS col_name,
          CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
          CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
          {mn} AS min_i, {mx} AS max_i
        FROM lineitem""")
    return "\nUNION ALL\n".join(parts)


# Primary-key candidates for the uniqueness profile, narrowest first.
# Each is a list of integer-typed lineitem columns; the composite is
# fingerprinted as a '|'-joined decimal string (identical rendering in
# Spark and DuckDB, unlike float formatting).
_KEY_CANDIDATES = [
    ["l_orderkey"],
    ["l_orderkey", "l_linenumber"],
    ["l_orderkey", "l_linenumber", "l_partkey"],
    ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
     "l_quantity"],
]


def key_candidate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key candidate discovery (the deequ `isUnique`
    constraint, swept over a candidate ladder in ONE pass): for each
    column combination, exact distinct count vs row count and a
    verdict — the audit that found this very testdata's
    (l_orderkey, l_linenumber) is NOT unique (NOTES.md r7, the trap
    that silently mispairs row-keyed joins). Five COUNT(DISTINCT)s
    plan as one Expand feeding one map-side-combined exchange (the
    table_profile shape); the melt runs on the single aggregated
    row."""
    li = load_table(spark, "lineitem", sf_dir)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, cols in enumerate(_KEY_CANDIDATES):
        fp = F.concat_ws(
            "|", *[F.col(c).cast("long").cast("string") for c in cols]
        )
        aggs.append(F.countDistinct(fp).alias(f"d_{i}"))
    row = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{','.join(cols)}', d_{i}"
        for i, cols in enumerate(_KEY_CANDIDATES)
    )
    return row.select(
        "n_rows",
        F.expr(
            f"stack({len(_KEY_CANDIDATES)}, {stack_args})"
            " as (candidate, n_distinct)"
        ),
    ).select(
        "candidate",
        "n_rows",
        "n_distinct",
        (F.col("n_rows") - F.col("n_distinct")).alias("n_dup_rows"),
        (F.col("n_distinct") == F.col("n_rows")).alias("is_key"),
    )


def _key_candidate_oracle() -> str:
    sel = ",\n          ".join(
        "COUNT(DISTINCT concat_ws('|', "
        + ", ".join(f"CAST(CAST({c} AS BIGINT) AS VARCHAR)" for c in cols)
        + f")) AS d_{i}"
        for i, cols in enumerate(_KEY_CANDIDATES)
    )
    unions = "\n      UNION ALL\n      ".join(
        f"SELECT '{','.join(cols)}' AS candidate, d_{i} AS n_distinct "
        "FROM agg"
        for i, cols in enumerate(_KEY_CANDIDATES)
    )
    return f"""
        WITH agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          {sel}
          FROM lineitem
        ),
        melted AS (
          {unions}
        )
        SELECT candidate, n_rows, CAST(n_distinct AS BIGINT) AS n_distinct,
          CAST(n_rows - n_distinct AS BIGINT) AS n_dup_rows,
          n_distinct = n_rows AS is_key
        FROM melted CROSS JOIN agg
    """


def event_value_percentiles_exact(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """EXACT per-event-type value percentiles (P50/P90/P99 cents) —
    the latency-report shape, computed scale-safely: event-type
    groups are CORPUS-SIZED (|corpus|/5 each), so the usual
    ``Window.partitionBy(event_type)`` rank would funnel each whole
    group through one task; this runs on the with_grouped_rank
    per-group BANDED lane ((type, value-band) window partitions +
    broadcast per-group offsets — new in r9 for exactly this shape).

    Quantile definition is the inverse-CDF (type-1): value at rank
    ceil(q*n_g), realized as the integer ceiling (n_g*q + 99) DIV 100
    — engine-exact, no interpolation float. One conditional-min agg
    per group picks all three ranks in one pass over the ranked
    frame."""
    ev = load_table(spark, "events", sf_dir)
    d = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
    )
    width = derive_band_width(d, "cents")
    ranked = with_grouped_rank(
        d,
        ["event_type"],
        ["cents", "event_id"],
        bucket=F.floor(F.col("cents") / F.lit(width)),
        count_col="n_g",
    )
    sel = None
    aggs = [F.max("n_g").alias("n")]
    for q in (50, 90, 99):
        k = F.expr(f"(n_g * {q} + 99) DIV 100")
        aggs.append(
            F.min(F.when(F.col("rank") == k, F.col("cents")))
            .alias(f"p{q}_cents")
        )
        cond = F.col("rank") == k
        sel = cond if sel is None else (sel | cond)
    return ranked.where(sel).groupBy("event_type").agg(*aggs)


EVENT_PCTL_ORACLE = """
    WITH d AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents, event_id
      FROM events
    ),
    ranked AS (
      SELECT event_type, cents,
        ROW_NUMBER() OVER (
          PARTITION BY event_type ORDER BY cents, event_id
        ) AS rank,
        COUNT(*) OVER (PARTITION BY event_type) AS n_g
      FROM d
    )
    SELECT event_type, CAST(MAX(n_g) AS BIGINT) AS n,
      MIN(CASE WHEN rank = (n_g * 50 + 99) // 100 THEN cents END)
        AS p50_cents,
      MIN(CASE WHEN rank = (n_g * 90 + 99) // 100 THEN cents END)
        AS p90_cents,
      MIN(CASE WHEN rank = (n_g * 99 + 99) // 100 THEN cents END)
        AS p99_cents
    FROM ranked GROUP BY event_type
"""


PROFILING_QUERIES = {
    "event_value_percentiles_exact": event_value_percentiles_exact,
    "key_candidate_profile": key_candidate_profile,
    "table_profile_lineitem": table_profile_lineitem,
    "table_profile_lineitem_approx": table_profile_lineitem_approx,
    "price_quantity_decile_heatmap": price_quantity_decile_heatmap,
    "kmv_distinct_users": kmv_distinct_users,
    "kmv_user_overlap": kmv_user_overlap,
    "order_value_psi": order_value_psi,
    "doc_length_psi_by_source": doc_length_psi_by_source,
    "lineitem_hist2d": lineitem_hist2d,
    "lineitem_corr_matrix": lineitem_corr_matrix,
    "stratified_sample": stratified_sample,
    "approx_distinct_bounds": approx_distinct_bounds,
    "skew_diagnostics": skew_diagnostics,
    "cms_user_counts": cms_user_counts,
}

PROFILING_ORACLES = {
    "event_value_percentiles_exact": EVENT_PCTL_ORACLE,
    "key_candidate_profile": _key_candidate_oracle(),
    "table_profile_lineitem": _profile_oracle(),
    "table_profile_lineitem_approx": _profile_approx_oracle(),
    "price_quantity_decile_heatmap": """
        WITH base AS (
          SELECT l_orderkey, l_linenumber,
            CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p_cents,
            CAST(l_quantity AS BIGINT) AS qty,
            ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_linenumber
                               ORDER BY p_cents, qty) AS occ
          FROM lineitem
        ),
        d AS (
          SELECT
            CAST(NTILE(10) OVER (
              ORDER BY p_cents, l_orderkey, l_linenumber, occ) AS BIGINT)
              AS price_decile,
            CAST(NTILE(10) OVER (
              ORDER BY qty, l_orderkey, l_linenumber, occ) AS BIGINT)
              AS qty_decile
          FROM base
        )
        SELECT price_decile, qty_decile, COUNT(*) AS n
        FROM d GROUP BY price_decile, qty_decile
    """,
    "lineitem_hist2d": f"""
        SELECT CAST(l_quantity AS BIGINT) // {HIST2D_QTY_BIN} AS qty_bin,
          CAST(ROUND(l_extendedprice * 100) AS BIGINT)
            // {HIST2D_PRICE_BIN} AS price_bin,
          COUNT(*) AS n
        FROM lineitem GROUP BY qty_bin, price_bin
    """,
    "lineitem_corr_matrix": """
        SELECT 'l_quantity' AS var_a, 'l_extendedprice' AS var_b,
               ROUND(corr(l_quantity, l_extendedprice), 4) AS corr
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity', 'l_discount',
               ROUND(corr(l_quantity, l_discount), 4) FROM lineitem
        UNION ALL
        SELECT 'l_quantity', 'l_tax',
               ROUND(corr(l_quantity, l_tax), 4) FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', 'l_discount',
               ROUND(corr(l_extendedprice, l_discount), 4) FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', 'l_tax',
               ROUND(corr(l_extendedprice, l_tax), 4) FROM lineitem
        UNION ALL
        SELECT 'l_discount', 'l_tax',
               ROUND(corr(l_discount, l_tax), 4) FROM lineitem
    """,
    "kmv_user_overlap": KMV_OVERLAP_ORACLE,
    "order_value_psi": _psi_oracle(),
    "doc_length_psi_by_source": _doc_psi_oracle(),
    "kmv_distinct_users": f"""
        WITH hashes AS (
          SELECT DISTINCT event_type,
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
              AS h
          FROM events
        ),
        kmv AS (
          SELECT event_type, h,
            ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
          FROM hashes
        ),
        agg AS (
          SELECT event_type, COUNT(*) AS k_used, MAX(h) AS kth_min_hash
          FROM kmv WHERE rk <= {KMV_K} GROUP BY event_type
        )
        SELECT event_type, k_used, kth_min_hash,
          CAST(CASE WHEN k_used < {KMV_K} THEN k_used
               ELSE ({KMV_K} - 1) * CAST({KMV_SPACE} AS HUGEINT)
                    // kth_min_hash END AS BIGINT) AS est_distinct
        FROM agg
    """,
    "stratified_sample": f"""
        SELECT doc_id, lang, rn FROM (
          SELECT doc_id, lang,
            CAST(ROW_NUMBER() OVER (
              PARTITION BY lang ORDER BY md5(concat_ws('|', doc_id, text))
            ) AS BIGINT) AS rn
          FROM documents
        ) WHERE rn <= {SAMPLE_PER_STRATUM}
    """,
    # constant-true bounds oracle (same pattern as price_quantiles_approx):
    # the Spark side computes the booleans from exact counts; any sketch
    # value outside the band fails the hash match.
    "approx_distinct_bounds": """
        SELECT DISTINCT event_type, TRUE AS distinct_ok FROM events
    """,
    # exact top-N counts value-verified; CMS bound booleans pinned TRUE
    "cms_user_counts": f"""
        SELECT user_id, n_events, TRUE AS cms_lower_ok, TRUE AS cms_upper_ok
        FROM (
          SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
          ORDER BY n_events DESC, user_id LIMIT {CMS_TOP_N}
        )
    """,
    "skew_diagnostics": """
        WITH per_key AS (
          SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey
        )
        SELECT COUNT(*) AS n_keys, MAX(cnt) AS max_cnt,
          ROUND(AVG(cnt), 4) AS avg_cnt,
          quantile_cont(cnt, 0.99) AS p99_cnt,
          ROUND(MAX(cnt) / AVG(cnt), 4) AS skew_factor,
          ROUND(MAX(cnt) * 1.0 / SUM(cnt), 6) AS top_share
        FROM per_key
    """,
}
