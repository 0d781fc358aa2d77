"""Distributed two-sample distribution tests — Kolmogorov-Smirnov and
Mann-Whitney U — the "did this population shift?" audits that sit next
to PSI (plans/profiling.order_value_psi) and the categorical chi-square
(plans/relational_ext.priority_status_chi2) in a data-quality suite.

Why these shapes scale: both statistics are functionals of the joint
EMPIRICAL CDF, and the CDF over a value column collapses to the
DISTINCT-VALUE frame (per-value group counts + a cumulative sum in
value order). The cumulative sum is the classic global-ordered-window
trap; here it runs through functions/ranking.with_global_rank's banded
two-pass lane (per-bucket parallel windows + broadcast offsets), so no
single task ever sees more than one value band. Everything after the
cumsum is arithmetic on one broadcast-sized row.

Portability (the cross-engine float problem):
- KS: D = max |F1(v) - F2(v)| = max |c1*N2 - c2*N1| / (N1*N2) — the
  numerator is an exact integer per value, so the max, its argmin
  location, and the final micro-unit ratio are all integer ops.
- Mann-Whitney: tie midranks are half-integers, so DOUBLED rank sums
  are exact integers: R1_x2 = sum n1_v*(2*cum_n_v - n_v + 1). The
  z^2 statistic (not z — sqrt is not bit-portable, the
  ab_experiment_report precedent) with the tie correction is a
  RATIONAL function of integer sums:
  z^2 = 3*N*(N-1)*(U1_x2 - n1*n2)^2 / (n1*n2*((N+1)*N*(N-1) - sumT)),
  sumT = sum(t^3 - t) over tie groups — one floor division at the end.
  Products run in DECIMAL(38,0)/HUGEINT: the z^2 numerator grows as
  N^4 (like the chi-square entry, which documents the same bound) and
  passes int64 already around sf0.1; beyond ~sf10 rescale to
  per-million units before squaring.

Reference scope: the reference's analytics stop at GROUP BY rollups
(README.md §6); distribution-shift testing is part of the mandated
data-quality extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
    derive_band_width,
    with_global_rank,
)
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

_BIG = "CAST({} AS DECIMAL(38,0))"


def order_value_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS test: does the order-value distribution of
    finished orders ('F') differ from open ones ('O')?

    One row: group sizes, D in micro-units (max CDF gap * 1e6, floor),
    and the value (cents) where the max gap is first attained (min
    cents among ties — deterministic argmax).

    Plan: one groupBy(cents) count shuffle (two conditional sums ride
    it), the banded cumsum over the distinct-value frame carrying BOTH
    groups' cumulative counts in one pass (the with_global_rank list
    lane), then 1-row broadcast combines. The distinct-cents frame is
    bounded by the price grid (a domain constant), not the row count —
    but the banded lane keeps even that frame out of a single task."""
    orders = load_table(spark, "orders", sf_dir)
    v = (
        orders.where(F.col("o_orderstatus").isin("F", "O"))
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
            "o_orderstatus",
        )
        .groupBy("c")
        .agg(
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("n1"),
            F.sum(
                F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)
            ).alias("n2"),
        )
    )
    width = derive_band_width(v, "c")
    cum = with_global_rank(
        v,
        ["c"],
        bucket=F.floor(F.col("c") / F.lit(width)),
        cumsum_of=["n1", "n2"],
        cumsum_col=["c1", "c2"],
    )
    tot = v.agg(
        F.sum("n1").alias("n_f"), F.sum("n2").alias("n_o")
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "c",
        F.expr(
            f"ABS({_BIG.format('c1')} * n_o - {_BIG.format('c2')} * n_f)"
        ).alias("diff"),
    )
    mx = d.agg(F.max("diff").alias("m"))
    arg = (
        d.join(F.broadcast(mx), F.col("diff") == F.col("m"))
        .agg(F.min("c").alias("ks_at_cents"))
    )
    return (
        tot.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(arg))
        .select(
            "n_f",
            "n_o",
            F.expr(
                f"CAST(m * 1000000 DIV ({_BIG.format('n_f')} * n_o)"
                " AS BIGINT)"
            ).alias("ks_d_micro"),
            "ks_at_cents",
        )
    )


def priority_value_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) test: do urgent-class orders
    ('1-URGENT'/'2-HIGH') carry different values than the rest?

    One row: group sizes, AUC (= U1/(n1*n2), the probability a random
    urgent order outranks a random non-urgent one — the common-
    language effect size) in micro-units, and the tie-corrected z^2
    in micro-units (z^2 > 3.8415 <=> p < 0.05 two-sided).

    Same distinct-value frame as the KS entry; the cumsum here is the
    TOTAL count (midranks need it), and the doubled rank sum plus the
    tie term sum(t^3 - t) reduce in one map-side-combined aggregate.
    All arithmetic integer/DECIMAL(38,0) — see module docstring."""
    orders = load_table(spark, "orders", sf_dir)
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    v = (
        orders.select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
            F.when(urgent, 1).otherwise(0).alias("u"),
        )
        .groupBy("c")
        .agg(F.sum("u").alias("n1"), F.count("*").alias("nv"))
    )
    width = derive_band_width(v, "c")
    cum = with_global_rank(
        v,
        ["c"],
        bucket=F.floor(F.col("c") / F.lit(width)),
        cumsum_of="nv",
        cumsum_col="cn",
    )
    agg = cum.agg(
        F.sum(
            F.expr(f"{_BIG.format('n1')} * (2 * cn - nv + 1)")
        ).alias("r1x2"),
        F.sum(
            F.expr(f"{_BIG.format('nv')} * nv * nv - nv")
        ).alias("tie"),
        F.sum("n1").alias("nu"),
        F.sum(F.col("nv") - F.col("n1")).alias("no2"),
        F.sum("nv").alias("nn"),
    )
    big_nu, big_no, big_nn = (
        _BIG.format("nu"), _BIG.format("no2"), _BIG.format("nn")
    )
    u1x2 = f"(r1x2 - {big_nu} * (nu + 1))"
    dd = f"({u1x2} - {big_nu} * no2)"
    return agg.select(
        F.col("nu").alias("n_urgent"),
        F.col("no2").alias("n_other"),
        F.expr(
            f"CAST({u1x2} * 1000000 DIV (2 * {big_nu} * no2) AS BIGINT)"
        ).alias("auc_micro"),
        F.expr(
            f"CAST(3 * {big_nn} * (nn - 1) * {dd} * {dd} * 1000000"
            f" DIV ({big_nu} * no2 *"
            f" ((nn + 1) * {big_nn} * (nn - 1) - tie)) AS BIGINT)"
        ).alias("z2_micro"),
    )


def quantity_discount_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between lineitem quantity and discount — the
    concordance member of the correlation family (E70 Pearson, F44
    Spearman): rank-free, ties handled exactly, the association test
    that survives any monotone transform.

    Scale trick: both columns live on DOMAIN-BOUNDED grids (quantity
    1..50, discount 0..10 hundredths), so the n^2 pair enumeration
    collapses to the 550-cell JOINT-DISTINCT grid — concordant/
    discordant masses are one broadcast self-join over grid cells
    (<= 550^2/2 pairs, a constant at any corpus size), and the tie
    terms come off the two marginal rollups. One count shuffle
    against the fact table; everything after is grid-sized.

    Exactness: C, D, and the tie terms are exact integer sums in
    DECIMAL(38,0); tau_b needs a sqrt, which IS bit-portable (IEEE
    correctly rounded — the F57 finding), taken of an exact integer
    radicand converted to double ONCE; the ratio is micro-rounded
    once. C/D outputs pass int64 through ~sf10 (n^2/2 growth — the
    E64-chi2-style documented bound); tau_b_micro is bounded
    [-1e6, 1e6] at any scale."""
    li = load_table(spark, "lineitem", sf_dir)
    cell = (
        li.select(
            F.round("l_quantity").cast("long").alias("qx"),
            F.round(F.col("l_discount") * 100).cast("long").alias("dx"),
        )
        .groupBy("qx", "dx")
        .agg(F.count("*").cast("decimal(38,0)").alias("cnt"))
    )
    a, b = cell.alias("a"), cell.alias("b")
    cd = (
        a.join(F.broadcast(b), F.col("a.qx") < F.col("b.qx"))
        .agg(
            F.sum(
                F.when(
                    F.col("a.dx") < F.col("b.dx"),
                    F.col("a.cnt") * F.col("b.cnt"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("c_pairs"),
            F.sum(
                F.when(
                    F.col("a.dx") > F.col("b.dx"),
                    F.col("a.cnt") * F.col("b.cnt"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("d_pairs"),
        )
    )
    tx = (
        cell.groupBy("qx").agg(F.sum("cnt").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) DIV 2")).alias("tie_x"))
    )
    ty = (
        cell.groupBy("dx").agg(F.sum("cnt").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) DIV 2")).alias("tie_y"))
    )
    tot = cell.agg(F.sum("cnt").alias("n"))
    return (
        cd.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr("CAST(n AS BIGINT)").alias("n"),
            F.expr("CAST(c_pairs AS BIGINT)").alias("c_pairs"),
            F.expr("CAST(d_pairs AS BIGINT)").alias("d_pairs"),
            F.expr("CAST(tie_x AS BIGINT)").alias("tie_x_pairs"),
            F.expr("CAST(tie_y AS BIGINT)").alias("tie_y_pairs"),
            F.expr(
                "CAST(round(CAST(c_pairs - d_pairs AS DOUBLE) * 1000000"
                " / sqrt(CAST((n * (n - 1) DIV 2 - tie_x)"
                " * (n * (n - 1) DIV 2 - tie_y) AS DOUBLE)))"
                " AS BIGINT)"
            ).alias("tau_b_micro"),
        )
    )


def priority_value_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across the five order priorities — the
    parametric k-group complement to the two-group Mann-Whitney
    above: F = (SSB/(k-1)) / (SSW/(N-k)) plus eta-squared
    (SSB/(SSB+SSW)), the variance-explained effect size.

    Exactness path: per-group sufficient statistics (n_g, S_g, Q_g)
    are exact integer sums; the only non-integer step, S_g^2/n_g, is
    FLOORED once per group in the 5-row-bounded priority frame (<= 1
    cents^2 loss per group — deterministic and engine-shared, the
    per-cell discipline of the chi-square/PMI entries). NOTE the
    floor cannot use Spark's DIV: DIV always returns BIGINT, so a
    quotient past int64 silently wraps (found by this entry's oracle
    at sf0.001 — S_g^2/n_g is ~1e17 already). The exact-decimal floor
    idiom is (a - a % b) / b: the subtraction makes the quotient
    exact, so the scale-6 decimal division is representable and the
    final cast truncates nothing. F and eta^2 are then single
    truncating DIVs of DECIMAL(38,0) products whose QUOTIENTS are
    micro-bounded (safe for DIV's bigint result at any SF).

    Plan: ONE map-side-combined groupBy over orders; everything after
    is arithmetic on a broadcast 5-row frame."""
    orders = load_table(spark, "orders", sf_dir)
    g = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_g"),
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)")
        ).alias("s_g"),
        F.sum(
            F.expr(
                "CAST(round(o_totalprice * 100) AS DECIMAL(38,0))"
                " * CAST(round(o_totalprice * 100) AS DECIMAL(38,0))"
            )
        ).alias("q_g"),
    )
    agg = g.agg(
        F.count("*").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum(
            F.expr(
                "CAST((s_g * s_g - (s_g * s_g) % n_g) / n_g"
                " AS DECIMAL(38,0))"
            )
        ).alias("t"),
    )
    # A = N*sum(floor(S_g^2/n_g)) - S^2 (= SSB*N up to the floor),
    # B = N*Q - N*sum(...) (= SSW*N) — exact DECIMAL(38,0) products.
    a_c2 = "(CAST(n AS DECIMAL(38,0)) * t - s * s)"
    b_c2 = ("(CAST(n AS DECIMAL(38,0)) * q"
            " - CAST(n AS DECIMAL(38,0)) * t)")
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.expr(
            f"CAST({a_c2} * (n - k) * 1000000"
            f" DIV ((k - 1) * {b_c2}) AS BIGINT)"
        ).alias("f_stat_micro"),
        F.expr(
            f"CAST({a_c2} * 1000000 DIV ({a_c2} + {b_c2}) AS BIGINT)"
        ).alias("eta2_micro"),
    )


_ANOVA_ORACLE = """
WITH g AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS HUGEINT) AS n_g,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
              AS HUGEINT) AS s_g,
         SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)
             * CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS q_g
  FROM orders GROUP BY o_orderpriority
),
agg AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS k,
         SUM(n_g) AS n,
         SUM(s_g) AS s,
         SUM(q_g) AS q,
         SUM(s_g * s_g // n_g) AS t
  FROM g
)
SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
  CAST((n * t - s * s) * (n - k) * 1000000
       // ((k - 1) * (n * q - n * t)) AS BIGINT)
    AS f_stat_micro,
  CAST((n * t - s * s) * 1000000
       // ((n * t - s * s) + (n * q - n * t)) AS BIGINT)
    AS eta2_micro
FROM agg
"""


_KENDALL_ORACLE = """
WITH cell AS (
  SELECT CAST(ROUND(l_quantity) AS BIGINT) AS qx,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS dx,
         CAST(COUNT(*) AS HUGEINT) AS cnt
  FROM lineitem GROUP BY 1, 2
),
cd AS (
  SELECT SUM(CASE WHEN a.dx < b.dx THEN a.cnt * b.cnt
             ELSE CAST(0 AS HUGEINT) END) AS c_pairs,
         SUM(CASE WHEN a.dx > b.dx THEN a.cnt * b.cnt
             ELSE CAST(0 AS HUGEINT) END) AS d_pairs
  FROM cell a JOIN cell b ON a.qx < b.qx
),
tx AS (
  SELECT SUM(t * (t - 1) // 2) AS tie_x
  FROM (SELECT SUM(cnt) AS t FROM cell GROUP BY qx)
),
ty AS (
  SELECT SUM(t * (t - 1) // 2) AS tie_y
  FROM (SELECT SUM(cnt) AS t FROM cell GROUP BY dx)
),
tot AS (SELECT SUM(cnt) AS n FROM cell)
SELECT CAST(n AS BIGINT) AS n,
       CAST(c_pairs AS BIGINT) AS c_pairs,
       CAST(d_pairs AS BIGINT) AS d_pairs,
       CAST(tie_x AS BIGINT) AS tie_x_pairs,
       CAST(tie_y AS BIGINT) AS tie_y_pairs,
       CAST(ROUND(CAST(c_pairs - d_pairs AS DOUBLE) * 1000000
            / sqrt(CAST((n * (n - 1) // 2 - tie_x)
                        * (n * (n - 1) // 2 - tie_y) AS DOUBLE)))
            AS BIGINT) AS tau_b_micro
FROM cd, tx, ty, tot
"""


_KS_ORACLE = """
WITH s AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS n2
  FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY 1
),
cum AS (
  SELECT c, SUM(n1) OVER (ORDER BY c) AS c1,
         SUM(n2) OVER (ORDER BY c) AS c2
  FROM s
),
tot AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS n_f, CAST(SUM(n2) AS BIGINT) AS n_o
  FROM s
),
d AS (
  SELECT c,
         ABS(CAST(c1 AS HUGEINT) * n_o - CAST(c2 AS HUGEINT) * n_f)
           AS diff
  FROM cum, tot
),
mx AS (SELECT MAX(diff) AS m FROM d)
SELECT n_f, n_o,
       CAST(m * 1000000 // (CAST(n_f AS HUGEINT) * n_o) AS BIGINT)
         AS ks_d_micro,
       (SELECT MIN(c) FROM d WHERE diff = m) AS ks_at_cents
FROM tot, mx
"""

_MW_ORACLE = """
WITH s AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
         SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS n1,
         COUNT(*) AS nv
  FROM orders GROUP BY 1
),
cum AS (
  SELECT c, n1, nv, SUM(nv) OVER (ORDER BY c) AS cn FROM s
),
agg AS (
  SELECT SUM(CAST(n1 AS HUGEINT) * (2 * CAST(cn AS HUGEINT) - nv + 1))
           AS r1x2,
         SUM(CAST(nv AS HUGEINT) * nv * nv - nv) AS tie,
         CAST(SUM(n1) AS HUGEINT) AS nu,
         CAST(SUM(nv - n1) AS HUGEINT) AS no2,
         CAST(SUM(nv) AS HUGEINT) AS nn
  FROM cum
)
SELECT CAST(nu AS BIGINT) AS n_urgent,
       CAST(no2 AS BIGINT) AS n_other,
       CAST((r1x2 - nu * (nu + 1)) * 1000000 // (2 * nu * no2)
            AS BIGINT) AS auc_micro,
       CAST(3 * nn * (nn - 1)
            * (r1x2 - nu * (nu + 1) - nu * no2)
            * (r1x2 - nu * (nu + 1) - nu * no2) * 1000000
            // (nu * no2 * ((nn + 1) * nn * (nn - 1) - tie))
            AS BIGINT) AS z2_micro
FROM agg
"""

TWOSAMPLE_QUERIES = {
    "order_value_ks_test": order_value_ks_test,
    "priority_value_mannwhitney": priority_value_mannwhitney,
    "quantity_discount_kendall": quantity_discount_kendall,
    "priority_value_anova": priority_value_anova,
}

TWOSAMPLE_ORACLES = {
    "priority_value_anova": _ANOVA_ORACLE,
    "order_value_ks_test": _KS_ORACLE,
    "priority_value_mannwhitney": _MW_ORACLE,
    "quantity_discount_kendall": _KENDALL_ORACLE,
}
