"""Distributed exact global ranking — the scale-safe replacement for
``row_number() OVER (ORDER BY ...)`` / ``ntile(k) OVER (ORDER BY ...)``
with no partition spec.

A global ordered window forces every row through ONE task (Spark plans
it as ``Exchange SinglePartition`` + sort): at 100 TB that task is the
job. The classic two-pass fix: bucket rows by an ORDER-PRESERVING key,
rank locally inside each bucket (parallel windows), and add each
bucket's global offset (= total rows in all earlier buckets, a
bucket-count frame that is broadcast-sized).

This module uses DETERMINISTIC value-derived buckets (a column
expression the caller supplies, e.g. a hash-hex prefix or
``value DIV width``) rather than ``repartitionByRange``: sampled range
boundaries are re-drawn per exchange computation, so the counts branch
and the rank branch could disagree when the exchange is not reused;
a value-derived bucket is pure, so both branches agree by
construction. Bucket-size skew is the caller's trade-off and is
documented per call site.

Reference scope: the reference's rankings run inside BigQuery
(README.md §6 queries use ORDER BY/LIMIT); this module exists so the
re-hosted engine can rank at cluster scale without the single-task
window BigQuery's engine hides from its users.

Requirements on inputs:
- ``sort_cols`` must be a STRICT total order (include a unique
  tie-break column) — ranks 1..n are then well-defined and
  engine-portable.
- ``bucket`` must be monotone non-decreasing w.r.t. ``sort_cols``
  order (rows in a lower bucket sort before every row in a higher
  bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "_rk_bucket"
_OFFSET = "_rk_offset"
_SUMOFF = "_rk_sumoff"


def with_global_rank(
    df: DataFrame,
    sort_cols: list,
    bucket: Column,
    rank_col: str = "rank",
    materialize: bool = False,
    cumsum_of: str | list | None = None,
    cumsum_col: str | list = "cum",
) -> DataFrame:
    """Add ``rank_col`` = exact 1-based global row_number of each row
    under ascending ``sort_cols``, computed with per-bucket parallel
    windows + broadcast offsets — no single-partition window.

    Plan shape: one hash shuffle of ``df`` by bucket (the window), one
    partial-agg count shuffle reduced to <= n_buckets rows, a
    broadcast triangle self-join over the count frame for offsets
    (O(B^2) rows driver-free), and a broadcast join back. Wall-clock
    is bounded by the largest bucket, not |df|.

    ``materialize`` (default OFF) lazily localCheckpoints the bucketed
    input so the counts branch and the rank branch share one
    computation. Measured at sf0.1: OFF is faster for every current
    caller (ReuseExchange already dedupes the shared upstream through
    the bucket shuffle, and the checkpoint's extra materialization
    pass costs more than it saves — perplexity_buckets 6.0s OFF vs
    10.8s ON). Keep the knob for callers whose upstream is NOT
    exchange-shaped (e.g. a mapInPandas source the optimizer can't
    common out); profile before flipping it.

    ``cumsum_of`` (a column name in ``df``, or a LIST of names — all
    riding the same aggregation, offsets, and join) additionally emits
    ``cumsum_col`` (resp. one output per name: an explicit list, or
    ``{col}_{cumsum_col}`` when ``cumsum_col`` stays a string) = the
    exact running sum of that column over the
    same global order — the Pareto / coverage-curve frame — via the
    identical two-pass shape: per-bucket window running sum plus the
    broadcast sum of all earlier buckets. No extra shuffle: the
    per-bucket sums ride the same count aggregation and the same
    offset join.
    """
    # NULL sort keys are unsupported (SQL windows order them
    # first/last; a null BUCKET would silently vanish through the
    # inner offset join below) — fail loudly instead of dropping rows.
    d = df.withColumn(
        _BUCKET,
        F.when(
            bucket.isNull(),
            F.assert_true(
                F.lit(False),
                F.lit("with_global_rank: bucket expression yielded NULL "
                      "(null sort keys unsupported)"),
            ),
        ).otherwise(bucket),
    )
    if materialize:
        d = d.localCheckpoint(eager=False)
    # cumsum_of accepts one column name or a list; a list rides the
    # SAME count aggregation and offset join (no extra shuffle per
    # column), which is what the two-sample statistics need (both
    # groups' cumulative counts over one shared value order).
    if cumsum_of is None:
        cs_cols, cs_names = [], []
    elif isinstance(cumsum_of, str):
        cs_cols, cs_names = [cumsum_of], [cumsum_col]
    else:
        cs_cols = list(cumsum_of)
        cs_names = (
            list(cumsum_col)
            if not isinstance(cumsum_col, str)
            else [f"{c}_{cumsum_col}" for c in cs_cols]
        )
    aggs = [F.count("*").alias("_rk_c")]
    for i, c in enumerate(cs_cols):
        aggs.append(F.sum(c).alias(f"_rk_s{i}"))
    cnts = d.groupBy(_BUCKET).agg(*aggs)
    lo_cols = [
        F.col(_BUCKET).alias("_rk_b_lo"), F.col("_rk_c").alias("_rk_c_lo")
    ]
    for i in range(len(cs_cols)):
        lo_cols.append(F.col(f"_rk_s{i}").alias(f"_rk_s{i}_lo"))
    lo = cnts.select(*lo_cols)
    off_aggs = [F.coalesce(F.sum("_rk_c_lo"), F.lit(0)).alias(_OFFSET)]
    for i in range(len(cs_cols)):
        off_aggs.append(
            F.coalesce(F.sum(f"_rk_s{i}_lo"), F.lit(0))
            .alias(f"{_SUMOFF}{i}")
        )
    offs = (
        cnts.join(
            F.broadcast(lo), F.col("_rk_b_lo") < F.col(_BUCKET), "left"
        )
        .groupBy(_BUCKET)
        .agg(*off_aggs)
    )
    w = Window.partitionBy(_BUCKET).orderBy(*sort_cols)
    out = (
        d.join(F.broadcast(offs), _BUCKET)
        .withColumn(
            rank_col,
            (F.row_number().over(w).cast("long") + F.col(_OFFSET)),
        )
    )
    for i, (c, name) in enumerate(zip(cs_cols, cs_names)):
        out = out.withColumn(
            name,
            F.sum(c).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            + F.col(f"{_SUMOFF}{i}"),
        ).drop(f"{_SUMOFF}{i}")
    return out.drop(_BUCKET, _OFFSET)


def with_grouped_rank(
    df: DataFrame,
    group_cols: list,
    sort_cols: list,
    bucket: Column,
    rank_col: str = "rank",
    count_col: str | None = None,
    cumsum_of: str | list | None = None,
    cumsum_col: str | list = "cum",
) -> DataFrame:
    """Per-GROUP exact 1-based rank under ascending ``sort_cols`` —
    the banded lane for ranking WITHIN groups that are themselves
    corpus-sized (event types, statuses: |group| = |corpus|/k). A
    plain ``Window.partitionBy(group)`` funnels each whole group
    through ONE task; here the window partition is (group, bucket),
    so wall-clock is bounded by the largest band of the largest
    group, and the offset frame is (groups x <=~4096 bands) —
    broadcast-sized whenever the group key is catalog-bounded.

    Same requirements as ``with_global_rank`` (strict total order
    within a group via ``sort_cols``; ``bucket`` monotone w.r.t. the
    sort). NULL group keys are supported and rank as their own
    group — identical to ``Window.partitionBy``, which treats NULL as
    an ordinary partition: every group-key comparison below uses
    null-safe equality (``<=>``), so NULL-keyed rows neither vanish
    through the offset joins nor collide with any non-NULL group
    (the r9 ADVICE finding: plain equi-joins would silently drop
    them). Null-safe equality remains a hash-join key, so the plan
    shape (broadcast hash joins, no cartesian) is unchanged.
    ``count_col`` additionally emits each group's TOTAL row
    count (percentile selectors need n_g; it rides the same count
    aggregation, no extra scan). ``cumsum_of``/``cumsum_col`` mirror
    ``with_global_rank``'s per-row running sums, restarting at each
    group boundary (the weighted-median frame)."""
    if cumsum_of is None:
        cs_cols, cs_names = [], []
    elif isinstance(cumsum_of, str):
        cs_cols, cs_names = [cumsum_of], [cumsum_col]
    else:
        cs_cols = list(cumsum_of)
        cs_names = (
            list(cumsum_col)
            if not isinstance(cumsum_col, str)
            else [f"{c}_{cumsum_col}" for c in cs_cols]
        )
    d = df.withColumn(
        _BUCKET,
        F.when(
            bucket.isNull(),
            F.assert_true(
                F.lit(False),
                F.lit("with_grouped_rank: bucket expression yielded "
                      "NULL (null sort keys unsupported)"),
            ),
        ).otherwise(bucket),
    )
    aggs = [F.count("*").alias("_rk_c")]
    for i, c in enumerate(cs_cols):
        aggs.append(F.sum(c).alias(f"_rk_s{i}"))
    cnts = d.groupBy(*group_cols, _BUCKET).agg(*aggs)
    lo_cols = [
        *[F.col(c).alias(f"_rk_g_{c}") for c in group_cols],
        F.col(_BUCKET).alias("_rk_b_lo"),
        F.col("_rk_c").alias("_rk_c_lo"),
    ]
    for i in range(len(cs_cols)):
        lo_cols.append(F.col(f"_rk_s{i}").alias(f"_rk_s{i}_lo"))
    lo = cnts.select(*lo_cols)
    same_group = None
    for c in group_cols:
        # null-safe: a NULL group is ITS OWN group (window semantics),
        # never equal to a non-NULL one, never dropped
        eq = F.col(f"_rk_g_{c}").eqNullSafe(F.col(c))
        same_group = eq if same_group is None else (same_group & eq)
    off_aggs = [F.coalesce(F.sum("_rk_c_lo"), F.lit(0)).alias(_OFFSET)]
    for i in range(len(cs_cols)):
        off_aggs.append(
            F.coalesce(F.sum(f"_rk_s{i}_lo"), F.lit(0))
            .alias(f"{_SUMOFF}{i}")
        )
    offs = (
        cnts.join(
            F.broadcast(lo),
            same_group & (F.col("_rk_b_lo") < F.col(_BUCKET)),
            "left",
        )
        .groupBy(*group_cols, _BUCKET)
        .agg(*off_aggs)
    )
    # the joins back onto the data are null-safe on the group keys for
    # the same reason as same_group above (a plain list-column join
    # compiles to EqualTo and silently drops NULL-keyed rows via the
    # pushed isnotnull key filters)
    offs_r = offs.select(
        *[F.col(c).alias(f"_rk_o_{c}") for c in group_cols],
        F.col(_BUCKET).alias("_rk_o_b"),
        F.col(_OFFSET),
        *[F.col(f"{_SUMOFF}{i}") for i in range(len(cs_cols))],
    )
    back = F.col(_BUCKET) == F.col("_rk_o_b")
    for c in group_cols:
        back = back & F.col(c).eqNullSafe(F.col(f"_rk_o_{c}"))
    w = Window.partitionBy(*group_cols, _BUCKET).orderBy(*sort_cols)
    out = (
        d.join(F.broadcast(offs_r), back)
        .drop("_rk_o_b", *[f"_rk_o_{c}" for c in group_cols])
        .withColumn(
            rank_col,
            F.row_number().over(w).cast("long") + F.col(_OFFSET),
        )
    )
    for i, (c, name) in enumerate(zip(cs_cols, cs_names)):
        out = out.withColumn(
            name,
            F.sum(c).over(w.rowsBetween(Window.unboundedPreceding, 0))
            + F.col(f"{_SUMOFF}{i}"),
        ).drop(f"{_SUMOFF}{i}")
    if count_col is not None:
        totals = cnts.groupBy(*group_cols).agg(
            F.sum("_rk_c").alias(count_col)
        ).select(
            *[F.col(c).alias(f"_rk_t_{c}") for c in group_cols],
            F.col(count_col),
        )
        tj = F.lit(True)
        for c in group_cols:
            tj = tj & F.col(c).eqNullSafe(F.col(f"_rk_t_{c}"))
        out = out.join(F.broadcast(totals), tj).drop(
            *[f"_rk_t_{c}" for c in group_cols]
        )
    return out.drop(_BUCKET, _OFFSET)


def derive_band_width(
    df: DataFrame,
    col: str,
    target_buckets: int = 256,
    q_lo: float = 0.005,
    q_hi: float = 0.995,
    relative_error: float = 0.001,
) -> float:
    """Derive a ``with_global_rank`` band width from the DATA instead
    of a hand-tuned literal, so a 100x value-range drift can't
    collapse the buckets to a handful of giant windows (the round-7
    lesson: 2^22-cent bands over a [$900, $110k] catalog left 3
    buckets and a 9x wall-clock at 10x data).

    One approxQuantile pass (Greenwald-Khanna sketch — O(1) driver
    result at any scale) samples the [q_lo, q_hi] value span; the
    width is the power of two putting ~``target_buckets`` buckets
    across that span. Outliers beyond the quantile clip simply land
    in their own sparse buckets — floor(value/width) is total, so no
    row is lost. The returned width is baked into the plan as a
    literal, so the counts branch and the rank branch of
    ``with_global_rank`` agree by construction.

    Power-of-two snap keeps the bucket count within [target/2,
    target*2] of the requested target across ANY value range
    (property-tested in tests/test_ranking.py over 10^6x spans).
    Widths may be FRACTIONAL (a double) — sub-unit spans (e.g. a
    ~2-nat log-likelihood spread) need sub-unit bands, and
    ``floor(value / width)`` stays monotone for any positive width."""
    return derive_band_widths(
        df, [col], target_buckets, q_lo, q_hi, relative_error
    )[0]


def derive_band_widths(
    df: DataFrame,
    cols: list,
    target_buckets: int = 256,
    q_lo: float = 0.005,
    q_hi: float = 0.995,
    relative_error: float = 0.001,
) -> list:
    """Multi-column ``derive_band_width``: ONE approxQuantile pass
    over the frame covers every rank key a caller needs (the
    customer_rfm shape: three metrics, one derivation scan)."""
    import math

    res = df.stat.approxQuantile(cols, [q_lo, q_hi], relative_error)
    widths = []
    for qs in res:
        if len(qs) < 2:  # empty frame: any width works, 1 is total
            widths.append(1.0)
            continue
        span = float(qs[1]) - float(qs[0])
        # NaN/degenerate (constant within the clip): one bucket
        if not span > 0:
            widths.append(1.0)
            continue
        widths.append(2.0 ** round(math.log2(span / target_buckets)))
    return widths


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL-standard NTILE(k) bucket from an exact global rank.

    NTILE gives the first ``n % k`` buckets ``n DIV k + 1`` rows and
    the rest ``n DIV k`` — reproduced arithmetically so the bucket a
    row lands in is identical to ``ntile(k) OVER (ORDER BY ...)`` in
    both Spark and DuckDB without any global window. All integer; the
    q=0 (n < k) case is covered by the first branch (r = n, so every
    rank satisfies rank <= r * (q + 1))."""
    base = F.floor(n / F.lit(k)).cast("long")
    rem = (n % F.lit(k)).cast("long")
    big = rem * (base + F.lit(1))
    return (
        F.when(rank <= big, F.floor((rank - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((rank - big - 1) / base) + 1)
        .cast("long")
    )


def two_phase_group_top_k(
    df: DataFrame,
    keys: list,
    sort_cols: list,
    k: int,
    n_salts: int = 64,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact per-group top-k under ascending ``sort_cols`` WITHOUT a
    group-sized window: phase 1 ranks inside (keys, salt) cells and
    keeps k per cell (windows bounded by ~group/n_salts), phase 2
    ranks the <= n_salts*k survivors per group and keeps k. The row
    SET and ranks equal the single ``row_number() OVER (PARTITION BY
    keys ORDER BY sort_cols) <= k`` window — provided ``sort_cols``
    is a strict total order within each group (the module-header
    requirement; without it phase-1 tie-dropping could pick a
    different, equally-valid top-k than the window form and the
    oracle bridge breaks).

    The salt hashes the sort columns themselves — deterministic,
    repartition-stable, and safe precisely BECAUSE sort_cols is a
    total order (no duplicate rows per group, so the functions/skew.py
    duplicate-row caveat cannot bite). This is the hot-group
    counterpart of ``with_global_rank``: use that when the frame has
    NO grouping, this when groups exist but one group can be
    arbitrarily large (language strata, event types, sketch keys)."""
    salt = F.pmod(F.xxhash64(*sort_cols), F.lit(n_salts))
    salted = df.withColumn("_tp_salt", salt)
    w1 = Window.partitionBy(*(keys + ["_tp_salt"])).orderBy(*sort_cols)
    pre = (
        salted.withColumn("_tp_rk", F.row_number().over(w1))
        .where(F.col("_tp_rk") <= k)
        .drop("_tp_rk")
    )
    w2 = Window.partitionBy(*keys).orderBy(*sort_cols)
    return (
        pre.withColumn(rank_col, F.row_number().over(w2).cast("long"))
        .where(F.col(rank_col) <= k)
        .drop("_tp_salt")
    )
