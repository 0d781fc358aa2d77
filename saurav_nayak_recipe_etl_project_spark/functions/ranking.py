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


def with_global_rank(
    df: DataFrame,
    sort_cols: list,
    bucket: Column,
    rank_col: str = "rank",
    materialize: bool = False,
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
    cnts = d.groupBy(_BUCKET).agg(F.count("*").alias("_rk_c"))
    lo = cnts.select(
        F.col(_BUCKET).alias("_rk_b_lo"), F.col("_rk_c").alias("_rk_c_lo")
    )
    offs = (
        cnts.join(
            F.broadcast(lo), F.col("_rk_b_lo") < F.col(_BUCKET), "left"
        )
        .groupBy(_BUCKET)
        .agg(F.coalesce(F.sum("_rk_c_lo"), F.lit(0)).alias(_OFFSET))
    )
    w = Window.partitionBy(_BUCKET).orderBy(*sort_cols)
    return (
        d.join(F.broadcast(offs), _BUCKET)
        .withColumn(
            rank_col,
            (F.row_number().over(w).cast("long") + F.col(_OFFSET)),
        )
        .drop(_BUCKET, _OFFSET)
    )


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
