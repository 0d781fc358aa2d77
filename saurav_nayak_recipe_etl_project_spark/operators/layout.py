"""Data-layout optimization: sort-ordered writes for min/max file
skipping.

At 100 TB the cheapest scan is the one that never opens the file:
parquet footers carry per-column min/max, and engines (Spark's
ParquetScan row-group filtering, Trino/Iceberg/Delta file skipping)
drop whole files/row-groups whose range can't match the predicate.
That only works if the write was CLUSTERED on the predicate column —
a shuffled write spreads every value range into every file and the
stats prune nothing.

`optimize_layout` is the write-side half: repartitionByRange on the
clustering columns (one range shuffle, sampled boundaries → balanced
files) + sortWithinPartitions (tight per-file ranges, and tight
row-group ranges within files). `file_stats` is the read-side audit:
per-file min/max of a column, showing exactly how disjoint the file
ranges are — the operator a table-maintenance job runs to decide
whether a rewrite is due.

No SQL oracle (these are write-path/layout ops, not queries);
tests/test_layout.py pins the contract that a range-clustered layout
reads strictly fewer files than a hash-shuffled one for the same
selective predicate, and that file ranges are pairwise disjoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def optimize_layout(df: DataFrame, cluster_cols: list[str],
                    n_files: int) -> DataFrame:
    """Range-cluster `df` on `cluster_cols` into ~n_files output files
    with per-file sorted runs. Returns the re-laid-out frame ready for
    .write.parquet(...); composition (not side effects) so callers
    choose sink/format/mode. One range shuffle; boundaries come from
    Spark's reservoir sample of the sort key, so files stay balanced
    even under skew."""
    cols = [F.col(c) for c in cluster_cols]
    return df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)


Z_BITS = 16  # per-dimension rank resolution (2 dims -> 32-bit code)


def morton_code(rank_a, rank_b) -> F.Column:
    """Interleave the bits of two Z_BITS-wide integer ranks into one
    Morton (Z-order) key — pure Column bit algebra, whole-stage
    codegen'd. Locality property: points close in BOTH dimensions get
    close codes, so range-clustering on the code gives every file a
    small min/max BOX in (a, b) space instead of a thin stripe in one
    dimension."""
    code = F.lit(0).cast("long")
    for i in range(Z_BITS):
        code = (
            code
            + (F.shiftright(rank_a, i).bitwiseAND(1).cast("long")
               * F.lit(1 << (2 * i)))
            + (F.shiftright(rank_b, i).bitwiseAND(1).cast("long")
               * F.lit(1 << (2 * i + 1)))
        )
    return code


def optimize_layout_zorder(df: DataFrame, col_a: str, col_b: str,
                           n_files: int) -> DataFrame:
    """Z-ORDER the frame on two columns: each column is rank-normalized
    to Z_BITS bits (percent_rank — distribution-agnostic, skew-proof),
    bits interleaved into a Morton code, then range-clustered and
    sorted on the code (one extra window pass vs optimize_layout).

    Why not just sort by (a, b)? Lexicographic clustering prunes
    perfectly on `a` but not at all on `b` alone — every b-value lands
    in every file. Z-order trades a little pruning power on `a` for
    real pruning on BOTH columns: the multi-dimensional file-skipping
    layout Delta/Iceberg OPTIMIZE ZORDER provides, expressed in plain
    Spark. tests/test_layout.py pins the contract: a predicate on the
    SECOND column alone reads strictly fewer files than under the
    lexicographic layout.

    Rank normalization is width_bucket over the column's [min, max] —
    one tiny stats aggregate, NO global sort window (a percent_rank
    formulation would serialize the whole table through one window
    task at scale). Equi-width is fine for roughly uniform keys;
    heavily skewed columns should pass approxQuantile boundaries
    instead (same Morton step either way)."""
    stats = df.agg(
        F.min(col_a).cast("double").alias("_min_a"),
        F.max(col_a).cast("double").alias("_max_a"),
        F.min(col_b).cast("double").alias("_min_b"),
        F.max(col_b).cast("double").alias("_max_b"),
    )
    n_buckets = 1 << Z_BITS
    ranked = df.crossJoin(F.broadcast(stats)).withColumn(
        "_ra",
        (F.expr(f"width_bucket(cast({col_a} as double), _min_a, "
                f"_max_a + 1e-9, {n_buckets})") - 1).cast("int"),
    ).withColumn(
        "_rb",
        (F.expr(f"width_bucket(cast({col_b} as double), _min_b, "
                f"_max_b + 1e-9, {n_buckets})") - 1).cast("int"),
    ).drop("_min_a", "_max_a", "_min_b", "_max_b")
    coded = ranked.withColumn("_z", morton_code(F.col("_ra"), F.col("_rb")))
    return (
        coded.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_ra", "_rb", "_z")
    )


def file_stats(spark_df: DataFrame, col: str) -> DataFrame:
    """Per-file min/max/count audit of `col` for a parquet-backed
    frame: the skipping-effectiveness report. Runs as one scan with a
    file-keyed aggregation (input_file_name is codegen'd, no Python).
    Disjoint [min,max] ranges across files == predicates prune files;
    overlapping ranges == the layout needs optimize_layout."""
    return (
        spark_df.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(col).alias("min_val"),
            F.max(col).alias("max_val"),
            F.count("*").alias("n_rows"),
        )
    )
