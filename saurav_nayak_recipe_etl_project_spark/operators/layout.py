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
