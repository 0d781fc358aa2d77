"""Sort-ordered layout: a range-clustered write must let a selective
predicate read strictly fewer files than a hash-shuffled write of the
same data, and its per-file ranges must be pairwise disjoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.operators import layout as L
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

N_FILES = 8


def _files_read(df) -> set[str]:
    return {
        r["f"]
        for r in df.select(F.input_file_name().alias("f")).distinct().collect()
    }


def test_clustered_layout_prunes_files(spark, sf_dir, tmp_path):
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    clustered, shuffled = str(tmp_path / "clustered"), str(tmp_path / "shuffled")
    L.optimize_layout(li, ["l_shipdate"], N_FILES).write.parquet(clustered)
    li.repartition(N_FILES).write.parquet(shuffled)

    lo, hi = "1996-01-01", "1996-03-31"
    pred = F.col("l_shipdate").between(lo, hi)
    want = li.filter(pred).count()
    got_c = spark.read.parquet(clustered).filter(pred)
    got_s = spark.read.parquet(shuffled).filter(pred)
    # identical answers...
    assert got_c.count() == got_s.count() == want > 0
    # ...but the clustered layout touches fewer files (the quarter
    # covers a small slice of the 7-year shipdate range; a hash
    # shuffle smears it over every file)
    n_c, n_s = len(_files_read(got_c)), len(_files_read(got_s))
    assert n_s == N_FILES
    assert n_c < n_s, f"clustered read {n_c} files, shuffled {n_s}"


def test_clustered_file_ranges_disjoint(spark, sf_dir, tmp_path):
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    out = str(tmp_path / "ranged")
    L.optimize_layout(li, ["l_shipdate"], N_FILES).write.parquet(out)
    stats = sorted(
        (r["min_val"], r["max_val"])
        for r in L.file_stats(spark.read.parquet(out), "l_shipdate").collect()
    )
    assert len(stats) > 1
    for (_, prev_max), (nxt_min, _) in zip(stats, stats[1:]):
        # range boundaries may share the single boundary value (ties
        # land on either side) but must never interleave past it
        assert nxt_min >= prev_max, f"overlap: {prev_max} > {nxt_min}"
    # and the audit agrees with a full-table min/max
    lo = min(s[0] for s in stats)
    hi = max(s[1] for s in stats)
    row = li.agg(F.min("l_shipdate"), F.max("l_shipdate")).collect()[0]
    assert (lo, hi) == (row[0], row[1])
