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


def test_zorder_prunes_on_second_dimension(spark, sf_dir, tmp_path):
    """A lexicographic (a, b) clustering prunes nothing on a b-only
    predicate; a Z-ordered layout gives every file a bounded b-range,
    so the same predicate must skip files."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    lex = str(tmp_path / "lex")
    zor = str(tmp_path / "zorder")
    L.optimize_layout(li, ["l_partkey", "l_suppkey"], N_FILES).write.parquet(lex)
    L.optimize_layout_zorder(li, "l_partkey", "l_suppkey", N_FILES).write.parquet(zor)

    hi = li.agg(F.max("l_suppkey")).first()[0]
    pred = F.col("l_suppkey") <= int(hi * 0.1)  # selective b-only box
    want = li.filter(pred).count()
    got_lex = spark.read.parquet(lex).filter(pred)
    got_z = spark.read.parquet(zor).filter(pred)
    assert got_lex.count() == got_z.count() == want > 0
    n_lex, n_z = len(_files_read(got_lex)), len(_files_read(got_z))
    assert n_lex == N_FILES          # stripes: every file has every b
    assert n_z < n_lex, f"z-order read {n_z}, lexicographic {n_lex}"

    # and the z layout still prunes on the FIRST dimension too
    hi_a = li.agg(F.max("l_partkey")).first()[0]
    pred_a = F.col("l_partkey") <= int(hi_a * 0.1)
    n_z_a = len(_files_read(spark.read.parquet(zor).filter(pred_a)))
    assert n_z_a < N_FILES


def test_morton_code_locality(spark):
    """Morton bit interleave: hand-checked values and monotone growth
    along the diagonal."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 2), (3, 3)], "a int, b int"
    ).select("a", "b", L.morton_code(F.col("a"), F.col("b")).alias("z"))
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    assert got[(2, 2)] == 12
    assert got[(3, 3)] == 15
