"""Round-14 optimization-pass pins: every internal rewrite this round
must keep values bit-identical and actually shrink the cost it targets.

- functions/xxh.py replica == Spark's xxhash64 for INT inputs (the LSH
  plane-sign literals depend on this equality);
- _bucket (literal plane signs) == the pre-r14 per-row hash expression;
- txlog footer stats == the read-back aggregate stats, with the
  fallback firing on ineligible (string-stat / NaN) inputs;
- rebalanced state writes keep per-batch file counts bounded.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.functions.xxh import (
    spark_xxhash64_ints,
)


def test_xxhash64_replica_matches_spark(spark):
    vals = [0, 1, 2, 7, 63, 64, 255, 1024, 2**31 - 1, -1, -2**31]
    rows = [(a, b) for a in vals for b in vals]
    df = spark.createDataFrame(rows, "a int, b int")
    got = df.select("a", "b", F.xxhash64("a", "b").alias("h"),
                    F.xxhash64("a").alias("h1")).collect()
    for r in got:
        assert spark_xxhash64_ints(r["a"], r["b"]) == r["h"], (r["a"], r["b"])
        assert spark_xxhash64_ints(r["a"]) == r["h1"], r["a"]


def test_bucket_literal_signs_match_hash_expression(spark, sf_dir):
    """_bucket with driver-evaluated literal signs must equal the
    pre-r14 per-row xxhash64 HOF formula bit-for-bit."""
    from saurav_nayak_recipe_etl_project_spark.operators.similarity import (
        _as_double,
        _bucket,
    )

    def old_bucket(v_col, n_planes, dim=64, plane_offset=0):
        def plane_dot(p):
            return F.aggregate(
                F.zip_with(
                    v_col,
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda x, d: x * (F.pmod(F.xxhash64(p, d), F.lit(2))
                                      * 2 - 1),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        return F.aggregate(
            F.transform(
                F.sequence(F.lit(plane_offset),
                           F.lit(plane_offset + n_planes - 1)),
                lambda p: F.when(
                    plane_dot(p) > 0,
                    F.pow(F.lit(2.0), p - plane_offset).cast("int"),
                ).otherwise(0),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    for offset in (0, 4, 28):
        cmp = e.select(
            _bucket(F.col("v"), 4, plane_offset=offset).alias("new"),
            old_bucket(F.col("v"), 4, plane_offset=offset).alias("old"),
        )
        bad = cmp.filter(F.col("new") != F.col("old")).count()
        assert bad == 0, f"offset {offset}: {bad} rows differ"
        assert dict(cmp.dtypes)["new"] == dict(cmp.dtypes)["old"]


def test_footer_stats_match_readback_aggregate(spark, sf_dir, tmp_path):
    """tx_append's footer fast path must record the same stats the
    read-back aggregate would (rows, bytes, min/max per stat col)."""
    import saurav_nayak_recipe_etl_project_spark.sources.txlog as txlog

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    df = orders.select("o_orderkey", "o_totalprice").limit(500)

    t1 = str(tmp_path / "fast")
    txlog.tx_append(df, t1, ["o_orderkey", "o_totalprice"])
    fast = {p.split("/")[-1].split("-")[1]: st
            for p, st in txlog.snapshot_files(t1).items()}

    # force the fallback by disabling the fast path
    t2 = str(tmp_path / "slow")
    orig = txlog._footer_stats_actions
    txlog._footer_stats_actions = lambda *a, **k: None
    try:
        txlog.tx_append(df, t2, ["o_orderkey", "o_totalprice"])
    finally:
        txlog._footer_stats_actions = orig
    slow = {p.split("/")[-1].split("-")[1]: st
            for p, st in txlog.snapshot_files(t2).items()}

    assert set(fast) == set(slow) and fast, (fast.keys(), slow.keys())
    for k in fast:
        assert fast[k] == slow[k], (k, fast[k], slow[k])


def test_footer_stats_fallback_on_string_and_nan(spark, tmp_path):
    """Ineligible stat columns (string; NaN-holding double) must fall
    back to the read-back aggregate and still commit correct stats
    (NaN: Spark's MAX orders NaN largest; footer stats would not)."""
    import saurav_nayak_recipe_etl_project_spark.sources.txlog as txlog

    sdf = spark.createDataFrame(
        [(1, "b"), (2, "a")], "k long, s string")
    t = str(tmp_path / "t_str")
    txlog.tx_append(sdf, t, ["s"])
    stats = list(txlog.snapshot_files(t).values())
    assert {tuple(s["s"]) for s in stats} == {("a", "b")} or all(
        s["s"][0] <= s["s"][1] for s in stats)

    ndf = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, 5.0)], "k long, x double"
    ).coalesce(1)
    t2 = str(tmp_path / "t_nan")
    txlog.tx_append(ndf, t2, ["x"])
    (stats2,) = list(txlog.snapshot_files(t2).values())
    # Spark MAX semantics: NaN is the largest double — preserved
    assert str(stats2["x"][1]) == "nan", stats2


def test_rebalanced_state_writes_bound_file_counts(spark, sf_dir, tmp_path):
    """Per-batch MV state writes must not fan out one file per input
    partition × hive value (the pre-r14 layout): at most one data file
    per hive partition value for a small batch."""
    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )
    from saurav_nayak_recipe_etl_project_spark.streaming.pair_mv import (
        N_DOC_BUCKETS,
        pair_mv_process_batch,
    )

    docs = load_table(spark, "documents", sf_dir).repartition(8)
    state = str(tmp_path / "state")
    pair_mv_process_batch(docs, 0, state)
    sh_files = glob.glob(f"{state}/shingles/batch_id=0/bucket=*/*.parquet")
    buckets = glob.glob(f"{state}/shingles/batch_id=0/bucket=*")
    assert len(sh_files) <= max(len(buckets), N_DOC_BUCKETS), (
        f"{len(sh_files)} shingle files for {len(buckets)} buckets"
    )
    band_files = glob.glob(f"{state}/bands/batch_id=0/*.parquet")
    assert len(band_files) <= 4, band_files
