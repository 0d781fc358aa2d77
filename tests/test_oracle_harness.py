"""Self-tests for tests/oracle.py — the harness is load-bearing for
100+ oracles, so its failure modes are pinned here: an ns-precision
timestamp oracle must NOT spuriously mismatch, and the silent-collapse
cases (duplicate output names, HUGEINT width drift, float32 noise)
must fail/pass loudly and deterministically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle import (
    _duck_type_class,
    _spark_type_class,
    assert_matches_oracle,
)


def test_timestamp_precision_variants_share_a_class():
    # DuckDB TIMESTAMP_S/_MS/_NS (e.g. from ns-precision parquet) are
    # the same canonical class as TIMESTAMP — an ns oracle read must
    # not spuriously fail the type gate.
    for t in ("TIMESTAMP", "TIMESTAMP_S", "TIMESTAMP_MS", "TIMESTAMP_NS",
              "TIMESTAMP WITH TIME ZONE"):
        assert _duck_type_class(t) == "timestamp", t
    assert _spark_type_class("timestamp") == "timestamp"
    assert _spark_type_class("timestamp_ntz") == "timestamp"


def test_ns_timestamp_oracle_passes(spark, sf_dir):
    # End-to-end: oracle casts to TIMESTAMP_NS, Spark emits timestamp —
    # classes agree and epoch-aligned values hash identically.
    df = spark.sql(
        "SELECT CAST(o_orderdate AS TIMESTAMP) AS od "
        "FROM parquet.`{}/orders.parquet` ORDER BY o_orderkey LIMIT 50".format(
            sf_dir
        )
    )
    assert_matches_oracle(
        df,
        "SELECT CAST(o_orderdate AS TIMESTAMP_NS) AS od FROM orders "
        "ORDER BY o_orderkey LIMIT 50",
        sf_dir,
    )


def test_duplicate_output_columns_fail_loudly(spark, sf_dir):
    df = spark.range(3).select(F.col("id"), F.col("id"))
    with pytest.raises(AssertionError, match="duplicate Spark output"):
        assert_matches_oracle(df, "SELECT 1 AS id, 2 AS id2", sf_dir)
    df_ok = spark.range(1).select(F.lit(1).alias("a"))
    with pytest.raises(AssertionError, match="duplicate oracle output"):
        assert_matches_oracle(df_ok, "SELECT 1 AS a, 2 AS a", sf_dir)


def test_hugeint_width_drift_fails_loudly(spark, sf_dir):
    # DuckDB SUM(int) yields HUGEINT; Spark SUM(long) yields bigint.
    # The class gate must catch the drift before the value compare.
    df = spark.range(5).agg(F.sum("id").alias("s"))
    with pytest.raises(AssertionError, match="type classes differ"):
        assert_matches_oracle(
            df, "SELECT SUM(x) AS s FROM (SELECT UNNEST(range(5)) AS x)",
            sf_dir,
        )


def test_float32_compared_at_float32_precision(spark, sf_dir):
    # A float32 column round-trips through ~7 significant digits; the
    # harness must compare at float32-safe precision instead of
    # manufacturing a 9-digit mismatch against the oracle's float64
    # rendering of the same value.
    df = spark.createDataFrame(
        [(0.1,), (1.0 / 3.0,)], "v float"
    ).select(F.col("v"))
    assert_matches_oracle(
        df,
        "SELECT CAST(0.1 AS FLOAT) AS v UNION ALL "
        "SELECT CAST(1.0/3.0 AS FLOAT) AS v",
        sf_dir,
    )
