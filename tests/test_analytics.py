"""Every registered oracle-able query must hash-match its DuckDB oracle
(same harness the driver runs at sf0.01; here at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from saurav_nayak_recipe_etl_project_spark.registry import ORACLES, QUERIES
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ORACLES[name], sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) == 10


def test_all_queries_have_callable(spark):
    for name, fn in QUERIES.items():
        assert callable(fn), name
