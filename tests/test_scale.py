"""Scale-mechanics tests: partition-pruned reads on hive-partitioned
warehouse output, and salted aggregation equivalence."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.functions.skew import salted_count
from saurav_nayak_recipe_etl_project_spark.sources import sinks
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_warehouse_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, "orders", sf_dir)
    path = str(tmp_path / "orders_part")
    sinks.load_warehouse_table(orders, path, partition_by=["o_orderpriority"])

    back = sinks.read_warehouse_table(spark, path)
    pruned = back.filter(F.col("o_orderpriority") == "1-URGENT")
    plan = _plan(pruned)
    assert "PartitionFilters" in plan and "1-URGENT" in plan
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert pruned.count() == want


def test_salted_count_equals_direct(spark, sf_dir):
    lineitem = load_table(spark, "lineitem", sf_dir)
    direct = {
        r["l_returnflag"]: r["cnt"]
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt")).collect()
    }
    salted = {
        r["l_returnflag"]: r["cnt"]
        for r in salted_count(lineitem, "l_returnflag").collect()
    }
    assert salted == direct
