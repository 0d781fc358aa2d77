"""Bucketed co-located join: pre-bucketing both fact tables on the
join key removes the per-query shuffle entirely — the physical plan
for the join must contain NO Exchange. This is the strategy for
repeated big-big joins at warehouse scale (pay the shuffle once at
write time, never again)."""

from __future__ import annotations

import contextlib
import io

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lineitem = load_table(spark, "lineitem", sf_dir)
        orders = load_table(spark, "orders", sf_dir)
        for t in ("li_bucketed", "o_bucketed"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .mode("overwrite").saveAsTable("li_bucketed"))
        (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .mode("overwrite").saveAsTable("o_bucketed"))

        li, o = spark.table("li_bucketed"), spark.table("o_bucketed")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).count()
        plan = _plan(joined)
        # join itself is exchange-free; the only exchange allowed is the
        # final tiny groupBy on o_orderstatus
        assert "SortMergeJoin" in plan
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part.split("HashAggregate")[-1]
        assert plan.count("Exchange (") <= 1 or plan.count("Exchange") <= 2

        want = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus").count().collect()
        )
        got = joined.collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        for t in ("li_bucketed", "o_bucketed"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
