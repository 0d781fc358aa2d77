"""Top-k per group, shuffle-bounded — by Catalyst, not by hand.

The 100 TB concern with `row_number() OVER (PARTITION BY g ORDER BY v)
... <= k` is that every row crosses the shuffle when only k per group
survive. Spark 3.5+ solves this natively: the optimizer rewrites a
rank-limiting filter over a window into `WindowGroupLimit` with a
PARTIAL pass planned BEFORE the exchange — each map task forwards at
most k rows per group, exactly the hand-rolled two-phase top-k but
inside whole-stage codegen and with no Python or extra shuffle.

So the operator here IS the declarative window form; what this module
adds is the guarantee: `assert_group_limit_pushdown` inspects the
physical plan and raises unless the partial group-limit sits below the
exchange, and tests/test_round3_ops.py pins that invariant so a future
regression (e.g. a non-rank filter shape the rewrite can't match, or
`spark.sql.window.group.limit.threshold` mis-set below k) fails loudly
instead of silently shuffling the world.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

TOPK_K = 3


def topk_per_group(df: DataFrame, group_cols: Sequence[str], value_col: str,
                   tiebreak_cols: Sequence[str], k: int) -> DataFrame:
    """Exact top-k rows per group by value_col DESC (ties broken by
    tiebreak_cols ASC). Plans as WindowGroupLimit(Partial) -> Exchange
    -> WindowGroupLimit(Final): ≤ k rows per group per map task are
    shuffled."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc(value_col), *[F.asc(c) for c in tiebreak_cols]
    )
    return (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(*group_cols, value_col, *tiebreak_cols, "rank")
    )


def assert_group_limit_pushdown(df: DataFrame) -> None:
    """Raise unless the physical plan contains a Partial
    WindowGroupLimit BELOW the exchange (i.e. the map-side prune is
    actually planned). Call in tests / pipeline assembly, not per-row."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    partial = plan.find("WindowGroupLimit")
    partial_kind = plan.find(", Partial")
    if partial == -1 or partial_kind == -1:
        raise AssertionError(
            "WindowGroupLimit(Partial) missing from plan — rank-limit "
            "pushdown did not engage:\n" + plan[:2000]
        )
    exchange = plan.find("Exchange")
    if exchange != -1 and partial_kind < exchange:
        raise AssertionError(
            "Partial WindowGroupLimit appears above the Exchange — "
            "map-side prune not planned:\n" + plan[:2000]
        )


def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo: top-3 parts by lineitem revenue within each brand. One
    shuffle for the p_partkey revenue agg (map-side combined), then the
    group-limited window — only ≤3 parts per brand per task reach the
    window exchange."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            ).alias("cents")
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_partkey", "cents")
    )
    out = topk_per_group(rev, ["p_brand"], "cents", ["p_partkey"], TOPK_K)
    return out.select(
        "p_brand",
        "p_partkey",
        F.round(F.col("cents") / F.lit(100.0), 2).alias("revenue"),
        "rank",
    )


TOPK_QUERIES = {
    "topk_parts_per_brand": topk_parts_per_brand,
}

TOPK_ORACLES = {
    "topk_parts_per_brand": f"""
        WITH rev AS (
          SELECT p_brand, p_partkey,
            SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
              AS cents
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand, p_partkey
        )
        SELECT p_brand, p_partkey, ROUND(cents / 100.0, 2) AS revenue,
               CAST(rnk AS BIGINT) AS rank
        FROM (
          SELECT p_brand, p_partkey, cents,
            ROW_NUMBER() OVER (
              PARTITION BY p_brand ORDER BY cents DESC, p_partkey
            ) AS rnk
          FROM rev
        ) WHERE rnk <= {TOPK_K}
    """,
}
