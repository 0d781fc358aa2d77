"""Skyline (Pareto-dominance) operator: the rows not dominated in a
minimize-one / maximize-other trade-off — "no other row is at least as
cheap AND at least as big, strictly better in one". The classic
price/performance frontier query (Börzsönyi et al., ICDE'01), distinct
from part_revenue_pareto's cumulative-share frontier: dominance is a
partial order over two attributes, not a share of a total.

Shape, not a self-join: dominance under (min x, max y) collapses to a
running maximum — sort distinct x ascending, a point survives iff its
per-x max(y) strictly exceeds the running max(y) over all strictly
smaller x. The naive form is one data-sized ordered window (the
anti-pattern this repo bans); here the running max is decomposed the
with_global_rank way: value bands from derive_band_width give
within-band exclusive running maxes plus a band-table prefix max
(bounded at <=4096 rows by the band-width property test) joined back
as offsets. The oracle runs the classic one-window form, so agreement
proves the decomposition.

Reference scope: the reference's query surface has top-N and
aggregate reports (README.md §6); the frontier query is the mandated
relational-engine extension beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
    derive_band_width,
)
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table


def skyline_min_max(df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Rows of `df` on the (minimize `min_col`, maximize `max_col`)
    skyline. Equal-coordinate duplicates are all kept (neither
    dominates — dominance needs one STRICT inequality). Both columns
    must be numeric; `min_col` bands are derived from the data."""
    pm = df.groupBy(min_col).agg(F.max(max_col).alias("_smax"))
    width = derive_band_width(pm, min_col)
    banded = pm.withColumn("_band", F.floor(F.col(min_col) / F.lit(width)))
    band_max = banded.groupBy("_band").agg(F.max("_smax").alias("_bmax"))
    # band-table prefix max: <=4096 rows by construction (the
    # derive_band_width property bound) — a calendar-spine-class
    # bounded window, not a data-sized one
    w_bands = Window.orderBy("_band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev_bands = band_max.withColumn("_pmax", F.max("_bmax").over(w_bands))
    w_in = Window.partitionBy("_band").orderBy(min_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    with_m = (
        banded.join(F.broadcast(prev_bands.select("_band", "_pmax")), "_band")
        .withColumn("_inprev", F.max("_smax").over(w_in))
        .withColumn(
            "_m",
            F.when(
                F.col("_pmax").isNull() & F.col("_inprev").isNull(), None
            ).otherwise(
                F.greatest(
                    F.coalesce("_pmax", "_inprev"),
                    F.coalesce("_inprev", "_pmax"),
                )
            ),
        )
    )
    sky_keys = with_m.where(
        F.col("_m").isNull() | (F.col("_smax") > F.col("_m"))
    ).select(min_col, F.col("_smax").alias(max_col))
    # the frontier is tiny by nature — broadcast it back onto the rows
    return df.join(F.broadcast(sky_keys), [min_col, max_col])


def part_price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered skyline: catalog parts where no other part is both
    cheaper-or-equal and larger-or-equal (strict in one) — the
    price/size Pareto frontier a buyer actually chooses from."""
    part = load_table(spark, "part", sf_dir)
    pts = part.select(
        "p_partkey", "p_name",
        F.round(F.col("p_retailprice") * 100).cast("long")
        .alias("price_cents"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    return skyline_min_max(pts, "price_cents", "p_size").select(
        "p_partkey", "p_name", "price_cents", "p_size"
    )


SKYLINE_ORACLE = """
    WITH pts AS (
      SELECT p_partkey, p_name,
        CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
        CAST(p_size AS BIGINT) AS p_size
      FROM part
    ),
    pm AS (
      SELECT price_cents, MAX(p_size) AS smax
      FROM pts GROUP BY price_cents
    ),
    mm AS (
      SELECT price_cents, smax,
        MAX(smax) OVER (ORDER BY price_cents
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
      FROM pm
    ),
    sky AS (
      SELECT price_cents, smax FROM mm WHERE m IS NULL OR smax > m
    )
    SELECT p_partkey, p_name, pts.price_cents, pts.p_size
    FROM pts
    JOIN sky ON pts.price_cents = sky.price_cents
            AND pts.p_size = sky.smax
"""

SKYLINE_QUERIES = {
    "part_price_size_skyline": part_price_size_skyline,
}

SKYLINE_ORACLES = {
    "part_price_size_skyline": SKYLINE_ORACLE,
}
