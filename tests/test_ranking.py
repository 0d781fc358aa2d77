"""functions/ranking.py: the distributed two-pass global rank and the
arithmetic NTILE reconstruction that replaced the round-6 weak
single-partition windows. Properties pinned:

- with_global_rank == row_number() over a global ordered window, for
  skewed bucket layouts, negative keys, and a bucket that is constant
  (everything in one bucket — degenerates gracefully).
- ntile_from_rank == SQL-standard NTILE(k) for every (n, k) shape:
  n % k == 0, n % k != 0, n < k.
- determinism: two runs produce identical assignments.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
    derive_band_width,
    ntile_from_rank,
    with_global_rank,
)


def _ranked_vs_window(spark, rows, bucket):
    df = spark.createDataFrame(rows, "v long, id long")
    got = with_global_rank(df, ["v", "id"], bucket=bucket)
    want = df.withColumn(
        "want", F.row_number().over(Window.orderBy("v", "id")).cast("long")
    )
    j = got.join(want, ["v", "id"])
    assert j.where(F.col("rank") != F.col("want")).count() == 0
    assert j.count() == len(rows)


def test_global_rank_matches_window_skewed_buckets(spark):
    # heavy skew: 90% of rows share bucket 0
    rows = [(i % 10 if i % 10 else 0, i) for i in range(200)]
    _ranked_vs_window(spark, rows, bucket=F.floor(F.col("v") / F.lit(5)))


def test_global_rank_negative_keys_and_trunc_div_bucket(spark):
    # negative keys with a floor-div bucket (the customer_rfm shape)
    rows = [(-v, v) for v in range(97)]
    _ranked_vs_window(spark, rows, bucket=F.floor(F.col("v") / F.lit(8)))


def test_global_rank_single_bucket_degenerates(spark):
    rows = [(v * 3 % 17, v) for v in range(50)]
    _ranked_vs_window(spark, rows, bucket=F.lit(0))


def test_global_rank_deterministic(spark):
    rows = [(v * 7 % 23, v) for v in range(300)]
    df = spark.createDataFrame(rows, "v long, id long")
    b = F.col("v") % 5
    a = sorted(with_global_rank(df, ["v", "id"], bucket=b).collect())
    c = sorted(with_global_rank(df, ["v", "id"], bucket=b).collect())
    assert a == c


@pytest.mark.parametrize("n,k", [(100, 5), (6005, 10), (7, 5), (3, 5),
                                 (11, 5), (50, 7)])
def test_ntile_from_rank_matches_ntile(spark, n, k):
    df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    w = Window.orderBy("id")
    both = df.select(
        F.ntile(k).over(w).cast("long").alias("ref"),
        ntile_from_rank(
            F.row_number().over(w).cast("long"), F.lit(n).cast("long"), k
        ).alias("mine"),
    )
    assert both.where(F.col("ref") != F.col("mine")).count() == 0


def test_global_rank_rejects_null_bucket(spark):
    """A NULL bucket must raise, not silently drop rows through the
    inner offset join."""
    df = spark.createDataFrame([(1, 1), (None, 2)], "v long, id long")
    with pytest.raises(Exception, match="bucket expression yielded NULL"):
        with_global_rank(df, ["v", "id"], bucket=F.col("v")).collect()


def test_global_rank_cumsum_matches_window(spark):
    """cumsum_of must equal a running SUM over the same global order
    — the Pareto/ABC frame — including across bucket boundaries and
    under bucket skew."""
    rows = [((v * 13) % 37, v) for v in range(250)]
    df = spark.createDataFrame(rows, "v long, id long")
    got = with_global_rank(
        df, ["v", "id"], bucket=F.floor(F.col("v") / F.lit(6)),
        cumsum_of="v", cumsum_col="cum",
    )
    w = Window.orderBy("v", "id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = df.withColumn("want_cum", F.sum("v").over(w))
    j = got.join(want, ["v", "id"])
    assert j.where(F.col("cum") != F.col("want_cum")).count() == 0
    assert j.count() == len(rows)


def test_global_rank_multi_cumsum_matches_two_windows(spark):
    """The list form of cumsum_of (the two-sample-statistics lane)
    must equal per-column running SUMs over the same global order —
    both columns riding one aggregation, so the two outputs can never
    disagree on the order they cumulate over."""
    rows = [((v * 13) % 37, v, (v * 7) % 11) for v in range(250)]
    df = spark.createDataFrame(rows, "v long, id long, u long")
    got = with_global_rank(
        df, ["v", "id"], bucket=F.floor(F.col("v") / F.lit(6)),
        cumsum_of=["v", "u"], cumsum_col=["cv", "cu"],
    )
    w = Window.orderBy("v", "id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = df.withColumn("wv", F.sum("v").over(w)).withColumn(
        "wu", F.sum("u").over(w)
    )
    j = got.join(want, ["v", "id", "u"])
    assert j.where(
        (F.col("cv") != F.col("wv")) | (F.col("cu") != F.col("wu"))
    ).count() == 0
    assert j.count() == len(rows)


@pytest.mark.parametrize(
    "lo,hi",
    [
        (0, 100),            # small span
        (0, 10**6),          # 10^4x wider
        (-(10**8), 10**8),   # 10^6x wider, negative half included
        (5, 5),              # degenerate: zero span
        (900_00, 110_000_00),  # the round-7 catalog-cents shape
    ],
)
def test_derive_band_width_bucket_count_bounded(spark, lo, hi):
    """The property the round-7 hand-tuned literals violated: across
    10^6x value-range drift the derived width must keep the bucket
    count of the OBSERVED span within [16, 4096] (or the span is
    degenerate and one bucket is correct)."""
    import random

    rng = random.Random(7)
    rows = [(rng.randint(lo, hi),) for _ in range(2000)]
    df = spark.createDataFrame(rows, "v long")
    width = derive_band_width(df, "v")
    assert width > 0
    span = max(r[0] for r in rows) - min(r[0] for r in rows)
    n_buckets = int(span / width) + 1
    if span >= 16:
        assert 16 <= n_buckets <= 4096, (width, span, n_buckets)
    else:
        assert n_buckets <= 4096


def test_derive_band_width_subunit_span(spark):
    """A sub-unit span (the nll-in-nats shape) must yield a
    FRACTIONAL width, not collapse to a handful of integer bands."""
    import random

    rng = random.Random(11)
    rows = [(rng.uniform(4.0, 6.0),) for _ in range(2000)]
    df = spark.createDataFrame(rows, "v double")
    width = derive_band_width(df, "v")
    assert 0 < width < 1
    n_buckets = int(2.0 / width) + 1
    assert 16 <= n_buckets <= 4096, (width, n_buckets)


def test_derive_band_width_empty_frame(spark):
    df = spark.createDataFrame([], "v long")
    assert derive_band_width(df, "v") == 1


def test_global_rank_string_buckets_still_work(spark):
    """The null guard must not break non-numeric (string) buckets —
    the corpus_shuffle hex-prefix path."""
    rows = [(f"{v:02x}suffix", v) for v in range(64)]
    df = spark.createDataFrame(rows, "k string, id long")
    got = with_global_rank(
        df, ["k", "id"], bucket=F.substring("k", 1, 1)
    )
    import pyspark.sql.functions as SF
    want = df.withColumn(
        "want",
        SF.row_number().over(Window.orderBy("k", "id")).cast("long"),
    )
    j = got.join(want, ["k", "id"])
    assert j.where(SF.col("rank") != SF.col("want")).count() == 0


def test_two_phase_group_top_k_matches_window(spark):
    """The two-phase salted per-group top-k must equal the single
    row_number window — rows AND ranks — on a skewed-group fixture
    (one giant group, several small, one smaller than k)."""
    import random

    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        two_phase_group_top_k,
    )

    rng = random.Random(7)
    rows = (
        [("big", rng.random() * 1000 + i / 1e9) for i in range(3000)]
        + [("mid", float(i)) for i in range(50)]
        + [("tiny", float(i)) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = two_phase_group_top_k(df, ["g"], ["v"], 10, n_salts=8)
    import pyspark.sql.functions as SF
    w = Window.partitionBy("g").orderBy("v")
    want = (
        df.withColumn("want", SF.row_number().over(w).cast("long"))
        .where(SF.col("want") <= 10)
    )
    j = got.join(want, ["g", "v"], "full")
    assert j.where(
        SF.col("rank").isNull() | SF.col("want").isNull()
        | (SF.col("rank") != SF.col("want"))
    ).count() == 0
    assert got.where(SF.col("g") == "tiny").count() == 3


def test_grouped_rank_matches_per_group_window(spark):
    """with_grouped_rank must equal row_number() partitioned by the
    group — including across band boundaries, under band skew, and
    with the count_col rider."""
    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        with_grouped_rank,
    )

    rows = [((v * 7) % 3, (v * 13) % 37, v) for v in range(300)]
    df = spark.createDataFrame(rows, "g long, v long, id long")
    got = with_grouped_rank(
        df, ["g"], ["v", "id"], bucket=F.floor(F.col("v") / F.lit(6)),
        count_col="n_g",
    )
    w = Window.partitionBy("g").orderBy("v", "id")
    want = df.withColumn("want_rank", F.row_number().over(w))
    j = got.join(want, ["g", "v", "id"])
    assert j.where(F.col("rank") != F.col("want_rank")).count() == 0
    assert j.count() == len(rows)
    sizes = {r["g"]: r["c"] for r in
             df.groupBy("g").agg(F.count("*").alias("c")).collect()}
    assert got.where(
        F.col("n_g") != F.udf(lambda g: sizes[g], "long")("g")
    ).count() == 0


def test_grouped_rank_cumsum_matches_per_group_window(spark):
    """The grouped cumsum must equal a per-group running SUM window —
    restarting at group boundaries, across bands, under skew."""
    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        with_grouped_rank,
    )

    rows = [((v * 7) % 3, (v * 13) % 37, v, (v * 5) % 9)
            for v in range(300)]
    df = spark.createDataFrame(rows, "g long, v long, id long, q long")
    got = with_grouped_rank(
        df, ["g"], ["v", "id"], bucket=F.floor(F.col("v") / F.lit(6)),
        cumsum_of="q", cumsum_col="cq",
    )
    w = Window.partitionBy("g").orderBy("v", "id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = df.withColumn("wq", F.sum("q").over(w))
    j = got.join(want, ["g", "v", "id", "q"])
    assert j.where(F.col("cq") != F.col("wq")).count() == 0
    assert j.count() == len(rows)


def test_grouped_rank_null_group_matches_window_semantics(spark):
    """NULL group keys must behave exactly like Window.partitionBy:
    an ordinary partition of their own — not silently dropped through
    the offset equi-joins (the r9 ADVICE finding; plain equi-joins
    plus Catalyst's pushed isnotnull key filters would remove the
    rows without a trace). Covers the rank, count_col, and cumsum
    riders across multiple bands so the NULL group exercises the
    offset join, not just the window."""
    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        with_grouped_rank,
    )

    rows = [
        ((v * 7) % 3 if v % 5 else None, (v * 13) % 37, v, (v * 3) % 11)
        for v in range(200)
    ]
    df = spark.createDataFrame(rows, "g long, v long, id long, x long")
    got = with_grouped_rank(
        df, ["g"], ["v", "id"], bucket=F.floor(F.col("v") / F.lit(6)),
        count_col="n_g", cumsum_of="x", cumsum_col="cx",
    )
    assert got.count() == len(rows)  # nothing dropped
    w = Window.partitionBy("g").orderBy("v", "id")
    want = df.select(
        "g", "v", "id",
        F.row_number().over(w).cast("long").alias("want_rank"),
        F.count("*").over(
            Window.partitionBy("g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("want_n"),
        F.sum("x").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("want_cx"),
    )
    j = got.join(want, ["v", "id"])  # (v, id) unique; avoids NULL g keys
    assert j.count() == len(rows)
    assert j.where(
        (F.col("rank") != F.col("want_rank"))
        | (F.col("n_g") != F.col("want_n"))
        | (F.col("cx") != F.col("want_cx"))
    ).count() == 0
