"""Edge-semantics tests for the round-3 generic operators: table_diff,
apply_changelog, and bucketed_interval_join (the registry queries are
oracle-verified in test_analytics.py; these pin the operator contracts
on handcrafted frames where every boundary case is visible)."""

from __future__ import annotations

from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.operators.delta import (
    apply_changelog,
    table_diff,
)
from saurav_nayak_recipe_etl_project_spark.operators.rangejoin import (
    bucketed_interval_join,
)


def test_table_diff_classifies_all_change_types(spark):
    cur = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    pri = spark.createDataFrame(
        [(1, "a"), (2, "OLD"), (9, "gone")], "k int, v string"
    )
    got = {
        r["k"]: r["change_type"]
        for r in table_diff(cur, pri, "k", ["v"]).collect()
    }
    assert got == {2: "changed", 3: "added", 9: "removed"}  # 1 unchanged: absent


def test_table_diff_hash_separates_columns(spark):
    # ("ab","c") must not collide with ("a","bc") — the unit separator
    # in the concat keeps column boundaries.
    cur = spark.createDataFrame([(1, "ab", "c")], "k int, x string, y string")
    pri = spark.createDataFrame([(1, "a", "bc")], "k int, x string, y string")
    rows = table_diff(cur, pri, "k", ["x", "y"]).collect()
    assert [r["change_type"] for r in rows] == ["changed"]


def test_apply_changelog_latest_wins_and_delete_drops(spark):
    log = spark.createDataFrame(
        [
            ("u1", 1, 1, "upsert", 10.0),
            ("u1", 2, 2, "upsert", 20.0),   # latest u1 -> survives with 20
            ("u2", 1, 3, "upsert", 5.0),
            ("u2", 3, 4, "delete", 0.0),    # latest u2 is delete -> dropped
            ("u3", 5, 5, "upsert", 7.0),
            ("u3", 5, 6, "upsert", 8.0),    # ts tie: event_id breaks it
        ],
        "user_id string, ts long, event_id long, op string, val double",
    )
    out = {
        r["user_id"]: (r["final_value"], r["n_ops"])
        for r in apply_changelog(
            log, "user_id", ["ts", "event_id"], "op", "val"
        ).collect()
    }
    assert out == {"u1": (20.0, 2), "u3": (8.0, 2)}


def test_bucketed_interval_join_matches_naive(spark):
    # intervals spanning 1, 2 and 3 buckets (width 10), plus boundary
    # points: start inclusive, end exclusive.
    points = spark.createDataFrame(
        [(p,) for p in [0, 5, 9, 10, 15, 19, 20, 29, 30, 35]], "p long"
    )
    intervals = spark.createDataFrame(
        [(1, 5, 15), (2, 10, 20), (3, 0, 30), (4, 19, 21)],
        "iid long, lo long, hi long",
    )
    got = sorted(
        (r["iid"], r["p"])
        for r in bucketed_interval_join(
            points, intervals, "p", "lo", "hi", 10
        ).collect()
    )
    naive = sorted(
        (r["iid"], r["p"])
        for r in points.crossJoin(intervals)
        .filter((F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi")))
        .collect()
    )
    assert got == naive and len(got) > 0


def test_topk_group_limit_pushdown_planned(spark, sf_dir):
    """The rank-limit filter must plan a PARTIAL WindowGroupLimit below
    the exchange (map-side prune) — the invariant that keeps top-k per
    group from shuffling every row at scale."""
    from saurav_nayak_recipe_etl_project_spark.operators.topk import (
        assert_group_limit_pushdown,
        topk_per_group,
    )

    df = spark.read.parquet(f"{sf_dir}/part.parquet")
    out = topk_per_group(df, ["p_brand"], "p_retailprice", ["p_partkey"], 3)
    assert_group_limit_pushdown(out)
    # and it matches the naive collect-and-sort on the same data
    import itertools

    rows = sorted(
        ((r["p_brand"], r["p_retailprice"], r["p_partkey"]) for r in df.collect()),
        key=lambda t: (t[0], -t[1], t[2]),
    )
    naive = {
        brand: [t[2] for t in itertools.islice(grp, 3)]
        for brand, grp in itertools.groupby(rows, key=lambda t: t[0])
    }
    got: dict = {}
    for r in out.orderBy("p_brand", "rank").collect():
        got.setdefault(r["p_brand"], []).append(r["p_partkey"])
    assert got == naive


def test_bucketed_interval_join_no_duplicate_pairs(spark):
    # one point inside an interval that spans 3 buckets must appear once
    points = spark.createDataFrame([(15,)], "p long")
    intervals = spark.createDataFrame([(1, 0, 30)], "iid long, lo long, hi long")
    rows = bucketed_interval_join(points, intervals, "p", "lo", "hi", 10).collect()
    assert len(rows) == 1


def test_cms_overestimates_never_underestimate(spark):
    """CMS structural guarantee on a synthetic skewed stream: the
    row-minimum estimate can never be below the true count (collisions
    only add), and a heavy key's estimate stays near truth."""
    from pyspark.sql import functions as F

    from saurav_nayak_recipe_etl_project_spark.plans import profiling as P

    rows = [(i % 7,) for i in range(700)] + [(999,)] * 300
    ev = spark.createDataFrame(rows, "user_id long")
    sk = F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            F.pmod(F.xxhash64(F.col("user_id"), F.lit(d)), F.lit(P.CMS_W))
            .cast("int").alias("bucket"),
        )
        for d in range(P.CMS_D)
    ])
    sketch = (
        ev.select(F.explode(sk).alias("r"))
        .groupBy(F.col("r.d").alias("d"), F.col("r.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    exact = ev.groupBy("user_id").agg(F.count("*").alias("ne"))
    probes = exact.select("user_id", "ne", F.explode(sk).alias("r")).select(
        "user_id", "ne", F.col("r.d").alias("d"), F.col("r.bucket").alias("bucket")
    )
    est = (
        probes.join(sketch, ["d", "bucket"])
        .groupBy("user_id", "ne").agg(F.min("cnt").alias("est"))
    )
    got = {r["user_id"]: (r["ne"], r["est"]) for r in est.collect()}
    assert all(e >= ne for ne, e in got.values())
    ne, e = got[999]
    assert ne == 300 and e - ne <= P.CMS_SLACK_FACTOR * 1000 / P.CMS_W


def test_cms_registry_gate(spark, sf_dir):
    from tests.oracle import assert_matches_oracle

    from saurav_nayak_recipe_etl_project_spark.plans.profiling import (
        PROFILING_ORACLES,
        PROFILING_QUERIES,
    )

    assert_matches_oracle(
        PROFILING_QUERIES["cms_user_counts"](spark, sf_dir),
        PROFILING_ORACLES["cms_user_counts"],
        sf_dir,
    )


def test_kmv_estimate_within_band_and_exact_below_k(spark, sf_dir):
    """KMV estimate within 3/sqrt(K-1) of exact for big groups; groups
    with < K distinct users are EXACT (the sketch holds them all)."""
    from saurav_nayak_recipe_etl_project_spark.plans.profiling import (
        KMV_K, kmv_distinct_users,
    )
    from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, "events", sf_dir)
    exact = {r["event_type"]: r["d"] for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("d")).collect()}
    out = {r["event_type"]: r for r in
           kmv_distinct_users(spark, sf_dir).collect()}
    band = 3.0 / (KMV_K - 1) ** 0.5
    for t, d in exact.items():
        r = out[t]
        if d < KMV_K:
            assert r["est_distinct"] == d, (t, r)
        else:
            assert abs(r["est_distinct"] - d) / d <= band, (t, r, d)


def test_kmv_merge_is_union_retrim(spark):
    """Sketch algebra: merging two KMV sketches (union of hash sets,
    re-trim to K smallest) must equal the sketch built directly on the
    concatenated data — the mergeability HLL registers can't offer
    portably."""
    import hashlib

    def sketch(users, k=8):
        hs = sorted(int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
                    for u in set(users))
        return hs[:k]

    a_users = list(range(0, 400))
    b_users = list(range(300, 700))     # overlapping sets
    merged = sorted(set(sketch(a_users, 8)) | set(sketch(b_users, 8)))[:8]
    direct = sketch(a_users + b_users, 8)
    assert merged == direct
