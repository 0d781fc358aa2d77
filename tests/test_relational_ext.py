"""Semantics tests for the relational-extension operators.

The oracle battery (tests/test_analytics.py) hash-verifies all four
against DuckDB; these pin the EDGE semantics on tiny fixtures: CUBE's
four grouping sets and flag disambiguation, median's even/odd rank
selection, mode's deterministic tie-break, set-op partition laws, and
the unpivot key x metric completeness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.plans.relational_ext import (
    lineitem_metrics_unpivot,
    nation_account_setops,
    order_value_median_mode,
    orders_cube,
)

SF = "/root/testdata/sf0.001"


def test_cube_has_all_four_grouping_sets(spark):
    rows = orders_cube(spark, SF).collect()
    flag_pairs = {(r["g_priority"], r["g_status"]) for r in rows}
    assert flag_pairs == {(0, 0), (0, 1), (1, 0), (1, 1)}
    # the grand total row equals the sum of any full-detail slice
    total = next(r for r in rows if (r["g_priority"], r["g_status"]) == (1, 1))
    detail = [r for r in rows if (r["g_priority"], r["g_status"]) == (0, 0)]
    assert total["n_orders"] == sum(r["n_orders"] for r in detail)
    assert abs(total["revenue"] - round(sum(r["revenue"] for r in detail), 2)) < 0.05


def test_cube_flags_disambiguate_subtotals(spark):
    # each (priority)-subtotal row carries g_status=1, and its count
    # equals the sum of its detail rows
    rows = orders_cube(spark, SF).collect()
    detail = {}
    for r in rows:
        if (r["g_priority"], r["g_status"]) == (0, 0):
            detail.setdefault(r["o_orderpriority"], 0)
            detail[r["o_orderpriority"]] += r["n_orders"]
    for r in rows:
        if (r["g_priority"], r["g_status"]) == (0, 1):
            assert r["n_orders"] == detail[r["o_orderpriority"]]


def test_setops_membership_partitions(spark):
    rows = nation_account_setops(spark, SF).collect()
    by_m = {}
    for r in rows:
        by_m.setdefault(r["membership"], set()).add(r["n_name"])
    # the three membership classes are pairwise disjoint by construction
    classes = list(by_m.values())
    for i in range(len(classes)):
        for j in range(i + 1, len(classes)):
            assert not (classes[i] & classes[j])
    # a nation never appears twice
    assert len(rows) == len({r["n_name"] for r in rows})


def test_median_even_and_odd_groups(spark):
    df = spark.createDataFrame(
        [("A", "O", 1.00), ("A", "O", 2.00), ("A", "F", 10.00),
         ("B", "F", 1.00), ("B", "F", 3.00), ("B", "O", 3.00), ("B", "P", 100.00)],
        "o_orderpriority string, o_orderstatus string, o_totalprice double",
    )
    from saurav_nayak_recipe_etl_project_spark.plans import relational_ext

    d = df.select(
        "o_orderpriority", "o_orderstatus",
        relational_ext._cents().alias("cents"),
    )
    # reuse the operator body via a monkey-ish direct call: build the
    # same plan through the public function against a temp dir is
    # heavier; instead verify the formula on the fixture inline.
    from pyspark.sql.window import Window

    w_rank = Window.partitionBy("o_orderpriority").orderBy("cents")
    w_grp = Window.partitionBy("o_orderpriority")
    med = (
        d.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n", F.count("*").over(w_grp))
        .where((F.col("rn") == F.expr("(n + 1) DIV 2"))
               | (F.col("rn") == F.expr("(n + 2) DIV 2")))
        .groupBy("o_orderpriority")
        .agg(F.when(F.count("*") == 1, F.sum("cents") * 2)
             .otherwise(F.sum("cents")).alias("m2"))
        .collect()
    )
    got = {r["o_orderpriority"]: r["m2"] for r in med}
    # A: odd group {100,200,1000} -> median 200 -> x2 = 400
    assert got["A"] == 400
    # B: even group {100,300,300,10000} -> middle two 300,300 -> 600
    assert got["B"] == 600


def test_mode_tie_break_is_lexicographic_min(spark):
    # priority X: statuses F and O tie at 2 -> mode must be 'F'
    df = spark.createDataFrame(
        [("X", "O", 1.0), ("X", "O", 1.0), ("X", "F", 1.0), ("X", "F", 1.0),
         ("X", "P", 1.0)],
        "o_orderpriority string, o_orderstatus string, o_totalprice double",
    )
    from pyspark.sql.window import Window

    cnt = df.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("status_n"))
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("status_n"), F.asc("o_orderstatus"))
    got = (cnt.withColumn("rk", F.row_number().over(w))
           .where(F.col("rk") == 1).collect())
    assert got[0]["o_orderstatus"] == "F" and got[0]["status_n"] == 2


def test_median_mode_operator_end_to_end(spark):
    rows = order_value_median_mode(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # the display double is exactly the integer division
        assert r["median_value"] == r["median_x2_cents"] / 200.0
        assert r["mode_status"] in {"O", "F", "P"}
        assert r["mode_count"] <= r["n_orders"]


def test_unpivot_covers_every_flag_metric_pair(spark):
    rows = lineitem_metrics_unpivot(spark, SF).collect()
    flags = {r["l_returnflag"] for r in rows}
    metrics = {r["metric"] for r in rows}
    assert metrics == {"sum_qty", "sum_base_price", "sum_discount", "sum_tax"}
    assert len(rows) == len(flags) * 4
    # melt preserves values: qty sum must match a direct aggregation
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    direct = li.agg(
        (F.sum(F.round(F.col("l_quantity") * 100).cast("long")) / 100.0)
        .alias("s")).collect()[0]["s"]
    melted = sum(r["value"] for r in rows if r["metric"] == "sum_qty")
    assert abs(direct - melted) < 1e-6


def test_pareto_prefix_is_minimal_cover(spark):
    from saurav_nayak_recipe_etl_project_spark.plans.relational_ext import (
        part_revenue_pareto,
    )

    rows = part_revenue_pareto(spark, SF).collect()
    assert rows, "pareto frontier must be non-empty"
    ranks = sorted(r["rank"] for r in rows)
    # the emitted set is a rank prefix (no holes)
    assert ranks == list(range(1, len(ranks) + 1))
    last = max(rows, key=lambda r: r["rank"])
    first_rows = [r for r in rows if r["rank"] < last["rank"]]
    # every strict prefix covers < 25%; the cut happens at the crossing
    if first_rows:
        assert max(r["cum_share"] for r in first_rows) < 0.25
    assert last["cum_share"] >= 0.25 or len(rows) == 1
    # cum_share is nondecreasing with rank
    shares = [r["cum_share"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert shares == sorted(shares)


def test_rfm_scores_are_quintiles(spark):
    from saurav_nayak_recipe_etl_project_spark.plans.relational_ext import (
        customer_rfm,
    )

    rows = customer_rfm(spark, SF).collect()
    n = len(rows)
    for col in ("r_score", "f_score", "m_score"):
        counts = {}
        for r in rows:
            assert 1 <= r[col] <= 5
            counts[r[col]] = counts.get(r[col], 0) + 1
        # ntile balance: bucket sizes differ by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1
        assert sum(counts.values()) == n
    # monetary quintile 1 must dominate quintile 5 in value
    m1 = min(r["monetary"] for r in rows if r["m_score"] == 1)
    m5 = max(r["monetary"] for r in rows if r["m_score"] == 5)
    assert m1 >= m5


def test_trimmed_mean_drops_exact_tail_counts(spark):
    from saurav_nayak_recipe_etl_project_spark.plans.relational_ext import (
        order_value_trimmed_mean,
    )

    rows = order_value_trimmed_mean(spark, SF).collect()
    for r in rows:
        trim = r["n_orders"] // 20
        assert r["n_kept"] == r["n_orders"] - 2 * trim
        assert r["trimmed_mean"] > 0


def test_chi2_terms_zero_under_perfect_independence(spark):
    """A synthetic perfectly-independent crosstab must yield term_ppm 0
    in every cell (o*N == rt*ct exactly)."""
    from saurav_nayak_recipe_etl_project_spark.plans import relational_ext as R

    # 2x2 with counts 10,20 / 10,20: margins rt=30,30; ct=20,40; N=60
    # o*N = 10*60 = 600 = rt*ct/… -> 30*20=600: independent
    rows = (
        [("A", "X", 1.0)] * 10 + [("A", "Y", 1.0)] * 20
        + [("B", "X", 1.0)] * 10 + [("B", "Y", 1.0)] * 20
    )
    df = spark.createDataFrame(
        [(p, s, v) for p, s, v in rows],
        "o_orderpriority string, o_orderstatus string, o_totalprice double",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/orders.parquet")
        out = R.priority_status_chi2(spark, td).collect()
    assert len(out) == 4
    for r in out:
        assert r["term_ppm"] == 0, r


def test_mad_anomalies_robust_to_planted_outlier(spark, tmp_path):
    """A single enormous outlier must be flagged by MAD; the bulk of a
    tight cluster must not — and unlike the z-score the outlier cannot
    drag the scale estimate enough to hide itself."""
    import datetime as dt

    from saurav_nayak_recipe_etl_project_spark.plans.relational_ext import (
        event_anomalies_mad,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base, 1, "view", 10.0 + (i % 7) * 0.01, "{}")
            for i in range(40)]
    rows.append((99, base, 1, "view", 10000.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))
    out = event_anomalies_mad(spark, str(tmp_path)).collect()
    flagged = {r["event_id"] for r in out}
    assert 99 in flagged
    # the tight cluster stays unflagged
    assert all(e == 99 for e in flagged)


def test_ab_z2_flags_planted_conversion_gap(spark, tmp_path):
    """Plant a strong arm effect (conversion only for one arm's users)
    and the z^2 gate must fire; balanced identical arms must not."""
    import datetime as dt
    import hashlib

    from saurav_nayak_recipe_etl_project_spark.plans.relational_ext import (
        ab_experiment_report,
    )

    def arm_of(uid):
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:6], 16) % 2

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for uid in range(120):
        rows.append((eid, base, uid, "view", 1.0, "{}")); eid += 1
        # arm-1 users convert 10 minutes after first view; arm-0 never
        if arm_of(uid) == 1:
            rows.append((eid, base + dt.timedelta(minutes=10), uid,
                         "purchase", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))
    r = ab_experiment_report(spark, str(tmp_path)).collect()[0]
    assert r["conv0_ppm"] == 0 and r["conv1_ppm"] == 1_000_000
    assert r["significant_05"] is True


def test_ab_purchase_before_view_does_not_convert(spark, tmp_path):
    """The window is FORWARD from first view: an earlier purchase (or
    one past the window) must not count."""
    import datetime as dt

    from saurav_nayak_recipe_etl_project_spark.plans.relational_ext import (
        ab_experiment_report,
    )

    base = dt.datetime(2024, 1, 1, 12)
    rows = [
        # user 1: purchase BEFORE the first view
        (1, base - dt.timedelta(hours=1), 1, "purchase", 1.0, "{}"),
        (2, base, 1, "view", 1.0, "{}"),
        # user 2: purchase 3h after view (outside the 2h window)
        (3, base, 2, "view", 1.0, "{}"),
        (4, base + dt.timedelta(hours=3), 2, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))
    r = ab_experiment_report(spark, str(tmp_path)).collect()[0]
    assert r["c0"] == 0 and r["c1"] == 0


def test_kfold_covers_all_docs_balanced(spark):
    from saurav_nayak_recipe_etl_project_spark.plans.relational_ext import (
        FOLDS, kfold_assignment,
    )

    rows = kfold_assignment(spark, SF).collect()
    total = sum(r["n_docs"] for r in rows)
    n_all = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert total == n_all
    folds = {}
    for r in rows:
        folds[r["fold"]] = folds.get(r["fold"], 0) + r["n_docs"]
    assert set(folds) == set(range(FOLDS))
    # md5 split is near-uniform: no fold holds > 2x its fair share
    assert max(folds.values()) < 2 * n_all / FOLDS


def test_weighted_median_half_units_law(spark, tmp_path):
    """The weighted median is the smallest price where cumulative
    quantity reaches half the total units — verified on a fixture
    where the row median and the unit-weighted median DIFFER."""
    import tempfile

    from saurav_nayak_recipe_etl_project_spark.plans.relational_ext import (
        weighted_median_price,
    )

    # 3 rows: price 1.00 x 98 units, 2.00 x 1, 3.00 x 1.
    # row median = 2.00; unit-weighted median = 1.00.
    # (l_orderkey/l_linenumber: the r9 grouped-lane tie-break keys)
    df = spark.createDataFrame(
        [("A", 1, 1, 1.00, 98.0), ("A", 1, 2, 2.00, 1.0),
         ("A", 2, 1, 3.00, 1.0)],
        "l_returnflag string, l_orderkey long, l_linenumber int,"
        " l_extendedprice double, l_quantity double",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/lineitem.parquet")
        out = weighted_median_price(spark, td).collect()
    assert len(out) == 1
    assert out[0]["weighted_median_price"] == 1.00
    assert out[0]["total_qty"] == 100


def test_cusum_flags_planted_level_shift(spark, tmp_path):
    """A clean level shift mid-series: the max-|CUSUM| day must land
    exactly at the shift boundary."""
    import datetime as dt
    import tempfile

    from saurav_nayak_recipe_etl_project_spark.plans.relational_ext import (
        revenue_cusum,
    )

    rows = []
    base = dt.date(2024, 1, 1)
    for i in range(60):
        price = 100.0 if i < 30 else 300.0  # shift at day 30
        rows.append((i, 1, "O", price, "1-URGENT",
                     dt.datetime.combine(base + dt.timedelta(days=i),
                                         dt.time())))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderpriority string, o_orderdate timestamp_ntz",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/orders.parquet")
        out = revenue_cusum(spark, td).collect()
    cp = [r for r in out if r["is_changepoint"]]
    assert len(cp) == 1
    # |CUSUM| peaks on the LAST day of the old regime (day index 29)
    base_day = (base - dt.date(1970, 1, 1)).days
    assert cp[0]["epoch_day"] == base_day + 29
