"""Semantic pins for the fifth round-8 continuation batch: skyline
dominance (no surviving row dominated, no dominated row kept),
key-candidate uniqueness (the known (l_orderkey, l_linenumber) trap),
and embedding label separation (bounds and self-exclusion)."""

from __future__ import annotations

from tests.oracle import assert_matches_oracle

from saurav_nayak_recipe_etl_project_spark.registry import ORACLES, QUERIES


def test_new_entries_match_oracles(spark, sf_dir):
    for name in [
        "part_price_size_skyline",
        "key_candidate_profile",
        "embedding_label_separation",
    ]:
        assert_matches_oracle(QUERIES[name](spark, sf_dir),
                              ORACLES[name], sf_dir)


def test_skyline_is_exactly_the_undominated_set(spark, sf_dir):
    sky = [(r["price_cents"], r["p_size"], r["p_partkey"])
           for r in QUERIES["part_price_size_skyline"](spark, sf_dir)
           .collect()]
    assert sky
    pts = [
        (round(r["p_retailprice"] * 100), r["p_size"], r["p_partkey"])
        for r in spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_partkey", "p_retailprice", "p_size").collect()
    ]

    def dominated(p, q):  # q dominates p
        return (q[0] <= p[0] and q[1] >= p[1]
                and (q[0] < p[0] or q[1] > p[1]))

    brute = [p for p in pts if not any(dominated(p, q) for q in pts)]
    assert sorted(sky) == sorted(brute)
    assert 0 < len(sky) < len(pts)


def test_key_candidates_find_the_linenumber_trap(spark, sf_dir):
    rows = {r["candidate"]: r
            for r in QUERIES["key_candidate_profile"](spark, sf_dir)
            .collect()}
    # the documented testdata trap: (l_orderkey, l_linenumber) is NOT
    # unique (NOTES.md r7) — the audit must surface it
    trap = rows["l_orderkey,l_linenumber"]
    assert not trap["is_key"] and trap["n_dup_rows"] > 0
    # widening the candidate can only increase distinctness
    ladder = [rows[c]["n_distinct"] for c in [
        "l_orderkey",
        "l_orderkey,l_linenumber",
        "l_orderkey,l_linenumber,l_partkey",
        "l_orderkey,l_linenumber,l_partkey,l_suppkey",
        "l_orderkey,l_linenumber,l_partkey,l_suppkey,l_quantity",
    ]]
    assert ladder == sorted(ladder)
    for r in rows.values():
        assert r["is_key"] == (r["n_dup_rows"] == 0)
        assert r["n_distinct"] <= r["n_rows"]


def test_matryoshka_recall_monotone_with_full_dim_control(spark, sf_dir):
    from tests.oracle import assert_matches_oracle as amo

    amo(QUERIES["ann_matryoshka_recall"](spark, sf_dir),
        ORACLES["ann_matryoshka_recall"], sf_dir)
    rows = {r["dims"]: r["recall_ppm"]
            for r in QUERIES["ann_matryoshka_recall"](spark, sf_dir)
            .collect()}
    assert set(rows) == {8, 16, 32, 64}
    # the full-dim row is a self-comparison: exact 1.0 control
    assert rows[64] == 1_000_000
    # truncation can plausibly wobble but the extremes must order
    assert rows[8] <= rows[32] <= rows[64]


def test_label_separation_bounds(spark, sf_dir):
    rows = QUERIES["embedding_label_separation"](spark, sf_dir).collect()
    assert rows
    labels = {r["label"] for r in rows}
    for r in rows:
        assert r["nearest_label"] != r["label"]
        assert r["nearest_label"] in labels
        assert -1_000_000 <= r["intra_micro"] <= 1_000_000
        assert -1_000_000 <= r["inter_micro"] <= 1_000_000
        assert r["margin_micro"] == r["intra_micro"] - r["inter_micro"]
        assert r["n"] > 0


def test_theilsen_matches_oracle_and_is_sane(spark, sf_dir):
    from tests.oracle import assert_matches_oracle as amo

    amo(QUERIES["segment_trend_theilsen"](spark, sf_dir),
        ORACLES["segment_trend_theilsen"], sf_dir)
    rows = QUERIES["segment_trend_theilsen"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # n_pairs is exactly months-choose-2 (the calendar bound)
        n = r["n_months"]
        assert r["n_pairs"] == n * (n - 1) // 2
        assert r["slope_dollars_per_month"] == (
            r["theilsen_x2_micro"] / 2e8
        )
