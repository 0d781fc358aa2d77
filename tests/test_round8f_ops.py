"""Semantic pins for the sixth round-8 continuation batch: phrase
bigrams (adjacency semantics), source JS divergence (bounds,
identity regime), and langid predictor agreement (marginal
consistency with the individual predictors)."""

from __future__ import annotations

from tests.oracle import assert_matches_oracle

from saurav_nayak_recipe_etl_project_spark.registry import ORACLES, QUERIES


def test_new_entries_match_oracles(spark, sf_dir):
    for name in ["phrase_bigram_scores", "source_js_divergence",
                 "langid_agreement"]:
        assert_matches_oracle(QUERIES[name](spark, sf_dir),
                              ORACLES[name], sf_dir)


def test_phrase_scores_are_adjacency_counts(spark, sf_dir):
    rows = QUERIES["phrase_bigram_scores"](spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("text").collect()
    texts = [r["text"].strip().split() for r in docs]
    for r in rows[:5]:
        # recount the top pairs by brute force: adjacency only
        n = sum(
            1
            for toks in texts
            for i in range(len(toks) - 1)
            if toks[i] == r["w1"] and toks[i + 1] == r["w2"]
        )
        assert n == r["n_pair"] > 5


def test_js_divergence_bounds(spark, sf_dir):
    rows = QUERIES["source_js_divergence"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # JS is bounded [0, ln 2]; micro-rounding gives a 2-unit slack
        assert -2 <= r["js_micro"] <= 693149
        assert r["n_tokens"] > 0


def test_langid_agreement_marginals(spark, sf_dir):
    cells = QUERIES["langid_agreement"](spark, sf_dir).collect()
    assert cells
    n_total = sum(r["n_docs"] for r in cells)
    sw = QUERIES["text_langid"](spark, sf_dir).collect()
    assert n_total == len(sw)
    # marginal over the crosstab == the stopword predictor's own counts
    from collections import Counter
    want = Counter((r["labeled_lang"], r["predicted_lang"]) for r in sw)
    got = Counter()
    for r in cells:
        got[(r["labeled_lang"], r["pred_stopword"])] += r["n_docs"]
    assert got == want


def test_pseudonymization_properties(spark, sf_dir):
    from tests.oracle import assert_matches_oracle as amo

    from saurav_nayak_recipe_etl_project_spark.operators.privacy import (
        pseudonymize,
    )

    amo(QUERIES["pseudonymized_segment_report"](spark, sf_dir),
        ORACLES["pseudonymized_segment_report"], sf_dir)
    rows = QUERIES["pseudonymized_segment_report"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["token_collisions"] == 0
    # tokens are not the raw keys, are 64-hex, and are deterministic
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .select("c_custkey").limit(5)
    t1 = [r["c_custkey"] for r in pseudonymize(cust, ["c_custkey"]).collect()]
    t2 = [r["c_custkey"] for r in pseudonymize(cust, ["c_custkey"]).collect()]
    raw = [str(r["c_custkey"]) for r in cust.collect()]
    assert sorted(t1) == sorted(t2)
    assert all(len(t) == 64 and t not in raw for t in t1)
    # a different secret re-keys everything
    t3 = [r["c_custkey"]
          for r in pseudonymize(cust, ["c_custkey"], secret="k2").collect()]
    assert set(t1).isdisjoint(t3)


def test_neyman_allocation_is_exact_and_variance_weighted(spark, sf_dir):
    from tests.oracle import assert_matches_oracle as amo

    amo(QUERIES["neyman_allocation"](spark, sf_dir),
        ORACLES["neyman_allocation"], sf_dir)
    rows = QUERIES["neyman_allocation"](spark, sf_dir).collect()
    assert rows
    # the budget is spent exactly — no rounding leak
    assert sum(r["alloc"] for r in rows) == 100
    # allocation order follows the Neyman weights
    by_w = sorted(rows, key=lambda r: -r["w_micro"])
    allocs = [r["alloc"] for r in by_w]
    assert all(a >= b - 1 for a, b in zip(allocs, allocs[1:]))


def test_feature_store_covers_full_dimension(spark, sf_dir):
    from tests.oracle import assert_matches_oracle as amo

    amo(QUERIES["customer_feature_store"](spark, sf_dir),
        ORACLES["customer_feature_store"], sf_dir)
    rows = QUERIES["customer_feature_store"](spark, sf_dir).collect()
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    # full-dimension coverage: one feature row per customer, no misses
    assert len(rows) == n_cust
    never = [r for r in rows if r["n_orders"] == 0]
    ordered = [r for r in rows if r["n_orders"] > 0]
    # this synthetic corpus gives every customer orders (checked at
    # all SFs — unlike stock TPC-H), so the never-ordered regime is
    # normally empty; its zero-row semantics are still pinned below
    # whenever it appears, and by the oracle's LEFT JOIN equality
    assert ordered
    for r in never:
        assert (r["recency_days"], r["tenure_days"]) == (-1, -1)
        assert r["total_cents"] == r["n_items"] == 0
    for r in ordered:
        assert 0 <= r["recency_days"] <= r["tenure_days"]
        assert 0 <= r["return_rate_ppm"] <= 1_000_000
