"""Behavioral tests for BM25 retrieval and the char-trigram LM score.

The registry oracle battery (tests/test_analytics.py) already
hash-verifies both against DuckDB at sf0.001; these tests pin the
SEMANTICS on hand-built fixtures: BM25's tf saturation / length
normalization / idf ordering, and the LM score separating natural
repeated patterns from uniform gibberish.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.operators.retrieval import (
    bm25_topk,
    lm_score,
)

SCHEMA = "doc_id long, text string"


def _bm25_fixture(spark):
    # Vocabulary engineered for the rank-10..17 query-term window:
    # fillers f0..f8 (count 18) take ranks 1-9; alpha (8) rank 10;
    # echo/foxtrot/golf/hotel (3 each) ranks 11-14; bravo/charlie/
    # delta (2 each) ranks 15-17; unique pads (count 1) fall below.
    # Queries pair rank 10+q with rank 14+q: {alpha,hotel},
    # {echo,bravo}, {foxtrot,charlie}, {golf,delta}.
    f = " ".join(f"f{i}" for i in range(9))
    pads = " ".join(f"p{i}" for i in range(40))
    rows = [
        (1, "alpha hotel " + f),          # both terms of q0, short
        (2, ("alpha " * 6) + f + " " + pads),  # 6x one term, long
        (3, "alpha " + f),                # one term once, short
        (4, "bravo echo " + f),           # both terms of q1
        (5, "charlie foxtrot " + f),      # both terms of q2
        (6, "delta golf " + f),           # both terms of q3
        (7, "echo foxtrot golf hotel " + f),
        (8, "echo " + f),
        (9, "foxtrot golf hotel " + f),
        (10, "bravo charlie delta " + f),
        (11, f + " " + f),
        (12, f + " " + f),
        (13, f + " " + f),
        (14, f + " " + f),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_bm25_two_term_doc_beats_single_term_docs(spark):
    out = bm25_topk(_bm25_fixture(spark)).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["terms"], []).append(r)
    # find the query containing 'alpha' (terms are sorted, space-joined)
    alpha_q = next(v for t, v in by_q.items() if "alpha" in t.split())
    ranked = sorted(alpha_q, key=lambda r: r["rank"])
    # doc 1 holds BOTH query terms once each -> must out-rank every
    # single-term doc, including doc 2's six repetitions (tf saturates
    # at k1+1 while a second matched term adds a full idf block)
    assert ranked[0]["doc_id"] == 1, [(r["doc_id"], r["score"]) for r in ranked]
    assert ranked[0]["n_terms_hit"] == 2


def test_bm25_tf_and_length_normalization(spark):
    out = bm25_topk(_bm25_fixture(spark)).collect()
    scores = {
        (r["terms"], r["doc_id"]): r["score"]
        for r in out
    }
    alpha_terms = next(t for (t, _d) in scores if "alpha" in t.split())
    s2 = scores[(alpha_terms, 2)]  # 6x alpha, long doc
    s3 = scores[(alpha_terms, 3)]  # 1x alpha, short doc
    # higher tf helps...
    assert s2 > 0 and s3 > 0
    # ...but saturation + length normalization keeps the 6x long doc
    # below (k1+1)x the 1x short doc's contribution
    assert s2 < 3.0 * s3, (s2, s3)


def test_bm25_rank_is_dense_per_query(spark):
    out = bm25_topk(_bm25_fixture(spark)).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)


def test_lm_score_flags_gibberish(spark):
    # natural: repeated common trigram patterns; gibberish: each
    # trigram near-unique -> every step falls to the smoothing floor
    natural = "the cat sat on the mat and the rat sat on the hat " * 3
    gibberish = "qzx jvk wpf bqm zxt vkj pfw qmb xtz kjv fwp mbq"
    docs = spark.createDataFrame(
        [(1, natural), (2, gibberish)] + [
            (i, "the dog sat on the log and the frog sat on it")
            for i in range(3, 13)
        ],
        SCHEMA,
    )
    rows = {r["doc_id"]: r for r in lm_score(docs).collect()}
    assert rows[2]["avg_nll"] > rows[1]["avg_nll"] + 0.5, (
        rows[1]["avg_nll"], rows[2]["avg_nll"])


def test_lm_score_excludes_sub_trigram_docs(spark):
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "abcabc"), (3, "xy")], SCHEMA)
    rows = lm_score(docs).collect()
    assert {r["doc_id"] for r in rows} == {2}


def test_lm_score_integer_totals_consistent(spark):
    docs = spark.createDataFrame(
        [(i, f"spark structured streaming engine {i}") for i in range(20)],
        SCHEMA,
    )
    for r in lm_score(docs).collect():
        # avg_nll must equal the integer pieces it is derived from
        expect = round(-r["sum_lp_micro"] / r["n_trigrams"] / 1e6, 6)
        assert abs(r["avg_nll"] - expect) < 1e-9
        assert r["sum_lp_micro"] < 0 and r["n_trigrams"] > 0


def test_bm25_posting_join_is_broadcast(spark, sf_dir):
    """Plan shape: the occurrence->query-term join must be a broadcast
    hash join (the posting-list prune), never a shuffle of the full
    token explode against an 8-row table."""
    from saurav_nayak_recipe_etl_project_spark.operators.retrieval import (
        bm25_search,
    )

    plan = bm25_search(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
