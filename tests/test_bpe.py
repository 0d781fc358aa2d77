"""BPE merge training: hand-computable fixtures (including the greedy
overlap case), determinism on the corpus, and encode consistency."""

from __future__ import annotations

from saurav_nayak_recipe_etl_project_spark.operators import bpe as B


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_learns_expected_merges(spark):
    # "abab" x3, "ab" x2: pair counts round 1: (a,b)=8, (b,a)=3
    # round 2 (symbols: [ab,ab]x3, [ab]x2): (ab,ab)=3
    docs = _docs(spark, ["abab abab abab ab", "ab"])
    merges = B.bpe_train(docs, n_merges=2)
    assert merges[0] == ("a", "b", 8)
    assert merges[1] == ("ab", "ab", 3)


def test_bpe_greedy_overlap(spark):
    # "aaa": pairs (a,a)=2 per word; after merging (a,a) greedy
    # left-to-right, "aaa" -> [aa, a] (NOT [a, aa]); next round the top
    # pair is (aa, a)
    docs = _docs(spark, ["aaa aaa"])
    merges = B.bpe_train(docs, n_merges=2)
    assert merges[0] == ("a", "a", 4)   # 2 per word x 2 words... greedy counts overlap pairs
    assert merges[1] == ("aa", "a", 2)


def test_bpe_tiebreak_deterministic(spark):
    # (a,b) and (c,d) both appear once -> lexicographic tiebreak picks (a,b)
    docs = _docs(spark, ["ab cd"])
    merges = B.bpe_train(docs, n_merges=1)
    assert merges[0] == ("a", "b", 1)


def test_bpe_corpus_deterministic_and_compressive(spark, sf_dir):
    from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    m1 = B.bpe_train(docs, n_merges=5)
    m2 = B.bpe_train(docs, n_merges=5)
    assert m1 == m2 and len(m1) == 5
    # counts are non-increasing across merge rounds
    counts = [n for _, _, n in m1]
    assert counts == sorted(counts, reverse=True)

    seg = {r["doc_id"]: r for r in B.bpe_segment(docs.limit(50), m1).collect()}
    assert len(seg) == 50
    for r in seg.values():
        # merges only ever shrink the symbol count, and can never go
        # below one symbol per word
        assert r["n_words"] <= r["n_bpe_symbols"]
