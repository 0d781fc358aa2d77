"""Semantics tests for segment-level dedup and n-gram decontamination.

The oracle battery hash-verifies both against DuckDB; these pin the
keep-first / reassembly / overlap-count semantics on planted fixtures.
"""

from __future__ import annotations

from saurav_nayak_recipe_etl_project_spark.operators.linedup import (
    ngram_decontaminate,
    segment_dedup,
    segment_rows,
)

SCHEMA = "doc_id long, text string"


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_segment_rows_chunks_and_tail(spark):
    # 23 words -> segments of 10, 10, 3; order inside each preserved
    df = _mk(spark, [(1, _words("w", 23))])
    segs = {r["seg_idx"]: r["segment"] for r in segment_rows(df).collect()}
    assert len(segs) == 3
    assert segs[0] == " ".join(f"w{i}" for i in range(10))
    assert segs[1] == " ".join(f"w{i}" for i in range(10, 20))
    assert segs[2] == "w20 w21 w22"


def test_segment_dedup_removes_cross_doc_boilerplate(spark):
    boiler = _words("b", 10)
    uniq1 = _words("x", 10)
    uniq2 = _words("y", 10)
    df = _mk(spark, [
        (1, boiler + " " + uniq1),   # doc 1 keeps both (first owner)
        (2, boiler + " " + uniq2),   # doc 2 loses the boilerplate
        (3, boiler),                 # doc 3 loses everything
    ])
    out = {r["doc_id"]: r for r in segment_dedup(df).collect()}
    assert out[1]["n_kept"] == 2 and out[1]["kept_text"] == boiler + " " + uniq1
    assert out[2]["n_kept"] == 1 and out[2]["kept_text"] == uniq2
    # fully-boilerplate doc still present, empty
    assert out[3]["n_segments"] == 1 and out[3]["n_kept"] == 0
    assert out[3]["kept_text"] == ""


def test_segment_dedup_keeper_is_smallest_doc_then_seg(spark):
    seg = _words("s", 10)
    df = _mk(spark, [
        (5, _words("a", 10) + " " + seg),  # seg at seg_idx 1 of doc 5
        (9, seg),                          # seg at seg_idx 0 of doc 9
    ])
    out = {r["doc_id"]: r for r in segment_dedup(df).collect()}
    # doc_id orders before seg_idx: doc 5 owns it even though doc 9
    # holds it at an earlier in-doc position
    assert out[5]["n_kept"] == 2
    assert out[9]["n_kept"] == 0


def test_decontaminate_counts_distinct_shared_grams(spark):
    # benchmark doc holds words q0..q9; train doc 1 embeds q0..q4
    # (exactly one 5-gram of overlap after distinct), train doc 2 is
    # clean, train doc 3 embeds q0..q5 (two distinct shared 5-grams)
    bench = _mk(spark, [(100, _words("q", 10))])
    train = _mk(spark, [
        (1, _words("t", 6) + " " + " ".join(f"q{i}" for i in range(5))),
        (2, _words("u", 12)),
        (3, " ".join(f"q{i}" for i in range(6)) + " " + _words("v", 5)),
    ])
    out = {r["doc_id"]: r for r in ngram_decontaminate(train, bench).collect()}
    assert set(out) == {1, 3}
    assert out[1]["n_shared"] == 1
    assert out[3]["n_shared"] == 2
    # share is n_shared / distinct grams of the train doc
    assert out[1]["n_grams"] == 7  # 11 words -> 7 positions, all distinct
    assert abs(out[1]["share"] - round(1 / 7, 6)) < 1e-9


def test_decontaminate_ignores_within_train_duplication(spark):
    # two identical train docs share grams with each other but not with
    # the benchmark -> neither is flagged
    bench = _mk(spark, [(100, _words("z", 10))])
    dup = _words("d", 10)
    train = _mk(spark, [(1, dup), (2, dup)])
    assert ngram_decontaminate(train, bench).count() == 0


def test_containment_catches_quote_jaccard_misses(spark):
    """A 12-word doc fully quoted inside a 120-word doc: containment
    1.0 (flagged) while Jaccard ~0.09 (invisible at any sane tau)."""
    from saurav_nayak_recipe_etl_project_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from saurav_nayak_recipe_etl_project_spark.operators.linedup import (
        containment_pairs,
    )

    short = _words("q", 12)
    long_doc = _words("pre", 60) + " " + short + " " + _words("post", 48)
    docs = _mk(spark, [(1, short), (2, long_doc)])
    cont = containment_pairs(docs, tau=0.8).collect()
    got = {(r["contained_id"], r["container_id"]): r["containment"]
           for r in cont}
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (2, 1) not in got  # the long doc is NOT contained in the short
    jac = ngram_jaccard_pairs(docs, tau=0.5).collect()
    assert not jac, "jaccard must miss the quote at tau=0.5"


def test_mutual_containment_emits_both_directions(spark):
    t = _words("z", 20)
    docs = _mk(spark, [(1, t), (2, t)])
    got = {(r["contained_id"], r["container_id"])
           for r in containment_pairs_import(spark, docs)}
    assert got == {(1, 2), (2, 1)}


def containment_pairs_import(spark, docs):
    from saurav_nayak_recipe_etl_project_spark.operators.linedup import (
        containment_pairs,
    )

    return containment_pairs(docs, tau=0.8).collect()
