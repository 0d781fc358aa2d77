"""Empty- and degenerate-input robustness: operators must return
empty/sane results, not crash, when a partition or the whole input is
empty — the normal state of life at 100 TB (empty partitions are
everywhere)."""

from __future__ import annotations

from saurav_nayak_recipe_etl_project_spark.operators import dedup as D
from saurav_nayak_recipe_etl_project_spark.operators import multimodal as M
from saurav_nayak_recipe_etl_project_spark.operators.similarity import cosine_topk
from saurav_nayak_recipe_etl_project_spark.streaming.sessions import sessionize_batch


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_dedup_ops_on_empty_corpus(spark):
    docs = _empty_docs(spark)
    assert D.exact_duplicates(docs).count() == 0
    assert D.ngram_jaccard_pairs(docs).count() == 0
    assert D.minhash_lsh_pairs(docs).count() == 0
    assert D.simhash(docs).count() == 0


def test_short_and_empty_texts(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words"), (4, "now three words")],
        "doc_id long, text string",
    )
    # shingling needs >= 3 tokens; shorter docs produce no shingles but
    # must not error
    assert D.ngram_jaccard_pairs(docs).count() == 0
    hashes = D.simhash(docs).count()
    assert hashes >= 3  # every doc with >=1 token gets a hash


def test_multimodal_empty_blob(spark):
    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    rows = M.blob_features(M.attach_blobs(docs)).collect()
    assert rows[0]["n_bytes"] == 0 and rows[0]["mean_byte"] == 0.0
    assert M.frame_sample(M.attach_blobs(docs)).count() == 0


def test_topk_with_k_larger_than_corpus(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = cosine_topk(emb, n_queries=1, k=10).collect()
    assert len(out) == 2  # corpus minus self, no padding rows


def test_sessionize_single_event_user(spark):
    import datetime as dt

    events = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 7)],
        "event_id long, ts timestamp_ntz, user_id long",
    )
    rows = sessionize_batch(events).collect()
    assert len(rows) == 1
    assert rows[0]["n_events"] == 1 and rows[0]["duration_s"] == 0
