"""Cluster resolution: transitive near-dups (A~B, B~C) must collapse
into one cluster labeled by the minimum doc_id."""

from __future__ import annotations

from saurav_nayak_recipe_etl_project_spark.operators.dedup import dup_clusters

BASE = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")


def test_transitive_clusters_collapse(spark):
    # 1~2 (one change), 2~3 (one more change), but 1 and 3 differ by 2
    # tokens — still one cluster via transitivity. 4 is unrelated.
    v1 = BASE
    v2 = BASE.replace("upsilon", "omega")
    v3 = v2.replace("alpha", "aleph")
    other = "totally different words about spark catalyst tungsten " * 3
    docs = spark.createDataFrame(
        [(1, v1), (2, v2), (3, v3), (4, other), (5, other + " extra")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["cluster_id"]
           for r in dup_clusters(docs, tau=0.5).collect()}
    assert out[1] == out[2] == out[3] == 1     # transitive collapse
    assert out[4] == out[5]                     # near-dup pair clusters
    assert out[4] != out[1]
    assert len(out) == 5


def test_star_contraction_matches_min_label_on_chain(spark):
    """A long chain (worst case for diameter-bound propagation) must
    produce ONE component under both algorithms."""
    from saurav_nayak_recipe_etl_project_spark.operators import dedup as D

    # docs 0..9 form a chain: doc i holds blocks i..i+9, so adjacent
    # docs share 9 of 10 blocks (Jaccard ~0.82 — solidly above the LSH
    # banding's reliable-recall zone) while docs 2 apart sit at ~0.67,
    # below tau — only the chain edges survive the exact verify.
    blk = 10
    blocks = [" ".join(f"w{i}_{j}" for j in range(blk)) for i in range(19)]
    rows = [(i, " ".join(blocks[i:i + 10])) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["cluster_id"]
         for r in D.dup_clusters(docs, tau=0.75).collect()}
    b = {r["doc_id"]: r["cluster_id"]
         for r in D.dup_clusters_star(docs, tau=0.75).collect()}
    assert a == b
    assert set(a.values()) == {0}, a


def test_star_contraction_matches_min_label_on_corpus(spark, sf_dir):
    from saurav_nayak_recipe_etl_project_spark.operators import dedup as D
    from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    a = {(r["doc_id"], r["cluster_id"])
         for r in D.dup_clusters(docs).collect()}
    b = {(r["doc_id"], r["cluster_id"])
         for r in D.dup_clusters_star(docs).collect()}
    assert a == b
