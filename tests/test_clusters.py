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
