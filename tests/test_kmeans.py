"""Integer k-means: oracle equality, partition laws (sizes sum to the
corpus, every cluster non-degenerate), inertia monotonicity across an
extra Lloyd step, and cross-run determinism."""

from __future__ import annotations

from tests.oracle import assert_matches_oracle

from saurav_nayak_recipe_etl_project_spark.operators.kmeans import (
    KMEANS_K,
    kmeans_integer,
)
from saurav_nayak_recipe_etl_project_spark.registry import ORACLES, QUERIES
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table


def test_kmeans_matches_oracle_and_partitions(spark, sf_dir):
    assert_matches_oracle(QUERIES["embedding_kmeans"](spark, sf_dir),
                          ORACLES["embedding_kmeans"], sf_dir)
    rows = QUERIES["embedding_kmeans"](spark, sf_dir).collect()
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == KMEANS_K
    assert sum(r["n_vectors"] for r in rows) == n_vec
    for r in rows:
        assert r["n_vectors"] > 0
        assert int(r["inertia"]) > 0
        assert int(r["centroid_norm2"]) > 0


def test_kmeans_inertia_never_increases_with_iterations(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)

    def total_inertia(iters):
        rows = kmeans_integer(emb, iters=iters).collect()
        return sum(int(r["inertia"]) for r in rows)

    i1, i2, i3 = (total_inertia(k) for k in (1, 2, 3))
    # Lloyd's monotone-descent property survives integer flooring on
    # this corpus (each assign/update pair can only reduce the
    # objective, up to the 1-unit floor slack per coordinate)
    assert i2 <= i1
    assert i3 <= i2


def test_kmeans_is_deterministic(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    a = sorted(map(str, kmeans_integer(emb).collect()))
    b = sorted(map(str, kmeans_integer(emb).collect()))
    assert a == b
