"""Integer k-means: oracle equality, partition laws (sizes sum to the
corpus, every cluster non-degenerate), inertia monotonicity across an
extra Lloyd step, cross-run determinism, and the r9 de-weak pins:
Arrow-lane/explode-lane row parity and the no-explode plan shape of
the default lane."""

from __future__ import annotations

import contextlib
import io

from tests.oracle import assert_matches_oracle

from saurav_nayak_recipe_etl_project_spark.operators.kmeans import (
    KMEANS_K,
    kmeans_arrow,
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


def test_kmeans_arrow_lane_parity_with_explode_lane(spark, sf_dir):
    """The r9 de-weak contract: the Arrow matmul lane must be
    ROW-IDENTICAL to the integer explode lane (the oracle twin) —
    same clusters, sizes, exact inertias, exact centroid norms —
    including at a k/iters combination off the registered defaults."""
    emb = load_table(spark, "embeddings", sf_dir)
    for k, iters in [(KMEANS_K, 2), (3, 1)]:
        a = sorted(map(str, kmeans_arrow(emb, k=k, iters=iters).collect()))
        e = sorted(map(str, kmeans_integer(emb, k=k, iters=iters).collect()))
        assert a == e, (k, iters)


def test_kmeans_default_lane_has_no_explode_join(spark, sf_dir):
    """Plan pin for the de-weak: the registered entry's plan must be
    the matmul shape — no (vector, dim) posexplode anywhere (the
    n·K·d fan-out lives only in the oracle twin) and the Arrow pass
    present. The small K-row norms join may broadcast; nothing else
    is join-shaped."""
    df = QUERIES["embedding_kmeans"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "posexplode" not in p.lower(), p[:1200]
    assert "MapInPandas" in p, p[:1200]
    assert "CartesianProduct" not in p
