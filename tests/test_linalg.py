"""Distributed linear algebra: exact integer Gram matrix (oracle +
numpy ground truth + symmetry/diagonal structure) and the driver-side
PCA built on it (orthonormal projection, variance ordering,
reconstruction sanity)."""

from __future__ import annotations

import numpy as np

from tests.oracle import assert_matches_oracle

from saurav_nayak_recipe_etl_project_spark.operators.linalg import (
    MICRO,
    pca_project,
)
from saurav_nayak_recipe_etl_project_spark.registry import ORACLES, QUERIES
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table


def _numpy_vectors(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding").collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    return np.array([[float(x) for x in r["embedding"]] for r in rows])


def test_gram_matrix_matches_oracle_and_numpy(spark, sf_dir):
    assert_matches_oracle(
        QUERIES["embedding_gram_matrix"](spark, sf_dir),
        ORACLES["embedding_gram_matrix"], sf_dir,
    )
    cells = QUERIES["embedding_gram_matrix"](spark, sf_dir).collect()
    m = _numpy_vectors(spark, sf_dir)
    q = np.rint(m * MICRO).astype(np.int64)
    want = q.T @ q
    d = want.shape[0]
    assert len(cells) == d * (d + 1) // 2  # upper triangle, complete
    for r in cells:
        assert r["i"] <= r["j"]
        assert int(r["g"]) == int(want[r["i"], r["j"]])
        assert r["n_rows"] == len(m)
    # diagonal cells are sums of squares: strictly positive
    assert all(int(r["g"]) > 0 for r in cells if r["i"] == r["j"])
    # g's string form is canonical plain digits on BOTH engines (the
    # hash-portability contract of the r10 DECIMAL→STRING migration):
    # no exponent, no '.', no '+', optional leading '-'. DuckDB's side
    # is covered by assert_matches_oracle value equality above.
    import re

    assert all(re.fullmatch(r"-?[0-9]+", r["g"]) for r in cells)
    # off-diagonal negatives exist in this corpus, so the '-' branch
    # of the format is genuinely exercised
    assert any(r["g"].startswith("-") for r in cells)


def test_pca_projection_properties(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    k = 8
    proj, ratios = pca_project(emb, k=k)
    rows = {r["vec_id"]: np.array(r["pc"]) for r in proj.collect()}
    m = _numpy_vectors(spark, sf_dir)
    assert len(rows) == len(m)
    # explained-variance ratios: a distribution, descending
    assert abs(sum(ratios) - 1.0) < 1e-9
    assert all(a >= b - 1e-12 for a, b in zip(ratios, ratios[1:]))
    # projections live in k dims and preserve the second moment of
    # the top-k subspace: total projected energy equals the top-k
    # eigenvalue mass (trace identity), within float tolerance
    p = np.stack([rows[i] for i in sorted(rows)])
    assert p.shape[1] == k
    total_energy = (m * m).sum() / len(m)
    proj_energy = (p * p).sum() / len(m)
    topk_mass = sum(ratios[:k]) * total_energy
    assert abs(proj_energy - topk_mass) / total_energy < 1e-6
    # the projection is deterministic across runs
    proj2, ratios2 = pca_project(emb, k=k)
    rows2 = {r["vec_id"]: np.array(r["pc"]) for r in proj2.collect()}
    assert ratios == ratios2
    assert all(np.array_equal(rows[i], rows2[i]) for i in rows)


def test_linear_probe_beats_majority_and_is_deterministic(spark, sf_dir):
    from saurav_nayak_recipe_etl_project_spark.operators.linalg import (
        linear_probe_accuracy,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    rows = sorted(
        (r["label"], r["n"], r["n_correct"], r["accuracy"])
        for r in linear_probe_accuracy(emb).collect()
    )
    assert rows
    n_total = sum(r[1] for r in rows)
    n_correct = sum(r[2] for r in rows)
    majority = max(r[1] for r in rows) / n_total
    overall = n_correct / n_total
    # a linear probe on labeled synthetic embeddings must clear the
    # majority-class baseline by a wide margin
    assert overall > majority + 0.2, (overall, majority)
    for label, n, n_c, acc in rows:
        assert 0 <= n_c <= n
    rows2 = sorted(
        (r["label"], r["n"], r["n_correct"], r["accuracy"])
        for r in linear_probe_accuracy(emb).collect()
    )
    assert rows == rows2
