"""Semantic (SemDeDup-shape) dedup tests.

The real corpus's embeddings are isotropic, so the registry gate runs
the ensemble blocking (see operators/semdedup.py docstring). These
tests plant the TIGHT CLUSTER structure the semantic path is built
for and pin that it recovers it; the gate test pins the registered
entry's booleans and exact-pair count on the real sf0.001 corpus.
"""

from __future__ import annotations

import numpy as np

from saurav_nayak_recipe_etl_project_spark.operators.dedup import (
    embedding_dup_pairs,
)
from saurav_nayak_recipe_etl_project_spark.operators.semdedup import (
    dedup_semantic,
    ensemble_dup_pairs,
    semantic_dup_pairs,
)

SCHEMA = "vec_id long, embedding array<float>, label int"


def _planted(spark, n_groups=5, per_group=10, dim=32, noise=0.05):
    """Deterministic tight clusters: orthogonal-ish group centroids
    plus a small deterministic perturbation per member — the semantic
    near-dup structure CLIP-style embeddings exhibit."""
    rng = np.random.default_rng(7)
    cents = rng.normal(size=(n_groups, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    rows = []
    vid = 0
    for g in range(n_groups):
        for _ in range(per_group):
            v = cents[g] + noise * rng.normal(size=dim)
            rows.append((vid, [float(x) for x in v], g))
            vid += 1
    return spark.createDataFrame(rows, SCHEMA)


def test_semantic_path_recovers_planted_clusters(spark):
    emb = _planted(spark)
    exact = {(r.id_a, r.id_b)
             for r in embedding_dup_pairs(emb, tau=0.8).collect()}
    sem = {(r.id_a, r.id_b)
           for r in semantic_dup_pairs(
               emb, tau=0.8, n_clusters=8, n_train=50).collect()}
    assert len(exact) >= 150          # ~5 * C(10,2) within-group pairs
    # on clustered data the semantic blocker must be near-exhaustive
    recall = len(exact & sem) / len(exact)
    assert recall >= 0.95, recall
    # and never invent a pair (exact cosine inside each block)
    assert sem <= exact


def test_soft_assignment_catches_boundary_pairs(spark):
    # two groups whose centroids are CLOSE (boundary regime): top-1
    # assignment may split a tight pair across the two clusters;
    # top-2 must not lose recall relative to top-1
    rng = np.random.default_rng(11)
    c = rng.normal(size=32)
    c /= np.linalg.norm(c)
    c2 = c + 0.15 * rng.normal(size=32)
    c2 /= np.linalg.norm(c2)
    rows = []
    for vid in range(40):
        base = c if vid % 2 == 0 else c2
        v = base + 0.05 * rng.normal(size=32)
        rows.append((vid, [float(x) for x in v], vid % 2))
    emb = spark.createDataFrame(rows, SCHEMA)
    exact = {(r.id_a, r.id_b)
             for r in embedding_dup_pairs(emb, tau=0.8).collect()}
    rec = {}
    for a in (1, 2):
        sem = {(r.id_a, r.id_b)
               for r in semantic_dup_pairs(
                   emb, tau=0.8, n_clusters=4, n_assign=a,
                   n_train=40).collect()}
        rec[a] = len(exact & sem) / max(len(exact), 1)
    # the boundary regime is exactly where soft assignment pays:
    # measured 0.53 (top-1) -> 0.71 (top-2) on this fixture
    assert rec[2] >= rec[1] + 0.1, rec
    assert rec[2] >= 0.65, rec


def test_ensemble_beats_both_constituents_on_real_corpus(spark, sf_dir):
    from saurav_nayak_recipe_etl_project_spark.operators.dedup import (
        embedding_dup_pairs_bucketed,
    )
    from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    exact = {(r.id_a, r.id_b) for r in embedding_dup_pairs(emb).collect()}
    sem = {(r.id_a, r.id_b) for r in semantic_dup_pairs(emb).collect()}
    lsh = {(r.id_a, r.id_b)
           for r in embedding_dup_pairs_bucketed(emb).collect()}
    ens = {(r.id_a, r.id_b) for r in ensemble_dup_pairs(emb).collect()}
    n = len(exact)
    assert ens == sem | lsh
    r_ens = len(exact & ens) / n
    assert r_ens > len(exact & sem) / n
    assert r_ens > len(exact & lsh) / n
    # deterministic pipeline: the measured sf0.001 value, pinned
    assert abs(r_ens - 0.889) < 0.005, r_ens


def test_registry_gate_green(spark, sf_dir):
    row = dedup_semantic(spark, sf_dir).collect()[0]
    assert row["n_exact_pairs"] == 920      # sf0.001 exact tau=0.3 count
    assert row["recall_ok"] and row["precision_ok"]
