"""ANN behavior: brute-force is exact; LSH-bucketed results are a
subset of the corpus with correct per-bucket ranking and decent recall
of the true top-1 when vectors are clustered."""

from __future__ import annotations

import math

from saurav_nayak_recipe_etl_project_spark.operators import similarity as S


def _emb(spark):
    # Two tight clusters around e1 and e2 + the query vectors 0,1.
    rows = []
    for i in range(12):
        if i % 2 == 0:
            rows.append((i, [1.0, 0.01 * i, 0.0, 0.0]))
        else:
            rows.append((i, [0.0, 0.01 * i, 1.0, 0.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_exact(spark):
    out = S.cosine_topk(_emb(spark), n_queries=2, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3]
        # neighbors of an even query are even (same cluster), odd are odd
        for r in rows:
            assert r["neighbor_id"] % 2 == q % 2
            assert r["cos_sim"] > 0.99


def test_ivf_recall_on_clustered_vectors(spark):
    exact = {}
    for r in S.cosine_topk(_emb(spark), n_queries=2, k=3).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in S.ivf_topk(_emb(spark), n_queries=2, k=3, n_lists=4,
                        scan_frac=0.5).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # a half-corpus probe budget on a 2-cluster corpus must recover
    # most of the exact top-k
    for q, want in exact.items():
        got = approx.get(q, set())
        assert len(got & want) >= 2, (q, got, want)


def test_ivf_longer_training_improves_or_matches(spark):
    exact = {}
    for r in S.cosine_topk(_emb(spark), n_queries=2, k=3).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    refined = {}
    for r in S.ivf_topk(_emb(spark), n_queries=2, k=3, n_lists=4,
                        scan_frac=0.5, train_iters=14).collect():
        refined.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for q, want in exact.items():
        assert len(refined.get(q, set()) & want) >= 2


def test_lsh_bucket_results_are_ranked_subset(spark):
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.cosine_topk(_emb(spark), n_queries=2, k=3).collect()}
    approx = S.lsh_bucketed_topk(_emb(spark), n_queries=2, k=3).collect()
    for r in approx:
        assert r["rank"] >= 1
        assert not math.isnan(r["cos_sim"])
    # same-bucket neighbors of a clustered query come from its cluster
    hits = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert hits & exact, "LSH should recover at least part of the exact top-k"


def test_recall_at_k_values_and_determinism(spark, sf_dir):
    """recall@k rows: one per method, in [0,1], deterministic across
    runs (hash-derived planes/centroids, id tiebreaks)."""
    from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    r1 = {r["method"]: r["recall_at_k"]
          for r in S.recall_at_k(emb).collect()}
    r2 = {r["method"]: r["recall_at_k"]
          for r in S.recall_at_k(emb).collect()}
    assert set(r1) == {"lsh_bucketed", "ivf", "pq", "ivfpq"}
    assert r1 == r2
    for v in r1.values():
        assert 0.0 <= v <= 1.0
    # assert against RECALL_FLOORS itself (the driver's bounds oracle):
    # a drop below these is a real regression, not tuning noise — and
    # the floors hold at EVERY sf this suite may be pointed at, so no
    # method gets a fixture-only margin baked into the test (pq at
    # sf0.1 measures 0.70; a hard-coded 0.8 would fail on tuning noise)
    for method, floor in S.RECALL_FLOORS.items():
        assert r1[method] >= floor, (method, r1[method], floor)
