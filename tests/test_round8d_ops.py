"""Semantic pins for the fourth round-8 continuation batch: hybrid
RRF retrieval (fusion algebra, rank sanity), distinctive-terms
log-odds (sign/support semantics), and the entity-resolution pipeline
(survivorship rules, membership closure)."""

from __future__ import annotations

from tests.oracle import assert_matches_oracle

from saurav_nayak_recipe_etl_project_spark.registry import ORACLES, QUERIES


def test_new_entries_match_oracles(spark, sf_dir):
    for name in [
        "rrf_hybrid_search",
        "distinctive_terms_logodds",
        "part_name_entity_resolution",
    ]:
        assert_matches_oracle(QUERIES[name](spark, sf_dir),
                              ORACLES[name], sf_dir)


def test_rrf_fusion_algebra(spark, sf_dir):
    rows = QUERIES["rrf_hybrid_search"](spark, sf_dir).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
        # the fused score is exactly the two reciprocal ranks
        assert r["rrf_ppm"] == (1_000_000 // (60 + r["r_bm25"])
                                + 1_000_000 // (60 + r["r_ql"]))
    for q, lst in by_q.items():
        assert len(lst) <= 10
        ranks = sorted(r["rank"] for r in lst)
        assert ranks == list(range(1, len(lst) + 1))
        # a doc ranked 1 by BOTH systems must be the fused top-1
        both_first = [r for r in lst if r["r_bm25"] == 1 and r["r_ql"] == 1]
        for r in both_first:
            assert r["rank"] == 1


def test_distinctive_terms_are_source_skewed(spark, sf_dir):
    rows = QUERIES["distinctive_terms_logodds"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_in_source"] >= 5  # support floor
        assert 1 <= r["rank"] <= 5
        # a top distinctive term must be RELATIVELY enriched in its
        # source (positive log-odds delta)
        assert r["delta_micro"] > 0


def test_entity_resolution_survivorship(spark, sf_dir):
    rows = QUERIES["part_name_entity_resolution"](spark, sf_dir).collect()
    assert rows
    by_canon: dict = {}
    for r in rows:
        by_canon.setdefault(r["canonical_name"], []).append(r)
    for canon, members in by_canon.items():
        # exactly one canonical row per cluster, and it names itself
        canons = [m for m in members if m["is_canonical"]]
        assert len(canons) == 1
        assert canons[0]["member_name"] == canon
        # cluster_size matches the roster, every cluster is a merge
        assert len(members) == members[0]["cluster_size"] >= 2
        # survivorship: canonical has max n_rows (ties broken by name)
        best = max(members,
                   key=lambda m: (m["n_rows"], ), default=None)
        assert canons[0]["n_rows"] >= best["n_rows"]
