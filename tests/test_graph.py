"""Fixed-point PageRank: hand-checkable semantics on a tiny graph,
mass accounting, and oracle agreement."""

from __future__ import annotations

from saurav_nayak_recipe_etl_project_spark.operators import graph as G


def _pr(spark, edge_list):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    return {r["node"]: r["pr_micro"]
            for r in G.pagerank_fixed_point(edges).collect()}


def test_hub_outranks_leaves(spark):
    # star graph: every leaf links to the hub and back
    edges = []
    for leaf in (2, 3, 4, 5):
        edges += [(leaf, 1), (1, leaf)]
    pr = _pr(spark, edges)
    assert pr[1] > pr[2]
    assert pr[2] == pr[3] == pr[4] == pr[5]  # symmetric leaves tie exactly


def test_symmetric_pair_ties_and_mass_bounded(spark):
    pr = _pr(spark, [(1, 2), (2, 1)])
    assert pr[1] == pr[2]
    # floor divisions only LEAK mass: total never exceeds SCALE, and
    # the leak stays tiny (< 1e-6 of total mass for a small graph)
    total = sum(pr.values())
    assert total <= G.PR_SCALE
    assert total >= G.PR_SCALE - 10_000


def test_deterministic_across_partitionings(spark):
    edges = [(i, (i * 7) % 23) for i in range(100) if i != (i * 7) % 23]
    e1 = spark.createDataFrame(edges, "src long, dst long")
    e2 = e1.repartition(13)
    r1 = {r["node"]: r["pr_micro"]
          for r in G.pagerank_fixed_point(e1).collect()}
    r2 = {r["node"]: r["pr_micro"]
          for r in G.pagerank_fixed_point(e2).collect()}
    assert r1 == r2  # integer arithmetic: bit-equal under any partitioning


def test_pagerank_oracle_match(spark, sf_dir):
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(
        G.GRAPH_QUERIES["part_pagerank"](spark, sf_dir),
        G.GRAPH_ORACLES["part_pagerank"],
        sf_dir,
    )


def test_vocab_coverage_monotone_and_oracle(spark, sf_dir):
    from tests.oracle import assert_matches_oracle

    from saurav_nayak_recipe_etl_project_spark.operators.text import (
        TEXT_ORACLES,
        vocab_coverage,
    )

    rows = sorted(vocab_coverage(spark, sf_dir).collect(), key=lambda r: r["k"])
    cov = [r["coverage"] for r in rows]
    assert cov == sorted(cov)          # coverage is monotone in K
    assert 0.0 < cov[0] < 1.0          # smallest K is a real partial cut
    assert cov[-1] == 1.0              # K >= vocab covers everything
    assert all(r["covered_tokens"] <= r["total_tokens"] for r in rows)
    assert_matches_oracle(
        vocab_coverage(spark, sf_dir), TEXT_ORACLES["vocab_coverage"], sf_dir
    )


def test_pagerank_plan_shape(spark, sf_dir):
    """Every iteration must join the node-sized pr/deg tables by
    BROADCAST (never shuffling the edge fact onto src) and nothing
    may fall out of codegen into Python row processing."""
    import contextlib
    import io

    df = G.GRAPH_QUERIES["part_pagerank"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_triangle_stats_on_known_graph(spark):
    """K4 minus one edge: nodes {1,2,3,4}, edges 12,13,14,23,24 ->
    exactly 2 triangles (123, 124), 8 wedges, transitivity 0.75."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "pa long, pb long"
    )
    row = G.triangle_stats(edges).collect()[0]
    assert row["n_nodes"] == 4 and row["n_edges"] == 5
    assert row["n_triangles"] == 2
    # degrees: 1->3, 2->3, 3->2, 4->2 -> wedges 3+3+1+1 = 8
    assert row["n_wedges"] == 8
    assert abs(row["transitivity"] - 0.75) < 1e-12


def test_support_edges_prune_below_threshold(spark):
    """Parts co-occurring in one order only are not edges at support 2."""
    li = spark.createDataFrame(
        # orders 1,2 both hold parts (10, 11); order 3 holds (10, 12)
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (3, 12)],
        "l_orderkey long, l_partkey long",
    )
    got = {(r["pa"], r["pb"]) for r in G.support_edges(li).collect()}
    assert got == {(10, 11)}
