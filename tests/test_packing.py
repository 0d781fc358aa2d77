"""Sequence packing + temperature source mixing: semantics pinned
against hand-computable fixtures, oracle agreement at sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.operators import packing as P


def test_pack_sequences_concat_then_chunk_semantics(spark, sf_dir):
    out = P.pack_sequences(spark, sf_dir).collect()
    assert len(out) > 0
    by_key = {}
    for r in out:
        by_key.setdefault((r["lang"], r["shard"]), []).append(r)
    for rows in by_key.values():
        rows.sort(key=lambda r: r["doc_id"])
        running = 0
        for r in rows:
            # each doc starts at the running token offset of its shard
            assert r["seq_id"] == running // P.SEQ_BUDGET
            assert r["seq_offset"] == running % P.SEQ_BUDGET
            running += r["n_tokens"]
        # seq ids are monotone within a shard
        seqs = [r["seq_id"] for r in rows]
        assert seqs == sorted(seqs)


def test_pack_sequences_shard_bounds_window(spark, sf_dir):
    out = P.pack_sequences(spark, sf_dir)
    per_shard = out.groupBy("lang", "shard").count().collect()
    assert all(r["count"] <= P.SHARD_SIZE for r in per_shard)


def test_rebalance_quotas_follow_sqrt_weights(spark, sf_dir):
    out = P.rebalance_sources(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == sum(
        r["quota"] for r in out.groupBy("source").agg(
            F.first("quota").alias("quota")
        ).collect()
    )
    # every kept doc respects its source quota and rank
    assert all(r["rn"] <= r["quota"] for r in rows)
    # uniform corpus (equal source counts) → near-equal quotas
    quotas = {r["source"]: r["quota"]
              for r in out.select("source", "quota").distinct().collect()}
    assert max(quotas.values()) - min(quotas.values()) <= 1


def test_rebalance_flattens_skewed_sources(spark):
    # 2 sources, 90/10 split, budget 20: sqrt weighting gives the tail
    # source MORE than its proportional share (proportional would be 2)
    rows = [(i, "en", "big" if i < 90 else "small",
             f"doc {i} text with content") for i in range(100)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    import saurav_nayak_recipe_etl_project_spark.operators.packing as P2
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    weights = counts.select(
        "source", "n_docs",
        F.round(F.sqrt(F.col("n_docs")) * P2.WEIGHT_SCALE).cast("long").alias("w"),
    )
    total = weights.agg(F.sum("w").alias("sum_w"))
    quotas = {
        r["source"]: r["quota"]
        for r in weights.crossJoin(total).select(
            "source",
            F.least(
                F.col("n_docs"),
                F.greatest(F.lit(1).cast("long"),
                           F.expr("(w * 20) div sum_w")),
            ).alias("quota"),
        ).collect()
    }
    assert quotas["small"] > 2            # above proportional share
    assert quotas["big"] < 18             # head source capped below its share
    assert quotas["small"] <= 10          # never above its own count


def test_pack_sequences_shard_bound_under_extreme_lang_skew(spark):
    """Adversarial skew: one lang holds 99% of the corpus. The window
    partition key includes shard = doc_id div SHARD_SIZE, so no window
    task may ever see more than SHARD_SIZE docs — the property that
    keeps the prefix-sum parallel at 100 TB even on a one-language
    corpus."""
    n = 1000
    rows = [(i, "en" if i < 990 else "fr", "web",
             f"tok{i} " * (1 + i % 7)) for i in range(n)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    out = P.pack_sequences_df(docs)
    per_part = out.groupBy("lang", "shard").count().collect()
    assert max(r["count"] for r in per_part) <= P.SHARD_SIZE
    # the dominant lang still spreads over many shards (parallelism)
    en_shards = {r["shard"] for r in per_part if r["lang"] == "en"}
    assert len(en_shards) >= n * 0.99 // P.SHARD_SIZE
    # and chunk accounting stays exact inside every skewed partition
    by_key = {}
    for r in out.collect():
        by_key.setdefault((r["lang"], r["shard"]), []).append(r)
    for key_rows in by_key.values():
        key_rows.sort(key=lambda r: r["doc_id"])
        running = 0
        for r in key_rows:
            assert r["seq_id"] == running // P.SEQ_BUDGET
            assert r["seq_offset"] == running % P.SEQ_BUDGET
            running += r["n_tokens"]


def test_rebalance_single_doc_tail_source_never_dropped(spark):
    """Adversarial skew: a 10_000-doc head source next to a ONE-doc
    tail source. The greatest(1, ·) quota floor must keep the tail
    doc (its proportional quota rounds to 0), and the head source
    must absorb the cap."""
    rows = [(i, "en", "head", f"doc {i} words here") for i in range(10_000)]
    rows.append((10_000, "en", "tail", "the only tail doc"))
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    out = P.rebalance_sources_df(docs, budget=50).collect()
    by_source = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    # floor: the single tail doc survives with quota >= 1
    assert len(by_source.get("tail", [])) == 1
    assert by_source["tail"][0]["quota"] >= 1
    assert by_source["tail"][0]["doc_id"] == 10_000
    # head capped at its quota, near (but never above) the budget
    assert len(by_source["head"]) == by_source["head"][0]["quota"]
    assert len(out) <= 50 + 1  # budget + at most the floored tail doc


def test_packing_oracles_match(spark, sf_dir):
    from tests.oracle import assert_matches_oracle

    for name in ("pack_sequences", "rebalance_sources"):
        assert_matches_oracle(
            P.PACKING_QUERIES[name](spark, sf_dir),
            P.PACKING_ORACLES[name],
            sf_dir,
        )


def test_grouping_sets_subtotals_consistent(spark, sf_dir):
    from saurav_nayak_recipe_etl_project_spark.plans.advanced import (
        orders_grouping_sets,
    )

    rows = orders_grouping_sets(spark, sf_dir).collect()
    detail = [r for r in rows if r["g_priority"] == 0 and r["g_status"] == 0]
    by_status = [r for r in rows if r["g_priority"] == 1 and r["g_status"] == 0]
    grand = [r for r in rows if r["g_priority"] == 1 and r["g_status"] == 1]
    assert len(grand) == 1
    assert sum(r["n_orders"] for r in detail) == grand[0]["n_orders"]
    # per-status subtotals must equal the sum of their detail rows
    from collections import defaultdict
    agg = defaultdict(int)
    for r in detail:
        agg[r["o_orderstatus"]] += r["n_orders"]
    assert {r["o_orderstatus"]: r["n_orders"] for r in by_status} == dict(agg)
    # rollup would not contain the (status)-only grouping: every
    # by-status row has the priority key nulled
    assert all(r["o_orderpriority"] is None for r in by_status)


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_new_op_plan_shapes(spark, sf_dir):
    """Plan regressions guard: packing is one bounded-window shuffle,
    grouping sets expand map-side around one shuffle, and nothing
    drops to Python row processing."""
    import re

    from saurav_nayak_recipe_etl_project_spark.plans.advanced import (
        orders_grouping_sets,
    )

    pack = _plan(P.pack_sequences(spark, sf_dir))
    assert len(re.findall(r"^\(\d+\) Exchange", pack, re.M)) == 1
    assert "BatchEvalPython" not in pack

    gs = _plan(orders_grouping_sets(spark, sf_dir))
    assert "Expand" in gs  # grouping-set expansion is map-side
    assert len(re.findall(r"^\(\d+\) Exchange", gs, re.M)) == 1

    mix = _plan(P.rebalance_sources(spark, sf_dir))
    # the quota table must reach the full-data rank via broadcast,
    # never a shuffled sort-merge join
    assert "BroadcastHashJoin" in mix or "BroadcastNestedLoopJoin" in mix
    assert "SortMergeJoin" not in mix
    assert "BatchEvalPython" not in mix


def test_new_ops_handle_empty_corpus(spark, tmp_path):
    """Empty documents table in → empty result out (no crash, no
    null-quota rows), through the real operator entry points."""
    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars int"
    )
    empty.write.parquet(str(tmp_path / "documents.parquet"))
    assert P.pack_sequences(spark, str(tmp_path)).count() == 0
    assert P.rebalance_sources(spark, str(tmp_path)).count() == 0


def test_length_bucketing_edges_and_waste(spark):
    from saurav_nayak_recipe_etl_project_spark.operators.packing import (
        length_bucketing_df,
    )

    rows = [
        (1, " ".join(["w"] * 16), "en"),   # exactly 16 -> bucket 16, 0 waste
        (2, " ".join(["w"] * 17), "en"),   # 17 -> bucket 32
        (3, " ".join(["w"] * 2000), "en"), # beyond top bucket -> capped 1024
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["bucket"]: r for r in length_bucketing_df(df).collect()}
    assert set(out) == {16, 32, 1024}
    assert out[16]["waste_ppm"] == 0
    assert out[32]["waste_ppm"] == (32 - 17) * 1_000_000 // 32
    # overlong doc: padded_tokens floor at the cap, waste 0 (truncation
    # accounting is the packer's job, not the bucketer's)
    assert out[1024]["sum_tokens"] == 2000


def test_corpus_shuffle_is_seeded_permutation(spark, sf_dir):
    from saurav_nayak_recipe_etl_project_spark.operators.packing import (
        corpus_shuffle_df,
    )
    from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    n = docs.count()
    a = {r["doc_id"]: (r["rank"], r["shard"], r["pos_in_shard"])
         for r in corpus_shuffle_df(docs, seed="s1").collect()}
    # a permutation: ranks are exactly 1..n
    assert sorted(r for r, _, _ in a.values()) == list(range(1, n + 1))
    # shard/pos decompose the rank
    for rank, shard, pos in a.values():
        assert shard * 100 + pos == rank - 1
    # same seed deals identically; different seed re-deals nearly all
    a2 = {r["doc_id"]: (r["rank"], r["shard"], r["pos_in_shard"])
          for r in corpus_shuffle_df(docs, seed="s1").collect()}
    assert a == a2
    b = {r["doc_id"]: r["rank"]
         for r in corpus_shuffle_df(docs, seed="s2").collect()}
    moved = sum(1 for k in a if a[k][0] != b[k])
    assert moved > 0.9 * n
