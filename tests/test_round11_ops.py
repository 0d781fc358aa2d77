"""Round-11 pins: the four r10 ADVICE fixes.

1. Divisor guards in token_fertility_by_lang / mixture_from_counts —
   a degenerate corpus (zero BPE pieces / zero tokens) now FAILS
   LOUDLY in Spark (raise_error) instead of silently emitting NULL
   where the DuckDB oracle raises.
2. dup_exposure_by_quality NULL-score banding — an empty-text doc
   (NULL F8 score) lands deliberately in band 0 (worst quality),
   not silently in top band 4 via LEAST()'s NULL-skipping; engine
   and oracle agree on the degenerate corpus.
3. simhash_banded_pairs(materialize=False) — fully lazy,
   non-checkpointed plan with identical pairs.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.oracle import assert_matches_oracle

from saurav_nayak_recipe_etl_project_spark.operators.text import (
    mixture_from_counts,
    token_fertility_by_lang,
)
from saurav_nayak_recipe_etl_project_spark.operators.corpus_audit import (
    dup_exposure_by_quality,
)
from saurav_nayak_recipe_etl_project_spark.operators.dedup import (
    simhash_banded_pairs,
)
from saurav_nayak_recipe_etl_project_spark.registry import ORACLES
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table


_GOOD = (
    "the quick brown fox jumps over the lazy dog and it is a fine "
    "day in the park where the children play and the birds sing in "
    "the trees of the old town square near the river bank today"
)


def _write_docs(spark, tmp_path, rows):
    """Write a degenerate documents.parquet into a tmp sf_dir."""
    d = str(tmp_path)
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lang, source=src,
             n_chars=len(t)) for i, (t, lang, src) in enumerate(rows)]
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_fertility_zero_bpe_lang_raises(spark, tmp_path):
    # lang 'xx' has ONLY empty text -> sum(bpe) = 0 for that group.
    sf = _write_docs(spark, tmp_path, [
        (_GOOD, "en", "src0"),
        ("", "xx", "src0"),
    ])
    with pytest.raises(Exception, match="zero BPE pieces"):
        token_fertility_by_lang(spark, sf).collect()


def test_fertility_normal_corpus_unchanged(spark, sf_dir):
    # the guard is a no-op on a non-degenerate corpus: the entry
    # still matches its registered oracle verbatim.
    assert_matches_oracle(
        token_fertility_by_lang(spark, sf_dir),
        ORACLES["token_fertility_by_lang"],
        sf_dir,
    )


def test_mixture_zero_token_source_raises(spark):
    stats = spark.createDataFrame(
        [Row(source="a", n_docs=3, tokens=100),
         Row(source="b", n_docs=2, tokens=0)]
    )
    with pytest.raises(Exception, match="source with zero tokens"):
        mixture_from_counts(stats).collect()


def test_mixture_zero_corpus_raises(spark):
    stats = spark.createDataFrame(
        [Row(source="a", n_docs=3, tokens=0),
         Row(source="b", n_docs=2, tokens=0)]
    )
    # ANSI sessions raise DIVIDE_BY_ZERO at the pow's double division
    # before the guard evaluates; non-ANSI sessions hit the guard's
    # raise_error. Either way the failure is LOUD, never a NULL row.
    with pytest.raises(
        Exception, match="corpus with zero tokens|DIVIDE_BY_ZERO"
    ):
        mixture_from_counts(stats).collect()


def test_dup_exposure_null_score_lands_in_band0(spark, tmp_path):
    # one empty-text doc (NULL F8 score) + two high-quality docs.
    # Before the fix LEAST() skipped the NULL and filed the empty doc
    # in TOP band 4; now it is coalesced into band 0.
    sf = _write_docs(spark, tmp_path, [
        (_GOOD, "en", "src0"),
        (_GOOD + " extra words beyond", "en", "src1"),
        ("", "en", "src2"),
    ])
    res = dup_exposure_by_quality(spark, sf).collect()
    out = {r["quality_band"]: r["n_docs"] for r in res}
    assert out.get(0) == 1, f"empty doc not in band 0: {out}"
    assert sum(out.values()) == 3
    # engine and oracle agree on the degenerate corpus too (only the
    # documents view exists in the tmp sf_dir, so register it by hand)
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf, 'documents.parquet', '*.parquet')}'"
    )
    oracle = sorted(
        con.execute(ORACLES["dup_exposure_by_quality"]).fetchall()
    )
    got = sorted(
        (r["quality_band"], r["n_docs"], r["n_dup_docs"],
         r["exposure_ppm"]) for r in res
    )
    assert got == [tuple(r) for r in oracle], (got, oracle)


def test_simhash_banded_pairs_lazy_matches_materialized(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    lazy = simhash_banded_pairs(docs, materialize=False)
    # lazy form: no localCheckpoint baked into the plan
    assert not lazy.rdd.isLocallyCheckpointed()
    eager = simhash_banded_pairs(docs)  # default materialize=True
    key = lambda r: (r["doc_a"], r["doc_b"], r["hamming"])  # noqa: E731
    assert sorted(map(key, lazy.collect())) == \
        sorted(map(key, eager.collect()))
