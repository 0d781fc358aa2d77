"""Python UDTF surface (Spark 4): a table function registered into
the SQL catalog, exploding each document into sentence spans. UDTFs
are row-path Python — NOT for the 100 TB hot path (the engine's text
ops are all column-expression; see operators/text.py) — but the API
surface must work for user extensions, so it is pinned here: catalog
registration, lateral-join usage against a real table, and parity
with the expression-based split."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_udtf_sentence_spans_matches_expression_split(spark, sf_dir):
    from pyspark.sql.functions import udtf

    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )

    @udtf(returnType="idx int, sentence string, n_chars int")
    class SentenceSpans:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(p.strip() for p in text.split(".")):
                if s:
                    yield (i, s, len(s))

    spark.udtf.register("sentence_spans", SentenceSpans)
    docs = load_table(spark, "documents", sf_dir).limit(20)
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql("""
        SELECT d.doc_id, s.idx, s.sentence, s.n_chars
        FROM udtf_docs d, LATERAL sentence_spans(d.text) s
    """)
    # expression twin: split + posexplode + trim + non-empty filter
    want = (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", "\\.")).alias("i", "raw"),
        )
        .select("doc_id", F.trim("raw").alias("sentence"))
        .where(F.length("sentence") > 0)
    )
    g = got.select("doc_id", "sentence").orderBy("doc_id", "sentence")
    w = want.orderBy("doc_id", "sentence")
    assert [tuple(r) for r in g.collect()] == [tuple(r) for r in w.collect()]
    # n_chars really is the sentence length
    assert got.where(F.length("sentence") != F.col("n_chars")).count() == 0
