"""Streaming near-duplicate dedup of documents via MinHash-band keys
(G7 extended from event_id equality to LSH similarity keys).

Semantics (shared by the batch twin and the stream): a document is a
DUPLICATE iff it shares at least one MinHash band bucket with an
earlier document — "earlier" is doc_id order in batch, arrival order
in the stream (identical when files arrive in doc_id order, which the
twin-agreement test enforces).

Why foreachBatch and not dropDuplicatesWithinWatermark: band-OR
semantics ("dup if ANY of the 8 band keys was seen") cannot be keyed
as a single equality column, and chaining a stateful explode-dedup
with a per-doc all-bands aggregate is two stateful operators. Instead
each micro-batch joins its band keys against the accumulated band-key
state table (broadcast-sized keys, parquet-backed like the upsert
sink), appends survivors to the output, and unions its keys into
state — exactly-once per batch via foreachBatch's replay-stable
batch_id. State grows with corpus band keys; at warehouse scale you
would prune it with a retention window, same as a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.operators.dedup import (
    minhash_signatures,
)
from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

N_HASHES = 32
N_BANDS = 8


def band_keys(docs: DataFrame, n_hashes: int = N_HASHES,
              n_bands: int = N_BANDS) -> DataFrame:
    """(doc_id, band_id, band_hash) rows — the LSH candidate keys."""
    rows_per_band = n_hashes // n_bands
    sigs = minhash_signatures(docs, n_hashes)
    return sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band_id", "band_hash"),
    )


def lsh_band_dedup(docs: DataFrame) -> DataFrame:
    """Batch twin: (doc_id, kept) — kept=false iff the doc shares a
    band bucket with a smaller doc_id. One explode + one bucket-min
    window-free aggregation + one semi-join; sub-quadratic by the same
    argument as minhash_lsh_pairs."""
    bands = band_keys(docs)
    bucket_min = bands.groupBy("band_id", "band_hash").agg(
        F.min("doc_id").alias("min_doc")
    )
    dup_ids = (
        bands.join(bucket_min, ["band_id", "band_hash"])
        .filter(F.col("doc_id") > F.col("min_doc"))
        .select("doc_id")
        .distinct()
    )
    return (
        docs.select("doc_id")
        .join(dup_ids.withColumn("_dup", F.lit(True)), "doc_id", "left")
        .select("doc_id", F.coalesce(~F.col("_dup"), F.lit(True)).alias("kept"))
    )


def dedup_stream_lsh_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming MinHash-band dedup (rows-only:
    xxhash64 band keys have no portable SQL oracle; twin-agreement and
    planted-near-dup behavior are pinned in tests/test_doc_dedup.py)."""
    return lsh_band_dedup(load_table(spark, "documents", sf_dir))


def run_doc_dedup_stream(spark: SparkSession, source_dir: str,
                         checkpoint_dir: str, state_path: str,
                         out_path: str,
                         max_files_per_trigger: int | None = None) -> None:
    """Document drops → near-dup-filtered parquet of survivors.

    Each micro-batch: band keys of incoming docs are checked against
    (a) the accumulated state table (docs seen in earlier batches) and
    (b) smaller-doc_id docs within the batch; survivors append to
    `out_path`, and ALL incoming docs' band keys union into state."""
    schema = "doc_id long, lang string, source string, text string"
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(source_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()
        bands = band_keys(batch_df).localCheckpoint()
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path(state_path)
        fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jvm_path):
            seen = spark.read.parquet(state_path)
        else:
            seen = spark.createDataFrame(
                [], "band_id int, band_hash long"
            )
        # cross-batch dups: any band key already in state
        cross = (
            bands.join(
                seen.select("band_id", "band_hash").distinct(),
                ["band_id", "band_hash"],
                "left_semi",
            )
            .select("doc_id")
        )
        # within-batch dups: share a bucket with a smaller doc_id
        bucket_min = bands.groupBy("band_id", "band_hash").agg(
            F.min("doc_id").alias("min_doc")
        )
        within = (
            bands.join(bucket_min, ["band_id", "band_hash"])
            .filter(F.col("doc_id") > F.col("min_doc"))
            .select("doc_id")
        )
        dup_ids = cross.unionByName(within).distinct()
        survivors = batch_df.join(dup_ids, "doc_id", "left_anti")
        survivors.write.mode("append").parquet(out_path)
        new_state = (
            seen.select("band_id", "band_hash")
            .unionByName(bands.select("band_id", "band_hash"))
            .distinct()
            .localCheckpoint()  # materialize before overwriting its source
        )
        new_state.write.mode("overwrite").parquet(state_path)

    (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )


STREAM_DOC_DEDUP_QUERIES = {"dedup_stream_lsh_batch": dedup_stream_lsh_batch}
STREAM_DOC_DEDUP_ORACLES: dict[str, str] = {}
