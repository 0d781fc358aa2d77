"""Distributed k-means (Lloyd's algorithm) with BIT-EXACT integer
arithmetic — the E51-PageRank treatment applied to an ML TRAINING
loop: float k-means is not cross-engine verifiable (centroid means
drift in the last ulp and reassign boundary points), so vectors are
micro-quantized once, distances are exact integer sums of squares,
centroid updates are integer floor-means, and ties break by centroid
id — making every iteration deterministic and the whole unrolled run
hash-verifiable against a DuckDB oracle.

Contrast with the k-means already in the repo: semdedup/IVF train
driver-side on BOUNDED samples (O(1) at any corpus). This operator is
the DISTRIBUTED full-corpus form — assignment is a (vector, dim)
explode joined to the broadcast K×d centroid table (codegen
aggregation, no Python in the row path), update is one groupBy per
iteration — the shape you run when the corpus itself must be
clustered, not just a quantizer trained.

Scale: per iteration, n·K·d intermediate rows through map-side
combined sums; centroids stay a K×d broadcast. Iterations are
UNROLLED (fixed count) because a convergence test is a driver action
per round; two Lloyd steps from a deterministic seed is the verifiable
contract — callers wanting convergence loop the building block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table

MICRO = 1_000_000
KMEANS_K = 4
KMEANS_ITERS = 2


def _vec_micro(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * MICRO)
            .cast("long")
        ).alias("v"),
    )


def _dims(df: DataFrame) -> DataFrame:
    return df.select("vec_id", F.posexplode("v").alias("dim", "x"))


def _assign(dims: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cluster) by exact integer squared distance; ties break
    on the smaller cluster id."""
    d2 = (
        dims.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "c")
        .agg(F.sum(F.expr("(x - cx) * (x - cx)")).alias("dist2"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist2", "c")
    return (
        d2.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("c").alias("cluster"), "dist2")
    )


def _update(dims: DataFrame, assign: DataFrame) -> DataFrame:
    """New centroids: integer floor-mean per (cluster, dim). Spark DIV
    and DuckDB integer // both truncate toward zero (NOTES.md), so
    negative coordinates stay engine-exact."""
    return (
        dims.join(assign.select("vec_id", "cluster"), "vec_id")
        .groupBy(F.col("cluster").alias("c"), "dim")
        .agg(F.expr("sum(x) DIV count(*)").alias("cx"))
    )


def kmeans_integer(emb: DataFrame, k: int = KMEANS_K,
                   iters: int = KMEANS_ITERS) -> DataFrame:
    """Unrolled integer Lloyd's: seed = the k vectors with the
    smallest md5(vec_id) (content-keyed, portable), `iters` full
    assign/update rounds, then a final assignment. Returns the
    per-cluster report: size, exact integer inertia (HUGEINT-class),
    and the centroid L2² norm in micro² — enough to pin the whole
    trajectory without emitting n rows."""
    v = _vec_micro(emb)
    dims = _dims(v)
    # orderBy+limit plans as TakeOrderedAndProject (O(k) driver, no
    # corpus-sized window); the rank window then runs on the k-row frame
    seed_rows = (
        v.withColumn("mk", F.md5(F.col("vec_id").cast("string")))
        .orderBy("mk")
        .limit(k)
    )
    seed_w = Window.orderBy("mk")
    seeds = seed_rows.withColumn(
        "c", (F.row_number().over(seed_w) - 1).cast("int")
    ).select("c", "v")
    cent = seeds.select("c", F.posexplode("v").alias("dim", "cx"))
    for _ in range(iters):
        assign = _assign(dims, cent)
        cent = _update(dims, assign)
    final = _assign(dims, cent)
    report = final.groupBy("cluster").agg(
        F.count("*").alias("n_vectors"),
        F.sum(F.col("dist2").cast("decimal(38,0)")).alias("inertia"),
    )
    norms = cent.groupBy(F.col("c").alias("cluster")).agg(
        F.sum(F.expr("cast(cx as decimal(38,0)) * cx"))
        .alias("centroid_norm2"),
    )
    return report.join(norms, "cluster").select(
        "cluster", "n_vectors",
        F.col("inertia").cast("decimal(38,0)").alias("inertia"),
        F.col("centroid_norm2").cast("decimal(38,0)")
        .alias("centroid_norm2"),
    )


def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered integer k-means over the embeddings table."""
    return kmeans_integer(load_table(spark, "embeddings", sf_dir))


def _kmeans_oracle(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """Unrolled-iteration DuckDB replay: same seed rule, same integer
    distance/floor-mean arithmetic, same tie-breaks."""
    head = f"""
    WITH v AS (
      SELECT vec_id,
        list_transform(embedding,
          x -> CAST(round(CAST(x AS DOUBLE) * {MICRO}) AS BIGINT)) AS m
      FROM embeddings
    ),
    dims AS (
      SELECT vec_id, i.i AS dim, m[i.i + 1] AS x
      FROM v, UNNEST(range(0, len(m))) AS i(i)
    ),
    seeds AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)))
                  - 1 AS INTEGER) AS c, m
      FROM v QUALIFY ROW_NUMBER()
        OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= {k}
    ),
    cent_0 AS (
      SELECT c, i.i AS dim, m[i.i + 1] AS cx
      FROM seeds, UNNEST(range(0, len(m))) AS i(i)
    )"""
    body = ""
    prev = "cent_0"
    for it in range(1, iters + 1):
        body += f""",
    d2_{it} AS (
      SELECT vec_id, c, SUM((x - cx) * (x - cx)) AS dist2
      FROM dims JOIN {prev} USING (dim)
      GROUP BY vec_id, c
    ),
    assign_{it} AS (
      SELECT vec_id, c AS cluster FROM (
        SELECT vec_id, c,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, c)
            AS rn
        FROM d2_{it}
      ) WHERE rn = 1
    ),
    cent_{it} AS (
      SELECT cluster AS c, dim, SUM(x) // COUNT(*) AS cx
      FROM dims JOIN assign_{it} USING (vec_id)
      GROUP BY cluster, dim
    )"""
        prev = f"cent_{it}"
    tail = f""",
    d2_f AS (
      SELECT vec_id, c, SUM((x - cx) * (x - cx)) AS dist2
      FROM dims JOIN {prev} USING (dim)
      GROUP BY vec_id, c
    ),
    final AS (
      SELECT vec_id, c AS cluster, dist2 FROM (
        SELECT vec_id, c, dist2,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, c)
            AS rn
        FROM d2_f
      ) WHERE rn = 1
    ),
    report AS (
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vectors,
        CAST(SUM(dist2) AS DECIMAL(38,0)) AS inertia
      FROM final GROUP BY cluster
    ),
    norms AS (
      SELECT c AS cluster,
        CAST(SUM(CAST(cx AS HUGEINT) * cx) AS DECIMAL(38,0))
          AS centroid_norm2
      FROM {prev} GROUP BY c
    )
    SELECT report.cluster, n_vectors, inertia, centroid_norm2
    FROM report JOIN norms ON report.cluster = norms.cluster
    """
    return head + body + tail


KMEANS_QUERIES = {
    "embedding_kmeans": embedding_kmeans,
}

KMEANS_ORACLES = {
    "embedding_kmeans": _kmeans_oracle(),
}
