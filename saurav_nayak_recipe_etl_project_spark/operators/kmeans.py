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
the DISTRIBUTED full-corpus form — the corpus itself is clustered,
not just a quantizer trained.

TWO parity-pinned lanes compute the identical result:

- ``kmeans_arrow`` (the DEFAULT, what the registered entry runs):
  per iteration, ONE ``mapInPandas`` pass over the micro-quantized
  vectors does an int64 block matmul against the K×d centroid matrix
  (the operators/similarity.py broadcast-matmul shape) and emits only
  the K×d per-batch partial sums + member counts; a groupBy reduces
  those to the next centroids (K×d rows, collected — the bounded
  per-iteration driver action every production k-means pays, cf.
  Spark MLlib). Per-iteration data volume: n×d ints IN, K×d rows
  OUT per batch — no n·K·d intermediate anywhere. All arithmetic is
  int64-exact (|x| ≤ 2·MICRO ⇒ dist² ≤ d·(4·MICRO)² ≈ 2.6e14 ≪
  2⁶³), so the lane is row-identical to the explode lane below.
- ``kmeans_integer`` (the ORACLE TWIN): assignment as a
  (vector, dim) explode joined to the broadcast K×d centroid table —
  pure Column algebra with a mechanical unrolled-CTE DuckDB replay.
  n·K·d intermediate rows per iteration (map-side combined), so it
  verifies the Arrow lane rather than racing it.

Iterations are UNROLLED (fixed count): a convergence test is a
driver action per round; two Lloyd steps from a deterministic seed is
the verifiable contract — callers wanting convergence loop the
building block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.functions.localframe import (
    local_frame,
)

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
    # DECIMAL stays internal; the emitted report is BIGINT so both
    # lanes share the driver-hash-portable output contract (bounds in
    # the kmeans_arrow docstring).
    report = final.groupBy("cluster").agg(
        F.count("*").alias("n_vectors"),
        F.sum(F.col("dist2").cast("decimal(38,0)")).alias("_inertia_dec"),
    )
    norms = cent.groupBy(F.col("c").alias("cluster")).agg(
        F.sum(F.expr("cast(cx as decimal(38,0)) * cx"))
        .alias("_norm2_dec"),
    )
    int64_max = F.lit(2**63 - 1).cast("decimal(38,0)")

    def _as_int64(col: str, what: str):
        return (
            F.when(
                F.col(col) > int64_max,
                F.assert_true(
                    F.lit(False),
                    F.lit(f"kmeans_integer: {what} exceeds int64"),
                ).cast("decimal(38,0)"),
            )
            .otherwise(F.col(col))
            .cast("long")
        )

    return report.join(norms, "cluster").select(
        "cluster", "n_vectors",
        _as_int64("_inertia_dec", "inertia").alias("inertia"),
        _as_int64("_norm2_dec", "centroid_norm2").alias("centroid_norm2"),
    )


def _seed_matrix(v: DataFrame, k: int):
    """Collect the k seed vectors (smallest md5(vec_id) — the same
    content-keyed rule the oracle replays) into an int64 K×d matrix.
    TakeOrderedAndProject: O(k) rows to the driver at any corpus."""
    import numpy as np

    rows = (
        v.withColumn("mk", F.md5(F.col("vec_id").cast("string")))
        .orderBy("mk")
        .limit(k)
        .collect()
    )
    C = np.array([r["v"] for r in rows], dtype=np.int64)
    cids = np.arange(len(rows), dtype=np.int64)
    return C, cids


def _make_dist2():
    """Exact int64 squared-distance kernel, (batch, K): block matmul
    decomposition ‖x‖² − 2·x·c + ‖c‖² — every term ≪ 2⁶³ for
    micro-quantized unit-scale embeddings (module docstring bound).

    Built by a factory so the returned function's qualname is NOT
    importable by module path: cloudpickle then serializes it BY
    VALUE inside the mapInPandas closures, and the Python workers
    never need this package on their sys.path. (A plain module-level
    def is pickled by reference — the r11 finding that made
    embedding_kmeans/diversity_sample_balanced the only two entries
    to fail under an external harness whose workers lack the repo
    dir; every other Arrow operator was already closure-contained.)"""
    def dist2(X, C):
        x2 = (X * X).sum(axis=1)
        c2 = (C * C).sum(axis=1)
        return x2[:, None] - 2 * (X @ C.T) + c2[None, :]
    return dist2


_dist2_matrix = _make_dist2()


def _arrow_iterate(v: DataFrame, C, cids):
    """One Lloyd update via the Arrow lane: a mapInPandas pass emits
    per-batch per-cluster coordinate sums + member counts (≤ K·d rows
    per batch), a groupBy floor-means them (`sum(x) DIV count` ==
    the explode lane's arithmetic, since batch partials sum to the
    same totals), and the K×d result is collected into the next
    centroid matrix. Ties break on the smallest cluster id: the
    matrix rows are ordered by ascending id and argmin returns the
    first minimum."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["v"].to_numpy()).astype(np.int64)
            a = np.argmin(_dist2_matrix(X, C), axis=1)
            out = []
            for j in np.unique(a):
                m = X[a == j]
                out.append(pd.DataFrame({
                    "c": np.full(X.shape[1], cids[j], dtype=np.int64),
                    "dim": np.arange(X.shape[1], dtype=np.int64),
                    "sx": m.sum(axis=0),
                    "nb": np.full(X.shape[1], len(m), dtype=np.int64),
                }))
            yield pd.concat(out, ignore_index=True)

    partials = v.select("v").mapInPandas(
        gen, schema="c long, dim long, sx long, nb long"
    )
    rows = (
        partials.groupBy("c", "dim")
        .agg(F.expr("sum(sx) DIV sum(nb)").alias("cx"))
        .collect()
    )
    by_c: dict = {}
    for r in rows:
        by_c.setdefault(r["c"], {})[r["dim"]] = r["cx"]
    new_cids = np.array(sorted(by_c), dtype=np.int64)
    d = C.shape[1]
    newC = np.array(
        [[by_c[c][i] for i in range(d)] for c in new_cids], dtype=np.int64
    )
    return newC, new_cids


def _arrow_assign(v: DataFrame, C, cids) -> DataFrame:
    """Final assignment via the Arrow lane: (vec_id, cluster, dist2)
    — one matmul per batch, n rows out, no explode anywhere."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["v"].to_numpy()).astype(np.int64)
            d2 = _dist2_matrix(X, C)
            a = np.argmin(d2, axis=1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(),
                "cluster": cids[a],
                "dist2": d2[np.arange(len(a)), a],
            })

    return v.select("vec_id", "v").mapInPandas(
        gen, schema="vec_id long, cluster long, dist2 long"
    )


def kmeans_arrow(emb: DataFrame, k: int = KMEANS_K,
                 iters: int = KMEANS_ITERS) -> DataFrame:
    """Arrow-lane unrolled integer Lloyd's — row-identical to
    ``kmeans_integer`` (parity-pinned in tests/test_kmeans.py) with
    the matmul assignment shape instead of the n·K·d explode join.
    Micro-quantization stays IN SPARK (`_vec_micro`), so both lanes
    and the oracle share one rounding definition.

    Output types are driver-hash-portable BIGINT, never DECIMAL (the
    round-9 lesson: the external driver's value hash normalizes
    DECIMAL differently between its Spark and DuckDB fetch paths, so
    a value-correct DECIMAL column still reds the hash check).
    Bounds: per-cluster ``inertia`` sums int64 dist2 values of at
    most d·(2·MICRO)² ≈ 2.6e14 each (unit-norm-ish micro vectors at
    d=64), so the BIGINT sum holds to ~3.5e4 billion vectors per
    cluster; the in-plan assert_true guard fails LOUDLY (not wraps)
    if a corpus ever crosses it. ``centroid_norm2`` ≤ d·(2·MICRO)²
    fits int64 unconditionally for any d < 2e4 — guarded driver-side
    where the K×d matrix already lives."""
    spark = emb.sparkSession
    v = _vec_micro(emb)
    C, cids = _seed_matrix(v, k)
    for _ in range(iters):
        C, cids = _arrow_iterate(v, C, cids)
    final = _arrow_assign(v, C, cids)
    # Sum in DECIMAL internally (exact at any scale), emit BIGINT with
    # a loud in-plan overflow guard — same discipline as the Gram
    # matmul's int64 batch guard.
    report = final.groupBy("cluster").agg(
        F.count("*").alias("n_vectors"),
        F.sum(F.col("dist2").cast("decimal(38,0)")).alias("_inertia_dec"),
    )
    # centroid norms from the driver-side matrix: K Python-int exact
    # squares — no Spark job for a K-row frame. Python ints are
    # arbitrary-precision, so the bound check is exact.
    norm_rows = []
    for c, row in zip(cids, C):
        n2 = int(sum(int(x) * int(x) for x in row))
        if n2 >= 2**63:
            raise ValueError(
                f"kmeans_arrow: centroid_norm2={n2} exceeds int64 for "
                f"cluster {int(c)}; rescale the vectors (micro "
                "quantization too wide for this dimensionality)"
            )
        norm_rows.append((int(c), n2))
    norms = local_frame(
        spark, norm_rows, "cluster long, centroid_norm2 long"
    )
    int64_max = F.lit(2**63 - 1).cast("decimal(38,0)")
    return report.join(F.broadcast(norms), "cluster").select(
        F.col("cluster").cast("int").alias("cluster"),
        "n_vectors",
        F.when(
            F.col("_inertia_dec") > int64_max,
            F.assert_true(
                F.lit(False),
                F.lit("kmeans_arrow: cluster inertia exceeds int64 — "
                      "split the report by sub-cluster or rescale"),
            ).cast("decimal(38,0)"),
        ).otherwise(F.col("_inertia_dec"))
        .cast("long").alias("inertia"),
        F.col("centroid_norm2").alias("centroid_norm2"),
    )


def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered k-means over the embeddings table — Arrow matmul
    lane (the 100 TB shape); the explode lane is its oracle twin."""
    return kmeans_arrow(load_table(spark, "embeddings", sf_dir))


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
        CAST(SUM(dist2) AS BIGINT) AS inertia
      FROM final GROUP BY cluster
    ),
    norms AS (
      SELECT c AS cluster,
        CAST(SUM(CAST(cx AS HUGEINT) * cx) AS BIGINT)
          AS centroid_norm2
      FROM {prev} GROUP BY c
    )
    SELECT report.cluster, n_vectors, inertia, centroid_norm2
    FROM report JOIN norms ON report.cluster = norms.cluster
    """
    return head + body + tail


DIVERSITY_K = 8      # seed centroids = sample strata
DIVERSITY_M = 25     # picks per stratum


def diversity_sample_balanced(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """F72 — cluster-balanced coreset sample: partition the embedding
    space by nearest-of-K seed centroids (the kmeans seed rule —
    smallest md5(vec_id), zero Lloyd iterations, so the quantizer is
    content-keyed and engine-exact) and keep M deterministic picks
    per cluster by md5(vec_id) order — the diversity-sampling pass a
    training pipeline runs when a uniform random sample would
    over-represent the dense regions of embedding space (per-cluster
    quotas force coverage of sparse modes).

    Scale shape: assignment is the Arrow int64 matmul lane (one
    mapInPandas pass, n rows out, no n·K·d explode); the per-cluster
    top-M runs two_phase_group_top_k — salted two-phase ranking, so
    no cluster-sized window even when one cluster holds most of the
    corpus. Output is K·M rows regardless of corpus size."""
    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        two_phase_group_top_k,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    v = _vec_micro(emb)
    C, cids = _seed_matrix(v, DIVERSITY_K)
    assigned = _arrow_assign(v, C, cids)
    picked = two_phase_group_top_k(
        assigned.withColumn(
            "mk", F.md5(F.col("vec_id").cast("string"))
        ),
        keys=["cluster"],
        sort_cols=["mk"],
        k=DIVERSITY_M,
        rank_col="pick_rank",
    )
    return (
        picked.join(emb.select("vec_id", "label"), "vec_id")
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            "pick_rank",
            "vec_id",
            F.col("label").cast("int").alias("label"),
            "dist2",
        )
    )


def _diversity_oracle(k: int = DIVERSITY_K, m: int = DIVERSITY_M) -> str:
    """Nearest-seed assignment + per-cluster md5-order top-m replay
    (the kmeans oracle's seed/distance CTEs with zero iterations)."""
    return f"""
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
    cent AS (
      SELECT c, i.i AS dim, m[i.i + 1] AS cx
      FROM seeds, UNNEST(range(0, len(m))) AS i(i)
    ),
    d2 AS (
      SELECT vec_id, c, SUM((x - cx) * (x - cx)) AS dist2
      FROM dims JOIN cent USING (dim)
      GROUP BY vec_id, c
    ),
    assigned AS (
      SELECT vec_id, c AS cluster, dist2 FROM (
        SELECT vec_id, c, dist2,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, c)
            AS rn
        FROM d2
      ) WHERE rn = 1
    ),
    picked AS (
      SELECT cluster, vec_id, dist2,
        ROW_NUMBER() OVER (
          PARTITION BY cluster
          ORDER BY md5(CAST(vec_id AS VARCHAR))
        ) AS pick_rank
      FROM assigned
    )
    SELECT CAST(p.cluster AS INTEGER) AS cluster,
      CAST(pick_rank AS BIGINT) AS pick_rank, p.vec_id,
      CAST(e.label AS INTEGER) AS label, CAST(dist2 AS BIGINT) AS dist2
    FROM picked p JOIN embeddings e ON e.vec_id = p.vec_id
    WHERE pick_rank <= {m}
    """


KMEANS_QUERIES = {
    "embedding_kmeans": embedding_kmeans,
    "diversity_sample_balanced": diversity_sample_balanced,
}

KMEANS_ORACLES = {
    "embedding_kmeans": _kmeans_oracle(),
    "diversity_sample_balanced": _diversity_oracle(),
}
