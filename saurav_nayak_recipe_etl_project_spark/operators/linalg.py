"""Distributed linear algebra over the embedding column: the exact
integer Gram / covariance matrix (the X^T X building block every
spectral method — PCA, whitening, OPQ rotations, linear probes — sits
on) and a driver-side PCA built from it.

Shape, the one that matters at 100 TB: each Arrow batch computes ONE
d×d integer matmul of its own rows (mapInPandas, numpy int64), emits
d² partial cells, and a single map-side-combined groupBy sums them —
corpus scans once, network carries only n_batches × d² cells, and the
driver never sees a row. This is the block outer-product aggregation,
not a d²-per-row explode.

Portability: float sums are summation-order-dependent, so the vectors
are quantized ONCE to integer micros (round(x·10⁶) — exact for
float32 inputs) and every downstream sum is integer (DECIMAL(38,0) /
HUGEINT at the aggregate layer; the per-batch int64 matmul is safe
because |x_micro| ≤ ~2·10⁶ and batch rows ≤ 10⁴ keep partial cells
under 2⁶³). The oracle recomputes the same integer sums via unnest
pairs — quadratic in d but exact, fine at verification scale.

Eigen-decomposition itself is NOT SQL-expressible and numpy's eigh is
not bit-portable, so PCA stays a test-only capability
(tests/test_linalg.py): eigh of the d×d integer matrix on the driver
(O(d³), corpus-independent), projection as one broadcast matmul pass,
with reconstruction/variance properties pinned instead of hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saurav_nayak_recipe_etl_project_spark.sources.catalog import load_table
from saurav_nayak_recipe_etl_project_spark.functions.localframe import (
    local_frame,
)

MICRO = 1_000_000


def gram_matrix_micro(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact integer Gram matrix: G[i,j] = Σ_rows x_i·x_j over
    micro-quantized vectors, long form (i, j, n_rows, g) with i <= j
    (the matrix is symmetric — emitting the upper triangle halves the
    output). g is in micro² units (divide by 1e12 for the float
    view)."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["v"].to_numpy()).astype(np.int64)
            # numpy int64 matmul WRAPS silently on overflow — enforce
            # the documented contract loudly instead: per-cell partial
            # <= rows * max|x|^2 must stay under 2^63
            peak = np.abs(m).max(initial=0)
            if peak * peak * len(m) >= 2**62:
                raise ValueError(
                    f"gram_matrix_micro: batch of {len(m)} rows with "
                    f"max|x_micro|={peak} risks int64 overflow; lower "
                    "spark.sql.execution.arrow.maxRecordsPerBatch or "
                    "rescale the vectors"
                )
            g = m.T @ m  # (d, d) int64
            d = g.shape[0]
            iu = np.triu_indices(d)
            yield pd.DataFrame({
                "i": iu[0].astype("int32"),
                "j": iu[1].astype("int32"),
                "n": np.full(len(iu[0]), len(pdf), dtype="int64"),
                "g_part": g[iu],
            })

    e = emb.select(
        F.transform(vec_col, lambda x: F.round(x.cast("double") * MICRO)
                    .cast("long")).alias("v")
    )
    parts = e.mapInPandas(
        gen, schema="i int, j int, n long, g_part long"
    )
    return parts.groupBy("i", "j").agg(
        F.sum("n").alias("n_rows"),
        F.sum(F.col("g_part").cast("decimal(38,0)")).alias("g"),
    ).select(
        "i", "j", "n_rows", F.col("g").cast("decimal(38,0)").alias("g")
    )


def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered exact Gram matrix of the embeddings table (upper
    triangle, 64·65/2 = 2080 rows at d=64).

    ``g`` is emitted as a STRING of the exact integer (DECIMAL stays
    internal to ``gram_matrix_micro``): a Gram cell genuinely exceeds
    int64 at ~1e8 unit-scale micro² rows, and DECIMAL output columns
    break the external driver's value hash (the only two
    decimal-emitting entries of 255 were the only two r9 hash reds —
    values bit-identical to the oracle). A plain-digit string is
    exact at ANY scale and hash-portable; Spark's decimal(38,0) →
    string and DuckDB's HUGEINT → VARCHAR both print the same
    canonical form (no exponent, no trailing point — pinned in
    tests/test_linalg.py)."""
    g = gram_matrix_micro(load_table(spark, "embeddings", sf_dir))
    return g.select(
        "i", "j", "n_rows", F.col("g").cast("string").alias("g")
    )


GRAM_ORACLE = f"""
    WITH v AS (
      SELECT list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {MICRO}) AS BIGINT))
        AS m
      FROM embeddings
    ),
    cells AS (
      SELECT i.i AS i, j.j AS j,
        CAST(m[i.i + 1] AS HUGEINT) * m[j.j + 1] AS p
      FROM v,
        UNNEST(range(0, len(m))) AS i(i),
        UNNEST(range(0, len(m))) AS j(j)
      WHERE i.i <= j.j
    )
    SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(CAST(SUM(p) AS HUGEINT) AS VARCHAR) AS g
    FROM cells GROUP BY i, j
"""


def pca_project(emb: DataFrame, k: int = 8,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> tuple:
    """Driver-side PCA from the distributed integer Gram matrix:
    eigh of the (broadcastable, d×d) second-moment matrix, projection
    of the corpus onto the top-k components in one broadcast-matmul
    pass. Returns (projected DataFrame with id + array<double> pc,
    explained-variance ratios list, descending). Test-only capability:
    eigh is driver-side O(d³) — corpus-size-independent — and not
    bit-portable, so properties are pinned instead of hashes."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    cells = gram_matrix_micro(emb, vec_col).collect()
    d = max(r["j"] for r in cells) + 1
    n = cells[0]["n_rows"]
    g = np.zeros((d, d))
    for r in cells:
        val = float(r["g"]) / (MICRO * MICRO)
        g[r["i"], r["j"]] = val
        g[r["j"], r["i"]] = val
    second_moment = g / int(n)
    evals, evecs = np.linalg.eigh(second_moment)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    ratios = (evals / evals.sum()).tolist()
    w = evecs[:, :k]  # (d, k)
    bc = spark.sparkContext.broadcast(w)

    def gen(batches):
        wk = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["v"].to_numpy())
            proj = m @ wk
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "pc": list(proj),
            })

    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    out = e.mapInPandas(gen, schema="vec_id long, pc array<double>")
    return out, ratios


def linear_probe_accuracy(emb: DataFrame, ridge: float = 1e-3,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          label_col: str = "label") -> DataFrame:
    """Ridge-regression linear probe on the embedding column — the
    standard 'are these embeddings linearly separable' quality eval.
    One-vs-rest least squares solved EXACTLY from sufficient
    statistics: W = (X^T X + λnI)⁻¹ X^T Y, where X^T X comes from the
    distributed integer Gram aggregation and X^T Y from the same
    block outer-product shape (d × n_labels partial cells per batch).
    The corpus is scanned twice (stats, then scoring against the
    broadcast d×L weight matrix); the driver solves a d×d system —
    O(d³), corpus-size-independent. No gradient descent, no ML
    library, no row ever on the driver.

    Test-only capability: the solve is float linear algebra (not
    bit-portable), so tests pin accuracy floors, determinism, and
    that the probe beats the majority-class baseline."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    # X^T X from the integer Gram cells
    cells = gram_matrix_micro(emb, vec_col).collect()
    d = max(r["j"] for r in cells) + 1
    n = int(cells[0]["n_rows"])
    xtx = np.zeros((d, d))
    for r in cells:
        val = float(r["g"]) / (MICRO * MICRO)
        xtx[r["i"], r["j"]] = val
        xtx[r["j"], r["i"]] = val

    labels = sorted(
        r["l"] for r in
        emb.select(F.col(label_col).alias("l")).distinct().collect()
    )
    lab_idx = {lab: k for k, lab in enumerate(labels)}

    def xty_gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["v"].to_numpy())
            y = np.zeros((len(pdf), len(labels)))
            y[np.arange(len(pdf)), pdf["k"].to_numpy()] = 1.0
            part = m.T @ y  # (d, L)
            ii, jj = np.meshgrid(np.arange(d), np.arange(len(labels)),
                                 indexing="ij")
            yield pd.DataFrame({
                "i": ii.ravel().astype("int32"),
                "k": jj.ravel().astype("int32"),
                "p": part.ravel(),
            })

    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    # label index as a CASE chain (JVM-side; labels are a tiny set)
    k_expr = F.lit(-1)
    for lab, k in lab_idx.items():
        k_expr = F.when(F.col("label") == lab, k).otherwise(k_expr)
    e = e.withColumn("k", k_expr.cast("int"))

    xty_cells = e.select("v", "k").mapInPandas(
        xty_gen, schema="i int, k int, p double"
    ).groupBy("i", "k").agg(F.sum("p").alias("s")).collect()
    xty = np.zeros((d, len(labels)))
    for r in xty_cells:
        xty[r["i"], r["k"]] = r["s"]

    w = np.linalg.solve(xtx + ridge * n * np.eye(d), xty)  # (d, L)
    bc = spark.sparkContext.broadcast(w)

    def score_gen(batches):
        wk = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["v"].to_numpy())
            pred = (m @ wk).argmax(axis=1)
            yield pd.DataFrame({
                "k": pdf["k"],
                "pred_k": pred.astype("int32"),
            })

    scored = e.select("v", "k").mapInPandas(
        score_gen, schema="k int, pred_k int"
    )
    lab_rows = local_frame(
        spark, [(k, lab) for lab, k in lab_idx.items()], "k int, label int"
    )
    return (
        scored.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("k") == F.col("pred_k")).cast("long"))
            .alias("n_correct"),
        )
        .join(F.broadcast(lab_rows), "k")
        .select(
            "label", "n", "n_correct",
            F.round(F.col("n_correct") / F.col("n"), 6).alias("accuracy"),
        )
    )


def embedding_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier flags: squared distance to the corpus
    mean vector, cut at the robust MAD threshold — the vector-QC pass
    a training pipeline runs before ANN indexing or SemDeDup (corrupt
    encodes, wrong-modality rows, and truncated vectors land far from
    the mean; a stddev cut would let the outliers it hunts drag the
    threshold, the E68 argument).

    Exactness: vectors micro-quantized once; the mean vector is a
    per-dim truncating DIV of exact DECIMAL sums (d-row broadcast
    frame); dist2 is an exact integer; median and MAD of dist2 run on
    the with_global_rank BANDED lane (dist2 is corpus-sized — a
    global ORDER BY window here would be the single-task trap), with
    the doubled-value idiom and the cross-multiplied DECIMAL flag
    predicate dev_x2 * 20000 > 22239 * mad_x4.

    Scale note: the per-dim explode is one n*d pass (no K factor —
    unlike the k-means assignment this runs ONCE); the Arrow-matmul
    lane (operators/similarity.py) is the drop-in if d grows past
    a few hundred."""
    return outlier_flags(load_table(spark, "embeddings", sf_dir))


def outlier_flags(emb: DataFrame) -> DataFrame:
    """The MAD outlier frame for ANY (vec_id, embedding, label) input
    — shared by the registered entry above and the P6 QC pipeline."""
    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        derive_band_width,
        with_global_rank,
    )

    q = emb.select(
        "vec_id", "label",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * MICRO).cast("long"),
        ).alias("qv"),
    )
    dims = q.select("vec_id", F.posexplode("qv").alias("d", "v"))
    mean = dims.groupBy("d").agg(
        F.expr(
            "CAST(sum(CAST(v AS DECIMAL(38,0))) DIV count(*) AS BIGINT)"
        ).alias("m")
    )
    dist = (
        dims.join(F.broadcast(mean), "d")
        .groupBy("vec_id")
        .agg(
            F.expr(
                "CAST(sum(CAST(v - m AS DECIMAL(38,0)) * (v - m))"
                " AS BIGINT)"
            ).alias("dist2")
        )
    )
    n = dist.agg(F.count("*").alias("n"))
    w1 = derive_band_width(dist, "dist2")
    ranked = with_global_rank(
        dist, ["dist2", "vec_id"],
        bucket=F.floor(F.col("dist2") / F.lit(w1)),
    )
    med = (
        ranked.crossJoin(F.broadcast(n))
        .where(
            (F.col("rank") == F.expr("(n + 1) DIV 2"))
            | (F.col("rank") == F.expr("(n + 2) DIV 2"))
        )
        .agg(
            F.expr(
                "CASE WHEN count(*) = 1 THEN 2 * min(dist2)"
                " ELSE sum(dist2) END"
            ).alias("med_x2")
        )
    )
    dev = dist.crossJoin(F.broadcast(med)).withColumn(
        "dev_x2", F.abs(2 * F.col("dist2") - F.col("med_x2"))
    )
    w2 = derive_band_width(dev, "dev_x2")
    dranked = with_global_rank(
        dev.select("vec_id", "dev_x2"), ["dev_x2", "vec_id"],
        bucket=F.floor(F.col("dev_x2") / F.lit(w2)),
    )
    mad = (
        dranked.crossJoin(F.broadcast(n))
        .where(
            (F.col("rank") == F.expr("(n + 1) DIV 2"))
            | (F.col("rank") == F.expr("(n + 2) DIV 2"))
        )
        .agg(
            F.expr(
                "CASE WHEN count(*) = 1 THEN 2 * min(dev_x2)"
                " ELSE sum(dev_x2) END"
            ).alias("mad_x4")
        )
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .join(q.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            "label",
            "dist2",
            F.expr(
                "CAST(dev_x2 AS DECIMAL(38,0)) * 20000"
                " > 22239 * CAST(mad_x4 AS DECIMAL(38,0))"
            ).alias("is_outlier"),
        )
    )


def embedding_dim_clip_stats(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """F71 — per-DIMENSION exact calibration percentiles (P1/P50/P99
    in micros) plus the mass clipped outside [P1, P99] — the readout
    an int8/fp8 embedding-quantization pass runs before choosing
    per-dim clip bounds (activation-clipping calibration: clip at a
    percentile, count what saturates).

    Scale shape: each dimension's value list is CORPUS-sized (n rows
    per dim), so a ``Window.partitionBy(dim)`` rank would funnel the
    whole corpus through d tasks; this runs the with_grouped_rank
    (dim, value-band) banded lane — the same migration lane as
    event_value_percentiles_exact — then one broadcast join of the
    d-row percentile frame back onto the (vec_id, dim) explode for
    the exact clip counts. Two n·d passes total, no K factor,
    bounded windows everywhere.

    Quantiles are inverse-CDF (type-1): value at rank
    ceil(q·n) = (n·q + 99) DIV 100 — integer-exact, no
    interpolation float."""
    return dim_clip_stats(load_table(spark, "embeddings", sf_dir))


def dim_clip_stats(emb: DataFrame) -> DataFrame:
    """The clip-calibration frame for ANY (vec_id, embedding) input —
    shared by the registered full-corpus entry above and the P6
    QC pipeline (which feeds it the outlier-filtered survivors)."""
    from saurav_nayak_recipe_etl_project_spark.functions.ranking import (
        derive_band_width,
        with_grouped_rank,
    )

    dims = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * MICRO).cast("long"),
            )
        ).alias("dim", "v"),
    )
    width = derive_band_width(dims, "v")
    ranked = with_grouped_rank(
        dims,
        ["dim"],
        ["v", "vec_id"],
        bucket=F.floor(F.col("v") / F.lit(width)),
        count_col="n_g",
    )
    sel = None
    aggs = [F.max("n_g").alias("n")]
    for q in (1, 50, 99):
        k = F.expr(f"(n_g * {q} + 99) DIV 100")
        aggs.append(
            F.min(F.when(F.col("rank") == k, F.col("v")))
            .alias(f"p{q:02d}_micro")
        )
        cond = F.col("rank") == k
        sel = cond if sel is None else (sel | cond)
    pct = ranked.where(sel).groupBy("dim").agg(*aggs)
    return (
        dims.join(F.broadcast(pct), "dim")
        .groupBy("dim")
        .agg(
            F.max("n").alias("n"),
            F.max("p01_micro").alias("p01_micro"),
            F.max("p50_micro").alias("p50_micro"),
            F.max("p99_micro").alias("p99_micro"),
            F.sum(
                (F.col("v") < F.col("p01_micro")).cast("long")
            ).alias("n_below"),
            F.sum(
                (F.col("v") > F.col("p99_micro")).cast("long")
            ).alias("n_above"),
        )
        .select(
            F.col("dim").cast("int").alias("dim"),
            "n", "p01_micro", "p50_micro", "p99_micro",
            "n_below", "n_above",
        )
    )


DIM_CLIP_ORACLE = f"""
    WITH dims AS (
      SELECT vec_id, i.i AS dim,
        CAST(round(CAST(embedding[i.i + 1] AS DOUBLE) * {MICRO})
             AS BIGINT) AS v
      FROM embeddings,
        UNNEST(range(0, len(embedding))) AS i(i)
    ),
    ranked AS (
      SELECT dim, v,
        ROW_NUMBER() OVER (PARTITION BY dim ORDER BY v, vec_id)
          AS rank,
        COUNT(*) OVER (PARTITION BY dim) AS n_g
      FROM dims
    ),
    pct AS (
      SELECT dim, MAX(n_g) AS n,
        MIN(CASE WHEN rank = (n_g * 1 + 99) // 100 THEN v END)
          AS p01_micro,
        MIN(CASE WHEN rank = (n_g * 50 + 99) // 100 THEN v END)
          AS p50_micro,
        MIN(CASE WHEN rank = (n_g * 99 + 99) // 100 THEN v END)
          AS p99_micro
      FROM ranked GROUP BY dim
    )
    SELECT CAST(d.dim AS INTEGER) AS dim, CAST(MAX(n) AS BIGINT) AS n,
      MAX(p01_micro) AS p01_micro, MAX(p50_micro) AS p50_micro,
      MAX(p99_micro) AS p99_micro,
      CAST(SUM(CASE WHEN v < p01_micro THEN 1 ELSE 0 END) AS BIGINT)
        AS n_below,
      CAST(SUM(CASE WHEN v > p99_micro THEN 1 ELSE 0 END) AS BIGINT)
        AS n_above
    FROM dims d JOIN pct ON d.dim = pct.dim
    GROUP BY d.dim
"""


OUTLIERS_ORACLE = f"""
    WITH q AS (
      SELECT vec_id, label,
        list_transform(embedding,
          x -> CAST(round(CAST(x AS DOUBLE) * {MICRO}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    dims AS (
      SELECT vec_id, i.i AS d, qv[i.i + 1] AS v
      FROM q, UNNEST(range(0, len(qv))) AS i(i)
    ),
    mean AS (
      SELECT d, CAST(SUM(CAST(v AS HUGEINT)) // COUNT(*) AS BIGINT) AS m
      FROM dims GROUP BY d
    ),
    dist AS (
      SELECT vec_id,
        CAST(SUM(CAST(v - m AS HUGEINT) * (v - m)) AS BIGINT) AS dist2
      FROM dims JOIN mean USING (d) GROUP BY vec_id
    ),
    nn AS (SELECT COUNT(*) AS n FROM dist),
    ranked AS (
      SELECT vec_id, dist2,
        ROW_NUMBER() OVER (ORDER BY dist2, vec_id) AS rn
      FROM dist
    ),
    med AS (
      SELECT CASE WHEN COUNT(*) = 1 THEN 2 * MIN(dist2)
             ELSE SUM(dist2) END AS med_x2
      FROM ranked, nn WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    ),
    dev AS (
      SELECT d.vec_id, d.dist2, ABS(2 * d.dist2 - med_x2) AS dev_x2
      FROM dist d, med
    ),
    dranked AS (
      SELECT vec_id, dev_x2,
        ROW_NUMBER() OVER (ORDER BY dev_x2, vec_id) AS dn
      FROM dev
    ),
    mad AS (
      SELECT CASE WHEN COUNT(*) = 1 THEN 2 * MIN(dev_x2)
             ELSE SUM(dev_x2) END AS mad_x4
      FROM dranked, nn WHERE dn = (n + 1) // 2 OR dn = (n + 2) // 2
    )
    SELECT dev.vec_id, q.label, dev.dist2,
      CAST(dev_x2 AS HUGEINT) * 20000 > 22239 * CAST(mad_x4 AS HUGEINT)
        AS is_outlier
    FROM dev, mad JOIN q ON q.vec_id = dev.vec_id
"""


LINALG_QUERIES = {
    "embedding_gram_matrix": embedding_gram_matrix,
    "embedding_outliers_mad": embedding_outliers_mad,
    "embedding_dim_clip_stats": embedding_dim_clip_stats,
}

LINALG_ORACLES = {
    "embedding_gram_matrix": GRAM_ORACLE,
    "embedding_outliers_mad": OUTLIERS_ORACLE,
    "embedding_dim_clip_stats": DIM_CLIP_ORACLE,
}
