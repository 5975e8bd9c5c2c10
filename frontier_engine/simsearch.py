"""Similarity search over embedding columns (training-data pipeline op).

All math is JVM-side (``zip_with``/``aggregate`` — whole-stage-codegen'd,
no Python in the hot path). Brute-force cosine is the baseline; two scale
paths are provided:

- ``topk_per_bucket``  — IVF-style: partition by a coarse bucket column
  (centroid / label), window top-k inside each (one shuffle on bucket).
- ``lsh_sign_buckets`` — random-hyperplane LSH: sign-bit sketch from fixed
  deterministic pseudo-planes (md5-seeded), bucket-join candidates instead
  of the O(n²) cross product.

At 100 TB the broadcast side is the query set (queries ≪ corpus): cosine
against each query is a broadcast nested loop over corpus partitions, which
Spark executes as BroadcastNestedLoopJoin with no corpus shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def dot_col(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential order (engine-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (l2_norm_col(a) * l2_norm_col(b))


def cosine_to_query(
    corpus: DataFrame, query: DataFrame, keep_cols: list[str] | None = None, digits: int = 4
) -> DataFrame:
    """Brute-force cosine of every corpus row against a one-row query
    DataFrame (column ``qv``). The query side is broadcast; the corpus is
    never shuffled."""
    cols = ["vec_id"] + (keep_cols or [])
    joined = corpus.crossJoin(F.broadcast(query))
    return joined.select(
        *cols, F.round(cosine_col(F.col("embedding"), F.col("qv")), digits).alias("cos")
    )


def topk_per_bucket(scored: DataFrame, bucket_col: str, k: int) -> DataFrame:
    """Exact top-k inside each coarse bucket (IVF probe stage)."""
    w = Window.partitionBy(bucket_col).orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")


def lsh_sign_buckets_df(emb: DataFrame, n_bits: int = 8, dim: int = 64) -> DataFrame:
    """Random-hyperplane sign-LSH sketch, (vec_id, bucket). Planes are not
    stored: plane p's component j = ±1 by parity of md5(p:j) — deterministic,
    engine-portable, and a pure literal-array column expression (JVM-side)."""
    import hashlib

    def sign(p: int, j: int) -> float:
        return 1.0 if hashlib.md5(f"{p}:{j}".encode()).digest()[0] % 2 else -1.0

    bucket = F.lit(0)
    for p in range(n_bits):
        signs = F.array(*[F.lit(sign(p, j)) for j in range(dim)])
        proj = F.aggregate(
            F.zip_with(F.col("embedding"), signs, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return emb.select("vec_id", bucket.alias("bucket"))


def _pos_explode(emb: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, embedding) → (id, pos, val) position-exploded doubles. The
    positional form makes every k-means step a plain equi-join + agg —
    no array UDFs, fully codegen'd, and expressible 1:1 in the oracle SQL."""
    return emb.select(
        id_col, F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))


def kmeans_lloyd(emb: DataFrame, k: int = 4, iters: int = 2) -> tuple[DataFrame, DataFrame]:
    """Deterministic Lloyd's k-means over an embedding column, unrolled to a
    STATIC plan (``iters`` is small and fixed — the classic IVF coarse
    quantizer needs 2-5 refinement passes, not convergence loops).

    Init: the k smallest non-zero vec_ids seed the centroids (cluster label
    = seed vec_id) — deterministic, no RNG, engine-portable. Each iteration:
    - assignment: corpus ⋈ centroids on ``pos`` (centroids broadcast — k·dim
      rows), partial-agg Σ(val−cval)² per (vec, cluster), row_number argmin
      with cluster-id tie-break,
    - update: corpus ⋈ assignment on vec_id, avg per (cluster, pos).
    At 100 TB: the corpus never shuffles for assignment (broadcast join +
    map-side partial agg on vec_id, which parquet bucketing can pre-group);
    only the tiny (cluster, pos) update agg crosses the wire.

    Returns (assign: vec_id→cluster, centroids: cluster, pos, val).
    """
    pos = _pos_explode(emb.where(F.col("vec_id") != 0))
    cent = pos.where((F.col("vec_id") >= 1) & (F.col("vec_id") <= k)).select(
        F.col("vec_id").alias("cluster"), "pos", F.col("val").alias("cval")
    )
    assign = None
    for _ in range(iters):
        d2 = (
            pos.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "cluster")
            .agg(F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))).alias("d2"))
        )
        w = Window.partitionBy("vec_id").orderBy("d2", "cluster")
        assign = (
            d2.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
            .select("vec_id", "cluster")
        )
        cent = (
            pos.join(assign, "vec_id")
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("cval"))
        )
    return assign, cent


def ivf_probe_cluster(query: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest centroid to the query vector (one-row DataFrame, column
    ``qv``): the IVF probe step. Returns a one-row (cluster) DataFrame."""
    qpos = _pos_explode(query.select(F.col("qv").alias("embedding")).withColumn("vec_id", F.lit(-1)))
    d2 = (
        qpos.join(F.broadcast(cent), "pos")
        .groupBy("cluster")
        .agg(F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))).alias("d2"))
    )
    w = Window.orderBy("d2", "cluster")
    return d2.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).select("cluster")


def ann_lsh_candidates(emb: DataFrame, query: DataFrame, n_bits: int = 8, dim: int = 64) -> DataFrame:
    """LSH-bucketed ANN: corpus and query sketched with the same planes;
    candidates = bucket-equality join (broadcast on the query side)."""
    corpus_b = lsh_sign_buckets_df(emb, n_bits, dim).join(emb, "vec_id")
    query_b = lsh_sign_buckets_df(
        query.select(F.col("qv").alias("embedding")).withColumn("vec_id", F.lit(-1)), n_bits, dim
    ).select(F.col("bucket").alias("qbucket"))
    return corpus_b.join(
        F.broadcast(query_b), F.col("bucket") == F.col("qbucket"), "inner"
    ).drop("qbucket")
