"""Similarity search over embedding columns (array<float>).

  - brute-force cosine top-k: the exact baseline — one scan, JVM-side
    dot products, TakeOrderedAndProject (no full sort).
  - LSH-bucketed top-k: the scale path — sign-LSH restricts the scan
    to matching buckets (multi-probe = query bucket's neighbors).
  - IVF-style top-k: coarse quantization by a centroid table
    (broadcast), probe nearest `nprobe` centroids.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from json_ld_spark.functions.columns import cosine_similarity
from json_ld_spark.operators.dedup import sign_lsh_bucket


def _query_vec_col(query_vec: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. The plan is
    scan → project(cosine) → TakeOrderedAndProject(k) — verify no
    global sort appears (tests assert this)."""
    q = _query_vec_col(query_vec)
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), q), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def lsh_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: only vectors whose sign-LSH bucket matches
    the query's bucket are scored. Recall < 1 by design; the candidate
    set shrinks ~2^n_planes-fold."""
    bucketed = embeddings.withColumn("_bkt", sign_lsh_bucket(F.col(vec_col), n_planes))
    q = _query_vec_col(query_vec)
    # query bucket computed with the same expression over a 1-row frame
    qrow = (
        embeddings.sparkSession.range(1)
        .select(q.alias("_qv"))
        .withColumn("_bkt", sign_lsh_bucket(F.col("_qv"), n_planes))
        .select("_bkt")
    )
    return (
        bucketed.join(F.broadcast(qrow), "_bkt")
        .select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), q), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def build_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Coarse IVF codebook without iterative k-means: centroid c =
    mean of vectors hashed to cell c (deterministic one-pass
    quantization; good enough as a routing structure, replaceable by a
    trained codebook)."""
    cells = embeddings.select(
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_centroids))).alias("centroid_id"),
        F.col(vec_col).alias("_v"),
    )
    agg = cells.groupBy("centroid_id").agg(
        F.array(
            *[F.avg(F.element_at("_v", i + 1)).alias(f"c{i}") for i in range(dim)]
        ).alias("centroid"),
        F.count("*").alias("n_members"),
    )
    return agg


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (broadcast the
    codebook — it is dimension-table-sized by construction)."""
    joined = embeddings.crossJoin(F.broadcast(centroids)).withColumn(
        "_sim", cosine_similarity(F.col(vec_col), F.col("centroid"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.col("centroid_id"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "centroid_id")
    )


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe nearest centroids, score only their members.
    `assigned` is the output of ``ivf_assign`` (precomputed index)."""
    q = _query_vec_col(query_vec)
    probe = (
        centroids.select(
            "centroid_id", cosine_similarity(F.col("centroid"), q).alias("_csim")
        )
        .orderBy(F.desc("_csim"))
        .limit(nprobe)
        .select("centroid_id")
    )
    return (
        assigned.join(F.broadcast(probe), "centroid_id")
        .select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), q), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )
