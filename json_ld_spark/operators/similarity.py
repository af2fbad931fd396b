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


def plane_matrix(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix for sign-LSH, derived from
    md5 so any engine (Spark, DuckDB, plain Python) can reproduce the
    buckets bit-for-bit. Plane weights are data-independent constants —
    computing them driver-side and inlining them as literals keeps the
    executor expression pure arithmetic (no hashing per row)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        digest = b""
        while len(digest) < dim:
            digest += hashlib.md5(
                f"{seed}:{p}:{len(digest)}".encode()
            ).digest()
        planes.append([1.0 if b & 1 else -1.0 for b in digest[:dim]])
    return planes


def sign_lsh_bucket_literal(vec_col, planes: Sequence[Sequence[float]]):
    """Sign-LSH bucket id from a literal plane matrix (see
    plane_matrix). Bit p of the bucket = sign of <v, plane_p>;
    plane 0 is the most significant bit."""
    bucket = F.lit(0).cast("long")
    for weights in planes:
        w = F.array(*[F.lit(x) for x in weights])
        d = F.aggregate(
            F.zip_with(vec_col, w, lambda x, wj: x.cast("double") * wj),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket * 2 + F.when(d >= 0, 1).otherwise(0)
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    probe_radius: int = 1,
    planes: "Sequence[Sequence[float]] | None" = None,
) -> DataFrame:
    """Approximate top-k: only vectors whose sign-LSH bucket is within
    ``probe_radius`` Hamming bits of the query's bucket are scored
    (multi-probe LSH: the query's own bucket plus its near-miss
    neighbors, which is where boundary-straddling true neighbors land).
    Candidate fraction ≈ Σ_{r≤radius} C(n_planes, r) / 2^n_planes.

    With ``planes`` given (a literal ±1 matrix from plane_matrix), the
    bucket function is engine-independent — the DuckDB oracle
    reproduces it exactly; default (None) derives planes from
    plane_matrix(n_planes, dim of first row is unknown) — callers pass
    planes explicitly when they need cross-engine determinism, else
    the xxhash64-seeded sign_lsh_bucket is used."""
    q = _query_vec_col(query_vec)
    if planes is not None:
        bucket_of = lambda c: sign_lsh_bucket_literal(c, planes)  # noqa: E731
        n_bits = len(planes)
    else:
        bucket_of = lambda c: sign_lsh_bucket(c, n_planes)  # noqa: E731
        n_bits = n_planes
    bucketed = embeddings.withColumn("_bkt", bucket_of(F.col(vec_col)))
    # query bucket computed with the same expression over a 1-row
    # frame, then exploded into the probe set (Hamming ≤ radius)
    flips = [0] + [1 << i for i in range(n_bits)]
    if probe_radius >= 2:
        flips += [
            (1 << i) | (1 << j)
            for i in range(n_bits)
            for j in range(i + 1, n_bits)
        ]
    qrow = (
        embeddings.sparkSession.range(1)
        .select(bucket_of(q.cast("array<double>")).alias("_qb"))
        .select(
            F.explode(
                F.array(*[
                    F.col("_qb").bitwiseXOR(F.lit(m).cast("long"))
                    for m in flips
                ])
            ).alias("_bkt")
        )
        .distinct()
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
    # cell = vec_id mod n: any deterministic partition works as a
    # coarse quantizer, and the modulus (unlike a seeded hash) is
    # reproducible by any SQL engine — the DuckDB oracle recomputes
    # the identical codebook. Sequential ids also balance perfectly.
    cells = embeddings.select(
        (F.pmod(F.col(id_col), F.lit(n_centroids))).cast("int").alias("centroid_id"),
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
    codebook — it is dimension-table-sized by construction).

    The arg-max is a ``max_by`` aggregate, not a window: the broadcast
    cross join keeps all C scored rows of a vector in one partition,
    so partial aggregation collapses them map-side and the exchange
    carries one row per vector — a window over the N×C scored rows
    would shuffle the whole cross-join output (the bounded-vs-unbounded
    exchange difference at 100-TB vector counts)."""
    joined = embeddings.crossJoin(F.broadcast(centroids)).withColumn(
        "_sim", cosine_similarity(F.col(vec_col), F.col("centroid"))
    )
    # max of (sim, -centroid_id) = highest similarity, ties to the
    # lowest centroid id (same order the old window used)
    return (
        joined.groupBy(id_col)
        .agg(
            F.max_by(
                F.col("centroid_id"),
                F.struct(F.col("_sim").alias("s"),
                         (-F.col("centroid_id")).alias("c")),
            ).alias("centroid_id"),
            F.first(vec_col).alias(vec_col),
        )
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
        .orderBy(F.desc("_csim"), F.col("centroid_id"))
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
