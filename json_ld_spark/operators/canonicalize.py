"""Blocking-based canonicalization: minhash candidate blocking +
connected components via iterative DataFrame joins + merge-map relabel.

North-rule operators (BASELINE.json): IRI/blank-node merging at scale.
No reference analog (SURVEY §2.12) — the reference is single-document;
cross-document identity resolution is what a 10^12-turn corpus adds.

Scale design:
  - minhash signatures are pure JVM column expressions (xxhash64 per
    seed + array_min) — no Python, fully codegen'd.
  - banding turns O(n²) similarity into per-bucket self-joins; bucket
    sizes are bounded by construction (cap + salt guard below).
  - connected components = alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    converges in O(log n) rounds; each round is two shuffles and is
    checkpointed (localCheckpoint) to cut the lineage chain, which is
    mandatory for iterative plans (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def char_shingles(col, n: int = 3, pre_lowered: bool = False):
    """Character n-gram shingle array (JVM-side).

    pre_lowered=True means ``col`` is ALREADY a lowercased column
    reference staged in its own projection. That matters a lot:
    higher-order functions are interpreted with no CSE, so a lower()
    captured in the lambda closure re-evaluates (and re-copies the
    string) once per shingle ELEMENT — staging it first measured 2.5×
    faster on the shingle stage. Shingle values are identical."""
    lowered = col if pre_lowered else F.lower(col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.length(lowered) - n, F.lit(0))),
        lambda i: lowered.substr(i + 1, F.lit(n)),
    )


def _seeded_hash(seed: int):
    # one-arg closure: a two-arg lambda would make Spark pass the array
    # index as the second argument, silently overriding the seed
    return lambda s: F.xxhash64(s, F.lit(seed))


MINHASH_PRIME = 2147483647  # 2^31 - 1: (a*h + b) % P stays in 62 bits


def minhash_affine(num_hashes: int = 32, seed: int = 12345):
    """(A, B, P) coefficients for the affine universal-hash family
    h_i(x) = (a_i * x + b_i) mod P over a shared md5-derived base
    hash. Seeded-deterministic so ANY engine (DuckDB included) can
    reproduce the signatures from the same constants — the basis for
    the fully-oracled minhash driver query."""
    import random

    rnd = random.Random(seed)
    A = [rnd.randrange(1, MINHASH_PRIME) for _ in range(num_hashes)]
    B = [rnd.randrange(0, MINHASH_PRIME) for _ in range(num_hashes)]
    return A, B, MINHASH_PRIME


def hashed_shingle_sets(
    df: DataFrame, id_col: str, text_col: str, shingle: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(_id, _sh: array<long>): distinct hashed shingle sets,
    materialized once — the shared input for BOTH minhash signatures
    and exact-Jaccard verification (avoids computing the shingle
    array twice per document). hash_family "md5" uses the
    cross-engine md5-prefix hash (see dedup.md5_hash60)."""
    if hash_family == "md5":
        from json_ld_spark.operators.dedup import md5_hash60

        hf = md5_hash60
    else:
        hf = lambda s: F.xxhash64(s)  # noqa: E731 (varargs fn can't be a HOF callback)
    # Layout + form, A/B-measured at sf1 (50k docs, 32 cores):
    # a compact parquet corpus scans as 1-2 splits, and whatever runs
    # before the first shuffle inherits that — the starved HOF form
    # cost the full pipeline +15 s. Of the two fixes, rebalancing the
    # (id, lowered-text) rows FIRST and keeping the zero-shuffle HOF
    # shingle pass wins by 15×: 1.2 s / 1.5 s (xxh / md5) vs 18.2 /
    # 26.9 s for exploding shingles into a collect_set aggregation —
    # the text rebalance ships ~1× the corpus bytes once, while the
    # exploded form shuffles shingle-count × 8-byte hashes (≈8× the
    # corpus) into hash-set merges. The repartition is skipped when
    # the scan already has enough splits (the real-cluster case).
    from json_ld_spark.plans.layout import rebalance_scan

    staged = rebalance_scan(df.select(
        F.col(id_col).alias("_id"), F.lower(F.col(text_col)).alias("_lt")
    ))
    return staged.select(
        "_id",
        F.array_distinct(
            F.transform(
                char_shingles(F.col("_lt"), shingle, pre_lowered=True), hf
            )
        ).alias("_sh"),
    ).localCheckpoint()


def minhash_signature(shingles_col, num_hashes: int = 32, affine=None):
    """Array of minhash values, one per hash function.

    Single traversal: one aggregate whose accumulator holds all
    ``num_hashes`` running minima (~35% faster than ``num_hashes``
    separate interpreted array_min(transform(...)) passes).

    Default family: xxhash64(shingle, seed_i) — fastest, JVM-only.
    With ``affine`` = (A, B, P) from minhash_affine: h_i =
    (a_i * (base % P) + b_i) % P over the md5-base shingle hashes —
    bit-identical in any SQL engine."""
    if affine is not None:
        A, B, P = affine
        ab = F.array(*[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in zip(A, B)
        ])
        return F.aggregate(
            shingles_col,
            F.array_repeat(F.lit(P).cast("long"), num_hashes),
            lambda acc, h: F.zip_with(
                acc, ab,
                lambda ac, s: F.least(ac, (s["a"] * (h % P) + s["b"]) % P),
            ),
        )
    seeds = F.array(*[F.lit(i).cast("long") for i in range(num_hashes)])
    max_long = (1 << 63) - 1
    return F.aggregate(
        shingles_col,
        F.array_repeat(F.lit(max_long).cast("long"), num_hashes),
        lambda acc, s: F.zip_with(
            acc, seeds, lambda a, seed: F.least(a, F.xxhash64(s, seed))
        ),
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 3,
    max_bucket: int = 64,
    shingle_sets: "DataFrame | None" = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id_a, id_b) candidate pairs whose minhash bands collide.

    rows per band-bucket are capped at ``max_bucket`` (hot buckets —
    e.g. empty strings — would otherwise explode quadratically; the
    cap is a skew guard, logged by callers that need exactness).

    hash_family "md5": md5-base + affine signatures and md5-string
    band buckets — every stage reproducible by the SQL oracle.
    """
    rows_per_band = num_hashes // bands
    # stage the shingle array in its own projection: higher-order
    # functions are interpreted (no codegen CSE), so inlining the
    # shingle expression into the signature aggregate would recompute
    # it per accumulator update
    if shingle_sets is None:
        shingle_sets = hashed_shingle_sets(
            df, id_col, text_col, shingle, hash_family=hash_family
        )
    affine = minhash_affine(num_hashes) if hash_family == "md5" else None
    sig = shingle_sets.select(
        "_id",
        minhash_signature(F.col("_sh"), num_hashes, affine=affine).alias("_sig"),
    )
    if hash_family == "md5":
        def band_bucket(i: int):
            return F.md5(F.concat_ws(
                "-",
                F.lit(str(i)),
                *[F.element_at("_sig", i * rows_per_band + j + 1).cast("string")
                  for j in range(rows_per_band)],
            ))
    else:
        def band_bucket(i: int):
            return F.xxhash64(
                *[F.element_at("_sig", i * rows_per_band + j + 1)
                  for j in range(rows_per_band)],
                F.lit(1000 + i),
            )
    banded = sig.select(
        "_id",
        F.posexplode(
            F.array(*[band_bucket(i) for i in range(bands)])
        ).alias("_band", "_bucket"),
    )
    # bound bucket size (skew guard)
    w_bucket = F.row_number().over(
        Window.partitionBy("_band", "_bucket").orderBy("_id")
    )
    banded = banded.withColumn("_rn", w_bucket).filter(F.col("_rn") <= max_bucket)
    # materialize before the self-join: the minhash signature pipeline
    # would otherwise be computed once per join side
    banded = banded.localCheckpoint()
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates()
    )
    # materialize: downstream verify + connected-components each
    # consume the pairs; without this the banded self-join re-runs per
    # consumer (pairs are two longs per row — cheap to hold)
    return pairs.localCheckpoint()


def jaccard_filter(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    shingle: int = 3,
    shingle_sets: "DataFrame | None" = None,
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard (join back
    the shingle sets, JVM array intersect/union).

    Shingles are 64-bit hashes, not strings: the pair join shuffles two
    shingle arrays per candidate, so 8-byte longs cut shuffle bytes ~3x
    and intersect/union compares longs (collision probability over a
    few hundred shingles is ~1e-14 — immaterial for dedup)."""
    if shingle_sets is None:
        shingle_sets = hashed_shingle_sets(df, id_col, text_col, shingle)
    # stage set sizes once per document; per pair compute ONLY the
    # intersection — |A∪B| = |A|+|B|−|A∩B| for distinct sets, so the
    # array_union pass (the other half of the per-pair CPU on a dense
    # candidate graph) is pure arithmetic. Same value bit-for-bit.
    sh = shingle_sets.select(
        F.col("_id").alias("_jid"), "_sh", F.size("_sh").alias("_n")
    )
    inter = F.size(F.array_intersect("_sa", "_sb"))
    out = (
        pairs.join(
            sh.select(F.col("_jid").alias("id_a"), F.col("_sh").alias("_sa"),
                      F.col("_n").alias("_na")),
            "id_a",
        )
        .join(
            sh.select(F.col("_jid").alias("id_b"), F.col("_sh").alias("_sb"),
                      F.col("_n").alias("_nb")),
            "id_b",
        )
        .withColumn("_i", inter)
        .withColumn(
            "jaccard", F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
    stats: "dict | None" = None,
    checkpoint_dir: "str | None" = None,
) -> DataFrame:
    """(id, component) with component = min id in the component.

    True alternating large-star/small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond") — O(log n) rounds on deep
    graphs, where plain min-label propagation needs O(diameter) rounds
    (a chain-shaped component — templated spam runs — would cost dozens
    of shuffle rounds at corpus scale).

      large-star(u): hook every neighbor v > u onto
                     m(u) = min(Γ(u) ∪ {u});
      small-star(u): orient edges toward the smaller end, hook
                     Γ≤(u) ∪ {u} onto min(Γ≤(u) ∪ {u}).

    Convergence is detected from a (count, hash-sum) checksum computed
    on the just-checkpointed edge set — no old-vs-new label join; the
    checkpoint is the only materialization per round and the checksum
    agg reads its cached partitions. At fixpoint the edge set is a star
    forest (child → min-id root), which IS the component labeling.

    ``checkpoint_dir``: when set, per-round materialization uses the
    RELIABLE checkpoint (survives executor loss — mandatory for
    hours-long CC on a real cluster; see plans/checkpoints.py for the
    trade). Default localCheckpoint is correct on local[N].
    """
    from json_ld_spark.plans.checkpoints import cut_lineage

    e = cut_lineage(  # evaluate the upstream edge pipeline once
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(),
        checkpoint_dir,
    )
    prev: "tuple | None" = None
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star: all arcs u→v, m(u) = least(u, min neighbor)
        arcs = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = (
            arcs.groupBy("a")
            .agg(F.min("b").alias("_mb"))
            .select("a", F.least("a", "_mb").alias("m"))
        )
        ls = (
            arcs.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        # small-star over the large-star output
        oriented = ls.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        ).dropDuplicates()
        mins2 = oriented.groupBy("a").agg(F.min("b").alias("m"))
        ss = (
            oriented.join(mins2, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(mins2.select(F.col("a"), F.col("m").alias("b")))
        )
        # lazy checkpoint: the checksum agg below is the action that
        # materializes it — one blocking job per round, not two
        e = cut_lineage(
            ss.filter(F.col("a") != F.col("b")).dropDuplicates(),
            checkpoint_dir,
            eager=False,
        )
        # bit_xor, not sum: order-independent and cannot overflow
        # (ANSI mode would throw on a long-sum of 2^63-range hashes)
        row = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        if sig == prev:
            break
        prev = sig
    if stats is not None:
        stats["rounds"] = rounds
    # fixpoint edge set = star forest: (child, root) plus the roots
    return e.select(F.col("a").alias("id"), F.col("b").alias("component")).union(
        e.select("b", "b").distinct()
    )


def build_merge_map(components: DataFrame) -> DataFrame:
    """(from_id, to_id) for every id whose canonical component head
    differs — the relabel dimension table (broadcast at apply time)."""
    return components.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("from_id"), F.col("component").alias("to_id")
    )


def apply_merge_map(
    triples: DataFrame, merge_map: DataFrame, cols: tuple[str, ...] = ("subj", "obj_value")
) -> DataFrame:
    """Relabel merged IRIs/bnodes in the triples table via broadcast
    left joins (merge maps are dimension-sized: entities ≪ triples).

    When the frame carries an ``obj_is_iri`` column, the object column
    is only relabeled on IRI/bnode rows — a LITERAL whose text happens
    to equal a merged IRI (e.g. a turn quoting an entity URL) must
    keep its text; only term identity merges."""
    has_iri_flag = "obj_is_iri" in triples.columns
    out = triples
    for i, c in enumerate(cols):
        mm = F.broadcast(
            merge_map.select(
                F.col("from_id").alias(f"_from_{i}"), F.col("to_id").alias(f"_to_{i}")
            )
        )
        join_cond = F.col(c) == F.col(f"_from_{i}")
        if c == "obj_value" and has_iri_flag:
            join_cond = join_cond & F.col("obj_is_iri")
        out = (
            out.join(mm, join_cond, "left")
            .withColumn(c, F.coalesce(F.col(f"_to_{i}"), F.col(c)))
            .drop(f"_from_{i}", f"_to_{i}")
        )
    return out
