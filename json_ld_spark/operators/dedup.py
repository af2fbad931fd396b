"""Deduplication operators for training-data pipelines:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale notes:
  - exact dedup is a hash-groupBy with map-side combine (one shuffle
    on the md5 of the normalized text, never on the text itself — at
    100 TB shuffling full text bodies is the classic mistake).
  - minhash/simhash signatures are JVM column expressions; candidate
    generation shuffles only (id, band_hash) pairs.
  - embedding near-dup uses label/sign-LSH blocking so the pair join
    is per-bucket, never the full cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from json_ld_spark.functions.columns import cosine_similarity
from json_ld_spark.operators.canonicalize import (
    connected_components,
    jaccard_filter,
    minhash_candidate_pairs,
)
from json_ld_spark.operators.textstats import fingerprint_md5


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(fingerprint, n_dups, keep_id): one row per distinct normalized
    text; keep_id = min id (the canonical representative)."""
    return (
        docs.select(
            F.col(id_col).alias("id"), fingerprint_md5(F.col(text_col)).alias("fp")
        )
        .groupBy("fp")
        .agg(F.count("*").alias("n_dups"), F.min("id").alias("keep_id"))
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Documents minus exact (normalized) duplicates — keeps min-id."""
    w = Window.partitionBy(fingerprint_md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup_keep_best(
    docs: DataFrame,
    score_col,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact dedup keeping the BEST row per duplicate group — max
    ``score_col`` (a Column expression, e.g. textstats.quality_score),
    ties broken by min id. This is the keep policy a training pipeline
    actually wants: the cleanest copy of each duplicated document, not
    the lowest id. Same single shuffle as exact_dedup (the fingerprint
    partition); the score is a JVM expression evaluated pre-shuffle."""
    from json_ld_spark.plans.layout import rebalance_scan

    w = Window.partitionBy(fingerprint_md5(F.col(text_col))).orderBy(
        F.desc("_score"), F.col(id_col)
    )
    # the score expression (quality stats over the text) evaluates
    # BEFORE the window exchange — rebalance so it is not pinned to a
    # compact scan's splits (plans/layout.py; no-op on real scans)
    return (
        rebalance_scan(docs).withColumn("_score", score_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_score")
    )


def minhash_dedup_components(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    hash_family: str = "xxhash64",
    checkpoint_dir: "str | None" = None,
) -> DataFrame:
    """(id, component): near-duplicate clusters via MinHash blocking →
    Jaccard verify → connected components. Singletons omitted.
    hash_family "md5" = the cross-engine family (full SQL oracle).
    ``checkpoint_dir``: reliable per-round checkpoints for the CC
    iterations (pass it on a real cluster — hours-long CC must survive
    executor loss; see plans/checkpoints.py)."""
    from json_ld_spark.operators.canonicalize import hashed_shingle_sets

    # one shingle pass feeds both blocking and verification
    sets_ = hashed_shingle_sets(docs, id_col, text_col, hash_family=hash_family)
    pairs = minhash_candidate_pairs(
        docs, id_col, text_col, num_hashes, bands, shingle_sets=sets_,
        hash_family=hash_family,
    )
    verified = jaccard_filter(
        pairs, docs, id_col, text_col, threshold, shingle_sets=sets_
    )
    return connected_components(
        verified.select("id_a", "id_b"), checkpoint_dir=checkpoint_dir
    )


def md5_hash60(col):
    """60-bit hash from the md5 hex prefix: the cross-engine hash
    family. Any SQL engine with md5 reproduces it —
    DuckDB: CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT) —
    which is what makes simhash/minhash driver queries fully
    oracle-checkable instead of rows-only. xxhash64 stays the default
    production family (≈3× cheaper); the algorithms are identical."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash_sig(text_col, shingle: int = 4, n_bits: int = 64, hash_fn=None,
                pre_lowered: bool = False):
    """n_bits-wide SimHash over character shingles, as ONE JVM
    aggregate: the accumulator is an array of n_bits vote counters
    updated per shingle hash (a single expression tree — 64 separate
    aggregates made codegen explode and cost seconds of compile per
    query). hash_fn maps a shingle column to a long (default
    xxhash64; md5_hash60 with n_bits=60 for the cross-engine family).
    pre_lowered: ``text_col`` is an already-lowercased staged column —
    interpreted HOFs re-evaluate a captured lower() per element
    (see char_shingles), so callers stage it.
    """
    lowered = text_col if pre_lowered else F.lower(text_col)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(lowered) - (shingle - 1), F.lit(1))),
        lambda i: lowered.substr(i, F.lit(shingle)),
    )
    hashes = F.transform(shingles, hash_fn or (lambda s: F.xxhash64(s)))
    # per-bit masks as a literal array (bit 63 = the sign bit as a
    # signed long); shift functions require literal bit counts, masks
    # don't
    masks = F.array(
        *[
            F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
            for b in range(n_bits)
        ]
    )
    votes = F.aggregate(
        hashes,
        F.transform(masks, lambda m: F.lit(0)),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    # fold positive-vote bits into a bigint: sum of masks where the
    # vote is positive (the sign-bit mask contributes negatively,
    # which IS its two's-complement value)
    return F.aggregate(
        F.zip_with(
            votes,
            masks,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash64(text_col, shingle: int = 4):
    """64-bit SimHash, xxhash64 family (the production default)."""
    return simhash_sig(text_col, shingle=shingle, n_bits=64)


def simhash_sig_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 4,
    n_bits: int = 64,
    hash_fn=None,
) -> DataFrame:
    """(_id, _sh): SimHash signatures as an EXPLODED-ROWS aggregation —
    the corpus-scale form of simhash_sig.

    The expression form (simhash_sig) folds an interpreted HOF
    accumulator over every shingle: ~n_bits interpreted lambda ops per
    shingle, measured 68 s for 50k docs at sf1 — it was the dominant
    term of the whole simhash query. This form stays inside
    whole-stage codegen: explode shingles to rows, hash per row, and
    take 32 PACKED bit-count sums per document (two 32-bit lanes per
    long: lane b counts bit b, its high lane counts bit b+32 — lanes
    cannot carry into each other below 2^31 shingles/doc). One
    map-side-combined shuffle on the id; same signature bit-for-bit
    (sig bit b = ones_b·2 > n, identical to the ±1 vote sign).
    Measured 68 s → ~2 s on the same corpus."""
    lane = 0x0000000100000001
    h_fn = hash_fn or (lambda s: F.xxhash64(s))
    from json_ld_spark.plans.layout import rebalance_scan

    # scan-granularity guard: the exploded hash + packed-lane partial
    # sums run BEFORE the groupBy shuffle, i.e. on the scan's
    # partitioning (plans/layout.py)
    staged = rebalance_scan(docs.select(
        F.col(id_col).alias("_id"), F.lower(F.col(text_col)).alias("_lt")
    ))
    rows = staged.select(
        "_id",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.length("_lt") - (shingle - 1), F.lit(1))
            )
        ).alias("_i"),
        "_lt",
    ).select(
        "_id", h_fn(F.col("_lt").substr(F.col("_i"), F.lit(shingle))).alias("_h")
    )
    lanes = rows.groupBy("_id").agg(
        F.count("*").alias("_n"),
        *[
            F.sum(F.shiftright("_h", b).bitwiseAND(F.lit(lane))).alias(f"_s{b}")
            for b in range(32)
        ],
    )

    def ones(b: int):
        s = F.col(f"_s{b & 31}")
        if b >= 32:
            s = F.shiftrightunsigned(s, 32)
        return s.bitwiseAND(F.lit(0xFFFFFFFF))

    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        m = (1 << b) if b < 63 else -(1 << 63)
        sig = sig + F.when(
            ones(b) * 2 > F.col("_n"), F.lit(m).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return lanes.select("_id", sig.alias("_sh"))


def simhash_neardup_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    block_bits: int = 16, hash_family: str = "xxhash64",
    max_bucket: int = 64,
) -> DataFrame:
    """Candidate pairs whose SimHash agrees on at least one block
    (standard Hamming-LSH banding: 4 blocks of signature bits).

    hash_family "md5" switches to the 60-bit md5-prefix family
    (md5_hash60) with 4×15-bit blocks — same algorithm, reproducible
    by the DuckDB oracle bit-for-bit.

    ``max_bucket`` caps rows per (block, key) bucket — the same skew
    guard minhash_candidate_pairs uses. A cluster of k near-identical
    documents lands k rows in the same block-bucket and k² candidate
    pairs; at corpus scale that is THE scale killer (the r4 sf1 sweep
    measured 11.5× growth at 10× rows from exactly this). The cap is
    deterministic (row_number by id), so the SQL oracle replays it;
    pairs inside an over-full bucket beyond the cap are dropped — by
    construction those are near-identical clusters that exact /
    minhash dedup already collapses."""
    if hash_family == "md5":
        n_bits, block_bits = 60, 15
        sig = simhash_sig_table(
            docs, id_col, text_col, n_bits=n_bits, hash_fn=md5_hash60
        )
    else:
        n_bits = 64
        sig = simhash_sig_table(docs, id_col, text_col)
    # materialize the signature BEFORE posexplode: generator inputs
    # are inlined through collapsed projections, so exploding over
    # expressions of _sh would re-evaluate the signature per
    # generated row
    sig = sig.localCheckpoint()
    mask = (1 << block_bits) - 1
    blocked = sig.select(
        "_id",
        "_sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("_sh", i * block_bits).bitwiseAND(F.lit(mask))
                    for i in range(n_bits // block_bits)
                ]
            )
        ).alias("_blk", "_key"),
    )
    # bound bucket size (skew guard, deterministic: keep the
    # max_bucket smallest ids per block-bucket)
    w_bucket = F.row_number().over(
        Window.partitionBy("_blk", "_key").orderBy("_id")
    )
    blocked = (
        blocked.withColumn("_rn", w_bucket)
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
    )
    # materialize: the self-join would otherwise re-run the explode +
    # cap window once per side
    blocked = blocked.localCheckpoint()
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a._key") == F.col("b._key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._sh").bitwiseXOR(F.col("b._sh"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    n_bands: int = 4,
) -> DataFrame:
    """Exact word-n-gram Jaccard over blocked candidates (block = the
    ``n_bands`` SMALLEST n-gram md5s — a bottom-k sketch; two docs are
    candidates iff they share at least one of their bottom-k gram
    hashes; deterministic, so the SQL oracle reproduces it verbatim).

    Recall: a single min-gram band (n_bands=1) finds a pair with
    probability ≈ its Jaccard — ~50% at the threshold, useless. With
    bottom-k banding the miss probability decays geometrically
    (~(1−J)^k): measured ≥0.9 recall at J≥0.4 with the default 4
    bands (tests/test_operators.py recall gate). Candidate pairs are
    id-only through the band self-join (100 TB rule: gram arrays
    never ride the block shuffle); grams re-join by id for the exact
    verify, the same shape as the minhash verify step."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    # stage the word array in its own projection: the gram lambda
    # below references it per ELEMENT, and interpreted HOFs have no
    # CSE — capturing the split(regexp(lower)) tree in the closure
    # would re-run it once per gram
    words = F.col("_words")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )
    from json_ld_spark.plans.layout import rebalance_scan

    # staged projections: words once, then grams once; `_blk` derives
    # from the gram alias so nothing expensive evaluates twice per row.
    # Rebalanced first: gram construction is the heavy per-row stage
    # and must not run at a compact scan's 1-2 splits (plans/layout.py)
    g = rebalance_scan(docs.select(
        F.col(id_col).alias("_id"), F.split(norm, " ").alias("_words")
    )).select(F.col("_id"), grams.alias("_grams")).select(
        "_id",
        "_grams",
        F.size("_grams").alias("_n"),
        F.slice(
            F.array_sort(F.transform("_grams", lambda s: F.md5(s))),
            1, n_bands,
        ).alias("_bands"),
    )
    # materialize before the self-join: otherwise the (expensive,
    # interpreted) gram computation runs once per join side
    g = g.localCheckpoint()
    bands = g.select("_id", F.explode("_bands").alias("_blk"))
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .dropDuplicates()
    )
    ga = g.select(
        F.col("_id").alias("id_a"),
        F.col("_grams").alias("_gram_a"),
        F.col("_n").alias("_n_a"),
    )
    gb = g.select(
        F.col("_id").alias("id_b"),
        F.col("_grams").alias("_gram_b"),
        F.col("_n").alias("_n_b"),
    )
    # |A∪B| = |A|+|B|−|A∩B| (distinct arrays): only the intersection
    # is computed per pair; union is arithmetic — same value exactly
    inter = F.size(F.array_intersect("_gram_a", "_gram_b"))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("_i"),
            (F.col("_n_a") + F.col("_n_b")).alias("_nn"),
        )
        .select(
            "id_a", "id_b",
            (F.col("_i") / (F.col("_nn") - F.col("_i"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.9,
) -> DataFrame:
    """Near-duplicate vectors by cosine within blocking buckets.

    ``block_col`` is the bucket (a cluster/label column when present;
    sign-LSH via ``sign_lsh_bucket`` otherwise) — the join is
    per-bucket, so cost is Σ bucket² not N²."""
    from json_ld_spark.functions.columns import dot, l2_norm

    from json_ld_spark.plans.layout import rebalance_scan

    # per-vector norms staged BEFORE the pair join: cosine then costs
    # one aggregate per pair (the dot product) instead of three —
    # Σ bucket² pairs each re-deriving both norms was 2/3 of the CPU.
    # Identical IEEE result: same operands, same order, sqrt hoisted.
    # Rebalanced so the staging (and the join probe build) is not
    # pinned to a compact scan's splits (plans/layout.py).
    e = rebalance_scan(embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        F.col(block_col).alias("_b"),
    )).withColumn("_norm", l2_norm(F.col("_v"))).localCheckpoint()
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, (F.col("a._b") == F.col("b._b")) & (F.col("a._id") < F.col("b._id")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(
                dot(F.col("a._v"), F.col("b._v"))
                / (F.col("a._norm") * F.col("b._norm")),
                4,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def neardup_lsh_config(
    n_vectors: int,
    target_bucket: int = 8,
    recall: float = 0.9,
    p_agree: float = 0.86,
    min_planes: int = 6,
    max_planes: int = 16,
) -> "tuple[int, int]":
    """(planes_per_band, n_bands) for banded sign-LSH near-dup
    blocking, sized to the corpus.

    The r4 design had a CONSTANT bucket count (2^6–2^8), so the
    per-bucket self-join cost Σ bucket² = O(N²/2^planes) — measured
    29.8×/38.5× growth at 10× rows in the sf1 sweep. Fix: bucket
    count scales with N (planes ≈ log2(N / target_bucket), so mean
    occupancy stays ~target_bucket and Σ bucket² stays O(N)), and the
    band count keeps recall: a pair at the design similarity (cosine
    0.9 → per-plane sign-agreement p = 1 − θ/π ≈ 0.86) collides in
    one band w.p. p^planes, so bands = ⌈ln(1−recall)/ln(1−p^planes)⌉
    restores ≥``recall`` end-to-end (measured 0.9 on the planted
    positives at sf0.01 AND sf0.1 — tests/test_operators.py).

    max_planes=16 bounds the AND-width (beyond it the band count for
    fixed recall explodes ~1/p^planes); past 2^16 buckets the
    per-bucket row cap in embedding_neardup_pairs_banded takes over
    as the scale bound, keeping candidates ≤ cap·N·bands — linear."""
    import math

    planes = min(
        max_planes,
        max(min_planes, math.ceil(math.log2(max(n_vectors, 2) / target_bucket))),
    )
    collide = p_agree ** planes
    bands = max(1, math.ceil(math.log(1.0 - recall) / math.log(1.0 - collide)))
    return planes, bands


def neardup_lsh_planes(
    planes_per_band: int, n_bands: int, dim: int, seed0: int = 100
) -> "list[list[list[float]]]":
    """One deterministic literal ±1 plane matrix per band (seeds
    seed0, seed0+1, …) — data-independent constants, reproducible by
    any engine (similarity.plane_matrix)."""
    from json_ld_spark.operators.similarity import plane_matrix

    return [
        plane_matrix(planes_per_band, dim, seed=seed0 + b)
        for b in range(n_bands)
    ]


def embedding_neardup_pairs_banded(
    embeddings: DataFrame,
    planes_bands: "list[list[list[float]]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_bucket: int = 64,
) -> DataFrame:
    """(id_a, id_b, cosine): near-duplicate vectors via multi-band
    sign-LSH blocking — the label-free path that holds at corpus
    scale. ``planes_bands`` is one literal plane matrix per band
    (neardup_lsh_planes, sized by neardup_lsh_config).

    Plan shape (all JVM expressions, no Python):
      1. one projection computes every band's bucket id per vector
         (posexplode of the per-band bucket array — vectors are read
         once);
      2. per-(band, bucket) row cap (row_number by id, deterministic,
         oracle-replayable) bounds hot buckets: candidates are
         ≤ max_bucket · N · bands — linear in N;
      3. the self-join is per (band, bucket) on an id-only relation
         (vectors never ride the candidate shuffle);
      4. distinct pairs re-join the staged (vector, norm) relation for
         ONE cosine evaluation per pair."""
    from json_ld_spark.functions.columns import dot, l2_norm
    from json_ld_spark.operators.similarity import sign_lsh_bucket_literal

    from json_ld_spark.plans.layout import rebalance_scan

    # scan-granularity guard: the bucket computation (bands × planes
    # × dim flops per vector) is the dominant cost and must not run
    # at a compact scan's 1-2 splits (plans/layout.py)
    e = rebalance_scan(embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )).withColumn("_norm", l2_norm(F.col("_v"))).localCheckpoint()
    vecs = F.col("_v").cast("array<double>")
    banded = e.select(
        "_id",
        F.posexplode(
            F.array(*[
                sign_lsh_bucket_literal(vecs, planes)
                for planes in planes_bands
            ])
        ).alias("_band", "_bkt"),
    )
    w_bucket = F.row_number().over(
        Window.partitionBy("_band", "_bkt").orderBy("_id")
    )
    banded = (
        banded.withColumn("_rn", w_bucket)
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
        .localCheckpoint()  # bucket ids are the dominant cost; the
        # self-join must not recompute them per side
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bkt") == F.col("b._bkt"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates()
    )
    va = e.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
        F.col("_norm").alias("_na"),
    )
    vb = e.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
        F.col("_norm").alias("_nb"),
    )
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                4,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def sign_lsh_bucket(vec_col, n_planes: int = 8, seed: int = 7):
    """Random-hyperplane LSH bucket id from deterministic pseudo-planes:
    plane p's component j = sign derived from xxhash64(p, j). JVM-only."""
    def _plane_weight(p: int):
        # one-arg closure: a two-arg lambda would receive the array
        # index as its second argument, clobbering the plane id
        return lambda j: F.when(
            F.xxhash64(F.lit(p), j, F.lit(seed)) % 2 == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0))

    def plane_dot(p: int):
        return F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(F.sequence(F.lit(0), F.size(vec_col) - 1), _plane_weight(p)),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        bucket = bucket * 2 + F.when(plane_dot(p) >= 0, 1).otherwise(0)
    return bucket


def jaccard_prefix_join(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT similarity join via prefix filtering (the PPJoin family,
    Xiao et al., WWW 2008 — public knowledge): (id_a, id_b, jaccard)
    for every pair with word-set Jaccard ≥ ``threshold``. Unlike the
    minhash/simhash paths this is LOSSLESS — prefix filtering is a
    complete candidate generator: if |A∩B|/|A∪B| ≥ θ, A and B must
    share at least one token among each one's (|t| − ⌈θ·|t|⌉ + 1)
    RAREST tokens, so joining on prefix tokens misses nothing and
    the Jaccard verify only removes false positives.

    Scale design — no global token rank: documents sort their tokens
    by the (global_count, token) PAIR, so the rare-first order needs
    only the per-token count join (co-partitioned on token), never a
    single-task global row_number over the vocabulary. Prefix tokens
    are by construction the RAREST, so the candidate join key is
    skew-light — the frequent tokens that would create hot joins are
    exactly the ones prefix filtering excludes. One count shuffle,
    one doc-side groupBy, one id-pair join keyed on rare tokens, one
    verify join on token arrays.

    Cost honesty: the OUTPUT of an exact join is Θ(Σ cluster²) on a
    near-dup-clustered corpus — 2.97M verified pairs in 388 s at
    sf0.1 on the deliberately template-heavy synthetic corpus. That
    is inherent to exactness, not to this plan; at scale this
    operator's role is post-blocking verification (run it on minhash
    candidate clusters, not the raw corpus), so the bench suite
    deliberately measures the probabilistic paths and gates this one
    at oracle scale.
    """
    norm = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.filter(F.split(norm, "\\s+"), lambda w: w != "")
            )
        ).alias("w"),
    )
    cnt = tok.groupBy("w").agg(F.count("*").alias("c"))
    # per-doc token list in rare-first order (count, then token —
    # a total order, no global rank materialized anywhere)
    by_doc = (
        tok.join(cnt, "w")
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("c"), F.col("w")))
            ).alias("_tw")
        )
        .select(
            "id",
            F.transform(F.col("_tw"), lambda s: s["w"]).alias("toks"),
        )
    )
    n = F.size("toks")
    prefix_len = n - F.ceil(n * F.lit(threshold)).cast("int") + 1
    pref = by_doc.select(
        "id",
        "toks",
        F.explode(F.slice("toks", 1, prefix_len)).alias("p"),
    )
    # id-only candidate pairs on shared prefix tokens; the token
    # arrays rejoin for the verify so bodies never ride the pair join
    a = pref.select(F.col("id").alias("id_a"), F.col("p"))
    b = pref.select(F.col("id").alias("id_b"), F.col("p"))
    cand = (
        a.join(b, "p")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ta = by_doc.select(F.col("id").alias("id_a"), F.col("toks").alias("ta"))
    tb = by_doc.select(F.col("id").alias("id_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def semdedup(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) re-expressed
    relationally: semantic deduplication by k-means clustering plus
    intra-cluster cosine pruning. Every vector is assigned to its
    nearest trained centroid (``similarity.ivf_assign`` — broadcast
    codebook, map-side ``max_by`` argmax); within each cluster a
    vector is REMOVED when a lower-id cluster-mate sits inside its
    epsilon-ball (``round(cosine, 4) >= threshold``). Output: one row
    per vector — (vec_id, centroid_id, kept_by, removed) where
    kept_by is the lowest-id qualifying representative (NULL when the
    vector survives).

    Canonical-choice note: the paper keeps the vector FARTHEST from
    the centroid inside each epsilon-ball; this implementation keeps
    the lowest id, which is deterministic across engines and makes
    the whole prune oracle-checkable. Swap the min(id) aggregate for
    a ``min_by(id, -centroid_cosine)`` to get the paper's policy.

    Scale shape: the clustering exists precisely to bound the
    quadratic — the pair join is co-partitioned on centroid_id and
    never compares across clusters, so its cost is sum(cluster^2).
    That stays linear in N only when the codebook size grows with the
    corpus (k ~ N / target_cluster_size, trained on a sample as
    ``train_ivf_codebook`` documents); a fixed k at 100x the corpus
    re-creates the r4 sign-LSH blowup. The min(kept_by) aggregation
    is partial (map-side) on vec_id."""
    from json_ld_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    left = assigned.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        "centroid_id",
    )
    right = assigned.select(
        F.col(id_col).alias("_rid"),
        F.col(vec_col).alias("_rv"),
        "centroid_id",
    )
    keep = (
        left.join(right, "centroid_id")
        .filter(F.col("_rid") < F.col("_id"))
        .filter(
            F.round(cosine_similarity(F.col("_v"), F.col("_rv")), 4)
            >= threshold
        )
        .groupBy("_id")
        .agg(F.min("_rid").alias("kept_by"))
    )
    return (
        assigned.select(F.col(id_col), "centroid_id")
        .join(keep.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            "centroid_id",
            "kept_by",
            F.col("kept_by").isNotNull().cast("int").alias("removed"),
        )
    )


def exact_substring_spans(
    docs: DataFrame,
    n: int = 13,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document exact-substring detection (the ExactSubstr
    flavor of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499) re-expressed
    relationally: every word n-gram occurring in >= min_docs DISTINCT
    documents marks its n-word occurrence window, and per document
    the marked windows are merged into maximal spans (gaps-and-
    islands: a new span starts when the next hit is more than n words
    past the previous one). Output: one row per merged span —
    (doc_id, span_start, span_end, span_words), 1-based word
    positions, end exclusive — the byte ranges a span-cutting pass
    would remove.

    The suffix array of the original is replaced by shuffle-friendly
    relational stages: explode n-grams with position -> frequency
    count keyed on md5(gram) (a 32-hex key, so the two gram shuffles
    never carry up-to-n-word strings) -> co-partitioned tag join ->
    per-doc interval merge. The gram-frequency side is corpus-sized
    and unbounded like the TF-IDF dictionary: no forced broadcast,
    AQE chooses. The interval-merge window partitions by doc_id and
    is bounded by per-document hit counts, never corpus size.
    Within-document repetition is deliberately out of scope here
    (``repetition_stats`` covers it): a gram repeated only inside one
    document does not mark a span."""
    norm = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), "\\s+", " "
        )
    )
    words = F.when(
        F.length(norm) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(norm, " "))
    staged = docs.select(F.col(id_col), words.alias("_w"))
    grams_arr = F.when(
        F.size("_w") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_w") - (n - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("_w"), i, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = staged.select(
        F.col(id_col),
        F.posexplode(grams_arr).alias("_p0", "_key"),
    ).select(id_col, (F.col("_p0") + 1).cast("int").alias("pos"), "_key")
    dup = (
        occ.groupBy("_key")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_key")
    )
    hits = occ.join(dup, "_key").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    run = Window.partitionBy(id_col).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = hits.select(
        id_col,
        "pos",
        F.when(F.col("pos") - F.lag("pos").over(w) > n, F.lit(1))
        .otherwise(F.lit(0))
        .alias("_brk"),
    )
    isl = marked.select(
        id_col, "pos", F.sum("_brk").over(run).alias("_island")
    )
    return isl.groupBy(id_col, "_island").agg(
        F.min("pos").cast("int").alias("span_start"),
        (F.max("pos") + n).cast("int").alias("span_end"),
        (F.max("pos") + n - F.min("pos")).cast("int").alias("span_words"),
    ).drop("_island")
