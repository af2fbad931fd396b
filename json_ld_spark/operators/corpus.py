"""Corpus-preparation operators: chunking and deterministic sampling.

The ops every large-scale training-data pipeline runs between raw
documents and the tokenizer:

  - chunk_documents: split each document into fixed-size token windows
    with overlap (context-window packing / RAG prep). Pure JVM column
    expressions — split once, slice per window — no Python in the
    path, no shuffle at all (chunking is embarrassingly parallel).
  - deterministic_sample: keep a fraction of rows chosen by a hash of
    a key — reproducible across runs/engines/cluster sizes, unlike
    DataFrame.sample whose output depends on partitioning. Hash
    sampling is also STABLE under corpus growth: a kept key stays
    kept when new data arrives (the property incremental pipelines
    need).

Both have md5-family variants so the driver's DuckDB oracle recomputes
them bit-for-bit (same policy as the minhash/simhash families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): whitespace-token windows
    of ``chunk_tokens`` tokens advancing by ``chunk_tokens - overlap``.

    The last window may be short; a document shorter than one window
    yields exactly one chunk; empty/blank/NULL documents yield one
    empty chunk (callers filter if unwanted — silent row loss is
    worse). NULL text is coalesced to '' BEFORE the split: without
    that, size(NULL) = -1 in non-ANSI Spark would emit a phantom
    (NULL, -1) chunk while a SQL engine's generate_series over NULL
    emits no row — a silent engine divergence.
    Window starts are a ``sequence`` over the staged token array, so
    the token split runs once per document (HOFs have no CSE — the
    array must be staged, see pyspark pitfalls in canonicalize.py).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    trimmed = F.trim(
        F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), "\\s+", " ")
    )
    staged = docs.select(
        F.col(id_col).alias("id"),
        F.when(F.length(trimmed) == 0, F.array().cast("array<string>"))
        .otherwise(F.split(trimmed, " "))
        .alias("_toks"),
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.ceil((F.size("_toks") - F.lit(chunk_tokens)) / F.lit(stride))
            .cast("int"),
            F.lit(0),
        ),
    )
    return (
        staged.select(
            "id",
            "_toks",
            F.posexplode(starts).alias("chunk_idx", "_w"),
        )
        .select(
            "id",
            "chunk_idx",
            F.slice(
                F.col("_toks"), F.col("_w") * stride + 1, chunk_tokens
            ).alias("_window"),
        )
        .select(
            F.col("id").alias(id_col),
            "chunk_idx",
            F.array_join("_window", " ").alias("chunk_text"),
            F.size("_window").alias("n_tokens"),
        )
    )


def chunk_documents_bpe(
    docs: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): fixed-size windows of
    REAL BPE tokens (the vendored deterministic tokenizer in
    functions/bpe.py) — the training-pipeline chunker, budgeting in
    the unit the model trains on instead of the whitespace proxy.

    BPE is a segmentation, so ``chunk_text`` (the window's tokens
    concatenated) is an exact substring of the normalized document —
    no boundary loss, and the whole computation (tokenize + window)
    is a JVM column-expression chain with zero shuffle, replayed
    verbatim by the SQL oracle. Same edge policy as
    ``chunk_documents``: NULL/empty docs yield one empty chunk."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    from json_ld_spark.functions.bpe import bpe_tokens

    stride = chunk_tokens - overlap
    # pin CPU parallelism before the merge chain: a small parquet
    # corpus arrives as ONE input split, and the encode is ~1.3 ms of
    # JVM string work per document — without the explicit repartition
    # the whole chain runs on a single core (measured 6.3 s → 0.5 s
    # at sf0.1). Partition count tracks the session's parallelism, so
    # at real scale (many splits) this is a cheap id-hash shuffle that
    # also balances skewed file sizes.
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    staged = docs.repartition(n_parts, id_col).select(
        F.col(id_col).alias("id"),
        bpe_tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_toks"),
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.ceil((F.size("_toks") - F.lit(chunk_tokens)) / F.lit(stride))
            .cast("int"),
            F.lit(0),
        ),
    )
    return (
        staged.select(
            "id",
            "_toks",
            F.posexplode(starts).alias("chunk_idx", "_w"),
        )
        .select(
            "id",
            "chunk_idx",
            F.slice(
                F.col("_toks"), F.col("_w") * stride + 1, chunk_tokens
            ).alias("_window"),
        )
        .select(
            F.col("id").alias(id_col),
            "chunk_idx",
            F.array_join("_window", "").alias("chunk_text"),
            F.size("_window").alias("n_tokens"),
        )
    )


def pack_chunks(
    chunks: DataFrame,
    target_tokens: int = 256,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign chunks to fixed-token-budget training sequences
    ("packing" — the step between chunking and the tokenizer).

    Deterministic first-fit in (id, chunk_idx) order within each of
    ``n_buckets`` independent pack buckets (bucket = id mod n — the
    cross-engine partition, as in the IVF init): a running token total
    per bucket, pack_id = floor(exclusive_prefix / target). A chunk
    whose tokens straddle the budget spills into its pack (standard
    greedy semantics — packs can slightly overflow, never underfill
    out of order).

    Buckets pack independently and in parallel — the window
    partitions on the bucket, so at corpus scale no single ordering
    bottleneck exists; more buckets = more parallelism and slightly
    more padding waste at the tail of each bucket.

    Non-numeric ids bucket via xxhash64 (same guard as
    build_ivf_centroids): pmod over a silent string→number NULL cast
    in non-ANSI mode would otherwise collapse every row into one NULL
    bucket — one straggler task doing all the packing."""
    from pyspark.sql import Window
    from pyspark.sql.types import NumericType

    if isinstance(chunks.schema[id_col].dataType, NumericType):
        bucket = F.pmod(F.col(id_col), F.lit(n_buckets)).cast("int")
    else:
        bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int")
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(F.col(id_col), F.col(idx_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        chunks.withColumn("pack_bucket", bucket)
        .withColumn("_cum", F.sum(tokens_col).over(w))
        .select(
            "pack_bucket",
            id_col,
            idx_col,
            tokens_col,
            F.floor((F.col("_cum") - F.col(tokens_col)) / target_tokens)
            .cast("int")
            .alias("pack_id"),
        )
    )


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    seed: int = 7,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Rows whose key hashes under ``fraction`` — reproducible sampling
    that is independent of partitioning and stable under appends.

    hash_family "md5" uses the cross-engine md5-prefix bucket
    (dedup.md5_hash60 mod 1e6) so a SQL oracle reproduces the exact
    row set; xxhash64 is the production default."""
    denom = 1_000_000
    thresh = int(fraction * denom)
    if hash_family == "md5":
        from json_ld_spark.operators.dedup import md5_hash60

        bucket = F.pmod(
            md5_hash60(F.concat(F.col(key_col).cast("string"),
                                F.lit(f"-{seed}"))),
            F.lit(denom),
        )
    else:
        bucket = F.pmod(
            F.xxhash64(F.col(key_col).cast("string"), F.lit(seed)),
            F.lit(denom),
        )
    return df.filter(bucket < thresh)


def stratified_sample(
    df: DataFrame,
    rates: "dict[str, float]",
    strata_col: str,
    key_col: str,
    default_rate: float = 0.0,
    seed: int = 7,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic sampling — the domain-mixing step of
    a training-data pipeline (keep 100% of books, 10% of common-crawl,
    0% of spam), with the same partition-independent, append-stable
    hash rule as ``deterministic_sample``: a row's fate depends only
    on (key, seed), so re-running over a grown corpus never flips
    previously-kept rows.

    ``rates`` maps stratum value → keep fraction; unlisted strata
    (and NULL) fall back to ``default_rate``. The rate lookup is a
    literal CASE chain — strata vocabularies (domains, languages,
    source tags) are small by construction, so this stays a pure JVM
    row-expression: zero shuffle, zero join, full pushdown through
    the parquet scan."""
    denom = 1_000_000
    if hash_family == "md5":
        from json_ld_spark.operators.dedup import md5_hash60

        bucket = F.pmod(
            md5_hash60(F.concat(F.col(key_col).cast("string"),
                                F.lit(f"-{seed}"))),
            F.lit(denom),
        )
    else:
        bucket = F.pmod(
            F.xxhash64(F.col(key_col).cast("string"), F.lit(seed)),
            F.lit(denom),
        )
    thresh = F.lit(int(default_rate * denom))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * denom))
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


def dedup_against_corpus(
    new_batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Incremental ingestion dedup: rows of ``new_batch`` whose
    normalized content fingerprint does NOT already exist in
    ``corpus`` — the daily-ingest shape, where the new batch is small
    against a huge accumulated corpus and re-deduping the whole
    corpus per day would be quadratic over time.

    Anti-join on the md5 content fingerprint (same normalization as
    exact_dedup, so the two agree on what "same document" means).
    Both sides shuffle on the fingerprint — at 100 TB the corpus side
    should be a pre-bucketed fingerprint INDEX table (fingerprint
    only, bucketed by fingerprint at write time), which this operator
    reads as-is: pass ``corpus`` as that one-column table and the
    exchange on the corpus side disappears. AQE further prunes with a
    runtime bloom/DPP filter when the new batch is small."""
    from json_ld_spark.operators.textstats import fingerprint_md5

    fp_new = new_batch.withColumn("_fp", fingerprint_md5(F.col(text_col)))
    cols = [c for c in corpus.columns if c == text_col]
    fp_old = (
        corpus.select(fingerprint_md5(F.col(text_col)).alias("_fp"))
        if cols
        else corpus.select(F.col(corpus.columns[0]).alias("_fp"))
    ).distinct()
    return fp_new.join(fp_old, "_fp", "left_anti").drop("_fp")


def assign_splits(
    df: DataFrame,
    key_col: str,
    weights: "list[tuple[str, float]]" = (
        ("train", 0.8), ("val", 0.1), ("test", 0.1)
    ),
    seed: int = 7,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """``df`` plus a ``split`` column: deterministic train/val/test
    assignment by hash bucket — partition-independent and append-
    stable (a row's split depends only on its key and the seed, so a
    grown corpus never migrates old rows across splits, which would
    silently leak yesterday's training data into today's eval set).

    ``weights`` are (name, fraction) in priority order over the same
    1e-6-grained bucket space as ``deterministic_sample``; md5 family
    for oracle replay, xxhash64 for production. Pure JVM row
    expression — zero shuffle, full pushdown."""
    denom = 1_000_000
    if hash_family == "md5":
        from json_ld_spark.operators.dedup import md5_hash60

        bucket = F.pmod(
            md5_hash60(F.concat(F.col(key_col).cast("string"),
                                F.lit(f"-{seed}"))),
            F.lit(denom),
        )
    else:
        bucket = F.pmod(
            F.xxhash64(F.col(key_col).cast("string"), F.lit(seed)),
            F.lit(denom),
        )
    expr = F.lit(weights[-1][0])
    acc = 0
    cuts = []
    for name, frac in weights[:-1]:
        acc += int(frac * denom)
        cuts.append((name, acc))
    for name, cut in reversed(cuts):
        expr = F.when(bucket < cut, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def leakage_safe_splits(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 7,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(key, split) for every document, with TRAIN rows whose
    normalized content fingerprint also appears in val or test
    DROPPED — the eval-leakage guard a training pipeline runs after
    split assignment: hash-splitting assigns by KEY, but near-
    identical content under different keys (mirrors, reposts,
    boilerplate) still straddles the split boundary, and any train
    document whose content sits in the eval set inflates every
    downstream benchmark.

    One fingerprint projection, one distinct on the small eval side,
    one anti-join keyed on the fingerprint (same normalization as
    exact dedup, so "same document" means the same thing pipeline-
    wide). The eval fingerprint side is a FRACTION of the corpus
    (val+test ≈ 20%), but still corpus-scaled — no forced broadcast;
    AQE decides. Val/test rows pass through untouched: the guard
    removes training contamination, never evaluation rows."""
    from json_ld_spark.operators.textstats import fingerprint_md5

    s = assign_splits(docs, key_col, seed=seed, hash_family=hash_family)
    fp = s.select(
        F.col(key_col), "split", fingerprint_md5(F.col(text_col)).alias("_fp")
    )
    eval_fps = (
        fp.filter(F.col("split") != "train").select("_fp").distinct()
    )
    train = fp.filter(F.col("split") == "train").join(
        eval_fps, "_fp", "left_anti"
    )
    return (
        train.unionByName(fp.filter(F.col("split") != "train"))
        .select(key_col, "split")
    )


def upsample_by_epochs(
    df: DataFrame,
    epochs: "dict[str, float]",
    strata_col: str,
    key_col: str,
    default_epochs: float = 1.0,
    seed: int = 11,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """``df`` replicated per-stratum by FRACTIONAL epoch weights — the
    upsampling half of training-data mixing (see 'The Pile' /
    'Gopher'-style mix tables: books ×3.2 epochs, wiki ×2, crawl ×0.5
    — the downsampling side is ``stratified_sample``). A weight of
    2.5 emits every row twice and a deterministic hash-chosen half of
    the stratum a third time, so realized epoch counts converge to
    the requested weight while individual rows stay append-stable:
    re-running over a grown corpus never changes how many copies an
    old row gets.

    Output adds ``copy_idx`` (0-based) — downstream shuffling by
    (key, copy_idx) spreads the replicas across partitions instead of
    co-locating them. Pure JVM row expressions: a literal CASE chain
    for the weight lookup (mix tables are small by construction), a
    hash threshold for the fractional copy, and one ``explode`` over
    a ``sequence`` — zero shuffle, zero join, full scan pushdown.
    md5 family for oracle replay, xxhash64 for production."""
    denom = 1_000_000
    if hash_family == "md5":
        from json_ld_spark.operators.dedup import md5_hash60

        bucket = F.pmod(
            md5_hash60(F.concat(F.col(key_col).cast("string"),
                                F.lit(f"-up{seed}"))),
            F.lit(denom),
        )
    else:
        bucket = F.pmod(
            F.xxhash64(F.col(key_col).cast("string"), F.lit(seed)),
            F.lit(denom),
        )
    base = F.lit(int(default_epochs * denom))
    for stratum, w in sorted(epochs.items()):
        base = F.when(
            F.col(strata_col) == stratum, F.lit(int(w * denom))
        ).otherwise(base)
    n_copies = (base / denom).cast("int") + (
        bucket < F.pmod(base, F.lit(denom))
    ).cast("int")
    return (
        df.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn(
            "copy_idx", F.explode(F.sequence(F.lit(0), F.col("_n") - 1))
        )
        .drop("_n")
    )


def weighted_sample(
    docs: DataFrame,
    k: int = 64,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
) -> DataFrame:
    """(rank, id, weight): deterministic weighted sampling WITHOUT
    replacement — the A-ES / exponential-clocks scheme (Efraimidis &
    Spirakis 2006): each row draws u ∈ (0,1] from the cross-engine
    hash of its id and ranks by u^(1/w), computed as ln(u)/w (same
    argmax, no tiny-power underflow). The top-k ARE a weighted sample
    without replacement; everything is a pure function of (id, w), so
    the sample is partitioning-independent, append-stable for
    surviving ranks, and replayable by any engine with md5 + ln.

    Output columns are integers only — the float key orders but never
    leaves the plan, so libm ulp differences cannot reach the gate
    (keys of distinct ids are never within an ulp). One TakeOrdered
    top-k, no full sort."""
    from json_ld_spark.operators.dedup import md5_hash60

    h = md5_hash60(F.col(id_col).cast("string"))
    u = (h + 1).cast("double") / F.lit(float(1 << 60))
    key = F.log(u) / F.col(weight_col).cast("double")
    ranked = (
        docs.filter(F.col(weight_col) > 0)
        .select(F.col(id_col), F.col(weight_col), key.alias("_key"))
        .orderBy(F.desc("_key"), F.col(id_col))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("_key"), F.col(id_col))
    return ranked.select(
        F.row_number().over(w).cast("int").alias("rank"),
        id_col,
        weight_col,
    )


def pack_turns(
    turns: DataFrame,
    budget_tokens: int = 128,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    extra_cols: "tuple[str, ...]" = ("role",),
) -> DataFrame:
    """(conv, turn_idx, *extra, n_tokens, window_idx): pack each
    conversation's turns IN ORDER into fixed-token-budget context
    windows — the SFT-assembly step between transcripts and the
    tokenizer. Same greedy running-total semantics as pack_chunks
    (window = floor(exclusive-prefix / budget); a straddling turn
    spills into its window), but partitioned by the CONVERSATION —
    the natural pack unit, so no mod-bucket parallelism hack is
    needed: every conversation packs independently and turn order is
    never violated (a requirement chunk packing doesn't have).

    n_tokens = whitespace tokens of the normalized text (swap in the
    vendored BPE via chunk_documents_bpe's tokenizer for real-token
    budgets). Zero joins, one window per conversation partition."""
    from pyspark.sql import Window

    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                         "\\s+", " ")
    )
    n_tokens = F.when(F.length(norm) > 0, F.size(F.split(norm, " "))).otherwise(
        F.lit(0)
    )
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = turns.select(
        conv_col, idx_col, *extra_cols, n_tokens.alias("n_tokens")
    )
    return staged.withColumn("_cum", F.sum("n_tokens").over(w)).select(
        conv_col,
        idx_col,
        *extra_cols,
        "n_tokens",
        F.floor((F.col("_cum") - F.col("n_tokens")) / budget_tokens)
        .cast("int")
        .alias("window_idx"),
    )


def loss_mask_spans(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep_len: int = 1,
    mask_role: str = "assistant",
) -> DataFrame:
    """(conv, turn_idx, start_char, end_char, n_chars): character
    spans of ``mask_role`` turns inside the conversation's linearized
    text (turns joined in order with a ``sep_len``-char separator) —
    the SFT loss-mask computation: train on assistant tokens only,
    mask everything else.

    start = Σ over prior turns of (len(normalized text) + sep);
    end = start + len — one cumulative-sum window per conversation
    (the same partitioning pack_turns uses, so the two stages share
    a shuffle when composed). Whitespace-normalized lengths so the
    spans match what a whitespace-normalizing tokenizer consumes;
    exact integer arithmetic throughout."""
    from pyspark.sql import Window

    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                         "\\s+", " ")
    )
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = turns.select(
        conv_col, idx_col, role_col, F.length(norm).alias("n_chars")
    )
    return (
        staged.withColumn(
            "_cum", F.sum(F.col("n_chars") + sep_len).over(w)
        )
        .filter(F.col(role_col) == mask_role)
        .select(
            conv_col,
            idx_col,
            (F.col("_cum") - F.col("n_chars") - sep_len).alias("start_char"),
            (F.col("_cum") - F.lit(sep_len)).alias("end_char"),
            "n_chars",
        )
    )


def preference_pairs(
    turns: DataFrame,
    score_col: str,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    resp_role: str = "assistant",
    min_margin: int = 1,
) -> DataFrame:
    """(conv, chosen_turn, rejected_turn, chosen_score,
    rejected_score, margin): DPO/RLHF preference-pair construction —
    per conversation, the best- and worst-scoring response turns
    become the (chosen, rejected) pair when their score margin is
    large enough to be a trustworthy label.

    Ties break on the LOWEST turn index on both sides (deterministic
    under any partitioning); a conversation whose best and worst are
    the same turn (one response, or all responses tied) yields no
    pair. Two windows over one conversation-keyed sort plus a
    conversation-keyed self-join — every stage shares the same
    partitioning, so the whole op is one shuffle of the response
    turns; scores stay integers."""
    from pyspark.sql.window import Window

    cand = turns.filter(F.col(role_col) == resp_role).select(
        F.col(conv_col).alias("conv"),
        F.col(turn_col).alias("turn"),
        F.col(score_col).cast("long").alias("score"),
    )
    wb = Window.partitionBy("conv").orderBy(
        F.desc("score"), F.asc("turn")
    )
    ww = Window.partitionBy("conv").orderBy(
        F.asc("score"), F.asc("turn")
    )
    ranked = cand.select(
        "conv", "turn", "score",
        F.row_number().over(wb).alias("_rb"),
        F.row_number().over(ww).alias("_rw"),
    )
    best = ranked.filter(F.col("_rb") == 1).select(
        "conv",
        F.col("turn").alias("chosen_turn"),
        F.col("score").alias("chosen_score"),
    )
    worst = ranked.filter(F.col("_rw") == 1).select(
        "conv",
        F.col("turn").alias("rejected_turn"),
        F.col("score").alias("rejected_score"),
    )
    return (
        best.join(worst, "conv")
        .filter(F.col("chosen_turn") != F.col("rejected_turn"))
        .withColumn(
            "margin", F.col("chosen_score") - F.col("rejected_score")
        )
        .filter(F.col("margin") >= min_margin)
        .select(
            F.col("conv").alias("conv_id"),
            "chosen_turn", "rejected_turn",
            "chosen_score", "rejected_score", "margin",
        )
    )


def capped_group_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """At most ``k`` rows per group, chosen by md5-hash order of the
    id — the per-domain cap step of balanced-corpus construction
    (keep every small domain whole, uniformly subsample the whales).
    Hash order makes the choice a uniform sample that is DETERMINISTIC
    under any partitioning (the deterministic_sample policy, applied
    per group); id tie-break covers hash collisions. One window over
    one group-keyed shuffle; whale groups degrade like any skewed
    window (salt upstream if one group dominates a partition)."""
    from pyspark.sql.window import Window

    from json_ld_spark.operators.dedup import md5_hash60

    w = Window.partitionBy(group_col).orderBy(
        md5_hash60(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
