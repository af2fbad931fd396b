"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name:
sec}, "sf", plus triples/sec for the KG-emission headline}. The
printed line is kept under 1900 chars (the driver parses a ~2000-char
output tail), so its "queries" table carries the slowest 30; the
complete per-query table is written to BENCH/bench_full_latest.json.

Usage: python bench.py  (or spark-submit bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _cpu_steal_total() -> "tuple[int, int]":
    """(steal, total) jiffies from /proc/stat — the in-band evidence
    for host-level CPU steal. Measured here: 1.8% steal over a rep
    costs ~15-20% wall on the emission pipeline; the best-of-N rep
    with ~0% steal reproduces the steal-free rate."""
    try:
        with open("/proc/stat") as f:
            vals = list(map(int, f.readline().split()[1:]))
        return vals[7], sum(vals)
    except (OSError, IndexError, ValueError):
        return 0, 1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # min-of-N per query: the sandbox VM sees host-level steal that
    # swings single runs +-30%; the minimum wall is the steal-free
    # estimate (same policy as scripts/bench_scaling.py)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # the two headline measurements (the BASELINE.json metric) get
    # more reps: at 3-4 s/rep an extra 3 reps is ~10 s of suite time
    # and all but guarantees one ~steal-free rep
    hreps = int(os.environ.get("SPARK_GRAFT_BENCH_HEADLINE_REPS",
                               str(max(reps, 5))))

    from json_ld_spark.plans.session import build_session

    spark = build_session(app_name="json-ld-spark-bench", cpus=cpus,
                          shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    timings: dict[str, float] = {}
    total = 0.0

    # headline A: full KG construction over the driver-provided tables
    # (derive → window → expand/toRDF → dedup) — the oracle-aligned
    # path; the sf-dir corpus is small, so this number is dominated by
    # fixed Spark overhead and measures end-to-end latency, not rate
    kg_sec = float("inf")
    n_triples = 0
    kg_steal = None
    for _ in range(hreps):
        s0, j0 = _cpu_steal_total()
        t0 = time.time()
        n_triples = entry._triples(spark, sf_dir).count()
        dt = time.time() - t0
        s1, j1 = _cpu_steal_total()
        if dt < kg_sec:
            kg_sec = dt
            kg_steal = round(100.0 * (s1 - s0) / max(1, j1 - j0), 2)
    timings["kg_emit_triples"] = round(kg_sec, 3)
    total += kg_sec

    # headline B: sustained triples/sec (the BASELINE.json metric) on a
    # synthetic corpus sized for throughput measurement (~260k turns),
    # same pipeline, after a warmup pass to exclude JIT/codegen
    from json_ld_spark.operators.jsonld_ops import emit_triples, valid_triples
    from json_ld_spark.sources.transcripts import synthesize_transcripts

    n_convs = int(os.environ.get("SPARK_GRAFT_KG_CONVS", "20000"))
    tx = synthesize_transcripts(spark, n_convs=n_convs).localCheckpoint()
    n_turns = tx.count()
    valid_triples(emit_triples(tx)).count()  # warmup
    # best-of-hreps with per-rep steal telemetry: the sandbox VM sees
    # host-level steal; the min-wall rep is the steal-free estimate
    # and its recorded steal% is the in-band proof (same policy as
    # scripts/bench_scaling.py). r3→r4 root cause of the 998k→798k
    # swing: 2 reps both landed on stolen intervals; hreps=5 plus the
    # steal column makes that diagnosable from the JSON alone.
    sus_sec = float("inf")
    n_sustained = 0
    sus_rep_secs: list = []
    sus_rep_steal: list = []
    for _ in range(hreps):
        s0, j0 = _cpu_steal_total()
        t0 = time.time()
        n_sustained = valid_triples(emit_triples(tx)).count()
        dt = time.time() - t0
        s1, j1 = _cpu_steal_total()
        sus_rep_secs.append(round(dt, 3))
        sus_rep_steal.append(round(100.0 * (s1 - s0) / max(1, j1 - j0), 2))
        sus_sec = min(sus_sec, dt)
    timings["kg_emit_sustained"] = round(sus_sec, 3)
    total += sus_sec

    bench_queries = [
        "doc_stats",
        "tfidf_top_terms",
        "dedup_exact",
        "ngram_jaccard",
        "embedding_neardup",
        "ann_brute_topk",
        "ann_ivf_topk",
        "ann_ivf_batch",
        "ann_lsh_topk",
        "ann_lsh_batch",
        "entity_cooccurrence",
        "entity_pagerank",
        "entity_pagerank_directed",
        "embedding_neardup_lsh",
        "lineitem_agg",
        "revenue_by_nation",
        "events_daily",
        "top_suppliers_window",
        "events_sessionize",
        "dedup_keep",
        "dedup_keep_best",
        "chunk_documents",
        "chunk_documents_bpe",
        "pack_chunks",
        "pack_chunks_bpe",
        "deterministic_sample",
        "kg_documents",
        "kg_node_docs",
        "kg_frame_conversations",
        "canonicalized_triples",
        "kg_triples_stream_reader",
        "rdf_lists_reconstitute",
        "jsonld_expand_table",
        "multimodal_plan",
        "multimodal_decode",
        "repetition_stats",
        "decontaminate",
        "entity_triangles",
        "entity_khop",
        "entity_pmi",
        "entity_communities",
        "lm_quality_scores",
        "train_val_split",
        "domain_mix_sample",
        "domain_upsample",
        "dup_ngram_frac",
        "dedup_incremental",
        "audio_features",
        "event_props",
        "events_asof",
        "events_in_windows",
        "source_percentiles",
        "hll_distinct_users",
        "kmv_distinct_users",
        "entity_adamic_adar",
        "events_rollup",
        "event_bursts",
        "pii_redaction",
        "curriculum_buckets",
        "gif_decode",
        "adpcm_decode",
        "flac_decode",
        "bpe_train_merges",
        "warc_ingest",
        "url_canonicalize",
        "html_extract",
        "kg_negative_samples",
        "entity_kcore",
        "crawl_domain_stats",
        "bpe_train_encode",
        "robots_filter",
        "quality_classifier",
        "loss_mask_spans",
        "contrastive_pairs",
        "conversation_quality",
        "cms_user_counts",
        "cms_user_estimate",
        "bloom_user_filter",
        "pii_luhn_cards",
        "events_pivot",
        "session_window_overlap",
        "events_unpivot",
        "neardup_canonical",
        "events_funnel",
        "events_retention",
        "event_transitions",
        "bm25_scores",
        "embedding_quantize",
        "weighted_sample",
        "pca_top_component",
        "table_profile",
        "mention_kwic",
        "pack_turns",
        "bm25_retrieval",
        "fuzzy_entity_match",
        "semdedup",
        "exact_substring_spans",
        "rdfs_entailment",
        "bgp_match",
        "triple_provenance",
        "heavy_hitters",
        "histogram_quantiles",
        "ks_drift",
        "dpo_pairs",
        "semantic_decontaminate",
        "entity_sssp",
        "hyperball_neighborhood",
        "entity_walks",
        "kg_snapshot_diff",
        "kg_scd2_merge",
        "rrf_fusion",
        "char_entropy",
        "kg_validate",
        "capped_sample",
    ]
    # streaming queries run once (temp-dir setup + query startup
    # dominate; min-of-N would only re-measure fixed latency)
    stream_queries = ["stream_triples", "stream_turn_chain",
                      "stream_windowed_counts", "stream_turn_rate",
                      "stream_dedup", "stream_hll_distinct",
                      "stream_sessionize",
                      "stream_minhash_dedup",
                      "stream_cms_counts"]
    qmap = entry.queries()
    for name in bench_queries:
        dt = float("inf")
        for _ in range(reps):
            t0 = time.time()
            qmap[name](spark, sf_dir).count()
            dt = min(dt, time.time() - t0)
        timings[name] = round(dt, 3)
        total += dt
    for name in stream_queries:
        t0 = time.time()
        qmap[name](spark, sf_dir).count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    # minhash + simhash production family (xxhash64): the driver
    # queries run the md5 oracle family for DuckDB parity; throughput
    # is measured on the fast path (same algorithm, pluggable hash) —
    # keys kept stable for round-over-round comparability
    from json_ld_spark.operators.dedup import (
        minhash_dedup_components,
        simhash_neardup_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dt = float("inf")
    for _ in range(reps):
        t0 = time.time()
        minhash_dedup_components(docs, threshold=0.3).count()
        dt = min(dt, time.time() - t0)
    timings["minhash_components"] = round(dt, 3)
    total += dt
    from pyspark.sql import functions as F

    dt = float("inf")
    for _ in range(reps):
        t0 = time.time()
        simhash_neardup_pairs(docs).filter(F.col("hamming") <= 16).count()
        dt = min(dt, time.time() - t0)
    timings["simhash_pairs"] = round(dt, 3)
    total += dt

    result = {
        "metric": "headline_suite_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "kg_triples": n_triples,
        "kg_small_corpus_triples_per_sec": (
            round(n_triples / kg_sec, 1) if kg_sec > 0 else None
        ),
        "kg_sustained_turns": n_turns,
        "kg_sustained_triples": n_sustained,
        "kg_triples_per_sec": (
            round(n_sustained / sus_sec, 1) if sus_sec > 0 else None
        ),
        # in-band steal evidence for the two headline measurements:
        # per-rep wall + steal% for sustained, steal% of the best
        # small-corpus rep. High per-rep steal explains a slow rep;
        # the reported headline is the min-wall (lowest-steal) rep.
        "kg_sustained_rep_secs": sus_rep_secs,
        "kg_sustained_rep_steal_pct": sus_rep_steal,
        "kg_emit_triples_steal_pct": kg_steal,
    }
    # The round driver keeps only the LAST ~2000 chars of this run's
    # output and json-parses what it finds there. The r4 result line
    # was 2990 chars (106 per-query timings) — unparseable no matter
    # how clean the surrounding output. So: the FULL result goes to a
    # stable committed file, and stdout gets ONE compact line that is
    # guaranteed to fit: headline metrics + the slowest-N per-query
    # table (the scale-audit set), a pointer to the full file, and the
    # grand total over all queries.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH", "bench_full_latest.json",
    )
    try:
        os.makedirs(os.path.dirname(full_path), exist_ok=True)
        with open(full_path, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
    except OSError:
        full_path = None
    compact = dict(result)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:30])
    compact["queries"] = {k: round(v, 2) for k, v in slowest.items()}
    compact["n_queries"] = len(timings)
    compact["queries_omitted_sec"] = round(
        sum(v for k, v in timings.items() if k not in slowest), 2
    )
    compact["queries_full"] = "BENCH/bench_full_latest.json"
    line = json.dumps(compact, separators=(",", ":"))
    # hard guarantee: shed the cheapest timings until the line fits
    # the driver's capture window with margin
    while len(line) > 1900 and compact["queries"]:
        drop = min(compact["queries"], key=compact["queries"].get)
        compact["queries_omitted_sec"] = round(
            compact["queries_omitted_sec"] + compact["queries"].pop(drop), 2
        )
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
