"""Structured Streaming path: micro-batch triple emission + windowed
turn-rate aggregation."""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from json_ld_spark.sources.transcripts import (
    synthesize_transcripts,
    write_transcripts,
)
from json_ld_spark.streaming.stream_pipeline import (
    read_transcript_stream,
    stream_triples,
    stream_turn_rate,
)


def test_stream_triples_end_to_end(spark):
    workdir = tempfile.mkdtemp()
    inp = os.path.join(workdir, "in")
    out = os.path.join(workdir, "out")
    ckpt = os.path.join(workdir, "ckpt")
    try:
        t = synthesize_transcripts(spark, n_convs=6)
        t.drop("conv_bucket", "next_turn_idx", "turn_rank").write.parquet(inp)
        q = stream_triples(spark, inp, out, ckpt)
        q.processAllAvailable()
        q.stop()
        triples = spark.read.parquet(out)
        n_stream = triples.filter(F.col("error_code").isNull()).count()
        # batch emission without ordering (streaming drops nextTurn links)
        from json_ld_spark.operators.jsonld_ops import emit_triples, valid_triples

        n_batch = valid_triples(emit_triples(t, ordered=False)).count()
        assert n_stream == n_batch > 0
        assert "epoch_id" in triples.columns
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_stream_turn_rate(spark):
    workdir = tempfile.mkdtemp()
    inp = os.path.join(workdir, "in")
    try:
        t = synthesize_transcripts(spark, n_convs=6)
        t.write.parquet(inp)
        stream = read_transcript_stream(spark, inp)
        agg = stream_turn_rate(stream, "5 minutes", "10 minutes")
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("turn_rate")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        rows = spark.sql("SELECT * FROM turn_rate").collect()
        assert rows and sum(r["n_turns"] for r in rows) == t.count()
        assert {r["role"] for r in rows} <= {"user", "assistant", "tool"}
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_stateful_turn_chain_links_across_batches(spark, tmp_path):
    """applyInPandasWithState resolves nextTurn links that span
    micro-batches: batch 1 delivers turns 0-1, batch 2 delivers turn 2;
    the (1 → 2) link only exists because conversation state survived
    between batches."""
    import time

    from json_ld_spark.streaming.stream_pipeline import (
        read_transcript_stream,
        stateful_turn_chain,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows_b1 = [
        ("c1", 0, "user", "hi", None, datetime.datetime(2024, 1, 1, 0, 0)),
        ("c1", 1, "assistant", "yo", None, datetime.datetime(2024, 1, 1, 0, 1)),
        ("c2", 0, "user", "a", None, datetime.datetime(2024, 1, 1, 0, 0)),
    ]
    rows_b2 = [
        ("c1", 2, "user", "more", None, datetime.datetime(2024, 1, 1, 0, 2)),
        ("c2", 1, "assistant", "b", None, datetime.datetime(2024, 1, 1, 0, 3)),
    ]
    from json_ld_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    import glob
    import time as _time

    for i, rows in enumerate([rows_b1, rows_b2]):
        staging = tmp_path / f"stage{i}"
        spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.parquet(
            str(staging)
        )
        part = glob.glob(str(staging / "part-*.parquet"))[0]
        dest = str(in_dir / f"batch{i}.parquet")
        shutil.copy(part, dest)
        # the file source orders by modification time: stagger them
        os.utime(dest, (1700000000 + i * 100, 1700000000 + i * 100))
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(in_dir))
    )
    # NoTimeout for a bounded replay: with a processing-time timeout
    # the query schedules timeout-evaluation batches forever and
    # availableNow never terminates (this test used to burn the full
    # 120s await); without it the backlog drains and the query STOPS
    links = stateful_turn_chain(stream, timeout_minutes=None)
    q = (
        links.writeStream.format("memory")
        .queryName("turn_chain_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    terminated = q.awaitTermination(120)
    assert terminated, "availableNow replay should self-terminate"
    got = {
        (r.conv_id, r.turn_idx, r.next_turn_idx)
        for r in spark.sql("SELECT * FROM turn_chain_test").collect()
    }
    assert ("c1", 0, 1) in got
    assert ("c1", 1, 2) in got, f"cross-batch link missing: {got}"
    assert ("c2", 0, 1) in got


def test_stateful_turn_chain_sorts_across_arrow_chunks(spark, tmp_path):
    """A group whose batch spans MULTIPLE Arrow chunks must be sorted
    globally before linking: per-chunk sorting links across chunk
    boundaries wrongly and carries the wrong last-turn into state
    (regression: the chain function used to sort per pdf chunk)."""
    import glob

    from json_ld_spark.sources.transcripts import TRANSCRIPT_SCHEMA
    from json_ld_spark.streaming.stream_pipeline import stateful_turn_chain

    n = 40
    # reversed order so any chunking that isn't globally sorted breaks
    rows = [
        ("c1", i, "user", f"t{i}", None, datetime.datetime(2024, 1, 1, 0, 0))
        for i in reversed(range(n))
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    staging = tmp_path / "stage"
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.parquet(
        str(staging)
    )
    part = glob.glob(str(staging / "part-*.parquet"))[0]
    shutil.copy(part, str(in_dir / "batch0.parquet"))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        stream = (
            spark.readStream.schema(TRANSCRIPT_SCHEMA)
            .parquet(str(in_dir))
        )
        links = stateful_turn_chain(stream, timeout_minutes=None)
        q = (
            links.writeStream.format("memory")
            .queryName("turn_chain_chunks")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = sorted(
        (r.turn_idx, r.next_turn_idx)
        for r in spark.sql("SELECT * FROM turn_chain_chunks").collect()
    )
    assert got == [(i, i + 1) for i in range(n - 1)]


def test_stream_exact_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    """Two micro-batches where batch 1 re-sends half of batch 0's rows
    verbatim (at-least-once redelivery): the deduped sink must hold
    each event exactly once, including the batch-1-only rows."""
    from json_ld_spark.streaming.stream_pipeline import stream_exact_dedup

    base = datetime.datetime(2024, 1, 1)
    rows0 = [(i, base + datetime.timedelta(minutes=i), "a") for i in range(10)]
    resent = rows0[::2]
    rows1 = [
        (i, base + datetime.timedelta(minutes=i), "b") for i in range(10, 16)
    ] + resent
    schema = "event_id long, ts timestamp_ntz, event_type string"
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, rows in enumerate((rows0, rows1)):
        tmp = str(tmp_path / f"tmp{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(tmp)
        import glob

        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(in_dir, f"batch{i}.parquet")
        shutil.copy(src, dest)
        os.utime(dest, (1_700_000_000 + i * 1000,) * 2)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = str(tmp_path / "out")
    q = (
        stream_exact_dedup(stream, watermark="240 hours")
        .writeStream.foreachBatch(
            lambda df, _e: df.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 16
    assert got.select("event_id").distinct().count() == 16
    # the first arrival's payload wins: resent ids keep event_type 'a'
    assert (
        got.filter(F.col("event_id") < 10)
        .filter(F.col("event_type") != "a")
        .count()
        == 0
    )


def test_stream_sessionize_stitches_across_batches(spark, tmp_path):
    """A session straddling a micro-batch boundary must be stitched
    by state: batch 1 ends mid-session (events at t=0s, 600s), batch
    2 continues it (t=1200s — gap 600 < 1800) and then opens a new
    session (t=5000s). Final snapshots must show ONE 3-event session
    plus the new 1-event session."""
    import glob

    from json_ld_spark.streaming.stream_pipeline import stream_sessionize

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    us = 1_000_000
    rows_b1 = [
        (7, 1, 0 * us, 1.0),
        (7, 2, 600 * us, 2.0),
        (9, 3, 100 * us, 5.0),
    ]
    rows_b2 = [
        (7, 4, 1200 * us, 4.0),   # continues user 7's session
        (7, 5, 5000 * us, 8.0),   # gap 3800s > 1800s: new session
    ]
    schema = "user_id long, event_id long, epoch long, value double"
    for i, rows in enumerate([rows_b1, rows_b2]):
        staging = tmp_path / f"stage{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(staging)
        )
        part = glob.glob(str(staging / "part-*.parquet"))[0]
        dest = str(in_dir / f"batch{i}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (1700000000 + i * 100, 1700000000 + i * 100))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(in_dir))
    )
    q = (
        stream_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "replay should self-terminate"
    snaps = spark.sql("SELECT * FROM sess_test").collect()
    final = {}
    for r in snaps:
        key = (r.user_id, r.session_idx)
        if key not in final or r.seq > final[key].seq:
            final[key] = r
    got = {
        k: (v.n_events, v.start_epoch, v.end_epoch, v.vsum)
        for k, v in final.items()
    }
    assert got[(7, 0)] == (3, 0, 1200 * us, 7.0), got
    assert got[(7, 1)] == (1, 5000 * us, 5000 * us, 8.0), got
    assert got[(9, 0)] == (1, 100 * us, 100 * us, 5.0), got
