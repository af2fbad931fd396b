"""Structured Streaming path: micro-batch triple emission + windowed
turn-rate aggregation."""

from __future__ import annotations

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
