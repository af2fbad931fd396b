from json_ld_spark.streaming.stream_pipeline import (  # noqa: F401
    stream_triples,
    stream_turn_rate,
)
