from json_ld_spark.sources.transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    derive_transcripts_from_documents,
    synthesize_transcripts,
)
