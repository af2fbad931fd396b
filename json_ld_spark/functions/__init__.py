from json_ld_spark.functions.columns import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
