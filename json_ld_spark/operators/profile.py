"""ANALYZE-style table profiling: per-column row/null/distinct
statistics in ONE pass shape per column, composing the engine-
replayable HLL sketch (operators/sketches.py) for cardinality.

This is the stats-collection read an optimizer or a data-quality
gate runs over a 100 TB table before anything else: exact row and
null counts (cheap aggregates), exact distinct where affordable, and
the HLL estimate whose registers gate cross-engine. Output is one
row per profiled column, so the result is tiny regardless of input
size.

Scale: each column costs one aggregation pass (null/row counts fold
into the same groupBy as the HLL registers via a two-level
aggregate); columns profile independently — at cluster scale they
run as parallel jobs over one cached scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from json_ld_spark.operators.sketches import hll_distinct


def profile_table(
    df: DataFrame,
    columns: "list[str] | None" = None,
    b: int = 8,
) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, hll_nonempty, hll_s_scaled,
    hll_est): per-column profile. ``n_distinct`` is the exact count
    (drop it at true scale and keep the sketch — the oracle gates
    both). All values are engine-replayable: counts are exact
    integers, the HLL state is the exact-integer register summary."""
    columns = columns or df.columns
    parts = []
    for c in columns:
        base = df.select(F.lit(c).alias("column"), F.col(c).alias("_v"))
        counts = base.groupBy("column").agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null"),
            F.countDistinct("_v").alias("n_distinct"),
        )
        sk = hll_distinct(base, "column", "_v", b=b).select(
            "column",
            F.col("nonempty").alias("hll_nonempty"),
            F.col("s_scaled").alias("hll_s_scaled"),
            F.col("est").alias("hll_est"),
        )
        parts.append(counts.join(sk, "column"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
