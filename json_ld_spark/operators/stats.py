"""Exact grouped percentiles (nearest-rank), cross-engine
deterministic.

``approx_percentile`` / t-digest sketches are the right tool when 1%
error is acceptable; corpus QA gates ("p99 document length must not
regress") want EXACT answers that reproduce across engines and runs.
The nearest-rank definition — the value at 1-indexed rank
ceil(p·n) — is computed here with pure INTEGER arithmetic
(per-mille percentiles, `(pm·n + 999) DIV 1000`), because the float
form `ceil(0.7·n)` is engine-dependent at exact-integer boundaries
(0.7·10 = 7.000000000000001 in binary floating point → ceil 8).

One hash shuffle on the group key + one in-partition sort (the
window); rows with equal values are interchangeable at a given rank,
so no tiebreak column is needed for the OUTPUT to be deterministic.
At 100 TB the sort is per-group and spill-aware; a single whale group
degrades exactly like any skewed window — salt upstream or fall back
to approx_percentile for that group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    permille: "tuple[int, ...]" = (500, 900, 990),
) -> DataFrame:
    """(group, permille, n, value): the exact nearest-rank percentile
    of ``value_col`` per group for each requested per-mille point
    (500 = median). NULL values are excluded before ranking."""
    if not permille or any(not 0 < p <= 1000 for p in permille):
        raise ValueError("permille points must be in (0, 1000]")
    w = Window.partitionBy(group_col).orderBy(value_col)
    ranked = (
        df.filter(F.col(value_col).isNotNull())
        .select(group_col, value_col)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_n", F.count("*").over(Window.partitionBy(group_col))
        )
    )
    pts = F.explode(
        F.array(*[F.lit(int(p)) for p in sorted(set(permille))])
    ).alias("permille")
    return (
        ranked.select(group_col, value_col, "_rn", "_n", pts)
        .filter(
            F.col("_rn")
            == F.expr("CAST((permille * _n + 999) DIV 1000 AS BIGINT)")
        )
        .select(
            group_col,
            "permille",
            F.col("_n").alias("n"),
            F.col(value_col).alias("value"),
        )
    )
