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


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    n_bins: int = 64,
    permille: "tuple[int, ...]" = (10, 250, 500, 750, 900, 990),
) -> DataFrame:
    """(permille, n, rank, bin, est): MERGEABLE one-pass quantile
    estimates from an equi-width histogram — the scale path when the
    exact nearest-rank sort (exact_percentiles) is too expensive:
    two map-side-combining aggregations (min/max/count, then ≤
    ``n_bins`` bin counts), state O(n_bins) regardless of input
    size, and bin counts merge by + so the same recipe runs
    incrementally or per-partition-then-merge.

    Engine-replayable by construction: bin assignment is pure
    integer arithmetic (``(x−min)·n_bins div (max−min+1)``), the
    target rank is the exact_percentiles per-mille convention
    (``(pm·n + 999) div 1000``), and the single float expression —
    linear interpolation inside the winning bin — is one shared
    IEEE tree rounded to 6 dp. Integer-valued inputs only (the
    ``+1`` span convention)."""
    if not permille or any(not 0 < p <= 1000 for p in permille):
        raise ValueError("permille points must be in (0, 1000]")
    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("long").alias("v")
    )
    params = vals.agg(
        F.min("v").alias("mn"),
        (F.max("v") - F.min("v") + F.lit(1)).alias("span"),
        F.count("*").alias("n"),
    )
    binned = (
        vals.crossJoin(F.broadcast(params))
        .select(
            F.expr(f"(v - mn) * {n_bins} div span").alias("bin"),
            "mn", "span", "n",
        )
        .groupBy("bin", "mn", "span", "n")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy("bin")
    cum = binned.select(
        "bin", "mn", "span", "n", "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"),
        F.sum("cnt").over(w).alias("cum"),
    )
    pts = F.explode(
        F.array(*[F.lit(int(p)) for p in sorted(set(permille))])
    ).alias("permille")
    width = F.col("span").cast("double") / F.lit(float(n_bins))
    return (
        cum.select("*", pts)
        .withColumn("rank", F.expr("(permille * n + 999) div 1000"))
        .filter((F.col("cum_prev") < F.col("rank"))
                & (F.col("rank") <= F.col("cum")))
        .select(
            "permille",
            "n",
            "rank",
            "bin",
            F.round(
                F.col("mn") + F.col("bin") * width
                + width * (F.col("rank") - F.col("cum_prev")) / F.col("cnt"),
                6,
            ).alias("est"),
        )
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    side_col: str,
) -> DataFrame:
    """One row (n_a, n_b, ks_ppm, at_value): two-sample
    Kolmogorov–Smirnov distance between the ``side_col`` TRUE and
    FALSE slices of ``value_col`` — the drift gate a corpus pipeline
    runs between ingestion snapshots before retraining on them.

    CDFs are carried as INTEGER parts-per-million
    (``cum·10⁶ div n``), so the statistic is exact integer end to
    end. ``at_value`` is the smallest value attaining the maximum
    (deterministic argmax). One shuffle on the value (map-side
    combined to one row per distinct value); the cumulative window
    then runs over the distinct-value domain — bounded for the
    integer metrics this gates (lengths, counts, scores), so the
    single-partition window is a few thousand rows even at 100 TB
    (bucket continuous metrics upstream)."""
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(value_col).cast("long").alias("v"),
            F.col(side_col).cast("boolean").alias("_s"),
        )
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("_s"), 1).otherwise(0)).alias("ca"),
            F.sum(F.when(~F.col("_s"), 1).otherwise(0)).alias("cb"),
        )
    )
    w = Window.orderBy("v")
    tot = Window.partitionBy()
    cdf = counts.select(
        "v",
        F.sum("ca").over(w).alias("cua"),
        F.sum("cb").over(w).alias("cub"),
        F.sum("ca").over(tot).alias("na"),
        F.sum("cb").over(tot).alias("nb"),
    ).select(
        "v", "na", "nb",
        F.abs(
            F.expr("cua * 1000000 div na") - F.expr("cub * 1000000 div nb")
        ).alias("diff_ppm"),
    )
    return (
        cdf.groupBy("na", "nb")
        .agg(
            F.max("diff_ppm").alias("ks_ppm"),
            F.min_by(
                "v",
                F.struct(
                    (-F.col("diff_ppm")).alias("d"), F.col("v").alias("v")
                ),
            ).alias("at_value"),
        )
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            "ks_ppm",
            "at_value",
        )
    )
