"""Hive-style bucketed tables: the co-located-join primitive.

``pipeline.py`` buckets its SINK by a hash column (directory
partitions — the unit of checkpoint-resume); THIS module is the
other bucketing: ``bucketBy`` table layout, where both sides of a
recurring equi-join are pre-hashed into the same number of buckets
on the join key so the join plans with ZERO Exchange — the shuffle
is paid once at write time and amortized over every subsequent join.

At 100 TB this is the difference between re-shuffling the triple
table on conv_id for every downstream job and reading co-located
buckets: the classic warehouse layout decision. The plan test
(tests/test_plans.py::test_bucketed_join_is_shuffle_free) pins the
no-Exchange guarantee so a Spark upgrade or config drift that
silently re-introduces the shuffle fails CI."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: "str | None" = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets additionally enables sort-merge
    joins without a per-task sort."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With
    ``spark.sql.sources.bucketing.enabled`` (default true) and equal
    bucket counts, Catalyst plans this with no Exchange on either
    side."""
    return spark.table(left_table).join(spark.table(right_table), on)
