"""snapshot_diff / scd2_merge / deterministic_walks unit semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from json_ld_spark.operators.kg_train import deterministic_walks
from json_ld_spark.operators.lifecycle import scd2_merge, snapshot_diff


def test_snapshot_diff_tags_both_directions(spark):
    old = spark.createDataFrame(
        [("a", 1), ("b", 2), ("b", 2)], "k string, v int"
    )
    new = spark.createDataFrame([("b", 2), ("c", 3)], "k string, v int")
    got = {(r.k, r.v, r.change)
           for r in snapshot_diff(old, new, ["k", "v"]).collect()}
    assert got == {("a", 1, "removed"), ("c", 3, "added")}


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "entity string, tier long, version int, is_current boolean"
    )


def test_scd2_all_branches(spark):
    current = _dim(
        spark,
        [
            ("same", 1, 1, True),
            ("moved", 1, 1, True),
            ("gone", 9, 1, True),
            ("moved", 0, 1, False),  # history row passes through
        ],
    )
    snap = spark.createDataFrame(
        [("same", 1), ("moved", 2), ("fresh", 5)], "entity string, tier long"
    )
    got = {(r.entity, r.tier, r.version, r.is_current)
           for r in scd2_merge(current, snap, ["entity"], ["tier"]).collect()}
    assert got == {
        ("same", 1, 1, True),       # unchanged
        ("moved", 1, 1, False),     # closed old version
        ("moved", 2, 2, True),      # opened new version
        ("gone", 9, 1, False),      # deleted upstream -> closed
        ("fresh", 5, 1, True),      # inserted
        ("moved", 0, 1, False),     # history untouched
    }


def test_scd2_null_safe_attr_compare(spark):
    current = _dim(spark, [("n", None, 1, True)])
    snap = spark.createDataFrame([("n", None)], "entity string, tier long")
    got = scd2_merge(current, snap, ["entity"], ["tier"]).collect()
    # NULL == NULL must compare as unchanged, not as a new version
    assert [(r.version, r.is_current) for r in got] == [(1, True)]


def test_walks_deterministic_and_valid(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "src string, dst string",
    )
    w1 = deterministic_walks(edges, walk_len=3, walks_per_node=2)
    rows = w1.collect()
    # every node starts walks_per_node walks, each of full length
    # (symmetrized graph has no dead ends)
    by_walk: dict = {}
    for r in rows:
        by_walk.setdefault(r.walk_id, {})[r.step] = r.node
    assert len(by_walk) == 4 * 2
    nbrs = {"a": {"b", "c"}, "b": {"a", "c"}, "c": {"a", "b", "d"},
            "d": {"c"}}
    for wid, steps in by_walk.items():
        assert sorted(steps) == [0, 1, 2, 3]
        assert steps[0] == wid.split("#")[0]
        for t in range(3):
            assert steps[t + 1] in nbrs[steps[t]], (wid, steps)
    # identical corpus under a different partitioning
    w2 = deterministic_walks(
        edges.repartition(5), walk_len=3, walks_per_node=2
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, w2.collect()))


def test_capped_group_sample_binds_and_deterministic(spark):
    from json_ld_spark.operators.corpus import capped_group_sample

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small")
                                               for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = capped_group_sample(df, "source", k=10).collect()
    by = {}
    for r in got:
        by.setdefault(r.source, set()).add(r.doc_id)
    assert len(by["big"]) == 10          # whale capped
    assert len(by["small"]) == 3         # small domain kept whole
    again = capped_group_sample(df.repartition(7), "source", k=10).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
