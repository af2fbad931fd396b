"""asof_join / range_join_points semantics: tie rules, tolerance,
NULL-when-no-prior, inclusive boundaries, bucket-straddling
intervals, and plan shape (equi-join, not nested loop)."""

from pyspark.sql import functions as F

from json_ld_spark.operators.joins import asof_join, range_join_points


def _left(spark, rows):
    return spark.createDataFrame(rows, "id long, k string, ts double")


def _right(spark, rows):
    return spark.createDataFrame(rows, "k string, ts double, v string")


def test_asof_basic_carry_and_nulls(spark):
    left = _left(spark, [(1, "a", 5.0), (2, "a", 15.0), (3, "a", 25.0),
                         (4, "b", 10.0)])
    right = _right(spark, [("a", 10.0, "r10"), ("a", 20.0, "r20"),
                           ("c", 1.0, "zz")])
    out = {r["id"]: r for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts").collect()}
    assert out[1]["v"] is None          # before any snapshot
    assert out[2]["v"] == "r10"         # latest <= 15
    assert out[3]["v"] == "r20"
    assert out[4]["v"] is None          # key with no right rows
    # left columns intact, right ts suffixed (collides with left "ts")
    assert out[2]["ts"] == 15.0 and out[2]["ts_r"] == 10.0


def test_asof_equal_ts_right_visible(spark):
    left = _left(spark, [(1, "a", 10.0)])
    right = _right(spark, [("a", 10.0, "same")])
    (row,) = asof_join(left, right, on="k").collect()
    assert row["v"] == "same"           # snapshot at t visible at t


def test_asof_tolerance_nulls_stale_matches(spark):
    left = _left(spark, [(1, "a", 100.0), (2, "a", 500.0)])
    right = _right(spark, [("a", 90.0, "r90")])
    out = {r["id"]: r["v"] for r in asof_join(
        left, right, on="k", tolerance=60).collect()}
    assert out[1] == "r90"              # 10s old: inside tolerance
    assert out[2] is None               # 410s old: stale


def test_asof_latest_of_many_and_duplicate_left_ts(spark):
    left = _left(spark, [(1, "a", 50.0), (2, "a", 50.0)])
    right = _right(spark, [("a", float(t), f"r{t}") for t in range(49)])
    out = {r["id"]: r["v"] for r in asof_join(left, right, on="k").collect()}
    assert out == {1: "r48", 2: "r48"}


def _points(spark, rows):
    return spark.createDataFrame(rows, "id long, k string, ts double")


def test_range_join_inclusive_boundaries_and_multi_match(spark):
    pts = _points(spark, [(1, "a", 100.0), (2, "a", 200.0),
                          (3, "a", 150.0), (4, "a", 201.0)])
    iv = spark.createDataFrame(
        [("a", 100.0, 200.0, "w1"), ("a", 150.0, 160.0, "w2")],
        "k string, s double, e double, tag string",
    )
    out = {}
    for r in range_join_points(pts, iv, on="k", point_ts="ts",
                               start_col="s", end_col="e",
                               bucket=50).collect():
        out.setdefault(r["id"], set()).add(r["tag"])
    assert out[1] == {"w1"}             # start boundary inclusive
    assert out[2] == {"w1"}             # end boundary inclusive
    assert out[3] == {"w1", "w2"}       # overlapping windows
    assert 4 not in out                 # just past the end


def test_range_join_interval_straddles_many_buckets(spark):
    # interval spans 10 buckets; points in first/middle/last bucket
    # and outside must resolve correctly despite replication
    pts = _points(spark, [(1, "a", 5.0), (2, "a", 55.0), (3, "a", 99.0),
                          (4, "a", 101.0), (5, "b", 55.0)])
    iv = spark.createDataFrame(
        [("a", 0.0, 100.0, "big")], "k string, s double, e double, tag string"
    )
    got = sorted(
        r["id"] for r in range_join_points(
            pts, iv, on="k", point_ts="ts",
            start_col="s", end_col="e", bucket=10).collect()
    )
    assert got == [1, 2, 3]             # 4 out of range, 5 wrong key
    # no duplicate matches from bucket replication
    assert len(got) == 3


def test_range_join_plans_hash_join_not_nested_loop(spark):
    pts = _points(spark, [(1, "a", 5.0)])
    iv = spark.createDataFrame(
        [("a", 0.0, 10.0, "w")], "k string, s double, e double, tag string"
    )
    plan = range_join_points(
        pts, iv, on="k", point_ts="ts", start_col="s", end_col="e",
        bucket=10,
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_single_shuffle_no_join_node(spark):
    left = _left(spark, [(1, "a", 5.0)])
    right = _right(spark, [("a", 1.0, "r")])
    plan = asof_join(left, right, on="k")._jdf.queryExecution() \
        .executedPlan().toString()
    # the as-of is a window over a union — no join operator at all
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # one per input branch of union


def test_interval_overlap_join_no_dup_no_loss(spark):
    """Grid bucketization must emit each overlapping pair exactly
    once — including pairs spanning MANY shared cells — and exactly
    the brute-force pair set."""
    from json_ld_spark.operators.joins import interval_overlap_join

    US = 1_000_000
    a_rows = [
        (1, "a1", 0 * US, 10_000 * US),      # spans ~3 cells of 3600s
        (1, "a2", 5_000 * US, 5_100 * US),
        (1, "a3", 50_000 * US, 50_010 * US),
        (2, "a4", 0 * US, 100 * US),         # other key
    ]
    b_rows = [
        (1, "b1", 4_000 * US, 9_000 * US),   # overlaps a1 (5 shared cells w/ small bucket) + a2
        (1, "b2", 10_000 * US, 10_001 * US), # touches a1 at the boundary (inclusive)
        (1, "b3", 99_999 * US, 99_999 * US),
        (2, "b4", 50 * US, 60 * US),
    ]
    a = spark.createDataFrame(a_rows, "k int, aid string, s long, e long")
    b = spark.createDataFrame(b_rows, "k int, bid string, bs long, be long")
    out = interval_overlap_join(
        a, b, on="k", a_start="s", a_end="e", b_start="bs", b_end="be",
        bucket_us=1000 * US,  # small bucket: many shared cells per pair
    )
    got = {(r["aid"], r["bid"]): r["overlap_us"] for r in out.collect()}
    expect = {}
    for _, aid, s, e in a_rows:
        for _, bid, bs, be in b_rows:
            ka = [r for r in a_rows if r[1] == aid][0][0]
            kb = [r for r in b_rows if r[1] == bid][0][0]
            if ka == kb and s <= be and bs <= e:
                expect[(aid, bid)] = min(e, be) - max(s, bs)
    assert got == expect, (got, expect)
