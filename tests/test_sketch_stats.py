"""Heavy hitters / histogram quantiles / KS drift unit semantics.

The oracle-parity sweep gates these on the driver corpus; these pin
the sketch guarantees on PLANTED inputs — a Zipf stream whose tail
forces Space-Saving evictions, a known distribution for the
histogram, a planted location shift for KS.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from json_ld_spark.operators.sketches import (
    heavy_hitters,
    space_saving_candidates,
)
from json_ld_spark.operators.stats import histogram_quantiles, ks_two_sample


def _zipf_items(spark):
    # 4 heavy items (freqs 4000/2000/1000/600 of 10000) + a 2400-item
    # hapax tail; k=10 → threshold 1000, so exactly hot0/hot1 qualify
    # strictly and hot2 (=1000) does NOT (strict >)
    rows = (
        [("hot0",)] * 4000 + [("hot1",)] * 2000 + [("hot2",)] * 1000
        + [("hot3",)] * 600 + [(f"tail{i}",) for i in range(2400)]
    )
    return spark.createDataFrame(rows, "item string").repartition(8)


def test_heavy_hitters_exact_and_deterministic(spark):
    items = _zipf_items(spark)
    got = {r.item: (r.n_obs, r.share_ppm)
           for r in heavy_hitters(items, k=10, m=16).collect()}
    # strict > N/k: 4000 and 2000 pass, the boundary 1000 does not
    assert got == {"hot0": (4000, 400000), "hot1": (2000, 200000)}
    # same answer under a different partitioning (the determinism
    # claim that lets a plain SQL oracle gate a sketch)
    got2 = {r.item: (r.n_obs, r.share_ppm)
            for r in heavy_hitters(items.repartition(3), k=10, m=16)
            .collect()}
    assert got2 == got


def test_space_saving_bounds_state_and_keeps_heavies(spark):
    items = _zipf_items(spark).coalesce(2)
    cand = [r.item for r in
            space_saving_candidates(items, m=16).collect()]
    # state bound: ≤ m per partition
    assert len(cand) <= 16 * 2
    # SS guarantee: every item with partition freq > N_p/m survives —
    # globally that covers every true heavy hitter at k ≤ m
    assert {"hot0", "hot1", "hot2"} <= set(cand)


def test_histogram_quantiles_match_exact_on_uniform(spark):
    # 1..1000 uniform: every estimate must sit within one bin width
    # of the exact nearest-rank percentile
    df = spark.range(1, 1001).select(F.col("id").alias("v"))
    rows = histogram_quantiles(df, "v", n_bins=50,
                               permille=(100, 500, 900)).collect()
    assert len(rows) == 3
    width = 1000 / 50
    for r in rows:
        exact = (r.permille * 1000 + 999) // 1000  # value == rank here
        assert abs(r.est - exact) <= width, (r.permille, r.est, exact)
    # median of uniform 1..1000 interpolates to its exact rank
    med = {r.permille: r.est for r in rows}[500]
    assert abs(med - 500) <= width


def test_ks_detects_planted_shift(spark):
    a = [(v, True) for v in range(100) for _ in range(10)]
    b = [(v + 50, False) for v in range(100) for _ in range(10)]
    df = spark.createDataFrame(a + b, "v long, side boolean")
    row = ks_two_sample(df, "v", "side").collect()[0]
    assert row.n_a == 1000 and row.n_b == 1000
    # half the mass is disjoint → KS = 0.5 exactly in ppm
    assert row.ks_ppm == 500000
    # max first attained where A's CDF reaches 0.5 and B is still 0
    assert row.at_value == 49


def test_ks_identical_samples_zero(spark):
    rows = [(v, s) for v in range(50) for s in (True, False)]
    df = spark.createDataFrame(rows, "v long, side boolean")
    row = ks_two_sample(df, "v", "side").collect()[0]
    assert row.ks_ppm == 0


def test_hyperball_equals_sketch_of_exact_ball(spark):
    from json_ld_spark.operators.graph import hyperball
    from json_ld_spark.operators.sketches import hll_distinct

    # two chains sharing no nodes + a star
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),
         ("x", "y"), ("hub", "s1"), ("hub", "s2"), ("hub", "s3")],
        "src string, dst string",
    )
    got = {r.node: (r.nonempty, r.s_scaled, r.est)
           for r in hyperball(edges, k=2, b=8).collect()}
    # exact undirected 2-balls
    balls = {
        "a": {"a", "b", "c"}, "b": {"a", "b", "c", "d"},
        "c": {"a", "b", "c", "d"}, "d": {"b", "c", "d"},
        "x": {"x", "y"}, "y": {"x", "y"},
        "hub": {"hub", "s1", "s2", "s3"},
        "s1": {"hub", "s1", "s2", "s3"},
        "s2": {"hub", "s1", "s2", "s3"},
        "s3": {"hub", "s1", "s2", "s3"},
    }
    # HyperBall's max-merged registers must equal the registers of a
    # direct HLL sketch over the exact ball membership — the identity
    # the oracle relies on
    rows = [(v, u) for v, ball in balls.items() for u in ball]
    direct = {
        r.v: (r.nonempty, r.s_scaled, r.est)
        for r in hll_distinct(
            spark.createDataFrame(rows, "v string, u string"), "v", "u", b=8
        ).collect()
    }
    assert got == direct
    # with 256 registers and tiny balls, linear counting is near-exact
    for v, ball in balls.items():
        assert abs(got[v][2] - len(ball)) < 0.5, (v, got[v][2], len(ball))
