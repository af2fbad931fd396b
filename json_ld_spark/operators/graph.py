"""Graph analytics over the emitted KG: entity importance.

PageRank with a FIXED-ITERATION, engine-replayable recipe (the same
determinism policy as the trained IVF codebook): no RNG, no
convergence test, ranks rounded per iteration — any SQL engine that
replays the recipe reproduces the ranks bit-for-bit, which is what
lets the driver's DuckDB oracle gate the whole computation.

Scale design:
  - the edge table is checkpointed once; each iteration is one
    join + one groupBy (two shuffles) over (node, rank) pairs — the
    rank table is |V| rows, edges |E|; both partition on node id.
  - undirected input is symmetrized (both directions), so there are
    no dangling nodes and the mass-conservation term is just the
    teleport factor.
  - O(n_iters) rounds with per-round lineage cuts (cut_lineage), the
    same iterative-operator discipline as connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from json_ld_spark.plans.checkpoints import cut_lineage


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iters: int = 3,
    damping: float = 0.85,
    round_dp: int = 6,
    checkpoint_dir: "str | None" = None,
) -> DataFrame:
    """(node, rank) after ``n_iters`` power iterations over the
    SYMMETRIZED edge set (input treated as undirected).

    rank_0 = round(1/N, dp); rank_{k+1}(v) = round((1−d)/N +
    d · Σ_{u→v} rank_k(u)/deg(u), dp). Rounding per iteration is what
    makes the result engine-reproducible (absorbs summation-order
    noise); with no dangling nodes the recipe conserves mass up to
    rounding."""
    und = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("t")))
        .filter(F.col("s") != F.col("t"))
        .dropDuplicates()
    )
    und = cut_lineage(und, checkpoint_dir)
    nodes = und.select(F.col("s").alias("node")).distinct()
    n = nodes.count()  # scalar parameter of the recipe (N)
    deg = und.groupBy("s").agg(F.count("*").alias("_deg"))
    ranks = nodes.select(
        "node", F.round(F.lit(1.0 / n), round_dp).alias("rank")
    )
    for _ in range(n_iters):
        contrib = (
            und.join(ranks.withColumnRenamed("node", "s"), "s")
            .join(deg, "s")
            .select(
                F.col("t").alias("node"),
                (F.col("rank") / F.col("_deg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = cut_lineage(
            nodes.join(contrib, "node", "left").select(
                "node",
                F.round(
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0)),
                    round_dp,
                ).alias("rank"),
            ),
            checkpoint_dir,
            eager=False,
        )
    return ranks
