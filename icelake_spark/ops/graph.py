"""Iterative graph analytics, Spark-first: the loop lives on the
driver but every iteration is a declarative join + aggregate (the same
discipline as ops/similarity.train_kmeans). Arithmetic is INTEGER
throughout (micro-rank units with floor division), so the fixpoint is
bit-identical on any engine / partitioning and the DuckDB oracle can
unroll the loop as CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 10 ** 12  # integer rank units: 1.0 == 10^12


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = 3, damping_pct: int = 85) -> DataFrame:
    """PageRank over an UNDIRECTED edge list (each edge contributes in
    both directions), `iters` synchronous iterations:

        pr' = (100-d)%/n + d% * sum_{u~v} pr(u) DIV deg(u)

    in integer RANK_SCALE units with floor division at every step —
    deterministic and engine-portable (float contribution sums depend
    on reduction order; integer sums cannot). Returns (node, rank).

    100 TB shape: per iteration one shuffle keyed by the edge endpoint
    (join pr to edges) and one map-side-combined sum keyed by node;
    degree and node tables are computed once. The only driver values
    are the node COUNT (one scalar) and the loop counter."""
    und = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .union(edges.select(F.col(dst).alias("a"),
                               F.col(src).alias("b")))
           .distinct()
           .localCheckpoint())
    nodes = und.select(F.col("a").alias("node")).distinct() \
        .localCheckpoint()
    n = nodes.count()
    if n == 0:
        # an empty edge set (a filtered slice with no rows) yields an
        # empty rank table, not a ZeroDivisionError
        return nodes.select("node", F.lit(0).cast("long").alias("rank"))
    # checkpoint: deg sits inside EVERY iteration's join — left lazy,
    # each iteration re-runs the degree aggregate over the edge set
    deg = und.groupBy("a").agg(F.count("*").alias("deg")).localCheckpoint()
    base = ((100 - damping_pct) * RANK_SCALE) // (100 * n)
    pr = nodes.select("node", F.lit(RANK_SCALE // n).alias("rank"))
    for _ in range(iters):
        contrib = (und.join(pr, und["a"] == pr["node"])
                   .join(deg, on="a")
                   .select(F.col("b").alias("node"),
                           F.expr("rank DIV deg").alias("c")))
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        pr = (nodes.join(sums, on="node", how="left")
              .select("node",
                      (F.lit(base)
                       + F.expr(f"({damping_pct} * COALESCE(s, 0)) "
                                f"DIV 100")).cast("long").alias("rank")))
    return pr
