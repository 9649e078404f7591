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
             iters: int = 3, damping_pct: int = 85,
             materialize: bool = False) -> DataFrame:
    """PageRank over an UNDIRECTED edge list (each edge contributes in
    both directions), `iters` synchronous iterations:

        pr' = (100-d)%/n + d% * sum_{u~v} pr(u) DIV deg(u)

    in integer RANK_SCALE units with floor division at every step —
    deterministic and engine-portable (float contribution sums depend
    on reduction order; integer sums cannot). Returns (node, rank).

    100 TB shape (r13 restructure — measured, see OPTIMIZATION_r13.md):
    the undirected edge set is repartitioned BY THE JOIN KEY `a` before
    its one materialization, and the per-node degree is pre-joined into
    it ONCE, so the loop-invariant edge relation is never shuffled and
    never re-joined inside the loop — each iteration exchanges only the
    n-row rank table (join to edges) and the map-side-combined
    contribution sums (groupBy node). The old shape shuffled the edge
    set AND re-joined deg every iteration: 2 extra corpus-sized
    exchanges per iteration. Node table and count both derive from deg
    (every node of the undirected set appears as `a`), removing a
    distinct + checkpoint + count pass over the edges. The only driver
    values are the node COUNT (one scalar) and the loop counter.

    Cache lifecycle: by default the returned frame still READS the
    persisted edge/degree relations, so they cannot be unpersisted here
    — they stay in the session's CacheManager until evicted (LRU,
    spillable) or the caller runs `spark.catalog.clearCache()`. Pass
    `materialize=True` to pay one eager localCheckpoint of the final
    n-row rank table inside this call and get the edge/degree caches
    RELEASED before returning (identical values — the ranks are
    integer arithmetic, partitioning-independent); callers looping
    over many graphs in one session should use that (VERDICT r13 #8)."""
    spark = edges.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    # partition by the loop's join key BEFORE materializing: an
    # InMemoryRelation PRESERVES its child's hashpartitioning (a
    # localCheckpoint does NOT — its LogicalRDD reports
    # UnknownPartitioning, so every iteration re-exchanged the edge
    # set; measured r13), so the per-iteration join reuses the cached
    # layout instead of re-shuffling the corpus-sized relation. persist
    # spills to disk gracefully at scale — the standard loop-invariant
    # edge-set idiom.
    # ONE exchange, not two (guide §2.4, r14): repartition by the
    # loop's join key FIRST, then dedup — hashpartitioning(a) satisfies
    # the (a, b) aggregate's clustering requirement (same-key rows
    # share a partition), so dropDuplicates adds NO exchange, where the
    # old distinct().repartition(n, "a") shuffled the edge set by
    # (a, b) and then AGAIN by a. The dedup output keeps the a-layout
    # the cache and the per-iteration join reuse. Set semantics make
    # the result identical either way.
    und = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .union(edges.select(F.col(dst).alias("a"),
                               F.col(src).alias("b")))
           .repartition(n_part, "a")
           .dropDuplicates(["a", "b"])
           .persist())
    # deg groups by the cached partitioning key — no exchange — and
    # doubles as the node table: the undirected union has every node
    # as `a`, so the old separate distinct + checkpoint + count pass
    # over the edges is gone
    deg = und.groupBy("a").agg(F.count("*").alias("deg")).persist()
    n = deg.count()
    if n == 0:
        # an empty edge set (a filtered slice with no rows) yields an
        # empty rank table, not a ZeroDivisionError
        return deg.select(F.col("a").alias("node"),
                          F.lit(0).cast("long").alias("rank"))
    # pre-join the degree into the edge set ONCE (both sides cached
    # partitioned by a — no exchange); the loop then needs one join,
    # not two. deg rides each edge row (one long), traded against an
    # n_edges-row join per iteration.
    und_deg = (und.join(deg, on="a")
               .select("a", "b", "deg")
               .persist())
    und_deg.count()  # materialize, then release the raw edge cache
    und.unpersist()
    nodes = deg.select(F.col("a").alias("node"))
    base = ((100 - damping_pct) * RANK_SCALE) // (100 * n)
    pr = nodes.select("node", F.lit(RANK_SCALE // n).alias("rank"))
    for i in range(iters):
        contrib = (und_deg.join(pr, und_deg["a"] == pr["node"])
                   .select(F.col("b").alias("node"),
                           F.expr("rank DIV deg").alias("c")))
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        pr = (nodes.join(sums, on="node", how="left")
              .select("node",
                      (F.lit(base)
                       + F.expr(f"({damping_pct} * COALESCE(s, 0)) "
                                f"DIV 100")).cast("long").alias("rank")))
        # bound the analyzed-plan size: without a lineage cut the rank
        # table's plan embeds one join+agg+join layer per iteration
        # and Catalyst cost grows superlinearly in `iters` (the
        # connected_components round-20 driver-OOM failure mode). Cut
        # every 4th iteration — the n-row rank table is bytes per node,
        # values are integer arithmetic (partitioning-independent), and
        # the DEFAULT iters=3 never reaches the cut so the common path
        # is unchanged. eager=False: the next iteration's join
        # materializes it in its own job.
        if (i + 1) % 4 == 0 and (i + 1) < iters:
            pr = pr.localCheckpoint(eager=False)
    if materialize:
        # pin the final rank table (bytes per node), then release the
        # loop-invariant caches — the caller's session accumulates
        # nothing per pagerank call
        pr = pr.localCheckpoint()
        und_deg.unpersist()
        deg.unpersist()
    return pr
