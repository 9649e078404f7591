"""Shared helpers for the ops layer."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout(df: DataFrame, *cols, factor: int = 2) -> DataFrame:
    """Repartition with an EXPLICIT partition count to spread
    compute-bound work across every core.

    `repartition(col)` alone lets AQE coalesce by shuffle BYTES — a few
    MB of documents collapse to one partition even when each row costs
    milliseconds of regex/hash work downstream (AQE can't see compute
    cost). An explicit count pins the fan-out. factor=2 over the
    cluster's default parallelism keeps tasks small enough for stragglers
    to balance without drowning the scheduler; on a real cluster
    defaultParallelism scales with executors, so this stays proportional
    at any size.

    At 100 TB the input already arrives in tens of thousands of splits,
    and an unconditional repartition becomes a gratuitous full shuffle
    of the corpus bytes — the most expensive possible no-op. So the
    fan-out is CONDITIONAL: if the input already has >= the target
    partition count, pass it through untouched (the small-input case
    the docstring above argues for simply never fires at scale).

    The partition probe itself (`df.rdd.getNumPartitions()`) forces a
    physical-plan translation per call — cheap interactively, wasteful
    in a pipeline that calls fanout hundreds of times on inputs known
    to be wide. Set `spark.icelake.fanout.enabled=false` to make every
    fanout a static pass-through (no probe, no shuffle); default true
    keeps the adaptive behavior.
    """
    spark = df.sparkSession
    if spark.conf.get("spark.icelake.fanout.enabled", "true") == "false":
        return df
    n = spark.sparkContext.defaultParallelism * factor
    try:
        if df.rdd.getNumPartitions() >= n:
            return df
    except Exception:
        pass  # plans that can't cheaply answer (e.g. streaming) still fan out
    if cols:
        return df.repartition(n, *cols)
    return df.repartition(n)
