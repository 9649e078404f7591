"""Skew-handling utilities for hot-key joins and aggregations.

At 1000-executor scale a single hot join/group key serializes one
reducer; AQE's skew-join split (spark.sql.adaptive.skewJoin) handles
sort-merge joins automatically, but salting is still needed when the
skew survives AQE (hot key inside one shuffle block, aggregation-side
skew, or a non-AQE context). These operators implement it with
deterministic salts — task retries must reproduce identical output, so
we derive the salt from row content (xxhash64) instead of rand().

The reference (a single-process table-format library) has no analogue;
this belongs to the engine layer its tests delegate to Spark
(/root/reference/testdata/python/check.py uses Spark as the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

# join types whose semantics survive replicating the build side: every
# probe row sees the full build relation at its own salt, and no build
# row can be emitted unmatched (which replication would duplicate).
_SALTABLE = {"inner", "left", "left_outer", "leftouter",
             "left_semi", "leftsemi", "left_anti", "leftanti"}


def heavy_hitters(df: DataFrame, cols: list[str], top: int = 20) -> DataFrame:
    """Key-frequency diagnostic: the `top` most frequent key tuples with
    their share of all rows — decide whether a join needs salting."""
    total = df.count()
    return (df.groupBy(*cols).agg(F.count("*").alias("n"))
            .withColumn("share", F.round(F.col("n") / F.lit(total), 6))
            .orderBy(F.desc("n"), *cols)
            .limit(top))


def salted_join(probe: DataFrame, build: DataFrame, on: list[str],
                how: str = "inner", salts: int = 8) -> DataFrame:
    """Equi-join with the probe side's hot keys spread over `salts`
    sub-partitions and the build side replicated `salts` times.

    Probe rows get a deterministic content-derived salt; build rows are
    exploded once per salt value, so (key, salt) partitioning splits a
    hot key across `salts` reducers at the cost of a `salts`× larger
    build shuffle — the right trade when |build| ≪ |probe| but build is
    too large (or the planner declines) to broadcast.
    """
    if how.lower() not in _SALTABLE:
        raise ValueError(f"salted_join cannot preserve '{how}' semantics; "
                         f"use one of {sorted(_SALTABLE)}")
    probe_salt = F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]),
                        F.lit(salts)).cast("int")
    p = probe.withColumn(_SALT, probe_salt)
    b = build.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    out = p.join(b, on + [_SALT], how)
    return out.drop(_SALT)


def count_distinct_skewed(df: DataFrame, key_cols: list[str],
                          value_col: str) -> DataFrame:
    """Exact per-key distinct count that never funnels a hot key's
    values through one reducer: stage 1 dedups on (key, value) — the
    shuffle spreads by value too — stage 2 counts per key."""
    return (df.select(*key_cols, value_col).distinct()
            .groupBy(*key_cols)
            .agg(F.count("*").alias("n_distinct")))
