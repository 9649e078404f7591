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
    counts = df.groupBy(*cols).agg(F.count("*").alias("n"))
    # ONE scan: the total re-aggregates counts' shuffle output (tiny,
    # and Spark reuses the shuffle files), not the input (review r12 —
    # df.count() was a second full-scan job)
    total = counts.agg(F.sum("n").alias("__t"))
    return (counts.crossJoin(F.broadcast(total))
            .withColumn("share", F.round(F.col("n") / F.col("__t"), 6))
            .drop("__t")
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

    CAVEAT (content-salt limit): rows of a hot key that are
    BYTE-IDENTICAL across every hashable column share one salt — a
    key-only projection (e.g. probe.select("k")) gets no spread at
    all. That is the price of retry-determinism (a per-row id salt
    re-routes rows on task recomputation — the SPARK-23207
    lost/duplicated-row class). If your probe is a pure-duplicate
    projection, keep a distinguishing column in it (any unique id) or
    pre-aggregate the duplicates before joining.
    """
    if how.lower() not in _SALTABLE:
        raise ValueError(f"salted_join cannot preserve '{how}' semantics; "
                         f"use one of {sorted(_SALTABLE)}")
    from pyspark.sql.types import MapType

    # salt correctness is distribution-only (the build side carries every
    # salt value, so any row joins correctly whatever salt it gets) —
    # but it must be DETERMINISTIC under task retry: a salt mixing
    # monotonically_increasing_id changes on recomputation after a
    # fetch failure and re-routes rows across already-consumed shuffle
    # partitions (the SPARK-23207 lost/duplicated-row class; review
    # r12 — the module docstring's own invariant). Content-only
    # hashing is retry-stable; the cost is that byte-identical
    # duplicate rows share a salt (only degenerate all-duplicate hot
    # keys lose spread). Map-typed columns are skipped (xxhash64
    # rejects maps).
    hashable = [F.col(f.name) for f in probe.schema.fields
                if not isinstance(f.dataType, MapType)]
    probe_salt = (F.pmod(F.xxhash64(*hashable), F.lit(salts)).cast("int")
                  if hashable else F.lit(0))
    p = probe.withColumn(_SALT, probe_salt)
    b = build.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    out = p.join(b, on + [_SALT], how)
    return out.drop(_SALT)


def skew_aware_join(probe: DataFrame, build: DataFrame, on: list[str],
                    how: str = "inner", salts: int = 8,
                    sample_fraction: float = 0.02,
                    hot_min: int = 100,
                    max_hot: int = 100) -> DataFrame:
    """Equi-join that salts ONLY detected hot keys.

    Static salting (salted_join) pays a `salts`× build replication on
    every row whether or not the data is skewed — a pure cost on uniform
    keys. Here ONE cheap job over a key-column sample finds keys with
    ≥ `hot_min` sampled occurrences (≈ hot_min/sample_fraction probe
    rows — "too big for one reducer" is an absolute row count, so the
    threshold doesn't scale with table size); at most `max_hot` keys are
    collected to the driver. Only those keys get spread over `salts`
    sub-partitions and replicated on the build side — everything else
    joins at salt 0 with no replication, in the same single join. With
    no hot keys the plain join is returned untouched, leaving
    broadcast/AQE (spark.sql.adaptive.skewJoin) to do their normal
    work — at scale AQE's runtime skew split is the first line of
    defense; this operator is for skew AQE can't fix (hot key inside
    one shuffle block, non-sort-merge contexts).
    """
    if how.lower() not in _SALTABLE:
        raise ValueError(f"skew_aware_join cannot preserve '{how}'; "
                         f"use one of {sorted(_SALTABLE)}")
    hot_rows = (probe.select(*on).sample(fraction=sample_fraction, seed=42)
                .groupBy(*on).agg(F.count("*").alias("__n"))
                .where(F.col("__n") >= hot_min)
                .orderBy(F.desc("__n")).limit(max_hot).collect())
    if not hot_rows:
        return probe.join(build, on, how)

    def _is_hot(side: DataFrame):
        cond = None
        for r in hot_rows:
            clause = None
            for c in on:
                eq = side[c].eqNullSafe(F.lit(r[c]))
                clause = eq if clause is None else (clause & eq)
            cond = clause if cond is None else (cond | clause)
        return cond

    from pyspark.sql.types import MapType

    # same salt rules as salted_join: retry-deterministic content
    # hash only (review r12), map columns are not hashable
    hashable = [F.col(f.name) for f in probe.schema.fields
                if not isinstance(f.dataType, MapType)]
    salt_expr = (F.pmod(F.xxhash64(*hashable), F.lit(salts)).cast("int")
                 if hashable else F.lit(0))
    p = probe.withColumn(_SALT, F.when(
        _is_hot(probe), salt_expr).otherwise(F.lit(0)))
    b = build.withColumn(_SALT, F.explode(F.when(
        _is_hot(build),
        F.array(*[F.lit(i) for i in range(salts)]))
        .otherwise(F.array(F.lit(0)))))
    return p.join(b, on + [_SALT], how).drop(_SALT)


def count_distinct_skewed(df: DataFrame, key_cols: list[str],
                          value_col: str) -> DataFrame:
    """Exact per-key distinct count that never funnels a hot key's
    values through one reducer: stage 1 dedups on (key, value) — the
    shuffle spreads by value too — stage 2 counts per key.

    COUNT(DISTINCT) semantics: count(value_col) skips the NULL row a
    null-bearing key contributes after the dedup, so an all-NULL key
    reports 0 (not 1) and mixed keys don't count NULL as a value."""
    return (df.select(*key_cols, value_col).distinct()
            .groupBy(*key_cols)
            .agg(F.count(value_col).alias("n_distinct")))
