"""Continuous aggregates (hypertable-style rollups): materialize a
windowed aggregation of a source Iceberg table into a rollup Iceberg
table, refreshed incrementally from snapshot diffs.

The rollup table tracks the last-processed source snapshot in its
properties; each refresh reads only the files added since (incremental
scan), re-aggregates the affected time buckets, and upserts them —
classic incremental view maintenance composed entirely from the table
layer (snapshot diff) + the CDC layer (upsert by bucket key).

Scale: a refresh touches O(new data) + O(affected buckets), never the
full history. Works for any associative aggregate re-expressible as a
group-by over (bucket, keys) — counts/sums here; avg = sum+count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PROP_SOURCE_SNAPSHOT = "rollup.source-snapshot-id"


def create_rollup(catalog, source_table, identifier: str, spark: SparkSession,
                  ts_col: str = "ts", bucket: str = "1 hour",
                  group_cols: list[str] | None = None,
                  value_col: str | None = None):
    """Create the rollup table and backfill it from the source's current
    snapshot. Returns the rollup IcebergTable."""
    from .types import Schema

    group_cols = group_cols or []
    agg_df = _aggregate(source_table.to_df(spark), ts_col, bucket,
                        group_cols, value_col)
    schema = Schema.from_spark(agg_df.schema).with_identifier_fields(
        "bucket_start", *group_cols)
    t = catalog.create_table(identifier, schema, properties={
        PROP_SOURCE_SNAPSHOT: str(source_table.current_snapshot().snapshot_id
                                  if source_table.current_snapshot() else 0),
        "rollup.ts-col": ts_col, "rollup.bucket": bucket,
        "rollup.group-cols": ",".join(group_cols),
        "rollup.value-col": value_col or "",
    })
    # persist: take(1) + append would otherwise run the full source
    # aggregation twice (review r11)
    agg_df = agg_df.persist()
    try:
        if agg_df.take(1):
            t.append(agg_df)
    finally:
        agg_df.unpersist()
    return t


def refresh_rollup(rollup_table, source_table, spark: SparkSession) -> int:
    """Incremental refresh: detect the time buckets touched by any
    change since the last refresh — inserts AND deletes, via the
    changelog — recompute only those buckets from the source, upsert
    them, and delete rollup rows whose bucket vanished entirely.
    Returns the number of bucket rows written (refreshed + deleted)."""
    from .changelog import changes
    from .delta import OP_DELETE, OP_INSERT, merge_delta

    props = rollup_table.metadata.properties
    last = int(props.get(PROP_SOURCE_SNAPSHOT, "0")) or None
    ts_col = props.get("rollup.ts-col", "ts")
    bucket = props.get("rollup.bucket", "1 hour")
    group_cols = [c for c in props.get("rollup.group-cols", "").split(",") if c]
    value_col = props.get("rollup.value-col") or None

    known = {s.snapshot_id for s in source_table.metadata.snapshots}
    # full-resync triggers: the sync point was EXPIRED from the source,
    # OR the source was ROLLED BACK past it (still in metadata.snapshots
    # but no longer an ancestor of the head — an incremental changelog
    # from there would exclude the whole live lineage and return empty,
    # leaving rollup rows that aggregate rolled-back data alive forever)
    on_lineage = (last is None
                  or last in source_table.metadata.ancestry_ids())
    if last is not None and (last not in known or not on_lineage):
        # the changelog can no longer be computed from the sync point —
        # fall back to refreshing every bucket rather than wedging
        # permanently. The touched set must include the ROLLUP's own
        # buckets too: a bucket whose source rows were all deleted is
        # absent from `full`, and skipping it would leave its stale
        # rollup row alive forever.
        full = _aggregate(source_table.to_df(spark), ts_col, bucket,
                          group_cols, value_col)
        touched = (full.select("bucket_start")
                   .union(rollup_table.to_df(spark).select("bucket_start"))
                   .distinct())
    else:
        inc = changes(source_table, spark, from_snapshot_id=last)
        if not inc.take(1):
            return 0
        # affected buckets need FULL recomputation (a bucket may span
        # old + new data) — recompute only those buckets from the source
        touched = (_aggregate(inc, ts_col, bucket, group_cols, value_col)
                   .select("bucket_start").distinct())
        # Bound the source re-aggregation to the touched ts RANGE. The
        # touched set is broadcast-small by construction (it feeds two
        # broadcast joins below), so collecting it is bounded; the
        # resulting ts predicate reaches the parquet zone maps and the
        # refresh scans O(affected buckets) — the module's contract.
        # Without it the semi-join sat ABOVE the aggregation, which
        # Catalyst cannot push through a groupBy, so every refresh
        # rescanned and re-aggregated the FULL source (review r13).
        # Gap-safety: rows between non-contiguous touched buckets pass
        # the range filter but are discarded by the bucket_start
        # semi-join below. NULL-ts rows form the NULL bucket and fail
        # every range comparison, so they are admitted explicitly
        # whenever the NULL bucket was touched.
        schema = touched.schema
        starts = [r[0] for r in touched.collect()]
        # rebuild the touched set as a LOCAL DataFrame: the two
        # broadcast joins below then carry no changelog lineage at all
        # (pre-r13 that lineage — manifest decoding, delete-file reads,
        # anti-joins — was persisted to avoid re-running per join;
        # collecting once replaces the cache outright)
        touched = spark.createDataFrame([(s,) for s in starts], schema)
        non_null = [s for s in starts if s is not None]
        src_kwargs = {}
        if non_null and len(non_null) == len(starts):
            # ... and as a PLANNER filter too, so zone-map FILE pruning
            # drops untouched-history files from the scan list outright
            # (the .where alone reaches only parquet row-group stats —
            # every file's footer would still be opened). Skipped when
            # the NULL bucket is touched: NULL-ts rows carry no ts
            # bounds for the pruner to reason about.
            hi = spark.range(1).select(
                (F.lit(max(non_null))
                 + F.expr(f"INTERVAL {bucket}")).alias("h")).first()["h"]
            lo_iso = min(non_null).isoformat(sep=" ")
            src_kwargs["filter"] = (f"{ts_col} >= '{lo_iso}' AND "
                                    f"{ts_col} < '{hi.isoformat(sep=' ')}'")
        src = source_table.to_df(spark, **src_kwargs)
        if non_null:
            in_range = ((F.col(ts_col) >= F.lit(min(non_null))) &
                        (F.col(ts_col) < F.lit(max(non_null))
                         + F.expr(f"INTERVAL {bucket}")))
            cond = (in_range | F.col(ts_col).isNull()
                    if len(non_null) < len(starts) else in_range)
        else:  # only the NULL bucket was touched
            cond = F.col(ts_col).isNull()
        full = _aggregate(src.where(cond), ts_col, bucket,
                          group_cols, value_col)
    # persist the touched-bucket set: in the FALLBACK branch its lineage
    # is the full source aggregation union the rollup read, which feeds
    # TWO broadcast joins (refreshed + existing) and would otherwise run
    # once per join (review r11; the incremental branch is a local DF)
    touched = touched.persist()
    refreshed = full.join(F.broadcast(touched), on="bucket_start",
                          how="left_semi")
    keys = ["bucket_start"] + group_cols
    # rollup rows in a touched bucket whose (bucket, keys) no longer
    # exist in the source — e.g. every row of the group was deleted.
    # The anti-join must be NULL-SAFE on the group keys: with a plain
    # equality join a NULL-keyed rollup row never matches its refreshed
    # twin, gets classified vanished, and the delete then suppresses the
    # re-insert (last-wins) — the NULL-key bucket row would oscillate.
    existing = (rollup_table.to_df(spark)
                .join(F.broadcast(touched), on="bucket_start", how="left_semi")
                .alias("__ex"))
    refreshed_k = refreshed.select(*keys).alias("__rk")
    null_safe = None
    for k in keys:
        term = F.col(f"__ex.{k}").eqNullSafe(F.col(f"__rk.{k}"))
        null_safe = term if null_safe is None else (null_safe & term)
    vanished = existing.join(refreshed_k, on=null_safe,
                             how="left_anti").select(*[
                                 F.col(f"__ex.{c}") for c in existing.columns])
    # persist before counting: count() would otherwise evaluate the full
    # refresh lineage (source aggregation + both joins) once, and
    # merge_delta's own persist (below batch's lineage) a second time
    batch = (refreshed.withColumn("_op", F.lit(OP_INSERT))
             .unionByName(vanished.withColumn("_op", F.lit(OP_DELETE)))
             .persist())
    try:
        n = batch.count()
        merge_delta(rollup_table, batch, key_cols=keys, op_col="_op")
    finally:
        batch.unpersist()
        touched.unpersist()
    rollup_table.set_properties({
        PROP_SOURCE_SNAPSHOT: str(source_table.current_snapshot().snapshot_id)})
    return n


def _aggregate(df: DataFrame, ts_col: str, bucket: str,
               group_cols: list[str], value_col: str | None) -> DataFrame:
    g = [F.window(F.col(ts_col), bucket).alias("__w")] + [
        F.col(c) for c in group_cols]
    aggs = [F.count("*").alias("n")]
    if value_col:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    return (df.groupBy(*g).agg(*aggs)
            .select(F.col("__w.start").alias("bucket_start"),
                    *group_cols, *[a for a in
                                   (["n"] + ([f"sum_{value_col}"] if value_col else []))]))
