"""Continuous aggregate (hypertable-style rollup): backfill +
incremental refresh from snapshot diffs equals the full aggregation."""

from pyspark.sql import functions as F

from icelake_spark.rollup import create_rollup, refresh_rollup
from icelake_spark.types import Schema


def _now_plus() -> int:
    import time

    return int(time.time() * 1000) + 1000


def test_rollup_incremental_refresh(spark, warehouse):
    from icelake_spark.queries import load_events

    ev = load_events(spark, "/root/testdata/sf0.001")
    src = warehouse.create_table("db.ev", Schema.from_spark(ev.schema))
    src.append(ev.where("event_id < 500"))
    roll = create_rollup(warehouse, src, "db.ev_hourly", spark,
                         ts_col="ts", bucket="1 hour",
                         group_cols=["event_type"], value_col="value")
    n_backfill = roll.to_df(spark).count()
    assert n_backfill > 0

    src.append(ev.where("event_id >= 500"))
    n_ref = refresh_rollup(roll, src, spark)
    assert n_ref > 0

    expect = (src.to_df(spark)
              .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
              .select(F.col("w.start").alias("bucket_start"), "event_type",
                      "n", "sum_value"))
    got = roll.to_df(spark)
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0

    # idempotent: nothing new → no work, state unchanged
    assert refresh_rollup(roll, src, spark) == 0
    assert roll.to_df(spark).count() == expect.count()


def test_refresh_applies_source_deletes(spark, warehouse):
    import datetime as dt

    from icelake_spark.rollup import create_rollup, refresh_rollup
    from icelake_spark.types import Schema

    rows = [(dt.datetime(2024, 1, 1, h, m), f"u{m % 2}", float(h))
            for h in range(3) for m in range(10)]
    src_df = spark.createDataFrame(rows, "ts timestamp, user string, value double")
    src = warehouse.create_table("db.ev_del", Schema.from_spark(src_df.schema))
    src.append(src_df)
    r = create_rollup(warehouse, src, "db.ev_del_rollup", spark,
                      ts_col="ts", bucket="1 hour", group_cols=["user"],
                      value_col="value")
    # delete hour 1 completely and half of hour 2
    src.delete_where(spark, "hour(ts) = 1")
    src.delete_where(spark, "hour(ts) = 2 AND user = 'u0'")
    refresh_rollup(r, src, spark)
    got = {(row.bucket_start.hour, row.user): row.n
           for row in r.to_df(spark).collect()}
    # hour 0 untouched; hour 1 rows fully gone; hour 2 only u1 remains
    assert got == {(0, "u0"): 5, (0, "u1"): 5, (2, "u1"): 5}
    # idempotent: nothing to do on a second refresh
    assert refresh_rollup(r, src, spark) == 0


def test_refresh_survives_expired_source_snapshot(spark, warehouse):
    """If the recorded source sync point was expired, refresh falls back
    to a full-bucket recompute instead of raising KeyError forever."""
    from icelake_spark.maintenance import expire_snapshots
    from icelake_spark.rollup import create_rollup, refresh_rollup
    from icelake_spark.types import Schema

    src_df = spark.createDataFrame(
        [(i, f"2024-01-01 0{i % 5}:00:00", float(i)) for i in range(20)],
        "event_id long, ts string, value double").selectExpr(
        "event_id", "cast(ts as timestamp) as ts", "value")
    s = warehouse.create_table("db.rexp_src", Schema.from_spark(src_df.schema))
    s.append(src_df)
    r = create_rollup(warehouse, s, "db.rexp_roll", spark, ts_col="ts",
                      bucket="1 hour", group_cols=[], value_col="value")
    s = s.refresh()
    s.append(src_df.selectExpr("event_id + 100 as event_id", "ts", "value"))
    s = s.refresh()
    s.append(src_df.selectExpr("event_id + 200 as event_id", "ts", "value"))
    s = s.refresh()
    expire_snapshots(s, older_than_ms=_now_plus(), retain_last=1)
    s = s.refresh()
    n = refresh_rollup(r, s, spark)
    assert n > 0
    got = {row.bucket_start.hour: row.n for row in r.refresh().to_df(spark).collect()}
    assert got[0] == 12  # 4 per batch x 3 batches for hour 0


def test_refresh_null_group_key_is_stable(spark, warehouse):
    """A NULL group key must survive repeated refreshes: the vanished-row
    anti-join is null-safe, so the (bucket, NULL) row is neither deleted
    nor duplicated when nothing changed (review r3)."""
    import datetime as dt

    from icelake_spark.rollup import create_rollup, refresh_rollup
    from icelake_spark.table import IcebergTable
    from icelake_spark.types import Schema

    rows = [(dt.datetime(2023, 1, 1, 0, 5), None, 1.0),
            (dt.datetime(2023, 1, 1, 0, 10), "us", 2.0)]
    df = spark.createDataFrame(rows, "ts timestamp, country string, value double")
    src = warehouse.create_table("db.null_src", Schema.from_spark(df.schema))
    src.append(df)
    src = src.refresh()
    roll = create_rollup(warehouse, src, "db.null_roll", spark,
                         group_cols=["country"], value_col="value")
    base = sorted((str(r.country), r.n) for r in roll.to_df(spark).collect())
    assert ("None", 1) in base
    # touch the bucket so the NULL row enters the vanished-check path
    src.append(spark.createDataFrame(
        [(dt.datetime(2023, 1, 1, 0, 20), "us", 5.0)],
        "ts timestamp, country string, value double"))
    src = src.refresh()
    refresh_rollup(roll, src, spark)
    roll = IcebergTable.load(roll.path)
    got = sorted((str(r.country), r.n) for r in roll.to_df(spark).collect())
    assert ("None", 1) in got and ("us", 2) in got
    # refresh again with no changes: still exactly one NULL-key row
    refresh_rollup(IcebergTable.load(roll.path), src, spark)
    roll = IcebergTable.load(roll.path)
    nulls = [r for r in roll.to_df(spark).collect() if r.country is None]
    assert len(nulls) == 1


def test_rollup_full_resync_after_source_rollback(spark, warehouse):
    """A rolled-back source (sync point still in metadata but off the
    live lineage) must trigger a full resync — an incremental changelog
    from there is empty and stale buckets would survive forever."""
    import datetime as dt

    from icelake_spark.maintenance import rollback_to
    from icelake_spark.rollup import create_rollup, refresh_rollup
    from icelake_spark.table import IcebergTable
    from icelake_spark.types import Schema

    rows = [(dt.datetime(2023, 1, 1, 0, 5), 1.0)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    src = warehouse.create_table("db.rb_src", Schema.from_spark(df.schema))
    src.append(df)
    src = src.refresh()
    good = src.current_snapshot().snapshot_id
    # a second commit lands in a NEW hour bucket, then rollup syncs to it
    src.append(spark.createDataFrame(
        [(dt.datetime(2023, 1, 1, 2, 30), 9.0)], "ts timestamp, value double"))
    src = src.refresh()
    roll = create_rollup(warehouse, src, "db.rb_roll", spark, value_col="value")
    assert roll.to_df(spark).count() == 2
    # source rolls back: the 02:00 bucket's data no longer exists
    rollback_to(src, good)
    src = IcebergTable.load(src.path)
    refresh_rollup(IcebergTable.load(roll.path), src, spark)
    roll = IcebergTable.load(roll.path)
    got = [(r.bucket_start, r.n) for r in roll.to_df(spark).collect()]
    assert len(got) == 1 and got[0][1] == 1  # stale 02:00 bucket removed


def test_refresh_prunes_untouched_source_files(spark, warehouse):
    """An incremental refresh must scan O(affected buckets), not the
    full source: the touched ts range goes to the PLANNER as a filter,
    so zone-map pruning drops untouched-history files from the file
    list outright. Proved end-to-end by corrupting the old batch's
    parquet bytes — a refresh that still opened that file would crash,
    one that prunes it succeeds and stays correct."""
    import glob
    import os

    rows1 = [(i, f"2024-01-01 0{i % 3}:10:00", "a", 1.0) for i in range(30)]
    rows2 = [(100 + i, f"2024-02-05 12:{i % 50 + 10}:00", "b", 2.0)
             for i in range(20)]

    def mk(rows):
        return (spark.createDataFrame(
            rows, "event_id long, ts string, event_type string, value double")
            .withColumn("ts", F.col("ts").cast("timestamp")))

    src = warehouse.create_table("db.prune_src",
                                 Schema.from_spark(mk(rows1).schema))
    src.append(mk(rows1))
    roll = create_rollup(warehouse, src, "db.prune_roll", spark,
                         ts_col="ts", bucket="1 hour",
                         group_cols=["event_type"], value_col="value")
    jan_files = sorted(glob.glob(os.path.join(src.path, "data", "**",
                                              "*.parquet"), recursive=True))
    assert jan_files
    src.append(mk(rows2))

    # corrupt every January data file: still listed in the manifests,
    # unreadable if opened — the refresh must never open them
    for p in jan_files:
        with open(p, "wb") as f:
            f.write(b"not a parquet file")
    n = refresh_rollup(roll, src, spark)
    assert n > 0
    feb = {(r.bucket_start.isoformat(), r.event_type, r.n)
           for r in roll.to_df(spark).collect()
           if r.bucket_start.month == 2}
    assert feb == {("2024-02-05T12:00:00", "b", 20)}
    # January rollup rows from the backfill survive untouched
    jan = [r for r in roll.to_df(spark).collect()
           if r.bucket_start.month == 1]
    assert sum(r.n for r in jan) == 30
