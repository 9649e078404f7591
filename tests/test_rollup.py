"""Continuous aggregate (hypertable-style rollup): backfill +
incremental refresh from snapshot diffs equals the full aggregation."""

from pyspark.sql import functions as F

from icelake_spark.rollup import create_rollup, refresh_rollup
from icelake_spark.types import Schema


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
