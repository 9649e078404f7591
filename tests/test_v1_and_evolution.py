"""Format-version 1 write/read parity, drop_column, table.stats()."""

import pytest
from pyspark.sql import functions as F

from icelake_spark import IcebergTable
from icelake_spark.types import PartitionField, PartitionSpec, Schema


def test_v1_format_roundtrip(spark, warehouse, wide_df):
    schema = Schema.from_spark(wide_df.schema)
    spec = PartitionSpec(0, (PartitionField(
        schema.field_by_name("v_date").field_id, 1000, "month", "m"),))
    t = warehouse.create_table("db.v1t", schema, spec=spec, format_version=1)
    assert t.metadata.format_version == 1
    t.append(wide_df)
    t.append(wide_df)
    back = t.to_df(spark)
    assert back.count() == 10
    assert back.exceptAll(wide_df.unionByName(wide_df)).count() == 0
    # v1 metadata JSON carries the legacy singular fields
    import json

    with open(f"{t.path}/metadata/v3.metadata.json") as f:
        j = json.load(f)
    assert j["format-version"] == 1
    assert "schema" in j and "partition-spec" in j
    # reload from disk
    t2 = IcebergTable.load(t.path)
    assert t2.metadata.format_version == 1
    assert t2.to_df(spark).count() == 10


def test_v1_mor_delete(spark, warehouse):
    src = spark.range(100).selectExpr("id", "id % 4 as g")
    t = warehouse.create_table("db.v1d", Schema.from_spark(src.schema),
                               format_version=1)
    t.append(src)
    t.delete_where(spark, "g = 1")
    assert t.to_df(spark).count() == 75


def test_v2_copy_on_write_mode(spark, warehouse):
    """write.delete.mode=copy-on-write on a v2 table rewrites files
    instead of emitting position deletes (the property the reference's
    Spark tests drive, delta_test_v2.rs:116)."""
    src = spark.range(100).selectExpr("id", "id % 4 as g")
    t = warehouse.create_table(
        "db.cow2", Schema.from_spark(src.schema),
        properties={"write.delete.mode": "copy-on-write"})
    t.append(src)
    t.delete_where(spark, "g = 2")
    assert t.to_df(spark).count() == 75
    s = t.stats()
    assert s["position_delete_files"] == 0 and s["equality_delete_files"] == 0
    assert t.current_snapshot().summary["operation"] == "overwrite"


def test_drop_column(spark, warehouse):
    src = spark.range(10).selectExpr("id", "id * 2 as v", "'x' as s")
    t = warehouse.create_table("db.dropc", Schema.from_spark(src.schema))
    t.append(src)
    t.drop_column("v")
    df = t.to_df(spark)
    assert df.columns == ["id", "s"]
    assert df.count() == 10
    # appends after drop use the new schema
    t.append(spark.createDataFrame([(100, "y")], "id long, s string"))
    assert t.to_df(spark).count() == 11
    with pytest.raises(KeyError):
        t.drop_column("nope")


def test_stats(spark, warehouse, wide_df):
    t = warehouse.create_table("db.stats", Schema.from_spark(wide_df.schema))
    t.append(wide_df)
    t.delete_where(spark, "id = 1")
    s = t.stats()
    assert s["snapshots"] == 2
    assert s["data_files"] >= 1
    assert s["position_delete_files"] == 1
    assert s["total_records"] == 5  # record_count is physical (pre-MoR)
    assert s["format_version"] == 2


def test_rename_column_reads_old_and_new_files(spark, warehouse):
    from icelake_spark.types import Schema

    src = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    t = warehouse.create_table("db.ren", Schema.from_spark(src.schema))
    t.append(src)                       # file with column name 'v'
    t.rename_column("v", "val")
    t.append(spark.createDataFrame([(3, "c")], "id long, val string"))
    got = sorted(map(tuple, t.to_df(spark).collect()))
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    assert t.to_df(spark).columns == ["id", "val"]
    # filters on the new name see pre-rename data
    assert t.to_df(spark).where("val = 'a'").count() == 1
    # rename again: both former names stay resolvable
    t.rename_column("val", "value")
    t.append(spark.createDataFrame([(4, "d")], "id long, value string"))
    got = sorted(map(tuple, t.to_df(spark).collect()))
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    # reload from disk: mapping survives in table properties
    from icelake_spark.table import IcebergTable
    t2 = IcebergTable.load(t.path)
    assert sorted(map(tuple, t2.to_df(spark).collect())) == got
    with pytest.raises(KeyError):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError):
        t.rename_column("id", "value")
