"""add_files external registration + format-aware scans (S12)."""

import os

import pytest
from pyspark.sql import functions as F

from icelake_spark.types import Schema


def _write_files(df, path, fmt):
    getattr(df.coalesce(1).write.mode("overwrite"), fmt)(path)
    return [os.path.join(path, f) for f in os.listdir(path)
            if f.startswith("part-") and not f.endswith(".crc")]


def test_add_parquet_files(spark, warehouse, tmp_path):
    src = spark.range(100).selectExpr("id", "id * 2 as v")
    t = warehouse.create_table("db.addp", Schema.from_spark(src.schema))
    files = _write_files(src, str(tmp_path / "ext"), "parquet")
    t.add_files(files)
    df = t.to_df(spark)
    assert df.count() == 100
    # footer stats captured → zone-map pruning possible
    d = t.new_scan().plan_files()[0][0].data_file
    assert d.lower_bounds and d.record_count == 100


def test_mixed_parquet_orc_table(spark, warehouse, tmp_path):
    src = spark.range(100).selectExpr("id", "id * 2 as v")
    t = warehouse.create_table("db.mix", Schema.from_spark(src.schema))
    t.append(src.where("id < 50"))
    orc_files = _write_files(src.where("id >= 50"), str(tmp_path / "orc"), "orc")
    t.add_files(orc_files, file_format="ORC")
    df = t.to_df(spark)
    assert df.count() == 100
    assert df.selectExpr("sum(id)").collect()[0][0] == 4950
    # MoR still works over the mixed table
    t.delete_where(spark, "id % 10 = 0")
    assert t.to_df(spark).count() == 90


def test_add_files_bad_format(spark, warehouse):
    src = spark.range(1).select("id")
    t = warehouse.create_table("db.bad", Schema.from_spark(src.schema))
    t.append(src)
    # unknown format is rejected at scan time
    from icelake_spark.types.manifest import DataFile
    from icelake_spark.transaction import Transaction

    tx = Transaction(t)
    tx.add_data_files([DataFile(file_path="/tmp/x.csv", file_format="CSV",
                                record_count=1, file_size_in_bytes=1)])
    tx.commit("append")
    with pytest.raises(ValueError, match="unsupported data file format"):
        t.to_df(spark).count()


def test_avro_write_read_roundtrip(spark, warehouse):
    """write.format.default=avro: data files written with the pure-
    Python avro_io codec and read back without spark-avro, including
    dates/timestamps/decimals and MoR (CoW fallback for avro files)."""
    src = spark.range(100).selectExpr(
        "id", "cast(id as double) as v",
        "cast(id as string) as s",
        "date_add(date'2024-01-01', cast(id as int)) as d",
        "cast(cast(id as string) || '.25' as decimal(10,2)) as m")
    t = warehouse.create_table(
        "db.avrw", Schema.from_spark(src.schema),
        properties={"write.format.default": "avro"})
    t.append(src)
    t = t.refresh()
    d = t.new_scan().plan_files()[0][0].data_file
    assert d.file_format == "AVRO" and d.file_path.endswith(".avro")
    assert d.record_count > 0
    got = t.to_df(spark)
    assert got.count() == 100
    row = {r.id: r for r in got.collect()}[7]
    import datetime as dt
    from decimal import Decimal
    assert (row.v, row.s, row.d, row.m) == (
        7.0, "7", dt.date(2024, 1, 8), Decimal("7.25"))
    # deletes against avro files go copy-on-write in the same commit
    t.delete_where(spark, "id < 10")
    t = t.refresh()
    assert t.to_df(spark).count() == 90
    assert sorted(r.id for r in t.to_df(spark).collect())[0] == 10


def test_avro_partitioned_write(spark, warehouse):
    src = spark.range(60).selectExpr("id", "id % 3 as g")
    t = warehouse.create_table(
        "db.avrp", Schema.from_spark(src.schema),
        properties={"write.format.default": "avro"})
    t.update_spec("g")
    t = t.refresh()
    t.append(src)
    t = t.refresh()
    data, _, _ = t.new_scan().plan_files()
    assert all(d.data_file.file_format == "AVRO" for d in data)
    assert {tuple(d.data_file.partition.items()) for d in data} == {
        (("g", 0),), (("g", 1),), (("g", 2),)}
    assert t.to_df(spark).groupBy("g").count().count() == 3
    # partition pruning on the avro table
    pruned, _, _ = t.new_scan(partition_filter={"g": 1}).plan_files()
    assert len(pruned) < len(data)


def test_avro_list_column_and_hive_escaping(spark, warehouse):
    """Avro writes must survive array-typed columns (NaN guard is
    scalar-only) and partition values containing '/', '=', '%'."""
    src = spark.createDataFrame(
        [(1, [1.0, 2.0], "a/b"), (2, [3.0], "c=d%2F")],
        "id long, vec array<double>, g string")
    t = warehouse.create_table(
        "db.avlist", Schema.from_spark(src.schema),
        properties={"write.format.default": "avro"})
    t.update_spec("g")
    t = t.refresh()
    t.append(src)
    t = t.refresh()
    rows = {r.id: r for r in t.to_df(spark).collect()}
    assert rows[1].vec == [1.0, 2.0] and rows[1].g == "a/b"
    assert rows[2].vec == [3.0] and rows[2].g == "c=d%2F"
    data, _, _ = t.new_scan().plan_files()
    assert sorted(d.data_file.partition["g"] for d in data) == ["a/b", "c=d%2F"]
    pruned, _, _ = t.new_scan(partition_filter={"g": "a/b"}).plan_files()
    assert len(pruned) == 1


def test_avro_timestamp_roundtrip(spark, warehouse):
    """Naive (timestamp_ntz-style) and session-tz timestamps written to
    avro must read back as the same instants."""
    import datetime as dt

    src = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 1, 12, 30, 0, 250000))],
        "id long, ts timestamp")
    t = warehouse.create_table(
        "db.avts", Schema.from_spark(src.schema),
        properties={"write.format.default": "avro"})
    t.append(src)
    got = t.refresh().to_df(spark).collect()[0]
    assert got.ts == dt.datetime(2024, 3, 1, 12, 30, 0, 250000)


def test_avro_null_array_elements_roundtrip(spark, warehouse):
    """Spark arrays allow NULL elements by default (containsNull=True →
    element_required=False); the Avro schema must encode items as a
    ["null", type] union or the write crashes on a legal row
    (code-review r9). ORC-format incremental reads also go through the
    format-aware stream_from_table path."""
    src = spark.createDataFrame(
        [(1, [1, None, 3]), (2, None), (3, [])],
        "id long, xs array<long>")
    t = warehouse.create_table(
        "db.avnull", Schema.from_spark(src.schema),
        properties={"write.format.default": "avro"})
    t.append(src)
    t = t.refresh()
    got = {r.id: r.xs for r in t.to_df(spark).collect()}
    assert got == {1: [1, None, 3], 2: None, 3: []}, got


def test_incremental_read_is_format_aware_and_gates_overwrites(
        spark, warehouse):
    """stream_from_table/table.incremental: ORC tables stream through
    the format-aware reader (the parquet-only read crashed); an
    OVERWRITE snapshot in the window raises unless skip_overwrites=True
    (its new rows are invisible to an append-only scan — silently
    skipping lost them); 'delete'/'replace' still skip losslessly
    (code-review r9)."""
    src = spark.range(10).selectExpr("id", "cast(id as string) as v")
    t = warehouse.create_table(
        "db.orcinc", Schema.from_spark(src.schema),
        properties={"write.format.default": "orc"})
    t.append(src)
    t = t.refresh()
    s1 = t.current_snapshot().snapshot_id
    t.append(spark.range(10, 15).selectExpr("id", "cast(id as string) as v"))
    t = t.refresh()
    got = sorted(r.id for r in
                 t.incremental(spark, from_snapshot_id=s1).collect())
    assert got == [10, 11, 12, 13, 14], got

    # an upsert (overwrite) inside the window fails loudly...
    t.upsert(spark.createDataFrame([(3, "NEW")], "id long, v string"),
             key_cols=["id"])
    t = t.refresh()
    t.append(spark.range(20, 22).selectExpr("id", "cast(id as string) as v"))
    t = t.refresh()
    with pytest.raises(ValueError, match="overwrite"):
        t.incremental(spark, from_snapshot_id=s1).collect()
    # ...and skip_overwrites=True opts into the documented gap
    got2 = sorted(r.id for r in
                  t.incremental(spark, from_snapshot_id=s1,
                                skip_overwrites=True).collect())
    assert got2 == [10, 11, 12, 13, 14, 20, 21], got2
