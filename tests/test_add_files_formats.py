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
