"""Write-path configuration parity: sort orders executed at write, byte
/row rolling targets, compression property, catalog namespaces."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from icelake_spark.types import Schema, SortField, SortOrder


def _data_files(t):
    data, _, _ = t.new_scan().plan_files()
    return [x.data_file for x in data]


def test_sort_order_executed_and_recorded(spark, warehouse):
    src = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("g"),
        F.reverse(F.col("id").cast("string")).alias("s"))
    schema = Schema.from_spark(src.schema)
    so = SortOrder(1, (SortField(schema.field_by_name("s").field_id,
                                 "identity", "asc", "nulls-first"),))
    t = warehouse.create_table("db.sorted", schema, sort_order=so)
    t.append(src)
    files = _data_files(t)
    assert all(f.sort_order_id == 1 for f in files)
    # rows inside each file are sorted by s
    for f in files:
        vals = pq.read_table(f.file_path, columns=["s"])["s"].to_pylist()
        assert vals == sorted(vals)
    # read back still complete
    assert t.to_df(spark).count() == 1000


def test_rows_per_file_property(spark, warehouse):
    src = spark.range(5000).select("id")
    schema = Schema.from_spark(src.schema)
    t = warehouse.create_table("db.rolled", schema,
                               properties={"write.rows-per-file": "1000"})
    t.append(src.coalesce(1))
    files = _data_files(t)
    assert len(files) >= 5
    assert all(f.record_count <= 1000 for f in files)


def test_target_file_size_property(spark, warehouse):
    src = spark.range(200000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("payload"))
    schema = Schema.from_spark(src.schema)
    t = warehouse.create_table(
        "db.sized", schema,
        properties={"write.target-file-size-bytes": str(256 * 1024)})
    t.append(src.coalesce(1))
    files = _data_files(t)
    assert len(files) >= 2  # split by estimated byte target
    for f in files:
        assert f.file_size_in_bytes < 4 * 256 * 1024  # loose upper bound


def test_compression_property(spark, warehouse):
    src = spark.range(100).select(F.col("id"))
    schema = Schema.from_spark(src.schema)
    t = warehouse.create_table(
        "db.zstd", schema,
        properties={"write.parquet.compression-codec": "zstd"})
    t.append(src)
    f = _data_files(t)[0]
    md = pq.read_metadata(f.file_path)
    assert md.row_group(0).column(0).compression.lower() == "zstd"


def test_namespaces(warehouse, spark):
    warehouse.create_namespace("analytics.raw")
    src = spark.range(1).select("id")
    warehouse.create_table("analytics.raw.t1", Schema.from_spark(src.schema))
    warehouse.create_table("analytics.raw.t2", Schema.from_spark(src.schema))
    assert warehouse.list_tables() == ["analytics.raw.t1", "analytics.raw.t2"]
    assert warehouse.list_namespaces() == ["analytics.raw"]
    assert warehouse.table_exists("analytics.raw.t1")
    assert not warehouse.table_exists("analytics.raw.nope")
    warehouse.rename_table("analytics.raw.t2", "analytics.raw.t3")
    assert warehouse.table_exists("analytics.raw.t3")
    warehouse.drop_table("analytics.raw.t3")
    assert not warehouse.table_exists("analytics.raw.t3")


def test_metrics_tally_commits_and_deletes(spark, tmp_path):
    from icelake_spark.catalog import StorageCatalog
    from icelake_spark.metrics import REGISTRY
    from icelake_spark.types import Schema

    REGISTRY.reset()
    src = spark.range(100).selectExpr("id", "cast(id % 5 as string) k")
    cat = StorageCatalog(str(tmp_path))
    t = cat.create_table("db.m", Schema.from_spark(src.schema))
    t.append(src)
    t.append(src)
    t.delete_where(spark, "id < 10")  # MoR position deletes by default
    snap = REGISTRY.snapshot()
    name = "db.m"
    assert snap["iceberg_commit_total"][f"operation=append,table={name}"] == 2
    assert snap["iceberg_eq_delta_inserted_row_num"][f"table={name}"] == 200
    # id < 10 matches 10 rows in EACH of the two appended file sets
    assert snap["iceberg_pos_delete_qps"][f"table={name}"] == 20
    assert snap["iceberg_pos_delete_flush_qps"][f"table={name}"] >= 1


def test_orc_native_write_roundtrip_and_delete(spark, tmp_path):
    from icelake_spark.catalog import StorageCatalog
    from icelake_spark.table import IcebergTable
    from icelake_spark.types import Schema

    src = spark.range(50).selectExpr("id", "cast(id % 7 as string) k")
    cat = StorageCatalog(str(tmp_path))
    t = cat.create_table("db.orc", Schema.from_spark(src.schema),
                         properties={"write.format.default": "orc"})
    t.append(src)
    files = [f.data_file for f in t.new_scan().plan_files()[0]]
    assert files and all(f.file_format == "ORC" for f in files)
    assert all(f.file_path.endswith(".orc") for f in files)
    back = IcebergTable.load(str(tmp_path / "db" / "orc")).to_df(spark)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    # row-level delete on ORC must take the copy-on-write path
    t.delete_where(spark, "id < 10")
    assert t.to_df(spark).count() == 40
    _, pos, eq = t.new_scan().plan_files()
    assert not pos and not eq  # no delete files: files were rewritten


def test_unpartitioned_write_coalesces_small_files(spark, tmp_path):
    from icelake_spark.catalog import StorageCatalog
    from icelake_spark.types import Schema

    cat = StorageCatalog(str(tmp_path))
    # tiny data across 32 source partitions -> ONE file, not 32
    src = spark.range(100).selectExpr("id", "cast(id as string) v")
    t = cat.create_table("db.co", Schema.from_spark(src.schema))
    t.append(src)
    files = [f.data_file for f in t.new_scan().plan_files()[0]]
    assert len(files) == 1 and files[0].record_count == 100
    # a small byte target still splits big data (coalesce never merges
    # below what the target demands)
    big = spark.range(200000).selectExpr(
        "id", "md5(cast(id as string)) payload")
    t2 = cat.create_table(
        "db.co2", Schema.from_spark(big.schema),
        properties={"write.target-file-size-bytes": str(64 * 1024)})
    t2.append(big)
    files2 = t2.new_scan().plan_files()[0]
    assert len(files2) > 4


def test_distribution_mode_range_tiles_sorted_files(spark, warehouse):
    """write.distribution-mode=range on a sorted table produces globally
    clustered files: per-file [min,max] bounds on the sort column tile
    the domain (mostly disjoint), unlike hash + within-task sort where
    every file spans nearly the full range."""
    src = (spark.range(40000)
           .select(F.col("id"), (F.xxhash64("id") % 10000).alias("k"))
           .repartition(8))  # random row order going in
    schema = Schema.from_spark(src.schema)
    so = SortOrder(1, (SortField(schema.field_by_name("k").field_id,
                                 "identity", "asc", "nulls-first"),))

    def spans(t):
        fid = t.schema().field_by_name("k").field_id
        out = []
        for f in _data_files(t):
            lo = f.decoded_bounds(t.schema(), "lower")[fid]
            hi = f.decoded_bounds(t.schema(), "upper")[fid]
            out.append(hi - lo)
        return out

    # small byte target keeps multiple write tasks alive in hash mode
    # (one coalesced task would globally sort and tile by accident)
    th = warehouse.create_table(
        "db.dist_hash", schema, sort_order=so,
        properties={"write.target-file-size-bytes": "65536"})
    th.append(src)
    tr = warehouse.create_table(
        "db.dist_range", schema, sort_order=so,
        properties={"write.target-file-size-bytes": "65536",
                    "write.distribution-mode": "range"})
    tr.append(src)
    assert tr.to_df(spark).count() == 40000
    h_spans, r_spans = spans(th), spans(tr)
    assert len(r_spans) > 1
    # range files tile the domain: median span far below the hash layout
    med = lambda xs: sorted(xs)[len(xs) // 2]
    assert med(r_spans) < med(h_spans) / 2
    # and zone-map pruning actually skips files on the sorted column
    pruned, _, _ = tr.new_scan(filter="k >= 0").plan_files()
    assert len(pruned) < len(_data_files(tr))


def test_distribution_mode_none_trusts_caller(spark, warehouse):
    src = spark.range(1000).selectExpr("id").repartition(6)
    schema = Schema.from_spark(src.schema)
    t = warehouse.create_table("db.dist_none", schema,
                               properties={"write.distribution-mode": "none"})
    t.append(src)
    # one file per input partition (no coalesce, no shuffle)
    assert len(_data_files(t)) == 6
    assert t.to_df(spark).count() == 1000
