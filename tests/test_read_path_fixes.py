"""Regression tests for the round-3 read-path review findings:
partition-aware streaming sink, v1 incremental changelog, null-safe
equality-delete change events, empty-parent eq changelog, and the
batch changelog=true guard."""

import pytest
from pyspark.sql import functions as F

from icelake_spark.types import Schema


def _schema(spark, ddl):
    return Schema.from_spark(spark.createDataFrame([], ddl).schema)


def test_stream_sink_writes_partition_tuples(spark, warehouse):
    """The DSv2 streaming sink must write hive-partitioned files with
    real partition tuples — a partitionless file is silently pruned out
    of every partition-filtered scan."""
    from icelake_spark.datasource import IcelakeStreamWriter
    from icelake_spark.types import PartitionField, PartitionSpec

    schema = _schema(spark, "id long, region string")
    spec = PartitionSpec(0, (PartitionField(
        schema.field_by_name("region").field_id, 1000, "identity", "region"),))
    t = warehouse.create_table("db.stream_part", schema, spec=spec)

    w = IcelakeStreamWriter({"path": t.path}, schema.to_spark())
    rows = [(1, "eu"), (2, "us"), (3, "eu"), (4, "ap")]
    msg = w.write(iter(rows))
    assert len(msg.files) == 3  # one file per region
    w.commit([msg], batchId=0)
    t.refresh()

    data, _, _ = t.new_scan().plan_files()
    parts = sorted(d.data_file.partition.get("region") for d in data)
    assert parts == ["ap", "eu", "us"]
    # partition-filtered read sees the streamed rows
    got = sorted(r.id for r in
                 t.new_scan(partition_filter={"region": "eu"})
                 .to_df(spark).collect())
    assert got == [1, 3]


def test_changes_incremental_on_v1(spark, warehouse):
    """Every v1 snapshot has sequence_number 0 — the changelog window
    must key on ancestry, not sequence, or incremental reads return
    empty forever."""
    t = warehouse.create_table("db.v1chg", _schema(spark, "id long, v long"),
                               format_version=1)
    t.append(spark.createDataFrame([(1, 10)], "id long, v long"))
    first = t.current_snapshot().snapshot_id
    t.append(spark.createDataFrame([(2, 20)], "id long, v long"))

    ch = t.changes(spark, from_snapshot_id=first)
    rows = [(r.id, r._change_type) for r in ch.collect()]
    assert rows == [(2, "insert")]


def test_changes_emits_delete_for_null_key(spark, warehouse):
    """An equality delete of a NULL-keyed row must emit its delete
    event (null-safe key join, matching the read path's eqNullSafe)."""
    from icelake_spark.delta import merge_delta, OP_DELETE

    t = warehouse.create_table("db.nullkey", _schema(spark, "k string, v long"))
    t.append(spark.createDataFrame([("a", 1), (None, 2)], "k string, v long"))
    base = t.current_snapshot().snapshot_id
    merge_delta(t, spark.createDataFrame([(None, 0, OP_DELETE)],
                                         "k string, v long, _op int"),
                key_cols=["k"])
    t.refresh()
    # read path removes the row…
    assert [(r.k, r.v) for r in t.to_df(spark).collect()] == [("a", 1)]
    # …and the changelog reports its deletion
    ch = t.changes(spark, from_snapshot_id=base)
    dels = [(r.k, r.v) for r in ch.where("_change_type = 'delete'").collect()]
    assert dels == [(None, 2)]


def test_changes_eq_delete_against_empty_parent(spark, warehouse):
    """Upsert after a full CoW delete: the parent snapshot has zero
    data files, and the eq-delete changelog branch must not crash."""
    from icelake_spark.delta import delete_rows, upsert

    t = warehouse.create_table("db.emptyparent",
                               _schema(spark, "id long, v long"))
    t.append(spark.createDataFrame([(1, 10)], "id long, v long"))
    t.metadata.properties["write.delete.mode"] = "copy-on-write"
    delete_rows(t, spark, "id >= 0")  # CoW: snapshot with 0 data files
    t.refresh()
    upsert(t, spark.createDataFrame([(2, 20)], "id long, v long"),
           key_cols=["id"])
    t.refresh()
    ch = t.changes(spark)  # used to raise IndexError
    assert ch.where("_change_type = 'insert'").count() >= 2


def test_batch_read_rejects_changelog_option(spark, warehouse):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import AnalysisException

    from icelake_spark import datasource

    t = warehouse.create_table("db.chopt", _schema(spark, "id long"))
    t.append(spark.createDataFrame([(1,)], "id long"))
    datasource.register(spark)
    with pytest.raises(Exception, match="changelog"):
        (spark.read.format("icelake").option("path", t.path)
         .option("changelog", "true").load().collect())


def test_eq_delete_keys_survive_rename(spark, warehouse):
    """Equality-delete files written before ALTER TABLE RENAME COLUMN
    keep deleting: their key columns resolve through the same
    field-id/rename stack as data columns. Before the fix the missing
    current name padded all-None, resurrecting every deleted row and
    spuriously deleting NULL-key rows (code-review r8)."""
    from icelake_spark import datasource
    from icelake_spark.delta import upsert
    from icelake_spark.types import Schema

    datasource.register(spark)
    src = spark.createDataFrame(
        [(1, 10), (2, 20), (None, 30)], "id long, v long")
    t = warehouse.create_table("db.eqren", Schema.from_spark(src.schema))
    t.append(src)
    # upsert on id -> eq-delete file keyed by column 'id'
    upsert(t, spark.createDataFrame([(2, 99)], "id long, v long"),
           key_cols=["id"])
    t = t.refresh()
    t.rename_column("id", "user_id")
    t = t.refresh()

    expect = {(1, 10), (2, 99), (None, 30)}
    got = {(r.user_id, r.v) for r in t.to_df(spark).collect()}
    assert got == expect, got
    # DSv2 lane applies the same resolution
    df = spark.read.format("icelake").option("path", t.path).load()
    assert {(r.user_id, r.v) for r in df.collect()} == expect


def test_stream_casts_promoted_types(spark, warehouse, tmp_path):
    """Files written before ALTER COLUMN TYPE stream with the promoted
    type: the stream readers apply the same projection stack as the
    batch reader (the runner asserts batches match the declared
    schema; an int32 batch under a bigint schema crashes the stream —
    code-review r8)."""
    from icelake_spark import datasource
    from icelake_spark.types import Schema

    datasource.register(spark)
    src = spark.createDataFrame([(1, 5), (2, 6)], "id long, c int")
    t = warehouse.create_table("db.promstream", Schema.from_spark(src.schema))
    t.append(src)
    t = t.refresh()
    t.update_column_type("c", "long")
    t = t.refresh()
    t.append(spark.createDataFrame([(3, 7)], "id long, c long"))
    t = t.refresh()

    q = (spark.readStream.format("icelake").option("path", t.path).load()
         .writeStream.format("memory").queryName("promstream")
         .option("checkpointLocation", str(tmp_path / "ckpt_prom"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r.id, r.c) for r in spark.sql(
        "select * from promstream").collect()}
    assert rows == {(1, 5), (2, 6), (3, 7)}
