"""Type promotion (update_column_type / ALTER COLUMN TYPE) and sort
order DDL (replace_sort_order / WRITE ORDERED BY).

Parity: Iceberg spec 'Schema Evolution' promotion table and Spark DDL
`ALTER TABLE ... WRITE ORDERED BY`; the reference records sort orders
without executing them (in_memory.rs:1059-1152) — our writers execute
them (write.py _sort_columns).
"""

import pytest
from pyspark.sql import functions as F

from icelake_spark import sql_execute
from icelake_spark.types import Schema


def _mk(spark, warehouse, name):
    src = spark.createDataFrame(
        [(1, 1.5, "a"), (2, 2.5, "b")], "id int, v float, g string")
    t = warehouse.create_table(name, Schema.from_spark(src.schema))
    t.append(src)
    return t.refresh()


def test_promote_int_to_long_reads_old_files(spark, warehouse):
    t = _mk(spark, warehouse, "db.pm1")
    t.update_column_type("id", "long")
    t.update_column_type("v", "double")
    t = t.refresh()
    big = spark.createDataFrame([(3_000_000_000_000, 3.5, "c")],
                                "id long, v double, g string")
    t.append(big)
    t = t.refresh()
    rows = t.to_df(spark).orderBy("id").collect()
    assert [r.id for r in rows] == [1, 2, 3_000_000_000_000]
    assert rows[0].v == 1.5  # float value survives widening exactly
    # same field id before and after — no new column was created
    assert t.metadata.last_column_id == 3
    # DSv2 arrow lane widens per batch too
    from icelake_spark.datasource import register

    register(spark)
    ds = (spark.read.format("icelake").option("path", t.path)
          .load().orderBy("id").collect())
    assert [r.id for r in ds] == [1, 2, 3_000_000_000_000]
    assert ds[0].v == 1.5


def test_promote_illegal_refused(spark, warehouse):
    t = _mk(spark, warehouse, "db.pm2")
    with pytest.raises(ValueError, match="promotion"):
        t.update_column_type("g", "long")
    with pytest.raises(ValueError, match="promotion"):
        t.update_column_type("id", "string")
    with pytest.raises(KeyError):
        t.update_column_type("nope", "long")
    # narrowing decimal refused
    t.add_column("d", "decimal(10, 2)")
    with pytest.raises(ValueError, match="promotion"):
        t.refresh().update_column_type("d", "decimal(8, 2)")
    with pytest.raises(ValueError, match="promotion"):
        t.refresh().update_column_type("d", "decimal(12, 4)")
    # no-op promotion commits nothing
    v = t.refresh().current_version
    t2 = t.refresh()
    t2.update_column_type("id", "int")
    assert t2.current_version == v


def test_promote_via_sql_and_time_travel(spark, warehouse):
    t = _mk(spark, warehouse, "db.pm3")
    sid = t.current_snapshot().snapshot_id
    sql_execute(spark, "ALTER TABLE db.pm3 ALTER COLUMN id TYPE bigint",
                catalog=warehouse)
    t = t.refresh()
    assert str(t.schema().field_by_name("id").field_type) == "long"
    # time travel to the pre-promotion snapshot reads the OLD schema
    old = t.to_df(spark, snapshot_id=sid)
    assert dict(old.dtypes)["id"] == "int"
    assert dict(t.to_df(spark).dtypes)["id"] == "bigint"


def test_sort_order_ddl_and_write_layout(spark, warehouse):
    t = _mk(spark, warehouse, "db.so1")
    sql_execute(spark,
                "ALTER TABLE db.so1 WRITE ORDERED BY g DESC NULLS LAST, id",
                catalog=warehouse)
    t = t.refresh()
    so = next(s for s in t.metadata.sort_orders
              if s.order_id == t.metadata.default_sort_order_id)
    assert [(f.direction, f.null_order) for f in so.fields] == \
        [("desc", "nulls-last"), ("asc", "nulls-first")]
    assert t.metadata.properties["write.distribution-mode"] == "range"
    # writes come out sorted within each file
    src = spark.createDataFrame(
        [(i, 1.0, chr(ord("a") + i % 5)) for i in range(100)],
        "id int, v float, g string")
    t.append(src)
    t = t.refresh()
    import pyarrow.parquet as pq

    newest = max((f for f in t.files_df(spark).collect()
                  if f.content == 0),
                 key=lambda f: f.file_path)
    pt = pq.read_table(newest.file_path.replace("file://", ""))
    gs = pt.column("g").to_pylist()
    ids = pt.column("id").to_pylist()
    assert gs == sorted(gs, reverse=True)
    # secondary key ascending within equal g
    for i in range(1, len(gs)):
        if gs[i] == gs[i - 1]:
            assert ids[i] > ids[i - 1]


def test_sort_order_variants(spark, warehouse):
    t = _mk(spark, warehouse, "db.so2")
    cat = warehouse
    sql_execute(spark, "ALTER TABLE db.so2 WRITE DISTRIBUTED BY "
                       "PARTITION LOCALLY ORDERED BY id", catalog=cat)
    t = t.refresh()
    assert t.metadata.properties["write.distribution-mode"] == "hash"
    assert t.metadata.default_sort_order_id != 0
    sql_execute(spark, "ALTER TABLE db.so2 WRITE UNORDERED", catalog=cat)
    t = t.refresh()
    assert t.metadata.default_sort_order_id == 0
    assert t.metadata.properties["write.distribution-mode"] == "none"
    # re-declaring an identical order reuses its id (no metadata growth)
    sql_execute(spark, "ALTER TABLE db.so2 WRITE LOCALLY ORDERED BY id",
                catalog=cat)
    t = t.refresh()
    n_orders = len(t.metadata.sort_orders)
    assert t.metadata.properties["write.distribution-mode"] == "none"
    sql_execute(spark, "ALTER TABLE db.so2 WRITE LOCALLY ORDERED BY id",
                catalog=cat)
    t = t.refresh()
    assert len(t.metadata.sort_orders) == n_orders
    # transform sort fields parse (year(ts)-style)
    t.add_column("ts", "timestamptz")
    sql_execute(spark, "ALTER TABLE db.so2 WRITE ORDERED BY day(ts) DESC",
                catalog=cat)
    t = t.refresh()
    so = next(s for s in t.metadata.sort_orders
              if s.order_id == t.metadata.default_sort_order_id)
    assert [(f.transform, f.direction) for f in so.fields] == \
        [("day", "desc")]
