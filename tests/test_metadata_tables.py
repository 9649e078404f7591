"""Inspection (metadata) tables: entries / data_files / delete_files /
all_files / all_manifests / metadata_log_entries, via both the
IcebergTable API and the SQL suffix surface.

Parity surface: Iceberg's metadata tables (`SELECT * FROM t.entries`
etc.); the reference inspects the same structures driver-side
(table.rs:281-304, testdata/docker/spark-script/inspect-table.sql).
"""

import pytest
from icelake_spark import sql_execute
from icelake_spark.types import Schema


def _mk(spark, warehouse, name, n=400):
    src = spark.range(n).selectExpr("id", "id % 4 as g")
    t = warehouse.create_table(name, Schema.from_spark(src.schema))
    t.append(src.where("id < 200"))
    t = t.refresh()
    t.append(src.where("id >= 200"))
    return t.refresh()


def test_entries_match_plan(spark, warehouse):
    t = _mk(spark, warehouse, "db.me")
    t.delete_where(spark, "id < 10")
    t = t.refresh()
    data, pos, eq = t.new_scan().plan_files(spark)
    e = t.entries_df(spark)
    alive = e.where("status != 2")
    assert alive.where("content = 0").count() == len(data)
    assert alive.where("content = 1").count() == len(pos)
    assert alive.where("content = 2").count() == len(eq)
    # record_count of live data entries == total rows before deletes
    got = sum(r.record_count for r in
              alive.where("content = 0").collect())
    assert got == 400
    # sequence numbers materialized (no nulls)
    assert e.where("sequence_number IS NULL").count() == 0


def test_entries_time_travel(spark, warehouse):
    t = _mk(spark, warehouse, "db.met")
    first = t.metadata.snapshots[0].snapshot_id
    assert t.entries_df(spark, first).count() < t.entries_df(spark).count()


def test_data_and_delete_files_split(spark, warehouse):
    t = _mk(spark, warehouse, "db.mds")
    t.delete_where(spark, "id = 7")
    t = t.refresh()
    files = t.files_df(spark).count()
    d = t.data_files_df(spark)
    dl = t.delete_files_df(spark)
    assert d.count() + dl.count() == files
    assert d.where("content != 0").count() == 0
    assert dl.where("content = 0").count() == 0
    assert dl.count() >= 1


def test_all_files_keeps_history(spark, warehouse):
    """After a rewrite drops files from HEAD, all_files still shows
    them (older snapshots reference them); files_df does not."""
    from icelake_spark.maintenance import rewrite_data_files

    t = _mk(spark, warehouse, "db.maf")
    head_before = {r.file_path for r in
                   t.files_df(spark).select("file_path").collect()}
    rewrite_data_files(t, spark, target_file_size=512 * 1024 * 1024)
    t = t.refresh()
    head_after = {r.file_path for r in
                  t.files_df(spark).select("file_path").collect()}
    allf = {r.file_path for r in
            t.all_files_df(spark).select("file_path").collect()}
    assert head_before - head_after  # the rewrite replaced something
    assert head_before <= allf and head_after <= allf


def test_all_manifests_reference_snapshots(spark, warehouse):
    t = _mk(spark, warehouse, "db.mam")
    am = t.all_manifests_df(spark)
    sids = {r.reference_snapshot_id for r in
            am.select("reference_snapshot_id").distinct().collect()}
    assert sids == {s.snapshot_id for s in t.metadata.snapshots}
    # the current snapshot's slice is exactly manifests_df
    cur = t.current_snapshot().snapshot_id
    assert (am.where(f"reference_snapshot_id = {cur}").count()
            == t.manifests_df(spark).count())


def test_metadata_log_lineage(spark, warehouse):
    t = _mk(spark, warehouse, "db.mml")
    t.delete_where(spark, "id = 1")
    t = t.refresh()
    rows = t.metadata_log_df(spark).orderBy("timestamp_ms").collect()
    # create(v1) + 2 appends + delete = 4 files in lineage
    assert len(rows) == t.current_version == 4
    assert [r.file.rsplit("/", 1)[-1] for r in rows] == \
        [f"v{i}.metadata.json" for i in range(1, 5)]
    # timestamps non-decreasing; latest_snapshot_id tracks history
    ts = [r.timestamp_ms for r in rows]
    assert ts == sorted(ts)
    assert rows[0].latest_snapshot_id is None
    assert rows[-1].latest_snapshot_id == t.current_snapshot().snapshot_id
    # every logged previous file is a real, loadable metadata file
    import json

    from icelake_spark.fileio import resolve_io
    for r in rows[:-1]:
        assert json.loads(resolve_io(r.file).read_bytes(r.file))


def test_metadata_log_capped_by_property(spark, warehouse):
    src = spark.range(10).selectExpr("id")
    t = warehouse.create_table("db.mcap", Schema.from_spark(src.schema))
    t.set_properties({"write.metadata.previous-versions-max": "3"})
    t = t.refresh()
    for _ in range(6):
        t.append(src)
        t = t.refresh()
    assert len(t.metadata.metadata_log) == 3
    # the kept entries are the MOST RECENT ones
    names = [m["metadata-file"].rsplit("/", 1)[-1]
             for m in t.metadata.metadata_log]
    assert names == [f"v{i}.metadata.json"
                     for i in range(t.current_version - 3,
                                    t.current_version)]
    # ADVICE r7: max=0 must retain NOTHING ([-0:] kept the whole log)
    t.set_properties({"write.metadata.previous-versions-max": "0"})
    t = t.refresh()
    t.append(src)
    t = t.refresh()
    assert t.metadata.metadata_log == ()


def test_sql_suffix_surface(spark, warehouse):
    t = _mk(spark, warehouse, "db.msql")
    t.delete_where(spark, "id < 5")
    cat = warehouse

    def q(sql):
        return sql_execute(spark, sql, catalog=cat)

    assert q("SELECT count(*) AS n FROM db.msql.entries").collect()[0].n \
        == q("SELECT count(*) AS n FROM db.msql.files").collect()[0].n
    assert q("SELECT count(*) AS n FROM db.msql.delete_files"
             ).collect()[0].n >= 1
    assert q("SELECT count(*) AS n FROM db.msql.data_files").collect()[0].n \
        + q("SELECT count(*) AS n FROM db.msql.delete_files").collect()[0].n \
        == q("SELECT count(*) AS n FROM db.msql.files").collect()[0].n
    assert q("SELECT count(*) AS n FROM db.msql.metadata_log_entries"
             ).collect()[0].n == 4
    # joinable like any other table (qualified by auto-alias)
    joined = q("SELECT count(*) AS n FROM db.msql.all_manifests am "
               "JOIN db.msql.snapshots s "
               "ON am.reference_snapshot_id = s.snapshot_id")
    assert joined.collect()[0].n >= 3


def test_sql_table_level_rejects_time_travel(spark, warehouse):
    t = _mk(spark, warehouse, "db.mtt")
    sid = t.current_snapshot().snapshot_id
    for suffix in ("all_files", "all_manifests", "metadata_log_entries"):
        with pytest.raises(ValueError, match="time travel"):
            sql_execute(
                spark,
                f"SELECT * FROM db.mtt.{suffix} VERSION AS OF {sid}",
                catalog=warehouse)
    # snapshot-scoped ones accept it
    n = sql_execute(
        spark, f"SELECT count(*) AS n FROM db.mtt.entries "
               f"VERSION AS OF {sid}", catalog=warehouse).collect()[0].n
    assert n >= 1


def test_position_deletes_rows(spark, warehouse):
    t = _mk(spark, warehouse, "db.mpd")
    t.delete_where(spark, "id % 10 = 0")
    t.refresh().delete_where(spark, "id % 10 = 1")
    t = t.refresh()
    pd_ = t.position_deletes_df(spark)
    assert pd_.count() == 80  # 2 deletes x 40 rows each
    assert pd_.select("delete_file_path").distinct().count() \
        == t.delete_files_df(spark).where("content = 1").count()
    # positions resolve against real data files of the snapshot
    data_paths = {r.file_path for r in
                  t.data_files_df(spark).select("file_path").collect()}
    from icelake_spark.planning import canon_data_path
    got = {canon_data_path(r.file_path) for r in
           pd_.select("file_path").distinct().collect()}
    assert got <= {canon_data_path(p) for p in data_paths}
    # row count agrees with delete_files record_count sum
    rc = sum(r.record_count for r in
             t.delete_files_df(spark).where("content = 1").collect())
    assert rc == 80
    # time travel: first delete snapshot has half the pairs
    sid = t.metadata.snapshots[-2].snapshot_id
    assert t.position_deletes_df(spark, sid).count() == 40
    # empty before any delete
    sid0 = t.metadata.snapshots[0].snapshot_id
    assert t.position_deletes_df(spark, sid0).count() == 0
    # SQL suffix (snapshot-level: accepts time travel)
    n = sql_execute(
        spark, f"SELECT count(*) AS n FROM db.mpd.position_deletes "
               f"VERSION AS OF {sid}", catalog=warehouse).collect()[0].n
    assert n == 40


def test_call_ancestors_of(spark, warehouse):
    t = _mk(spark, warehouse, "db.anc")
    t.delete_where(spark, "id = 3")
    t = t.refresh()
    rows = sql_execute(spark, "CALL system.ancestors_of('db.anc')",
                       catalog=warehouse).collect()
    assert [r.snapshot_id for r in rows] == \
        [s.snapshot_id for s in reversed(t.metadata.snapshots)]
    # from an explicit (older) snapshot: shorter chain
    mid = t.metadata.snapshots[1].snapshot_id
    rows2 = sql_execute(
        spark, f"CALL system.ancestors_of('db.anc', {mid})",
        catalog=warehouse).collect()
    assert len(rows2) == 2 and rows2[0].snapshot_id == mid


def test_call_add_files(spark, warehouse, tmp_path):
    src = spark.range(30).selectExpr("id")
    t = warehouse.create_table("db.adf", Schema.from_spark(src.schema))
    ext = str(tmp_path / "ext")
    src.coalesce(2).write.parquet(ext)
    sql_execute(spark, f"CALL system.add_files('db.adf', "
                       f"source => '{ext}')", catalog=warehouse)
    t = t.refresh()
    assert t.to_df(spark).count() == 30
    # stats came from footers: record_count sums to 30, no -1 sentinel
    fdf = t.files_df(spark)
    assert fdf.where("record_count < 0").count() == 0
    # glob + backtick-qualified source forms
    sql_execute(spark, f"CALL system.add_files(table => 'db.adf', "
                       f"source_table => '`parquet`.`{ext}/*.parquet`')",
                catalog=warehouse)
    assert t.refresh().to_df(spark).count() == 60
    with pytest.raises(FileNotFoundError):
        sql_execute(spark, f"CALL system.add_files('db.adf', "
                           f"source => '{ext}/nope')", catalog=warehouse)
