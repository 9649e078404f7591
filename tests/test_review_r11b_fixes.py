"""Regression tests for the round-11 second and third module sweeps
(sql.py / delta.py / datasource.py / changelog.py / write.py, then
fileio.py / maintenance.py / rollup.py / streaming.py / storage.py):
glob directory boundaries in add_files, MERGE into a not-yet-created
branch, columns named `end`/`case` in MERGE clauses, the same-commit
pos+eq duplicate CDC delete, zero-row ANALYZE, expired incremental
start snapshots, rename-destination collisions, and write_stream
caller properties."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from icelake_spark.types import Schema


def _schema(spark, ddl):
    return Schema.from_spark(spark.createDataFrame([], ddl).schema)


def test_add_files_glob_stays_in_its_directory(spark, warehouse, tmp_path):
    """CALL add_files with /dir/*.parquet must register only /dir's own
    files: the listing is recursive and fnmatch's '*' crosses '/', so
    an aborted write's _temporary/ subtree (or a nested dataset) was
    silently registered as table data (review r11)."""
    from icelake_spark.sql import execute

    src = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    top = tmp_path / "ext"
    src.coalesce(1).write.parquet(str(top / "good"))
    # simulate an aborted write's leftovers nested under the glob dir
    spark.createDataFrame([(99, "junk")], "id long, v string") \
        .coalesce(1).write.parquet(str(top / "good" / "_temporary" / "0"))
    t = warehouse.create_table("db.globbed",
                               _schema(spark, "id long, v string"))
    execute(spark, f"CALL system.add_files(table => 'db.globbed', "
                   f"source => '{top}/good/*.parquet')",
            catalog=warehouse)
    t = t.refresh()
    got = sorted((r.id, r.v) for r in t.to_df(spark).collect())
    assert got == [(1, "a"), (2, "b")], got


def test_merge_into_missing_branch_forks_from_current(spark, warehouse):
    """MERGE into a branch that does not exist yet forks from current
    (the documented merge_delta/Transaction contract that upsert and
    append already follow) instead of dying with a raw KeyError
    (review r11) — the WAP staging pattern."""
    from icelake_spark.delta import merge

    t = warehouse.create_table("db.wapmerge",
                               _schema(spark, "id long, v long"))
    t.append(spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"))
    t = t.refresh()
    merge(t, spark, spark.createDataFrame([(2, 99), (3, 30)],
                                          "id long, v long"),
          on=["id"], branch="audit")
    t = t.refresh()
    # main unchanged; the branch holds the merged state
    assert sorted((r.id, r.v) for r in t.to_df(spark).collect()) \
        == [(1, 10), (2, 20)]
    got = sorted((r.id, r.v) for r in
                 t.to_df(spark, ref="audit").collect())
    assert got == [(1, 10), (2, 99), (3, 30)], got
    # column-level lowering takes the same fork path
    merge(t, spark, spark.createDataFrame([(1, 77)], "id long, v long"),
          on=["id"],
          matched_clauses=[("update", None, {"v": "s.v"})],
          when_not_matched=None, branch="audit2")
    t = t.refresh()
    got2 = sorted((r.id, r.v) for r in
                  t.to_df(spark, ref="audit2").collect())
    assert got2 == [(1, 77), (2, 20)], got2


def test_merge_parses_columns_named_end_and_case(spark, warehouse):
    """A column literally named `end` (interval/date-range tables) or
    `case` must not be mistaken for the CASE/END keywords: one
    qualified `s.end` drove the clause scanner's depth negative and
    every later top-level WHEN/THEN went unseen (review r11)."""
    from icelake_spark.sql import execute

    t = warehouse.create_table(
        "db.endcol", _schema(spark, "id long, end long, v long"))
    t.append(spark.createDataFrame([(1, 5, 10), (2, 0, 20)],
                                   "id long, end long, v long"))
    t = t.refresh()
    sdf = spark.createDataFrame([(1, 9, 11), (3, 7, 30)],
                                "id long, end long, v long")
    sdf.createOrReplaceTempView("src_endcol")
    execute(spark,
            "MERGE INTO db.endcol t USING src_endcol s ON t.id = s.id "
            "WHEN MATCHED AND s.end > 0 THEN UPDATE SET end = s.end, "
            "v = s.v "
            "WHEN NOT MATCHED THEN INSERT *",
            catalog=warehouse)
    t = t.refresh()
    got = sorted(tuple(r) for r in t.to_df(spark).collect())
    assert got == [(1, 9, 11), (2, 0, 20), (3, 7, 30)], got


def test_changelog_same_commit_pos_and_eq_delete_one_event(
        spark, warehouse):
    """One commit carrying a POSITION delete and an EQUALITY delete
    that cover the same physical row (legal for external writers)
    must emit exactly ONE delete event per row in the changelog —
    both the batch decoder and the streaming decoder previously
    emitted two (review r11)."""
    from icelake_spark import datasource as ds
    from icelake_spark.delta import (write_equality_delete_files,
                                     write_position_delete_files)
    from icelake_spark.planning import canon_data_path
    from icelake_spark.transaction import Transaction

    t = warehouse.create_table("db.dupdel",
                               _schema(spark, "id long, v long"))
    t.append(spark.createDataFrame([(1, 10), (2, 20), (3, 30)],
                                   "id long, v long").coalesce(1))
    t = t.refresh()
    base = t.current_snapshot().snapshot_id
    # the physical position of id=2 in its (single) data file
    data, _, _ = t.new_scan().plan_files(spark)
    assert len(data) == 1
    fpath = data[0].data_file.file_path
    from icelake_spark.fileio import resolve_io
    io = resolve_io(t.path)
    import pyarrow.parquet as pq
    tbl = pq.read_table(io.open_input(fpath))
    ids = tbl["id"].to_pylist()
    pos2 = ids.index(2)
    pos_files = write_position_delete_files(
        t, spark.createDataFrame([(canon_data_path(fpath), pos2)],
                                 "file_path string, pos long"))
    eq_files = write_equality_delete_files(
        t, spark.createDataFrame([(2,)], "id long"), ["id"])
    tx = Transaction(t)
    tx.add_delete_files(pos_files + eq_files)
    tx.commit("delete")
    t = t.refresh()
    # read path: the row is gone (once)
    assert sorted(r.id for r in t.to_df(spark).collect()) == [1, 3]
    # batch changelog: exactly ONE delete event for id=2
    ch = t.changes(spark, from_snapshot_id=base)
    dels = [r.id for r in ch.where("_change_type = 'delete'").collect()]
    assert dels == [2], dels
    # streaming changelog lane agrees (the per-snapshot decoder)
    ds.register(spark)
    seen: list = []

    def sink(bdf, _bid):
        seen.extend((r.id, r._change_type) for r in bdf.collect())

    import tempfile
    q = (spark.readStream.format("icelake").option("path", t.path)
         .option("changelog", "true").load()
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", tempfile.mkdtemp())
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180), "stream did not drain"
    sdels = sorted(i for i, c in seen if c == "delete")
    assert sdels == [2], seen


def test_analyze_empty_table_reports_zero_stats(spark, warehouse):
    """ANALYZE over a zero-row table reports zero stats instead of
    crashing on int(None) (Spark SUM over no rows is NULL; review
    r11)."""
    from icelake_spark.maintenance import compute_table_stats

    t = warehouse.create_table("db.emptystats",
                               _schema(spark, "id long, v string"))
    t = t.refresh()
    out = compute_table_stats(t, spark, columns=["id", "v"]).collect()
    assert len(out) == 2
    assert all(r.ndv == 0 and r.null_count == 0 for r in out), out


def test_incremental_unknown_start_snapshot_raises(spark, warehouse):
    """An expired/unknown incremental start snapshot fails loudly
    (Iceberg parity) instead of silently re-returning the table's
    entire history as duplicates (review r11)."""
    from icelake_spark.streaming import incremental_files

    t = warehouse.create_table("db.incexp", _schema(spark, "id long"))
    t.append(spark.createDataFrame([(1,), (2,)], "id long"))
    t = t.refresh()
    with pytest.raises(ValueError, match="not found"):
        incremental_files(t, snapshot_id=999999)
    with pytest.raises(ValueError, match="not found"):
        incremental_files(t, to_snapshot_id=999999)
    # a live boundary still works
    s = t.current_snapshot().snapshot_id
    t.append(spark.createDataFrame([(3,)], "id long"))
    t = t.refresh()
    assert len(incremental_files(t, snapshot_id=s)) >= 1


def test_rename_table_refuses_existing_destination(spark, warehouse):
    """rename_table onto an existing table raises instead of silently
    merging the two trees (MemoryFileIO's rename has no collision
    check; the guard lives at the catalog level; review r11)."""
    a = warehouse.create_table("db.rn_a", _schema(spark, "id long"))
    a.append(spark.createDataFrame([(1,)], "id long"))
    warehouse.create_table("db.rn_b", _schema(spark, "id long"))
    with pytest.raises(FileExistsError, match="already exists"):
        warehouse.rename_table("db.rn_a", "db.rn_b")
    # the free name still works
    warehouse.rename_table("db.rn_a", "db.rn_c")
    from icelake_spark import IcebergTable
    got = [r.id for r in IcebergTable.load(
        warehouse.table_path("db.rn_c")).to_df(spark).collect()]
    assert got == [1]


def test_write_stream_merges_caller_properties(spark, warehouse, tmp_path):
    """write_stream append mode combines a caller-supplied properties=
    with the epoch marker instead of crashing every micro-batch with
    'multiple values for keyword argument' (review r11)."""
    from icelake_spark import datasource as ds
    from icelake_spark.streaming import write_stream

    ds.register(spark)
    src_t = warehouse.create_table("db.wsrc", _schema(spark, "id long"))
    src_t.append(spark.createDataFrame([(1,), (2,)], "id long"))
    src_t = src_t.refresh()
    dst = warehouse.create_table("db.wdst", _schema(spark, "id long"))
    stream = (spark.readStream.format("icelake")
              .option("path", src_t.path).load())
    q = write_stream(dst, stream, checkpoint=str(tmp_path / "wck"),
                     mode="append", properties={"owner": "pipeline"})
    assert q.awaitTermination(180), "stream did not drain"
    dst = dst.refresh()
    assert sorted(r.id for r in dst.to_df(spark).collect()) == [1, 2]
    assert dst.metadata.properties.get("owner") == "pipeline"


def test_avro_lane_contracts(spark):
    """avro_data contracts hardened in the r11 third sweep: exact
    integer timestamp micros (the float path drifted +-1us beyond
    ~2100, disagreeing with encode_bound), and illegal Avro column
    names fail loudly at write instead of emitting files strict
    parsers reject."""
    import datetime as dt

    from icelake_spark.avro_data import _to_avro_value, table_avro_schema
    from icelake_spark.types.datatypes import (NestedField, Schema as S2,
                                               TIMESTAMP)

    far = dt.datetime(2260, 1, 1, 0, 0, 0, 1)
    want = (far - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
    assert _to_avro_value(far, TIMESTAMP) == want
    aware = dt.datetime(2260, 1, 1, 0, 0, 0, 1, tzinfo=dt.timezone.utc)
    assert _to_avro_value(aware, TIMESTAMP) == want

    from icelake_spark.types.datatypes import LONG, StructType
    bad = S2(StructType((NestedField(1, "sum(x)", LONG,
                                     required=False),)))
    with pytest.raises(ValueError, match="legal Avro name"):
        table_avro_schema(bad)


def test_rest_commit_asserts_every_moved_ref(spark):
    """build_commit_updates asserts EVERY ref the diff moves at its
    base position, not only main: two concurrent branch writers would
    otherwise both pass the server's checks and the first commit
    silently vanish from the branch (review r11). Conversely a PURE
    branch commit must NOT assert main — that 409s on any unrelated
    main movement, the exact false conflict the code comments promise
    to avoid (ADVICE r11) — unless the commit's new snapshot forks
    off main's head, where the lineage genuinely depends on it."""
    from dataclasses import replace as dc_replace

    from icelake_spark.catalog.rest import (RestCatalog,  # noqa: F401
                                            build_commit_updates)
    from icelake_spark.types.metadata import (Snapshot, SnapshotReference,
                                              TableMetadata)

    base = TableMetadata.new("file:///tmp/t", __import__(
        "icelake_spark").types.Schema.from_spark(
        spark.createDataFrame([], "id long").schema))
    snap_a, snap_b = 111, 222
    base = base.with_snapshot(Snapshot(snap_a, 500, "/ml1.avro",
                                       {"operation": "append"},
                                       sequence_number=1))
    base = dc_replace(base, refs={
        "main": SnapshotReference(snap_a, "branch")})
    # commit that CREATES dev forked from main's head: "branch from
    # current main" genuinely depends on where main stands -> main IS
    # asserted at its base position
    new = base.with_branch_snapshot(
        Snapshot(snap_b, 1000, "/ml2.avro", {"operation": "append"},
                 parent_snapshot_id=snap_a, sequence_number=2), "dev")
    _updates, reqs = build_commit_updates(base, new)
    by_ref = {r["ref"]: r["snapshot-id"] for r in reqs
              if r.get("type") == "assert-ref-snapshot-id"}
    assert "dev" in by_ref and by_ref["dev"] is None, reqs
    assert by_ref.get("main") == snap_a, reqs

    # EXISTING branch extended — even though the new snapshot's parent
    # happens to equal main's head, parent linkage is by snapshot id,
    # not by where main points: main must NOT be asserted (review r12)
    base2 = dc_replace(base, refs={
        "main": SnapshotReference(snap_a, "branch"),
        "dev": SnapshotReference(snap_a, "branch")})
    new2 = base2.with_branch_snapshot(
        Snapshot(snap_b, 1000, "/ml2.avro", {"operation": "append"},
                 parent_snapshot_id=snap_a, sequence_number=2), "dev")
    _u2, reqs2 = build_commit_updates(base2, new2)
    by_ref2 = {r["ref"]: r["snapshot-id"] for r in reqs2
               if r.get("type") == "assert-ref-snapshot-id"}
    assert by_ref2.get("dev") == snap_a, reqs2
    assert "main" not in by_ref2, reqs2

    # diverged branches: continuing dev never touches main
    base3 = dc_replace(new2, refs={
        "main": SnapshotReference(snap_a, "branch"),
        "dev": SnapshotReference(snap_b, "branch")},
        current_snapshot_id=snap_a)
    new3 = base3.with_branch_snapshot(
        Snapshot(333, 2000, "/ml3.avro", {"operation": "append"},
                 parent_snapshot_id=snap_b, sequence_number=3), "dev")
    _u3, reqs3 = build_commit_updates(base3, new3)
    by_ref3 = {r["ref"]: r["snapshot-id"] for r in reqs3
               if r.get("type") == "assert-ref-snapshot-id"}
    assert by_ref3.get("dev") == snap_b, reqs3
    assert "main" not in by_ref3, reqs3
    # single-part identifiers fail loudly client-side
    import pytest as _p

    from icelake_spark.catalog.rest import _split_identifier
    with _p.raises(ValueError, match="namespace"):
        _split_identifier("tbl")
    assert _split_identifier("db.tbl") == ("db", "tbl")


def test_rewrite_two_delete_manifests_no_filename_collision(
        spark, warehouse):
    """A commit that rewrites TWO delete manifests must write them to
    distinct files: the filename counter previously froze at 0 inside
    the rewrite loop, so the second manifest overwrote the first —
    its surviving equality deletes vanished and deleted rows
    resurrected (review r11, corruption-class)."""
    import pyarrow.parquet as pq

    from icelake_spark.delta import (write_equality_delete_files,
                                     write_position_delete_files)
    from icelake_spark.fileio import resolve_io
    from icelake_spark.planning import canon_data_path
    from icelake_spark.transaction import Transaction

    t = warehouse.create_table("db.twodm", _schema(spark, "id long, v long"))
    t.append(spark.createDataFrame([(i, i * 10) for i in range(1, 7)],
                                   "id long, v long").coalesce(1))
    t = t.refresh()
    data, _, _ = t.new_scan().plan_files(spark)
    fpath = data[0].data_file.file_path
    io = resolve_io(t.path)
    ids = pq.read_table(io.open_input(fpath))["id"].to_pylist()

    # two commits, each ONE delete manifest holding a pos + an eq file
    for pos_id, eq_id in [(1, 2), (3, 4)]:
        pos_files = write_position_delete_files(
            t, spark.createDataFrame(
                [(canon_data_path(fpath), ids.index(pos_id))],
                "file_path string, pos long"))
        eq_files = write_equality_delete_files(
            t, spark.createDataFrame([(eq_id,)], "id long"), ["id"])
        tx = Transaction(t)
        tx.add_delete_files(pos_files + eq_files)
        tx.commit("delete")
        t = t.refresh()
    assert sorted(r.id for r in t.to_df(spark).collect()) == [5, 6]

    # compaction removes both POS files -> BOTH delete manifests
    # rewrite in one commit, each keeping its eq entry
    from icelake_spark.maintenance import rewrite_position_deletes
    n = rewrite_position_deletes(t, spark)
    t = t.refresh()
    got = sorted(r.id for r in t.to_df(spark).collect())
    # with the collision, one commit's eq delete vanished -> id 2 or 4
    # resurrected
    assert got == [5, 6], (n, got)


def test_event_associations_null_users_and_empty(spark):
    """event_associations excludes NULL users from every denominator
    (matching COUNT(DISTINCT) in the twin) and returns an empty,
    correctly-shaped frame on empty input (review r11)."""
    from icelake_spark.ops.temporal import event_associations

    df = spark.createDataFrame([(None, "a"), (1, "a"), (1, "b")],
                               "user_id long, event_type string")
    got = {(r.antecedent, r.consequent): r.support_micro
           for r in event_associations(df).collect()}
    # one REAL user -> support 1.0, not 0.5
    assert got[("a", "b")] == 1_000_000
    empty = spark.createDataFrame([], "user_id long, event_type string")
    out = event_associations(empty)
    assert out.count() == 0 and "lift_micro" in out.columns


def test_null_contract_fixes_sampling_and_sketches(spark):
    """r11 sweep-5 NULL contracts: hash_split keeps NULL keys in a
    deterministic sentinel bucket (not always-eval), temperature_sample
    keeps NULL-source rows sampling at their own rate, heavy_hitters
    excludes NULL items (est >= n holds for every returned row), and
    theta_distinct surfaces all-hashed-out groups as zero instead of
    dropping them."""
    from icelake_spark.ops.sampling import hash_split, temperature_sample
    from icelake_spark.ops.sketches import heavy_hitters, theta_distinct

    df = spark.createDataFrame(
        [(None,)] * 10 + [(f"k{i}",) for i in range(10)], "k string")
    splits = {r.split for r in
              hash_split(df, "k", train_frac=1.0).collect()}
    assert splits == {"train"}  # NULLs no longer forced to eval

    docs = spark.createDataFrame(
        [(i, None if i % 2 else "srcA") for i in range(200)],
        "doc_id long, source string")
    kept = temperature_sample(docs, budget_frac=0.5).collect()
    assert any(r.source is None for r in kept), "NULL source never sampled"

    hh = spark.createDataFrame([(None,)] * 50 + [("w",)] * 50, "w string")
    got = heavy_hitters(hh, "w", threshold_den=2).collect()
    assert [r.w for r in got] == ["w"]
    assert got[0].est_count >= got[0].n

    td = spark.createDataFrame(
        [("g1", f"v{i}") for i in range(200)] + [("g2", "only")],
        "g string, v string")
    rows = {r.g: r.est_distinct for r in
            theta_distinct(td, "v", "g", sample_den=16).collect()}
    assert set(rows) == {"g1", "g2"}  # g2 surfaces even if hashed out
