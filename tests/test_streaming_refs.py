"""Streaming ingest (foreachBatch sink), branches/tags, schema
evolution, REST protocol body shapes."""

import os

import pytest
from pyspark.sql import functions as F

from icelake_spark.types import Schema


def test_stream_append_into_table(spark, warehouse, tmp_path):
    from icelake_spark.streaming import write_stream

    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    base = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    base.coalesce(1).write.mode("append").parquet(src_dir)

    t = warehouse.create_table("db.streamed", Schema.from_spark(base.schema))
    stream = (spark.readStream.schema(base.schema).parquet(src_dir))
    q = write_stream(t, stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    t.refresh()
    assert t.to_df(spark).count() == 100

    # second file → second micro-batch → second snapshot
    base.selectExpr("id + 100 as id", "v").coalesce(1).write.mode(
        "append").parquet(src_dir)
    q2 = write_stream(t, (spark.readStream.schema(base.schema).parquet(src_dir)),
                      checkpoint=str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    t.refresh()
    assert t.to_df(spark).count() == 200
    assert len(t.metadata.snapshots) == 2


def test_stream_append_replay_is_idempotent(spark, warehouse, tmp_path):
    """Crash-replay simulation: wipe the streaming checkpoint after a
    drained run and re-run the same source through the same checkpoint
    path — Spark re-delivers batch 0, and the epoch marker recorded in
    the table properties must make the replayed append a no-op
    (foreachBatch is at-least-once; without the guard the table doubles).
    """
    import shutil

    from icelake_spark.streaming import write_stream

    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    base = spark.range(50).select(F.col("id"), (F.col("id") * 2).alias("v"))
    base.coalesce(1).write.mode("append").parquet(src_dir)

    t = warehouse.create_table("db.replayed", Schema.from_spark(base.schema))
    ckpt = str(tmp_path / "ckpt")
    q = write_stream(t, spark.readStream.schema(base.schema).parquet(src_dir),
                     checkpoint=ckpt)
    assert q.awaitTermination(120)
    t.refresh()
    assert t.to_df(spark).count() == 50

    shutil.rmtree(ckpt)  # lose the streaming commit log -> full replay
    q2 = write_stream(t, spark.readStream.schema(base.schema).parquet(src_dir),
                      checkpoint=ckpt)
    assert q2.awaitTermination(120)
    t.refresh()
    assert t.to_df(spark).count() == 50  # replayed epoch skipped
    assert len(t.metadata.snapshots) == 1


def test_stream_upsert_mode(spark, warehouse, tmp_path):
    from icelake_spark.streaming import write_stream

    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    b1.coalesce(1).write.mode("append").parquet(src_dir)
    t = warehouse.create_table("db.sups", Schema.from_spark(b1.schema))
    q = write_stream(t, spark.readStream.schema(b1.schema).parquet(src_dir),
                     checkpoint=str(tmp_path / "c1"), mode="upsert",
                     key_cols=["k"])
    q.awaitTermination(120)
    b2 = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    b2.coalesce(1).write.mode("append").parquet(src_dir)
    q = write_stream(t, spark.readStream.schema(b1.schema).parquet(src_dir),
                     checkpoint=str(tmp_path / "c1"), mode="upsert",
                     key_cols=["k"])
    q.awaitTermination(120)
    t.refresh()
    rows = {r.k: r.v for r in t.to_df(spark).collect()}
    assert rows == {1: "a", 2: "B", 3: "c"}


def test_incremental_read(spark, warehouse):
    from icelake_spark.streaming import stream_from_table

    df = spark.range(10).select("id")
    t = warehouse.create_table("db.incr", Schema.from_spark(df.schema))
    t.append(df)
    s1 = t.current_snapshot().snapshot_id
    t.append(spark.range(10, 15).select("id"))
    inc = stream_from_table(spark, t, snapshot_id=s1)
    assert sorted(r.id for r in inc.collect()) == [10, 11, 12, 13, 14]


def test_branches_and_tags(spark, warehouse, wide_df):
    t = warehouse.create_table("db.refs", Schema.from_spark(wide_df.schema))
    t.append(wide_df)
    s1 = t.current_snapshot().snapshot_id
    t.create_tag("v1.0", s1)
    t.create_branch("dev")
    t.append(wide_df)
    assert t.to_df(spark, ref="main").count() == 10
    assert t.to_df(spark, ref="v1.0").count() == 5
    assert t.to_df(spark, ref="dev").count() == 5
    with pytest.raises(KeyError):
        t.to_df(spark, ref="nope")
    t.drop_ref("dev")
    with pytest.raises(KeyError):
        t.to_df(spark, ref="dev")
    with pytest.raises(ValueError):
        t.drop_ref("main")
    # refs survive reload
    from icelake_spark import IcebergTable

    t2 = IcebergTable.load(t.path)
    assert t2.to_df(spark, ref="v1.0").count() == 5


def test_schema_evolution_add_column(spark, warehouse):
    df = spark.range(5).select("id")
    t = warehouse.create_table("db.evolve", Schema.from_spark(df.schema))
    t.append(df)
    s1 = t.current_snapshot().snapshot_id
    t.add_column("note", "string")
    assert t.schema().field_by_name("note").field_id == 2
    # old files read with the new column as null
    rows = t.to_df(spark).collect()
    assert all(r.note is None for r in rows) and len(rows) == 5
    # new writes carry the column
    t.append(spark.createDataFrame([(100, "hi")], "id long, note string"))
    rows = {r.id: r.note for r in t.to_df(spark).collect()}
    assert rows[100] == "hi" and rows[0] is None
    # snapshot-pinned read uses the old schema
    old = t.to_df(spark, snapshot_id=s1)
    assert old.columns == ["id"]
    with pytest.raises(ValueError):
        t.add_column("note", "string")


def test_rest_protocol_bodies():
    from icelake_spark.catalog import rest
    from icelake_spark.types import Schema, TableMetadata
    from icelake_spark.types.datatypes import LONG, NestedField, StructType

    schema = Schema(StructType((NestedField(1, "id", LONG, True),)))
    md = TableMetadata.new("/w/db/t", schema)
    body = rest.create_table_body("t", md)
    assert body["name"] == "t"
    assert body["schema"]["fields"][0]["id"] == 1
    assert body["partition-spec"] == {"spec-id": 0, "fields": []}

    from icelake_spark.types.metadata import Snapshot

    snap = Snapshot(5, 123, "/ml.avro", {"operation": "append"},
                    parent_snapshot_id=4, sequence_number=3)
    upd = rest.add_snapshot_update(snap)
    assert upd["action"] == "add-snapshot"
    assert upd["snapshot"]["snapshot-id"] == 5
    assert upd["snapshot"]["sequence-number"] == 3
    ref = rest.set_ref_update("main", 5)
    assert ref == {"action": "set-snapshot-ref", "ref-name": "main",
                   "type": "branch", "snapshot-id": 5}
    req = rest.assert_ref_requirement("main", 4)
    assert req == {"type": "assert-ref-snapshot-id", "ref": "main",
                   "snapshot-id": 4}
    assert rest.namespace_path("a.b.c") == "a\x1fb\x1fc"


def test_rest_catalog_roundtrip_fake_http(spark, tmp_path):
    """Drive RestCatalog against a fake in-process HTTP session that
    implements the storage behavior — validates URL shapes + body use."""
    import json as _json

    from icelake_spark.catalog.rest import RestCatalog
    from icelake_spark.types import Schema as _S, TableMetadata

    store: dict[str, dict] = {}

    class FakeResponse:
        def __init__(self, body, status=200):
            self._body, self.status_code = body, status

        def json(self):
            return self._body

        def raise_for_status(self):
            if self.status_code >= 400:
                raise RuntimeError(f"http {self.status_code}")

    class FakeSession:
        headers: dict = {}

        def get(self, url, params=None):
            if url.endswith("/config"):
                return FakeResponse({"overrides": {}})
            name = url.rsplit("/", 1)[-1]
            if name in store:
                return FakeResponse({"metadata": store[name]})
            return FakeResponse({}, 404)

        def post(self, url, json=None):
            if url.endswith("/tables"):  # create
                md = TableMetadata.new(str(tmp_path / json["name"]),
                                       _S.from_json_dict(json["schema"]))
                store[json["name"]] = md.to_json_dict()
                return FakeResponse({"metadata": store[json["name"]]})
            # commit: apply add-snapshot
            name = url.rsplit("/", 1)[-1]
            md = TableMetadata.from_json_dict(store[name])
            for u in json["updates"]:
                if u["action"] == "add-snapshot":
                    from icelake_spark.types.metadata import Snapshot

                    md = md.with_snapshot(Snapshot.from_json(u["snapshot"]))
            store[name] = md.to_json_dict()
            return FakeResponse({"metadata": store[name]})

        def delete(self, url):
            store.pop(url.rsplit("/", 1)[-1], None)
            return FakeResponse({})

    cat = RestCatalog("http://fake:8181", session=FakeSession())
    df = spark.range(7).select("id")
    t = cat.create_table("db.remote", _S.from_spark(df.schema))
    os.makedirs(os.path.join(t.path, "metadata"), exist_ok=True)
    t.append(df)  # commit goes through RestCatalog.update_table
    t2 = cat.load_table("db.remote")
    assert t2.current_snapshot() is not None
    assert t2.to_df(spark).count() == 7


def test_write_audit_publish(spark, warehouse):
    """WAP: stage commits on a branch, audit them, fast-forward main."""
    from icelake_spark.types import Schema

    src = spark.range(200).selectExpr("id", "id % 2 as g")
    t = warehouse.create_table("db.wap", Schema.from_spark(src.schema))
    t.append(src.where("id < 100"))
    t = t.refresh()
    main_head = t.current_snapshot().snapshot_id

    t.append(src.where("id >= 100"), branch="audit")
    t = t.refresh()
    # main unmoved; audit sees staged data
    assert t.current_snapshot().snapshot_id == main_head
    assert t.to_df(spark).count() == 100
    assert t.to_df(spark, ref="audit").count() == 200
    # staged snapshot's parent is the fork point
    staged = t.snapshot(ref="audit")
    assert staged.parent_snapshot_id == main_head

    # audit passed -> publish
    t.fast_forward("main", "audit")
    t = t.refresh()
    assert t.to_df(spark).count() == 200
    assert t.current_snapshot().snapshot_id == staged.snapshot_id

    # stacking a second staged commit on the same branch
    t.append(src.selectExpr("id + 1000 as id", "g"), branch="audit")
    t = t.refresh()
    assert t.to_df(spark, ref="audit").count() == 400
    assert t.to_df(spark).count() == 200


def test_fast_forward_unknown_ref(spark, warehouse):
    from icelake_spark.types import Schema

    src = spark.range(10).selectExpr("id")
    t = warehouse.create_table("db.wap2", Schema.from_spark(src.schema))
    t.append(src)
    t = t.refresh()
    import pytest as _pytest
    with _pytest.raises(KeyError):
        t.fast_forward("main", "nope")


def test_rest_namespace_rename_and_conflict():
    """Mocked-server coverage for the remaining REST surface: namespace
    create/list/drop, table rename, and 409→CommitFailedError."""
    from icelake_spark.catalog.rest import (CommitFailedError, RestCatalog,
                                            rename_table_body)

    calls = []

    class FakeResponse:
        def __init__(self, body=None, status=200):
            self._body, self.status_code = body or {}, status

        def json(self):
            return self._body

        def raise_for_status(self):
            if self.status_code >= 400:
                raise RuntimeError(f"http {self.status_code}")

    class FakeSession:
        headers: dict = {}

        def get(self, url, params=None):
            calls.append(("GET", url, params))
            if url.endswith("/namespaces"):
                return FakeResponse({"namespaces": [["db"], ["db", "x"]]})
            return FakeResponse({})

        def post(self, url, json=None):
            calls.append(("POST", url, json))
            if url.endswith("/tables/t_conflict"):
                return FakeResponse(
                    {"error": {"message": "Requirement failed: branch main "
                               "has changed"}}, 409)
            return FakeResponse({})

        def delete(self, url):
            calls.append(("DELETE", url, None))
            return FakeResponse({})

    cat = RestCatalog("http://fake:8181", session=FakeSession())

    cat.create_namespace("db.x", {"owner": "me"})
    m, url, body = calls[-1]
    assert (m, body) == ("POST", {"namespace": ["db", "x"],
                                  "properties": {"owner": "me"}})
    assert url.endswith("/v1/namespaces")

    assert cat.list_namespaces() == ["db", "db.x"]

    cat.drop_namespace("db.x")
    assert calls[-1][0] == "DELETE" and calls[-1][1].endswith(
        "/v1/namespaces/db\x1fx")

    cat.rename_table("db.a", "db2.b")
    m, url, body = calls[-1]
    assert url.endswith("/v1/tables/rename")
    assert body == {"source": {"namespace": ["db"], "name": "a"},
                    "destination": {"namespace": ["db2"], "name": "b"}}
    assert rename_table_body("t", "db.t")["source"]["namespace"] == []

    # requirement failure surfaces as the typed retryable error
    import pytest as _pytest
    from icelake_spark.types.metadata import Snapshot, TableMetadata
    from icelake_spark.types import Schema
    from icelake_spark.types.datatypes import LONG, NestedField, StructType

    md = TableMetadata.new("/w/db/t_conflict",
                           Schema(StructType((NestedField(1, "id", LONG, True),))))
    md = md.with_snapshot(Snapshot(1, 1, "/ml.avro", {"operation": "append"},
                                   sequence_number=1))
    with _pytest.raises(CommitFailedError) as ei:
        cat.update_table("/w/db/t_conflict", 0, md, identifier="db.t_conflict")
    assert "Requirement failed" in str(ei.value)


def test_stream_from_table_skips_compaction_and_branches(spark, warehouse):
    """Incremental read must not re-emit compaction rewrites or leak
    WAP branch-staged snapshots (review r2)."""
    from icelake_spark.maintenance import rewrite_data_files
    from icelake_spark.streaming import stream_from_table
    from icelake_spark.types import Schema

    src = spark.range(100).selectExpr("id")
    t = warehouse.create_table("db.sft", Schema.from_spark(src.schema))
    t.append(src.where("id < 50"))
    t = t.refresh()
    s1 = t.current_snapshot().snapshot_id
    t.append(src.where("id >= 50"))
    t = t.refresh()
    assert stream_from_table(spark, t, snapshot_id=s1).count() == 50
    rewrite_data_files(t, spark)
    t = t.refresh()
    # compaction rewrote all files; incremental read must stay at 50
    assert stream_from_table(spark, t, snapshot_id=s1).count() == 50
    # branch-staged rows must not leak before fast-forward
    t.append(src.selectExpr("id + 1000 as id"), branch="audit")
    t = t.refresh()
    assert stream_from_table(spark, t, snapshot_id=s1).count() == 50
    t.fast_forward("main", "audit")
    t = t.refresh()
    assert stream_from_table(spark, t, snapshot_id=s1).count() == 150


def test_as_of_ms_and_fast_forward_respect_wap(spark, warehouse):
    """Timestamp time travel must not resolve branch-staged snapshots;
    fast_forward preserves retention knobs and rejects tags."""
    import time

    import pytest as _p

    from icelake_spark.types import Schema

    src = spark.range(50).selectExpr("id")
    t = warehouse.create_table("db.wap2", Schema.from_spark(src.schema))
    t.append(src.where("id < 25"))
    t = t.refresh()
    # main with retention knobs
    t.create_ref("main", "branch", min_snapshots_to_keep=5)
    t = t.refresh()
    t.append(src.where("id >= 25"), branch="audit")
    t = t.refresh()
    now_ms = int(time.time() * 1000) + 1000
    # as-of "now" must see main's 25 rows, not the staged 50
    assert t.to_df(spark, as_of_ms=now_ms).count() == 25
    t.create_tag("v1")
    t = t.refresh()
    with _p.raises(ValueError, match="tag"):
        t.fast_forward("v1", "audit")
    t.fast_forward("main", "audit")
    t = t.refresh()
    assert t.metadata.refs["main"].min_snapshots_to_keep == 5
    assert t.to_df(spark, as_of_ms=int(time.time() * 1000) + 1000).count() == 50


def test_build_commit_updates_diffs_metadata():
    """update_table bodies are a DIFF of base vs new metadata: a
    property-only commit sends set-properties (not a bogus
    add-snapshot), schema evolution sends add-schema, a rollback moves
    the ref, and the main-ref requirement asserts the BASE's actual
    head — not max-of-snapshot-ids (review r3)."""
    from dataclasses import replace as dc_replace

    from icelake_spark.catalog import rest
    from icelake_spark.types import Schema
    from icelake_spark.types.datatypes import LONG, NestedField, StructType
    from icelake_spark.types.metadata import (Snapshot, SnapshotReference,
                                              TableMetadata)

    schema = Schema(StructType((NestedField(1, "id", LONG, True),)))
    base = TableMetadata.new("/w/t", schema)
    base = base.with_snapshot(Snapshot(11, None, "/ml1.avro",
                                       {"operation": "append"},
                                       sequence_number=1))
    base = base.with_snapshot(Snapshot(7, 11, "/ml2.avro",
                                       {"operation": "append"},
                                       sequence_number=2))

    # property-only commit: no ref moves, no snapshot lineage — only
    # the uuid requirement (asserting main here would 409 against any
    # unrelated concurrent append; ADVICE r11)
    new = dc_replace(base, properties={**base.properties, "k": "v"})
    ups, reqs = rest.build_commit_updates(base, new)
    actions = [u["action"] for u in ups]
    assert actions == ["set-properties"]
    assert [r["type"] for r in reqs] == ["assert-table-uuid"], reqs

    # new snapshot commit: moves main, which must be asserted at the
    # base's CURRENT head (7), not max(ids)=11 (review r3)
    new2 = base.with_snapshot(Snapshot(3, 7, "/ml3.avro",
                                       {"operation": "append"},
                                       sequence_number=3))
    ups2, reqs2 = rest.build_commit_updates(base, new2)
    a2 = [u["action"] for u in ups2]
    assert "add-snapshot" in a2 and "set-snapshot-ref" in a2
    assert all(u["snapshot"]["snapshot-id"] == 3 for u in ups2
               if u["action"] == "add-snapshot")
    ref_req = next(r for r in reqs2 if r["type"] == "assert-ref-snapshot-id")
    assert ref_req["ref"] == "main" and ref_req["snapshot-id"] == 7, reqs2

    # rollback: ref moves, no snapshot added
    rolled = dc_replace(base, current_snapshot_id=11, refs={
        **base.refs, "main": SnapshotReference(11, "branch")})
    ups3, _ = rest.build_commit_updates(base, rolled)
    a3 = [u["action"] for u in ups3]
    assert "set-snapshot-ref" in a3 and "add-snapshot" not in a3

    # schema evolution
    s2 = Schema(StructType((NestedField(1, "id", LONG, True),
                            NestedField(2, "v", LONG, False))), 1)
    evolved = dc_replace(base, schemas=base.schemas + (s2,),
                         current_schema_id=1, last_column_id=2)
    ups4, _ = rest.build_commit_updates(base, evolved)
    a4 = [u["action"] for u in ups4]
    assert "add-schema" in a4 and "set-current-schema" in a4


def test_stream_from_table_incremental_on_v1(spark, warehouse):
    """v1 snapshots all carry sequence 0 — the incremental window must
    key on ancestry, or 'new since snapshot X' returns empty forever."""
    from icelake_spark.streaming import stream_from_table
    from icelake_spark.types import Schema

    src = spark.range(20).selectExpr("id")
    t = warehouse.create_table("db.sft_v1", Schema.from_spark(src.schema),
                               format_version=1)
    t.append(src.where("id < 10"))
    t = t.refresh()
    s1 = t.current_snapshot().snapshot_id
    t.append(src.where("id >= 10"))
    t = t.refresh()
    assert stream_from_table(spark, t, snapshot_id=s1).count() == 10
