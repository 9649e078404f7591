"""FileIO abstraction: the metadata/commit plane must work off-POSIX.

- memory:// drives the whole commit protocol (create/load/conflict/
  manifest avro/expire) against an in-process store with a true atomic
  create-exclusive — no disk involved;
- mock:// is a prefix-rewriting FileIO registered for the test: every
  metadata/inventory op goes through the abstraction (a direct os.*
  call on a mock:// path would crash), while to_spark_path hands Spark
  a readable local path — proving the split the module is designed
  around (Python metadata plane / JVM data plane), end to end with
  MoR deletes, updates, and maintenance.
"""

import os

import pytest
from pyspark.sql import functions as F

from icelake_spark import IcebergTable, StorageCatalog
from icelake_spark.fileio import (
    LocalFileIO,
    MemoryFileIO,
    io_join,
    norm_path,
    register_io,
    rel_under,
    resolve_io,
    unregister_io,
)
from icelake_spark.types import Schema


def test_path_helpers():
    assert io_join("s3://b/t", "metadata", "v1.json") == "s3://b/t/metadata/v1.json"
    assert io_join("/x", "y") == os.path.join("/x", "y")
    assert norm_path("s3://b/a/../c") == "s3://b/c"
    assert norm_path("file:///x/y") == "/x/y"
    assert rel_under("s3://b/t", "s3://b/t/data/f.parquet") == "data/f.parquet"
    assert rel_under("s3://b/t", "s3://b/t") == "."
    assert resolve_io("/tmp/x") is resolve_io("file:///tmp/x")
    assert isinstance(resolve_io("memory://x"), MemoryFileIO)


def test_memory_io_primitives():
    MemoryFileIO.clear()
    io = resolve_io("memory://wh/a/b")
    io.write_bytes("memory://wh/a/b/f.txt", b"hello")
    assert io.read_bytes("memory://wh/a/b/f.txt") == b"hello"
    assert io.size("memory://wh/a/b/f.txt") == 5
    io.create_exclusive("memory://wh/a/b/g.txt", b"x")
    with pytest.raises(FileExistsError):
        io.create_exclusive("memory://wh/a/b/g.txt", b"y")
    assert sorted(p for p, _ in io.list_files("memory://wh/a")) == [
        "memory://wh/a/b/f.txt", "memory://wh/a/b/g.txt"]
    io.rename("memory://wh/a", "memory://wh/z")
    assert io.read_bytes("memory://wh/z/b/f.txt") == b"hello"
    io.delete("memory://wh/z/b/f.txt")
    with pytest.raises(FileNotFoundError):
        io.read_bytes("memory://wh/z/b/f.txt")
    MemoryFileIO.clear()


def test_memory_catalog_commit_protocol(spark):
    """Full metadata lifecycle on memory://: create → manifest-backed
    commits → load → optimistic-conflict → expire (file deletes through
    the io). No Spark data job touches the store."""
    from icelake_spark.transaction import Transaction
    from icelake_spark.types.manifest import DataFile, read_manifest_list

    MemoryFileIO.clear()
    src = spark.range(10).selectExpr("id", "cast(id as string) as s")
    cat = StorageCatalog("memory://wh")
    t = cat.create_table("db.m", Schema.from_spark(src.schema))
    assert cat.list_tables() == ["db.m"]
    assert cat.table_exists("db.m") and not cat.table_exists("db.absent")

    # two commits of metadata-only data files (paths live on memory too)
    for i in range(2):
        io = resolve_io(t.path)
        fp = f"{t.path}/data/f{i}.parquet"
        io.write_bytes(fp, b"not-a-real-parquet")
        tx = Transaction(t)
        tx.add_data_files([DataFile(file_path=fp, partition={},
                                    record_count=5, file_size_in_bytes=18)])
        tx.commit("append")

    t2 = cat.load_table("db.m")
    assert t2.current_version == 3
    snap = t2.current_snapshot()
    assert snap.summary["total-data-files"] == "2"
    mles = read_manifest_list(t2._resolve(snap.manifest_list))
    assert mles and all(m.manifest_path.startswith("memory://") for m in mles)
    data, _, _ = t2.new_scan().plan_files()
    assert len(data) == 2

    # optimistic conflict: two writers from the same base version
    stale = cat.load_table("db.m")
    tx_a = Transaction(stale)
    tx_b = Transaction(cat.load_table("db.m"))
    tx_a.add_data_files([DataFile(file_path=f"{t.path}/data/a.parquet",
                                  partition={}, record_count=1,
                                  file_size_in_bytes=1)])
    tx_b.add_data_files([DataFile(file_path=f"{t.path}/data/b.parquet",
                                  partition={}, record_count=1,
                                  file_size_in_bytes=1)])
    tx_a.commit("append")
    tx_b.commit("append")  # retries against the refreshed base
    assert cat.load_table("db.m").current_version == 5

    # expire: snapshots drop and their manifests are deleted VIA the io
    from icelake_spark.maintenance import expire_snapshots

    t3 = cat.load_table("db.m")
    before = len(resolve_io(t3.path).list_files(io_join(t3.path, "metadata")))
    n = expire_snapshots(t3, older_than_ms=10**18, retain_last=1)
    assert n >= 1
    after = len(resolve_io(t3.path).list_files(io_join(t3.path, "metadata")))
    assert after < before
    MemoryFileIO.clear()


class MockFileIO(LocalFileIO):
    """mock://<rel> ⇄ <root>/<rel>; to_spark_path exposes the local
    form so Spark can read/write the data plane."""

    def __init__(self, root: str):
        self.root = root

    def _p(self, path: str) -> str:
        assert path.startswith("mock://"), f"os-path leaked: {path}"
        return os.path.join(self.root, path[len("mock://"):])

    def _m(self, local: str) -> str:
        return "mock://" + os.path.relpath(local, self.root)

    def list_files(self, prefix):
        out = []
        for root_, _d, names in os.walk(self._p(prefix)):
            for n in names:
                p = os.path.join(root_, n)
                try:
                    out.append((self._m(p), os.path.getsize(p)))
                except OSError:
                    pass
        return out

    def find_marker_dirs(self, base, marker):
        return [self._m(r) for r in
                LocalFileIO.find_marker_dirs(self, base, marker)]

    def to_spark_path(self, path: str) -> str:
        return self._p(path)


@pytest.fixture()
def mock_io(tmp_path):
    io = MockFileIO(str(tmp_path / "mockfs"))
    register_io("mock", lambda path: io)
    yield io
    unregister_io("mock")


def test_mock_scheme_end_to_end(spark, mock_io):
    """Write+commit+MoR-read a table whose every metadata path is
    mock:// — nothing in the stack may touch the path with os.* (the
    MockFileIO asserts), and Spark sees only translated data paths."""
    src = spark.range(200).selectExpr("id", "id % 4 as g",
                                      "cast(id as string) as s")
    cat = StorageCatalog("mock://wh")
    t = cat.create_table("db.remote", Schema.from_spark(src.schema))
    t.append(src)
    assert cat.list_tables() == ["db.remote"]

    # recorded data-file paths live in the mock scheme
    data, _, _ = t.new_scan().plan_files()
    assert all(d.data_file.file_path.startswith("mock://") for d in data)

    # MoR position delete + equality-delta upsert, then read back
    t.delete_where(spark, "g = 3")
    from icelake_spark.delta import upsert

    up = spark.range(5).selectExpr("id", "id % 4 as g",
                                   "'updated' as s")
    upsert(t, up, key_cols=["id"])

    back = cat.load_table("db.remote").to_df(spark)
    rows = {r.id: r.s for r in back.collect()}
    expect_ids = {i for i in range(200) if i % 4 != 3} | {3}
    # ids 0..4 upserted (including id=3, re-inserted after the delete)
    assert set(rows) == expect_ids
    assert rows[0] == "updated" and rows[3] == "updated"
    assert rows[5] == "5"

    # row-level UPDATE through the same plane
    from icelake_spark.delta import update_rows

    update_rows(t, spark, "id = 8", {"s": "'patched'"})
    rows2 = {r.id: r.s for r in cat.load_table("db.remote")
             .to_df(spark).collect()}
    assert rows2[8] == "patched" and rows2[9] == "9"

    # time travel still resolves through mock manifests
    first = t.metadata.snapshots[0]
    assert t.to_df(spark, snapshot_id=first.snapshot_id).count() == 200


def test_mock_scheme_copy_on_write_and_maintenance(spark, mock_io):
    src = spark.range(100).selectExpr("id", "cast(id as string) as s")
    cat = StorageCatalog("mock://wh2")
    t = cat.create_table("db.cow", Schema.from_spark(src.schema),
                         properties={"write.delete.mode": "copy-on-write"})
    t.append(src)
    t.delete_where(spark, "id >= 90")
    assert cat.load_table("db.cow").to_df(spark).count() == 90

    from icelake_spark.maintenance import expire_snapshots, rewrite_data_files

    rewrite_data_files(t, spark)
    assert cat.load_table("db.cow").to_df(spark).count() == 90
    expire_snapshots(t, older_than_ms=10**18, retain_last=1)
    t4 = cat.load_table("db.cow")
    data, _, _ = t4.new_scan().plan_files()
    assert t4.to_df(spark).count() == 90
    assert all(d.data_file.file_path.startswith("mock://") for d in data)


def test_mock_scheme_partitioned_write(spark, mock_io):
    """Partitioned append on a URI table: hive partition dirs parse
    through the URI-safe rel_under, partition values land in the
    manifests, and pruning works."""
    from icelake_spark.types.metadata import PartitionField, PartitionSpec

    src = spark.range(300).selectExpr("id", "id % 3 as g")
    schema = Schema.from_spark(src.schema)
    spec = PartitionSpec(0, (PartitionField(
        schema.field_by_name("g").field_id, 1000, "identity", "g"),))
    cat = StorageCatalog("mock://wh3")
    t = cat.create_table("db.part", schema, spec=spec)
    t.append(src)
    data, _, _ = t.new_scan().plan_files()
    assert {d.data_file.partition.get("g") for d in data} == {0, 1, 2}
    pruned, _, _ = t.new_scan(filter="g = 1").plan_files()
    assert len(pruned) < len(data)
    assert t.to_df(spark, filter="g = 1").count() == 100


def test_resolve_path_uri_sibling_prefix():
    """s3://wh/sales must NOT claim s3://wh/sales_v2/... as its own
    (review fix: bare startswith passed sibling-prefix paths through
    instead of re-rooting)."""
    from icelake_spark.planning import resolve_path

    assert resolve_path("s3://wh/sales", "s3://wh/sales/data/f.parquet") \
        == "s3://wh/sales/data/f.parquet"
    assert resolve_path("s3://wh/sales", "s3://wh/sales_v2/data/f.parquet") \
        == "s3://wh/sales/data/f.parquet"
    assert resolve_path("s3://wh/sales", "/old/root/data/f.parquet") \
        == "s3://wh/sales/data/f.parquet"


# ------------------------------------------------- conditional-put commits


def test_arrow_io_conditional_put_routing():
    """With a conditional-put backend registered for the scheme,
    ArrowFileIO.create_exclusive routes to it WITHOUT touching the
    (possibly unreachable) filesystem — no exists() probe, no
    connection. Without one it falls back to check-then-write."""
    from icelake_spark.fileio import (
        ArrowFileIO,
        register_conditional_put,
        unregister_conditional_put,
    )

    store: dict[str, bytes] = {}

    def putter(path: str, data: bytes) -> None:
        if path in store:
            raise FileExistsError(path)
        store[path] = bytes(data)

    register_conditional_put("s3", putter)
    try:
        # no credentials / endpoint exist in this environment: any real
        # fs access would fail, so success proves the putter handled it
        io = ArrowFileIO("s3://no-such-bucket/wh")
        io.create_exclusive("s3://no-such-bucket/wh/v2.metadata.json", b"x")
        assert store == {"s3://no-such-bucket/wh/v2.metadata.json": b"x"}
        with pytest.raises(FileExistsError):
            io.create_exclusive("s3://no-such-bucket/wh/v2.metadata.json", b"y")
    finally:
        unregister_conditional_put("s3")


class CondPutFileIO(LocalFileIO):
    """condput://<rel> ⇄ <root>/<rel> with OBJECT-STORE commit
    semantics: create_exclusive mimics ArrowFileIO exactly — a
    registered conditional putter wins, else UNSAFE check-then-write.
    Everything else rides LocalFileIO so Spark can read the data."""

    def __init__(self, root: str):
        self.root = root

    def _p(self, path: str) -> str:
        assert path.startswith("condput://"), f"os-path leaked: {path}"
        return os.path.join(self.root, path[len("condput://"):])

    def _m(self, local: str) -> str:
        return "condput://" + os.path.relpath(local, self.root)

    def create_exclusive(self, path: str, data: bytes) -> None:
        # identical branch structure to ArrowFileIO.create_exclusive
        from icelake_spark.fileio import _COND_PUT, path_scheme

        putter = _COND_PUT.get(path_scheme(path))
        if putter is not None:
            putter(path, data)
            return
        if self.exists(path):
            raise FileExistsError(path)
        self.write_bytes(path, data)

    def list_files(self, prefix):
        out = []
        for root_, _d, names in os.walk(self._p(prefix)):
            for n in names:
                p = os.path.join(root_, n)
                try:
                    out.append((self._m(p), os.path.getsize(p)))
                except OSError:
                    pass
        return out

    def find_marker_dirs(self, base, marker):
        return [self._m(r) for r in
                LocalFileIO.find_marker_dirs(self, base, marker)]

    def to_spark_path(self, path: str) -> str:
        return self._p(path)


def test_conditional_put_transaction_race(spark, tmp_path):
    """Two committers racing from the SAME base version against a
    conditional-put store: exactly one wins the first attempt, the
    other's create_exclusive raises FileExistsError → CommitConflict →
    one clean retry through the real Transaction loop. The putter call
    count proves the conditional path (not check-then-write) decided."""
    import threading

    from icelake_spark.fileio import (
        register_conditional_put,
        register_io,
        unregister_conditional_put,
        unregister_io,
    )
    from icelake_spark.transaction import Transaction
    from icelake_spark.types.manifest import DataFile

    root = str(tmp_path / "condfs")
    io = CondPutFileIO(root)
    lock = threading.Lock()
    calls = {"puts": 0, "conflicts": 0}
    # both committers pass the optimistic version pre-check before
    # either writes — the exact window only a conditional put closes
    barrier = threading.Barrier(2, timeout=30)
    race_version = []

    def putter(path: str, data: bytes) -> None:
        local = os.path.join(root, path[len("condput://"):])
        if race_version and path.endswith(race_version[0]):
            barrier.wait()
        with lock:
            calls["puts"] += 1
            if os.path.exists(local):
                calls["conflicts"] += 1
                raise FileExistsError(path)
            os.makedirs(os.path.dirname(local), exist_ok=True)
            with open(local, "wb") as f:
                f.write(data)

    register_io("condput", lambda path: io)
    register_conditional_put("condput", putter)
    try:
        src = spark.range(10).selectExpr("id", "cast(id as string) as s")
        cat = StorageCatalog("condput://wh")
        t = cat.create_table("db.race", Schema.from_spark(src.schema))
        t.append(src)
        contested = t.current_version + 1
        race_version.append(f"v{contested}.metadata.json")

        base_a = cat.load_table("db.race")
        base_b = cat.load_table("db.race")
        tx_a, tx_b = Transaction(base_a), Transaction(base_b)
        tx_a.add_data_files([DataFile(
            file_path="condput://wh/db/race/data/a.parquet",
            partition={}, record_count=1, file_size_in_bytes=1)])
        tx_b.add_data_files([DataFile(
            file_path="condput://wh/db/race/data/b.parquet",
            partition={}, record_count=1, file_size_in_bytes=1)])
        errs = []

        def run(tx):
            try:
                tx.commit("append")
            except Exception as e:  # pragma: no cover - fail loudly below
                errs.append(e)

        th_a = threading.Thread(target=run, args=(tx_a,))
        th_b = threading.Thread(target=run, args=(tx_b,))
        th_a.start(), th_b.start()
        th_a.join(60), th_b.join(60)
        assert not errs, errs

        t2 = cat.load_table("db.race")
        from icelake_spark.fileio import basename as _bn

        paths = {_bn(d.data_file.file_path)
                 for d in t2.new_scan().plan_files()[0]}
        assert {"a.parquet", "b.parquet"} <= paths
        assert calls["conflicts"] == 1  # exactly one losing attempt
        assert t2.current_version == contested + 1
    finally:
        unregister_conditional_put("condput")
        unregister_io("condput")


def test_s3_conditional_put_enabler_with_injected_client():
    """enable_s3_conditional_put accepts an injected (boto3-shaped)
    client: sends If-None-Match: * and maps 412/PreconditionFailed to
    FileExistsError so commit_metadata raises CommitConflict."""
    pytest.importorskip("botocore")
    from botocore.exceptions import ClientError

    from icelake_spark.fileio import (
        ArrowFileIO,
        enable_s3_conditional_put,
        unregister_conditional_put,
    )

    class FakeS3:
        def __init__(self):
            self.objs = {}

        def put_object(self, Bucket, Key, Body, IfNoneMatch):
            assert IfNoneMatch == "*"
            if (Bucket, Key) in self.objs:
                raise ClientError(
                    {"Error": {"Code": "PreconditionFailed"}}, "PutObject")
            self.objs[(Bucket, Key)] = Body

    enable_s3_conditional_put(client=FakeS3())
    try:
        io = ArrowFileIO("s3://bkt/wh")
        io.create_exclusive("s3://bkt/wh/metadata/v1.metadata.json", b"x")
        with pytest.raises(FileExistsError):
            io.create_exclusive("s3://bkt/wh/metadata/v1.metadata.json", b"y")
    finally:
        unregister_conditional_put("s3")


def test_mock_scheme_dsv2_read_parquet_and_orc(spark, mock_io):
    """spark.read.format("icelake") on a register_io (mock://) table
    holding BOTH parquet and ORC data files: the DSv2 executors read
    through the FileIO shipped with the reader (a raw-path
    pq.read_table / ORCFile would crash on mock://), consistent with
    how the metadata plane resolves."""
    import sys

    from pyspark import cloudpickle

    from icelake_spark import datasource

    # MockFileIO lives in this test module, which Spark's fresh python
    # workers cannot import — ship it by value inside the registry
    # snapshot instead (a real deployment's FileIO classes live in an
    # installed package, where this is unnecessary)
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    datasource.register(spark)
    src = spark.range(50).selectExpr("id", "cast(id as string) as s")
    cat = StorageCatalog("mock://whd")
    t = cat.create_table("db.mixed", Schema.from_spark(src.schema))
    t.append(src.where("id < 30"))
    t.set_properties({"write.format.default": "orc"})
    t = cat.load_table("db.mixed")
    t.append(src.where("id >= 30"))

    data, _, _ = t.new_scan().plan_files()
    fmts = {(d.data_file.file_format or "PARQUET").upper() for d in data}
    assert fmts == {"PARQUET", "ORC"}
    assert all(d.data_file.file_path.startswith("mock://") for d in data)

    df = spark.read.format("icelake").option("path", t.path).load()
    assert sorted(r.id for r in df.collect()) == list(range(50))
    assert df.where("id = 42").collect()[0].s == "42"

    # the partition-based STREAM reader reads the same files on
    # executors through the same shipped FileIO
    import tempfile

    ck = tempfile.mkdtemp()
    out = tempfile.mkdtemp()
    q = (spark.readStream.format("icelake").option("path", t.path).load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck).trigger(availableNow=True)
         .start())
    assert q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 50
    cloudpickle.unregister_pickle_by_value(sys.modules[__name__])


def test_mock_scheme_dsv2_read_avro_batch_and_stream(spark, mock_io):
    """Regression for the r6 AVRO executor-read routing
    (datasource.py:_read_avro_arrow): AVRO data files on a register_io
    custom-scheme table must be decoded from bytes served by the
    SHIPPED FileIO on executors, for BOTH the batch and the stream DSv2
    readers — before the fix the pure-python codec open()ed the raw
    mock:// path on the worker and crashed."""
    import sys
    import tempfile

    from pyspark import cloudpickle

    from icelake_spark import datasource

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    try:
        datasource.register(spark)
        src = spark.range(40).selectExpr("id", "cast(id as string) as s")
        # the avro WRITE lane ships the driver-resolved FileIO with the
        # task closure, so appending straight to the mock:// table
        # exercises both directions of the routing
        cat = StorageCatalog("mock://whavro")
        t = cat.create_table(
            "db.av", Schema.from_spark(src.schema),
            properties={"write.format.default": "avro"})
        t.append(src.where("id < 25"))
        t = cat.load_table("db.av")
        t.append(src.where("id >= 25"))
        t = cat.load_table("db.av")

        data, _, _ = t.new_scan().plan_files()
        assert {(d.data_file.file_format or "").upper()
                for d in data} == {"AVRO"}
        assert all(d.data_file.file_path.startswith("mock://")
                   for d in data)

        df = spark.read.format("icelake").option("path", t.path).load()
        assert sorted(r.id for r in df.collect()) == list(range(40))
        assert df.where("id = 7").collect()[0].s == "7"

        ck, out = tempfile.mkdtemp(), tempfile.mkdtemp()
        q = (spark.readStream.format("icelake")
             .option("path", t.path).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(120)
        assert spark.read.parquet(out).count() == 40
    finally:
        cloudpickle.unregister_pickle_by_value(sys.modules[__name__])


def test_arrow_io_key_authority_conventions():
    """ArrowFileIO must hand authority-scoped filesystems (hdfs) PURE
    paths while bucket stores (s3/gs) keep bucket/key — and rebuild
    full URIs (authority included) from listings."""
    from icelake_spark.fileio import ArrowFileIO

    hdfs = ArrowFileIO("hdfs://host:8020/wh")
    hdfs._fs, hdfs._pure_path = object(), True  # no live hdfs here
    assert hdfs._key("hdfs://host:8020/wh/a.txt") == "/wh/a.txt"
    assert hdfs._authority() == "hdfs://host:8020"

    s3 = ArrowFileIO("s3://bucket/wh")
    s3._fs, s3._pure_path = object(), False
    assert s3._key("s3://bucket/wh/a.txt") == "bucket/wh/a.txt"
    assert s3._authority() == "s3://"
