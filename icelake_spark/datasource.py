"""Python DataSource (Spark 4 API): `spark.read.format("icelake")`.

Registers the Iceberg table layer as a first-class Spark data source:

    spark.dataSource.register(IcelakeDataSource)
    df = (spark.read.format("icelake")
          .option("path", "/warehouse/db/table")
          .option("snapshot_id", "...")          # optional time travel
          .load())

Planning (snapshot → pruned file list) runs on the driver exactly like
TableScan; `pushFilters` feeds simple comparisons into the zone-map file
pruner before Spark sees the partitions; each InputPartition is one data
file read via pyarrow with its MoR deletes applied in-place.

NOTE ON THE FAST PATH: rows here flow through Python workers (the Python
DataSource contract), which cannot match the JVM vectorized parquet
reader. `IcebergTable.to_df()` remains the performance path — this
source exists for API completeness (SQL `USING icelake`, format-based
readers, catalog-less tools). Parity target: the DSv2 upgrade path noted
in SURVEY §4 / /root/reference's engine integrations.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

try:  # pushdown filter classes vary by minor version
    from pyspark.sql.datasource import GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual
except ImportError:  # pragma: no cover
    GreaterThan = GreaterThanOrEqual = LessThan = LessThanOrEqual = ()


@dataclass
class _FileTask(InputPartition):
    file_path: str
    sequence_number: int
    pos_deletes: list[tuple[str, int]]  # (delete file, delete seq)
    eq_deletes: list[tuple[str, tuple[str, ...], int]]  # (file, key cols, seq)
    # driver-resolved (pos, delete_seq) list for THIS file, when the
    # delete set was small enough to group once on the driver — avoids
    # every task re-reading every delete file (N tasks × M files)
    resolved_pos: list[tuple[int, int]] | None = None
    file_format: str = "PARQUET"  # PARQUET | ORC | AVRO (add_files)


class IcelakeDataSource(DataSource):
    # register(spark) snapshots register_io factories here so planner/
    # executor workers (fresh processes) can resolve custom schemes
    _io_registry: dict = {}

    def __init__(self, options):
        super().__init__(options)
        self._install_io_registry()

    def _install_io_registry(self) -> None:
        """Reinstall the snapshotted register_io factories in THIS
        process. Called from every entry point, not only __init__ —
        Spark pickles the DataSource instance between its planner
        workers, and unpickling does not re-run __init__. OVERWRITES
        any prior factory for the scheme: planner workers are reused
        across queries, so a stale registration (an earlier session's
        re-register_io of the same scheme — different root, rotated
        credentials) would otherwise shadow this query's snapshot
        forever (was setdefault; surfaced as 'no metadata files' under
        the OLD root)."""
        if type(self)._io_registry:
            from . import fileio

            for sch, fac in type(self)._io_registry.items():
                fileio._REGISTRY[sch] = fac

    @classmethod
    def name(cls) -> str:
        return "icelake"

    def schema(self):
        from pyspark.sql.types import StructField, StructType

        from .table import IcebergTable

        self._install_io_registry()
        t = IcebergTable.load(self.options["path"])
        # sources report plain nullable fields: Spark normalizes scan
        # output to nullable, and the streaming runner asserts the Arrow
        # batches it prefetches round-trip to EXACTLY this schema — field
        # metadata (our Iceberg column ids) would not survive Arrow
        fields = [StructField(f.name, f.dataType, True)
                  for f in t.schema().to_spark().fields]
        if self.options.get("changelog", "").lower() in ("true", "1"):
            from pyspark.sql.types import StringType

            fields.append(StructField("_change_type", StringType(), True))
        return StructType(fields)

    def reader(self, schema) -> "IcelakeReader":
        if self.options.get("changelog", "").lower() in ("true", "1"):
            # the option is a STREAMING-read feature; a batch scan would
            # otherwise return the plain current snapshot with an
            # all-NULL _change_type column masquerading as CDC rows
            raise ValueError(
                "changelog=true is only supported with readStream; for a "
                "batch changelog use IcebergTable.changes(spark)")
        self._install_io_registry()
        return IcelakeReader(self.options, schema)

    def streamReader(self, schema) -> "IcelakePartitionStreamReader":  # noqa: N802
        """Partition-based micro-batch source (the scale path): planned
        per offset range on the driver, READ ON EXECUTORS — one
        InputPartition per data file (plain mode) or per snapshot
        (changelog mode), nothing materialized driver-side."""
        self._install_io_registry()
        return IcelakePartitionStreamReader(self.options, schema)

    def simpleStreamReader(self, schema) -> "IcelakeStreamReader":  # noqa: N802
        self._install_io_registry()
        return IcelakeStreamReader(self.options, schema)

    def streamWriter(self, schema, overwrite: bool) -> "IcelakeStreamWriter":  # noqa: N802
        self._install_io_registry()
        return IcelakeStreamWriter(self.options, schema)


def _rename_map(table) -> dict[str, list[str]]:
    """{current name: [former names not reused elsewhere]} from the
    table's rename name-mapping — the DSv2 arrow readers resolve a
    column missing under its current name through its former name, the
    same coalesce TableScan._with_name_mapping applies (a bare
    null-pad would silently blank every pre-rename row)."""
    import json as _json

    from .table import PROP_NAME_MAPPING

    raw = table.metadata.properties.get(PROP_NAME_MAPPING)
    if not raw:
        return {}
    mapping = _json.loads(raw)
    schema = table.schema()
    current = {f.name for f in schema.fields}
    out: dict[str, list[str]] = {}
    for f in schema.fields:
        old = [n for n in mapping.get(str(f.field_id), [])
               if n != f.name and n not in current]
        if old:
            out[f.name] = old
    return out


def _read_avro_arrow(spark_schema, file_path: str,
                     table_store: str = "", io=None,
                     field_ids: dict[str, int] | None = None,
                     rename_map: dict[str, list[str]] | None = None,
                     foreign: bool = False):
    """Decode one avro data file into an Arrow table matching
    `spark_schema` (pure-python codec; shared by the batch and stream
    DSv2 readers). Bytes resolve like _arrow_src: through the SHIPPED
    FileIO when the file lives on the table's store — executor workers
    never see register_io factories, so a custom-scheme table's avro
    files are unreadable there without the pickled instance.

    Columns resolve with the SAME identity stack as the parquet path
    (review r13 — pure name binding resurrected dropped-and-readded
    columns' stale values): field-id first via the avro schema's
    `field-id` annotations (a recorded-but-unmatched id pads NULL —
    the physical column belongs to a dropped field's id), then current
    name, then former names from the rename mapping; `foreign`
    (add_files import) disables id resolution — the file's ids belong
    to another table's id space."""
    import pyarrow as pa
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_schema

    from . import avro_io
    from .avro_data import _converters
    from .fileio import is_uri, resolve_io
    from .types.datatypes import Schema as _IceSchema

    plain = T.StructType([f for f in spark_schema.fields
                          if f.name != "_change_type"])
    arrow_schema = to_arrow_schema(plain)
    decoders = {name: dec for name, _enc, dec
                in _converters(_IceSchema.from_spark(plain))}
    if not is_uri(file_path):
        data = None  # local path: avro_io reads it directly
    elif io is not None and _store_of(file_path) == table_store:
        data = io.read_bytes(file_path)
    else:
        data = resolve_io(file_path).read_bytes(file_path)
    wschema, records = avro_io.read_avro(file_path, data=data)
    afields = (wschema.get("fields", [])
               if isinstance(wschema, dict) else [])
    id_to_name = {f["field-id"]: f["name"] for f in afields
                  if isinstance(f, dict) and "field-id" in f}
    in_file = ({f["name"] for f in afields if isinstance(f, dict)}
               or ({n for n in records[0]} if records else set()))

    def _src_name(n: str) -> str | None:
        fid = (field_ids or {}).get(n)
        if not foreign and id_to_name and fid is not None:
            # file RECORDS ids: the id is the identity — an unmatched
            # id means the column did not exist at write time (or was
            # dropped and re-added under a new id); NULL, never a
            # same-named physical column's stale values
            return id_to_name.get(fid)
        if n in in_file:
            return n
        for old in (rename_map or {}).get(n, ()):
            if old in in_file:
                return old
        return None

    cols = {}
    for f in arrow_schema:
        src = _src_name(f.name)
        if src is None:
            cols[f.name] = pa.nulls(len(records), type=f.type)
        else:
            cols[f.name] = pa.array(
                [decoders[f.name](rec.get(src)) for rec in records],
                type=f.type)
    return pa.table(cols)


def _store_of(path: str) -> str:
    """scheme://authority — the store identity a FileIO instance is
    scoped to (matches resolve_io's cache key and resolve_path's
    _store): two hdfs:// clusters or two buckets are DIFFERENT stores
    even though they share a scheme."""
    from .fileio import path_scheme

    sch = path_scheme(path)
    if not sch:
        return ""
    rest = path[len(sch) + 3:]
    return f"{sch}://{rest.split('/', 1)[0]}"


def _arrow_src(path: str, table_store: str = "", io=None):
    """A pyarrow-readable source for a recorded file path: local paths
    pass through (pyarrow's native I/O); URI schemes open through
    FileIO — the SHIPPED `io` instance when the path lives on the
    table's STORE (scheme+authority; register_io customs resolve only
    in the planning process, so the pickled FileIO travels with the
    reader), else a fresh resolve (pyarrow-native schemes like s3://
    reconnect in any process — e.g. a same-scheme add_files import on
    another bucket/cluster must NOT ride the table's connection)."""
    from .fileio import is_uri, resolve_io

    if not is_uri(path):
        return path
    if io is not None and _store_of(path) == table_store:
        return io.open_input(path)
    return resolve_io(path).open_input(path)


def _is_foreign_file(table_path: str, file_path: str) -> bool:
    """True when `file_path` lives OUTSIDE the table's directory — the
    add_files import signature. Such files' PARQUET:field_id values
    belong to ANOTHER table's id space (and numerically collide with
    ours more often than not), so id resolution must not apply to
    them. Provenance-by-location replaces the former zero-id-overlap
    heuristic, which misfired for this table's OWN old files once every
    column they recorded had been dropped and re-added (the name
    fallback then resurrected the dropped columns' stale values —
    exactly what the id path exists to prevent)."""
    from .fileio import norm_path

    base = norm_path(table_path).rstrip("/")
    p = norm_path(file_path)
    return not (p == base or p.startswith(base + "/"))


def _parquet_id_map(pa_schema, foreign: bool = False) -> dict[int, str]:
    """{field_id: physical column name} from the file's PARQUET:field_id
    metadata — present in files written by Java Iceberg / pyiceberg /
    our own writer (write.py stamps parquet.field.id). Top level only;
    nested member binding is handled separately (_rebind_struct).
    `foreign=True` (see _is_foreign_file) disables id resolution so the
    caller falls back to names."""
    if foreign:
        return {}
    out: dict[int, str] = {}
    for f in pa_schema:
        v = (f.metadata or {}).get(b"PARQUET:field_id")
        if v is not None:
            try:
                out[int(v)] = f.name
            except ValueError:
                pass
    return out


def _rebind_struct(arr, ice_struct, expected_type):
    """Rebind a struct column's MEMBERS by the file's nested
    PARQUET:field_id metadata (externally-written Iceberg files keep
    physical member names from write time; the id, not the name, is
    the member's identity — in_memory.rs:341-429). Falls back to name
    per member; genuinely-new members pad null. `expected_type` is the
    requested arrow struct type (member names/order from the table
    schema); recursion covers nested structs."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    at = arr.type
    if not pa.types.is_struct(at) or not pa.types.is_struct(expected_type):
        return arr
    id_of: dict[int, int] = {}
    name_of: dict[str, int] = {}
    for i in range(at.num_fields):
        f = at.field(i)
        name_of[f.name] = i
        v = (f.metadata or {}).get(b"PARQUET:field_id")
        if v is not None:
            try:
                id_of[int(v)] = i
            except ValueError:
                pass
    children, names, identical = [], [], at.num_fields == len(ice_struct.fields)
    for pos, nf in enumerate(ice_struct.fields):
        exp_child = expected_type.field(pos).type
        idx = id_of.get(nf.field_id)
        if idx is None:
            idx = name_of.get(nf.name)
        if idx is None:
            child = pa.nulls(len(arr), type=exp_child)
            identical = False
        else:
            child = arr.field(idx)
            if idx != pos or at.field(idx).name != nf.name:
                identical = False
            from .types.datatypes import StructType as _IceStruct

            if isinstance(nf.field_type, _IceStruct):
                rebound = _rebind_struct(child, nf.field_type, exp_child)
                if rebound is not child:
                    identical = False
                child = rebound
            if child.type != exp_child:
                try:
                    child = child.cast(exp_child)
                    identical = False
                except pa.ArrowInvalid:
                    pass
        names.append(nf.name)
        children.append(child)
    if identical:
        return arr
    return pa.StructArray.from_arrays(
        children, names=names,
        mask=arr.is_null() if arr.null_count else None)


def _resolve_column(table, name: str, rename_map: dict[str, list[str]],
                    field_id: int | None = None,
                    id_map: dict[int, str] | None = None):
    """The arrow column for `name` — by FIELD ID first when the file
    records ids (the spec's identity rule: a renamed column must bind
    to its id, and a REUSED former name must not shadow the original —
    FieldProjector parity, partition_splitter.rs:16-86), else by
    current name, else via a former name from the rename mapping;
    None when absent entirely (schema evolution: new column)."""
    if field_id is not None and id_map:
        phys = id_map.get(field_id)
        if phys is not None and phys in table.column_names:
            return table[phys]
        # the file RECORDS ids but not this one: the column did not
        # exist when the file was written (e.g. DROP COLUMN c then
        # ADD COLUMN c — the physical 'c' belongs to the OLD id and a
        # name fallback would resurrect its stale values). Project NULL.
        return None
    if name in table.column_names:
        return table[name]
    for old in rename_map.get(name, ()):
        if old in table.column_names:
            return table[old]
    return None


class IcelakeReader(DataSourceReader):
    def __init__(self, options: dict, schema):
        self.options = options
        self.spark_schema = schema
        self.filter_parts: list[str] = []
        from .table import IcebergTable

        t = IcebergTable.load(options["path"])
        self.rename_map = _rename_map(t)
        schema = t.schema()
        self.field_ids = {f.name: f.field_id for f in schema.fields}
        # iceberg member types for nested rebinding (picklable dataclasses)
        self.ice_fields = {f.name: f.field_type for f in schema.fields}
        # FileIO shipped to executors for URI-scheme data/delete reads
        # (resolved HERE so register_io customs travel via pickle)
        from .fileio import is_uri, resolve_io

        self.table_store = _store_of(options["path"])
        self.io = resolve_io(options["path"]) if is_uri(options["path"]) \
            else None

    def _src(self, path: str):
        return _arrow_src(path, self.table_store, self.io)

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Accept simple comparisons and IN lists for zone-map file
        pruning; everything is reported back as unsupported so Spark
        still applies it row-level (our pruning is an optimization, not
        an evaluation). IN feeds the planner's DNF pruning (each value
        an OR branch — any-branch-might-match keeps the file)."""
        try:
            from pyspark.sql.datasource import In as _In
        except ImportError:  # pragma: no cover - older minor versions
            _In = ()
        ops = {EqualTo: "=", GreaterThan: ">", GreaterThanOrEqual: ">=",
               LessThan: "<", LessThanOrEqual: "<="}

        def _lit(v) -> str:
            # repr() of date/datetime/Decimal values contains parens
            # ("datetime.date(2024, 1, 5)"), which make the DNF parser
            # bail and silently disable ALL file pruning for the query.
            # Quoted ISO forms parse back via _parse_literal.
            import datetime as _dt
            import decimal as _dec

            if isinstance(v, _dt.datetime):
                return f"'{v.isoformat(sep=' ')}'"
            if isinstance(v, _dt.date):
                return f"'{v.isoformat()}'"
            if isinstance(v, _dec.Decimal):
                return str(v)
            return repr(v)

        for f in filters:
            op = next((s for cls, s in ops.items()
                       if isinstance(cls, type) and isinstance(f, cls)), None)
            if op is not None and len(f.attribute) == 1:
                self.filter_parts.append(
                    f"{f.attribute[0]} {op} {_lit(f.value)}")
            elif _In and isinstance(f, _In) and len(f.attribute) == 1 \
                    and f.value:
                vals = ", ".join(_lit(v) for v in f.value)
                self.filter_parts.append(f"{f.attribute[0]} IN ({vals})")
            yield f  # unsupported → Spark re-applies (safe)

    def partitions(self) -> list[_FileTask]:
        from .table import IcebergTable

        t = IcebergTable.load(self.options["path"])
        if "start_snapshot_id" in self.options:
            # incremental append scan (Iceberg's start/end-snapshot-id
            # batch read options): files ADDED in the ancestry window,
            # no MoR delete application (append-only contract —
            # table.incremental parity)
            from .streaming import incremental_files

            end = self.options.get("end_snapshot_id")
            files = incremental_files(
                t, int(self.options["start_snapshot_id"]),
                int(end) if end is not None else None,
                skip_overwrites=self.options.get(
                    "skip_overwrite_snapshots", "false").lower() == "true")
            return [_FileTask(p, 0, [], [], resolved_pos=[],
                              file_format=fmt) for p, fmt in files]
        kwargs: dict[str, Any] = {}
        if "snapshot_id" in self.options:
            kwargs["snapshot_id"] = int(self.options["snapshot_id"])
        if "as_of_ms" in self.options:
            kwargs["as_of_ms"] = int(self.options["as_of_ms"])
        if "ref" in self.options:
            kwargs["ref"] = self.options["ref"]
        if self.filter_parts:
            kwargs["filter"] = " AND ".join(self.filter_parts)
        scan = t.new_scan(**kwargs)
        data, pos, eq = scan.plan_files()
        schema = t.schema()
        from .planning import canonical_partition, scoped_partition_key

        pos_list = [(p.delete_file.file_path, p.sequence_number) for p in pos]
        eq_entries = []
        for e in eq:
            eq_ids = tuple(e.delete_file.equality_ids or ())
            cols = tuple(schema.name_by_id(fid) or "" for fid in eq_ids)
            if cols and not all(cols):
                # a live eq-delete file keyed on a since-DROPPED column
                # cannot be applied; silently skipping it (the pre-r13
                # behavior) resurrected every row it tombstoned — the
                # native path raises the same error (table.py
                # _apply_deletes; code-review r8)
                missing = [fid for fid, c in zip(eq_ids, cols) if not c]
                raise ValueError(
                    f"equality-delete files key on dropped column ids "
                    f"{missing}; rewrite deletes (rewrite_position_"
                    f"deletes / compaction) before dropping key columns")
            if cols:
                eq_entries.append((e.delete_file.file_path, cols,
                                   e.sequence_number,
                                   scoped_partition_key(
                                       e.delete_file.partition)))

        def _eq_for(d):
            # partition-scoped eq deletes ship only to data files of
            # their own partition — the same spec scoping the native
            # read path applies (review r12); global deletes (empty /
            # all-None tuples) ship everywhere
            dk = canonical_partition(d.data_file.partition or None)
            return [(p, c, s) for p, c, s, k in eq_entries
                    if k is None or k == dk]
        # small delete sets: group (pos, seq) by target file ONCE on the
        # driver so each task ships/reads only its own deletes; big sets
        # keep the lazy per-task path (driver memory stays bounded).
        # cutoff reads the SAME table property as TableScan._apply_deletes
        # and the changelog reader so tuning it governs every read path
        pos_map: dict[str, list[tuple[int, int]]] | None = None
        threshold = int(t.metadata.properties.get(
            "read.delete.broadcast-threshold-bytes", 32 * 1024 * 1024))
        total_del = sum(p.delete_file.file_size_in_bytes or 0 for p in pos)
        if pos and total_del <= threshold:
            import pyarrow.parquet as pq

            pos_map = {}
            for p in pos:
                dt = pq.read_table(self._src(p.delete_file.file_path),
                                   columns=["file_path", "pos"])
                for src, ps in zip(dt["file_path"].to_pylist(),
                                   dt["pos"].to_pylist()):
                    pos_map.setdefault(_norm(src), []).append(
                        (ps, p.sequence_number))
        return [_FileTask(d.data_file.file_path, d.sequence_number,
                          [] if pos_map is not None else pos_list,
                          _eq_for(d),
                          resolved_pos=(pos_map.get(
                              _norm(d.data_file.file_path), [])
                              if pos_map is not None else None),
                          file_format=(d.data_file.file_format
                                       or "PARQUET").upper())
                for d in data]

    def read(self, partition: _FileTask) -> Iterator:
        """Read one data file with pyarrow (format-dispatched: the table
        layer legitimately holds ORC/AVRO files via add_files and
        write.format.default), apply MoR deletes, yield Arrow record
        batches (Spark converts via Arrow)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        fmt = (partition.file_format or "PARQUET").upper()
        foreign = _is_foreign_file(self.options["path"], partition.file_path)
        if fmt == "ORC":
            from pyarrow import orc as pa_orc

            table = pa_orc.ORCFile(self._src(partition.file_path)).read()
        elif fmt == "AVRO":
            table = _read_avro_arrow(self.spark_schema, partition.file_path,
                                     self.table_store, self.io,
                                     self.field_ids, self.rename_map,
                                     foreign)
        else:
            table = pq.read_table(self._src(partition.file_path))

        # position deletes targeting this file, seq-gated
        drop_rows: set[int] = set()
        if partition.resolved_pos is not None:
            drop_rows = {p for p, dseq in partition.resolved_pos
                         if partition.sequence_number <= dseq}
        else:
            for dpath, dseq in partition.pos_deletes:
                if partition.sequence_number > dseq:
                    continue
                dt = pq.read_table(self._src(dpath),
                                   columns=["file_path", "pos"])
                fp = dt["file_path"].to_pylist()
                pos = dt["pos"].to_pylist()
                for f, p in zip(fp, pos):
                    if _norm(f) == _norm(partition.file_path):
                        drop_rows.add(p)
        if drop_rows:
            mask = pa.array((i not in drop_rows
                                 for i in range(table.num_rows)), type=pa.bool_())
            table = table.filter(mask)

        # equality deletes: data_seq < delete_seq. A key column missing
        # from an old file reads as NULL — it must MATCH AS NULL, not be
        # dropped from the key (narrowing the key over-deletes: every
        # row sharing the present columns would match).
        id_map_k = _parquet_id_map(table.schema, foreign)  # loop-invariant
        for dpath, cols, dseq in partition.eq_deletes:
            if not partition.sequence_number < dseq:
                continue
            cols = list(cols)
            # delete files hold only key cols — resolve them with the
            # SAME field-id/rename stack as data columns: after
            # ALTER TABLE ... RENAME COLUMN the current key name is not
            # in old delete files, and an all-None pad would resurrect
            # every deleted row AND spuriously delete NULL-key rows
            # (code-review r8)
            dt = pq.read_table(self._src(dpath))
            id_map_d = _parquet_id_map(
                dt.schema, _is_foreign_file(self.options["path"], dpath))
            del_cols = {}
            for c in cols:
                arr = _resolve_column(dt, c, self.rename_map,
                                      self.field_ids.get(c), id_map_d)
                del_cols[c] = (arr.to_pylist() if arr is not None
                               else [None] * dt.num_rows)
            deleted = set(zip(*[del_cols[c] for c in cols]))
            key_cols = {}
            for c in cols:  # field-id/rename-aware resolution
                arr = _resolve_column(table, c, self.rename_map,
                                      self.field_ids.get(c), id_map_k)
                key_cols[c] = (arr.to_pylist() if arr is not None
                               else [None] * table.num_rows)
            keys = zip(*[key_cols[c] for c in cols])
            mask = pa.array((k not in deleted for k in keys),
                            type=pa.bool_())
            table = table.filter(mask)

        # project/pad to the requested schema — the shared resolution
        # stack (field-id / rename / struct rebind / spec-physical
        # normalization / promotion cast; new columns pad as null)
        yield from _project_table_to_schema(
            table, self.spark_schema, self.rename_map, self.field_ids,
            self.ice_fields, foreign).to_batches()


def _project_table_to_schema(table, spark_schema, rename_map, field_ids,
                             ice_fields, foreign):
    """Project/pad an Arrow table to the declared Spark schema with the
    FULL resolution stack every reader must apply identically: field-id
    first, then current name, then former name; nested struct member
    rebinding; uuid/time spec-physical normalization; and the type-
    promotion cast (int→long etc. for files written before
    ALTER COLUMN TYPE). The streaming runner asserts batches round-trip
    to exactly the declared schema, so a reader skipping any of these
    crashes (or mis-types) on evolved tables."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    from .types.datatypes import StructType as _IceStruct

    id_map = _parquet_id_map(table.schema, foreign)
    names = [f.name for f in spark_schema.fields]
    arrays = []
    for f in spark_schema.fields:
        n = f.name
        arr = _resolve_column(table, n, rename_map, field_ids.get(n),
                              id_map)
        if arr is not None and isinstance(ice_fields.get(n), _IceStruct):
            arr = _rebind_struct(arr, ice_fields[n],
                                 to_arrow_type(f.dataType))
        arr = _spec_physical_to_spark(arr, ice_fields.get(n))
        if arr is not None:
            exp = to_arrow_type(f.dataType)
            if arr.type != exp and (
                    pa.types.is_integer(exp) or pa.types.is_floating(exp)
                    or pa.types.is_decimal(exp)):
                try:
                    arr = arr.cast(exp)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    pass
        arrays.append(arr if arr is not None else pa.nulls(table.num_rows))
    return pa.Table.from_arrays(arrays, names=names)


def _spec_physical_to_spark(arr, ice_type):
    """Normalize the two Iceberg spec physical types Spark has no
    native type for — written by the arrow writer lane
    (write.py:write_parquet_arrow) — back to the Spark-side convention
    the rest of the engine uses: uuid fixed[16] → canonical-hex string,
    time64[µs] → int64 µs. Gated on the table's declared Iceberg type
    (a fixed[16] BINARY column must stay raw bytes); everything else
    passes through untouched."""
    import uuid as _uuidlib

    import pyarrow as pa

    if arr is None:
        return None
    name = getattr(ice_type, "name", None)
    t = arr.type
    if name == "uuid" and pa.types.is_fixed_size_binary(t) \
            and t.byte_width == 16:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return pa.array(
            [None if v is None else str(_uuidlib.UUID(bytes=v))
             for v in arr.to_pylist()], type=pa.string())
    if name == "time" and pa.types.is_time(t):
        return arr.cast(pa.int64())
    return arr


def _stream_offset_of(table, s) -> int:
    """Monotone offset for a snapshot: sequence number on format v2;
    commit timestamp on v1 (every v1 snapshot has seq 0, so seq offsets
    would never advance and the stream would sit empty forever)."""
    if table.metadata.format_version >= 2:
        return s.sequence_number
    return s.timestamp_ms


def _stream_end_offset(table) -> int:
    """Max offset over MAIN-ANCESTRY snapshots only — the global
    last_sequence_number also counts WAP branch-staged commits, so using
    it would advance the offset past an unpublished snapshot and
    permanently skip its rows once fast_forward publishes it."""
    main_ids = table.metadata.ancestry_ids()
    return max((_stream_offset_of(table, s)
                for s in table.metadata.snapshots
                if s.snapshot_id in main_ids), default=0)


def _stream_files_between(table, start_seq: int,
                          end_seq: int) -> list[tuple[str, str]]:
    """(path, format) of data files ADDED by append snapshots in
    (start_seq, end_seq] on the main ancestry — the deterministic replay
    set both stream readers derive micro-batches from."""
    from .types.manifest import STATUS_ADDED, read_manifest, read_manifest_list

    out: list[tuple[str, str]] = []
    main_ids = table.metadata.ancestry_ids()
    for s in sorted(table.metadata.snapshots,
                    key=lambda s: s.sequence_number):
        if s.snapshot_id not in main_ids:
            continue  # WAP branch-staged snapshot: not published
        if not (start_seq < _stream_offset_of(table, s) <= end_seq):
            continue
        if s.summary.get("operation", "append") != "append":
            continue
        for mle in read_manifest_list(table._resolve(s.manifest_list)):
            if mle.added_snapshot_id != s.snapshot_id:
                continue
            _, entries = read_manifest(table._resolve(mle.manifest_path))
            out.extend((table._resolve(e.data_file.file_path),
                        (e.data_file.file_format or "PARQUET").upper())
                       for e in entries
                       if e.status == STATUS_ADDED
                       and e.data_file.content == 0)
    return out


def _append_offsets(table) -> list[int]:
    """Sorted DISTINCT stream offsets of main-ancestry APPEND
    snapshots — the only snapshots that contribute files to the
    partition stream. Deduped because v1 offsets are commit
    timestamps: two appends in the same millisecond share an offset,
    and _stream_snapshot_files(off) already returns their combined
    file list — a duplicate offset would emit (and budget) every one
    of those files twice."""
    main_ids = table.metadata.ancestry_ids()
    return sorted({
        _stream_offset_of(table, s) for s in table.metadata.snapshots
        if s.snapshot_id in main_ids
        and s.summary.get("operation", "append") == "append"})


def _stream_snapshot_files(table, seq: int,
                           cache: dict | None = None) -> list[tuple[str, str]]:
    """Path-SORTED (path, format) files added by the snapshot at stream
    offset `seq`. The sort makes the file-granular offset coordinate
    ({"seq": s, "files": k} = first k files of the next append
    snapshot) deterministic across triggers and restarts. `cache`
    (reader-held, keyed by offset) avoids re-reading a pending
    snapshot's manifests on every trigger — snapshots are immutable,
    so entries never invalidate."""
    if cache is not None and seq in cache:
        return cache[seq]
    files = sorted(_stream_files_between(table, seq - 1, seq))
    if cache is not None:
        cache[seq] = files
    return files


def _stream_files_range(table, s1: int, k1: int, s2: int, k2: int,
                        cache: dict | None = None) -> list[tuple[str, str]]:
    """Files between composite offsets (s1, k1) and (s2, k2]: offset
    (s, k) means every snapshot with offset <= s is fully emitted plus
    the first k path-sorted files of the NEXT append snapshot after s
    (k = 0 degenerates to the original snapshot-granular offset)."""
    apps = _append_offsets(table)
    t1 = next((o for o in apps if o > s1), None)
    out: list[tuple[str, str]] = []
    for t in apps:
        if not (s1 < t <= s2):
            continue
        fl = _stream_snapshot_files(table, t, cache)
        out.extend(fl[k1 if (k1 and t == t1) else 0:])
    if k2:
        t_end = next((o for o in apps if o > s2), None)
        if t_end is not None:
            fl = _stream_snapshot_files(table, t_end, cache)
            out.extend(fl[k1 if (k1 and t_end == t1) else 0:k2])
    return out


def _plan_changelog_tasks(table, start_off: int, end_off: int) -> list:
    """Driver-side changelog planning with STRICTLY LINEAR manifest
    I/O: one walk over the main ancestry reads each manifest list and
    each added-by manifest EXACTLY ONCE, maintaining the alive-data-
    file map incrementally (alive(s) = alive(parent) + ADDED − DELETED;
    EXISTING entries from manifest rewrites are no-ops). Every
    decodable in-range snapshot becomes one _ChangeSnapshotTask
    carrying its complete payload — own added-file lists, the prior
    delete-FILE lists, and (only when it has deletes to decode) the
    alive-before-it file map — so executor tasks perform ZERO manifest
    reads. This replaces the per-task prior-snapshot re-walk that made
    a micro-batch O(snapshots²) in manifest I/O."""
    from .types.manifest import (STATUS_ADDED, STATUS_DELETED,
                                 read_manifest, read_manifest_list)

    out = []
    main_ids = table.metadata.ancestry_ids()
    pos_acc: list[str] = []
    eq_acc: list[tuple[str, int]] = []
    alive: dict[str, tuple[str, int]] = {}  # canon → (path, seq)
    first_walked = True
    # sort by the STREAM offset (seq on v2, commit timestamp on v1
    # where every seq is 0), matching _changelog_rows: the early break
    # below is only safe when the walk order is the offset order
    for snap in sorted(table.metadata.snapshots,
                       key=lambda x: (_stream_offset_of(table, x),
                                      x.sequence_number)):
        if snap.snapshot_id not in main_ids:
            continue
        off = _stream_offset_of(table, snap)
        if off > end_off:
            break  # later snapshots cannot affect this window
        summary = snap.summary or {}
        decodable = not (
            summary.get("operation", "append") == "replace"
            or int(summary.get("deleted-data-files", 0) or 0) > 0)
        in_range = start_off < off <= end_off
        added_data, added_pos, added_eq = [], [], []
        alive_updates: list[tuple[str, str, int, int]] = []
        for mle in read_manifest_list(table._resolve(snap.manifest_list)):
            foreign = mle.added_snapshot_id != snap.snapshot_id
            if foreign and not first_walked:
                continue  # carried forward unchanged: no alive change
            # the FIRST retained snapshot seeds `alive` from its FULL
            # manifest list: files added by since-EXPIRED snapshots
            # survive only via carried-forward manifests whose
            # added_snapshot_id is no longer in metadata.snapshots —
            # skipping them would drop their rows' delete events
            _, entries = read_manifest(table._resolve(mle.manifest_path))
            for e in entries:
                seq = (e.sequence_number if e.sequence_number is not None
                       else mle.sequence_number)
                p = table._resolve(e.data_file.file_path)
                if e.data_file.content == 0:
                    if foreign:
                        if e.is_alive:
                            # predates this snapshot: alive BEFORE it
                            alive[_norm(p)] = (p, seq)
                        continue
                    alive_updates.append((e.status, p, seq, 0))
                    if e.status == STATUS_ADDED:
                        added_data.append((p, seq))
                elif not foreign and e.status == STATUS_ADDED:
                    if e.data_file.content == 1:
                        added_pos.append((p, seq))
                    else:
                        added_eq.append((p, seq))
        first_walked = False
        if in_range and decodable:
            out.append(_ChangeSnapshotTask(
                snap.snapshot_id,
                added_data=tuple(added_data),
                added_pos=tuple(added_pos),
                added_eq=tuple(added_eq),
                prior_pos_files=tuple(pos_acc),
                prior_eq_files=tuple(eq_acc),
                older=(tuple((c, p, q) for c, (p, q) in alive.items())
                       if (added_pos or added_eq) else ()),
            ))
        # eq-dead tracking accumulates over EVERY walked snapshot, not
        # just in-range ones: an eq-delete committed before this micro-
        # batch's window must still suppress a later snapshot's repeat
        # delete of the same (already dead) key, or batch boundaries
        # change the changelog (phantom duplicate delete events vs the
        # batch changes() API, which always folds the parent's full
        # delete set — code-review r8)
        eq_acc.extend(added_eq)
        pos_acc.extend(p for p, _s in added_pos)
        for status, p, seq, _c in alive_updates:
            if status == STATUS_DELETED:
                alive.pop(_norm(p), None)
            else:  # ADDED or EXISTING (rewrite): (re)record identically
                alive[_norm(p)] = (p, seq)
    return out


def _eq_key_cols(file_cols, names: list[str], rmap: dict):
    """Resolve an eq-delete file's column names against the CURRENT
    schema, rename-aware: a delete file written before a RENAME carries
    the old column name, which must map to the renamed field's position
    in `names` (as _make_file_rows does for data files) — indexing
    `names` directly would either crash (ValueError) or drop the column
    from the index list while the key tuple kept it, producing
    length-mismatched tuples that never match (ADVICE r8). Returns
    (src_cols, ki) aligned: src_cols are the file-side column names to
    read, ki their row-tuple indexes.

    An UNRESOLVABLE column (the key column was since DROPPED) fails
    loudly, matching the batch read path and changes(): silently
    dropping it from the key would WIDEN the delete match — any row
    sharing the remaining key values is treated as dead, emitting
    phantom delete events (code-review r9)."""
    src_cols, ki = [], []
    for c in file_cols:
        cur = c if c in names else next(
            (n for n in names if c in rmap.get(n, ())), None)
        if cur is None:
            raise ValueError(
                f"equality-delete file keys on column {c!r} which is "
                f"not in the current schema (dropped?); rewrite "
                f"deletes (rewrite_position_deletes / compaction) "
                f"before dropping key columns")
        src_cols.append(c)
        ki.append(names.index(cur))
    return src_cols, ki


def _make_file_rows(names: list[str], rmap: dict,
                    table_store: str = "", io=None):
    """Rename-aware cached row reader shared by the changelog decoders:
    file_rows(path) → list of row tuples in `names` order (a requested
    column absent from the file pads None, or reads via its former
    name). Caches per path — the eq-delete branch revisits files."""
    import pyarrow.parquet as pq

    cache: dict[str, list[tuple]] = {}

    def file_rows(path: str) -> list[tuple]:
        rows = cache.get(path)
        if rows is None:
            in_file = set(pq.read_schema(
                _arrow_src(path, table_store, io)).names)
            src_of = {}
            for n in names:
                if n in in_file:
                    src_of[n] = n
                else:
                    src_of[n] = next(
                        (o for o in rmap.get(n, ()) if o in in_file), None)
            read_cols = sorted({c for c in src_of.values() if c})
            t = pq.read_table(_arrow_src(path, table_store, io),
                              columns=read_cols)
            cols = {n: (t[src_of[n]].to_pylist() if src_of[n]
                        else [None] * t.num_rows) for n in names}
            rows = [tuple(cols[n][i] for n in names)
                    for i in range(t.num_rows)]
            cache[path] = rows
        return rows

    return file_rows


def _changelog_snapshot_rows(names: list[str], rmap: dict,
                             task: "_ChangeSnapshotTask",
                             table_store: str = "", io=None) -> list[tuple]:
    """CDC events of ONE snapshot (executor side of the changelog
    stream). The entire plan arrives in the task payload (driver-
    planned, linear manifest I/O): own added-file lists, prior delete
    FILES (pos files build the positional dead-set; eq files become
    key sets consulted per candidate row under the data file's
    sequence gate), and the alive-before map. Identical verdicts to
    _changelog_rows' accumulated walk, with ZERO manifest I/O here."""
    import pyarrow.parquet as pq

    file_rows = _make_file_rows(names, rmap, table_store, io)

    def _src(p):
        return _arrow_src(p, table_store, io)

    added_data = list(task.added_data)
    added_pos = list(task.added_pos)
    added_eq = list(task.added_eq)

    prior_dead: set[tuple[str, int]] = set()
    for p in task.prior_pos_files:
        t = pq.read_table(_src(p), columns=["file_path", "pos"])
        for src, pos in zip(t["file_path"].to_pylist(),
                            t["pos"].to_pylist()):
            prior_dead.add((_norm(src), pos))
    prior_eq: list[tuple[list[int], set, int]] = []
    for p, dseq in task.prior_eq_files:
        kt = pq.read_table(_src(p))
        kc, ki = _eq_key_cols(kt.column_names, names, rmap)
        keys = {tuple(kt[c][i].as_py() for c in kc)
                for i in range(kt.num_rows)}
        prior_eq.append((ki, keys, dseq))

    def dead_by_prior_eq(row: tuple, fseq: int) -> bool:
        # eq deletes kill strictly-older data only (data_seq < del_seq)
        return any(fseq < dseq and tuple(row[j] for j in ki) in keys
                   for ki, keys, dseq in prior_eq if ki)

    same_commit_deleted: set[tuple[str, int]] = set()
    pos_by_src: dict[str, list[int]] = {}
    for p, _seq in added_pos:
        t = pq.read_table(_src(p))
        for src, pos in zip(t["file_path"].to_pylist(),
                            t["pos"].to_pylist()):
            key = _norm(src)
            same_commit_deleted.add((key, pos))
            pos_by_src.setdefault(key, []).append(pos)

    rows: list[tuple] = []
    for p, _seq in added_data:
        ckey = _norm(p)
        for i, r in enumerate(file_rows(p)):
            if (ckey, i) in same_commit_deleted:
                continue
            rows.append(r + ("insert",))

    if added_pos or added_eq:
        # data files alive before this snapshot (driver-shipped)
        older: dict[str, tuple[str, int]] = {
            c: (p, q) for c, p, q in task.older}

        for src, positions in pos_by_src.items():
            if src not in older:
                continue  # same-commit churn already excluded
            real, fseq = older[src]
            all_rows = file_rows(real)
            for i in sorted(positions):
                if (src, i) in prior_dead or i >= len(all_rows):
                    continue
                r = all_rows[i]
                if dead_by_prior_eq(r, fseq):
                    continue
                rows.append(r + ("delete",))

        eq_dead_local: set[tuple[str, int]] = set()
        for p, del_seq in added_eq:
            kt = pq.read_table(_src(p))
            kc, ki = _eq_key_cols(kt.column_names, names, rmap)
            keys = {tuple(kt[c][i].as_py() for c in kc)
                    for i in range(kt.num_rows)}
            for ckey, (real, fseq) in older.items():
                if fseq >= del_seq:
                    continue
                for i, r in enumerate(file_rows(real)):
                    # same_commit_deleted: a commit may legally carry a
                    # POSITION delete and an EQUALITY delete covering
                    # the same physical row (external writers mix
                    # them); the pos branch above already emitted that
                    # row's delete event, so the eq branch must not
                    # emit a second one (review r11)
                    if (ckey, i) in prior_dead \
                            or (ckey, i) in eq_dead_local \
                            or (ckey, i) in same_commit_deleted:
                        continue
                    if dead_by_prior_eq(r, fseq):
                        continue
                    if tuple(r[j] for j in ki) in keys:
                        rows.append(r + ("delete",))
                        eq_dead_local.add((ckey, i))
    return rows


@dataclass
class _StreamFileTask(InputPartition):
    file_path: str
    file_format: str = "PARQUET"


@dataclass
class _ChangeSnapshotTask(InputPartition):
    """One changelog micro-batch slice: reconstruct ONE snapshot's CDC
    events on an executor. The driver's _plan_changelog_tasks walks the
    history ONCE (each manifest read exactly once) and ships the
    complete payload — the task performs zero manifest I/O and reads
    only the data/delete FILES it decodes."""
    snapshot_id: int
    added_data: tuple = ()               # (data file path, seq)
    added_pos: tuple = ()                # (pos-delete file path, seq)
    added_eq: tuple = ()                 # (eq-delete file path, delete_seq)
    prior_pos_files: tuple = ()          # earlier pos-delete file paths
    prior_eq_files: tuple = ()           # earlier (eq-delete path, seq)
    older: tuple = ()                    # (canon, path, seq) alive before


class IcelakePartitionStreamReader(DataSourceStreamReader):
    """`spark.readStream.format("icelake")` — the partition-based
    micro-batch source. Offsets are table sequence numbers (commit
    timestamps on v1); each micro-batch is the set of data files ADDED
    by append snapshots in (start_seq, end_seq], one InputPartition per
    file, read on EXECUTORS as Arrow batches. Exactly-once comes from
    deterministic replay: partitions(start, end) re-derives the same
    file list from the same immutable snapshot range.

    This replaces the driver-materializing SimpleDataSourceStreamReader
    for the data path (a large append snapshot would otherwise OOM the
    driver); the simple reader remains only as the changelog prototype.
    Parity: Iceberg's Spark streaming source semantics over the
    reference's snapshot model (table.rs:281-304)."""

    def __init__(self, options: dict, schema):
        from .table import IcebergTable

        self.options = options
        self.spark_schema = schema
        self.path = options["path"]
        t = IcebergTable.load(self.path)
        self.rename_map = _rename_map(t)
        self.field_ids = {f.name: f.field_id for f in t.schema().fields}
        # iceberg member types for nested rebinding + shipped FileIO —
        # the same resolution discipline as the batch reader (a struct
        # member renamed in an externally-written file must bind by its
        # nested field id in the STREAM too)
        self.ice_fields = {f.name: f.field_type for f in t.schema().fields}
        from .fileio import is_uri, resolve_io

        self.table_store = _store_of(self.path)
        self.io = resolve_io(self.path) if is_uri(self.path) else None
        # rate limit (Iceberg's max-files-per-micro-batch analogue at
        # snapshot granularity): each trigger advances the offset by at
        # most N sequence numbers, so a backlogged stream catches up in
        # bounded micro-batches instead of one giant one
        self._rate = int(options.get("max_snapshots_per_trigger", 0))
        # file-granular admission (Iceberg's
        # streaming-max-files-per-micro-batch analogue): each trigger
        # emits at most N data FILES, splitting inside a snapshot via
        # composite offsets {"seq": s, "files": k} (first k path-sorted
        # files of the next append snapshot after s). Ignored in
        # changelog mode, where the batch unit is a whole snapshot.
        self._max_files = int(options.get("max_files_per_trigger", 0))
        self._floor = None  # highest start offset observed (checkpoint)
        self._sf_cache: dict = {}  # offset -> sorted snapshot file list
        # highest batch START Spark has ever handed to partitions():
        # a batch start equals the previous batch's logged end, so every
        # sequence number at or below it was already planned (and, on a
        # clean restart, committed) by an earlier batch. Used to refuse
        # RE-planning those rows when a restart briefly regresses the
        # capped offset below the checkpoint (ADVICE r7 medium).
        self._planned = None

    def _src(self, path: str):
        return _arrow_src(path, self.table_store, self.io)

    def _table(self):
        from .table import IcebergTable

        return IcebergTable.load(self.path)

    @property
    def _file_rate(self) -> int:
        return 0 if self._changelog else self._max_files

    def initialOffset(self) -> dict:  # noqa: N802
        return {"seq": int(self.options.get("starting_sequence_number", 0))}

    def latestOffset(self) -> dict:  # noqa: N802
        table = self._table()
        end = _stream_end_offset(table)
        if self._rate <= 0 and self._file_rate <= 0:
            return {"seq": end}
        base = self._floor
        if base is None:
            base = (int(self.options.get("starting_sequence_number", 0)), 0)
        end_seq = end
        if self._rate > 0:
            # cap at the Nth next APPEND snapshot's offset — counting
            # actual snapshots, not adding N to the offset VALUE:
            # format-v1 offsets are epoch-millisecond timestamps, where
            # base+N would advance N milliseconds per trigger and never
            # reach the data (code-review r8)
            apps = [o for o in _append_offsets(table)
                    if base[0] < o <= end]
            end_seq = apps[self._rate - 1] if len(apps) > self._rate \
                else end
        if self._file_rate > 0:
            off = self._walk_file_cap(table, base, end_seq)
        else:
            off = (max(base[0], end_seq), 0)
        self._floor = max(base, off)
        s, k = self._floor
        return {"seq": s, "files": k} if self._file_rate > 0 else {"seq": s}

    def _walk_file_cap(self, table, base: tuple, end_seq: int) -> tuple:
        """Advance from composite offset `base` by at most
        max_files_per_trigger data files, never past snapshot offset
        `end_seq`; returns the new composite offset."""
        s0, k0 = base
        budget = self._file_rate
        k = k0
        for t in _append_offsets(table):
            if not (s0 < t <= end_seq):
                continue
            n = len(_stream_snapshot_files(table, t, self._sf_cache))
            take = max(0, n - k)
            if take > budget:
                return (t - 1, k + budget)
            budget -= take
            k = 0
        return (max(s0, end_seq), 0)

    @property
    def _changelog(self) -> bool:
        return self.options.get("changelog", "").lower() in ("true", "1")

    def partitions(self, start: dict, end: dict):  # driver-side planning
        # composite offsets (seq, files) compare lexicographically;
        # plain {"seq": N} checkpoints read as (N, 0) — back-compatible
        s = (int(start["seq"]), int(start.get("files", 0)))
        e = (int(end["seq"]), int(end.get("files", 0)))
        if self._rate > 0 or self._file_rate > 0:
            # learn the true (checkpointed) start so the rate cap in
            # latestOffset advances from reality after a restart
            self._floor = max(self._floor or (0, 0), s, e)
        # Restart duplicate guard (ADVICE r7 medium): after a restart
        # the first capped latestOffset may regress BELOW the
        # checkpointed start (it caps from starting_sequence_number —
        # the committed offset is unknown until this call). Spark logs
        # the regressed end, so the NEXT batch's start sits below what
        # earlier batches already delivered. Batch starts are monotonic
        # in normal operation, so planning only above the highest start
        # ever seen suppresses exactly the replayed span and nothing
        # else; WAL replay of an uncommitted batch re-runs in full
        # because a fresh reader starts with _planned = None.
        if self._planned is not None and s < self._planned:
            s = self._planned
        self._planned = max(self._planned or (0, 0), s)
        if e <= s:
            return []
        table = self._table()
        if self._changelog:
            # one task per DECODABLE snapshot in range; ONE linear walk
            # on the driver reads each manifest exactly once and ships
            # complete task payloads (see _plan_changelog_tasks)
            return _plan_changelog_tasks(table, s[0], e[0])
        if s[1] or e[1]:
            files = _stream_files_range(table, s[0], s[1], e[0], e[1],
                                        self._sf_cache)
        else:  # snapshot-aligned: one linear manifest walk
            files = _stream_files_between(table, s[0], e[0])
        # evict fully-drained snapshots so the cache stays bounded by
        # the pending backlog, not the table's history
        self._sf_cache = {q: v for q, v in self._sf_cache.items()
                          if q > s[0]}
        return [_StreamFileTask(path, fmt) for path, fmt in files]

    def read(self, partition):  # executor-side
        import pyarrow as pa
        import pyarrow.parquet as pq

        if isinstance(partition, _ChangeSnapshotTask):
            names = [f.name for f in self.spark_schema.fields
                     if f.name != "_change_type"]
            yield from _changelog_snapshot_rows(names, self.rename_map,
                                                partition,
                                                self.table_store, self.io)
            return
        foreign = _is_foreign_file(self.path, partition.file_path)
        if partition.file_format == "ORC":
            from pyarrow import orc as pa_orc

            table = pa_orc.ORCFile(self._src(partition.file_path)).read()
        elif partition.file_format == "AVRO":
            table = _read_avro_arrow(self.spark_schema, partition.file_path,
                                     self.table_store, self.io,
                                     self.field_ids, self.rename_map,
                                     foreign)
        else:
            table = pq.read_table(self._src(partition.file_path))
        yield from _project_table_to_schema(
            table, self.spark_schema, self.rename_map, self.field_ids,
            self.ice_fields, foreign).to_batches()

    def commit(self, end: dict) -> None:
        pass


class IcelakeStreamReader(SimpleDataSourceStreamReader):
    """`spark.readStream.format("icelake")`: snapshot-based micro-batch
    source. Offsets are table sequence numbers — each micro-batch reads
    the data files ADDED by append snapshots in (start_seq, end_seq];
    non-append snapshots (overwrite/delete/replace) are skipped, matching
    Iceberg's append-only streaming-read contract. Exactly-once comes
    from deterministic replay: readBetweenOffsets re-derives the same
    file list from the same immutable snapshot range."""

    def __init__(self, options: dict, schema):
        self.options = options
        self.spark_schema = schema
        self.path = options["path"]

    def initialOffset(self) -> dict:  # noqa: N802
        # start from the beginning of history unless pinned
        start = int(self.options.get("starting_sequence_number", 0))
        return {"seq": start}

    def _table(self):
        from .table import IcebergTable

        return IcebergTable.load(self.path)

    _offset_of = staticmethod(_stream_offset_of)

    def _end_offset(self, table) -> int:
        return _stream_end_offset(table)

    def _files_between(self, table, start_seq: int, end_seq: int) -> list[str]:
        return [p for p, _fmt in
                _stream_files_between(table, start_seq, end_seq)]

    def _rows(self, files: list[str]) -> list[tuple]:
        # materialized (not a generator): the simple-reader contract
        # prefetches and caches each micro-batch on the driver, which
        # pickles the row collection. Size a micro-batch accordingly;
        # the partition-based DataSourceStreamReader is the upgrade path
        # when per-batch volume outgrows the driver.
        import pyarrow.parquet as pq

        src_t = self._table()
        rmap = _rename_map(src_t)
        fids = {f.name: f.field_id for f in src_t.schema().fields}
        ice_fields = {f.name: f.field_type for f in src_t.schema().fields}
        rows: list[tuple] = []
        for path in files:
            t = pq.read_table(_arrow_src(path))
            projected = _project_table_to_schema(
                t, self.spark_schema, rmap, fids, ice_fields,
                _is_foreign_file(self.path, path))
            rows.extend(tuple(d.values()) for d in projected.to_pylist())
        return rows

    @property
    def _changelog(self) -> bool:
        return self.options.get("changelog", "").lower() in ("true", "1")

    def read(self, start: dict):
        table = self._table()
        end_seq = self._end_offset(table)
        start_seq = int(start["seq"])
        if end_seq <= start_seq:
            # must be a true iterator: the no-advance path probes next()
            return iter(()), start
        if self._changelog:
            return (self._change_rows(table, start_seq, end_seq),
                    {"seq": end_seq})
        files = self._files_between(table, start_seq, end_seq)
        return self._rows(files), {"seq": end_seq}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        table = self._table()
        if self._changelog:
            return self._change_rows(table, int(start["seq"]),
                                     int(end["seq"]))
        files = self._files_between(table, int(start["seq"]),
                                    int(end["seq"]))
        return self._rows(files)

    def commit(self, end: dict) -> None:
        pass

    # --------------------------------------------------- changelog mode

    def _change_rows(self, table, start_seq: int, end_seq: int) -> list[tuple]:
        names = [f.name for f in self.spark_schema.fields
                 if f.name != "_change_type"]
        return _changelog_rows(table, names, _rename_map(table),
                               start_seq, end_seq)


def _changelog_rows(table, names: list[str], rmap: dict,
                    start_seq: int, end_seq: int) -> list[tuple]:
    """CDC reconstruction: rows + _change_type for every snapshot in
    (start_seq, end_seq]:

    - append snapshots → added files' rows as inserts
    - added pos-delete files → referenced rows (pyarrow take) as
      deletes, skipping positions already deleted earlier
    - added eq-delete files → key-matched rows of strictly-older
      data files as deletes
    CoW rewrites are not decoded by the STREAMING reader (batch
    `IcebergTable.changes` covers them); tables streamed as CDC
    should keep `write.delete.mode=merge-on-read` (the default).

    This is the SIMPLE (driver-side) decoder; the partition-based
    stream reader's executor tasks use _changelog_snapshot_rows with
    driver-planned prior-delete payloads instead.
    """
    import pyarrow.parquet as pq

    from .types.manifest import (MANIFEST_CONTENT_DELETES, STATUS_ADDED,
                                 read_manifest, read_manifest_list)

    # (file,pos) pairs pos-deleted by one snapshot (for the running
    # dead-set accumulated while walking snapshots in seq order —
    # re-deriving "all deletes before seq" per snapshot would rescan
    # every prior snapshot's manifests each time: quadratic I/O)
    def snap_pos_deletes(s) -> set[tuple[str, int]]:
        dead: set[tuple[str, int]] = set()
        for mle in read_manifest_list(table._resolve(s.manifest_list)):
            if (mle.added_snapshot_id != s.snapshot_id
                    or mle.content != MANIFEST_CONTENT_DELETES):
                continue
            _, entries = read_manifest(table._resolve(mle.manifest_path))
            for e in entries:
                if e.data_file.content != 1:
                    continue
                t = pq.read_table(table._resolve(e.data_file.file_path))
                for src, pos in zip(t["file_path"].to_pylist(),
                                    t["pos"].to_pylist()):
                    dead.add((_norm(src), pos))
        return dead

    # rename-aware cached reader shared with the partition-stream
    # decoder (the cache matters: the eq-delete branch walks every
    # parent-era file once PER delete file)
    _reader = _make_file_rows(names, rmap)

    def file_rows(path, positions=None, skip: set | None = None):
        all_rows = _reader(path)
        key = _norm(path)
        idx = (range(len(all_rows)) if positions is None else positions)
        return [all_rows[i] for i in idx
                if i < len(all_rows)
                and not (skip and (key, i) in skip)]

    rows: list[tuple] = []
    # sort by the STREAM offset (== sequence number on v2; commit
    # timestamp on v1 where every seq is 0) so the early-exit break
    # below is safe on both format versions
    snaps = sorted(table.metadata.snapshots,
                   key=lambda s: (_stream_offset_of(table, s),
                                  s.sequence_number))
    main_ids = table.metadata.ancestry_ids()
    dead_acc: set[tuple[str, int]] = set()  # pos deletes seen so far
    # eq-delete files from snapshots OUTSIDE the window (e.g. an
    # earlier micro-batch): a key they killed must not re-emit a
    # delete event when a later eq delete hits it again — batch
    # boundaries must not change the changelog (code-review r8)
    eq_prior: list[tuple[list[int], set, int]] = []

    def fold_eq_prior(s) -> None:
        from .types.manifest import (MANIFEST_CONTENT_DELETES as _MCD,
                                     read_manifest as _rm,
                                     read_manifest_list as _rml)

        for mle in _rml(table._resolve(s.manifest_list)):
            if (mle.added_snapshot_id != s.snapshot_id
                    or mle.content != _MCD):
                continue
            for e in _rm(table._resolve(mle.manifest_path))[1]:
                if e.data_file.content != 2 or e.status != STATUS_ADDED:
                    continue
                dseq = (e.sequence_number if e.sequence_number is not None
                        else mle.sequence_number)
                kt = pq.read_table(table._resolve(e.data_file.file_path))
                # rename-aware key resolution (ADVICE r8): see
                # _eq_key_cols — old-name columns map to their renamed
                # field's index, symmetric with the key tuples
                kc, ki = _eq_key_cols(kt.column_names, names, rmap)
                keys = {tuple(kt[c][i].as_py() for c in kc)
                        for i in range(kt.num_rows)}
                eq_prior.append((ki, keys, dseq))

    def dead_by_prior_eq(r: tuple, fseq: int) -> bool:
        return any(fseq < dseq and tuple(r[j] for j in ki) in keys
                   for ki, keys, dseq in eq_prior if ki)

    for s in snaps:
        if s.snapshot_id not in main_ids:
            continue  # WAP branch-staged snapshot: not published
        if _stream_offset_of(table, s) > end_seq:
            # snaps are offset-sorted: snapshots PAST the window can't
            # affect it, and folding them would decode every future
            # snapshot's delete parquet on every micro-batch — wasted
            # I/O growing with history ahead of the window (ADVICE r8)
            break
        in_range = start_seq < _stream_offset_of(table, s) <= end_seq
        op = (s.summary or {}).get("operation", "append")
        # a snapshot that REMOVED data files (compaction 'replace',
        # CoW delete/overwrite rewrite) re-adds survivor files whose
        # rows already streamed — emitting those adds would produce
        # phantom inserts. Like 'replace', such snapshots are not
        # decoded (the CoW-removed rows' delete events are a batch
        # changes() feature, not reconstructable from adds alone).
        rewrote = int((s.summary or {}).get(
            "deleted-data-files", 0) or 0) > 0
        if not in_range or op == "replace" or rewrote:
            # still fold this snapshot's pos AND eq deletes into the
            # running dead state for later snapshots in the range
            dead_acc |= snap_pos_deletes(s)
            fold_eq_prior(s)
            continue
        added_data, added_pos, added_eq = [], [], []
        for mle in read_manifest_list(table._resolve(s.manifest_list)):
            if mle.added_snapshot_id != s.snapshot_id:
                continue
            _, entries = read_manifest(table._resolve(mle.manifest_path))
            for e in entries:
                if e.status != STATUS_ADDED:
                    continue
                p = table._resolve(e.data_file.file_path)
                seq = (e.sequence_number if e.sequence_number is not None
                       else mle.sequence_number)
                if e.data_file.content == 0:
                    added_data.append((p, seq))
                elif e.data_file.content == 1:
                    added_pos.append((p, seq))
                else:
                    added_eq.append((p, seq))

        # ONE read per pos-delete file: same-commit exclusion set AND
        # the per-source position lists the delete branch consumes
        same_commit_deleted: set[tuple[str, int]] = set()
        pos_by_src: dict[str, list[int]] = {}
        for p, _seq in added_pos:
            t = pq.read_table(p)
            for src, pos in zip(t["file_path"].to_pylist(),
                                t["pos"].to_pylist()):
                key = _norm(src)
                same_commit_deleted.add((key, pos))
                pos_by_src.setdefault(key, []).append(pos)

        for p, _seq in added_data:
            for r in file_rows(p, skip=same_commit_deleted):
                rows.append(r + ("insert",))

        # rows this snapshot's eq deletes remove — folded into the
        # running dead-set so a LATER eq delete of the same key can't
        # re-emit the same dead row as a phantom delete event
        eq_dead: set[tuple[str, int]] = set()
        if added_pos or added_eq:
            prior_dead = dead_acc
            # data files alive before this snapshot: canon key →
            # (readable path, seq). The canon key matches _norm of
            # delete-file content; the real path is what pyarrow
            # opens (the canon form is not a filesystem path).
            older: dict[str, tuple[str, int]] = {}
            parent = next((x for x in snaps
                           if x.snapshot_id == s.parent_snapshot_id), None)
            if parent is not None:
                for mle in read_manifest_list(
                        table._resolve(parent.manifest_list)):
                    if mle.content == MANIFEST_CONTENT_DELETES:
                        continue
                    _, entries = read_manifest(
                        table._resolve(mle.manifest_path))
                    for e in entries:
                        if not e.is_alive or e.data_file.content != 0:
                            continue
                        seq = (e.sequence_number
                               if e.sequence_number is not None
                               else mle.sequence_number)
                        real = table._resolve(e.data_file.file_path)
                        older[_norm(real)] = (real, seq)

            for src, positions in pos_by_src.items():
                if src not in older:
                    continue  # same-commit churn already excluded
                real, fseq = older[src]
                for r in file_rows(real, sorted(positions),
                                   skip=prior_dead):
                    if dead_by_prior_eq(r, fseq):
                        continue  # killed before this window
                    rows.append(r + ("delete",))

            for p, del_seq in added_eq:
                kt = pq.read_table(p)
                key_cols, ki = _eq_key_cols(kt.column_names, names, rmap)
                keys = {tuple(kt[c][i].as_py() for c in key_cols)
                        for i in range(kt.num_rows)}
                for ckey, (real, dseq) in older.items():
                    if dseq >= del_seq:
                        continue
                    for i, r in enumerate(file_rows(real)):
                        # same_commit_deleted: the pos branch above
                        # already emitted this row's delete when the
                        # SAME commit carries a pos delete and an eq
                        # delete covering one physical row (legal for
                        # external writers) — don't emit it twice
                        # (review r11; mirrors _changelog_snapshot_rows)
                        if (ckey, i) in prior_dead \
                                or (ckey, i) in eq_dead \
                                or (ckey, i) in same_commit_deleted:
                            continue
                        if dead_by_prior_eq(r, dseq):
                            continue  # killed before this window
                        if tuple(r[j] for j in ki) in keys:
                            rows.append(r + ("delete",))
                            # tracked so a later snapshot's eq delete
                            # can't re-emit this row
                            eq_dead.add((ckey, i))
        dead_acc = dead_acc | same_commit_deleted | eq_dead
    return rows


@dataclass
class _WrittenFile(WriterCommitMessage):
    # one task may write several files (one per partition value)
    files: list  # of (path, rows)


PROP_LAST_BATCH = "streaming.last-committed-batch-id"


class IcelakeStreamWriter(DataSourceStreamWriter):
    """`df.writeStream.format("icelake")`: transactional Iceberg sink.

    Each executor task writes its rows as one parquet file into a staged
    path under the table's data dir and reports it as a commit message;
    the driver's commit() turns the files into DataFile entries (footer
    stats included) and appends them in ONE snapshot per epoch.
    Exactly-once: the committed batch id is recorded in the table
    properties in the same metadata swap, and a replayed epoch with
    batchId <= the recorded one is dropped on the floor; abort() deletes
    the staged files."""

    def __init__(self, options: dict, schema):
        self.options = options
        self.spark_schema = schema
        self.path = options["path"]
        import uuid as _uuid

        from .fileio import is_uri, resolve_io
        from .table import IcebergTable
        from .write import _PART_PREFIX, _result_type

        self.stage = f"stream-{_uuid.uuid4()}"
        # FileIO resolved at plan time and SHIPPED to executors (the
        # same discipline as the readers): a table on a registered
        # custom scheme or object store must stage its files through
        # the table's FileIO, not the local filesystem
        self.io = resolve_io(self.path) if is_uri(self.path) else None
        # capture the partition spec ON THE DRIVER (this object ships
        # pickled to executors): each task computes its rows' transform
        # values and writes one hive-dir file per partition — a single
        # partitionless file would be silently pruned out of every
        # partition-filtered scan of a partitioned table
        t = IcebergTable.load(self.path)
        tschema = t.schema()
        spec = t.metadata.default_spec()
        self.part_info = []
        for pf in spec.fields:
            src = tschema.field_by_id(pf.source_column_id)
            self.part_info.append(
                (pf.name, pf.transform, src.name, src.field_type))
        self.result_types = {
            _PART_PREFIX + pf.name: (pf.name, _result_type(pf, tschema))
            for pf in spec.fields}

    def write(self, iterator) -> _WrittenFile:
        import os as _os
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        from .avro_data import _hive_value
        from .types.transforms import apply_transform_py
        from .write import _PART_PREFIX

        from .fileio import io_join

        arrow_schema = to_arrow_schema(self.spark_schema)
        names = [f.name for f in self.spark_schema.fields]
        rows = [tuple(r) for r in iterator]
        if not rows:
            return _WrittenFile(files=[])
        stage_dir = io_join(self.path, "data", self.stage)
        buckets: dict[tuple, list[tuple]] = {}
        for r in rows:
            vals = dict(zip(names, r))
            key = tuple(apply_transform_py(tr, vals[src], st)
                        for (_n, tr, src, st) in self.part_info)
            buckets.setdefault(key, []).append(r)
        written: list[tuple[str, int]] = []
        from .avro_data import _esc_empty

        for key, rws in buckets.items():
            # _esc_empty: this lane builds dirs from RAW transform
            # values (no writer_df layout encoding), so ''-vs-NULL and
            # the literal marker need the escape here (review r13)
            subdir = "/".join(
                f"{_PART_PREFIX}{n}={_hive_value(_esc_empty(v))}"
                for (n, _tr, _src, _st), v in zip(self.part_info, key))
            d = io_join(stage_dir, subdir) if subdir else stage_dir
            out = io_join(d, f"{_uuid.uuid4()}.parquet")
            table = pa.Table.from_pylist(
                [dict(zip(names, r)) for r in rws], schema=arrow_schema)
            if self.io is not None:
                import io as _iomod

                buf = _iomod.BytesIO()
                pq.write_table(table, buf)
                self.io.makedirs(d)
                self.io.write_bytes(out, buf.getvalue())
            else:
                _os.makedirs(d, exist_ok=True)
                pq.write_table(table, out)
            written.append((out, len(rws)))
        return _WrittenFile(files=written)

    def _discard(self, path: str) -> None:
        if self.io is not None:
            self.io.delete_quiet(path)
            return
        import os as _os

        try:
            _os.remove(path)
        except OSError:
            pass

    @property
    def _batch_prop(self) -> str:
        """Per-QUERY exactly-once scope: keyed by the checkpoint
        location, so a restart from a fresh checkpoint (batchIds reset
        to 0) or a second query into the same table is not silently
        discarded by another query's recorded batch id (code-review
        r8; Iceberg's sink scopes by queryId the same way)."""
        ck = (self.options.get("checkpointLocation")
              or self.options.get("checkpointlocation"))
        if not ck:
            return PROP_LAST_BATCH
        import hashlib as _hl

        return f"{PROP_LAST_BATCH}.{_hl.md5(ck.encode()).hexdigest()[:8]}"

    def commit(self, messages, batchId) -> None:  # noqa: N802
        from .table import IcebergTable
        from .transaction import Transaction
        from .write import _build_data_file

        t = IcebergTable.load(self.path)
        last = int(t.metadata.properties.get(self._batch_prop, -1))
        paths = [p for m in messages if m is not None
                 for (p, n) in m.files if n > 0]
        if batchId <= last or not paths:
            for p in paths:  # replayed epoch: staged output is discarded
                self._discard(p)
            return
        schema = t.schema()
        from .fileio import io_join

        stage_dir = io_join(self.path, "data", self.stage)
        entries = [_build_data_file(p, stage_dir, schema,
                                    self.result_types, None) for p in paths]
        tx = Transaction(t)
        tx.add_data_files(entries)
        # record the epoch IN the same commit so replay-after-crash
        # cannot double-append; via Transaction.set_properties so a
        # conflict-retry (which refreshes the table, discarding any
        # direct metadata mutation) still carries the batch id
        tx.set_properties({self._batch_prop: str(batchId)})
        tx.commit("append")

    def abort(self, messages, batchId) -> None:  # noqa: N802
        for m in messages:
            if m is None:
                continue
            for (p, _n) in m.files:
                self._discard(p)


def _norm(p: str) -> str:
    """Canonical data-path form for delete matching — every _norm site
    compares a delete-file CONTENT path (writer-era absolute) against a
    planned (re-rooted) path, so both go through the location-
    independent form (review r3: a relocated table silently stopped
    applying position deletes)."""
    from .planning import canon_data_path

    return canon_data_path(p)


def register(spark) -> None:
    # pushFilters requires this conf (defaults false in Spark 4.1)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    from . import fileio

    if fileio._REGISTRY:
        # Spark instantiates Python data sources in a FRESH planner
        # worker where register_io registrations don't exist; snapshot
        # the current registry into the registered class — cloudpickle
        # ships it (factories may close over picklable FileIO
        # instances) and __init__ reinstalls it worker-side, so a
        # mock://-style table loads its metadata anywhere
        snapshot = dict(fileio._REGISTRY)

        class _RegisteredIcelake(IcelakeDataSource):
            _io_registry = snapshot

        spark.dataSource.register(_RegisteredIcelake)
        return
    spark.dataSource.register(IcelakeDataSource)
