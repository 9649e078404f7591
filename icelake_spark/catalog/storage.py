"""Filesystem ("storage") catalog: resolve tables from a warehouse path
via version-hint.text or versioned metadata files; atomic commit by
create-exclusive swap.

Parity target: /root/reference/icelake/src/catalog/storage.rs
(load :273-321, version hint :87-158, commit :175-231, update :323-352).
All I/O goes through fileio.FileIO, so the warehouse may live on any
pyarrow.fs-resolvable store (s3://, gs://, hdfs://) — the reference's
opendal layer (catalog/io.rs:1-60). Atomicity (SURVEY §7): POSIX and
memory back ends give true create-exclusive; object stores degrade to
check-then-write (single-committer caveat, same as storage.rs on S3).
"""

from __future__ import annotations

import re

from ..fileio import FileIO, basename, dirname, io_join, norm_path, resolve_io
from ..types.metadata import (
    PartitionSpec,
    Schema,
    SortOrder,
    TableMetadata,
)


class CommitConflict(Exception):
    """Raised when an update requirement fails (concurrent writer)."""


_VERSIONED_RE = re.compile(r"^v(\d+)\.metadata\.json$")
_HASHED_RE = re.compile(r"^(\d+)-[0-9a-f-]+\.metadata\.json$")


class StorageCatalog:
    """A warehouse directory of tables, each at `{warehouse}/{db}/{name}`."""

    def __init__(self, warehouse: str):
        self.warehouse = norm_path(warehouse)
        self.io: FileIO = resolve_io(self.warehouse)

    # --------------------------------------------------------------- load

    def table_path(self, identifier: str) -> str:
        return io_join(self.warehouse, *identifier.split("."))

    def list_tables(self, namespace: str = "") -> list[str]:
        base = io_join(self.warehouse, *namespace.split(".")) \
            if namespace else self.warehouse
        out = set()
        for root in self.io.find_marker_dirs(base, "metadata"):
            rel = root[len(self.warehouse):].strip("/\\")
            if rel:
                out.add(rel.replace("/", ".").replace("\\", "."))
        return sorted(out)

    def create_namespace(self, namespace: str) -> None:
        """Raises FileExistsError on an existing namespace — Spark
        errors with NAMESPACE_ALREADY_EXISTS, and the SQL dispatcher's
        IF NOT EXISTS branch is meaningless if this silently succeeds
        (makedirs is exist_ok). Object stores without real directories
        (memory://) can only detect namespaces that contain files."""
        path = io_join(self.warehouse, *namespace.split("."))
        if self.io.exists(path):
            raise FileExistsError(f"namespace {namespace!r} already exists")
        self.io.makedirs(path)

    def drop_namespace(self, namespace: str) -> None:
        """Remove an EMPTY namespace (same contract as the REST
        catalog's DELETE /namespaces/{ns}: a non-empty namespace is an
        error, never a recursive table drop)."""
        inside = self.list_tables(namespace)
        if inside:
            raise ValueError(
                f"namespace {namespace!r} is not empty: {inside[:5]}")
        self.io.remove_tree(io_join(self.warehouse, *namespace.split(".")))

    def list_namespaces(self) -> list[str]:
        out = set()
        for ident in self.list_tables():
            ns, _, _name = ident.rpartition(".")
            if ns:
                out.add(ns)
        return sorted(out)

    def load_table(self, identifier: str):
        from ..table import IcebergTable

        path = self.table_path(identifier)
        metadata, version = load_metadata(path)
        return IcebergTable(path, metadata, current_version=version, catalog=self,
                            identifier=identifier)

    def table_exists(self, identifier: str) -> bool:
        try:
            load_metadata(self.table_path(identifier))
            return True
        except FileNotFoundError:
            return False

    # ------------------------------------------------------------- create

    def create_table(
        self,
        identifier: str,
        schema: Schema,
        spec: PartitionSpec | None = None,
        properties: dict[str, str] | None = None,
        format_version: int = 2,
        sort_order: SortOrder | None = None,
    ):
        from ..table import IcebergTable

        path = self.table_path(identifier)
        if self.io.list_files(io_join(path, "metadata")):
            raise FileExistsError(f"table {identifier} already exists at {path}")
        metadata = TableMetadata.new(path, schema, spec, properties,
                                     format_version=format_version, sort_order=sort_order)
        self.io.makedirs(io_join(path, "metadata"))
        self.io.makedirs(io_join(path, "data"))
        version = commit_metadata(path, metadata, new_version=1)
        return IcebergTable(path, metadata, current_version=version, catalog=self,
                            identifier=identifier)

    def drop_table(self, identifier: str) -> None:
        path = self.table_path(identifier)
        if not self.io.list_files(path):
            raise FileNotFoundError(path)
        self.io.remove_tree(path)

    def rename_table(self, src: str, dst: str) -> None:
        dst_path = self.table_path(dst)
        # catalog-level destination guard (review r11): some backends'
        # rename silently MERGES trees into an existing destination
        # (MemoryFileIO builds moved{new: old} with no collision
        # check), leaving a table whose max-version metadata belongs
        # to one table and whose data dir holds both tables' files —
        # silent corruption instead of an error
        try:
            load_metadata(dst_path)
        except FileNotFoundError:
            pass
        else:
            raise FileExistsError(
                f"rename_table: destination table {dst!r} already "
                f"exists at {dst_path}")
        self.io.makedirs(dirname(dst_path))
        self.io.rename(self.table_path(src), dst_path)

    # ------------------------------------------------------------- commit

    def update_table(self, table_path: str, base_version: int,
                     new_metadata: TableMetadata, identifier: str = "",
                     base_metadata: TableMetadata | None = None) -> int:
        """Optimistic swap: fail if someone committed past base_version.
        (`base_metadata` is accepted for REST-catalog signature parity;
        the storage swap's version check subsumes it.)

        Mirrors storage.rs:323-352 (re-check + write + hint update).
        """
        _, current = load_metadata(table_path)
        if current != base_version:
            raise CommitConflict(
                f"expected version {base_version}, found {current} at {table_path}")
        return commit_metadata(table_path, new_metadata, new_version=base_version + 1)


# ------------------------------------------------------- module functions


def load_metadata(table_path: str) -> tuple[TableMetadata, int]:
    """Resolve current metadata: max(version-hint.text, highest v*/N-uuid
    metadata file) — storage.rs:87-158, hardened against a STALE hint.

    The hint is written after the metadata file, so a crash between the
    two (or two racing committers' hint writes landing out of order)
    leaves hint < actual max. Trusting the stale hint would make every
    new commit collide with the existing next version file — a permanent
    CommitConflict livelock. A corrupt hint likewise falls back to the
    scan instead of crashing int()."""
    io = resolve_io(table_path)
    meta_dir = io_join(table_path, "metadata")
    hint_version = -1
    try:
        hint_version = int(io.read_bytes(
            io_join(meta_dir, "version-hint.text")).decode().strip())
    except (ValueError, OSError, FileNotFoundError):
        hint_version = -1
    # scan for the highest-versioned metadata file
    listing = {basename(p): p for p, _sz in io.list_files(meta_dir)}
    best_version, best_path = -1, None
    for name, full in listing.items():
        m = _VERSIONED_RE.match(name) or _HASHED_RE.match(name)
        if m and int(m.group(1)) > best_version:
            best_version, best_path = int(m.group(1)), full
    if hint_version >= best_version:
        version = hint_version
        path = listing.get(f"v{version}.metadata.json")
        if path is None:
            for name, full in listing.items():
                if name.startswith(f"{version:05d}-") \
                        and name.endswith(".metadata.json"):
                    path = full
                    break
        if path is not None:
            return TableMetadata.from_json(io.read_bytes(path)), version
        # hint parses but points at a metadata file that doesn't exist
        # (truncated hint content, or cleaned-up metadata): honor the
        # docstring and fall back to the scan instead of raising
    if best_path is None:
        raise FileNotFoundError(f"no metadata files in {meta_dir}")
    return TableMetadata.from_json(io.read_bytes(best_path)), best_version


def with_metadata_log(table_path: str, metadata: TableMetadata,
                      base_metadata: TableMetadata,
                      base_version: int) -> TableMetadata:
    """Append the superseded metadata file to `metadata-log` (capped by
    write.metadata.previous-versions-max, Iceberg default 100) — the
    lineage the `metadata_log_entries` inspection table reads. Called
    by storage-catalog committers before the metadata write; REST
    catalogs maintain the log server-side."""
    from dataclasses import replace as _dc_replace

    keep = int(metadata.properties.get(
        "write.metadata.previous-versions-max", "100"))
    entry = {
        "timestamp-ms": base_metadata.last_updated_ms,
        "metadata-file": io_join(
            table_path, "metadata", f"v{base_version}.metadata.json"),
    }
    log = tuple(metadata.metadata_log) + (entry,)
    # keep<=0 means "retain nothing" — [-0:] would keep the WHOLE log
    return _dc_replace(metadata, metadata_log=log[-keep:] if keep > 0 else ())


def commit_metadata(table_path: str, metadata: TableMetadata, new_version: int) -> int:
    """Atomic metadata write: create-exclusive on the final name, then
    version hint (storage.rs:175-231). The create-exclusive guarantee is
    the back end's (hard-link swap on POSIX, locked dict on memory://,
    check-then-write on object stores — see fileio module docstring)."""
    io = resolve_io(table_path)
    meta_dir = io_join(table_path, "metadata")
    io.makedirs(meta_dir)
    final = io_join(meta_dir, f"v{new_version}.metadata.json")
    try:
        io.create_exclusive(final, metadata.to_json().encode())
    except FileExistsError:
        raise CommitConflict(f"{final} already exists")
    io.write_bytes(io_join(meta_dir, "version-hint.text"),
                   str(new_version).encode())
    return new_version


def register_views(catalog: "StorageCatalog", spark, namespace: str = "",
                   replace_dots: str = "_") -> list[str]:
    """Expose every table of the warehouse to spark.sql as a temp view
    (`db.t` → view `db_t`). Views are lazy DataFrames over the current
    snapshot — re-register after commits that should become visible.
    Returns the created view names.

    The dot replacement is lossy ('db_a.t' and 'db.a_t' both map to
    'db_a_t'), and createOrReplaceTempView would let the second table
    silently shadow the first — queries would read the wrong table's
    rows with sort order picking the winner. Collisions fail loudly
    instead (code-review r9); pass a different replace_dots or register
    the offending table manually."""
    created: dict[str, str] = {}
    for ident in catalog.list_tables(namespace):
        view = ident.replace(".", replace_dots)
        if view in created:
            raise ValueError(
                f"register_views: tables {created[view]!r} and "
                f"{ident!r} both map to view name {view!r} with "
                f"replace_dots={replace_dots!r}")
        catalog.load_table(ident).to_df(spark).createOrReplaceTempView(view)
        created[view] = ident
    return list(created)
