"""Filesystem ("storage") catalog: resolve tables from a warehouse path
via version-hint.text or versioned metadata files; atomic commit by
tmp-write + rename.

Parity target: /root/reference/icelake/src/catalog/storage.rs
(load :273-321, version hint :87-158, commit :175-231, update :323-352).
Atomicity caveat (SURVEY §7): rename is atomic on POSIX but not on object
stores; single-writer assumption matches the reference.
"""

from __future__ import annotations

import glob
import os
import re
import uuid as _uuid

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
        self.warehouse = os.path.abspath(warehouse)

    # --------------------------------------------------------------- load

    def table_path(self, identifier: str) -> str:
        return os.path.join(self.warehouse, *identifier.split("."))

    def list_tables(self, namespace: str = "") -> list[str]:
        base = os.path.join(self.warehouse, *namespace.split(".")) if namespace else self.warehouse
        out = []
        for root, dirs, _files in os.walk(base):
            if os.path.isdir(os.path.join(root, "metadata")):
                rel = os.path.relpath(root, self.warehouse)
                out.append(rel.replace(os.sep, "."))
                dirs.clear()
        return sorted(out)

    def create_namespace(self, namespace: str) -> None:
        os.makedirs(os.path.join(self.warehouse, *namespace.split(".")),
                    exist_ok=True)

    def list_namespaces(self) -> list[str]:
        out = []
        for root, dirs, _files in os.walk(self.warehouse):
            if os.path.isdir(os.path.join(root, "metadata")):
                dirs.clear()
                parent = os.path.dirname(root)
                if parent != self.warehouse:
                    out.append(os.path.relpath(parent, self.warehouse)
                               .replace(os.sep, "."))
        return sorted(set(out))

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
        if os.path.exists(os.path.join(path, "metadata")):
            raise FileExistsError(f"table {identifier} already exists at {path}")
        metadata = TableMetadata.new(path, schema, spec, properties,
                                     format_version=format_version, sort_order=sort_order)
        os.makedirs(os.path.join(path, "metadata"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        version = commit_metadata(path, metadata, new_version=1)
        return IcebergTable(path, metadata, current_version=version, catalog=self,
                            identifier=identifier)

    def drop_table(self, identifier: str) -> None:
        import shutil

        path = self.table_path(identifier)
        if not os.path.isdir(path):
            raise FileNotFoundError(path)
        shutil.rmtree(path)

    def rename_table(self, src: str, dst: str) -> None:
        dst_path = self.table_path(dst)
        os.makedirs(os.path.dirname(dst_path), exist_ok=True)
        os.rename(self.table_path(src), dst_path)

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
    meta_dir = os.path.join(table_path, "metadata")
    hint_file = os.path.join(meta_dir, "version-hint.text")
    hint_version = -1
    if os.path.isfile(hint_file):
        try:
            with open(hint_file) as f:
                hint_version = int(f.read().strip())
        except (ValueError, OSError):
            hint_version = -1
    # scan for the highest-versioned metadata file
    best_version, best_path = -1, None
    if not os.path.isdir(meta_dir):
        raise FileNotFoundError(meta_dir)
    for name in os.listdir(meta_dir):
        m = _VERSIONED_RE.match(name) or _HASHED_RE.match(name)
        if m and int(m.group(1)) > best_version:
            best_version, best_path = int(m.group(1)), os.path.join(meta_dir, name)
    if hint_version >= best_version:
        version = hint_version
        path = os.path.join(meta_dir, f"v{version}.metadata.json")
        if not os.path.isfile(path):
            candidates = glob.glob(os.path.join(meta_dir, f"{version:05d}-*.metadata.json"))
            path = candidates[0] if candidates else None
        if path is not None and os.path.isfile(path):
            with open(path, "rb") as f:
                return TableMetadata.from_json(f.read()), version
        # hint parses but points at a metadata file that doesn't exist
        # (truncated hint content, or cleaned-up metadata): honor the
        # docstring and fall back to the scan instead of raising
    if best_path is None:
        raise FileNotFoundError(f"no metadata files in {meta_dir}")
    with open(best_path, "rb") as f:
        return TableMetadata.from_json(f.read()), best_version


def commit_metadata(table_path: str, metadata: TableMetadata, new_version: int) -> int:
    """Atomic metadata write: tmp uuid file → rename → version hint
    (storage.rs:175-231)."""
    meta_dir = os.path.join(table_path, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    final = os.path.join(meta_dir, f"v{new_version}.metadata.json")
    tmp = os.path.join(meta_dir, f"{_uuid.uuid4()}.metadata.json.tmp")
    with open(tmp, "w") as f:
        f.write(metadata.to_json())
    try:
        # os.link fails with EEXIST if `final` exists — a true atomic
        # create-exclusive, unlike exists()+replace() which lets two
        # concurrent committers both "win" the same version (TOCTOU)
        os.link(tmp, final)
    except FileExistsError:
        os.remove(tmp)
        raise CommitConflict(f"{final} already exists")
    except OSError:
        # filesystem without hard links (some network/FUSE mounts):
        # fall back to check+rename — weaker under concurrency, but the
        # only portable option there (reference has the same caveat,
        # storage.rs:175-231)
        if os.path.exists(final):
            os.remove(tmp)
            raise CommitConflict(f"{final} already exists")
        os.replace(tmp, final)
        tmp = None
    if tmp is not None:
        os.remove(tmp)
    hint_tmp = os.path.join(meta_dir, f"version-hint.text.tmp-{_uuid.uuid4()}")
    with open(hint_tmp, "w") as f:
        f.write(str(new_version))
    os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
    return new_version


def register_views(catalog: "StorageCatalog", spark, namespace: str = "",
                   replace_dots: str = "_") -> list[str]:
    """Expose every table of the warehouse to spark.sql as a temp view
    (`db.t` → view `db_t`). Views are lazy DataFrames over the current
    snapshot — re-register after commits that should become visible.
    Returns the created view names."""
    created = []
    for ident in catalog.list_tables(namespace):
        view = ident.replace(".", replace_dots)
        catalog.load_table(ident).to_df(spark).createOrReplaceTempView(view)
        created.append(view)
    return created
