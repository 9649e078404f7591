"""Iceberg REST catalog client (public REST catalog OpenAPI protocol).

Parity target: /root/reference/icelake/src/catalog/rest.rs (load
:71-129, commit body shapes :392-413) and the MetadataUpdate /
UpdateRequirement protocol (/root/reference/icelake/src/catalog/
mod.rs:141-308).

Network access is gated behind an import-try of `requests`; the
request/response body builders are pure functions so the protocol
shapes are unit-testable offline (tests/test_rest_catalog.py).
"""

from __future__ import annotations

import json
from typing import Any

from ..types.metadata import Snapshot, TableMetadata
from .storage import CommitConflict

try:  # pragma: no cover - environment-dependent
    import requests as _requests
except ImportError:  # pragma: no cover
    _requests = None


# ----------------------------------------------------- protocol bodies


def _split_identifier(identifier: str) -> tuple[str, str]:
    """(namespace, name) — fails LOUDLY on a single-part identifier:
    every table route requires a namespace, and an empty one produced
    the malformed 'namespaces//tables/<name>' URL a conforming server
    404s confusingly instead of a clear client-side error (review
    r11)."""
    ns, _, name = identifier.rpartition(".")
    if not ns:
        raise ValueError(
            f"REST catalog identifiers need a namespace: got "
            f"{identifier!r} (use 'db.{identifier}'-style names)")
    return ns, name


def namespace_path(namespace: str) -> str:
    """Multi-level namespaces are unit-separated (0x1F) in REST paths."""
    return "\x1f".join(namespace.split("."))


def create_table_body(name: str, metadata: TableMetadata) -> dict:
    schema = metadata.current_schema()
    spec = metadata.default_spec()
    body = {
        "name": name,
        "schema": schema.to_json_dict(),
        "partition-spec": spec.to_json(),
        "write-order": metadata.sort_orders[0].to_json(),
        "properties": metadata.properties,
        "stage-create": False,
    }
    # location is OPTIONAL in the protocol: omit it entirely so the
    # server assigns its warehouse default ("" would be an explicit,
    # invalid location a conforming server rejects)
    if metadata.location:
        body["location"] = metadata.location
    return body


def add_snapshot_update(snapshot: Snapshot) -> dict:
    return {"action": "add-snapshot", "snapshot": snapshot.to_json()}


def set_ref_update(ref_name: str, snapshot_id: int, ref_type: str = "branch") -> dict:
    return {"action": "set-snapshot-ref", "ref-name": ref_name,
            "type": ref_type, "snapshot-id": snapshot_id}


def set_properties_update(props: dict[str, str]) -> dict:
    return {"action": "set-properties", "updates": props}


def assert_ref_requirement(ref_name: str, snapshot_id: int | None) -> dict:
    return {"type": "assert-ref-snapshot-id", "ref": ref_name,
            "snapshot-id": snapshot_id}


def assert_uuid_requirement(table_uuid: str) -> dict:
    return {"type": "assert-table-uuid", "uuid": table_uuid}


def build_commit_updates(base: TableMetadata | None,
                         new: TableMetadata) -> tuple[list[dict], list[dict]]:
    """Diff two metadata states into MetadataUpdate/UpdateRequirement
    lists (public REST commit protocol; parity: the reference's
    MetadataUpdate enum, catalog/mod.rs:141-308).

    Covers the commit kinds this engine produces: new snapshots, ref
    moves (incl. rollback), property set/remove, schema evolution, new
    partition specs, sort orders. The main-ref requirement asserts the
    BASE's actual head (not max-of-ids — snapshot ids can be random per
    the spec, and after a rollback the newest id is not the head).
    """
    updates: list[dict] = []
    b_props = base.properties if base else {}
    if new.properties != b_props:
        changed = {k: v for k, v in new.properties.items()
                   if b_props.get(k) != v}
        removed = [k for k in b_props if k not in new.properties]
        if changed:
            updates.append(set_properties_update(changed))
        if removed:
            updates.append({"action": "remove-properties",
                            "removals": removed})
    b_schema_ids = {s.schema_id for s in base.schemas} if base else set()
    for s in new.schemas:
        if s.schema_id not in b_schema_ids:
            updates.append({"action": "add-schema",
                            "schema": s.to_json_dict(),
                            "last-column-id": new.last_column_id})
    if base is None or new.current_schema_id != base.current_schema_id:
        updates.append({"action": "set-current-schema",
                        "schema-id": new.current_schema_id})
    b_spec_ids = {p.spec_id for p in base.partition_specs} if base else set()
    for p in new.partition_specs:
        if p.spec_id not in b_spec_ids:
            updates.append({"action": "add-spec", "spec": p.to_json()})
    if base is None or new.default_spec_id != base.default_spec_id:
        updates.append({"action": "set-default-spec",
                        "spec-id": new.default_spec_id})
    b_sort_ids = {o.order_id for o in base.sort_orders} if base else set()
    for o in new.sort_orders:
        if o.order_id not in b_sort_ids:
            updates.append({"action": "add-sort-order",
                            "sort-order": o.to_json()})
    if base is None or new.default_sort_order_id != base.default_sort_order_id:
        updates.append({"action": "set-default-sort-order",
                        "sort-order-id": new.default_sort_order_id})
    b_snap_ids = {s.snapshot_id for s in base.snapshots} if base else set()
    n_snap_ids = {s.snapshot_id for s in new.snapshots}
    for s in new.snapshots:
        if s.snapshot_id not in b_snap_ids:
            updates.append(add_snapshot_update(s))
    removed_snaps = [sid for sid in b_snap_ids if sid not in n_snap_ids]
    if removed_snaps:
        updates.append({"action": "remove-snapshots",
                        "snapshot-ids": sorted(removed_snaps)})
    b_refs = base.refs if base else {}
    for name, r in new.refs.items():
        old = b_refs.get(name)
        if old is None or old.snapshot_id != r.snapshot_id or old.type != r.type:
            updates.append(set_ref_update(name, r.snapshot_id, r.type))
    for name in b_refs:
        if name not in new.refs:
            updates.append({"action": "remove-snapshot-ref",
                            "ref-name": name})

    requirements = [assert_uuid_requirement(new.table_uuid)]
    if base is not None:
        # assert EVERY ref this diff moves or removes, at its BASE
        # position (review r11): asserting only main let two
        # concurrent writers to branch 'dev' both pass — the server
        # applied both set-snapshot-ref updates last-wins and the
        # first commit silently vanished from the branch; conversely
        # a pure branch commit would spuriously 409 on any unrelated
        # main movement if main alone were asserted
        moved = {name for name, r in new.refs.items()
                 if (b_refs.get(name) is None
                     or b_refs[name].snapshot_id != r.snapshot_id
                     or b_refs[name].type != r.type)}
        moved |= {name for name in b_refs if name not in new.refs}
        # assert 'main' ONLY when this commit moves main, or when a
        # ref CREATED by this commit has its new head parented at
        # main's base head — i.e. the commit publishes a fork whose
        # "branch from current main" intent genuinely depends on where
        # main stands. Unconditionally asserting main made every pure
        # branch commit 409 on unrelated main movement (ADVICE r11);
        # and an EXISTING branch extending from a snapshot that merely
        # equals main's head must not re-assert main either — parent
        # linkage is by snapshot id, not by where the main ref points
        # (review r12: the first append after a fork spuriously
        # conflicted with concurrent main appends).
        main_head = (b_refs["main"].snapshot_id if "main" in b_refs
                     else base.current_snapshot_id)
        if main_head is not None:
            new_snap_ids = {s.snapshot_id for s in new.snapshots
                            if s.snapshot_id not in b_snap_ids
                            and s.parent_snapshot_id == main_head}
            if any(name not in b_refs and r.snapshot_id in new_snap_ids
                   for name, r in new.refs.items()):
                moved.add("main")
        for name in sorted(moved):
            old_ref = b_refs.get(name)
            requirements.append(assert_ref_requirement(
                name,
                old_ref.snapshot_id if old_ref is not None
                else (base.current_snapshot_id if name == "main"
                      else None)))
    return updates, requirements


def commit_table_body(identifier: str, updates: list[dict],
                      requirements: list[dict]) -> dict:
    ns, _, name = identifier.rpartition(".")
    return {
        "identifier": {"namespace": ns.split(".") if ns else [], "name": name},
        "updates": updates,
        "requirements": requirements,
    }


def rename_table_body(source: str, destination: str) -> dict:
    """POST /v1/tables/rename body (rest.rs rename_table shape).
    Single-part names stay legal HERE: the spec's identifier object
    allows an empty namespace array in bodies — only the URL-building
    client methods need _split_identifier's guard (a bare name there
    makes a malformed 'namespaces//tables/x' route)."""

    def ident(identifier: str) -> dict:
        ns, _, name = identifier.rpartition(".")
        return {"namespace": ns.split(".") if ns else [], "name": name}

    return {"source": ident(source), "destination": ident(destination)}


class CommitFailedError(CommitConflict):
    """A commit requirement was rejected by the catalog (HTTP 409): the
    table changed underneath us. Subclasses storage.CommitConflict so
    Transaction.commit's optimistic `except CommitConflict` loop
    actually retries it (review r3: as a bare Exception it propagated
    straight to the caller and a transient conflict was a hard fail)."""

    def __init__(self, message: str, details: dict | None = None):
        super().__init__(message)
        self.details = details or {}


# ------------------------------------------------------------- client


class RestCatalog:
    """Minimal REST catalog: load/create/commit/drop over HTTP."""

    def __init__(self, uri: str, warehouse: str | None = None,
                 token: str | None = None, session: Any = None):
        if session is None and _requests is None:
            raise ImportError("requests not available; pass session= or "
                              "use StorageCatalog")
        self.uri = uri.rstrip("/")
        self.http = session or _requests.Session()
        if token:
            self.http.headers["Authorization"] = f"Bearer {token}"
        self.config: dict = {}
        if warehouse:
            self.config["warehouse"] = warehouse

    def _url(self, path: str, prefixed: bool = True) -> str:
        """Route under /v1, honoring the server-assigned `prefix` from
        the config endpoint (all table/namespace routes are
        /v1/{prefix}/... on conforming servers — Polaris, Lakekeeper,
        Tabular all return one; the reference left this as a TODO,
        rest.rs:271). The config route itself is never prefixed.

        The prefix is inserted VERBATIM, matching Java's ResourcePaths
        and PyIceberg: servers return it in URL form (S3 Tables ARN
        prefixes arrive pre-percent-encoded) — re-quoting here would
        double-encode and 404 every call."""
        prefix = self.config.get("prefix") if prefixed else None
        if prefix:
            return f"{self.uri}/v1/{prefix}/{path}"
        return f"{self.uri}/v1/{path}"

    def fetch_config(self) -> dict:
        """GET /v1/config and merge per the REST spec's precedence:
        server defaults < client-supplied settings < server overrides.
        Call once before table operations against servers that assign a
        route prefix."""
        r = self.http.get(self._url("config", prefixed=False),
                          params=self.config)
        r.raise_for_status()
        body = r.json()
        merged = dict(body.get("defaults", {}))
        merged.update(self.config)
        merged.update(body.get("overrides", {}))
        self.config = merged
        return self.config

    def load_table(self, identifier: str):
        from ..table import IcebergTable

        ns, name = _split_identifier(identifier)
        r = self.http.get(self._url(
            f"namespaces/{namespace_path(ns)}/tables/{name}"))
        r.raise_for_status()
        body = r.json()
        metadata = TableMetadata.from_json_dict(body["metadata"])
        return IcebergTable(metadata.location, metadata, catalog=self,
                            identifier=identifier)

    def create_table(self, identifier: str, schema, spec=None,
                     properties=None, format_version: int = 2):
        from ..table import IcebergTable

        ns, name = _split_identifier(identifier)
        metadata = TableMetadata.new("", schema, spec, properties,
                                     format_version=format_version)
        r = self.http.post(
            self._url(f"namespaces/{namespace_path(ns)}/tables"),
            json=create_table_body(name, metadata))
        r.raise_for_status()
        got = TableMetadata.from_json_dict(r.json()["metadata"])
        return IcebergTable(got.location, got, catalog=self,
                            identifier=identifier)

    def update_table(self, table_path: str, base_version: int,
                     new_metadata: TableMetadata, identifier: str = "",
                     base_metadata: TableMetadata | None = None) -> int:
        """Commit via the updates/requirements protocol. Matches the
        StorageCatalog.update_table signature so IcebergTable commits
        work against either catalog. The update list is a DIFF of base
        vs new metadata (build_commit_updates), so metadata-only commits
        (set_properties, schema evolution, rollback) transmit their
        actual change instead of a bogus add-snapshot; without a base
        the requirement degrades to the uuid assertion alone."""
        updates, requirements = build_commit_updates(base_metadata,
                                                     new_metadata)
        ns, name = _split_identifier(identifier)
        # the ONE commit-body builder (review r11: a hand-rolled dict
        # here could drift from the tested commit_table_body shape)
        body = commit_table_body(identifier, updates, requirements)
        r = self.http.post(
            self._url(f"namespaces/{namespace_path(ns)}/tables/{name}"),
            json={"updates": body["updates"],
                  "requirements": body["requirements"],
                  "identifier": body["identifier"]})
        if r.status_code == 409:
            # requirement failure: surface as a typed, retryable error
            # instead of a bare HTTPError (rest.rs maps 409 the same way)
            try:
                details = r.json()
            except ValueError:
                details = {}
            raise CommitFailedError(
                details.get("error", {}).get(
                    "message", "commit requirements failed"), details)
        r.raise_for_status()
        return base_version + 1

    def drop_table(self, identifier: str) -> None:
        ns, name = _split_identifier(identifier)
        r = self.http.delete(self._url(
            f"namespaces/{namespace_path(ns)}/tables/{name}"))
        r.raise_for_status()

    def list_tables(self, namespace: str) -> list[str]:
        r = self.http.get(self._url(f"namespaces/{namespace_path(namespace)}/tables"))
        r.raise_for_status()
        return [f"{'.'.join(t['namespace'])}.{t['name']}"
                for t in r.json().get("identifiers", [])]

    def rename_table(self, source: str, destination: str) -> None:
        """POST /v1/tables/rename (rest.rs:rename_table)."""
        r = self.http.post(self._url("tables/rename"),
                           json=rename_table_body(source, destination))
        r.raise_for_status()

    def create_namespace(self, namespace: str,
                         properties: dict[str, str] | None = None) -> None:
        """POST /v1/namespaces (rest.rs:create_namespace)."""
        r = self.http.post(self._url("namespaces"),
                           json={"namespace": namespace.split("."),
                                 "properties": properties or {}})
        r.raise_for_status()

    def drop_namespace(self, namespace: str) -> None:
        """DELETE /v1/namespaces/{ns} (rest.rs:drop_namespace)."""
        r = self.http.delete(
            self._url(f"namespaces/{namespace_path(namespace)}"))
        r.raise_for_status()

    def list_namespaces(self, parent: str | None = None) -> list[str]:
        """GET /v1/namespaces[?parent=] (rest.rs:list_namespaces)."""
        params = {"parent": namespace_path(parent)} if parent else None
        r = self.http.get(self._url("namespaces"), params=params)
        r.raise_for_status()
        return [".".join(ns) for ns in r.json().get("namespaces", [])]
