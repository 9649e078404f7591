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

try:  # pragma: no cover - environment-dependent
    import requests as _requests
except ImportError:  # pragma: no cover
    _requests = None


# ----------------------------------------------------- protocol bodies


def namespace_path(namespace: str) -> str:
    """Multi-level namespaces are unit-separated (0x1F) in REST paths."""
    return "\x1f".join(namespace.split("."))


def create_table_body(name: str, metadata: TableMetadata) -> dict:
    schema = metadata.current_schema()
    spec = metadata.default_spec()
    return {
        "name": name,
        "location": metadata.location,
        "schema": schema.to_json_dict(),
        "partition-spec": spec.to_json(),
        "write-order": metadata.sort_orders[0].to_json(),
        "properties": metadata.properties,
        "stage-create": False,
    }


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


def commit_table_body(identifier: str, updates: list[dict],
                      requirements: list[dict]) -> dict:
    ns, _, name = identifier.rpartition(".")
    return {
        "identifier": {"namespace": ns.split(".") if ns else [], "name": name},
        "updates": updates,
        "requirements": requirements,
    }


def rename_table_body(source: str, destination: str) -> dict:
    """POST /v1/tables/rename body (rest.rs rename_table shape)."""

    def ident(identifier: str) -> dict:
        ns, _, name = identifier.rpartition(".")
        return {"namespace": ns.split(".") if ns else [], "name": name}

    return {"source": ident(source), "destination": ident(destination)}


class CommitFailedError(Exception):
    """A commit requirement was rejected by the catalog (HTTP 409): the
    table changed underneath us. Retryable by re-reading + re-applying
    (Transaction.commit's optimistic loop)."""

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

    def _url(self, path: str) -> str:
        return f"{self.uri}/v1/{path}"

    def fetch_config(self) -> dict:
        r = self.http.get(self._url("config"), params=self.config)
        r.raise_for_status()
        self.config.update(r.json().get("overrides", {}))
        return self.config

    def load_table(self, identifier: str):
        from ..table import IcebergTable

        ns, _, name = identifier.rpartition(".")
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

        ns, _, name = identifier.rpartition(".")
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
                     new_metadata: TableMetadata, identifier: str = "") -> int:
        """Commit via the updates/requirements protocol. Matches the
        StorageCatalog.update_table signature so IcebergTable commits
        work against either catalog."""
        snap = new_metadata.current_snapshot()
        updates = [add_snapshot_update(snap),
                   set_ref_update("main", snap.snapshot_id)]
        prev_ids = [s.snapshot_id for s in new_metadata.snapshots
                    if s.snapshot_id != snap.snapshot_id]
        requirements = [
            assert_uuid_requirement(new_metadata.table_uuid),
            assert_ref_requirement("main", max(prev_ids) if prev_ids else None),
        ]
        ns, _, name = identifier.rpartition(".")
        r = self.http.post(
            self._url(f"namespaces/{namespace_path(ns)}/tables/{name}"),
            json={"updates": updates, "requirements": requirements})
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
        ns, _, name = identifier.rpartition(".")
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
