"""Table maintenance: compaction (rewrite_data_files), snapshot
expiration, orphan-file cleanup.

Parity target: the reference delegates compaction to Spark's
`CALL system.rewrite_data_files` (/root/reference/icelake/tests/
insert_compact_test.rs:198-211); here we ARE Spark, so it's a native
job: read current state (MoR applied) → rewrite files at target size →
commit a "replace" snapshot (operation classification per
/root/reference/icelake/src/types/in_memory.rs:2219-2240).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession

from .delta import delete_rows as delete_where  # noqa: F401  (re-export)
from .transaction import Transaction
from .write import write_data_files

DEFAULT_TARGET_FILE_SIZE = 128 * 1024 * 1024  # Spark-scale default;
# reference test uses 100 MiB (insert_compact_test.rs:203), its unit
# default of 1 MiB (config.rs:33-40) is test-sized.


def rewrite_data_files(table, spark: SparkSession,
                       target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
                       target_records_per_file: int | None = None) -> int:
    """Compact: rewrite all live data (with deletes applied) into
    right-sized files; commit as a `replace` snapshot. Returns the new
    data-file count."""
    scan = table.new_scan(apply_deletes=True)
    data, _, _ = scan.plan_files()
    if not data:
        return 0
    df = scan.to_df(spark)
    total_bytes = sum(t.data_file.file_size_in_bytes for t in data)
    n_parts = max(1, (total_bytes + target_file_size - 1) // target_file_size)
    spec = table.metadata.default_spec()
    if spec.is_unpartitioned:
        df = df.repartition(int(n_parts))
    files = write_data_files(table, df,
                             max_records_per_file=target_records_per_file)
    tx = Transaction(table)
    tx.remove_all_existing()
    tx.add_data_files(files)
    tx.commit("replace")
    return len(files)


def expire_snapshots(table, older_than_ms: int | None = None,
                     retain_last: int = 1, delete_files: bool = True) -> int:
    """Drop snapshots older than the cutoff (keeping `retain_last` most
    recent and everything referenced by refs); optionally delete files no
    longer reachable. Returns number of snapshots expired."""
    from dataclasses import replace as dc_replace

    from .catalog.storage import commit_metadata
    from .types.manifest import read_manifest, read_manifest_list

    metadata = table.metadata
    if older_than_ms is None:
        older_than_ms = int(time.time() * 1000)
    by_time = sorted(metadata.snapshots, key=lambda s: s.timestamp_ms, reverse=True)
    keep_ids = {s.snapshot_id for s in by_time[:retain_last]}
    keep_ids.update(r.snapshot_id for r in metadata.refs.values())
    if metadata.current_snapshot_id is not None:
        keep_ids.add(metadata.current_snapshot_id)
    expired = [s for s in metadata.snapshots
               if s.snapshot_id not in keep_ids and s.timestamp_ms < older_than_ms]
    if not expired:
        return 0
    kept = tuple(s for s in metadata.snapshots if s not in expired)

    if delete_files:
        def reachable(snaps) -> tuple[set, set]:
            manifests, datafiles = set(), set()
            for s in snaps:
                try:
                    ml = table._resolve(s.manifest_list)
                    manifests.add(os.path.abspath(ml))
                    for mle in read_manifest_list(ml):
                        mp = table._resolve(mle.manifest_path)
                        manifests.add(os.path.abspath(mp))
                        _, entries = read_manifest(mp)
                        for e in entries:
                            datafiles.add(os.path.abspath(
                                table._resolve(e.data_file.file_path)))
                except FileNotFoundError:
                    continue
            return manifests, datafiles

        live_m, live_d = reachable(kept)
        dead_m, dead_d = reachable(expired)
        for p in (dead_m - live_m) | (dead_d - live_d):
            try:
                os.remove(p)
            except OSError:
                pass

    new_metadata = dc_replace(
        metadata,
        snapshots=kept,
        snapshot_log=tuple(h for h in metadata.snapshot_log
                           if h["snapshot-id"] in {s.snapshot_id for s in kept}),
        last_updated_ms=int(time.time() * 1000),
    )
    if table.catalog is not None:
        version = table.catalog.update_table(table.path, table.current_version,
                                             new_metadata, identifier=table.identifier)
    else:
        version = commit_metadata(table.path, new_metadata, table.current_version + 1)
    table.metadata = new_metadata
    table.current_version = version
    return len(expired)


def remove_orphan_files(table, older_than_ms: int | None = None) -> int:
    """Delete files under data/ not referenced by any snapshot."""
    from .types.manifest import read_manifest, read_manifest_list

    referenced: set[str] = set()
    for s in table.metadata.snapshots:
        try:
            for mle in read_manifest_list(table._resolve(s.manifest_list)):
                _, entries = read_manifest(table._resolve(mle.manifest_path))
                for e in entries:
                    referenced.add(os.path.abspath(table._resolve(e.data_file.file_path)))
        except FileNotFoundError:
            continue
    cutoff = (older_than_ms / 1000) if older_than_ms else time.time() + 1
    removed = 0
    data_dir = os.path.join(table.path, "data")
    for root, _d, names in os.walk(data_dir):
        for n in names:
            p = os.path.abspath(os.path.join(root, n))
            if p.endswith(".parquet") and p not in referenced and os.path.getmtime(p) < cutoff:
                try:
                    os.remove(p)
                    removed += 1
                except OSError:
                    pass
    return removed
