"""Operational metrics registry — the Spark-first counterpart of the
reference's Prometheus layer (SURVEY §2.5 W11).

The reference registers per-writer gauges/counters labeled by
(catalog, table): position-delete record counts and flush QPS, equality
delete/insert QPS, open partition-writer counts
(`/root/reference/icelake/src/metrics.rs:28-157`, catalog op metrics in
`catalog/prometheus.rs`). In this engine the writers are Spark jobs, so
per-row executor-side counters would be the slow path; instead every
count the reference gauges is already known exactly at the commit
boundary from the collected DataFile stats (record counts per content
kind, file counts, partition counts). We tally there — zero cost on the
data path — and keep the reference's metric names so dashboards map 1:1.

Spark-native exposure: task/stage metrics (shuffle bytes, spill, input
rows) stay in the Spark UI / status API, which subsumes the reference's
I/O-level gauges; this registry covers the table-format-level events
Spark cannot see (commits, conflicts, retries, delete records, files
added/removed per snapshot).
"""

from __future__ import annotations

import threading
from collections import defaultdict

_LOCK = threading.Lock()


class MetricsRegistry:
    """Tiny labeled counter/gauge store. Counters accumulate; gauges
    overwrite. Keys are (metric_name, labels_tuple)."""

    def __init__(self) -> None:
        self._counters: dict[tuple, int] = defaultdict(int)
        self._gauges: dict[tuple, float] = {}

    def inc(self, name: str, value: int = 1, **labels) -> None:
        with _LOCK:
            self._counters[(name, tuple(sorted(labels.items())))] += value

    def set_gauge(self, name: str, value: float, **labels) -> None:
        with _LOCK:
            self._gauges[(name, tuple(sorted(labels.items())))] = value

    def value(self, name: str, **labels) -> float:
        key = (name, tuple(sorted(labels.items())))
        with _LOCK:
            if key in self._counters:
                return self._counters[key]
            return self._gauges.get(key, 0)

    def snapshot(self) -> dict[str, dict[str, float]]:
        """{metric_name: {label_repr: value}} — stable, test-friendly."""
        out: dict[str, dict[str, float]] = defaultdict(dict)
        with _LOCK:
            for (name, labels), v in self._counters.items():
                out[name][_label_repr(labels)] = v
            for (name, labels), v in self._gauges.items():
                out[name][_label_repr(labels)] = v
        return dict(out)

    def reset(self) -> None:
        with _LOCK:
            self._counters.clear()
            self._gauges.clear()


def _label_repr(labels: tuple) -> str:
    return ",".join(f"{k}={v}" for k, v in labels) or "_"


# process-global default registry (the reference's DEFAULT_REGISTRY)
REGISTRY = MetricsRegistry()


def record_commit(table_name: str, operation: str,
                  data_files: list, delete_files: list,
                  removed_paths: int = 0) -> None:
    """Tally one snapshot commit from its DataFile lists (content kind:
    0=data, 1=position deletes, 2=equality deletes)."""
    t = table_name
    REGISTRY.inc("iceberg_commit_total", table=t, operation=operation)
    REGISTRY.inc("iceberg_data_file_total", len(data_files), table=t)
    REGISTRY.inc("iceberg_removed_file_total", removed_paths, table=t)
    # the reference's counter tracks rows the equality-delta writer
    # INSERTED — a commit that re-adds rewritten copies of existing rows
    # must not register as a phantom full-table insert. That is any
    # commit that REMOVED files: compaction ('replace') and CoW
    # delete/update rewrites (which commit as 'overwrite' with
    # removed_paths > 0); MoR 'overwrite' commits remove nothing and
    # their adds are genuinely new/updated rows
    if operation != "replace" and not removed_paths:
        rows = sum(f.record_count for f in data_files)
        REGISTRY.inc("iceberg_eq_delta_inserted_row_num", rows, table=t)
    for f in delete_files:
        if f.content == 1:
            REGISTRY.inc("iceberg_pos_delete_qps", f.record_count, table=t)
            REGISTRY.inc("iceberg_pos_delete_flush_qps", table=t)
        elif f.content == 2:
            REGISTRY.inc("iceberg_eq_delete_qps", f.record_count, table=t)


def record_conflict_retry(table_name: str) -> None:
    REGISTRY.inc("iceberg_commit_conflict_retry_total", table=table_name)


def record_partition_writers(table_name: str, n: int) -> None:
    """Number of distinct partitions fanned out in one append — the
    reference's `iceberg_append_only_partitioned_writer_num` gauge."""
    REGISTRY.set_gauge("iceberg_append_only_partitioned_writer_num", n,
                       table=table_name)
