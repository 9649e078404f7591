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
    EqualTo,
    InputPartition,
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


class IcelakeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "icelake"

    def schema(self):
        from .table import IcebergTable

        t = IcebergTable.load(self.options["path"])
        return t.schema().to_spark()

    def reader(self, schema) -> "IcelakeReader":
        return IcelakeReader(self.options, schema)


class IcelakeReader(DataSourceReader):
    def __init__(self, options: dict, schema):
        self.options = options
        self.spark_schema = schema
        self.filter_parts: list[str] = []

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Accept simple comparisons for zone-map file pruning; everything
        is reported back as unsupported so Spark still applies it row-level
        (our pruning is an optimization, not an evaluation)."""
        ops = {EqualTo: "=", GreaterThan: ">", GreaterThanOrEqual: ">=",
               LessThan: "<", LessThanOrEqual: "<="}
        for f in filters:
            op = next((s for cls, s in ops.items()
                       if isinstance(cls, type) and isinstance(f, cls)), None)
            if op is not None and len(f.attribute) == 1:
                self.filter_parts.append(f"{f.attribute[0]} {op} {f.value!r}")
            yield f  # unsupported → Spark re-applies (safe)

    def partitions(self) -> list[_FileTask]:
        from .table import IcebergTable

        t = IcebergTable.load(self.options["path"])
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
        pos_list = [(p.delete_file.file_path, p.sequence_number) for p in pos]
        eq_list = []
        for e in eq:
            cols = tuple(schema.name_by_id(fid) or ""
                         for fid in (e.delete_file.equality_ids or ()))
            if cols and all(cols):
                eq_list.append((e.delete_file.file_path, cols, e.sequence_number))
        return [_FileTask(d.data_file.file_path, d.sequence_number,
                          pos_list, eq_list) for d in data]

    def read(self, partition: _FileTask) -> Iterator:
        """Read one data file with pyarrow, apply MoR deletes, yield
        Arrow record batches (Spark converts via Arrow)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file_path)

        # position deletes targeting this file, seq-gated
        drop_rows: set[int] = set()
        for dpath, dseq in partition.pos_deletes:
            if partition.sequence_number > dseq:
                continue
            dt = pq.read_table(dpath, columns=["file_path", "pos"])
            fp = dt["file_path"].to_pylist()
            pos = dt["pos"].to_pylist()
            for f, p in zip(fp, pos):
                if _norm(f) == _norm(partition.file_path):
                    drop_rows.add(p)
        if drop_rows:
            mask = pa.array(i not in drop_rows for i in range(table.num_rows))
            table = table.filter(mask)

        # equality deletes: data_seq < delete_seq
        for dpath, cols, dseq in partition.eq_deletes:
            if not partition.sequence_number < dseq:
                continue
            cols = [c for c in cols if c in table.column_names]
            if not cols:
                continue
            dt = pq.read_table(dpath, columns=list(cols))
            deleted = set(zip(*[dt[c].to_pylist() for c in cols]))
            keys = zip(*[table[c].to_pylist() for c in cols])
            mask = pa.array(k not in deleted for k in keys)
            table = table.filter(mask)

        # project/pad to the requested schema
        names = [f.name for f in self.spark_schema.fields]
        arrays = []
        for n in names:
            if n in table.column_names:
                arrays.append(table[n])
            else:  # schema evolution: new column absent in old file
                arrays.append(pa.nulls(table.num_rows))
        yield from pa.Table.from_arrays(arrays, names=names).to_batches()


def _norm(p: str) -> str:
    if p.startswith("file:"):
        p = p[5:]
    while p.startswith("//"):
        p = p[1:]
    return p


def register(spark) -> None:
    # pushFilters requires this conf (defaults false in Spark 4.1)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(IcelakeDataSource)
