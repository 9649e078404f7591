"""Changelog (CDC) read: the row-level changes between two snapshots.

The reference writes CDC (its delta writers emit data + delete files,
`/root/reference/icelake/src/io/functional_writer/equality_delta_writer.rs`)
but has no read-side changelog; engines are expected to reconstruct
changes from the files each snapshot added/removed. This module is that
read side, Spark-first: every per-snapshot diff is one or two
broadcast-joined DataFrame reads, unioned lazily — nothing is
materialized on the driver except file lists.

Semantics (matching Iceberg's changelog-table behavior):
- append snapshot        → its added data files' rows as `insert`
  (rows pos-deleted in the SAME commit — in-batch upsert churn — are
  excluded: they were never visible to any reader)
- MoR delete / upsert    → added pos/eq delete files select the deleted
  rows out of the PRE-snapshot data (semi-join, sequence-gated exactly
  like the anti-join on the normal read path); upsert commits also emit
  their added files as `insert`
- CoW delete / overwrite → removed files' surviving rows as `delete`,
  added files' rows as `insert` (net-change, like Iceberg)
- replace (compaction / manifest rewrite) → no logical change, skipped
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table import (DeleteFileTask, FileScanTask, IcebergTable, TableScan,
                    read_data_files)
from .types.manifest import (MANIFEST_CONTENT_DELETES, STATUS_ADDED,
                             read_manifest, read_manifest_list)

CHANGE_TYPE = "_change_type"
COMMIT_SNAPSHOT = "_commit_snapshot_id"
COMMIT_ORDER = "_commit_order"


def _spark_path(path: str) -> str:
    """Recorded file path → the spelling the JVM readers accept (FileIO
    translation: s3→s3a, register_io customs → their to_spark_path)."""
    from .fileio import resolve_io

    return resolve_io(path).to_spark_path(path)


def _added_in(table: IcebergTable, snap):
    """(data_tasks, pos_tasks, eq_tasks) newly added by this snapshot."""
    data, pos, eq = [], [], []
    for mle in read_manifest_list(table._resolve(snap.manifest_list)):
        if mle.added_snapshot_id != snap.snapshot_id:
            continue
        _, entries = read_manifest(table._resolve(mle.manifest_path))
        for e in entries:
            if e.status != STATUS_ADDED:
                continue
            e.data_file.file_path = table._resolve(e.data_file.file_path)
            seq = e.sequence_number if e.sequence_number is not None \
                else mle.sequence_number
            if mle.content == MANIFEST_CONTENT_DELETES or e.data_file.content != 0:
                (pos if e.data_file.content == 1 else eq).append(
                    DeleteFileTask(e.data_file, seq))
            else:
                data.append(FileScanTask(e.data_file, seq, mle.partition_spec_id))
    return data, pos, eq


def _read(spark, table, spark_schema, tasks, with_position=False) -> DataFrame:
    """read_data_files honoring the rename name-mapping (files written
    before a rename_column resolve through their former column name)."""
    scan = TableScan(table)
    read_schema, coalesce_map = scan._with_name_mapping(table.schema(),
                                                        spark_schema)
    df = read_data_files(spark, read_schema, tasks,
                         with_position=with_position)
    if coalesce_map:
        keep = [c for c in df.columns
                if c in {f.name for f in spark_schema.fields}
                or c.startswith("__")]
        df = df.select(*[
            F.coalesce(c, *coalesce_map[c]).alias(c)
            if c in coalesce_map else F.col(c) for c in keep])
    return df


def _with_meta(df: DataFrame, change: str, snap, order: int,
               cols: list[str]) -> DataFrame:
    # snapshot id lit MUST cast long: this repo's sequential ids fit
    # int, so the schema would flip int/bigint between empty and
    # non-empty results (and vs external 64-bit ids) — review r12
    return df.select(*cols,
                     F.lit(change).alias(CHANGE_TYPE),
                     F.lit(snap.snapshot_id).cast("long")
                     .alias(COMMIT_SNAPSHOT),
                     F.lit(order).alias(COMMIT_ORDER))


def changes(table: IcebergTable, spark: SparkSession,
            from_snapshot_id: int | None = None,
            to_snapshot_id: int | None = None) -> DataFrame:
    """DataFrame of row-level changes in (from_snapshot, to_snapshot]:
    table columns + _change_type ('insert'/'delete') +
    _commit_snapshot_id + _commit_order (per-changelog commit index).
    from_snapshot_id=None starts before the first snapshot."""
    meta = table.metadata
    spark_schema = table.schema().to_spark()
    cols = [f.name for f in spark_schema.fields]
    empty = spark.createDataFrame([], spark_schema) \
        .select("*", F.lit("x").alias(CHANGE_TYPE),
                F.lit(0).cast("long").alias(COMMIT_SNAPSHOT),
                F.lit(0).cast("int").alias(COMMIT_ORDER)).limit(0)

    current = table.current_snapshot()
    head_id = to_snapshot_id if to_snapshot_id is not None else (
        current.snapshot_id if current is not None else None)
    if head_id is None:
        # snapshots exist but none is published to the requested head
        # (e.g. only WAP branch commits): no visible changes
        return empty
    known_ids = {s.snapshot_id for s in meta.snapshots}
    # the (from, to] window is the head's ANCESTRY CHAIN minus the
    # from-snapshot's ancestry — NOT a sequence-number range: every v1
    # snapshot carries sequence 0 (an incremental seq window returns
    # empty forever on v1), and branch-staged WAP commits share the
    # global counter. Rolled-back commits and other branches' snapshots
    # live in metadata.snapshots but not in this lineage — emitting them
    # would replicate phantom rows (see ancestry_ids docstring).
    chain: list = []
    sid = head_id
    while sid is not None and sid in known_ids:
        s = meta.snapshot_by_id(sid)
        chain.append(s)
        sid = s.parent_snapshot_id
    chain.reverse()  # oldest -> newest, deterministic commit order
    if from_snapshot_id is not None \
            and from_snapshot_id not in {s.snapshot_id for s in chain}:
        # expired or on another branch: ancestry_ids(from) would be
        # empty/disjoint, exclude nothing, and silently REPLAY the
        # full retained history as if new — duplicate downstream
        # effects for every incremental consumer (review r12; Iceberg's
        # changelog read errors here too). apply_changes guards its
        # sync point before calling and full-resyncs instead.
        raise ValueError(
            f"from_snapshot_id {from_snapshot_id} is not an ancestor "
            f"of the changelog head {head_id} (expired or on another "
            f"branch); the incremental window is unreconstructable")
    exclude = (meta.ancestry_ids(from_snapshot_id)
               if from_snapshot_id is not None else set())

    parts: list[DataFrame] = []
    order = 0
    for snap in chain:
        if snap.snapshot_id in exclude:
            continue
        op = (snap.summary or {}).get("operation", "append")
        if op == "replace":
            continue
        added_data, added_pos, added_eq = _added_in(table, snap)
        # an expired parent (oldest surviving snapshot) can't be scanned:
        # its deletes/CoW removals are unreconstructable — emit this
        # snapshot's adds only (the retained-history boundary)
        parent_scan = (TableScan(table, snapshot_id=snap.parent_snapshot_id)
                       if snap.parent_snapshot_id is not None
                       and snap.parent_snapshot_id in known_ids else None)

        # inserts: added files, minus rows pos-deleted by the SAME commit
        if added_data:
            ins = _read(spark, table, spark_schema, added_data,
                        with_position=bool(added_pos))
            if added_pos:
                scan = TableScan(table, snapshot_id=snap.snapshot_id)
                ins = scan._apply_deletes(spark, ins, added_data,
                                          added_pos, [])
            parts.append(_with_meta(ins, "insert", snap, order, cols))

        # ONE parent manifest planning per snapshot, shared by the MoR
        # delete lanes and the CoW lane below (review r12: a commit
        # with both added delete files and a CoW-qualifying op planned
        # the identical parent scan twice — a full distributed
        # manifest walk each time)
        pdata = ppos = peq = None
        if parent_scan is not None and (
                added_pos or added_eq or op in ("delete", "overwrite")):
            pdata, ppos, peq = parent_scan.plan_files(spark)

        # deletes via added delete files, applied to pre-snapshot data.
        # Parent-era deletes are anti-joined out FIRST so a row deleted
        # by an earlier snapshot can never re-surface as a new delete.
        if (added_pos or added_eq) and parent_scan is not None:
            # ONE pos-delete frame per commit: the srcs inventory and
            # both pos semi/anti joins share its plan — a per-file
            # read+collect loop ran N driver round-trips (review r9),
            # and srcs building its own scan tripled the parquet reads
            # (review r12)
            pos_df = (_pos_delete_df(spark, added_pos)
                      if added_pos else None)
            if added_pos:
                from .planning import canon_data_path

                srcs = {r[0] for r in pos_df.select("__del_file")
                        .distinct().collect()}
                hit = [t for t in pdata
                       if canon_data_path(t.data_file.file_path) in srcs]
                if hit:
                    d = _read(spark, table, spark_schema, hit,
                              with_position=True)
                    if ppos or peq:
                        d = parent_scan._apply_deletes(spark, d, hit, ppos, peq,
                                                       drop_helpers=False)
                    deleted = _semi_join_pos(spark, d, hit, added_pos,
                                             _bcast_limit(table),
                                             pos_df=pos_df)
                    parts.append(_with_meta(deleted, "delete", snap, order, cols))
            if added_eq and pdata:  # empty parent: nothing to delete from
                d = _read(spark, table, spark_schema, pdata,
                          with_position=True)
                if ppos or peq:
                    d = parent_scan._apply_deletes(spark, d, pdata, ppos, peq,
                                                   drop_helpers=False)
                if added_pos:
                    # one commit may legally carry a pos delete AND an
                    # eq delete covering the same physical row
                    # (external writers mix them); the pos lane above
                    # already emitted those rows' delete events, so
                    # the eq lane excludes them (review r11)
                    d = _semi_join_pos(spark, d, pdata, added_pos,
                                       _bcast_limit(table),
                                       how="left_anti", pos_df=pos_df)
                deleted = _semi_join_eq(spark, d, pdata, added_eq,
                                        _bcast_limit(table), table=table)
                parts.append(_with_meta(deleted, "delete", snap, order, cols))

        # CoW: files removed by this snapshot -> their surviving rows
        if parent_scan is not None and op in ("delete", "overwrite"):
            live_now = {t.data_file.file_path
                        for t in TableScan(table, snapshot_id=snap.snapshot_id)
                        .plan_files(spark)[0]}
            removed = [t for t in pdata
                       if t.data_file.file_path not in live_now]
            if removed:
                d = _read(spark, table, spark_schema, removed,
                          with_position=bool(ppos or peq))
                if ppos or peq:
                    d = parent_scan._apply_deletes(spark, d, removed, ppos, peq)
                parts.append(_with_meta(d, "delete", snap, order, cols))
        order += 1

    if not parts:
        return empty
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _canon_col(c):
    from .planning import canon_data_path_col

    return canon_data_path_col(c)


def _bcast_limit(table) -> int:
    return int(table.metadata.properties.get(
        "read.delete.broadcast-threshold-bytes", 32 * 1024 * 1024))


def _maybe_broadcast(side_df: DataFrame, tasks, limit: int) -> DataFrame:
    """Broadcast a delete side only while its planned file bytes stay
    under the limit (same gate and table property as
    TableScan._apply_deletes): a bulk delete can exceed broadcast
    limits, where shuffle is the right plan. Over the limit the
    shuffle-hash hint is REQUIRED, not just omitting the broadcast —
    Catalyst's own size estimate can undercut autoBroadcastJoinThreshold
    and re-broadcast the side this gate exists to keep off the driver
    (code-review r9; same fix table.py carries since r3)."""
    total = sum(t.delete_file.file_size_in_bytes or 0 for t in tasks)
    return (F.broadcast(side_df) if total <= limit
            else side_df.hint("shuffle_hash"))


def _pos_delete_df(spark, pos: list[DeleteFileTask]) -> DataFrame:
    """One frame over a commit's position-delete files:
    (__del_file, __del_pos, __del_seq) with canon'd paths and each
    file's sequence number joined in — built once per commit and
    shared by the srcs inventory and both pos joins (review r12)."""
    from .planning import canon_data_path

    pseq = spark.createDataFrame(
        [(canon_data_path(t.delete_file.file_path), t.sequence_number)
         for t in pos],
        "__src string, __del_seq long")
    return (spark.read.parquet(
        *[_spark_path(t.delete_file.file_path) for t in pos])
        .withColumn("__src", _canon_col(F.col("_metadata.file_path")))
        .select(_canon_col(F.col("file_path")).alias("__del_file"),
                F.col("pos").alias("__del_pos"), "__src")
        .join(F.broadcast(pseq), on="__src", how="left"))


def _semi_join_pos(spark, df: DataFrame, data: list[FileScanTask],
                   pos: list[DeleteFileTask], limit: int,
                   how: str = "left_semi",
                   pos_df: DataFrame | None = None) -> DataFrame:
    """Rows of df matched by the position-delete files (the inverse of
    TableScan._apply_deletes' anti-join, same sequence gate).
    how="left_anti" inverts the selection (the eq lane uses it to
    exclude rows the SAME commit already pos-deleted — review r11)."""
    from .planning import canon_data_path

    if "__data_seq" not in df.columns:  # _apply_deletes may have joined it
        seq_df = spark.createDataFrame(
            [(canon_data_path(t.data_file.file_path), t.sequence_number)
             for t in data],
            "__file_c string, __data_seq long")
        df = df.withColumn("__file_c", _canon_col(F.col("__file"))) \
               .join(F.broadcast(seq_df), on="__file_c", how="left")
    if pos_df is None:
        pos_df = _pos_delete_df(spark, pos)
    cond = ((df["__file_c"] == pos_df["__del_file"])
            & (df["__pos"] == pos_df["__del_pos"])
            & (df["__data_seq"] <= pos_df["__del_seq"]))
    return df.join(_maybe_broadcast(pos_df, pos, limit), on=cond,
                   how=how)


def _semi_join_eq(spark, df: DataFrame, data: list[FileScanTask],
                  eq: list[DeleteFileTask], limit: int,
                  table: "IcebergTable | None" = None) -> DataFrame:
    """Rows of df matched by equality-delete files (strictly-older gate,
    grouped by key-set: one semi-join per distinct equality_ids).

    Key columns resolve from the delete files' equality_ids against the
    CURRENT schema (old names coalesced via the rename name-mapping,
    same rule as TableScan._apply_deletes): an eq-delete file written
    before a RENAME COLUMN carries the old key name, and joining df on
    the file's raw column names either fails analysis or silently keys
    on an all-null pad — the delete event vanishes from the changelog."""
    import json as _json

    from .planning import canon_data_path
    from .table import PROP_NAME_MAPPING

    if "__data_seq" not in df.columns:  # _apply_deletes may have joined it
        seq_df = spark.createDataFrame(
            [(canon_data_path(t.data_file.file_path), t.sequence_number)
             for t in data],
            "__file_c string, __data_seq long")
        df = df.withColumn("__file_c", _canon_col(F.col("__file"))) \
               .join(F.broadcast(seq_df), on="__file_c", how="left")
    out = None
    # group by key-set AND the delete file's partition tuple — the
    # same spec scoping the read path applies (review r12): a
    # partitioned eq-delete file tombstones only its own partition's
    # data files, so its delete EVENTS must not claim same-keyed rows
    # elsewhere either
    from .planning import canonical_partition, scoped_partition_key

    groups: dict[tuple, list[DeleteFileTask]] = {}
    for t in eq:
        gk = (tuple(t.delete_file.equality_ids or ()),
              scoped_partition_key(t.delete_file.partition))
        groups.setdefault(gk, []).append(t)
    for (eq_ids, part_key), tasks in groups.items():
        keys = spark.read.option("mergeSchema", "true").parquet(
            *[_spark_path(t.delete_file.file_path) for t in tasks])
        if table is not None and eq_ids:
            schema = table.schema()
            key_cols = [schema.name_by_id(fid) for fid in eq_ids]
            if any(c is None for c in key_cols):
                missing = [fid for fid, c in zip(eq_ids, key_cols)
                           if c is None]
                raise ValueError(
                    f"equality-delete files key on dropped column ids "
                    f"{missing}; rewrite deletes before dropping key "
                    f"columns")
            raw_map = table.metadata.properties.get(PROP_NAME_MAPPING)
            mapping = _json.loads(raw_map) if raw_map else {}
            # a former name REUSED by a different current column must
            # not coalesce into the key (same guard as _rename_map /
            # _with_name_mapping): wherever the real key column is
            # legitimately NULL, the unrelated new column's value would
            # substitute and corrupt the delete key (code-review r9)
            current = {f.name for f in schema.fields}
            for c, fid in zip(key_cols, eq_ids):
                olds = [n for n in mapping.get(str(fid), [])
                        if n in keys.columns and n != c
                        and n not in current]
                if c in keys.columns and olds:
                    keys = keys.withColumn(
                        c, F.coalesce(F.col(c), *[F.col(o) for o in olds]))
                elif olds:
                    keys = keys.withColumn(
                        c, F.coalesce(*[F.col(o) for o in olds]))
            keys = keys.select(*key_cols)
        else:
            key_cols = keys.columns
        min_seq = min(t.sequence_number for t in tasks)
        # NULL-SAFE key equality, matching the read path's anti-join
        # (table.py eqNullSafe): an eq-delete of a NULL-keyed row must
        # emit its delete event — plain on=cols makes NULL != NULL and
        # the CDC replica silently keeps the row forever
        rhs = _maybe_broadcast(
            keys.distinct().select(
                *[F.col(c).alias(f"__k_{c}") for c in key_cols]),
            tasks, limit)
        cond = None
        for c in key_cols:
            term = F.col(c).eqNullSafe(F.col(f"__k_{c}"))
            cond = term if cond is None else (cond & term)
        scoped_df = df
        if part_key is not None:
            from .planning import canon_data_path as _cdp
            scoped = [_cdp(t.data_file.file_path) for t in data
                      if canonical_partition(t.data_file.partition
                                             or None) == part_key]
            if not scoped:
                continue
            scoped_df = df.where(F.col("__file_c").isin(scoped))
        matched = (scoped_df.where(F.col("__data_seq") < F.lit(min_seq))
                   .join(rhs, on=cond, how="left_semi"))
        out = matched if out is None else out.unionByName(matched)
    if out is None:
        return df.limit(0)
    if len(groups) > 1:
        # one physical row may match eq-delete files of MORE THAN ONE
        # equality_ids group (legal for external writers mixing key
        # sets); the per-group semi-joins each emit it, so the union
        # must dedup on physical row identity or the changelog carries
        # duplicate delete events for the same row (review r12 — the
        # group-vs-group twin of the r11 pos-vs-eq dedup)
        ident = (["__file_c", "__pos"] if "__pos" in out.columns
                 else out.columns)
        out = out.dropDuplicates(ident)
    return out


# ------------------------------------------------------- CDC replication


SYNC_PROP_PREFIX = "cdc.synced-snapshot-id."


def apply_changes(source: IcebergTable, target: IcebergTable,
                  spark: SparkSession, key_cols: list[str],
                  sync_id: str = "default") -> int:
    """Incremental table-to-table CDC replication: read the source's
    changelog since the last sync point and apply it to the target as
    one merge-delta commit (inserts upsert by key, deletes remove by
    key). The sync point persists as a target table property, so the
    pipeline is restartable and each call ships only new commits.
    Returns the number of change rows applied.

    The batch MERGE semantics require changes ordered by commit:
    _commit_order breaks ties so a delete+reinsert of the same key in
    different commits lands in the right final state.
    """
    from .delta import OP_DELETE, OP_INSERT, merge_delta

    last_raw = target.metadata.properties.get(SYNC_PROP_PREFIX + sync_id)
    last = int(last_raw) if last_raw else None
    current = source.current_snapshot()
    if current is None or (last is not None
                           and current.snapshot_id == last):
        return 0
    cols = [f.name for f in source.schema().to_spark().fields]
    known = {s.snapshot_id for s in source.metadata.snapshots}
    # ancestry of the head, NOT just membership in metadata.snapshots:
    # after a source ROLLBACK the recorded sync point still exists in
    # metadata but is no longer an ancestor — changes() now rejects it
    # (review r12), and the right recovery is the same full resync as
    # the expired case
    on_ancestry = (last is not None
                   and last in source.metadata.ancestry_ids(
                       current.snapshot_id))
    # first sync against a source whose retained history is TRUNCATED
    # (the oldest retained snapshot has an expired parent): changes()
    # can only replay the retained chain's adds, so live rows written
    # by expired snapshots would be missing from the replica FOREVER
    # (review r12) — detectable, so full-resync instead
    truncated_first = False
    if last is None:
        sid, oldest = current.snapshot_id, None
        while sid is not None and sid in known:
            oldest = source.metadata.snapshot_by_id(sid)
            sid = oldest.parent_snapshot_id
        truncated_first = sid is not None  # parent exists but expired
    if (last is not None and not on_ancestry) or truncated_first:
        # the changelog window is gone (expired sync point, rollback)
        # or incomplete (truncated first sync). Full resync: upsert
        # every current source row, delete target keys that no longer
        # exist in the source (null-safe key comparison, same as the
        # rollup's vanished-row rule).
        src = source.to_df(spark)
        tgt = target.to_df(spark).alias("__t")
        src_k = src.select(*key_cols).alias("__s")
        cond = None
        for k in key_cols:
            term = F.col(f"__t.{k}").eqNullSafe(F.col(f"__s.{k}"))
            cond = term if cond is None else (cond & term)
        vanished = (tgt.join(src_k, on=cond, how="left_anti")
                    .select(*cols))
        batch = (src.select(*cols).withColumn("_op", F.lit(OP_INSERT))
                 .unionByName(vanished.withColumn("_op", F.lit(OP_DELETE))))
        n = _apply_batch(target, batch, key_cols)
        target.set_properties(
            {SYNC_PROP_PREFIX + sync_id: str(current.snapshot_id)})
        return n
    ch = changes(source, spark, from_snapshot_id=last)
    # within one commit the delete of a key precedes its re-insert
    # (upsert = delete old + insert new); order deletes first so the
    # batch's last-wins semantics land on the inserted row
    batch = (ch.orderBy(COMMIT_ORDER,
                        F.when(F.col(CHANGE_TYPE) == "delete", 0).otherwise(1))
             .select(*cols,
                     F.when(F.col(CHANGE_TYPE) == "insert", OP_INSERT)
                     .otherwise(OP_DELETE).alias("_op")))
    n = _apply_batch(target, batch, key_cols)
    target.set_properties(
        {SYNC_PROP_PREFIX + sync_id: str(current.snapshot_id)})
    return n


def _apply_batch(target, batch: DataFrame, key_cols: list[str]) -> int:
    """count + merge_delta over ONE materialization: counting the raw
    plan and then letting merge_delta re-evaluate it executed the whole
    multi-join changelog reconstruction twice per sync
    (code-review r9)."""
    from .delta import merge_delta

    batch = batch.persist()
    try:
        n = batch.count()
        if n:
            merge_delta(target, batch, key_cols=key_cols, op_col="_op")
    finally:
        batch.unpersist()
    return n
