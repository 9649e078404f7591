"""Scan planning kernels — shared between driver-side and distributed
(Spark-job) planning.

SURVEY §7 risk 8: at 100 TB a snapshot can reference tens of thousands
of manifest Avro files. Decoding them all on the driver serializes
planning and bounds table size by driver memory. This module provides:

- manifest-level pruning from manifest-list FieldSummaries (skip whole
  manifests without opening them — mirrors the bounds idea of
  FieldSummary in /root/reference/icelake/src/types/in_memory.rs:1348-1372);
- file-level partition + zone-map pruning as pure functions usable on
  either the driver or an executor;
- `plan_distributed`: planning as a Spark job — manifest paths are
  parallelized, executors decode their manifests with the pure-Python
  Avro reader and prune locally, and only SURVIVING tasks are pickled
  back to the driver. The driver's state is O(#surviving files), never
  O(#manifest bytes).

On a real cluster the package ships to executors via --py-files /
spark.submit.pyFiles; in local mode workers import it from the repo.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any

from .types import (
    CONTENT_DATA,
    CONTENT_EQUALITY_DELETES,
    CONTENT_POSITION_DELETES,
    PrimitiveType,
    Schema,
    decode_bound,
)
from .types.manifest import (
    MANIFEST_CONTENT_DATA,
    ManifestListEntry,
    read_manifest,
)
from .types.metadata import TableMetadata
from .types.transforms import apply_transform_py, transform_result_type

# Above this manifest count, planning becomes a Spark job when a session
# is available (overridable via table property
# read.plan.distributed-threshold). Measured on local NVMe: thread-pooled
# serial planning decodes ~250 manifests/s/thread, so the Spark job's
# ~1.5 s fixed overhead only pays for itself in the multi-hundred range —
# and below it driver memory is not a concern anyway.
DISTRIBUTED_PLANNING_THRESHOLD = 512


def _strip_file_scheme(p: str) -> str:
    """'file:'-scheme → plain absolute path (file:///x, file:/x, and
    file://x all resolve to /x). SHARED by resolve_path and
    canon_data_path — both sides of every delete match flow through this
    normalization, so a single implementation is the correctness
    contract (the Spark twin canon_data_path_col mirrors it as regexps).
    """
    if p.startswith("file:"):
        p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
        if not p.startswith("/"):
            p = "/" + p
    return p


def resolve_path(table_path: str, path: str) -> str:
    """Map a metadata-recorded absolute path into the table's dir
    (pure twin of IcebergTable._resolve, safe to run on executors).

    URI table paths (s3://...): a recorded path already under the table
    root passes through with no existence probe (the hot path — one
    HTTP round trip per file would dominate planning). A foreign path
    on the SAME scheme+authority is overwhelmingly a relocated table's
    old spelling — re-root by the data/metadata marker. A path on a
    DIFFERENT store is an add_files import and stays AS RECORDED:
    re-rooting it would silently read a colliding same-named file
    under this table (or fail confusingly), and probing an arbitrary
    remote store from the planner can hang on retry loops. A table
    relocated ACROSS stores must rewrite its metadata paths (the
    standard Iceberg register-table procedure) — a stale cross-store
    path fails loudly at read time.
    """
    from .fileio import io_join, is_uri, path_scheme

    if is_uri(table_path):
        base = table_path.rstrip("/")
        if path == base or path.startswith(base + "/"):
            return path
        p = _strip_file_scheme(path) if not is_uri(path) else path

        def _store(u: str) -> tuple[str, str]:
            sch = path_scheme(u)
            return sch, (u[len(sch) + 3:].split("/", 1)[0] if sch else "")

        if is_uri(p) and _store(p) != _store(base):
            return p  # add_files import on another store: as recorded
        for marker in ("/data/", "/metadata/"):
            i = p.rfind(marker)
            if i >= 0:
                return io_join(table_path, p[i + 1:])
        return path
    p = _strip_file_scheme(path)
    if os.path.exists(p):
        return p
    for marker in ("/data/", "/metadata/"):
        i = p.rfind(marker)
        if i >= 0:
            candidate = os.path.join(table_path, p[i + 1:])
            if os.path.exists(candidate):
                return candidate
    return p


# ------------------------------------------------------------- predicates


#  '==' must precede '=' and '<>' must precede '<' in the alternation:
# with '=' first, a no-space "a=='x'" parses as op '=' with literal
# "='x'"; with '<' first, "a<>'x'" parses as op '<' with literal
# ">'x'" — either corrupted literal PRUNES files that match (silent
# data loss; review r12 added the '<>' spelling)
_OP_RE = re.compile(r"^(\w+)\s*(<=|>=|!=|<>|==|=|<|>)\s*(.+)$")


def _split_top_level(text: str, word: str) -> list[str]:
    """Split on a keyword at paren depth 0 OUTSIDE string literals —
    `name = 'x or y'` must not split inside the literal."""
    parts: list[str] = []
    depth, quote, start, i, n = 0, None, 0, 0, len(text)
    wl = len(word)
    while i < n:
        ch = text[i]
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and text[i:i + wl].upper() == word \
                and (i == 0 or text[i - 1].isspace()) \
                and (i + wl == n or text[i + wl].isspace()):
            parts.append(text[start:i])
            start = i + wl
            i += wl
            continue
        i += 1
    parts.append(text[start:])
    return [s.strip() for s in parts if s.strip()]


_IN_RE = re.compile(r"^(\w+)\s+IN\s*\((.+)\)$",
                    re.IGNORECASE | re.DOTALL)


def _split_commas_quoted(text: str) -> list[str]:
    parts, quote, start = [], None, 0
    for i, ch in enumerate(text):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == ",":
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return [s.strip() for s in parts if s.strip()]


def parse_stats_preds(filter_str: str | None, schema: Schema,
                      parse_literal) -> list[list[tuple[int, str, Any, PrimitiveType]]]:
    """Parse a filter into DNF branches of simple `col OP literal`
    conjuncts for zone-map pruning: a file survives if ANY branch might
    match it. Supported shapes: conjunctions, top-level OR over
    conjunctions, and a whole-filter `col IN (v, ...)`. Parens (other
    than IN's list) bail out to no pruning — Catalyst still applies the
    full filter in-file, so pruning stays a pure optimization; a branch
    with NO parseable conjunct keeps every file, so it disables pruning
    entirely (pruning on the other branches alone would drop its
    matches — silent data loss)."""
    if not filter_str:
        return []
    s = filter_str.strip()
    m = _IN_RE.match(s)
    if m and "(" not in m.group(2):
        f = schema.field_by_name(m.group(1))
        if f is None or not isinstance(f.field_type, PrimitiveType):
            return []
        branches = []
        for lit in _split_commas_quoted(m.group(2)):
            val = parse_literal(lit, f.field_type)
            if val is None:
                return []
            branches.append([(f.field_id, "=", val, f.field_type)])
        return branches
    if "(" in s:
        return []
    branches = []
    for br in _split_top_level(s, "OR"):
        preds = []
        for c in _split_top_level(br, "AND"):
            m = _OP_RE.match(c.strip())
            if not m:
                continue
            col, op, lit = (m.group(1),
                            m.group(2).replace("==", "=")
                            .replace("<>", "!="),
                            m.group(3).strip())
            if lit.startswith(("'", '"')):
                # a quoted literal must be EXACTLY one clean quoted
                # string ('' doubling allowed, no backslash escapes —
                # the quote trackers don't unescape those): anything
                # trailing (absorbed AND clauses, || concats) or
                # backslash-bearing is unparseable and must NOT become
                # a pruning predicate (review r12 — corrupt string
                # preds silently dropped matching files)
                q = lit[0]
                if not re.match(rf"^{q}(?:[^{q}\\]|{q}{q})*{q}$", lit):
                    continue
            elif re.search(r"\s", lit):
                continue  # trailing junk — not a simple conjunct
            f = schema.field_by_name(col)
            if f is None or not isinstance(f.field_type, PrimitiveType):
                continue
            val = parse_literal(lit, f.field_type)
            if val is None:
                continue
            preds.append((f.field_id, op, val, f.field_type))
        if not preds:
            return []  # unprunable branch: every file might match it
        branches.append(preds)
    return branches


def _branch_keep(data_file, schema: Schema, preds, lo=None, hi=None) -> bool:
    if lo is None or hi is None:
        pred_fids = {fid for fid, _op, _v, _t in preds}
        lo = data_file.decoded_bounds(schema, "lower", fids=pred_fids)
        hi = data_file.decoded_bounds(schema, "upper", fids=pred_fids)
    for fid, op, val, _ft in preds:
        lo_v, hi_v = lo.get(fid), hi.get(fid)
        if lo_v is None or hi_v is None:
            continue
        if op == "=" and (val < lo_v or val > hi_v):
            return False
        if op == "<" and lo_v >= val:
            return False
        if op == "<=" and lo_v > val:
            return False
        if op == ">" and hi_v <= val:
            return False
        if op == ">=" and hi_v < val:
            return False
    return True


def stats_keep(data_file, schema: Schema, dnf) -> bool:
    """Zone-map check over DNF branches: can this file contain rows
    matching ANY branch's every conjunct? Bounds decode ONCE per file
    over the union of all branches' field ids (review r11): a 100-value
    IN-list parses to 100 branches, and per-branch decoding multiplied
    the planning hot path's dominant cost by the list size."""
    if not dnf:
        return True
    all_fids = {fid for preds in dnf for fid, _op, _v, _t in preds}
    lo = data_file.decoded_bounds(schema, "lower", fids=all_fids)
    hi = data_file.decoded_bounds(schema, "upper", fids=all_fids)
    return any(_branch_keep(data_file, schema, preds, lo=lo, hi=hi)
               for preds in dnf)


def _coerce_filter_value(v: Any, t: PrimitiveType) -> Any:
    """Best-effort coercion of a partition-filter value to the source
    column's python type (ISO strings → date/datetime, numeric strings
    → int/float) so a convenience-typed filter still prunes correctly."""
    import datetime as dt

    if not isinstance(v, str):
        return v
    n = t.name
    if n == "date":
        return dt.date.fromisoformat(v)
    if n in ("timestamp", "timestamptz"):
        out = dt.datetime.fromisoformat(v)
        if n == "timestamptz" and out.tzinfo is None:
            # match _parse_literal: decoded tz bounds are UTC-AWARE,
            # and a naive!=aware compare either crashes pruning or
            # silently prunes every file (review r12)
            out = out.replace(tzinfo=dt.timezone.utc)
        return out
    if n in ("int", "long"):
        return int(v)
    if n in ("float", "double"):
        return float(v)
    if n == "decimal":
        from decimal import Decimal
        return Decimal(v)
    if n == "boolean":
        return v.lower() == "true"
    return v


def residual_partition_field(metadata: TableMetadata, key: str):
    """The partition field a partition_filter key refers to, under
    DEFAULT-SPEC-FIRST resolution (shared by pruning and the row-level
    residual so the two can never disagree): the current default
    spec's field of that name wins; otherwise older specs' fields win
    only when they all agree on (source, transform). Returns None when
    the name is absent or historically ambiguous (ADVICE r8 /
    code-review r9)."""
    try:
        default = metadata.default_spec()
    except KeyError:
        default = None
    if default is not None:
        f = next((f for f in default.fields if f.name == key), None)
        if f is not None:
            return f
    matches = [f for spec in metadata.partition_specs
               for f in spec.fields if f.name == key]
    sigs = {(f.source_column_id, f.transform) for f in matches}
    if len(sigs) == 1:
        return matches[0]
    return None


def partition_wanted(metadata: TableMetadata, partition_filter: dict[str, Any] | None,
                     ) -> dict[int, dict[str, Any]]:
    """Per-spec expected partition tuple values from a filter keyed by
    partition-field name OR source-column name (transformed here once,
    instead of per file). Pruning is a pure OPTIMIZATION: a filter value
    that cannot be coerced/transformed for a field is SKIPPED for that
    field (no pruning on it) instead of crashing the scan or silently
    pruning every file via a type-mismatched comparison.

    Spec-evolution guard: when a spec's same-named field DISAGREES with
    the filter key's resolved meaning (residual_partition_field —
    default-spec-first), that spec does NOT prune on the field. Its
    files scan and the row-level residual (which applies the resolved
    transform, file-spec-independent) filters exactly — pruning by the
    stale spec's raw value would drop files containing matching rows."""
    if not partition_filter:
        return {}
    schema = metadata.current_schema()
    out: dict[int, dict[str, Any]] = {}
    for spec in metadata.partition_specs:
        want: dict[str, Any] = {}
        for pf in spec.fields:
            if pf.name in partition_filter:
                ref = residual_partition_field(metadata, pf.name)
                if ref is not None and (
                        (pf.source_column_id, pf.transform)
                        != (ref.source_column_id, ref.transform)):
                    continue  # residual filters these files' rows
                # coerce to the partition field's RESULT type (review
                # r11): identity partitions share the field name with
                # the source column, and an uncoerced '2024-01-01'
                # string never equals the date partition value — the
                # docstring's skip-don't-mangle promise applied only
                # to the source-name branch, so a convenience-typed
                # filter silently pruned every file (or str-vs-date
                # crashed the FieldSummary compare in prune_manifests)
                src = schema.field_by_id(pf.source_column_id)
                rt = transform_result_type(
                    pf.transform, src.field_type if src else None)
                val = partition_filter[pf.name]
                if val is not None and isinstance(rt, PrimitiveType):
                    try:
                        val = _coerce_filter_value(val, rt)
                    except (ValueError, TypeError):
                        continue  # unusable filter value: skip field
                want[pf.name] = val
            else:
                src = schema.field_by_id(pf.source_column_id)
                if src and src.name in partition_filter:
                    try:
                        val = _coerce_filter_value(
                            partition_filter[src.name], src.field_type)
                        want[pf.name] = apply_transform_py(
                            pf.transform, val, src.field_type)
                    except (ValueError, TypeError):
                        continue  # unusable filter value: skip this field
        out[spec.spec_id] = want
    return out


def partition_keep(data_file, wanted_for_spec: dict[str, Any]) -> bool:
    for name, want in wanted_for_spec.items():
        if data_file.partition.get(name) != want:
            return False
    return True


def prune_manifests(mles: list[ManifestListEntry], metadata: TableMetadata,
                    wanted: dict[int, dict[str, Any]]) -> list[ManifestListEntry]:
    """Drop data manifests whose FieldSummary bounds prove no file can
    match the partition filter — without opening the manifest. Delete
    manifests and manifests lacking summaries are always kept."""
    if not wanted:
        return mles
    schema = metadata.current_schema()
    out = []
    for mle in mles:
        if mle.content != MANIFEST_CONTENT_DATA or not mle.partitions:
            out.append(mle)
            continue
        try:
            spec = metadata.spec_by_id(mle.partition_spec_id)
        except KeyError:
            spec = None
        want = wanted.get(mle.partition_spec_id, {})
        if spec is None or not want:
            out.append(mle)
            continue
        keep = True
        for i, pf in enumerate(spec.fields):
            if pf.name not in want or i >= len(mle.partitions):
                continue
            s = mle.partitions[i] or {}
            v = want[pf.name]
            if v is None:
                if s.get("contains_null") is False:
                    keep = False
                    break
                continue
            lo_b, hi_b = s.get("lower_bound"), s.get("upper_bound")
            if lo_b is None or hi_b is None:
                continue
            src = schema.field_by_id(pf.source_column_id)
            t = transform_result_type(pf.transform,
                                      src.field_type if src else None)
            if not isinstance(t, PrimitiveType):
                continue
            try:
                lo, hi = decode_bound(t, bytes(lo_b)), decode_bound(t, bytes(hi_b))
                drop = v < lo or v > hi
            except Exception:
                # decode failure OR a type-mismatched comparison (the
                # compare sat OUTSIDE this try and crashed planning on
                # e.g. naive-vs-aware datetimes; review r12): bounds
                # unusable -> manifest kept
                continue
            if drop:
                keep = False
                break
        if keep:
            out.append(mle)
    return out


# ---------------------------------------------------------------- assembly


def assemble_manifest(table_path: str, metadata: TableMetadata,
                      mle: ManifestListEntry, entries,
                      wanted: dict[int, dict[str, Any]], preds,
                      ) -> list[tuple[int, Any, int, int]]:
    """(manifest entries) → pruned [(content, DataFile, seq, spec_id)].

    Shared by the serial and distributed planners so both produce
    byte-identical plans. v2 sequence-number inheritance: a null seq on
    an entry inherits the manifest-list entry's sequence number."""
    schema = metadata.current_schema()
    want = wanted.get(mle.partition_spec_id, {}) if wanted else {}
    out = []
    for e in entries:
        if not e.is_alive:
            continue
        seq = e.sequence_number
        if seq is None:
            seq = mle.sequence_number
        df = e.data_file
        df.file_path = resolve_path(table_path, df.file_path)
        if df.content == CONTENT_DATA:
            if want and not partition_keep(df, want):
                continue
            if preds and not stats_keep(df, schema, preds):
                continue
        out.append((df.content, df, seq, mle.partition_spec_id))
    return out


def plan_distributed(spark, table_path: str, metadata: TableMetadata,
                     mles: list[ManifestListEntry],
                     wanted: dict[int, dict[str, Any]] | None = None,
                     preds=None) -> list[tuple[int, Any, int, int]]:
    """Planning as a Spark job: the list-returning face of
    `plan_files_df`. The plan DataFrame is STREAMED to the driver
    (toLocalIterator, one Arrow partition in memory at a time) instead
    of collect()ed, so peak driver memory is the final task list alone,
    not list + pickled blob buffers. Result order is deterministic
    (manifest-list position, then entry order)."""
    pdf = plan_files_df(spark, table_path, metadata, mles, wanted, preds)
    return [(r.content, pickle.loads(bytes(r.task)), r.seq, r.spec_id)
            for r in pdf.orderBy("mi", "fi").toLocalIterator()]


PLAN_DF_SCHEMA = ("mi int, fi int, content int, file_path string, seq long, "
                  "spec_id int, record_count long, file_size long, "
                  "file_format string, partition string, task binary")


def canon_data_path(p: str) -> str:
    """Location-independent canonical form of a data-file path: the part
    after the LAST '/data/' segment (falling back to the normalized
    absolute path when no data/ dir is present, e.g. add_files imports).

    Position/equality-delete file CONTENT records the writer-era
    absolute `file_path`; a relocated table (golden fixtures, restored
    backups) resolves its PLANNED paths to the new root, so comparing
    raw absolute paths silently stops applying deletes. Both sides of
    every delete match must go through this form (Spark twin:
    `canon_data_path_col`). The fallback normalizes the cloud scheme
    to the JVM connector spelling (s3 -> s3a, the to_spark_paths map;
    review r12): an add_files-imported s3:// path with no /data/
    segment kept its python-side spelling while Spark's
    _metadata.file_path reads s3a:// — the seq map and every delete
    join silently missed those files."""
    p = _strip_file_scheme(p)
    i = p.rfind("/data/")
    if i >= 0:
        return p[i + len("/data/"):]
    if p.startswith("s3://"):
        return "s3a://" + p[len("s3://"):]
    return p


def canon_data_path_col(c):
    """Spark Column twin of canon_data_path (greedy ^.*/data/ strips
    through the LAST /data/; no-op when absent; same s3 -> s3a scheme
    normalization on the no-/data/ fallback)."""
    from pyspark.sql import functions as F

    normalized = F.regexp_replace(c, r"^file:/*", "/")
    normalized = F.regexp_replace(normalized, r"^s3://", "s3a://")
    return F.regexp_replace(normalized, r"^.*/data/", "")


def scoped_partition_key(partition: dict | None) -> str | None:
    """The eq-delete scoping key: None when the delete file is GLOBAL.
    An empty partition tuple is global by the spec; an ALL-None tuple
    is treated global too because this repo's own global deletes
    round-trip through the partitioned manifest Avro schema as
    all-None (the record type has the spec's fields, so {} reads back
    as {field: None} — review r12 follow-up: the first scoping cut
    read those as "scoped to the NULL partition" and silently stopped
    applying every upsert's deletes on partitioned tables). Caveat,
    documented: an external delete file genuinely scoped to an
    all-NULL partition tuple is applied globally — indistinguishable
    at the manifest level here, and global application errs toward
    the pre-scoping behavior."""
    if not partition or all(v is None for v in partition.values()):
        return None
    return canonical_partition(partition)


def canonical_partition(partition: dict | None) -> str:
    """Stable string form of a partition tuple (sorted by field name) —
    groupable/joinable in the plan DataFrame without a struct schema
    that varies per spec."""
    return str(sorted((partition or {}).items()))


def _distributed_manifest_df(spark, mles: list[ManifestListEntry],
                             ctx_obj: tuple, schema: str, build):
    """Shared executor-side scaffolding for the manifest-walking
    DataFrame producers (plan_files_df / manifest_entries_df — review
    r11: the two previously duplicated this verbatim, so a fix to the
    partitioning or pickle protocol had to be remembered twice): each
    manifest-list entry ships as one pickled task row, fans out to
    <=256 partitions, and mapInPandas reads + transforms each manifest
    executor-side. `ctx_obj` is any picklable tuple whose FIRST
    element is the table path; `build(ctx_obj, mi, mle, entries,
    cols)` appends one manifest's rows to the per-batch column lists
    (keys = the schema's field names). Nothing is ever collected to
    the driver."""
    import pandas as pd

    blobs = [(i, pickle.dumps(mle)) for i, mle in enumerate(mles)]
    if not blobs:
        return spark.createDataFrame([], schema)
    ctx = pickle.dumps(ctx_obj)
    names = [part.strip().split()[0] for part in schema.split(",")]

    def run(batches):
        c = pickle.loads(ctx)
        tpath = c[0]
        for pdf in batches:
            cols: dict[str, list] = {k: [] for k in names}
            for i, blob in zip(pdf["i"], pdf["task"]):
                mle = pickle.loads(bytes(blob))
                _, entries = read_manifest(
                    resolve_path(tpath, mle.manifest_path))
                build(c, int(i), mle, entries, cols)
            yield pd.DataFrame(cols)

    n_parts = max(1, min(len(blobs), 256))
    src = spark.createDataFrame(blobs, "i int, task binary") \
        .repartition(n_parts)
    return src.mapInPandas(run, schema=schema)


def plan_files_df(spark, table_path: str, metadata: TableMetadata,
                  mles: list[ManifestListEntry],
                  wanted: dict[int, dict[str, Any]] | None = None,
                  preds=None):
    """Planning that RETURNS A DATAFRAME — the lifted form of SURVEY §7
    risk 8 (the reference plans purely driver-side, table.rs:281-304):
    one row per surviving file with light columns (content, file_path,
    seq, spec_id, record_count, file_size) plus the pickled DataFile
    for consumers that need stats/bounds. Nothing is collected here, so
    a million-file table's plan lives on executors; downstream can
    aggregate (compaction sizing, snapshot stats), filter, or stream it
    with toLocalIterator — the driver never holds every DataFile at
    once. `mi` is the manifest-list position for deterministic ordering.
    """
    def build(c, mi, mle, entries, cols):
        tpath, meta, want, prs = c
        for fi, (content, dfile, seq, spec_id) in enumerate(
                assemble_manifest(tpath, meta, mle, entries, want, prs)):
            cols["mi"].append(mi)
            cols["fi"].append(fi)
            cols["content"].append(int(content))
            cols["file_path"].append(dfile.file_path)
            cols["seq"].append(int(seq) if seq is not None else 0)
            cols["spec_id"].append(int(spec_id))
            cols["record_count"].append(int(dfile.record_count or 0))
            cols["file_size"].append(int(dfile.file_size_in_bytes or 0))
            cols["file_format"].append(dfile.file_format or "PARQUET")
            cols["partition"].append(canonical_partition(dfile.partition))
            cols["task"].append(pickle.dumps(dfile))

    return _distributed_manifest_df(
        spark, mles, (table_path, metadata, wanted or {}, preds or []),
        PLAN_DF_SCHEMA, build)


def plan_serial(table_path: str, metadata: TableMetadata,
                mles: list[ManifestListEntry],
                wanted: dict[int, dict[str, Any]] | None = None,
                preds=None) -> list[tuple[int, Any, int, int]]:
    """Driver-side twin of plan_distributed (thread-pooled I/O)."""
    wanted = wanted or {}
    preds = preds or []
    if len(mles) > 4:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(16, len(mles))) as pool:
            parsed = list(pool.map(
                lambda m: read_manifest(resolve_path(table_path, m.manifest_path)),
                mles))
    else:
        parsed = [read_manifest(resolve_path(table_path, m.manifest_path))
                  for m in mles]
    tasks: list[tuple[int, Any, int, int]] = []
    for mle, (_, entries) in zip(mles, parsed):
        tasks.extend(assemble_manifest(table_path, metadata, mle, entries,
                                       wanted, preds))
    return tasks


def split_tasks(tasks, file_scan_task, delete_file_task):
    """[(content, df, seq, spec_id)] → (data, pos_deletes, eq_deletes).

    Also accepts a `plan_files_df` DataFrame: rows stream in through
    toLocalIterator (bounded driver memory) in deterministic order.
    """
    if hasattr(tasks, "toLocalIterator"):  # a plan_files_df DataFrame
        tasks = ((r.content, pickle.loads(bytes(r.task)), r.seq, r.spec_id)
                 for r in tasks.orderBy("mi", "fi").toLocalIterator())
    data, pos, eq = [], [], []
    for content, df, seq, spec_id in tasks:
        if content == CONTENT_DATA:
            data.append(file_scan_task(df, seq, spec_id))
        elif content == CONTENT_POSITION_DELETES:
            pos.append(delete_file_task(df, seq))
        elif content == CONTENT_EQUALITY_DELETES:
            eq.append(delete_file_task(df, seq))
    return data, pos, eq


ENTRIES_DF_SCHEMA = ("mi int, fi int, status int, snapshot_id long, "
                     "sequence_number long, file_sequence_number long, "
                     "content int, file_path string, file_format string, "
                     "record_count long, file_size_in_bytes long, "
                     "partition string")


def manifest_entries_df(spark, table_path: str,
                        mles: list[ManifestListEntry]):
    """`entries` metadata table as a distributed Spark job: one row per
    manifest entry INCLUDING status=deleted tombstones (which
    plan_files_df deliberately drops), with inherited sequence numbers
    materialized. Same executor-side shape as plan_files_df (shared
    _distributed_manifest_df scaffolding) — at a million entries
    nothing is collected to the driver (parity surface: Iceberg's
    `SELECT * FROM t.entries`; the reference walks the same entries
    driver-side in table.rs:281-304)."""
    def build(c, mi, mle, entries, cols):
        for fi, e in enumerate(entries):
            d = e.data_file
            # spec: ADDED entries inherit the manifest-list seq when
            # their own field is null; DELETED/EXISTING carry explicit
            # values (written by our own manifest writer) or inherit
            # likewise
            seq = (e.sequence_number if e.sequence_number
                   is not None else mle.sequence_number)
            fseq = (e.file_sequence_number
                    if e.file_sequence_number is not None else seq)
            cols["mi"].append(mi)
            cols["fi"].append(fi)
            cols["status"].append(int(e.status))
            cols["snapshot_id"].append(
                int(e.snapshot_id if e.snapshot_id is not None
                    else mle.added_snapshot_id))
            cols["sequence_number"].append(int(seq))
            cols["file_sequence_number"].append(int(fseq))
            cols["content"].append(int(mle.content))
            cols["file_path"].append(d.file_path)
            cols["file_format"].append(d.file_format or "PARQUET")
            cols["record_count"].append(int(d.record_count or 0))
            cols["file_size_in_bytes"].append(
                int(d.file_size_in_bytes or 0))
            cols["partition"].append(canonical_partition(d.partition))

    return _distributed_manifest_df(spark, mles, (table_path,),
                                    ENTRIES_DF_SCHEMA, build)
