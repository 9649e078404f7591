"""FileIO: pluggable I/O for the metadata/commit layer.

The reference runs its whole catalog on any opendal backend — its
integration tests commit to minio/S3 (/root/reference/icelake/src/
catalog/io.rs:1-60, catalog/storage.rs:175-242). This module is the
PySpark-native equivalent: every metadata read/write, manifest Avro,
atomic commit, file inventory, and maintenance delete goes through a
`FileIO`, resolved from the path's scheme:

- no scheme / ``file://`` → `LocalFileIO` (POSIX; keeps the os.link
  create-exclusive commit swap);
- ``memory://``           → `MemoryFileIO` (in-process dict with a real
  atomic create-exclusive; driver-side tests);
- anything else           → `ArrowFileIO` over `pyarrow.fs.
  FileSystem.from_uri` (s3://, gs://, hdfs://, ...), or a scheme
  registered via `register_io` (tests register a prefix-rewriting
  mock:// to prove nothing bypasses the abstraction).

Data files are still read/written by Spark itself — `to_spark_path`
translates a table path into the form the JVM readers expect
(``s3://`` → ``s3a://``); only the driver-side metadata plane uses the
Python filesystem clients, mirroring the reference's split between
opendal (metadata + file ops) and its Parquet writers.

Atomicity: POSIX and memory back ends provide true create-exclusive
(two racing committers cannot both win a version). Object stores via
pyarrow expose no conditional put, so `ArrowFileIO.create_exclusive`
defaults to check-then-write — the same single-committer caveat the
reference documents for its storage catalog on S3 (storage.rs:175-231).
Registering a conditional-put backend (`enable_s3_conditional_put`:
boto3 `If-None-Match: *`; `enable_gcs_conditional_put`:
`if_generation_match=0`; or `register_conditional_put` for anything
else) upgrades those commits to true atomic multi-writer semantics;
a REST catalog remains the alternative.
"""

from __future__ import annotations

import os
import posixpath
import threading
import time
import uuid as _uuid
from typing import Callable, Iterable

# --------------------------------------------------------- path helpers


def path_scheme(path: str) -> str:
    """'s3://b/k' → 's3'; '/x/y' and 'C:...' → ''."""
    i = path.find("://")
    if i <= 0:
        return ""
    head = path[:i]
    return head if head.isalnum() else ""


def is_uri(path: str) -> bool:
    return path_scheme(path) not in ("", "file")


def io_join(base: str, *parts: str) -> str:
    """Join path components; posix rules for URIs, os rules locally."""
    if is_uri(base):
        return posixpath.join(base, *parts)
    return os.path.join(base, *parts)


def norm_path(path: str) -> str:
    """Canonical form for set-membership comparisons: abspath locally,
    scheme + normalized key for URIs (file:// stripped to local)."""
    sch = path_scheme(path)
    if sch == "file":
        p = path[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
        if not p.startswith("/"):
            p = "/" + p
        return os.path.abspath(p)
    if sch:
        rest = path[len(sch) + 3:]
        return f"{sch}://{posixpath.normpath(rest)}"
    return os.path.abspath(path)


def rel_under(base: str, path: str) -> str:
    """path relative to base ('.' when equal); URI-safe."""
    if is_uri(base) or is_uri(path):
        b = norm_path(base).rstrip("/")
        p = norm_path(path)
        if p == b:
            return "."
        if p.startswith(b + "/"):
            return p[len(b) + 1:]
        return p
    return os.path.relpath(path, base)


def basename(path: str) -> str:
    return posixpath.basename(path) if is_uri(path) else os.path.basename(path)


def dirname(path: str) -> str:
    return posixpath.dirname(path) if is_uri(path) else os.path.dirname(path)


def delete_crc_sidecar(io: "FileIO", path: str) -> None:
    """Remove the Hadoop ChecksumFileSystem sidecar (`.<name>.crc`) the
    local-FS committer leaves next to `path` (ADVICE r13); quiet no-op
    where no sidecar exists (object stores)."""
    d, b = dirname(path), basename(path)
    if b:
        io.delete_quiet(io_join(d, f".{b}.crc") if d else f".{b}.crc")


# ------------------------------------------------------------ interface


class FileIO:
    """Abstract metadata-plane I/O. All paths are full (scheme included
    for URIs). Implementations must be picklable — `_build_data_file`
    ships them to executors for distributed footer-stat collection."""

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def open_input(self, path: str):
        """Random-access binary file-like (pyarrow-compatible) — used
        for parquet footer reads without pulling whole files."""
        import pyarrow as pa

        return pa.BufferReader(self.read_bytes(path))

    def write_bytes(self, path: str, data: bytes) -> None:
        """Overwrite `path` with `data` (readers must never observe a
        torn write: local uses tmp+rename; object stores are atomic on
        complete by nature)."""
        raise NotImplementedError

    def create_exclusive(self, path: str, data: bytes) -> None:
        """Write iff `path` does not exist; FileExistsError otherwise."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def delete_quiet(self, path: str) -> None:
        try:
            self.delete(path)
        except (OSError, FileNotFoundError):
            pass

    def list_files(self, prefix: str) -> list[tuple[str, int]]:
        """Recursive (full path, size) under a directory/prefix; empty
        list when the prefix does not exist."""
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        """Create a directory tree; no-op where directories are virtual."""

    def remove_tree(self, path: str) -> None:
        for p, _sz in self.list_files(path):
            self.delete_quiet(p)

    def rename(self, src: str, dst: str) -> None:
        """Move a file or directory tree (local-catalog table rename)."""
        raise NotImplementedError

    def find_marker_dirs(self, base: str, marker: str) -> list[str]:
        """Directories under `base` containing a `marker` child (table
        discovery: marker='metadata'). Generic implementation scans the
        flat recursive listing — right for object stores, whose listing
        IS flat; hierarchical back ends override with a pruned walk
        that never descends into matched tables' data dirs."""
        out = set()
        needle = f"/{marker}/"
        for path, _sz in self.list_files(base):
            p = path.replace("\\", "/")
            i = p.rfind(needle)
            if i >= 0:
                out.add(path[:i])
        return sorted(out)

    def to_spark_path(self, path: str) -> str:
        """Form of `path` Spark/JVM readers understand."""
        return path


# ---------------------------------------------------------------- local


class LocalFileIO(FileIO):
    """POSIX filesystem; the default and the only backend with hard-link
    create-exclusive semantics (see StorageCatalog commit notes)."""

    def _p(self, path: str) -> str:
        if path_scheme(path) == "file":
            return norm_path(path)
        return path

    def read_bytes(self, path: str) -> bytes:
        with open(self._p(path), "rb") as f:
            return f.read()

    def open_input(self, path: str):
        import pyarrow as pa

        return pa.OSFile(self._p(path), "rb")

    def write_bytes(self, path: str, data: bytes) -> None:
        p = self._p(path)
        tmp = f"{p}.tmp-{os.getpid()}-{_uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)

    def create_exclusive(self, path: str, data: bytes) -> None:
        p = self._p(path)
        tmp = f"{p}.tmp-{os.getpid()}-{_uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            # os.link fails with EEXIST if p exists — true atomic
            # create-exclusive, unlike exists()+replace (TOCTOU)
            os.link(tmp, p)
        except FileExistsError:
            os.remove(tmp)
            raise
        except OSError:
            # no hard links (some network/FUSE mounts): check+rename —
            # weaker under concurrency, only portable option there
            if os.path.exists(p):
                os.remove(tmp)
                raise FileExistsError(p)
            os.replace(tmp, p)
            return
        os.remove(tmp)

    def exists(self, path: str) -> bool:
        return os.path.exists(self._p(path))

    def size(self, path: str) -> int:
        return os.path.getsize(self._p(path))

    def mtime(self, path: str) -> float:
        return os.path.getmtime(self._p(path))

    def delete(self, path: str) -> None:
        os.remove(self._p(path))

    def list_files(self, prefix: str) -> list[tuple[str, int]]:
        out = []
        for root, _dirs, names in os.walk(self._p(prefix)):
            for n in names:
                p = os.path.join(root, n)
                try:
                    out.append((p, os.path.getsize(p)))
                except OSError:
                    pass  # racing delete between walk and stat
        return out

    def makedirs(self, path: str) -> None:
        os.makedirs(self._p(path), exist_ok=True)

    def remove_tree(self, path: str) -> None:
        import shutil

        shutil.rmtree(self._p(path))

    def rename(self, src: str, dst: str) -> None:
        os.rename(self._p(src), self._p(dst))

    def find_marker_dirs(self, base: str, marker: str) -> list[str]:
        # pruned walk: stop descending once a table root is found — a
        # warehouse of N tables costs O(dirs above tables), not
        # O(every data file) like the flat listing would
        out = []
        for root, dirs, _files in os.walk(self._p(base)):
            if marker in dirs:
                out.append(root)
                dirs.clear()
        return sorted(out)


# --------------------------------------------------------------- memory


class MemoryFileIO(FileIO):
    """Process-local in-memory store ('memory://...'). True atomic
    create-exclusive under a lock — exercises the whole commit protocol
    without touching disk. Driver-side only: executor processes see an
    empty store, so tables whose DATA Spark must read belong on a
    Spark-readable scheme (the mock:// test fixture covers that)."""

    _store: dict[str, bytes] = {}
    _times: dict[str, float] = {}
    _lock = threading.Lock()

    def read_bytes(self, path: str) -> bytes:
        try:
            return MemoryFileIO._store[path]
        except KeyError:
            raise FileNotFoundError(path)

    def write_bytes(self, path: str, data: bytes) -> None:
        with MemoryFileIO._lock:
            MemoryFileIO._store[path] = bytes(data)
            MemoryFileIO._times[path] = time.time()

    def create_exclusive(self, path: str, data: bytes) -> None:
        with MemoryFileIO._lock:
            if path in MemoryFileIO._store:
                raise FileExistsError(path)
            MemoryFileIO._store[path] = bytes(data)
            MemoryFileIO._times[path] = time.time()

    def exists(self, path: str) -> bool:
        p = path.rstrip("/")
        if p in MemoryFileIO._store:
            return True
        return any(k.startswith(p + "/") for k in MemoryFileIO._store)

    def size(self, path: str) -> int:
        return len(self.read_bytes(path))

    def mtime(self, path: str) -> float:
        try:
            return MemoryFileIO._times[path]
        except KeyError:
            raise FileNotFoundError(path)

    def delete(self, path: str) -> None:
        with MemoryFileIO._lock:
            if path not in MemoryFileIO._store:
                raise FileNotFoundError(path)
            del MemoryFileIO._store[path]
            MemoryFileIO._times.pop(path, None)

    def list_files(self, prefix: str) -> list[tuple[str, int]]:
        p = prefix.rstrip("/") + "/"
        with MemoryFileIO._lock:
            return [(k, len(v)) for k, v in MemoryFileIO._store.items()
                    if k.startswith(p)]

    def rename(self, src: str, dst: str) -> None:
        s = src.rstrip("/")
        d = dst.rstrip("/")
        with MemoryFileIO._lock:
            moved = {}
            for k in list(MemoryFileIO._store):
                if k == s:
                    moved[d] = k
                elif k.startswith(s + "/"):
                    moved[d + k[len(s):]] = k
            if not moved:
                raise FileNotFoundError(src)
            for new, old in moved.items():
                MemoryFileIO._store[new] = MemoryFileIO._store.pop(old)
                MemoryFileIO._times[new] = MemoryFileIO._times.pop(old, time.time())

    def to_spark_path(self, path: str) -> str:
        raise ValueError(
            "memory:// holds metadata only; Spark cannot read it — put "
            "data files on a Spark-readable scheme")

    @classmethod
    def clear(cls) -> None:
        with cls._lock:
            cls._store.clear()
            cls._times.clear()


# ------------------------------------------------------------ pyarrow.fs


class ArrowFileIO(FileIO):
    """Any scheme `pyarrow.fs.FileSystem.from_uri` resolves (s3://,
    gs://, hdfs://...). Lazily connected; picklable (reconnects on the
    receiving process)."""

    _SPARK_SCHEME = {"s3": "s3a"}  # JVM Hadoop connector spelling

    def __init__(self, sample_uri: str):
        self._uri = sample_uri
        self._fs = None

    def __reduce__(self):
        return (ArrowFileIO, (self._uri,))

    def _resolve(self):
        if self._fs is None:
            from pyarrow import fs as pafs

            self._fs, inner = pafs.FileSystem.from_uri(self._uri)
            # authority-scoped filesystems (hdfs://host:8020/a → '/a')
            # expect PURE paths, while bucket stores (s3://b/k →
            # 'b/k') keep the bucket in the path — from_uri's returned
            # path component tells us which convention this fs uses
            self._pure_path = inner.startswith("/")
        return self._fs

    def _key(self, path: str) -> str:
        sch = path_scheme(path)
        if not sch:
            return path
        rest = path[len(sch) + 3:]
        self._resolve()
        if not self._pure_path:
            return rest  # bucket/key convention (s3, gs)
        i = rest.find("/")
        return rest[i:] if i >= 0 else "/"

    def _authority(self) -> str:
        """scheme://authority prefix for reconstructing full paths from
        fs-relative listings (empty authority for bucket stores, whose
        listing paths already start with the bucket)."""
        sch = path_scheme(self._uri)
        if not self._pure_path:
            return f"{sch}://"
        return f"{sch}://" + self._uri[len(sch) + 3:].split("/", 1)[0]

    def read_bytes(self, path: str) -> bytes:
        with self._resolve().open_input_stream(self._key(path)) as f:
            return f.read()

    def open_input(self, path: str):
        return self._resolve().open_input_file(self._key(path))

    def write_bytes(self, path: str, data: bytes) -> None:
        with self._resolve().open_output_stream(self._key(path)) as f:
            f.write(data)

    def create_exclusive(self, path: str, data: bytes) -> None:
        # pyarrow.fs exposes no conditional put; a registered
        # conditional-put backend (register_conditional_put /
        # enable_s3_conditional_put) gives a TRUE atomic commit —
        # otherwise fall back to check-then-write (module docstring:
        # single-committer caveat on object stores without one)
        putter = _COND_PUT.get(path_scheme(path))
        if putter is not None:
            putter(path, data)
            return
        if self.exists(path):
            raise FileExistsError(path)
        self.write_bytes(path, data)

    def _info(self, path: str):
        return self._resolve().get_file_info(self._key(path))

    def exists(self, path: str) -> bool:
        from pyarrow import fs as pafs

        return self._info(path).type != pafs.FileType.NotFound

    def size(self, path: str) -> int:
        info = self._info(path)
        if info.size is None:
            raise FileNotFoundError(path)
        return info.size

    def mtime(self, path: str) -> float:
        info = self._info(path)
        if info.mtime is None:
            raise FileNotFoundError(path)
        return info.mtime.timestamp()

    def delete(self, path: str) -> None:
        self._resolve().delete_file(self._key(path))

    def list_files(self, prefix: str) -> list[tuple[str, int]]:
        from pyarrow import fs as pafs

        sch = path_scheme(prefix)
        try:
            infos = self._resolve().get_file_info(
                pafs.FileSelector(self._key(prefix), recursive=True,
                                  allow_not_found=True))
        except FileNotFoundError:
            return []
        pre = self._authority() if sch else ""
        return [(f"{pre}{i.path}" if sch else i.path, i.size or 0)
                for i in infos if i.type == pafs.FileType.File]

    def makedirs(self, path: str) -> None:
        self._resolve().create_dir(self._key(path), recursive=True)

    def rename(self, src: str, dst: str) -> None:
        self._resolve().move(self._key(src), self._key(dst))

    def to_spark_path(self, path: str) -> str:
        sch = path_scheme(path)
        mapped = self._SPARK_SCHEME.get(sch)
        return f"{mapped}://{path[len(sch) + 3:]}" if mapped else path


# ----------------------------------------------------- conditional put

# scheme → putter(path, data) that atomically writes iff absent,
# raising FileExistsError when the object already exists. With one
# registered, ArrowFileIO.create_exclusive becomes a true multi-writer
# commit on that scheme (the capability the reference's storage catalog
# lacks on S3, storage.rs:175-231 — S3 gained `If-None-Match: *`
# conditional PUT in late 2024; GCS has ifGenerationMatch=0).
_COND_PUT: dict[str, Callable[[str, bytes], None]] = {}


def register_conditional_put(scheme: str,
                             putter: Callable[[str, bytes], None]) -> None:
    """Install an atomic create-if-absent backend for a URI scheme.
    `putter(path, data)` must write atomically iff `path` is absent and
    raise FileExistsError otherwise."""
    _COND_PUT[scheme] = putter


def unregister_conditional_put(scheme: str) -> None:
    _COND_PUT.pop(scheme, None)


def _split_bucket_key(path: str) -> tuple[str, str]:
    sch = path_scheme(path)
    rest = path[len(sch) + 3:]
    bucket, _, key = rest.partition("/")
    return bucket, key


def enable_s3_conditional_put(client=None) -> None:
    """Register a boto3-backed `If-None-Match: *` conditional PUT for
    s3:// commits (supported by S3 since late 2024; also by MinIO).
    Raises ImportError when boto3 is unavailable — commits then stay on
    the check-then-write fallback."""
    if client is None:
        import boto3  # optional dependency; import-gated by design

        client = boto3.client("s3")

    def _put(path: str, data: bytes) -> None:
        from botocore.exceptions import ClientError

        bucket, key = _split_bucket_key(path)
        try:
            client.put_object(Bucket=bucket, Key=key, Body=data,
                              IfNoneMatch="*")
        except ClientError as e:
            code = str(e.response.get("Error", {}).get("Code", ""))
            if code in ("PreconditionFailed", "412", "ConditionalRequestConflict"):
                # 409 ConditionalRequestConflict = a concurrent
                # conditional writer is in flight — the object may or
                # may not exist; surface as exists so the commit loop
                # re-reads and retries on a fresh base
                raise FileExistsError(path) from e
            raise

    register_conditional_put("s3", _put)


def enable_gcs_conditional_put(client=None) -> None:
    """Register a google-cloud-storage `if_generation_match=0` upload
    for gs:// commits. Raises ImportError when the library is absent."""
    if client is None:
        from google.cloud import storage  # optional; import-gated

        client = storage.Client()

    def _put(path: str, data: bytes) -> None:
        from google.api_core.exceptions import PreconditionFailed

        bucket, key = _split_bucket_key(path)
        blob = client.bucket(bucket).blob(key)
        try:
            blob.upload_from_string(data, if_generation_match=0)
        except PreconditionFailed as e:
            raise FileExistsError(path) from e

    register_conditional_put("gs", _put)


# -------------------------------------------------------------- registry

_LOCAL = LocalFileIO()
_MEMORY = MemoryFileIO()
_REGISTRY: dict[str, Callable[[str], FileIO]] = {}
_ARROW_CACHE: dict[str, ArrowFileIO] = {}


def register_io(scheme: str, factory: Callable[[str], FileIO]) -> None:
    """Register a custom scheme (tests; exotic stores). The factory is
    called with a sample path and must return a picklable FileIO."""
    _REGISTRY[scheme] = factory


def unregister_io(scheme: str) -> None:
    _REGISTRY.pop(scheme, None)
    # cache keys are scheme://authority — evict every entry of the scheme
    for key in [k for k in _ARROW_CACHE if k.startswith(f"{scheme}://")]:
        _ARROW_CACHE.pop(key, None)


def resolve_io(path: str) -> FileIO:
    sch = path_scheme(path)
    if sch in ("", "file"):
        return _LOCAL
    if sch == "memory":
        return _MEMORY
    if sch in _REGISTRY:
        return _REGISTRY[sch](path)
    # cache per scheme+bucket (S3FileSystem.from_uri is region-aware)
    authority = path[len(sch) + 3:].split("/", 1)[0]
    key = f"{sch}://{authority}"
    if key not in _ARROW_CACHE:
        _ARROW_CACHE[key] = ArrowFileIO(path)
    return _ARROW_CACHE[key]


def to_spark_paths(paths: Iterable[str]) -> list[str]:
    """Translate a batch of file paths into their Spark/JVM-readable
    form (``s3://`` → ``s3a://``; local and already-readable schemes
    pass through)."""
    return [resolve_io(p).to_spark_path(p) for p in paths]


