"""Filesystem abstraction: local paths AND pyarrow FileSystem URIs.

The engine's durable artifacts (checkpoint manifests, rank-vector segments,
edge-shard markers) must land wherever the store root points — a local/shared
path in tests, an object store (``s3://``, ``gs://``, ``hdfs://``) on a real
cluster. Rather than sprinkle ``"://" in path`` branches per call site, every
small-file IO goes through these helpers:

* plain paths use ``os``/``open`` directly (zero overhead, atomic
  ``os.replace`` renames);
* URIs resolve once per (scheme, netloc) to a cached
  ``pyarrow.fs.FileSystem`` — writes are single-object PUTs (atomic per
  object on stores that matter), renames degrade to copy+delete only where a
  true rename doesn't exist.

Large/columnar artifacts (parquet state, edge shards) are written by Spark
and read via ``pyarrow.parquet`` with an explicit ``filesystem=`` — those
call sites share :func:`fs_and_path`.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

__all__ = [
    "is_uri",
    "fs_and_path",
    "exists",
    "makedirs",
    "write_bytes",
    "read_bytes",
    "write_json_atomic",
    "read_json",
    "touch",
    "listdir",
    "rmtree",
]

# keyed by (scheme, netloc): two buckets / namenodes / regions must never
# share a client. Value is (FileSystem, strip_len): fs_path for any sibling
# URI under the same authority is path[strip_len:] — derived by string
# slicing, so the expensive FileSystem.from_uri runs ONCE per authority,
# not once per call (this sits on the hot path of every worker-task
# exists/read/write and every superstep commit).
_FS_CACHE: dict[tuple[str, str], tuple[Any, int]] = {}


def is_uri(path: str) -> bool:
    return "://" in path


def _authority(path: str) -> tuple[str, str]:
    scheme, rest = path.split("://", 1)
    return scheme, rest.split("/", 1)[0]


def fs_and_path(path: str):
    """``(FileSystem, fs_path)`` for a URI; ``(None, path)`` for a local path.

    The FileSystem instance is cached per ``(scheme, netloc)`` — pyarrow
    S3/GCS/HDFS clients are expensive to construct and safe to share, but
    only within one authority (bucket / namenode).
    """
    if not is_uri(path):
        return None, path
    from pyarrow import fs as pafs

    key = _authority(path)
    cached = _FS_CACHE.get(key)
    if cached is None:
        fs, fs_path = pafs.FileSystem.from_uri(path)
        # pyarrow's fs_path is a suffix of the URI (e.g. s3://b/k -> "b/k",
        # hdfs://h:p/k -> "/k"); record how many leading chars the authority
        # prefix occupies so siblings resolve with a slice, not a client build
        if fs_path and path.endswith(fs_path):
            strip_len = len(path) - len(fs_path)
        else:  # defensive: root URIs / normalization edge cases
            strip_len = -1
        cached = (fs, strip_len)
        _FS_CACHE[key] = cached
        return fs, fs_path
    fs, strip_len = cached
    if strip_len >= 0:
        return fs, path[strip_len:]
    return fs, pafs.FileSystem.from_uri(path)[1]


def exists(path: str) -> bool:
    fs, p = fs_and_path(path)
    if fs is None:
        return os.path.exists(p)
    from pyarrow import fs as pafs

    return fs.get_file_info(p).type != pafs.FileType.NotFound


def makedirs(path: str) -> None:
    fs, p = fs_and_path(path)
    if fs is None:
        os.makedirs(p, exist_ok=True)
    else:
        fs.create_dir(p, recursive=True)


# object stores where a completed PUT is atomic (readers never observe a
# partial object); everything else (hdfs, file-routed-through-pyarrow, mock)
# exposes bytes as they stream, so those get tmp-name + move semantics
_ATOMIC_PUT_FS = {"s3", "gcs", "gs"}


def write_bytes(path: str, data: bytes) -> None:
    """Atomic-visibility write: readers see the old object or the full new one.

    Local paths: tmp + ``os.replace``. Object stores (s3/gs): single PUT —
    atomic per object. Other pyarrow filesystems (hdfs://, file://): a
    streaming ``open_output_stream`` exposes partial bytes mid-write, which
    would break the "manifest is the commit point" invariant checkpoint
    finalize relies on — so write a tmp name and ``fs.move`` into place
    (rename is atomic on hdfs and POSIX).
    """
    fs, p = fs_and_path(path)
    if fs is None:
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = f"{p}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)
    else:
        fs.create_dir(os.path.dirname(p), recursive=True)
        if fs.type_name in _ATOMIC_PUT_FS:
            with fs.open_output_stream(p) as f:
                f.write(data)
        else:
            tmp = f"{p}.tmp-{os.getpid()}"
            with fs.open_output_stream(tmp) as f:
                f.write(data)
            fs.move(tmp, p)


def read_bytes(path: str) -> bytes | None:
    fs, p = fs_and_path(path)
    if fs is None:
        if not os.path.exists(p):
            return None
        with open(p, "rb") as f:
            return f.read()
    from pyarrow import fs as pafs

    if fs.get_file_info(p).type == pafs.FileType.NotFound:
        return None
    with fs.open_input_stream(p) as f:
        return f.read()


def write_json_atomic(path: str, obj: Any) -> None:
    write_bytes(path, json.dumps(obj).encode())


def read_json(path: str) -> Any | None:
    data = read_bytes(path)
    return None if data is None else json.loads(data)


def touch(path: str) -> None:
    write_bytes(path, b"")


def listdir(path: str) -> list[str]:
    """Immediate child names (not full paths); [] when the dir is absent."""
    fs, p = fs_and_path(path)
    if fs is None:
        return os.listdir(p) if os.path.isdir(p) else []
    from pyarrow import fs as pafs

    info = fs.get_file_info(p)
    if info.type == pafs.FileType.NotFound:
        return []
    sel = pafs.FileSelector(p, recursive=False, allow_not_found=True)
    return [os.path.basename(i.path.rstrip("/")) for i in fs.get_file_info(sel)]


def rmtree(path: str) -> None:
    fs, p = fs_and_path(path)
    if fs is None:
        shutil.rmtree(p, ignore_errors=True)
        return
    from pyarrow import fs as pafs

    if fs.get_file_info(p).type != pafs.FileType.NotFound:
        fs.delete_dir(p)
