"""fsio: FileSystem client caching, path derivation, and write atomicity.

These guard the cluster-facing contract (reference stores artifacts per
run — SURVEY.md §2.1 S11): one pyarrow client per (scheme, netloc) —
never shared across buckets/namenodes, never re-constructed per call —
and writes whose partial state is never visible to a concurrent reader.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiktok_whisper_spark.sources import fsio  # noqa: E402


class _FakeFS:
    """Minimal pyarrow-FileSystem stand-in recording calls."""

    def __init__(self, type_name: str):
        self.type_name = type_name
        self.objects: dict[str, bytes] = {}
        self.moves: list[tuple[str, str]] = []

    def create_dir(self, path, recursive=False):
        pass

    class _Out:
        def __init__(self, fs, path):
            self.fs, self.path, self.buf = fs, path, b""

        def write(self, data):
            self.buf += data

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            self.fs.objects[self.path] = self.buf

    def open_output_stream(self, path):
        return self._Out(self, path)

    def move(self, src, dest):
        self.moves.append((src, dest))
        self.objects[dest] = self.objects.pop(src)


@pytest.fixture(autouse=True)
def _clear_cache():
    fsio._FS_CACHE.clear()
    yield
    fsio._FS_CACHE.clear()


def test_client_cached_per_authority_not_per_call(monkeypatch):
    """from_uri runs once per (scheme, netloc); siblings resolve by slicing.

    Round-3 regression: the cache keyed by scheme only, so s3://bucket-a and
    s3://bucket-b (different regions/credentials) silently shared one client,
    and fs_path was re-derived with a fresh from_uri on EVERY call."""
    calls: list[str] = []

    def fake_from_uri(uri):
        calls.append(uri)
        scheme = uri.split("://", 1)[0]
        if scheme in ("s3", "gs"):
            # pyarrow convention: bucket stays in the path
            return _FakeFS(scheme), uri.split("://", 1)[1]
        rest = uri.split("://", 1)[1]
        return _FakeFS(scheme), "/" + rest.split("/", 1)[1]

    import pyarrow.fs as pafs

    class _FakeFileSystem:  # pyarrow's class is immutable; patch the module ref
        from_uri = staticmethod(fake_from_uri)

    monkeypatch.setattr(pafs, "FileSystem", _FakeFileSystem)

    fs_a1, p_a1 = fsio.fs_and_path("s3://bucket-a/run/x.json")
    fs_a2, p_a2 = fsio.fs_and_path("s3://bucket-a/run/deeper/y.bin")
    fs_b, p_b = fsio.fs_and_path("s3://bucket-b/run/x.json")
    assert p_a1 == "bucket-a/run/x.json"
    assert p_a2 == "bucket-a/run/deeper/y.bin"
    assert p_b == "bucket-b/run/x.json"
    # one construction per authority — the second bucket-a path hit the cache
    assert calls == ["s3://bucket-a/run/x.json", "s3://bucket-b/run/x.json"]
    assert fs_a1 is fs_a2
    assert fs_a1 is not fs_b

    fs_h1, p_h1 = fsio.fs_and_path("hdfs://nn-1:8020/data/part-0")
    fs_h2, p_h2 = fsio.fs_and_path("hdfs://nn-2:8020/data/part-0")
    assert p_h1 == "/data/part-0" and p_h2 == "/data/part-0"
    assert fs_h1 is not fs_h2  # different namenodes never share a client
    # sibling on nn-1: sliced, not re-resolved
    n_calls = len(calls)
    _, p_h3 = fsio.fs_and_path("hdfs://nn-1:8020/data/part-1")
    assert p_h3 == "/data/part-1" and len(calls) == n_calls


def test_write_bytes_atomic_put_vs_tmp_move(monkeypatch):
    """s3/gs get a single PUT (atomic per object); hdfs/file-via-pyarrow get
    tmp-name + move so a concurrent reader never observes partial bytes."""

    def fake_from_uri(uri):
        scheme = uri.split("://", 1)[0]
        fs = _FakeFS({"s3": "s3", "hdfs": "hdfs"}[scheme])
        if scheme == "s3":
            return fs, uri.split("://", 1)[1]
        rest = uri.split("://", 1)[1]
        return fs, "/" + rest.split("/", 1)[1]

    import pyarrow.fs as pafs

    class _FakeFileSystem:  # pyarrow's class is immutable; patch the module ref
        from_uri = staticmethod(fake_from_uri)

    monkeypatch.setattr(pafs, "FileSystem", _FakeFileSystem)

    fsio.write_bytes("s3://bkt/dir/manifest.json", b"{}")
    fs_s3 = fsio._FS_CACHE[("s3", "bkt")][0]
    assert fs_s3.objects == {"bkt/dir/manifest.json": b"{}"}
    assert fs_s3.moves == []  # single PUT, no rename dance

    fsio.write_bytes("hdfs://nn:8020/dir/manifest.json", b"{}")
    fs_h = fsio._FS_CACHE[("hdfs", "nn:8020")][0]
    assert fs_h.objects == {"/dir/manifest.json": b"{}"}
    assert len(fs_h.moves) == 1  # streamed to a tmp name, renamed into place
    src, dest = fs_h.moves[0]
    assert src.startswith("/dir/manifest.json.tmp-") and dest == "/dir/manifest.json"


def test_local_paths_bypass_pyarrow(tmp_path):
    fs, p = fsio.fs_and_path(str(tmp_path / "x"))
    assert fs is None and p == str(tmp_path / "x")
    fsio.write_bytes(str(tmp_path / "d" / "x.json"), b"[1]")
    assert fsio.read_json(str(tmp_path / "d" / "x.json")) == [1]
    assert [f for f in os.listdir(tmp_path / "d") if ".tmp-" in f] == []
