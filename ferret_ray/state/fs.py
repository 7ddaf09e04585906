"""Filesystem abstraction for index storage (pyarrow.fs / fsspec URIs).

Every index I/O path (segments, shards, docs, checkpoints, manifest)
resolves its filesystem from the path's URI scheme, so the same build
and serve code runs against local disk (plain paths or ``file://``),
object stores (``s3://`` and friends via ``pyarrow.fs.from_uri``), or
any fsspec filesystem (``memory://`` in tests) — the multi-node
requirement: a real cluster's invert tasks and merge tasks exchange
bucket files through shared storage, and scorer actors open shards from
it.  The reference's Store vtable (c/include/store.h:163-322) plays the
same role; we get the implementations for free from pyarrow.

FileSystem handles pickle (LocalFileSystem/S3 natively; fsspec via the
PyFileSystem wrapper), so resolver results can live inside Ray task
closures.  Note fsspec's ``memory://`` is process-local — fine for
single-process reader tests, not for cross-worker exchange.
"""

from __future__ import annotations

import json
import os
import posixpath
import tempfile
from typing import Any

from pyarrow import fs as pafs


def resolve_fs(path: str) -> tuple[pafs.FileSystem, str]:
    """(filesystem, path-within-filesystem) for a path or URI."""
    p = str(path)
    if "://" in p:
        try:
            return pafs.FileSystem.from_uri(p)
        except Exception:
            import fsspec

            scheme, rest = p.split("://", 1)
            f = fsspec.filesystem(scheme)
            return pafs.PyFileSystem(pafs.FSSpecHandler(f)), rest
    return pafs.LocalFileSystem(), p


def is_local(fs: pafs.FileSystem) -> bool:
    return isinstance(fs, pafs.LocalFileSystem)


def join(*parts: str) -> str:
    return posixpath.join(*parts)


def fs_makedirs(fs: pafs.FileSystem, path: str) -> None:
    fs.create_dir(path, recursive=True)


def fs_exists(fs: pafs.FileSystem, path: str) -> bool:
    return fs.get_file_info(path).type != pafs.FileType.NotFound


def fs_listdir(fs: pafs.FileSystem, path: str) -> list[str]:
    """Base names of entries directly under ``path`` ([] if absent)."""
    sel = pafs.FileSelector(path, allow_not_found=True, recursive=False)
    return sorted(
        posixpath.basename(info.path.rstrip("/"))
        for info in fs.get_file_info(sel)
    )


def fs_read_bytes(fs: pafs.FileSystem, path: str) -> bytes:
    with fs.open_input_stream(path) as f:
        return f.read()


def fs_write_bytes(fs: pafs.FileSystem, path: str, data: bytes) -> None:
    parent = posixpath.dirname(path)
    if parent:
        fs.create_dir(parent, recursive=True)
    with fs.open_output_stream(path) as f:
        f.write(data)


def fs_read_json(fs: pafs.FileSystem, path: str) -> Any | None:
    try:
        return json.loads(fs_read_bytes(fs, path))
    except (FileNotFoundError, OSError, json.JSONDecodeError):
        return None


def fs_write_json_atomic(fs: pafs.FileSystem, path: str, obj: Any) -> None:
    """Atomic-commit JSON write.

    Local: tempfile + os.replace (the reference's segments_N rename).
    Object stores / fsspec: a single-stream PUT, which object stores
    make atomic at the object level."""
    payload = json.dumps(obj, sort_keys=True, separators=(",", ":"))
    if is_local(fs):
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(payload)
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
    else:
        fs_write_bytes(fs, path, payload.encode())


def fs_file_size(fs: pafs.FileSystem, path: str) -> int:
    info = fs.get_file_info(path)
    return int(info.size or 0)


def fs_rmtree(fs: pafs.FileSystem, path: str) -> None:
    try:
        fs.delete_dir(path)
    except (FileNotFoundError, OSError):
        pass


def fs_delete_file(fs: pafs.FileSystem, path: str) -> None:
    try:
        fs.delete_file(path)
    except (FileNotFoundError, OSError):
        pass


def open_parquet(fs: pafs.FileSystem, path: str):
    """pq.ParquetFile over any filesystem (range-read capable).

    ``pre_buffer=True`` coalesces the column-chunk ranges of a
    read_row_groups call into batched async reads — measured 11x on a
    cold 1,280-file expansion pattern on this host's virtio disk (15.0s
    -> 1.3s for the same 14MB), and it is the right default for object
    stores too (fewer, larger range requests)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(fs.open_input_file(path), pre_buffer=True)
