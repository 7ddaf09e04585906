"""Deterministic fragment listing for Parquet inputs.

The build assigns global docids as a pure function of (fragment, row):
fragments are parquet row-groups enumerated in sorted (file, row_group)
order, each with a cumulative ``doc_base``; docid = doc_base + row index.
This makes retries, resumes, and different parallelism levels produce
byte-identical indexes (the reference's ordering guarantee — doc ids are
assignment-ordered, merges preserve (segment base, ordinal) order,
c/src/index.c:5950 — without its single-writer mutex).

Only footers are read here (cheap driver-side metadata pass); the row data
is read inside the distributed invert tasks with column pruning.
"""

from __future__ import annotations

import hashlib
import json
import os
import posixpath
from typing import Any

import pyarrow.parquet as pq
from pyarrow import fs as pafs

from ..state.fs import open_parquet, resolve_fs


def list_fragments(
    input_paths: str | list[str],
) -> tuple[list[dict[str, Any]], str]:
    """Return (fragments, input_fingerprint).

    Each fragment: {frag_id, path, row_group, num_rows, doc_base}.
    The fingerprint hashes the (path, file_bytes, row_group, num_rows)
    inventory — identical inputs => identical fingerprint => resumable
    checkpoints; a regenerated file with the same shape but different
    bytes almost always changes size and therefore the fingerprint.
    """
    if isinstance(input_paths, str):
        input_paths = [input_paths]
    files: list[str] = []
    for p in input_paths:
        fs, inner = resolve_fs(p)
        info = fs.get_file_info(inner)
        if info.type == pafs.FileType.Directory:
            sel = pafs.FileSelector(inner, recursive=True)
            scheme = p.split("://", 1)[0] + "://" if "://" in p else ""
            files.extend(
                scheme + fi.path
                for fi in fs.get_file_info(sel)
                if fi.path.endswith(".parquet")
            )
        else:
            files.append(p)
    files.sort()
    rg_rows = _footer_rg_rows(files)
    fragments: list[dict[str, Any]] = []
    doc_base = 0
    frag_id = 0
    for path in files:
        for rg, num_rows in enumerate(rg_rows[path][1]):
            fragments.append(
                {
                    "frag_id": frag_id,
                    "path": path,
                    "row_group": rg,
                    "num_rows": num_rows,
                    "doc_base": doc_base,
                }
            )
            doc_base += num_rows
            frag_id += 1
    h = hashlib.sha256(
        json.dumps(
            [
                (
                    os.path.basename(f["path"]),
                    rg_rows[f["path"]][0],
                    f["row_group"],
                    f["num_rows"],
                )
                for f in fragments
            ]
        ).encode()
    ).hexdigest()[:16]
    return fragments, h


# above this many input files, footer metadata is fetched by Ray tasks
# (chunked) instead of a serial driver loop — at 10^9+ files the driver
# pass would otherwise dominate the build; output is identical (the
# assembly below walks files in sorted order either way)
_DISTRIBUTED_FOOTER_THRESHOLD = 64


def _rg_rows_of(path: str) -> tuple[int, list[int]]:
    """(file size in bytes, per-row-group row counts)."""
    fs, inner = resolve_fs(path)
    size = int(fs.get_file_info(inner).size or 0)
    meta = open_parquet(fs, inner).metadata
    return size, [
        meta.row_group(i).num_rows for i in range(meta.num_row_groups)
    ]


def _footer_rg_rows(files: list[str]) -> dict[str, tuple[int, list[int]]]:
    """Per-file row-group row counts; distributed when the file count is
    large and a Ray session exists."""
    import ray

    if (
        len(files) <= _DISTRIBUTED_FOOTER_THRESHOLD
        or not ray.is_initialized()
    ):
        return {p: _rg_rows_of(p) for p in files}

    @ray.remote
    def _chunk(paths: list[str]) -> dict:
        return {p: _rg_rows_of(p) for p in paths}

    chunk = 64
    refs = [
        _chunk.remote(files[a: a + chunk])
        for a in range(0, len(files), chunk)
    ]
    out: dict[str, list[int]] = {}
    for d in ray.get(refs):
        out.update(d)
    return out


def read_fragment(frag: dict[str, Any], columns: list[str] | None):
    """Read one row-group with column pruning (runs inside a Ray task)."""
    fs, inner = resolve_fs(frag["path"])
    pf = open_parquet(fs, inner)
    return pf.read_row_group(int(frag["row_group"]), columns=columns)
