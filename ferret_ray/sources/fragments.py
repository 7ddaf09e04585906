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
    The fingerprint hashes the (path, row_group, num_rows) inventory —
    identical inputs => identical fingerprint => resumable checkpoints.
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
    fragments: list[dict[str, Any]] = []
    doc_base = 0
    frag_id = 0
    for path in files:
        fs, inner = resolve_fs(path)
        meta = open_parquet(fs, inner).metadata
        for rg in range(meta.num_row_groups):
            num_rows = meta.row_group(rg).num_rows
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
                (os.path.basename(f["path"]), f["row_group"], f["num_rows"])
                for f in fragments
            ]
        ).encode()
    ).hexdigest()[:16]
    return fragments, h


def read_fragment(frag: dict[str, Any], columns: list[str] | None):
    """Read one row-group with column pruning (runs inside a Ray task)."""
    fs, inner = resolve_fs(frag["path"])
    pf = open_parquet(fs, inner)
    return pf.read_row_group(int(frag["row_group"]), columns=columns)
