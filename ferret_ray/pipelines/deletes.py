"""Deletions: tombstone sets applied at query time.

The reference marks deletions in per-segment ``.del`` bitvectors that
readers honor and merges later compact away (iw_delete_term,
c/src/index.c:6366-6437).  Our Ray-native equivalent: an append-only
``deletes/gen-*.json`` tombstone list next to the index; readers union all
generations into a docid set that every scorer path filters through; a
rebuild (the one-shot global merge) naturally compacts them away.
"""

from __future__ import annotations

import json
import os

from ..state.fs import fs_listdir, fs_read_json, join as fs_join, resolve_fs


def _next_gen(fs, ddir: str) -> int:
    gens = [
        int(n.split("-")[1].split(".")[0])
        for n in fs_listdir(fs, ddir)
        if n.startswith("gen-") and n.endswith(".json")
    ]
    return max(gens) + 1 if gens else 0


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone explicit docids; returns count written."""
    from ..state.manifest import atomic_write_json

    ids = sorted({int(d) for d in doc_ids})
    if not ids:
        return 0
    fs, root = resolve_fs(index_dir)
    ddir = fs_join(root, "deletes")
    atomic_write_json(
        fs_join(index_dir, "deletes", f"gen-{_next_gen(fs, ddir)}.json"),
        {"docs": ids},
    )
    return len(ids)


def delete_by_term(index_dir: str, field: str, term: str) -> int:
    """iw_delete_term: tombstone every doc whose ``field`` contains
    ``term``."""
    return delete_by_terms(index_dir, field, [term])


def delete_by_terms(index_dir: str, field: str, terms: list[str]) -> int:
    """Batch iw_delete_term: one bulk dictionary merge-join for all
    terms (reader.postings_many), one tombstone generation."""
    from ..search.reader import IndexReader

    reader = IndexReader(index_dir)
    pmap = reader.postings_many(field, list(terms))
    ids: set[int] = set()
    for p in pmap.values():
        ids.update(int(d) for d in p.docs)
    return delete_docs(index_dir, ids)


def clear_deletes(index_dir: str) -> int:
    """undelete_all (ir_undelete_all, c/src/index.c): drop every
    tombstone generation; returns count removed."""
    fs, root = resolve_fs(index_dir)
    ddir = fs_join(root, "deletes")
    n = 0
    for name in fs_listdir(fs, ddir):
        if name.startswith("gen-") and name.endswith(".json"):
            fs.delete_file(fs_join(ddir, name))
            n += 1
    return n


def load_deleted(index_dir: str) -> set[int]:
    fs, root = resolve_fs(index_dir)
    ddir = fs_join(root, "deletes")
    out: set[int] = set()
    for n in fs_listdir(fs, ddir):
        if n.startswith("gen-") and n.endswith(".json"):
            rec = fs_read_json(fs, fs_join(ddir, n))
            if rec:
                out.update(rec["docs"])
    return out
