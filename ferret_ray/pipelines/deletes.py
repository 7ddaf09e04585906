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


def _next_gen(ddir: str) -> int:
    if not os.path.isdir(ddir):
        return 0
    gens = [
        int(n.split("-")[1].split(".")[0])
        for n in os.listdir(ddir)
        if n.startswith("gen-") and n.endswith(".json")
    ]
    return max(gens) + 1 if gens else 0


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone explicit docids; returns count written."""
    from ..state.manifest import atomic_write_json

    ids = sorted({int(d) for d in doc_ids})
    if not ids:
        return 0
    ddir = os.path.join(index_dir, "deletes")
    atomic_write_json(
        os.path.join(ddir, f"gen-{_next_gen(ddir)}.json"), {"docs": ids}
    )
    return len(ids)


def delete_by_term(index_dir: str, field: str, term: str) -> int:
    """iw_delete_term: tombstone every doc whose ``field`` contains
    ``term``."""
    from ..search.reader import IndexReader

    reader = IndexReader(index_dir)
    p = reader.postings(field, term)
    if p is None:
        return 0
    return delete_docs(index_dir, p.docs.tolist())


def load_deleted(index_dir: str) -> set[int]:
    ddir = os.path.join(index_dir, "deletes")
    out: set[int] = set()
    if not os.path.isdir(ddir):
        return out
    for n in sorted(os.listdir(ddir)):
        if n.startswith("gen-") and n.endswith(".json"):
            with open(os.path.join(ddir, n)) as f:
                out.update(json.load(f)["docs"])
    return out
