"""Batch query serving: Ray Data + a stateful searcher actor pool.

The distributed read path (SURVEY.md §3.2, MultiSearcher semantics
c/src/search.c:1290-1750): a Dataset of query strings is evaluated by
``map_batches(SearcherActor, concurrency=N)`` — each actor opens the index
ONCE in ``__init__`` (manifest + lazily mmap-style shard dictionaries,
"model load" pattern) and scores whole batches of queries vectorized.

Global stats (N, df) come from the manifest + term-sharded dictionary, so
scores are shard-count-invariant by construction, like the reference's
CachedDFSearcher (c/src/search.c:1290-1440).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def open_reader(index_dir: str):
    """Open a plain index dir OR an IncrementalIndex (LSM) root.

    An LSM root is recognized by its ``gens.json``; it opens read-only
    as a MultiReader over the current delta set — serving never needed
    the writer object."""
    from ..search.reader import IndexReader
    from ..state.fs import fs_exists, join as fs_join, resolve_fs

    fs, root = resolve_fs(index_dir)
    if fs_exists(fs, fs_join(root, "gens.json")):
        from ..search.multi import MultiReader
        from ..state.manifest import read_json

        state = read_json(fs_join(index_dir, "gens.json"))
        dirs = [fs_join(index_dir, d) for d in state["deltas"]]
        if len(dirs) == 1:
            return IndexReader(dirs[0])
        return MultiReader([IndexReader(d) for d in dirs])
    return IndexReader(index_dir)


class SearcherActor:
    """map_batches UDF class: one IndexReader per actor process."""

    def __init__(
        self,
        index_dir: str,
        default_field: str = "content",
        k: int = 10,
        similarity: str | None = None,
        warm: bool = True,
    ):
        from ..analysis import standard_analyzer
        from ..search.fql import FQLParser
        from ..search.searcher import Searcher

        self.reader = open_reader(index_dir)
        self.searcher = Searcher(self.reader, similarity=similarity)
        if warm:
            # "model load" once per actor: open every shard dictionary in
            # parallel so first queries don't pay cold-start
            from concurrent.futures import ThreadPoolExecutor

            subs = getattr(self.reader, "readers", [self.reader])
            with ThreadPoolExecutor(max_workers=8) as tp:
                for r in subs:
                    list(tp.map(r._shard_for, r._shard_salts))
        self.k = k
        self.parser = FQLParser(analyzer=standard_analyzer())
        for f in self.reader.field_names:
            if self.reader.is_indexed(f):
                self.parser.add_field(
                    f, default=(f == default_field), tokenized=True
                )

    def __call__(self, batch: dict[str, np.ndarray]) -> dict[str, list]:
        out: dict[str, list] = {
            "query": [], "rank": [], "doc_id": [], "score": [],
            "total_hits": [],
        }
        for qstr in batch["query"]:
            q = self.parser.parse(str(qstr))
            if q is None:
                continue
            td = self.searcher.search(q, 0, self.k)
            for rank, hit in enumerate(td.hits):
                out["query"].append(str(qstr))
                out["rank"].append(rank)
                out["doc_id"].append(hit.doc)
                out["score"].append(hit.score)
                out["total_hits"].append(td.total_hits)
        return out


def search_batch(
    index_dir: str,
    queries: list[str],
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 64,
    default_field: str = "content",
    similarity: str | None = None,
    warm: bool = True,
):
    """Evaluate many queries against an index; returns a Ray Dataset of
    (query, rank, doc_id, score, total_hits).

    ``warm=True`` (default) opens every shard dictionary in parallel at
    actor init — right for pools that serve enough queries to touch all
    shards.  ``warm=False`` defers each shard open to first use: better
    for a small one-shot batch over a huge index (it reads only the
    queried terms' shards); measured neutral at 2M docs / 112 queries,
    slightly slower at 200k (lazy opens serialize into the query path)."""
    import ray.data

    # enough blocks that every actor in the pool gets work even for a
    # modest query list (a 112-query batch at batch_size=64 would form
    # only 2 blocks and leave the rest of the pool idle), small enough
    # that task dispatch + actor ramp-up stay amortized (4 per actor:
    # the skew-balance win at 2M docs, +33% batch throughput, outweighs
    # the extra actor spin-up it costs a small one-shot batch)
    n_blocks = max(1, min(len(queries), concurrency * 4))
    bs = min(batch_size, max(1, -(-len(queries) // n_blocks)))
    ds = ray.data.from_items(
        [{"query": q} for q in queries], override_num_blocks=n_blocks
    )
    return ds.map_batches(
        SearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "default_field": default_field,
            "k": k,
            "similarity": similarity,
            "warm": warm,
        },
        batch_size=bs,
        concurrency=(1, concurrency),
    )
