"""Block-max WAND top-k for disjunctive term queries.

The north-star serving feature the reference lacks (it prunes only via its
heap threshold, c/src/search.c:1078-1093): document-at-a-time WAND
[Broder et al., CIKM'03] with the block-max refinement [Ding & Suel,
SIGIR'11] over the per-16-doc ``block_max_tf`` metadata written at merge
time (stages/merge.py).

Correctness contract: identical top-k (docs, scores, order incl. doc-id
tie-break) to the exhaustive vectorized scorer — asserted by tests — while
skipping the scoring of documents/blocks whose upper bound cannot beat the
running threshold.  ``WandResult.stats`` reports how much work was pruned.
"""

from __future__ import annotations

import heapq
from typing import NamedTuple

import numpy as np

from ..codec.norms import NORM_TABLE
from ..codec.postings import SKIP_INTERVAL
from ..codec.vint import vint_decode
from .similarity import idf as sim_idf, query_norm

F32 = np.float32


class WandResult(NamedTuple):
    hits: list[tuple[int, float]]   # (doc, score) ranked
    total_candidates: int
    stats: dict


class _TermCursor:
    __slots__ = ("term", "docs", "scores", "idx", "n", "max_score",
                 "block_last", "block_max")

    def __init__(self, term, docs, scores, block_last, block_max):
        self.term = term
        self.docs = docs
        self.scores = scores
        self.idx = 0
        self.n = docs.size
        self.max_score = float(scores.max()) if docs.size else 0.0
        self.block_last = block_last   # last doc id per block
        self.block_max = block_max     # max score bound per block

    @property
    def doc(self) -> int:
        return int(self.docs[self.idx]) if self.idx < self.n else 1 << 62

    def advance_to(self, target: int):
        self.idx = int(
            np.searchsorted(self.docs, target, side="left")
        ) if self.idx < self.n else self.n

    def next(self):
        self.idx += 1

    def block_bound(self, doc: int) -> float:
        b = int(np.searchsorted(self.block_last, doc, side="left"))
        if b >= self.block_max.size:
            return 0.0
        return float(self.block_max[b])


def wand_topk(searcher, field: str, terms: list[str], k: int = 10):
    """Top-k of the SHOULD-disjunction of ``terms`` (Ferret scoring minus
    the coord factor — i.e. a coord-disabled BooleanQuery of TermQueries,
    which is also the BM25-style setting WAND assumes)."""
    reader = searcher.reader
    n_docs = reader.max_doc()
    norms = reader.norms(field)
    norm_dec = NORM_TABLE[norms] if norms is not None else None

    # weights: same chain as a coord-disabled boolean of term queries
    idfs = [sim_idf(reader.doc_freq(field, t), n_docs) for t in terms]
    ssum = F32(0.0)
    for x in idfs:
        ssum = F32(ssum + F32(x * x))
    qnorm = query_norm(float(ssum))
    cursors: list[_TermCursor] = []
    scored_blocks = 0
    total_blocks = 0
    deleted = getattr(searcher, "_deleted", None)
    for t, idf_v in zip(terms, idfs):
        p = reader.postings(field, t)
        if p is None or norm_dec is None:
            continue
        value = F32(F32(idf_v * qnorm) * idf_v)
        tf = np.sqrt(p.freqs.astype(np.float64)).astype(np.float32)
        scores = ((tf * value) * norm_dec[p.docs]).astype(np.float32)
        p_docs = p.docs
        if deleted is not None:
            keep = ~np.isin(p_docs, deleted)
            p_docs, scores = p_docs[keep], scores[keep]
        p = type(p)(p_docs, p.freqs, p.prx_parts)  # doc/score views only
        nb = (p.docs.size + SKIP_INTERVAL - 1) // SKIP_INTERVAL
        pad = nb * SKIP_INTERVAL - p.docs.size
        spad = np.concatenate([scores, np.zeros(pad, np.float32)])
        block_max = spad.reshape(nb, SKIP_INTERVAL).max(axis=1)
        block_last = p.docs[
            np.minimum(
                np.arange(1, nb + 1) * SKIP_INTERVAL - 1, p.docs.size - 1
            )
        ]
        total_blocks += nb
        cursors.append(
            _TermCursor(t, p.docs, scores, block_last, block_max)
        )
    if not cursors:
        return WandResult([], 0, {"blocks": 0, "scored_blocks": 0,
                                  "docs_scored": 0})

    heap: list[tuple[float, int]] = []   # min-heap of (score, -doc)
    theta = 0.0
    docs_scored = 0
    candidates = 0

    while True:
        live = [c for c in cursors if c.idx < c.n]
        if not live:
            break
        live.sort(key=lambda c: c.doc)
        # find pivot: smallest prefix whose Σ max_score > theta
        acc = 0.0
        pivot_i = None
        for i, c in enumerate(live):
            acc += c.max_score
            if acc > theta or len(heap) < k:
                pivot_i = i
                break
        if pivot_i is None:
            break  # no doc can beat theta
        pivot_doc = live[pivot_i].doc
        if live[0].doc == pivot_doc:
            # block-max check: tighter bound at the pivot doc — must
            # include EVERY cursor currently at the pivot doc, not just
            # the pivot prefix
            bound = 0.0
            for c in live[: pivot_i + 1]:
                bound += c.block_bound(pivot_doc)
            for c in live[pivot_i + 1:]:
                if c.doc == pivot_doc:
                    bound += c.block_bound(pivot_doc)
            if len(heap) >= k and bound <= theta:
                # block-pruned: advance past this doc without scoring
                for c in live:
                    if c.doc == pivot_doc:
                        c.next()
                continue
            scored_blocks += 1
            s = F32(0.0)
            for c in cursors:
                if c.idx < c.n and c.doc == pivot_doc:
                    s = F32(s + c.scores[c.idx])
                    c.next()
            docs_scored += 1
            candidates += 1
            item = (float(s), -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
            if len(heap) >= k:
                theta = heap[0][0]
        else:
            # advance cursors before the pivot to the pivot doc
            for c in live[:pivot_i]:
                c.advance_to(pivot_doc)

    ranked = sorted(heap, key=lambda x: (-x[0], -x[1]))
    return WandResult(
        [(-d, s) for s, d in ranked],
        candidates,
        {
            "blocks": total_blocks,
            "scored_blocks": scored_blocks,
            "docs_scored": docs_scored,
        },
    )
