"""Span queries: position-aware matching (c/src/q_span.c:425-1862).

Span evaluation is array-first: a span source yields (docs_rep, starts,
ends) arrays sorted by (doc, start, end); term spans come straight from
the one-pass vectorized position decode.  The stateful compositions
(span_not exclusion, ordered/unordered span_near) run the reference's
enum algorithms per candidate doc — candidates are first narrowed by
doc-set intersection, so the Python loops only touch matching docs.

Scoring (spansc_score/spansc_next, q_span.c:205-240):
    freq(doc) = Σ over matched spans 1/(end - start + 1)   [sloppy_freq]
    score     = sqrt(freq) * value * norm[doc]
    idf       = Σ idf(term) over the query's terms (spanw_new)
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import numpy as np

from .query import Query

F32 = np.float32


class SpanQuery(Query):
    pass


@dataclass
class SpanTermQuery(SpanQuery):
    field: str
    term: str
    boost: float = 1.0

    def terms(self):
        return [self.term]


@dataclass
class SpanMultiTermQuery(SpanQuery):
    """OR over terms, single combined enum (spanmtq)."""

    field: str
    term_list: list[str] = dc_field(default_factory=list)
    boost: float = 1.0

    def add_term(self, term: str) -> "SpanMultiTermQuery":
        self.term_list.append(term)
        return self

    def terms(self):
        return list(self.term_list)


@dataclass
class SpanPrefixQuery(SpanQuery):
    field: str
    prefix: str
    max_terms: int = 256
    boost: float = 1.0


@dataclass
class SpanFirstQuery(SpanQuery):
    """Spans of ``match`` ending at or before ``end`` (spanfq)."""

    match: SpanQuery
    end: int
    boost: float = 1.0

    @property
    def field(self):
        return self.match.field


@dataclass
class SpanOrQuery(SpanQuery):
    clauses: list[SpanQuery] = dc_field(default_factory=list)
    boost: float = 1.0

    def add(self, q: SpanQuery) -> "SpanOrQuery":
        self.clauses.append(q)
        return self

    @property
    def field(self):
        return self.clauses[0].field if self.clauses else None


@dataclass
class SpanNotQuery(SpanQuery):
    """Spans of ``inc`` that do not overlap any span of ``exc``
    (spanxe_next)."""

    inc: SpanQuery
    exc: SpanQuery
    boost: float = 1.0

    @property
    def field(self):
        return self.inc.field


@dataclass
class SpanNearQuery(SpanQuery):
    clauses: list[SpanQuery] = dc_field(default_factory=list)
    slop: int = 0
    in_order: bool = False
    boost: float = 1.0

    def add(self, q: SpanQuery) -> "SpanNearQuery":
        self.clauses.append(q)
        return self

    @property
    def field(self):
        return self.clauses[0].field if self.clauses else None


# --------------------------------------------------------------------------
# evaluation
# --------------------------------------------------------------------------

_EMPTY = (
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
)


def span_terms(q: SpanQuery, reader) -> list[str]:
    """Terms for the span weight's idf sum (SpQ->get_terms), tree order."""
    if isinstance(q, SpanTermQuery):
        return [q.term]
    if isinstance(q, SpanMultiTermQuery):
        return list(q.term_list)
    if isinstance(q, SpanPrefixQuery):
        from .searcher import _twp

        return _twp(reader, q.field, q.prefix)[: q.max_terms]
    if isinstance(q, SpanFirstQuery):
        return span_terms(q.match, reader)
    if isinstance(q, (SpanOrQuery, SpanNearQuery)):
        out: list[str] = []
        for c in q.clauses:
            for t in span_terms(c, reader):
                if t not in out:
                    out.append(t)
        return out
    if isinstance(q, SpanNotQuery):
        return span_terms(q.inc, reader)  # spanxq_extract_terms: inc only
    raise TypeError(type(q).__name__)


def _sort_spans(docs, starts, ends):
    order = np.lexsort((ends, starts, docs))
    return docs[order], starts[order], ends[order]


def _term_spans(reader, fld: str, term: str):
    p = reader.postings(fld, term)
    if p is None:
        return _EMPTY
    pos, _ = p.positions_flat()
    docs_rep = np.repeat(p.docs, p.freqs)
    return docs_rep, pos, pos + 1


def spans_of(q: SpanQuery, reader):
    """(docs_rep, starts, ends) sorted by (doc, start, end)."""
    if isinstance(q, SpanTermQuery):
        if reader.field_num(q.field) < 0:
            return _EMPTY
        return _term_spans(reader, q.field, q.term)
    if isinstance(q, SpanMultiTermQuery):
        if reader.field_num(q.field) < 0 or not q.term_list:
            return _EMPTY
        parts = [_term_spans(reader, q.field, t) for t in q.term_list]
        return _sort_spans(
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
        )
    if isinstance(q, SpanPrefixQuery):
        from .searcher import _twp

        mt = SpanMultiTermQuery(
            q.field,
            _twp(reader, q.field, q.prefix)[: q.max_terms],
        )
        return spans_of(mt, reader)
    if isinstance(q, SpanFirstQuery):
        docs, starts, ends = spans_of(q.match, reader)
        keep = ends <= q.end
        return docs[keep], starts[keep], ends[keep]
    if isinstance(q, SpanOrQuery):
        if not q.clauses:
            return _EMPTY
        parts = [spans_of(c, reader) for c in q.clauses]
        return _sort_spans(
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
        )
    if isinstance(q, SpanNotQuery):
        return _spans_not(q, reader)
    if isinstance(q, SpanNearQuery):
        return _spans_near(q, reader)
    raise TypeError(type(q).__name__)


def _per_doc(docs, starts, ends):
    """Split sorted span arrays into {doc: [(start, end), ...]}."""
    out: dict[int, list[tuple[int, int]]] = {}
    if not docs.size:
        return out
    bounds = np.flatnonzero(np.diff(docs)) + 1
    starts_l = starts.tolist()
    ends_l = ends.tolist()
    prev = 0
    for b in list(bounds) + [docs.size]:
        out[int(docs[prev])] = list(
            zip(starts_l[prev:b], ends_l[prev:b])
        )
        prev = b
    return out


def _from_per_doc(matches: dict[int, list[tuple[int, int]]]):
    docs_l, starts_l, ends_l = [], [], []
    for d in sorted(matches):
        for s, e in matches[d]:
            docs_l.append(d)
            starts_l.append(s)
            ends_l.append(e)
    return (
        np.asarray(docs_l, dtype=np.int64),
        np.asarray(starts_l, dtype=np.int64),
        np.asarray(ends_l, dtype=np.int64),
    )


def _spans_not(q: SpanNotQuery, reader):
    inc = _per_doc(*spans_of(q.inc, reader))
    exc = _per_doc(*spans_of(q.exc, reader))
    out: dict[int, list[tuple[int, int]]] = {}
    for d, spans in inc.items():
        ex = exc.get(d)
        if not ex:
            out[d] = spans
            continue
        kept = [
            (s, e) for s, e in spans
            if not any(xs < e and s < xe for xs, xe in ex)
        ]
        if kept:
            out[d] = kept
    return _from_per_doc(out)


def _spans_near(q: SpanNearQuery, reader):
    if not q.clauses:
        return _EMPTY
    clause_spans = [_per_doc(*spans_of(c, reader)) for c in q.clauses]
    cand = set(clause_spans[0])
    for cs in clause_spans[1:]:
        cand &= set(cs)
    out: dict[int, list[tuple[int, int]]] = {}
    for d in sorted(cand):
        sl = [cs[d] for cs in clause_spans]
        matches = (
            _near_ordered(sl, q.slop) if q.in_order
            else _near_unordered(sl, q.slop)
        )
        if matches:
            out[d] = matches
    return _from_per_doc(out)


def _near_unordered(spans: list[list[tuple[int, int]]], slop: int):
    """sne_next_unordered_match (q_span.c): repeatedly advance the
    minimum-start clause."""
    idx = [0] * len(spans)
    matches = []
    while True:
        max_end = 0
        min_start = None
        lengths_sum = 0
        min_i = 0
        for i, sp in enumerate(spans):
            s, e = sp[idx[i]]
            if e > max_end:
                max_end = e
            if min_start is None or s < min_start:
                min_start = s
                min_i = i
            lengths_sum += e - s
        if (max_end - min_start - lengths_sum) <= slop:
            matches.append((min_start, max_end))
        idx[min_i] += 1
        if idx[min_i] >= len(spans[min_i]):
            return matches


def _near_ordered(spans: list[list[tuple[int, int]]], slop: int):
    """sne_next_ordered_match (q_span.c): clauses must appear in order."""
    n = len(spans)
    idx = [0] * n
    matches = []
    while idx[0] < len(spans[0]):
        prev_start, prev_end = spans[0][idx[0]]
        sne_start = prev_start
        lengths_sum = prev_end - prev_start
        i = 1
        complete = True
        while i < n:
            sp = spans[i]
            while idx[i] < len(sp) and (
                sp[idx[i]][0] < prev_start
                or (sp[idx[i]][0] == prev_start and sp[idx[i]][1] < prev_end)
            ):
                idx[i] += 1
            if idx[i] >= len(sp):
                return matches
            start, end = sp[idx[i]]
            lengths_sum += end - start
            prev_start, prev_end = start, end
            i += 1
        if complete:
            if (prev_end - sne_start - lengths_sum) <= slop:
                matches.append((sne_start, prev_end))
            idx[0] += 1
    return matches
