"""Filters: named docid-set producers with per-searcher caching
(c/src/filter.c:24-57, c/include/search.h:106-124).

A Filter produces the matching docid set for an index; searchers cache the
set keyed by the filter's canonical string (the reference caches bitvectors
per reader keyed by filter hash).  PostFilter is a user callback
``(doc, score) -> factor`` applied before the top-k heap
(c/include/search.h:763-769)."""

from __future__ import annotations

import numpy as np

from .query import Query, RangeQuery


class Filter:
    def to_s(self) -> str:
        raise NotImplementedError

    def get_docs(self, searcher) -> np.ndarray:
        raise NotImplementedError

    def __repr__(self):
        return self.to_s()


class RangeFilter(Filter):
    """Lexicographic term-range docid set (c/src/q_range.c:230-280)."""

    def __init__(self, field, lower=None, upper=None,
                 include_lower=False, include_upper=False):
        self.range = RangeQuery(
            field, lower, upper,
            include_lower if lower is not None else False,
            include_upper if upper is not None else False,
        )

    def to_s(self) -> str:
        r = self.range
        if r.lower is not None and r.upper is not None:
            s = ("[" if r.include_lower else "{") + f"{r.lower} {r.upper}" \
                + ("]" if r.include_upper else "}")
        elif r.lower is not None:
            s = ("[" if r.include_lower else "{") + f"{r.lower}>"
        else:
            s = f"<{r.upper}" + ("]" if r.include_upper else "}")
        return f"RangeFilter< {r.field}:{s} >"

    def get_docs(self, searcher) -> np.ndarray:
        from .searcher import range_expand

        terms = range_expand(searcher.reader, self.range)
        sets = []
        for t in terms:
            p = searcher.reader.postings(self.range.field, t)
            if p is not None:
                sets.append(p.docs)
        if not sets:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(sets))


class QueryFilter(Filter):
    """Docid set of an arbitrary query (c/src/filter.c qfilt)."""

    def __init__(self, query: Query):
        self.query = query

    def to_s(self) -> str:
        from .fql import to_s as query_to_s

        return f"QueryFilter< {query_to_s(self.query)} >"

    def get_docs(self, searcher) -> np.ndarray:
        w = searcher.weight(self.query)
        s = searcher._scorer(w)
        return s.docs if s is not None else np.empty(0, dtype=np.int64)
