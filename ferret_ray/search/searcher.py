"""Vectorized searcher: rank-identical re-implementation of Ferret scoring.

Weight tree + normalization replicate q_weight (c/src/search.c:355-366):
``sum = w.sum_of_squared_weights(); qnorm = 1/sqrt(sum); w.normalize(qnorm)``
with every multiply/add done in float32 in the same association order as the
C code.  Scorers are vectorized over whole posting lists (numpy) instead of
doc-at-a-time enums — same scores, Ray-friendly batch math:

  term     score = (sqrt(freq) * value) * byte2float(norm[doc])
           (q_term.c:32-48, score-cache order tf*value then *norm)
  boolean  score = sum(matching clause scores, clause order) *
           coord[num_matches]; max_coord counts non-prohibited clauses with
           a scorer (q_boolean.c:968-1006)
  phrase   score = (sqrt(phrase_freq) * value) * norm; exact freq = aligned
           position count (q_phrase.c:364-404), sloppy freq = window PQ with
           1/(dist+1) contributions and repeat-term checking (:408-515)
  multiterm score = [sum tf(freq)*term_boost] * value * norm; idf of the
           SUMMED df (q_multi_term.c:480-498)

Top-k tie-break: equal score -> lower doc id wins (hit_lt,
c/src/search.c:91-99).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np

from ..codec.norms import NORM_TABLE
from .query import (
    MUST,
    MUST_NOT,
    BooleanQuery,
    ConstantScoreQuery,
    FilteredQuery,
    FuzzyQuery,
    MatchAllQuery,
    MultiTermQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RangeQuery,
    TermQuery,
    WildcardQuery,
    fuzzy_score,
    wildcard_match,
)
from .reader import IndexReader
from .similarity import BM25Similarity, coord as sim_coord, idf as sim_idf, query_norm, sloppy_freq, tf as sim_tf

F32 = np.float32


class Hit(NamedTuple):
    doc: int
    score: float


class TopDocs(NamedTuple):
    total_hits: int
    hits: list[Hit]
    max_score: float


class ScoredDocs(NamedTuple):
    docs: np.ndarray    # int64 ascending
    scores: np.ndarray  # float32


class Explanation:
    """Score decomposition node (c/src/search.c expl_*; format of
    expl_to_s, c/test/test_search.c:35-57)."""

    def __init__(self, value: float, description: str,
                 details: list["Explanation"] | None = None):
        self.value = value
        self.description = description
        self.details = details or []

    def to_s(self, depth: int = 0) -> str:
        s = "  " * depth + f"{self.value:g} = {self.description}\n"
        for d in self.details:
            s += d.to_s(depth + 1)
        return s

    def __repr__(self):
        return self.to_s()


def to_s_safe(query) -> str:
    import copy

    try:
        from .fql import to_s

        # deep copy: phq_to_s sorts positions in place (bug-compatible
        # with the reference) — explain must not mutate the query
        return to_s(copy.deepcopy(query))
    except Exception:
        return type(query).__name__


class SortField:
    """Typed sort field (c/include/search.h:665-674, c/src/sort.c).

    type: "score" | "doc" | "integer" | "float" | "string" | "auto".
    reverse flips the FIELD ordering only; ties always break by doc id
    ascending (the fshq heap semantics, c/src/sort.c goldens).
    Missing/empty values sort greatest ascending (reference string-index
    behavior, test_sort.c:268-274).
    """

    def __init__(self, field: str | None, type: str = "auto",
                 reverse: bool = False):
        self.field = field
        self.type = type
        self.reverse = reverse

    SCORE: "SortField"
    DOC: "SortField"

    def __repr__(self):
        if self.type == "score":
            return "<SCORE>" + ("!" if self.reverse else "")
        if self.type == "doc":
            return "<DOC>" + ("!" if self.reverse else "")
        return f"{self.field}:<{self.type}>" + ("!" if self.reverse else "")


SortField.SCORE = SortField(None, "score")
SortField.DOC = SortField(None, "doc")


_INT_RE = __import__("re").compile(r"[-+]?\d+$")
_FLT_RE = __import__("re").compile(r"[-+]?\d*\.?\d+([eE][-+]?\d+)?$")


def sort_key_from_values(
    sf: "SortField", vals, docs: np.ndarray, scores: np.ndarray
) -> np.ndarray:
    """One lexsort key column for a SortField given the per-candidate
    column VALUES (``vals``; None for score/doc types or a missing
    column).  Shared by the in-process Searcher and the partitioned
    pool's value-based top-k merge — the FieldDoc-value merge of the
    reference's msea_search (c/src/search.c:1550-1750): ranks are
    computed over whatever candidate set is passed in, and rank order
    is value order, so merging partitions' candidates through this
    function reproduces the single-searcher ordering exactly."""
    t = sf.type
    if t == "score":
        # natural order is score DESC; reverse flips
        return scores if sf.reverse else -scores
    if t == "doc":
        return -docs if sf.reverse else docs
    if vals is None:
        return np.zeros(docs.size, dtype=np.int64)
    if t == "auto":
        t = _sniff_sort_type(vals)
    if t == "byte":
        # BYTE_FIELD_INDEX (c/src/field_index.c:95-129): each doc's
        # sort value is its term's ordinal in term-enum (sorted)
        # order; 0 = missing, so missing sorts SMALLEST ascending —
        # unlike the string index
        sv = [v if v else None for v in vals]
        present = sorted({x for x in sv if x is not None})
        rank = {x: i + 1 for i, x in enumerate(present)}
        out = np.array(
            [rank.get(x, 0) for x in sv], dtype=np.int64
        )
        return -out if sf.reverse else out
    if t in ("integer", "float"):
        out = np.full(len(vals), np.inf)
        for i, v in enumerate(vals):
            if v is None:
                continue
            try:
                out[i] = float(v)
            except (TypeError, ValueError):
                pass
        return -out if sf.reverse else out
    # string: rank by term order; missing/empty sorts greatest
    # ascending (reference string-index behavior)
    sv = np.array(
        [v if v else None for v in vals], dtype=object
    )
    uniq = sorted({v for v in sv if v is not None})
    rank_map = {v: i for i, v in enumerate(uniq)}
    ranks = np.array(
        [rank_map.get(v, len(uniq)) for v in sv], dtype=np.int64
    )
    return -ranks if sf.reverse else ranks


def _sniff_sort_type(vals) -> str:
    """sort_field_auto type sniffing (c/src/sort.c:367-421): inspect the
    first present value — int-looking -> integer, float-looking -> float,
    else string."""
    for v in vals:
        if v is None or v == "":
            continue
        s = str(v)
        if _INT_RE.match(s):
            return "integer"
        if _FLT_RE.match(s):
            return "float"
        return "string"
    return "string"


# --------------------------------------------------------------------------
# rewrite (c/src/q_prefix.c:36-60, q_wildcard.c:81-130, q_phrase.c rewrite)
# --------------------------------------------------------------------------

def _expansion(reader, key, build):
    exp = getattr(reader, "expansion", None)  # MultiReader: no memo
    return exp(key, build) if exp is not None else build()


# Raw dictionary-enumeration memos.  These keys are the exchange unit of
# partitioned serving (search/partitioned.py): values are plain sorted
# term lists, so per-partition results merge to the global set with a
# sorted union — every expansion family routes its dictionary SCAN
# through one of these before any per-query capping/boosting.

def _twp(reader, field: str, prefix: str) -> list[str]:
    """Memoized terms_with_prefix (sorted)."""
    return _expansion(
        reader, ("twp", field, prefix),
        lambda: reader.terms_with_prefix(field, prefix),
    )


def _wildraw(reader, field: str, pat: str) -> list[str]:
    """Memoized wildcard dictionary scan (sorted)."""
    def build():
        lit = pat.split("*", 1)[0].split("?", 1)[0]
        return reader.terms_matching(
            field, lambda s: wildcard_match(pat, s), prefix=lit
        )

    return _expansion(reader, ("wildraw", field, pat), build)


def range_expand(reader, q) -> list[str]:
    """Memoized dictionary expansion for (Typed)RangeQuery, shared by
    the scorer, RangeFilter and the match-vector path."""
    from .query import TypedRangeQuery

    if isinstance(q, TypedRangeQuery) and q.numeric_bounds() is not None:
        return _expansion(
            reader,
            ("typedrange", q.field, q.lower, q.upper,
             q.include_lower, q.include_upper),
            lambda: reader.terms_matching(q.field, q.matches_typed),
        )
    return _expansion(
        reader,
        ("tir", q.field, q.lower, q.upper,
         q.include_lower, q.include_upper),
        lambda: reader.terms_in_range(
            q.field, q.lower, q.upper, q.include_lower, q.include_upper
        ),
    )


def rewrite(query: Query, reader: IndexReader) -> Query:
    # prefix/wildcard/fuzzy expansions are pure functions of the
    # immutable dictionary — memoized on the reader (tail-latency fix:
    # an 11k-term dictionary scan costs once per reader, not per query)
    if isinstance(query, PrefixQuery):
        def _expand_prefix():
            mtq = MultiTermQuery(query.field, max_terms=query.max_terms)
            for t in _twp(reader, query.field, query.prefix):
                mtq.add_term(t)
            return mtq.boosted_terms

        mtq = MultiTermQuery(query.field, max_terms=query.max_terms)
        mtq.boost = query.boost
        mtq.boosted_terms = _expansion(
            reader,
            ("prefix", query.field, query.prefix, query.max_terms),
            _expand_prefix,
        )
        return mtq
    if isinstance(query, WildcardQuery):
        pat = query.pattern

        def _expand_wild():
            mtq = MultiTermQuery(query.field, max_terms=query.max_terms)
            # prefix-optimized dictionary scan like the reference
            # (q_wildcard.c:81-130): literal prefix bounds the bisect
            for t in _wildraw(reader, query.field, pat):
                mtq.add_term(t)
            return mtq.boosted_terms

        mtq = MultiTermQuery(query.field, max_terms=query.max_terms)
        mtq.boost = query.boost
        mtq.boosted_terms = _expansion(reader, 
            ("wild", query.field, pat, query.max_terms), _expand_wild
        )
        return mtq
    if isinstance(query, FuzzyQuery):
        # fuzq_rewrite (c/src/q_fuzzy.c:180-228)
        if reader.field_num(query.field) < 0:
            return BooleanQuery(coord_disabled=True)
        term = query.term
        pre_len = query.pre_len
        if pre_len >= len(term):
            return TermQuery(query.field, term, query.boost)

        def _expand_fuzzy():
            mtq = MultiTermQuery(
                query.field, max_terms=query.max_terms,
                min_boost=query.min_sim,
            )
            prefix = term[:pre_len]
            suffix = term[pre_len:]
            cands = _twp(
                reader, query.field, prefix if pre_len > 0 else ""
            )
            for t in cands:
                mtq.add_term(t, fuzzy_score(suffix, t[pre_len:], pre_len))
            return mtq.boosted_terms

        mtq = MultiTermQuery(
            query.field, max_terms=query.max_terms,
            min_boost=query.min_sim,
        )
        mtq.boost = query.boost
        mtq.boosted_terms = _expansion(reader, 
            ("fuzzy", query.field, term, pre_len, query.min_sim,
             query.max_terms),
            _expand_fuzzy,
        )
        return mtq
    if isinstance(query, PhraseQuery) and len(query.positions) == 1:
        terms = query.positions[0].terms
        if len(terms) == 1:
            return TermQuery(query.field, terms[0], query.boost)
        mtq = MultiTermQuery(query.field)
        mtq.boost = query.boost
        for t in terms:
            mtq.add_term(t)
        return mtq
    if isinstance(query, BooleanQuery):
        for c in query.clauses:
            c.query = rewrite(c.query, reader)
        return query
    return query


# --------------------------------------------------------------------------
# weights
# --------------------------------------------------------------------------

class _Weight:
    """Shared Weight behavior (w_sum_of_squared_weights / w_normalize,
    c/src/search.c:238-249)."""

    def __init__(self, query: Query, idf: np.float32):
        self.query = query
        self.idf = F32(idf)
        self.qweight = F32(0)
        self.value = F32(query.boost)

    def sum_of_squared_weights(self) -> np.float32:
        self.qweight = F32(self.idf * F32(self.query.boost))
        return F32(self.qweight * self.qweight)

    def normalize(self, factor: np.float32) -> None:
        self.qweight = F32(self.qweight * factor)
        self.value = F32(self.qweight * self.idf)

    def bm25_normalize(self) -> None:
        """BM25 practice (Lucene BM25Similarity): no query norm, no
        idf re-multiplication — value is idf * boost, once."""
        self.value = F32(self.idf * F32(self.query.boost))


class _TermWeight(_Weight):
    pass


class _PhraseWeight(_Weight):
    pass


class _MultiTermWeight(_Weight):
    pass


class _MatchAllWeight(_Weight):
    def __init__(self, query: Query):
        super().__init__(query, F32(1.0))


class _ConstWeight(_Weight):
    """RangeQuery -> ConstantScore (c/src/q_const_score.c)."""

    def __init__(self, query: Query):
        super().__init__(query, F32(1.0))


class _FilteredWeight:
    """FilteredQuery: weight of the sub-query; the filter restricts the
    scorer (c/src/q_filtered_query.c)."""

    def __init__(self, query: FilteredQuery, inner):
        self.query = query
        self.inner = inner

    def sum_of_squared_weights(self) -> np.float32:
        return self.inner.sum_of_squared_weights()

    def normalize(self, factor: np.float32) -> None:
        self.inner.normalize(F32(factor * F32(self.query.boost)))

    def bm25_normalize(self) -> None:
        self.inner.bm25_normalize()


class _BooleanWeight:
    def __init__(self, query: BooleanQuery, children: list):
        self.query = query
        self.children = children  # parallel to query.clauses

    def sum_of_squared_weights(self) -> np.float32:
        total = F32(0.0)
        for clause, w in zip(self.query.clauses, self.children):
            if not clause.is_prohibited:
                total = F32(total + w.sum_of_squared_weights())
        boost = F32(self.query.boost)
        return F32(total * boost * boost)

    def normalize(self, factor: np.float32) -> None:
        factor = F32(factor * F32(self.query.boost))
        for clause, w in zip(self.query.clauses, self.children):
            if not clause.is_prohibited:
                w.normalize(factor)

    def bm25_normalize(self) -> None:
        for w in self.children:
            w.bm25_normalize()


class Searcher:
    # test hook: forces the sparse intersect/searchsorted boolean
    # evaluation so its parity with _boolean_dense stays covered (the
    # dense gate otherwise captures every corpus under 4M docs)
    _force_sparse_boolean = False

    def __init__(self, reader: IndexReader, similarity: str | None = None):
        self.reader = reader
        self.sim_name = similarity or reader.manifest["config"].get(
            "similarity", "default"
        )
        self.bm25 = BM25Similarity() if self.sim_name == "bm25" else None
        if hasattr(reader, "deleted_docs"):
            deleted = reader.deleted_docs()  # MultiReader shifts by base
        else:
            from ..pipelines.deletes import load_deleted

            deleted = load_deleted(reader.index_dir)
        self._deleted = (
            np.array(sorted(deleted), dtype=np.int64) if deleted else None
        )
        # (field, terms) -> (docs, pre-norm accumulator); deletes are
        # masked AFTER scoring, so tombstones never invalidate this
        from collections import OrderedDict as _OD

        self._mtq_cache: "dict" = _OD()

    def num_docs(self) -> int:
        n = self.reader.max_doc()
        return n - (self._deleted.size if self._deleted is not None else 0)

    def _mask_deleted(self, s: "ScoredDocs | None") -> "ScoredDocs | None":
        """Apply the tombstone set (reference .del bitvector semantics:
        deleted docs are invisible to every enum; df/max_doc unchanged
        until compaction, c/src/index.c:6366-6437)."""
        if s is None or self._deleted is None or not s.docs.size:
            return s
        keep = ~np.isin(s.docs, self._deleted, assume_unique=False)
        return ScoredDocs(s.docs[keep], s.scores[keep])

    # ---- stats ----------------------------------------------------------

    def max_doc(self) -> int:
        return self.reader.max_doc()

    def doc_freq(self, field: str, term: str) -> int:
        return self.reader.doc_freq(field, term)

    def _idf(self, field: str, term: str) -> np.float32:
        df = self.doc_freq(field, term)
        n = self.max_doc()
        if self.bm25:
            return self.bm25.idf(df, n)
        return sim_idf(df, n)

    # ---- weight construction -------------------------------------------

    def _create_weight(self, query: Query):
        if isinstance(query, TermQuery):
            return _TermWeight(query, self._idf(query.field, query.term))
        if isinstance(query, BooleanQuery):
            return _BooleanWeight(
                query, [self._create_weight(c.query) for c in query.clauses]
            )
        if isinstance(query, PhraseQuery):
            # sim_idf_phrase: slots in add order, terms reversed within a
            # slot (c/src/similarity.c:80-93 ary iteration)
            total = F32(0.0)
            for pp in query.positions:
                for t in reversed(pp.terms):
                    total = F32(total + self._idf(query.field, t))
            return _PhraseWeight(query, total)
        if isinstance(query, MultiTermQuery):
            many = getattr(self.reader, "doc_freq_many", None)
            if many is not None:
                dfm = many(query.field, [t for t, _ in query.terms])
                df_sum = sum(dfm[t] for t, _ in query.terms)
            else:
                df_sum = sum(
                    self.doc_freq(query.field, t)
                    for t, _ in query.terms
                )
            return _MultiTermWeight(
                query, sim_idf(df_sum, self.max_doc())
            )
        from .spans import SpanQuery, span_terms

        if isinstance(query, SpanQuery):
            # spanw_new (c/src/q_span.c): idf = sum of term idfs
            total = F32(0.0)
            for t in span_terms(query, self.reader):
                total = F32(total + self._idf(query.field, t))
            return _Weight(query, total)
        if isinstance(query, MatchAllQuery):
            return _MatchAllWeight(query)
        if isinstance(query, (RangeQuery, ConstantScoreQuery)):
            return _ConstWeight(query)
        if isinstance(query, FilteredQuery):
            return _FilteredWeight(query, self._create_weight(query.query))
        raise TypeError(f"unsupported query type: {type(query).__name__}")

    def weight(self, query: Query):
        """q_weight: rewrite -> weights -> query_norm -> normalize
        (c/src/search.c:355-366)."""
        query = rewrite(query, self.reader)
        w = self._create_weight(query)
        if self.bm25 and hasattr(w, "bm25_normalize"):
            w.bm25_normalize()
            return w
        s = w.sum_of_squared_weights()
        norm = query_norm(float(s))
        w.normalize(norm)
        return w

    # ---- scorers (vectorized) ------------------------------------------

    def _norm_decode(self, field: str, docs: np.ndarray) -> np.ndarray:
        norms = self.reader.norms(field)
        if norms is None:
            return np.zeros(docs.size, dtype=np.float32)
        return NORM_TABLE[norms[docs]]

    def _scorer(self, w) -> ScoredDocs | None:
        q = w.query
        if isinstance(q, TermQuery):
            return self._term_scorer(w)
        if isinstance(q, BooleanQuery):
            return self._boolean_scorer(w)
        if isinstance(q, PhraseQuery):
            return self._phrase_scorer(w)
        if isinstance(q, MultiTermQuery):
            return self._multi_term_scorer(w)
        if isinstance(q, MatchAllQuery):
            # the reader's doc universe: all docs for a whole-index
            # reader, the owned doc BANDS for a partition view — so
            # partitioned serving scores each doc in exactly one
            # partition (msea_search doc-space split, c/src/search.c)
            docs = self.reader.match_all_docs()
            return ScoredDocs(
                docs,
                np.full(docs.size, F32(w.value), dtype=np.float32),
            )
        from .spans import SpanQuery

        if isinstance(q, SpanQuery):
            return self._span_scorer(w)
        if isinstance(q, RangeQuery):
            return self._range_scorer(w)
        if isinstance(q, ConstantScoreQuery):
            docs = self._filter_docs(q.filter)
            return ScoredDocs(
                docs, np.full(docs.size, F32(w.value), dtype=np.float32)
            )
        if isinstance(q, FilteredQuery):
            s = self._scorer(w.inner)
            if s is None:
                return None
            fd = self._filter_docs(q.filter)
            keep = np.isin(s.docs, fd)
            return ScoredDocs(s.docs[keep], s.scores[keep])
        raise TypeError(type(q).__name__)

    def _term_scorer(self, w) -> ScoredDocs:
        q: TermQuery = w.query
        p = self.reader.postings(q.field, q.term)
        if p is None:
            return ScoredDocs(
                np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
            )
        if self.bm25:
            dl = self.reader.doc_lens(q.field)[p.docs]
            scores = self.bm25.doc_term_scores(
                p.freqs, dl, self.reader.avg_doc_len(q.field),
                float(w.value),
            )
            return ScoredDocs(p.docs, scores)
        tf = np.sqrt(p.freqs.astype(np.float64)).astype(np.float32)
        scores = (tf * w.value) * self._norm_decode(q.field, p.docs)
        return ScoredDocs(p.docs, scores.astype(np.float32))

    def _multi_term_scorer(self, w) -> ScoredDocs | None:
        q: MultiTermQuery = w.query
        if self.reader.field_num(q.field) < 0 or not q.terms:
            return None
        # the (docs, accumulated tf*boost) pair is independent of query
        # boost/normalization — memoize it per expansion (the dictionary
        # and postings are immutable for this reader)
        ckey = (q.field, self.bm25 is not None,
                tuple((t, float(b)) for t, b in q.terms))
        cached = self._mtq_cache.get(ckey)
        if cached is not None:
            self._mtq_cache.move_to_end(ckey)
            all_docs, acc = cached
            scores = (acc * F32(w.value)) * self._norm_decode(
                q.field, all_docs
            )
            return ScoredDocs(all_docs, scores.astype(np.float32))
        # bulk dictionary merge-join for large expansions (prefix /
        # wildcard / fuzzy rewrites): one pass per shard slice instead
        # of a per-term bisect.  The norms column load (its own IO wave
        # over the doc parts) overlaps the postings fetch in a thread —
        # reader.norms memoizes, so the later _norm_decode is a dict hit.
        norms_fut = None
        if (
            q.field not in getattr(self.reader, "_norms", {})
            and hasattr(self.reader, "norms")
        ):
            from concurrent.futures import ThreadPoolExecutor

            _norm_pool = ThreadPoolExecutor(1)
            norms_fut = _norm_pool.submit(self.reader.norms, q.field)
            _norm_pool.shutdown(wait=False)
        bulk = getattr(self.reader, "postings_many", None)
        pmap = (
            bulk(q.field, [t for t, _ in q.terms])
            if bulk is not None else None
        )
        posts = []
        for t, b in q.terms:
            p = (
                pmap.get(t) if pmap is not None
                else self.reader.postings(q.field, t)
            )
            if p is not None:
                posts.append((p, F32(b)))
        if not posts:
            return None
        # accumulate per term with plain fancy-index scatter adds: doc
        # ids are unique WITHIN a term's postings, so `dense[docs] += v`
        # per term applies the SAME float32 adds in the SAME appearance
        # order as the per-term loop (bit-exact with the reference
        # goldens) — without np.add.at's ~10x-slower unbuffered kernel
        # (measured 2.2s -> 0.2s on a 10M-posting expansion)
        total = sum(p.docs.size for p, _ in posts)
        n_docs = self.reader.max_doc()
        if n_docs <= max(total * 4, 1 << 22):
            # dense accumulation: boolean scatter + flatnonzero replace
            # the O(n log n) unique/searchsorted over the concatenated
            # postings (the cold wide-expansion tail, VERDICT r4 #3)
            from ..state.arena import hp_zeros

            touched = hp_zeros(n_docs, bool)
            dense = hp_zeros(n_docs, np.float32)
            for p, b in posts:
                tf = np.sqrt(p.freqs.astype(np.float64)).astype(
                    np.float32) * b
                touched[p.docs] = True
                dense[p.docs] += tf
            all_docs = np.flatnonzero(touched)
            acc = dense[all_docs]
        else:
            # sparse path: doc space much wider than the posting count
            # (a partition view of a huge corpus) — don't allocate it
            all_docs = np.unique(
                np.concatenate([p.docs for p, _ in posts])
            )
            acc = np.zeros(all_docs.size, dtype=np.float32)
            for p, b in posts:
                tf = np.sqrt(p.freqs.astype(np.float64)).astype(
                    np.float32) * b
                acc[np.searchsorted(all_docs, p.docs)] += tf
        self._mtq_cache[ckey] = (all_docs, acc)
        if len(self._mtq_cache) > 8:
            self._mtq_cache.popitem(last=False)
        if norms_fut is not None:
            norms_fut.result()   # norms landed while postings decoded
        scores = (acc * w.value) * self._norm_decode(q.field, all_docs)
        return ScoredDocs(all_docs, scores.astype(np.float32))

    def _span_scorer(self, w) -> ScoredDocs | None:
        """SpanScorer (c/src/q_span.c:205-240): per doc,
        freq = Σ sloppy_freq(end - start) over matching spans."""
        from .spans import spans_of

        q = w.query
        if q.field is None or self.reader.field_num(q.field) < 0:
            return ScoredDocs(
                np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
            )
        docs_rep, starts, ends = spans_of(q, self.reader)
        if not docs_rep.size:
            return ScoredDocs(
                np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
            )
        # freq per doc: sum of 1/(len+1) over matching spans
        contrib = 1.0 / (ends - starts + 1).astype(np.float64)
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(docs_rep)) + 1)
        )
        docs = docs_rep[bounds]
        freqs = np.add.reduceat(contrib, bounds).astype(np.float32)
        tf = np.sqrt(freqs.astype(np.float64)).astype(np.float32)
        scores = (tf * w.value) * self._norm_decode(q.field, docs)
        return ScoredDocs(docs, scores.astype(np.float32))

    def _range_scorer(self, w) -> ScoredDocs | None:
        from .query import TypedRangeQuery

        q: RangeQuery = w.query
        if self.reader.field_num(q.field) < 0:
            return None
        # numeric coercion scans number-ish dictionary terms; both paths
        # go through the memoized raw-enumeration keys (range_expand)
        terms = range_expand(self.reader, q)
        if not terms:
            return None
        doc_sets = []
        for t in terms:
            p = self.reader.postings(q.field, t)
            if p is not None:
                doc_sets.append(p.docs)
        if not doc_sets:
            return None
        docs = np.unique(np.concatenate(doc_sets))
        return ScoredDocs(
            docs, np.full(docs.size, F32(w.value), dtype=np.float32)
        )

    def _boolean_scorer(self, w: _BooleanWeight) -> ScoredDocs | None:
        q = w.query
        subs: list[tuple[str, ScoredDocs]] = []
        for clause, cw in zip(q.clauses, w.children):
            s = self._scorer(cw)
            if s is None:
                if clause.is_required:
                    return None  # bw_scorer: missing required -> no scorer
                continue
            subs.append((clause.occur, s))
        max_coord = sum(1 for occ, _ in subs if occ != MUST_NOT)
        required = [s for occ, s in subs if occ == MUST]
        optional = [s for occ, s in subs if occ not in (MUST, MUST_NOT)]
        prohibited = [s for occ, s in subs if occ == MUST_NOT]
        if not required and not optional:
            return ScoredDocs(
                np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
            )
        # dense scatter-add path for postings-heavy clauses: the sparse
        # intersect1d/searchsorted cascade below is O(P log P) in total
        # postings P, which dominated the 20M-doc `+hot +hot` tail
        # (5-6s/query); scatter adds are O(P).  Same gate as the MTQ
        # scorer: only when the doc space isn't much wider than the
        # postings (a partition view of a huge corpus stays sparse).
        total = sum(s.docs.size for occ, s in subs if occ != MUST_NOT)
        n_docs = self.reader.max_doc()
        if (
            not self._force_sparse_boolean
            and total
            and n_docs <= max(total * 4, 1 << 22)
        ):
            return self._boolean_dense(
                q, subs, required, optional, prohibited, max_coord, n_docs
            )
        if required:
            cand = required[0].docs
            for r in required[1:]:
                cand = np.intersect1d(cand, r.docs, assume_unique=True)
        else:
            cand = np.unique(np.concatenate([o.docs for o in optional]))
        if prohibited and cand.size:
            bad = np.unique(np.concatenate([p.docs for p in prohibited]))
            cand = cand[~np.isin(cand, bad, assume_unique=False)]
        acc = np.zeros(cand.size, dtype=np.float32)
        nmatch = np.zeros(cand.size, dtype=np.int64)
        for occ, s in subs:  # clause order = float32 summation order
            if occ == MUST_NOT:
                continue
            if not s.docs.size or not cand.size:
                continue
            idx = np.searchsorted(s.docs, cand)
            idx_c = np.minimum(idx, s.docs.size - 1)
            hit = s.docs[idx_c] == cand
            acc[hit] += s.scores[idx_c[hit]]
            nmatch[hit] += 1
        if q.coord_disabled or max_coord == 0:
            scores = acc
        else:
            factors = np.array(
                [sim_coord(i, max_coord) for i in range(max_coord + 1)],
                dtype=np.float32,
            )
            scores = (acc * factors[nmatch]).astype(np.float32)
        return ScoredDocs(cand, scores)

    def _boolean_dense(
        self, q, subs, required, optional, prohibited, max_coord, n_docs
    ) -> ScoredDocs:
        """Dense bw_score evaluation (c/src/q_boolean.c semantics).

        Bit-identical to the sparse path: at every candidate doc the
        float32 clause scores are added in the SAME clause order (one
        fancy-index scatter add per clause — doc ids are unique within
        a sub-scorer, so buffered `acc[docs] += scores` applies exactly
        one add per doc per clause), and coord factors index the same
        match counts.  Adds landing on non-candidate docs are simply
        never gathered.
        """
        from ..state.arena import hp_zeros

        use_coord = not (q.coord_disabled or max_coord == 0)
        n_req = len(required)
        if required:
            req_n = hp_zeros(n_docs, np.int16)
            for r in required:
                req_n[r.docs] += np.int16(1)
            cand_mask = req_n == np.int16(n_req)
            for p in prohibited:
                cand_mask[p.docs] = False
        elif use_coord:
            cand_mask = None  # derived from nmatch after accumulation
        else:
            cand_mask = hp_zeros(n_docs, bool)
            for o in optional:
                cand_mask[o.docs] = True
            for p in prohibited:
                cand_mask[p.docs] = False
        acc = hp_zeros(n_docs, np.float32)
        # per-doc match counts are only needed when coord factors vary
        # across candidates: with MUST clauses and no SHOULD, every
        # candidate matched exactly n_req clauses (scalar factor)
        need_nmatch = use_coord and (bool(optional) or not required)
        nmatch = hp_zeros(n_docs, np.int16) if need_nmatch else None
        for occ, s in subs:  # clause order = float32 summation order
            if occ == MUST_NOT or not s.docs.size:
                continue
            acc[s.docs] += s.scores
            if nmatch is not None:
                nmatch[s.docs] += np.int16(1)
        if cand_mask is None:
            for p in prohibited:
                nmatch[p.docs] = 0
            cand = np.flatnonzero(nmatch)
        else:
            cand = np.flatnonzero(cand_mask)
        acc_c = acc[cand]
        if not use_coord:
            scores = acc_c
        else:
            factors = np.array(
                [sim_coord(i, max_coord) for i in range(max_coord + 1)],
                dtype=np.float32,
            )
            if nmatch is None:
                scores = (acc_c * factors[n_req]).astype(np.float32)
            else:
                scores = (acc_c * factors[nmatch[cand]]).astype(np.float32)
        return ScoredDocs(cand, scores)

    _PH_SHIFT = np.int64(21)
    _PH_BIAS = np.int64(1 << 19)

    def _phrase_scorer(self, w) -> ScoredDocs | None:
        q: PhraseQuery = w.query
        if self.reader.field_num(q.field) < 0 or not q.positions:
            return None
        slots: list[tuple[int, list]] = []
        for pp in q.positions:
            parts = []
            for t in pp.terms:
                p = self.reader.postings(q.field, t)
                if p is not None:
                    parts.append(p)
            if not parts:
                # slot with no matching term -> empty enum -> no hits
                return ScoredDocs(
                    np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float32),
                )
            slots.append((pp.pos, parts))

        if q.slop == 0:
            docs, freqs = self._exact_phrase_freqs(slots)
        else:
            docs, freqs = self._sloppy_phrase_freqs(q, slots)
        if not docs.size:
            return ScoredDocs(docs, np.empty(0, dtype=np.float32))
        tf = np.sqrt(freqs.astype(np.float64)).astype(np.float32)
        scores = (tf * w.value) * self._norm_decode(q.field, docs)
        return ScoredDocs(docs, scores.astype(np.float32))

    def _slot_keys(self, offset: int, parts: list) -> np.ndarray:
        """(doc << 21) | (pos - offset + bias), unique-sorted per slot."""
        keys = []
        for p in parts:
            pos_flat, _ = p.positions_flat()
            docs_rep = np.repeat(p.docs, p.freqs)
            keys.append(
                (docs_rep << self._PH_SHIFT)
                + (pos_flat - offset + self._PH_BIAS)
            )
        return np.unique(np.concatenate(keys))

    def _exact_phrase_freqs(
        self, slots: list
    ) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized exact phrase_freq: |∩ slot (doc, pos-offset) sets|
        per doc — equivalent to ephsc_phrase_freq's alignment count
        (c/src/q_phrase.c:374-404)."""
        inter = self._slot_keys(*slots[0])
        for off, parts in slots[1:]:
            if not inter.size:
                break
            inter = np.intersect1d(
                inter, self._slot_keys(off, parts), assume_unique=True
            )
        if not inter.size:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.int64))
        docs, freqs = np.unique(inter >> self._PH_SHIFT,
                                return_counts=True)
        return docs, freqs

    def _sloppy_phrase_freqs(
        self, q: PhraseQuery, slots: list
    ) -> tuple[np.ndarray, np.ndarray]:
        """Window-PQ sloppy matching (c/src/q_phrase.c:441-517) per
        candidate doc; candidate positions come from one vectorized
        decode + numpy slicing."""
        cand = np.unique(np.concatenate([p.docs for p in slots[0][1]]))
        for _, parts in slots[1:]:
            sdocs = np.unique(np.concatenate([p.docs for p in parts]))
            cand = np.intersect1d(cand, sdocs, assume_unique=True)
        if not cand.size:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float32))
        slot_positions: list[list[np.ndarray]] = []
        for _, parts in slots:
            per_doc: list[list[np.ndarray]] = [[] for _ in range(cand.size)]
            for p in parts:
                pos_flat, pos_off = p.positions_flat()
                sel = np.searchsorted(p.docs, cand)
                sel_c = np.minimum(sel, p.docs.size - 1)
                hit = p.docs[sel_c] == cand
                for ci, pi in zip(np.flatnonzero(hit), sel_c[hit]):
                    per_doc[ci].append(
                        pos_flat[pos_off[pi]: pos_off[pi + 1]]
                    )
            slot_positions.append(
                [
                    (np.sort(np.concatenate(pls)) if len(pls) > 1
                     else pls[0]) if pls else np.empty(0, dtype=np.int64)
                    for pls in per_doc
                ]
            )
        offsets = [off for off, _ in slots]
        seen: set[str] = set()
        check_repeats = False
        for pp in q.positions:
            for t in pp.terms:
                if t in seen:
                    check_repeats = True
                seen.add(t)
        freqs = np.zeros(cand.size, dtype=np.float32)
        for ci in range(cand.size):
            plists = [sp[ci] for sp in slot_positions]
            if any(pl.size == 0 for pl in plists):
                continue
            freqs[ci] = _sloppy_phrase_freq(
                plists, offsets, q.slop, check_repeats
            )
        hit = freqs > 0
        return cand[hit], freqs[hit]

    # ---- search ---------------------------------------------------------

    def search(
        self,
        query: Query,
        first_doc: int = 0,
        num_docs: int = 10,
        filter_docs: np.ndarray | None = None,
        post_filter: Callable | None = None,
        sort: list[SortField] | None = None,
        filter=None,
    ) -> TopDocs:
        w = self.weight(query)
        s = self._mask_deleted(self._scorer(w))
        if s is None or s.docs.size == 0:
            return TopDocs(0, [], 0.0)
        docs, scores = s.docs, s.scores
        if filter is not None:
            filter_docs = self._filter_docs(filter)
        if filter_docs is not None:
            keep = np.isin(docs, filter_docs)
            docs, scores = docs[keep], scores[keep]
        if post_filter is not None:
            factors = np.array(
                [post_filter(int(d), float(sc)) for d, sc in
                 zip(docs, scores)],
                dtype=np.float32,
            )
            keep = factors > 0
            docs, scores = docs[keep], (scores[keep] *
                                        factors[keep]).astype(np.float32)
        total = int(docs.size)
        if total == 0:
            return TopDocs(0, [], 0.0)
        max_score = float(scores.max())
        if sort:
            order = self._sort_order(sort, docs, scores)
            sel = order[first_doc: first_doc + num_docs]
        else:
            # rank: score desc, doc asc (hit_lt tie-break).  Bounded
            # selection: a full lexsort of every candidate is O(n log n)
            # and dominates hot-term latency (a 2M-doc stop-word matches
            # ~1.7M postings for k=10); argpartition the top `need`
            # scores in O(n), keep every boundary tie so the doc-asc
            # tie-break stays exact, and sort only that slice.
            need = first_doc + num_docs
            if 0 < need < total:
                part = np.argpartition(-scores, need - 1)[:need]
                kth = scores[part].min()
                cand = np.flatnonzero(scores >= kth)
                order_sub = np.lexsort((docs[cand], -scores[cand]))
                sel = cand[order_sub[first_doc:need]]
            else:
                order = np.lexsort((docs, -scores))
                sel = order[first_doc:need]
        hits = [Hit(int(docs[i]), float(scores[i])) for i in sel]
        return TopDocs(total, hits, max_score)

    def _filter_docs(self, filt) -> np.ndarray:
        """Per-searcher filter cache keyed by canonical string
        (c/src/filter.c:24-57)."""
        if not hasattr(self, "_filter_cache"):
            self._filter_cache = {}
        key = filt.to_s()
        if key not in self._filter_cache:
            self._filter_cache[key] = filt.get_docs(self)
        return self._filter_cache[key]

    def _sort_order(
        self, sort: list[SortField], docs: np.ndarray, scores: np.ndarray
    ) -> np.ndarray:
        """Sort/SortField ordering (c/src/sort.c); final tie-break is
        always doc id ascending."""
        keys: list[np.ndarray] = [docs]  # lexsort: last = primary
        for sf in reversed(sort):
            keys.append(self._sort_key(sf, docs, scores))
        return np.lexsort(keys)

    def _sort_key(
        self, sf: SortField, docs: np.ndarray, scores: np.ndarray
    ) -> np.ndarray:
        t = sf.type
        vals = None
        if t not in ("score", "doc"):
            col = self.reader.docs_column(sf.field)
            vals = col[docs] if col is not None else None
        return sort_key_from_values(sf, vals, docs, scores)

    def explain(self, query: Query, doc: int) -> "Explanation":
        """Score decomposition for one doc (searcher_explain,
        c/src/search.c:13-79): explain().value always equals the search
        score for that doc (asserted by the conformance suite)."""
        w = self.weight(query)
        s = self._scorer(w)
        score = 0.0
        if s is not None and s.docs.size:
            i = int(np.searchsorted(s.docs, doc))
            if i < s.docs.size and s.docs[i] == doc:
                score = float(s.scores[i])
        detail = self._explain_detail(w, doc)
        return Explanation(score, f"score({to_s_safe(query)} in {doc})",
                           detail)

    def _explain_detail(self, w, doc: int) -> list["Explanation"]:
        q = w.query
        out: list[Explanation] = []
        if isinstance(q, TermQuery):
            p = self.reader.postings(q.field, q.term)
            tf_val = 0.0
            if p is not None:
                i = int(np.searchsorted(p.docs, doc))
                if i < p.docs.size and p.docs[i] == doc:
                    tf_val = float(sim_tf(float(p.freqs[i])))
            norms = self.reader.norms(q.field)
            norm = float(NORM_TABLE[norms[doc]]) if norms is not None else 0.0
            out.append(Explanation(tf_val, f"tf(term_freq({q.field}:{q.term}))"))
            out.append(Explanation(float(w.idf), f"idf(doc_freq={self.doc_freq(q.field, q.term)})"))
            out.append(Explanation(float(getattr(w, 'qweight', 0.0)), "query_weight"))
            out.append(Explanation(norm, f"field_norm(field={q.field}, doc={doc})"))
        elif isinstance(q, BooleanQuery):
            for clause, cw in zip(q.clauses, w.children):
                sub = self.explain(clause.query, doc)
                sub.description = f"{clause.occur}: {sub.description}"
                out.append(sub)
        elif isinstance(q, PhraseQuery):
            out.append(Explanation(float(w.idf), "idf_phrase(sum of term idfs)"))
            out.append(Explanation(float(getattr(w, 'qweight', 0.0)), "query_weight"))
        return out

    def get_match_vector(
        self, query: Query, doc: int, field: str
    ) -> list[tuple[int, int]]:
        """Match position ranges of ``query`` in (doc, field) — the
        MatchVector of searcher_get_match_vector (c/src/search.c:510+,
        goldens in test_search.c check_match_vector)."""
        query = rewrite(query, self.reader)
        out = sorted(set(self._matchv(query, doc, field)))
        return out

    def _term_positions(self, field, term, doc) -> list[int]:
        p = self.reader.postings(field, term)
        if p is None:
            return []
        i = int(np.searchsorted(p.docs, doc))
        if i >= p.docs.size or p.docs[i] != doc:
            return []
        pos, off = p.positions_flat()
        return pos[off[i]: off[i + 1]].tolist()

    def _matchv(self, q, doc, field) -> list[tuple[int, int]]:
        from .spans import SpanQuery, spans_of
        from .query import TypedRangeQuery

        if isinstance(q, TermQuery):
            if q.field != field:
                return []
            return [(p, p) for p in self._term_positions(field, q.term, doc)]
        if isinstance(q, MultiTermQuery):
            if q.field != field:
                return []
            out = []
            for t, _ in q.terms:
                out += [
                    (p, p) for p in self._term_positions(field, t, doc)
                ]
            return out
        if isinstance(q, RangeQuery):
            if q.field != field:
                return []
            terms = range_expand(self.reader, q)
            out = []
            for t in terms:
                out += [
                    (p, p) for p in self._term_positions(field, t, doc)
                ]
            return out
        if isinstance(q, BooleanQuery):
            out = []
            for c in q.clauses:
                if not c.is_prohibited:
                    out += self._matchv(c.query, doc, field)
            return out
        if isinstance(q, PhraseQuery):
            if q.field != field:
                return []
            return self._phrase_matches(q, doc)
        if isinstance(q, FilteredQuery):
            return self._matchv(q.query, doc, field)
        if isinstance(q, SpanQuery):
            if q.field != field:
                return []
            docs_rep, starts, ends = spans_of(q, self.reader)
            sel = docs_rep == doc
            return list(zip(starts[sel].tolist(),
                            (ends[sel] - 1).tolist()))
        return []

    def _phrase_matches(self, q: PhraseQuery, doc: int):
        """(start_pos, end_pos) per phrase match in one doc."""
        slot_lists = []
        for pp in q.positions:
            merged: list[int] = []
            for t in pp.terms:
                merged += self._term_positions(q.field, t, doc)
            if not merged:
                return []
            slot_lists.append(np.unique(np.asarray(merged, np.int64)))
        offsets = [pp.pos for pp in q.positions]
        lo, hi = min(offsets), max(offsets)
        if q.slop == 0:
            acc = slot_lists[0] - offsets[0]
            for pl, off in zip(slot_lists[1:], offsets[1:]):
                acc = np.intersect1d(acc, pl - off, assume_unique=True)
            return [(int(a) + lo, int(a) + hi) for a in acc]
        # sloppy: window matches -> (min, max) actual positions
        return _sloppy_phrase_matches(slot_lists, offsets, q.slop)

    def search_unscored(
        self, query: Query, start_doc: int = 0, limit: int | None = None
    ) -> list[int]:
        w = self.weight(query)
        s = self._mask_deleted(self._scorer(w))
        if s is None:
            return []
        docs = s.docs[s.docs >= start_doc]
        if limit is not None:
            docs = docs[:limit]
        return [int(d) for d in docs]


# --------------------------------------------------------------------------
# phrase frequency algorithms
# --------------------------------------------------------------------------

class _PhPos:
    """PhPos over a decoded position list (c/src/q_phrase.c:42-100)."""

    __slots__ = ("positions", "offset", "idx", "position")

    def __init__(self, positions: np.ndarray, offset: int):
        self.positions = positions
        self.offset = offset
        self.idx = -1
        self.position = 0

    def next_position(self) -> bool:
        self.idx += 1
        if self.idx < len(self.positions):
            self.position = int(self.positions[self.idx]) - self.offset
            return True
        return False

    def sort_key(self) -> tuple[int, int]:
        return (self.position, self.offset)


def _check_repeats(pp: _PhPos, pps: list[_PhPos], count: int) -> bool:
    """sphsc_check_repeats (c/src/q_phrase.c:408-439)."""
    j = 0
    while j < count:
        ppj = pps[j]
        if ppj.offset != pp.offset and (
            ppj.position + ppj.offset == pp.position + pp.offset
        ):
            if not pp.next_position():
                return False
            j = -1  # restart
        j += 1
    return True


def _sloppy_phrase_matches(
    plists: list[np.ndarray], offsets: list[int], slop: int
) -> list[tuple[int, int]]:
    """Window matches as (min, max) actual token positions — the sloppy
    branch of phq_get_matchv_i."""
    import heapq

    pps = [_PhPos(pl, off) for pl, off in zip(plists, offsets)]
    heap: list[tuple[tuple[int, int], int]] = []
    last_pos = 0
    for i, pp in enumerate(pps):
        if not pp.next_position():
            return []
        if pp.position > last_pos:
            last_pos = pp.position
        heapq.heappush(heap, (pp.sort_key(), i))
    out = []
    done = False
    while not done:
        _, i = heapq.heappop(heap)
        pp = pps[i]
        pos = start = pp.position
        next_pos = heap[0][0][0] if heap else pos
        actuals = [p.position + p.offset for p in pps]
        # capture window BEFORE advancing pp past it
        while pos <= next_pos:
            start = pos
            actuals = [p.position + p.offset for p in pps]
            if not pp.next_position():
                done = True
                break
            pos = pp.position
        match_length = last_pos - start
        if match_length <= slop:
            out.append((min(actuals), max(actuals)))
        if pp.position > last_pos:
            last_pos = pp.position
        heapq.heappush(heap, (pp.sort_key(), i))
    return sorted(set(out))


def _sloppy_phrase_freq(
    plists: list[np.ndarray],
    offsets: list[int],
    slop: int,
    check_repeats: bool,
) -> float:
    """sphsc_phrase_freq (c/src/q_phrase.c:441-517), float32 accumulation."""
    import heapq

    pps = [_PhPos(pl, off) for pl, off in zip(plists, offsets)]
    last_pos = 0
    heap: list[tuple[tuple[int, int], int]] = []
    freq = F32(0.0)
    for i, pp in enumerate(pps):
        if not pp.next_position():
            return 0.0
        if check_repeats and i > 0:
            if not _check_repeats(pp, pps, i - 1):
                return float(freq)
        if pp.position > last_pos:
            last_pos = pp.position
        heapq.heappush(heap, (pp.sort_key(), i))
    done = False
    while not done:
        _, i = heapq.heappop(heap)
        pp = pps[i]
        pos = start = pp.position
        next_pos = heap[0][0][0] if heap else pos
        while pos <= next_pos:
            start = pos
            if not pp.next_position() or (
                check_repeats and not _check_repeats(pp, pps, len(pps))
            ):
                done = True
                break
            pos = pp.position
        match_length = last_pos - start
        if match_length <= slop:
            freq = F32(freq + sloppy_freq(match_length))
        if pp.position > last_pos:
            last_pos = pp.position
        heapq.heappush(heap, (pp.sort_key(), i))
    return float(freq)
