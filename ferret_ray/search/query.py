"""Query AST (the reference's 19 query types, c/include/search.h:193-214).

Construction API mirrors Ferret's (phq_add_term with relative pos_inc that
may be 0 or negative, phq_append_multi_term, multi_tq_add_term_boost with
max_terms/min_boost pruning, c/src/q_phrase.c:1160-1200,
c/src/q_multi_term.c:624-672).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

MUST = "MUST"
SHOULD = "SHOULD"
MUST_NOT = "MUST_NOT"

MULTI_TERM_QUERY_MAX_TERMS = 256  # c/include/search.h:338


class Query:
    boost: float = 1.0


@dataclass
class TermQuery(Query):
    field: str
    term: str
    boost: float = 1.0


@dataclass
class BooleanClause:
    query: Query
    occur: str = SHOULD

    @property
    def is_required(self) -> bool:
        return self.occur == MUST

    @property
    def is_prohibited(self) -> bool:
        return self.occur == MUST_NOT


@dataclass
class BooleanQuery(Query):
    clauses: list[BooleanClause] = dc_field(default_factory=list)
    coord_disabled: bool = False
    boost: float = 1.0

    def add(self, query: Query, occur: str = SHOULD) -> "BooleanQuery":
        self.clauses.append(BooleanClause(query, occur))
        return self


@dataclass
class PhrasePosition:
    pos: int
    terms: list[str]


@dataclass
class PhraseQuery(Query):
    field: str
    positions: list[PhrasePosition] = dc_field(default_factory=list)
    slop: int = 0
    boost: float = 1.0

    def add_term(self, term: str, pos_inc: int = 1) -> "PhraseQuery":
        # c/src/q_phrase.c:1176-1187
        pos = (
            0 if not self.positions
            else self.positions[-1].pos + pos_inc
        )
        self.positions.append(PhrasePosition(pos, [term]))
        return self

    def append_multi_term(self, term: str) -> "PhraseQuery":
        # c/src/q_phrase.c:1189-1200
        if not self.positions:
            self.add_term(term, 0)
        else:
            self.positions[-1].terms.append(term)
        return self


@dataclass
class MultiTermQuery(Query):
    """Boosted-term disjunction on one field (c/src/q_multi_term.c)."""

    field: str
    max_terms: int = MULTI_TERM_QUERY_MAX_TERMS
    min_boost: float = 0.0
    boost: float = 1.0
    boosted_terms: list[tuple[float, str]] = dc_field(default_factory=list)

    def add_term(self, term: str, term_boost: float = 1.0) -> "MultiTermQuery":
        # pq of (boost, term), lowest evicted when over max_terms
        # (c/src/q_multi_term.c:658-672)
        import heapq

        if term and term_boost > self.min_boost:
            bt = self.boosted_terms
            if len(bt) < self.max_terms:
                heapq.heappush(bt, (term_boost, term))
            else:
                heapq.heappushpop(bt, (term_boost, term))
            if len(bt) == self.max_terms:
                self.min_boost = bt[0][0]
        return self

    @property
    def terms(self) -> list[tuple[str, float]]:
        return [(t, b) for b, t in sorted(self.boosted_terms)]


@dataclass
class MatchAllQuery(Query):
    boost: float = 1.0


@dataclass
class ConstantScoreQuery(Query):
    """score = weight value for every doc of the filter
    (c/src/q_const_score.c)."""

    filter: object  # a filters.Filter
    boost: float = 1.0


@dataclass
class FilteredQuery(Query):
    """query ∧ filter, scored by the query (c/src/q_filtered_query.c)."""

    query: "Query"
    filter: object
    boost: float = 1.0


@dataclass
class FuzzyQuery(Query):
    """Levenshtein-similarity term expansion (c/src/q_fuzzy.c).

    Zero values map to the reference defaults (fuzq_new_conf,
    c/src/q_fuzzy.c:255-265: min_sim 0.5, pre_len 0, max_terms 256)."""

    field: str
    term: str
    min_sim: float = 0.5
    pre_len: int = 0
    boost: float = 1.0
    max_terms: int = 256

    def __post_init__(self):
        if not self.min_sim:
            self.min_sim = 0.5
        if not self.max_terms:
            self.max_terms = 256


def fuzzy_score(query_suffix: str, target_suffix: str, pre_len: int) -> float:
    """fuzq_score (c/src/q_fuzzy.c:60-141):
    1 - edit_distance / (pre_len + min(n, m)); may go negative."""
    n, m = len(query_suffix), len(target_suffix)
    if n == 0 or m == 0:
        if pre_len == 0:
            return 0.0
        return 1.0 - float(m + n) / pre_len
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        curr = [i] + [0] * m
        ci = query_suffix[i - 1]
        for j in range(1, m + 1):
            if ci == target_suffix[j - 1]:
                curr[j] = min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1])
            else:
                curr[j] = min(prev[j], curr[j - 1], prev[j - 1]) + 1
        prev = curr
    return 1.0 - float(prev[m]) / (pre_len + min(n, m))


@dataclass
class PrefixQuery(Query):
    field: str
    prefix: str
    boost: float = 1.0
    max_terms: int = MULTI_TERM_QUERY_MAX_TERMS


@dataclass
class WildcardQuery(Query):
    field: str
    pattern: str  # '?' = one char, '*' = any run (c/src/q_wildcard.c)
    boost: float = 1.0
    max_terms: int = MULTI_TERM_QUERY_MAX_TERMS


@dataclass
class RangeQuery(Query):
    """Lexicographic term range -> constant-score (c/src/q_range.c)."""

    field: str
    lower: str | None = None
    upper: str | None = None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0

    def __post_init__(self):
        if self.lower is None and self.include_lower:
            raise ValueError("include_lower requires a lower bound")
        if self.upper is None and self.include_upper:
            raise ValueError("include_upper requires an upper bound")
        if self.lower is None and self.upper is None:
            raise ValueError("range needs at least one bound")
        if (
            self.lower is not None
            and self.upper is not None
            and self.lower > self.upper
        ):
            raise ValueError("lower > upper")

    def matches(self, term: str) -> bool:
        if self.lower is not None:
            if term < self.lower or (
                term == self.lower and not self.include_lower
            ):
                return False
        if self.upper is not None:
            if term > self.upper or (
                term == self.upper and not self.include_upper
            ):
                return False
        return True


def _parse_num(s: str | None) -> float | None:
    """sscanf("%lg") full-consume semantics (c/src/q_range.c:334-360)."""
    if s is None:
        return None
    try:
        return float(s)
    except ValueError:
        return None


@dataclass
class TypedRangeQuery(RangeQuery):
    """Numeric-coerced range when both bounds parse as numbers, else a
    plain lexicographic RangeQuery (c/src/q_range.c:300-430)."""

    def __post_init__(self):
        lo, hi = _parse_num(self.lower), _parse_num(self.upper)
        if (
            self.lower is not None and self.upper is not None
            and lo is not None and hi is not None
        ):
            if lo > hi:
                raise ValueError("lower > upper")
            if self.lower is None and self.include_lower:
                raise ValueError("include_lower requires a lower bound")
            return
        super().__post_init__()

    def numeric_bounds(self) -> tuple[float | None, float | None] | None:
        lo = _parse_num(self.lower)
        hi = _parse_num(self.upper)
        if (self.lower is None or lo is not None) and (
            self.upper is None or hi is not None
        ):
            return lo, hi
        return None

    def matches_typed(self, term: str) -> bool:
        nb = self.numeric_bounds()
        if nb is None:
            return self.matches(term)
        if not term or term[0] > "9":
            return False
        v = _parse_num(term)
        if v is None:
            return False
        lo, hi = nb
        if lo is not None and (v < lo or (v == lo and not self.include_lower)):
            return False
        if hi is not None and (v > hi or (v == hi and not self.include_upper)):
            return False
        return True


def wildcard_match(pattern: str, term: str) -> bool:
    """frt_wc_match semantics (c/src/q_wildcard.c:20-80)."""
    import re as _re

    rx = "".join(
        ".*" if c == "*" else "." if c == "?" else _re.escape(c)
        for c in pattern
    )
    return _re.fullmatch(rx, term) is not None
