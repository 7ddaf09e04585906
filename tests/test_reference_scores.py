"""Bit-exact rank + score identity against the compiled reference.

tests/goldens_reference_scores.jsonl was produced by building the
reference C library (unmodified, in a sandbox) and running its own
indexing + search pipeline over the 18-doc conformance corpus
(test_search.c setup), dumping every query's (doc, float32 score) pairs
at %.9g.  This test runs the identical queries through OUR Ray-built
index and requires the float32 scores to match EXACTLY — the strongest
possible rank-identity evidence.
"""

import json
import os

import numpy as np
import pytest

from ferret_ray.search.fql import FuzzyQuery
from ferret_ray.search.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    MultiTermQuery,
    PhraseQuery,
    PrefixQuery,
    RangeQuery,
    TermQuery,
)

GOLDEN_PATH = os.path.join(os.path.dirname(__file__),
                           "goldens_reference_scores.jsonl")


def _phq(terms_incs, slop=0):
    q = PhraseQuery("field")
    for t, inc in terms_incs:
        q.add_term(t, inc)
    q.slop = slop
    return q


def build_queries():
    tq100 = TermQuery("field", "word2", boost=100.0)

    bq1 = BooleanQuery()
    bq1.add(TermQuery("field", "word1"), MUST)
    bq1.add(TermQuery("field", "word3"), MUST)

    bq2 = BooleanQuery()
    bq2.add(TermQuery("field", "word1"), MUST)
    bq2.add(TermQuery("field", "word3"), MUST)
    bq2.add(TermQuery("field", "word2"), SHOULD)

    bq3 = BooleanQuery()
    bq3.add(TermQuery("field", "word3"), SHOULD)
    bq3.add(TermQuery("field", "word2"), SHOULD)

    bq4 = BooleanQuery()
    bq4.add(TermQuery("field", "word3"), MUST)
    bq4.add(TermQuery("field", "word2"), MUST_NOT)

    mtq = MultiTermQuery("field", max_terms=4, min_boost=0.5)
    mtq.add_term("brown")
    mtq.add_term("fox", 0.6)
    mtq.add_term("fast", 50.0)

    from ferret_ray.search.query import TypedRangeQuery, WildcardQuery
    from ferret_ray.search.spans import (
        SpanFirstQuery,
        SpanNearQuery,
        SpanNotQuery,
        SpanOrQuery,
        SpanTermQuery,
    )

    nested = BooleanQuery()
    inner = BooleanQuery()
    inner.add(TermQuery("field", "quick"), SHOULD)
    inner.add(TermQuery("field", "fast"), SHOULD)
    nested.add(TermQuery("field", "word1"), MUST)
    nested.add(inner, MUST)

    nocoord = BooleanQuery(coord_disabled=True)
    nocoord.add(TermQuery("field", "word3"), SHOULD)
    nocoord.add(TermQuery("field", "word2"), SHOULD)

    mphq = PhraseQuery("field")
    mphq.add_term("quick", 1)
    mphq.append_multi_term("fast")
    mphq.add_term("brown", 1)
    mphq.append_multi_term("red")
    mphq.append_multi_term("hairy")
    mphq.add_term("fox", 1)

    boosted = BooleanQuery(boost=2.0)
    boosted.add(TermQuery("field", "word3", boost=5.5), SHOULD)
    boosted.add(TermQuery("field", "quick"), SHOULD)

    near = SpanNearQuery(slop=1, in_order=True)
    near.add(SpanTermQuery("field", "quick"))
    near.add(SpanTermQuery("field", "fox"))

    sor = SpanOrQuery()
    sor.add(SpanTermQuery("field", "red"))
    sor.add(SpanTermQuery("field", "hairy"))

    return {
        "wildcard:cat1*": WildcardQuery("cat", "cat1*", max_terms=512),
        "wildcard:cat1/sub?": WildcardQuery("cat", "cat1/sub?/su??ub2"),
        "bool:+word1 +(quick fast)": nested,
        "bool_nocoord:word3 word2": nocoord,
        "multiphrase:quick|fast brown|red|hairy fox": mphq,
        "phrase:quick brown~4": _phq(
            [("quick", 1), ("brown", 1)], slop=4
        ),
        "bool:word3^5.5 quick (^2)": boosted,
        "span_term:quick": SpanTermQuery("field", "quick"),
        "span_first:word3,4": SpanFirstQuery(
            SpanTermQuery("field", "word3"), 4
        ),
        "span_near:quick fox~1": near,
        "span_or:red hairy": sor,
        "span_not:word1-word2": SpanNotQuery(
            SpanTermQuery("field", "word1"),
            SpanTermQuery("field", "word2"),
        ),
        "typed_range:[-1.0 1.0]": TypedRangeQuery(
            "number", "-1.0", "1.0", True, True
        ),
        "term:word1": TermQuery("field", "word1"),
        "term:word2": TermQuery("field", "word2"),
        "term:word3": TermQuery("field", "word3"),
        "term:quick": TermQuery("field", "quick"),
        "term:word2^100": tq100,
        "bool:+word1+word3": bq1,
        "bool:+word1+word3 word2": bq2,
        "bool:word3 word2": bq3,
        "bool:+word3-word2": bq4,
        "phrase:quick brown fox": _phq(
            [("quick", 1), ("brown", 1), ("fox", 1)]
        ),
        "phrase:quick brown fox~4": _phq(
            [("quick", 1), ("brown", 1), ("fox", 1)], slop=4
        ),
        "phrase:quick <> fox": _phq([("quick", 1), ("fox", 2)]),
        "phrase:quick <> fox~1": _phq([("quick", 1), ("fox", 2)], slop=1),
        "phrase:one two one~2": _phq(
            [("one", 0), ("two", 1), ("one", 1)], slop=2
        ),
        "multiterm:brown fox^0.6 fast^50": mtq,
        "prefix:cat1/sub": PrefixQuery("cat", "cat1/sub"),
        "range:[20051006 20051010]": RangeQuery(
            "date", "20051006", "20051010", True, True
        ),
        "fuzzy:quip": FuzzyQuery("field", "quip", min_sim=0.5, pre_len=0,
                                 max_terms=512),
    }


GOLDENS = [
    json.loads(line) for line in open(GOLDEN_PATH)
]


@pytest.mark.parametrize(
    "golden", GOLDENS, ids=[g["query"] for g in GOLDENS]
)
def test_reference_score_identity(conformance_searcher, golden):
    queries = build_queries()
    q = queries[golden["query"]]
    td = conformance_searcher.search(q, 0, 40)
    assert td.total_hits == golden["total"], golden["query"]
    got = [(h.doc, np.float32(h.score)) for h in td.hits]
    want = [(d, np.float32(s)) for d, s in golden["hits"]]
    assert [d for d, _ in got] == [d for d, _ in want], (
        f"rank mismatch: got {got} want {want}"
    )
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == ws, (
            f"{golden['query']} doc {gd}: got {gs!r} want {ws!r} "
            f"(diff {float(gs) - float(ws):g})"
        )
