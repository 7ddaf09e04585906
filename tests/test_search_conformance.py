"""Search conformance vs the reference's own test expectations.

Every check_hits() expectation here is copied from
/root/reference/c/test/test_search.c (line refs inline): the assertions are
the reference's — hit sets, top-ranked doc where asserted, normalized score
in (0,1].
"""

import numpy as np
import pytest

from ferret_ray.search.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    MatchAllQuery,
    MultiTermQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)


def check_hits(searcher, query, expected, top=None):
    expected = sorted(expected)
    td = searcher.search(query, 0, len(expected) + 1)
    got = sorted(h.doc for h in td.hits)
    assert td.total_hits == len(expected), (
        f"expected {expected}, got hits {[h.doc for h in td.hits]}"
    )
    assert got == expected
    if top is not None and td.hits:
        assert td.hits[0].doc == top, (
            f"top expected {top}, got {[(h.doc, h.score) for h in td.hits]}"
        )
    for h in td.hits:
        ns = h.score / td.max_score
        assert 0.0 < ns <= 1.0
        # score == explain.value (test_search.c:309-316)
        assert searcher.explain(query, h.doc).value == h.score
    # search_unscored returns doc-ordered ids (test_search.c:330-337)
    unscored = searcher.search_unscored(query)
    assert unscored == expected
    if len(unscored) > 3:
        assert searcher.search_unscored(query, start_doc=unscored[3]) == (
            unscored[3:]
        )


def test_get_doc(conformance_searcher):
    # test_search.c:231-253
    s = conformance_searcher
    assert s.max_doc() == 18
    assert s.reader.get_doc(0)["date"] == "20050930"
    assert s.reader.get_doc(4)["cat"] == "cat1/sub2/subsub2"
    assert s.reader.get_doc(12)["date"] == "20051012"


def test_term_query(conformance_searcher):
    s = conformance_searcher
    tq = TermQuery("field", "word2", boost=100)
    check_hits(s, tq, [4, 8, 1], top=4)  # :363-367

    check_hits(s, TermQuery("field", "2342"), [])
    check_hits(s, TermQuery("field", ""), [])
    check_hits(s, TermQuery("not_a_field", "word2"), [])

    tq = TermQuery("field", "word1")
    td = s.search(tq, 0, 10)
    assert td.total_hits == 18 and len(td.hits) == 10  # :395-399
    td = s.search(tq, 0, 20)
    assert td.total_hits == 18 and len(td.hits) == 18
    td = s.search(tq, 10, 20)
    assert td.total_hits == 18 and len(td.hits) == 8  # :405-408

    check_hits(s, TermQuery("field", "quick"), [1, 11, 14, 16, 17])


def test_boolean_query(conformance_searcher):
    s = conformance_searcher
    # :451-466
    bq = BooleanQuery()
    bq.add(TermQuery("field", "word1"), MUST)
    bq.add(TermQuery("field", "word3"), MUST)
    check_hits(s, bq, [2, 3, 6, 8, 11, 14], top=14)

    bq.add(TermQuery("field", "word2"), SHOULD)
    check_hits(s, bq, [2, 3, 6, 8, 11, 14], top=8)

    # :467-471
    bq = BooleanQuery()
    bq.add(TermQuery("field", "word3"), MUST)
    bq.add(TermQuery("field", "word2"), MUST_NOT)
    check_hits(s, bq, [2, 3, 6, 11, 14])

    # :473-477 — lone MUST_NOT matches nothing
    bq = BooleanQuery()
    bq.add(TermQuery("field", "word3"), MUST_NOT)
    check_hits(s, bq, [])

    # :479-483
    bq = BooleanQuery()
    bq.add(TermQuery("field", "word3"), SHOULD)
    check_hits(s, bq, [2, 3, 6, 8, 11, 14], top=14)

    # :485-491
    bq = BooleanQuery()
    bq.add(TermQuery("field", "word3"), SHOULD)
    bq.add(TermQuery("field", "word2"), SHOULD)
    check_hits(s, bq, [1, 2, 3, 4, 6, 8, 11, 14])

    # :493-505
    bq = BooleanQuery()
    bq.add(TermQuery("not a field", "word1"), SHOULD)
    bq.add(TermQuery("not a field", "word3"), SHOULD)
    check_hits(s, bq, [])
    bq.add(TermQuery("field", "word2"), SHOULD)
    check_hits(s, bq, [1, 4, 8], top=4)


def test_phrase_query(conformance_searcher):
    s = conformance_searcher
    # :568-595
    phq = PhraseQuery("field")
    phq.add_term("quick").add_term("brown").add_term("fox")
    check_hits(s, phq, [1], top=1)
    phq.slop = 4
    check_hits(s, phq, [1, 16, 17], top=17)

    # :610-633 "quick <> fox"
    phq = PhraseQuery("field")
    phq.add_term("quick").add_term("fox", 2)
    check_hits(s, phq, [1, 11, 14], top=14)
    phq.slop = 1
    check_hits(s, phq, [1, 11, 14, 16], top=14)
    phq.slop = 4
    check_hits(s, phq, [1, 11, 14, 16, 17], top=14)
    phq.add_term("red", -1)
    check_hits(s, phq, [11], top=11)
    phq.append_multi_term("RED")
    check_hits(s, phq, [11], top=11)
    phq.add_term("QUICK", -1)
    phq.append_multi_term("red")
    check_hits(s, phq, [11], top=11)

    # :646-652 multi-term per position at pos 0
    phq = PhraseQuery("field")
    phq.add_term("the", 0)
    phq.add_term("WORD3", 0)
    check_hits(s, phq, [8, 11, 14], top=14)
    phq.add_term("THE", 1)
    phq.add_term("quick", 0)
    phq.add_term("QUICK", 1)
    check_hits(s, phq, [11, 14], top=14)

    # :657-663 repeated terms
    phq = PhraseQuery("field")
    phq.add_term("one", 0).add_term("two", 1).add_term("one", 1)
    check_hits(s, phq, [2], top=2)
    phq.slop = 2
    check_hits(s, phq, [2], top=2)

    # :666-671 non-existing field
    phq = PhraseQuery("not a field")
    phq.add_term("the", 0).add_term("quick", 1)
    check_hits(s, phq, [])

    # :676-686 single-term phrase rewrites
    phq = PhraseQuery("field")
    phq.add_term("word2")
    check_hits(s, phq, [4, 8, 1])
    phq.append_multi_term("word3")
    check_hits(s, phq, [1, 2, 3, 4, 6, 8, 11, 14])


def test_multi_phrase_query(conformance_searcher):
    s = conformance_searcher
    # :752-792
    phq = PhraseQuery("field")
    phq.append_multi_term("quick")
    phq.append_multi_term("fast")
    check_hits(s, phq, [1, 8, 11, 14, 16, 17])

    phq.add_term("brown", 1)
    phq.append_multi_term("red")
    phq.append_multi_term("hairy")
    phq.add_term("fox", 1)
    check_hits(s, phq, [1, 8, 11, 14])

    phq.slop = 4
    check_hits(s, phq, [1, 8, 11, 14, 16, 17])

    phq.add_term("QUICK", -1)
    phq.append_multi_term("FAST")
    check_hits(s, phq, [1, 8, 11, 14, 16, 17])

    phq.add_term("WORD3", -3)
    phq.append_multi_term("WORD2")
    check_hits(s, phq, [1, 8, 11, 14])

    # :795-805 repeating terms with multi-term slot
    phq = PhraseQuery("field")
    phq.add_term("WORD3", 0)
    phq.append_multi_term("x")
    phq.add_term("one", 0).add_term("two", 1).add_term("one", 1)
    check_hits(s, phq, [2])
    phq.slop = 4
    check_hits(s, phq, [2])

    # :814-820
    phq = PhraseQuery("field")
    phq.add_term("word2")
    phq.append_multi_term("word3")
    check_hits(s, phq, [1, 2, 3, 4, 6, 8, 11, 14])

    # :824-833
    phq = PhraseQuery("field")
    phq.add_term("quick", 0).add_term("brown", 1)
    phq.append_multi_term("dirty")
    phq.append_multi_term("red")
    check_hits(s, phq, [1, 11])
    phq.slop = 1
    check_hits(s, phq, [1, 11, 17])
    phq.add_term("chicken", 1)
    phq.append_multi_term("turtle")
    check_hits(s, phq, [])


def test_multi_term_query(conformance_searcher):
    s = conformance_searcher
    # :911-963
    mtq = MultiTermQuery("field", max_terms=4, min_boost=0.5)
    check_hits(s, mtq, [])
    mtq.add_term("brown")
    check_hits(s, mtq, [1, 8, 16, 17])
    mtq.add_term("fox", 0.4)  # below min_boost -> ignored
    check_hits(s, mtq, [1, 8, 16, 17])
    mtq.add_term("fox", 0.6)
    check_hits(s, mtq, [1, 8, 11, 14, 16, 17])
    mtq.add_term("fast", 50.0)
    check_hits(s, mtq, [1, 8, 11, 14, 16, 17], top=8)

    # :966-976 conjunction with multi-term
    mtq = MultiTermQuery("field", max_terms=4, min_boost=0.5)
    mtq.add_term("brown")
    mtq.add_term("fox", 0.6)
    mtq.add_term("word1")
    bq = BooleanQuery()
    bq.add(TermQuery("field", "quick"), MUST)
    bq.add(mtq, MUST)
    check_hits(s, bq, [1, 11, 14, 16, 17])


def test_prefix_query(conformance_searcher):
    s = conformance_searcher
    # :1027-1056
    check_hits(
        s, PrefixQuery("cat", "cat1"),
        [0, 1, 2, 3, 4, 13, 14, 15, 16, 17],
    )
    check_hits(s, PrefixQuery("cat", "cat1/sub2"), [3, 4, 13, 15])
    check_hits(
        s, PrefixQuery("cat", "cat1/sub"), [1, 2, 3, 4, 13, 14, 15, 16]
    )
    check_hits(s, PrefixQuery("unknown field", "cat1/sub"), [])
    check_hits(s, PrefixQuery("cat", "unknown_term"), [])


def test_match_all(conformance_searcher):
    s = conformance_searcher
    td = s.search(MatchAllQuery(), 0, 20)
    assert td.total_hits == 18


def test_score_sanity(conformance_searcher):
    """Scores are float32, positive, reproducible."""
    s = conformance_searcher
    td1 = s.search(TermQuery("field", "word2"), 0, 5)
    td2 = s.search(TermQuery("field", "word2"), 0, 5)
    assert [h.score for h in td1.hits] == [h.score for h in td2.hits]
    assert all(h.score > 0 for h in td1.hits)
    assert td1.hits[0].score == td1.max_score


def test_match_vectors(conformance_searcher):
    """check_match_vector goldens (test_search.c:414, 688-699, 824-833,
    1174-1189)."""
    s = conformance_searcher
    mv = s.get_match_vector

    assert mv(TermQuery("field", "quick"), 1, "field") == [(3, 3), (7, 7)]

    phq = PhraseQuery("field")
    phq.add_term("quick", 0).add_term("brown", 1)
    assert mv(phq, 1, "field") == [(3, 4), (7, 8)]

    phq.slop = 4
    assert mv(phq, 16, "field") == [(2, 5)]

    phq.add_term("chicken", 1)
    assert mv(phq, 16, "field") == []

    # multi-phrase (test_search.c:824-833)
    phq = PhraseQuery("field")
    phq.add_term("quick", 0).add_term("brown", 1)
    phq.append_multi_term("dirty")
    phq.append_multi_term("red")
    assert mv(phq, 1, "field") == [(3, 4), (7, 8)]
    phq.slop = 1
    assert mv(phq, 17, "field") == [(5, 7)]

    # range query (test_search.c:1174-1189)
    from ferret_ray.search.query import RangeQuery

    rq = RangeQuery("field", "word1", "word3", True, True)
    assert mv(rq, 2, "not a field") == []
    assert mv(rq, 2, "field") == [(0, 0), (1, 1)]
    assert mv(RangeQuery("field", "word1", "word3", False, True), 2,
              "field") == [(1, 1)]
    assert mv(RangeQuery("field", "word1", "word3", True, False), 2,
              "field") == [(0, 0)]
    assert mv(RangeQuery("field", "word1", "word3", False, False), 2,
              "field") == []
