"""Range/wildcard/search_unscored conformance
(/root/reference/c/test/test_search.c:1095-1190, 1493-1620)."""

import pytest

from ferret_ray.search.query import (
    MUST,
    BooleanQuery,
    RangeQuery,
    TermQuery,
    WildcardQuery,
    wildcard_match,
)
from tests.test_search_conformance import check_hits


def test_range_query(conformance_searcher):
    s = conformance_searcher
    with pytest.raises(ValueError):
        RangeQuery("date", "20050101", "20040101", True, True)
    with pytest.raises(ValueError):
        RangeQuery("date", None, "20040101", True, True)
    with pytest.raises(ValueError):
        RangeQuery("date", "20050101", None, True, True)
    with pytest.raises(ValueError):
        RangeQuery("date", None, None, False, False)

    rq = lambda *a: RangeQuery("date", *a)  # noqa: E731
    check_hits(s, rq("20051006", "20051010", True, True), [6, 7, 8, 9, 10])
    check_hits(s, rq("20051006", "20051010", False, True), [7, 8, 9, 10])
    check_hits(s, rq("20051006", "20051010", True, False), [6, 7, 8, 9])
    check_hits(s, rq("20051006", "20051010", False, False), [7, 8, 9])
    check_hits(s, rq(None, "20051003", False, True), [0, 1, 2, 3])
    check_hits(s, rq(None, "20051003", False, False), [0, 1, 2])
    check_hits(s, rq("20051014", None, True, False), [14, 15, 16, 17])
    check_hits(s, rq("20051014", None, False, False), [15, 16, 17])
    check_hits(
        s, RangeQuery("not_a_field", "20051006", "20051010", False, False), []
    )
    check_hits(s, rq("10051006", "10051010", False, False), [])
    check_hits(s, rq("30051006", "30051010", False, False), [])
    check_hits(
        s, RangeQuery("field", "word1", "word3", True, True), list(range(18))
    )


def test_wildcard_match():
    # test_search.c:1493-1523
    assert not wildcard_match("", "abc")
    assert wildcard_match("*", "asdasdg")
    assert wildcard_match("asd*", "asdasdg")
    assert wildcard_match("*dg", "asdasdg")
    assert wildcard_match("a?d*", "asdasdg")
    assert wildcard_match("?sd*", "asdasdg")
    assert wildcard_match("asd?", "asdg")
    assert wildcard_match("asdg", "asdg")
    assert not wildcard_match("asdf", "asdi")
    assert not wildcard_match("asd??", "asdg")
    assert wildcard_match("as?g", "asdg")
    assert not wildcard_match("as??g", "asdg")
    assert wildcard_match("a*?f", "asdf")
    assert wildcard_match("a?*f", "asdf")
    assert wildcard_match("a*?df", "asdf")
    assert wildcard_match("a?*df", "asdf")
    assert not wildcard_match("as*?df", "asdf")
    assert not wildcard_match("as?*df", "asdf")
    assert wildcard_match("asdf*", "asdf")
    assert wildcard_match("asd*f", "asdf")
    assert wildcard_match("*asdf*", "asdf")
    assert wildcard_match("asd?*****", "asdf")
    assert wildcard_match("as?*****g", "asdg")
    assert not wildcard_match("*asdf", "asdi")
    assert not wildcard_match("asdf*", "asdi")
    assert not wildcard_match("*asdf*", "asdi")
    assert not wildcard_match("cat1*", "cat2/sub1")


def test_wildcard_query(conformance_searcher):
    s = conformance_searcher
    check_hits(
        s, WildcardQuery("cat", "cat1*"),
        [0, 1, 2, 3, 4, 13, 14, 15, 16, 17],
    )
    check_hits(s, WildcardQuery("cat", "cat1*/s*sub2"), [4, 16])
    check_hits(s, WildcardQuery("cat", "cat1/sub?/su??ub2"), [4, 16])
    check_hits(s, WildcardQuery("cat", "cat1/"), [0, 17])
    check_hits(s, WildcardQuery("unknown_field", "cat1/"), [])
    check_hits(s, WildcardQuery("cat", "unknown_term"), [])

    bq = BooleanQuery()
    bq.add(TermQuery("field", "word1"), MUST)
    bq.add(WildcardQuery("cat", "cat1*"), MUST)
    check_hits(s, bq, [0, 1, 2, 3, 4, 13, 14, 15, 16, 17])


def test_search_unscored(conformance_searcher):
    # test_search.c:1609-1630
    s = conformance_searcher
    tq = TermQuery("field", "word1")
    assert s.search_unscored(tq, 0, 5) == [0, 1, 2, 3, 4]
    assert s.search_unscored(tq, 1, 5) == [1, 2, 3, 4, 5]
    assert s.search_unscored(tq, 12, 5) == [12, 13, 14, 15, 16]


def test_fql_end_to_end(conformance_searcher):
    """FQL strings produce the same hits as programmatic queries
    (the Ruby layer's tm_searcher pattern)."""
    from ferret_ray.analysis import whitespace_analyzer
    from ferret_ray.search.fql import FQLParser

    s = conformance_searcher
    p = FQLParser(analyzer=whitespace_analyzer())
    for f in ("field", "date", "cat", "number"):
        p.add_field(f, default=(f == "field"), tokenized=True)

    check_hits(s, p.parse("word2"), [1, 4, 8], top=4)
    check_hits(s, p.parse("+word1 +word3"), [2, 3, 6, 8, 11, 14], top=14)
    check_hits(s, p.parse("word3 -word2"), [2, 3, 6, 11, 14])
    check_hits(s, p.parse('"quick brown fox"'), [1], top=1)
    check_hits(s, p.parse('"quick brown fox"~4'), [1, 16, 17], top=17)
    check_hits(s, p.parse('"quick <> fox"'), [1, 11, 14], top=14)
    check_hits(s, p.parse("cat:cat1*"), [0, 1, 2, 3, 4, 13, 14, 15, 16, 17])
    check_hits(s, p.parse("date:[20051006 20051010]"), [6, 7, 8, 9, 10])
    check_hits(s, p.parse("date:{20051006 20051010}"), [7, 8, 9])


def test_typed_range_query(conformance_searcher):
    # test_search.c:1272-1422
    from ferret_ray.search.query import TypedRangeQuery

    s = conformance_searcher
    trq = lambda *a: TypedRangeQuery("number", *a)  # noqa: E731
    check_hits(s, trq("-1.0", "1.0", True, True), [0, 1, 4, 10, 15, 17])
    check_hits(s, trq("-1.0", "1.0", False, False), [0, 1, 4, 15])
    check_hits(s, trq("-1.0", "1.0", False, True), [0, 1, 4, 10, 15])
    check_hits(s, trq("-1.0", "1.0", True, False), [0, 1, 4, 15, 17])
    # field with no numbers
    check_hits(
        s, TypedRangeQuery("field", "-1.0", "1.0", False, True), []
    )
    check_hits(s, trq("1.0", "10", False, True), [6, 7, 9, 12])
    check_hits(s, trq(None, "0", False, True), [1, 5, 11, 15, 16, 17])
    check_hits(s, trq(None, "0", False, False), [5, 11, 15, 16, 17])
    check_hits(
        s, trq("0", None, True, False),
        [0, 1, 2, 3, 4, 6, 7, 8, 9, 10, 12, 13, 14],
    )
    check_hits(
        s, trq("0", None, False, False),
        [0, 2, 3, 4, 6, 7, 8, 9, 10, 12, 13, 14],
    )
    check_hits(s, trq("10051006", "10051010", False, False), [])
    check_hits(s, trq("-12518421", "-12518420", True, True), [])
    # string bounds -> plain range query
    check_hits(
        s, TypedRangeQuery("cat", "cat2", None, True, False),
        [5, 6, 7, 8, 9, 10, 11, 12],
    )
    check_hits(
        s, TypedRangeQuery("field", "word1", "word3", True, True),
        list(range(18)),
    )
