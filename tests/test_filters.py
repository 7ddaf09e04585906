"""Filter conformance (/root/reference/c/test/test_filter.c)."""

import os

import pytest

from ferret_ray.search.filters import QueryFilter, RangeFilter
from ferret_ray.search.query import (
    SHOULD,
    BooleanQuery,
    MatchAllQuery,
    TermQuery,
)

DATA = [
    ("0", "20040601", "on"),
    ("1", "20041001", "off"),
    ("2", "20051101", "on"),
    ("3", "20041201", "off"),
    ("4", "20051101", "on"),
    ("5", "20041201", "off"),
    ("6", "20050101", "on"),
    ("7", "20040701", "off"),
    ("8", "20050301", "on"),
    ("9", "20050401", "off"),
]


@pytest.fixture(scope="module")
def filter_searcher(ray_session, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    tmp = str(tmp_path_factory.mktemp("filt"))
    corpus = os.path.join(tmp, "c.parquet")
    pq.write_table(
        pa.table(
            {
                "num": [d[0] for d in DATA],
                "date": [d[1] for d in DATA],
                "flipflop": [d[2] for d in DATA],
                "boost": [float(i + 1) for i in range(len(DATA))],
            }
        ),
        corpus,
    )
    fc = lambda: FieldConfig(analyzer="whitespace")  # noqa: E731
    cfg = IndexConfig(
        fields={"num": fc(), "date": fc(), "flipflop": fc()},
        boost_column="boost",
        num_shards=2,
    )
    idx = os.path.join(tmp, "idx")
    build_index(corpus, idx, cfg)
    return Searcher(IndexReader(idx))


def check_filtered(searcher, q, f, pf, expected, ordered=False):
    td = searcher.search(q, 0, len(expected) + 1, filter=f, post_filter=pf)
    assert td.total_hits == len(expected)
    got = [h.doc for h in td.hits]
    if ordered:
        assert got == expected
    else:
        assert sorted(got) == sorted(expected)


def test_range_filter(filter_searcher):
    s = filter_searcher
    q = MatchAllQuery()
    cases = [
        (("2", "6", True, True), [2, 3, 4, 5, 6],
         "RangeFilter< num:[2 6] >"),
        (("2", "6", True, False), [2, 3, 4, 5],
         "RangeFilter< num:[2 6} >"),
        (("2", "6", False, True), [3, 4, 5, 6],
         "RangeFilter< num:{2 6] >"),
        (("2", "6", False, False), [3, 4, 5],
         "RangeFilter< num:{2 6} >"),
        (("6", None, True, False), [6, 7, 8, 9],
         "RangeFilter< num:[6> >"),
        (("6", None, False, False), [7, 8, 9],
         "RangeFilter< num:{6> >"),
        ((None, "2", False, True), [0, 1, 2],
         "RangeFilter< num:<2] >"),
        ((None, "2", False, False), [0, 1],
         "RangeFilter< num:<2} >"),
    ]
    for args, expected, to_s in cases:
        rf = RangeFilter("num", *args)
        assert rf.to_s() == to_s
        check_filtered(s, q, rf, None, expected)


def test_query_filter(filter_searcher):
    s = filter_searcher
    q = MatchAllQuery()
    qf = QueryFilter(TermQuery("flipflop", "on"))
    assert qf.to_s() == "QueryFilter< flipflop:on >"
    check_filtered(s, q, qf, None, [0, 2, 4, 6, 8])

    bq = BooleanQuery()
    bq.add(TermQuery("date", "20051101"), SHOULD)
    bq.add(TermQuery("date", "20041201"), SHOULD)
    qf = QueryFilter(bq)
    assert qf.to_s() == "QueryFilter< date:20051101 date:20041201 >"
    check_filtered(s, q, qf, None, [2, 3, 4, 5])


def test_filter_func(filter_searcher):
    s = filter_searcher
    q = MatchAllQuery()

    def odd_number_filter(doc, score):
        return 1.0 if doc % 2 == 0 else 0.0

    check_filtered(s, q, None, odd_number_filter, [0, 2, 4, 6, 8])
    rf = RangeFilter("num", "2", "6", True, True)
    check_filtered(s, q, rf, odd_number_filter, [2, 4, 6])


def test_score_altering_filter_func(filter_searcher):
    s = filter_searcher
    q = MatchAllQuery()
    start = 7

    def distance_filter(doc, score):
        return 1.0 / (1 + (start - doc) * (start - doc))

    check_filtered(
        s, q, None, distance_filter,
        [7, 6, 8, 5, 9, 4, 3, 2, 1, 0], ordered=True,
    )
    rf = RangeFilter("num", "4", "8", True, True)
    check_filtered(s, q, rf, distance_filter, [7, 6, 8, 5, 4], ordered=True)


def test_constant_score_and_filtered_query(filter_searcher):
    from ferret_ray.search.query import ConstantScoreQuery, FilteredQuery

    s = filter_searcher
    csq = ConstantScoreQuery(RangeFilter("num", "2", "6", True, True))
    td = s.search(csq, 0, 10)
    assert sorted(h.doc for h in td.hits) == [2, 3, 4, 5, 6]
    assert len({h.score for h in td.hits}) == 1  # constant

    fq = FilteredQuery(
        TermQuery("flipflop", "on"),
        RangeFilter("num", "2", "6", True, True),
    )
    td = s.search(fq, 0, 10)
    assert sorted(h.doc for h in td.hits) == [2, 4, 6]
