"""Sort/SortField conformance (/root/reference/c/test/test_sort.c:28-300)."""

import os

import pytest

from ferret_ray.search.query import TermQuery
from ferret_ray.search.searcher import SortField

DATA = [
    ("findall", "a", "6", "0.01"),
    ("findall", "c", "5", "0.1"),
    ("findall", "e", "2", "0.001"),
    ("findall", "g", "1", "1.0"),
    ("findall", "i", "3", "0.0001"),
    ("findall", "", "4", "10.0"),
    ("findall", "h", "5", "0.00001"),
    ("findall", "f", "2", "100.0"),
    ("findall", "d", "3", "1000.0"),
    ("findall", "b", "4", "0.000001"),
]


@pytest.fixture(scope="module")
def sort_searcher(ray_session, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    tmp = str(tmp_path_factory.mktemp("sort"))
    corpus = os.path.join(tmp, "c.parquet")
    pq.write_table(
        pa.table(
            {
                "search": [d[0] for d in DATA],
                "string": [d[1] for d in DATA],
                "integer": [d[2] for d in DATA],
                "flt": [d[3] for d in DATA],
                "boost": [float(d[3]) for d in DATA],
            }
        ),
        corpus,
    )
    fc = lambda: FieldConfig(analyzer="whitespace")  # noqa: E731
    cfg = IndexConfig(
        fields={"search": fc(), "string": fc(), "integer": fc(),
                "flt": fc()},
        boost_column="boost",
        num_shards=2,
    )
    idx = os.path.join(tmp, "idx")
    build_index(corpus, idx, cfg)
    return Searcher(IndexReader(idx))


def check_order(searcher, expected, sort):
    q = TermQuery("search", "findall")
    td = searcher.search(q, 0, len(expected), sort=sort)
    assert [h.doc for h in td.hits] == expected, sort


def test_sorts(sort_searcher):
    s = sort_searcher
    # relevance (doc boost dominates): test_sort.c:232
    check_order(s, [8, 7, 5, 3, 1, 0, 2, 4, 6, 9], None)
    check_order(s, [8, 7, 5, 3, 1, 0, 2, 4, 6, 9],
                [SortField(None, "score")])
    check_order(s, [9, 6, 4, 2, 0, 1, 3, 5, 7, 8],
                [SortField(None, "score", reverse=True)])

    check_order(s, list(range(10)), [SortField(None, "doc")])
    check_order(s, list(range(9, -1, -1)),
                [SortField(None, "doc", reverse=True)])

    # integer sort (:246-253)
    check_order(s, [0, 1, 6, 5, 9, 4, 8, 2, 7, 3],
                [SortField("integer", "integer", reverse=True)])
    check_order(s, [0, 1, 6, 5, 9, 8, 4, 7, 2, 3],
                [SortField("integer", "integer", reverse=True),
                 SortField(None, "score")])
    check_order(s, [3, 2, 7, 4, 8, 5, 9, 1, 6, 0],
                [SortField("integer", "integer")])
    check_order(s, [3, 7, 2, 8, 4, 5, 9, 1, 6, 0],
                [SortField("integer", "integer"),
                 SortField(None, "score")])

    # float sort (:268-272)
    check_order(s, [9, 6, 4, 2, 0, 1, 3, 5, 7, 8],
                [SortField("flt", "float")])
    check_order(s, [8, 7, 5, 3, 1, 0, 2, 4, 6, 9],
                [SortField("flt", "float", reverse=True)])

    # string sort; doc 5 has "" -> sorts greatest asc (:275-279)
    check_order(s, [0, 9, 1, 8, 2, 7, 3, 6, 4, 5],
                [SortField("string", "string")])
    check_order(s, [5, 4, 6, 3, 7, 2, 8, 1, 9, 0],
                [SortField("string", "string", reverse=True)])

    # byte sort: term-ordinal cache (c/src/field_index.c:95-129); the
    # missing value (doc 5) gets ordinal 0 -> sorts SMALLEST ascending,
    # unlike the string index
    check_order(s, [5, 0, 9, 1, 8, 2, 7, 3, 6, 4],
                [SortField("string", "byte")])
    check_order(s, [4, 6, 3, 7, 2, 8, 1, 9, 0, 5],
                [SortField("string", "byte", reverse=True)])

    # auto sniffing (:290-305)
    check_order(s, [0, 9, 1, 8, 2, 7, 3, 6, 4, 5],
                [SortField("string", "auto")])
    check_order(s, [3, 2, 7, 4, 8, 5, 9, 1, 6, 0],
                [SortField("integer", "auto")])
    check_order(s, [9, 6, 4, 2, 0, 1, 3, 5, 7, 8],
                [SortField("flt", "auto")])
    check_order(s, [8, 7, 5, 3, 1, 0, 2, 4, 6, 9],
                [SortField("flt", "auto", reverse=True)])
    check_order(s, [3, 2, 7, 8, 4, 9, 5, 1, 6, 0],
                [SortField("integer", "auto"),
                 SortField("string", "auto")])


def test_sort_field_repr():
    assert repr(SortField.SCORE) == "<SCORE>"
    assert repr(SortField(None, "doc", True)) == "<DOC>!"
    assert repr(SortField("date", "integer")) == "date:<integer>"
    assert repr(SortField("price", "float", True)) == "price:<float>!"
