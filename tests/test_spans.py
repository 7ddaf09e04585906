"""Span query conformance (/root/reference/c/test/test_q_span.c:24-560)."""

import os

import pytest

from ferret_ray.search.spans import (
    SpanFirstQuery,
    SpanMultiTermQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanPrefixQuery,
    SpanTermQuery,
)
from tests.test_search_conformance import check_hits

DATA = [
    "start finish one two three four five six seven",
    "start one finish two three four five six seven",
    "start one two finish three four five six seven flip",
    "start one two three finish four five six seven",
    "start one two three four finish five six seven flip",
    "start one two three four five finish six seven",
    "start one two three four five six finish seven eight",
    "start one two three four five six seven finish eight nine",
    "start one two three four five six finish seven eight",
    "start one two three four five finish six seven",
    "start one two three four finish five six seven",
    "start one two three finish four five six seven",
    "start one two finish three four five six seven flop",
    "start one finish two three four five six seven",
    "start finish one two three four five six seven toot",
    "start start  one two three four five six seven",
    "finish start one two three four five six seven flip flop",
    "finish one start two three four five six seven",
    "finish one two start three four five six seven",
    "finish one two three start four five six seven flip",
    "finish one two three four start five six seven",
    "finish one two three four five start six seven flip flop",
    "finish one two three four five six start seven eight",
    "finish one two three four five six seven start eight nine",
    "finish one two three four five six start seven eight",
    "finish one two three four five start six seven",
    "finish one two three four start five six seven",
    "finish one two three start four five six seven flop",
    "finish one two start three four five six seven",
    "finish one start two three four five six seven flip",
    "finish start one two three four five six seven",
]


@pytest.fixture(scope="module")
def span_searcher(ray_session, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    tmp = str(tmp_path_factory.mktemp("span"))
    corpus = os.path.join(tmp, "c.parquet")
    pq.write_table(pa.table({"field": DATA}), corpus)
    cfg = IndexConfig(
        fields={"field": FieldConfig(analyzer="whitespace")}, num_shards=2
    )
    idx = os.path.join(tmp, "idx")
    build_index(corpus, idx, cfg)
    return Searcher(IndexReader(idx))


def test_span_term(span_searcher):
    s = span_searcher
    check_hits(s, SpanTermQuery("notafield", "nine"), [])
    check_hits(s, SpanTermQuery("field", "nine"), [7, 23])
    check_hits(s, SpanTermQuery("field", "eight"), [6, 7, 8, 22, 23, 24])


def test_span_multi_term(span_searcher):
    s = span_searcher
    mtq = SpanMultiTermQuery("notafield")
    check_hits(s, mtq, [])
    mtq.add_term("nine")
    check_hits(s, mtq, [])
    mtq.add_term("finish")
    check_hits(s, mtq, [])

    mtq = SpanMultiTermQuery("field")
    check_hits(s, mtq, [])
    mtq.add_term("nine")
    check_hits(s, mtq, [7, 23])
    mtq.add_term("flop")
    check_hits(s, mtq, [7, 12, 16, 21, 23, 27])
    mtq.add_term("toot")
    check_hits(s, mtq, [7, 12, 14, 16, 21, 23, 27])


def test_span_prefix(span_searcher):
    s = span_searcher
    check_hits(s, SpanPrefixQuery("notafield", "fl"), [])
    check_hits(
        s, SpanPrefixQuery("field", "fl"), [2, 4, 12, 16, 19, 21, 27, 29]
    )


def test_span_first(span_searcher):
    s = span_searcher
    check_hits(
        s, SpanFirstQuery(SpanTermQuery("field", "finish"), 1),
        list(range(16, 31)),
    )
    check_hits(
        s, SpanFirstQuery(SpanTermQuery("field", "finish"), 5),
        [0, 1, 2, 3, 11, 12, 13, 14] + list(range(16, 31)),
    )


def test_span_or(span_searcher):
    s = span_searcher
    q = SpanOrQuery()
    check_hits(s, q, [])
    q.add(SpanTermQuery("field", "flip"))
    check_hits(s, q, [2, 4, 16, 19, 21, 29])
    q.add(SpanTermQuery("field", "flop"))
    check_hits(s, q, [2, 4, 12, 16, 19, 21, 27, 29])


def test_span_near(span_searcher):
    s = span_searcher
    q = SpanNearQuery(slop=0, in_order=True)
    q.add(SpanTermQuery("field", "start"))
    q.add(SpanTermQuery("field", "finish"))
    check_hits(s, q, [0, 14])

    q.in_order = False
    check_hits(s, q, [0, 14, 16, 30])

    q.in_order = True
    q.slop = 1
    check_hits(s, q, [0, 1, 13, 14])

    q.in_order = False
    check_hits(s, q, [0, 1, 13, 14, 16, 17, 29, 30])

    q.in_order = True
    q.slop = 4
    check_hits(s, q, [0, 1, 2, 3, 4, 10, 11, 12, 13, 14])

    q.in_order = False
    check_hits(
        s, q,
        [0, 1, 2, 3, 4, 10, 11, 12, 13, 14, 16, 17, 18, 19, 20, 26, 27,
         28, 29, 30],
    )

    # prefix clauses (:436-441)
    q = SpanNearQuery(slop=0, in_order=True)
    q.add(SpanPrefixQuery("field", "fi"))
    q.add(SpanPrefixQuery("field", "fin"))
    q.add(SpanPrefixQuery("field", "si"))
    check_hits(s, q, [5, 9, 4, 10])


def test_span_not(span_searcher):
    s = span_searcher
    near0 = SpanNearQuery(slop=4, in_order=True)
    near0.add(SpanTermQuery("field", "start"))
    near0.add(SpanTermQuery("field", "finish"))
    near1 = SpanNearQuery(slop=4, in_order=True)
    near1.add(SpanTermQuery("field", "two"))
    near1.add(SpanTermQuery("field", "five"))
    check_hits(s, SpanNotQuery(near0, near1), [0, 1, 13, 14])

    near0 = SpanNearQuery(slop=4, in_order=False)
    near0.add(SpanTermQuery("field", "start"))
    near0.add(SpanTermQuery("field", "finish"))
    check_hits(
        s, SpanNotQuery(near0, near1),
        [0, 1, 13, 14, 16, 17, 29, 30],
    )

    near0 = SpanNearQuery(slop=4, in_order=True)
    near0.add(SpanTermQuery("field", "start"))
    near0.add(SpanTermQuery("field", "two"))
    near1 = SpanNearQuery(slop=8, in_order=False)
    near1.add(SpanTermQuery("field", "finish"))
    near1.add(SpanTermQuery("field", "five"))
    check_hits(
        s, SpanNotQuery(near0, near1),
        [2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 15],
    )
