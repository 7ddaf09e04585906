"""Deletion tombstones (iw_delete_term semantics, c/src/index.c:6366-6437)."""

import os

import pytest

from ferret_ray.pipelines.deletes import delete_by_term, delete_docs
from ferret_ray.search.query import MatchAllQuery, TermQuery


@pytest.fixture
def del_index(ray_session, tmp_path_factory):
    from ferret_ray.fixtures import build_conformance_index

    tmp = tmp_path_factory.mktemp("del")
    return build_conformance_index(str(tmp))


def _searcher(index_dir):
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    return Searcher(IndexReader(index_dir))


def test_delete_docs_and_term(del_index):
    s = _searcher(del_index)
    assert s.search(TermQuery("field", "word2"), 0, 10).total_hits == 3

    delete_docs(del_index, [4])
    s = _searcher(del_index)
    td = s.search(TermQuery("field", "word2"), 0, 10)
    assert sorted(h.doc for h in td.hits) == [1, 8]
    # max_doc unchanged until compaction; num_docs excludes tombstones
    assert s.max_doc() == 18
    assert s.num_docs() == 17

    # delete every doc containing word3
    n = delete_by_term(del_index, "field", "word3")
    assert n == 6
    s = _searcher(del_index)
    assert s.search(TermQuery("field", "word3"), 0, 10).total_hits == 0
    td = s.search(MatchAllQuery(), 0, 20)
    assert td.total_hits == 18 - 7  # doc 4 + the 6 word3 docs

    # WAND honors tombstones too
    from ferret_ray.search.wand import wand_topk

    # doc 8 contains word3 so it was tombstoned as well
    res = wand_topk(s, "field", ["word2", "word3"], k=10)
    assert sorted(d for d, _ in res.hits) == [1]
