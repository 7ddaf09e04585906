"""Concurrent searchers over one shared reader (the reference's
threading tests, ruby/test/threading/: threads may share an IndexReader;
results must be identical and caches must not corrupt)."""

import os
import threading

import pytest


@pytest.fixture(scope="module")
def shared_searcher(ray_session, tmp_path_factory):
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import source_code_config
    from ferret_ray.sources.corpus import generate_corpus
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    tmp = str(tmp_path_factory.mktemp("thr"))
    corpus = os.path.join(tmp, "c.parquet")
    generate_corpus(corpus, 2000, rows_per_fragment=500)
    idx = os.path.join(tmp, "idx")
    build_index(corpus, idx, source_code_config(num_shards=8))
    return Searcher(IndexReader(idx))


def test_concurrent_searches_identical(shared_searcher):
    from ferret_ray.search.query import (
        BooleanQuery,
        PhraseQuery,
        PrefixQuery,
        TermQuery,
    )

    s = shared_searcher

    def mk_queries():
        bq = BooleanQuery()
        bq.add(TermQuery("content", "int"))
        bq.add(TermQuery("content", "return"))
        ph = PhraseQuery("content")
        ph.add_term("int").add_term("tok0")
        return [
            TermQuery("content", "int"),
            TermQuery("content", "tok7"),
            bq,
            PrefixQuery("content", "tok12"),
            ph,
        ]

    baseline = [
        [(h.doc, h.score) for h in s.search(q, 0, 10).hits]
        for q in mk_queries()
    ]

    errors: list[BaseException] = []
    mismatches: list[int] = []

    def worker(tid: int):
        try:
            for _ in range(8):
                for qi, q in enumerate(mk_queries()):
                    got = [
                        (h.doc, h.score)
                        for h in s.search(q, 0, 10).hits
                    ]
                    if got != baseline[qi]:
                        mismatches.append(qi)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=worker, args=(t,)) for t in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:3]
    assert not mismatches
