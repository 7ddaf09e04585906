"""Skew handling: the salted term-hash shuffle must be score-invariant.

Build the 18-doc conformance corpus with a tiny ``salt_doc_range`` so every
term's postings split across several doc-range files; searches must return
identical hits AND identical float32 scores to the unsalted index (df sums
across blocks, postings concatenate in doc order)."""

import pytest

from ferret_ray.search.query import (
    MUST,
    BooleanQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)


@pytest.fixture(scope="module")
def salted_searcher(ray_session, tmp_path_factory):
    import os

    from ferret_ray.fixtures import (
        conformance_config,
        write_conformance_corpus,
    )
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    tmp = str(tmp_path_factory.mktemp("salted"))
    corpus = write_conformance_corpus(os.path.join(tmp, "c.parquet"))
    # need multiple fragments for multiple doc ranges: rewrite with small
    # row groups
    import pyarrow.parquet as pq

    t = pq.read_table(corpus)
    pq.write_table(t, corpus, row_group_size=5)

    cfg = conformance_config(salt_doc_range=5)
    index_dir = os.path.join(tmp, "idx")
    build_index(corpus, index_dir, cfg)
    reader = IndexReader(index_dir)
    # 18 docs / 5-doc ranges -> 4 ranges -> more than num_shards files
    assert len(reader.manifest["shards"]) > cfg.num_shards
    return Searcher(reader)


def _q(term):
    return TermQuery("field", term)


def test_salted_hits_and_scores(conformance_searcher, salted_searcher):
    queries = [
        _q("word1"),
        _q("word2"),
        BooleanQuery().add(_q("word1"), MUST).add(_q("word3"), MUST),
        PhraseQuery("field").add_term("quick").add_term("brown").add_term(
            "fox"
        ),
        PrefixQuery("cat", "cat1/sub"),
    ]
    for q in queries:
        a = conformance_searcher.search(q, 0, 20)
        b = salted_searcher.search(q, 0, 20)
        assert a.total_hits == b.total_hits
        assert [(h.doc, h.score) for h in a.hits] == [
            (h.doc, h.score) for h in b.hits
        ]


def test_salted_df(conformance_searcher, salted_searcher):
    for term in ("word1", "word2", "word3", "quick"):
        assert conformance_searcher.doc_freq(
            "field", term
        ) == salted_searcher.doc_freq("field", term)
