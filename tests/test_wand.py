"""Block-max WAND: identical top-k to the exhaustive scorer + real pruning."""

import numpy as np
import pytest

from ferret_ray.search.query import SHOULD, BooleanQuery, TermQuery
from ferret_ray.search.wand import wand_topk


def _exhaustive(searcher, field, terms, k):
    bq = BooleanQuery(coord_disabled=True)
    for t in terms:
        bq.add(TermQuery(field, t), SHOULD)
    td = searcher.search(bq, 0, k)
    return [(h.doc, h.score) for h in td.hits]


@pytest.mark.parametrize(
    "terms,k",
    [
        (["word1", "word2"], 5),
        (["word1", "word2", "word3"], 10),
        (["quick", "brown", "fox"], 4),
        (["one", "two", "x"], 3),
        (["missing_term", "word2"], 5),
    ],
)
def test_wand_matches_exhaustive(conformance_searcher, terms, k):
    want = _exhaustive(conformance_searcher, "field", terms, k)
    res = wand_topk(conformance_searcher, "field", terms, k)
    got = [(d, np.float32(s)) for d, s in res.hits]
    want32 = [(d, np.float32(s)) for d, s in want]
    assert got == want32


def test_wand_prunes(ray_session, tmp_path_factory):
    """On a larger skewed corpus WAND must skip scoring many docs."""
    import os

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import source_code_config
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher
    from ferret_ray.sources.corpus import generate_corpus

    tmp = str(tmp_path_factory.mktemp("wand"))
    corpus = os.path.join(tmp, "c.parquet")
    generate_corpus(corpus, 3000, rows_per_fragment=500)
    idx = os.path.join(tmp, "idx")
    build_index(corpus, idx, source_code_config(num_shards=8))
    s = Searcher(IndexReader(idx))

    terms = ["int", "return", "tok3", "tok999"]
    k = 10
    want = _exhaustive(s, "content", terms, k)
    res = wand_topk(s, "content", terms, k)
    got = [(d, np.float32(sc)) for d, sc in res.hits]
    assert got == [(d, np.float32(sc)) for d, sc in want]
    # pruning actually happened: far fewer docs scored than candidates
    union = len(
        np.union1d(
            *[s.reader.postings("content", t).docs for t in terms[:2]]
        )
    )
    assert res.stats["docs_scored"] < union
