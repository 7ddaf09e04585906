"""Bit-exact rank/score identity vs the compiled reference at 5,000 docs.

Same method as test_reference_scores.py, but over the synthetic 5,000-doc
code corpus (83k-term vocabulary, realistic df/N magnitudes, score-cache
>=32-freq paths): the reference indexed the identical lines with its
whitespace analyzer and dumped top-20 float32 scores per query.
"""

import json
import os

import numpy as np
import pytest

from ferret_ray.search.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)

GOLDEN_PATH = os.path.join(
    os.path.dirname(__file__), "goldens_reference_scores_5k.jsonl"
)
GOLDENS = [json.loads(line) for line in open(GOLDEN_PATH)]


@pytest.fixture(scope="module")
def big_searcher(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher
    from ferret_ray.sources.corpus import ensure_corpus

    corpus = ensure_corpus(5000, rows_per_fragment=2000)
    # flatten newlines exactly like the reference's line-based ingest
    t = pq.read_table(corpus, columns=["content"])
    flat = [s.replace("\n", " ") for s in t.column("content").to_pylist()]
    tmp = str(tmp_path_factory.mktemp("ref5k"))
    import pyarrow as pa

    path = os.path.join(tmp, "corpus.parquet")
    pq.write_table(pa.table({"content": flat}), path,
                   row_group_size=1000)
    idx = os.path.join(tmp, "idx")
    cfg = IndexConfig(
        fields={"content": FieldConfig(analyzer="whitespace",
                                       stored=False)},
        num_shards=16,
    )
    build_index(path, idx, cfg)
    return Searcher(IndexReader(idx))


def build_queries():
    b1 = BooleanQuery()
    b1.add(TermQuery("content", "int"), MUST)
    b1.add(TermQuery("content", "return"), MUST)
    b2 = BooleanQuery()
    for t in ("tok5", "tok17", "tok99"):
        b2.add(TermQuery("content", t), SHOULD)
    b3 = BooleanQuery()
    b3.add(TermQuery("content", "tok3"), MUST)
    b3.add(TermQuery("content", "the"), MUST_NOT)
    p1 = PhraseQuery("content")
    p1.add_term("int").add_term("the")
    p2 = PhraseQuery("content")
    p2.add_term("class").add_term("def")
    p2.slop = 3
    return {
        "term:int": TermQuery("content", "int"),
        "term:tok3": TermQuery("content", "tok3"),
        "term:tok999": TermQuery("content", "tok999"),
        "term:fn_12": TermQuery("content", "fn_12"),
        "term:e-mail": TermQuery("content", "e-mail"),
        "bool:+int +return": b1,
        "bool:tok5 tok17 tok99": b2,
        "bool:+tok3 -the": b3,
        "phrase:int the": p1,
        "phrase:class def~3": p2,
        "prefix:tok123": PrefixQuery("content", "tok123"),
    }


def _within_one_ulp(a: np.float32, b: np.float32) -> bool:
    if a == b:
        return True
    lo, hi = (a, b) if a < b else (b, a)
    return np.nextafter(lo, np.float32(np.inf)) >= hi


@pytest.mark.parametrize(
    "golden", GOLDENS, ids=[g["query"] for g in GOLDENS]
)
def test_reference_score_identity_5k(big_searcher, golden):
    """Scores must match the reference to within 1 float32 ulp.

    Exact equality cannot be demanded for multi-SHOULD sums: the
    reference's DisjunctionSumScorer adds clause scores in priority-queue
    order, which varies per doc with heap history — we observed the
    reference itself scoring two docs with identical freqs and norms 1 ulp
    apart in the same result list.  Our fixed clause-order summation is
    one of the associations the reference realizes.  Everything
    single-clause is still bit-exact (and the whole 18-doc suite in
    test_reference_scores.py is bit-exact)."""
    q = build_queries()[golden["query"]]
    td = big_searcher.search(q, 0, 20)
    assert td.total_hits == golden["total"], golden["query"]
    got = {h.doc: np.float32(h.score) for h in td.hits}
    want = {d: np.float32(s) for d, s in golden["hits"]}
    # per-doc score agreement within 1 ulp (docs in both lists)
    for d in got.keys() & want.keys():
        assert _within_one_ulp(got[d], want[d]), (
            golden["query"], d, got[d], want[d]
        )
    # doc-set agreement: any symmetric difference must sit at the top-20
    # boundary within 1 ulp of the cutoff score
    cutoff = np.float32(golden["hits"][-1][1])
    for d in got.keys() ^ want.keys():
        sc = got.get(d, want.get(d))
        assert _within_one_ulp(np.float32(sc), cutoff), (
            golden["query"], d, sc, cutoff
        )
    # ranking agreement up to reorderings among ulp-tied scores
    got_rank = [h.doc for h in td.hits]
    want_rank = [d for d, _ in golden["hits"]]
    for i, (gd, wd) in enumerate(zip(got_rank, want_rank)):
        if gd != wd:
            assert _within_one_ulp(
                np.float32(got[gd]), np.float32(want[wd])
            ), (golden["query"], i, gd, wd)


BOOL_QUERIES = [k for k in build_queries() if k.startswith("bool:")]


@pytest.mark.parametrize("name", BOOL_QUERIES)
def test_boolean_dense_sparse_parity(big_searcher, name):
    """The dense scatter-add boolean path (searcher._boolean_dense) must
    be bit-identical to the sparse intersect/searchsorted path — same
    docs, same float32 scores, same ranks.  The dense gate captures
    every corpus under 4M docs, so the sparse path is exercised here
    explicitly via the test hook."""
    from ferret_ray.search.searcher import Searcher

    q = build_queries()[name]
    dense = big_searcher.search(q, 0, 50)
    try:
        Searcher._force_sparse_boolean = True
        sparse = big_searcher.search(q, 0, 50)
    finally:
        Searcher._force_sparse_boolean = False
    assert dense.total_hits == sparse.total_hits
    assert [h.doc for h in dense.hits] == [h.doc for h in sparse.hits]
    assert [np.float32(h.score) for h in dense.hits] == [
        np.float32(h.score) for h in sparse.hits
    ]
