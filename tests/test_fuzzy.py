"""FuzzyQuery conformance (/root/reference/c/test/test_q_fuzzy.c:28-115)."""

import os

import pytest

from ferret_ray.search.query import FuzzyQuery
from tests.test_search_conformance import check_hits

DOCS = [
    "aaaaa", "aaaab", "aaabb", "aabbb", "abbbb", "bbbbb", "ddddd",
    "ddddddddddddddddddddd",      # test max_distances problem
    "aaaaaaaaaaaaaaaaaaaaaaa",    # test max_distances problem
]


@pytest.fixture(scope="module")
def fuzzy_searcher(ray_session, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    tmp = str(tmp_path_factory.mktemp("fuzzy"))
    corpus = os.path.join(tmp, "c.parquet")
    pq.write_table(pa.table({"field": DOCS}), corpus)
    cfg = IndexConfig(
        fields={"field": FieldConfig(analyzer="whitespace")}, num_shards=2
    )
    idx = os.path.join(tmp, "idx")
    build_index(corpus, idx, cfg)
    return Searcher(IndexReader(idx))


def fq(term, min_sim=0.5, pre_len=0, max_terms=10):
    return FuzzyQuery("field", term, min_sim=min_sim, pre_len=pre_len,
                      max_terms=max_terms)


def test_fuzziness(fuzzy_searcher):
    s = fuzzy_searcher
    check_hits(s, fq("aaaaa", 0.0, 5), [0])
    check_hits(s, FuzzyQuery("not a field", "aaaaa"), [])

    # prefix-length ladder (:65-73)
    check_hits(s, fq("aaaaaaaaaaaaaaaaaaaaaa", 0.0, 1), [8])
    check_hits(s, fq("aaaaa", 0.0, 0), [0, 1, 2])
    check_hits(s, fq("aaaaa", 0.0, 1), [0, 1, 2])
    check_hits(s, fq("aaaaa", 0.0, 2), [0, 1, 2])
    check_hits(s, fq("aaaaa", 0.0, 3), [0, 1, 2])
    check_hits(s, fq("aaaaa", 0.0, 4), [0, 1])
    check_hits(s, fq("aaaaa", 0.0, 5), [0])
    check_hits(s, fq("aaaaa", 0.0, 6), [0])
    check_hits(s, fq("aaaaaaa", 0.0, 5), [0])

    # minimum-similarity ladder (:76-79)
    check_hits(s, fq("aaaaa", 0.2, 0), [0, 1, 2, 3])
    check_hits(s, fq("aaaaa", 0.4, 1), [0, 1, 2])
    check_hits(s, fq("aaaaa", 0.6, 1), [0, 1])
    check_hits(s, fq("aaaaa", 0.8, 1), [0])

    check_hits(s, fq("xxxxx", 0.0, 0), [])
    check_hits(s, fq("aaccc", 0.0, 0), [])

    # non-existing term "aaaac" (:90-96)
    check_hits(s, fq("aaaac", 0.0, 0), [0, 1, 2])
    check_hits(s, fq("aaaac", 0.0, 1), [0, 1, 2])
    check_hits(s, fq("aaaac", 0.0, 2), [0, 1, 2])
    check_hits(s, fq("aaaac", 0.0, 3), [0, 1, 2])
    check_hits(s, fq("aaaac", 0.0, 4), [0, 1])
    check_hits(s, fq("aaaac", 0.0, 5), [])

    # long-string non-matching (:99-104)
    for pl in range(5):
        check_hits(s, fq("ddddX", 0.0, pl), [6])
    check_hits(s, fq("ddddX", 0.0, 5), [])

    td = fuzzy_searcher.search(
        FuzzyQuery("anotherfield", "ddddX", min_sim=0.0, pre_len=10,
                   max_terms=100), 0, 1
    )
    assert td.total_hits == 0


def test_fuzzy_to_s():
    from ferret_ray.search.fql import to_s

    assert to_s(fq("aaaaa"), "field") == "aaaaa~"
    q = fq("aaaaa", min_sim=0.4)
    q.boost = 2.0
    assert to_s(q, None) == "field:aaaaa~0.4^2.0"
