"""Multi-valued fields (DocField semantics, c/src/index.c:5565-5640):
positions continue across values with NO gap — phrases can match across
value boundaries; keyword values index at their value ordinal; norms
count tokens across all values."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def mv_searcher(ray_session, tmp_path_factory):
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    tmp = str(tmp_path_factory.mktemp("mv"))
    corpus = os.path.join(tmp, "c.parquet")
    pq.write_table(
        pa.table(
            {
                "body": pa.array(
                    [
                        ["alpha beta", "gamma delta"],
                        ["epsilon"],
                        ["alpha", "beta gamma"],
                    ],
                    type=pa.list_(pa.string()),
                ),
                "tags": pa.array(
                    [["red", "blue"], ["blue"], ["green", "red", "blue"]],
                    type=pa.list_(pa.string()),
                ),
            }
        ),
        corpus,
    )
    cfg = IndexConfig(
        fields={
            "body": FieldConfig(analyzer="whitespace"),
            "tags": FieldConfig(analyzer="keyword", positions=True),
        },
        num_shards=2,
    )
    idx = os.path.join(tmp, "idx")
    build_index(corpus, idx, cfg)
    return Searcher(IndexReader(idx))


def test_terms_across_values(mv_searcher):
    from ferret_ray.search.query import TermQuery

    s = mv_searcher
    assert s.search(TermQuery("body", "gamma"), 0, 10).total_hits == 2
    assert s.search(TermQuery("tags", "blue"), 0, 10).total_hits == 3
    assert s.search(TermQuery("tags", "green"), 0, 10).total_hits == 1


def test_positions_continue_across_values(mv_searcher):
    from ferret_ray.search.query import PhraseQuery

    s = mv_searcher
    # doc 0: values "alpha beta" + "gamma delta" -> positions
    # alpha=0 beta=1 gamma=2 delta=3: the phrase "beta gamma" crosses
    # the value boundary and MUST match (reference semantics: no gap)
    ph = PhraseQuery("body")
    ph.add_term("beta").add_term("gamma")
    td = s.search(ph, 0, 10)
    assert sorted(h.doc for h in td.hits) == [0, 2]

    # keyword values take their value ordinal as position
    p = s.reader.postings("tags", "red")
    rows = {int(d): s.reader.positions_for(p, [i])[0].tolist()
            for i, d in enumerate(p.docs)}
    assert rows[0] == [0]   # first value of doc 0
    assert rows[2] == [1]   # second value of doc 2


def test_norms_count_all_values(mv_searcher):
    s = mv_searcher
    lens = s.reader.doc_lens("body")
    assert lens.tolist() == [4, 1, 3]
    # stored multi-valued field round-trips as a list
    doc = s.reader.get_doc(0)
    assert doc["body"] == ["alpha beta", "gamma delta"]
