"""MultiSearcher: N sub-indexes == one combined index, bit-exact
(tc_multi_searcher.rb / c/src/search.c:1290-1750 semantics)."""

import os

import numpy as np
import pytest

from ferret_ray.search.query import (
    MUST,
    SHOULD,
    BooleanQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)


@pytest.fixture(scope="module")
def split_searcher(ray_session, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferret_ray.fixtures import (
        SEARCH_TEST_DATA,
        conformance_config,
    )
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.search.multi import multi_searcher

    tmp = str(tmp_path_factory.mktemp("multi"))
    dirs = []
    for part, rows in enumerate(
        (SEARCH_TEST_DATA[:10], SEARCH_TEST_DATA[10:])
    ):
        corpus = os.path.join(tmp, f"c{part}.parquet")
        base = 0 if part == 0 else 10
        pq.write_table(
            pa.table(
                {
                    "date": [d[0] for d in rows],
                    "field": [d[1] for d in rows],
                    "cat": [d[2] for d in rows],
                    "number": [d[3] for d in rows],
                    "boost": [
                        float(base + i + 1) for i in range(len(rows))
                    ],
                }
            ),
            corpus,
        )
        idx = os.path.join(tmp, f"idx{part}")
        build_index(corpus, idx, conformance_config(num_shards=2))
        dirs.append(idx)
    return multi_searcher(dirs)


QUERIES = [
    TermQuery("field", "word1"),
    TermQuery("field", "word2"),
    TermQuery("field", "quick"),
    PrefixQuery("cat", "cat1/sub"),
    FuzzyQuery("field", "wort", min_sim=0.5),
]


def _bq():
    q = BooleanQuery()
    q.add(TermQuery("field", "word1"), MUST)
    q.add(TermQuery("field", "word3"), MUST)
    q.add(TermQuery("field", "word2"), SHOULD)
    return q


def _phq():
    q = PhraseQuery("field")
    q.add_term("quick").add_term("brown").add_term("fox")
    q.slop = 4
    return q


@pytest.mark.parametrize(
    "query", QUERIES + [_bq(), _phq()],
    ids=lambda q: type(q).__name__ + str(id(q) % 97),
)
def test_multi_equals_single(conformance_searcher, split_searcher, query):
    a = conformance_searcher.search(query, 0, 25)
    b = split_searcher.search(query, 0, 25)
    assert a.total_hits == b.total_hits
    assert [(h.doc, np.float32(h.score)) for h in a.hits] == [
        (h.doc, np.float32(h.score)) for h in b.hits
    ]


def test_multi_stats_and_docs(conformance_searcher, split_searcher):
    s, m = conformance_searcher, split_searcher
    assert m.max_doc() == 18
    for t in ("word1", "word2", "quick"):
        assert m.doc_freq("field", t) == s.doc_freq("field", t)
    assert m.reader.get_doc(12)["date"] == "20051012"
    assert m.reader.get_doc(3)["cat"] == "cat1/sub2"

def test_highlight_over_multireader(ray_session, tmp_path):
    """Highlight on a multi-delta (LSM) index: MultiReader forwards the
    column projection to the owning sub-reader; excerpts identical to a
    combined one-shot index."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.pipelines.lifecycle import IncrementalIndex
    from ferret_ray.schema import FieldConfig, IndexConfig, analyzer_for
    from ferret_ray.search.highlight import highlight
    from ferret_ray.search.query import TermQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    cfg = IndexConfig(
        fields={"content": FieldConfig(analyzer="standard",
                                       term_vector=True)},
        num_shards=2,
    )

    def w(name, texts):
        p = os.path.join(str(tmp_path), name)
        pq.write_table(pa.table({"content": texts}), p)
        return p

    a = w("a.parquet",
          ["the quick brown fox jumps over the lazy dog", "no match"])
    b = w("b.parquet",
          ["another fox ran through the quick grass field today"])
    inc = IncrementalIndex(
        os.path.join(str(tmp_path), "i"), cfg, merge_factor=100
    )
    inc.append(a)
    inc.append(b)
    s = Searcher(inc.reader())
    build_index([a, b], os.path.join(str(tmp_path), "one"), cfg)
    so = Searcher(IndexReader(os.path.join(str(tmp_path), "one")))
    q = TermQuery("content", "fox")
    hits = s.search(q, 0, 10).hits
    assert [h.doc for h in hits] == [0, 2]
    for h in hits:
        an = analyzer_for("standard")
        ex = highlight(s, q, h.doc, "content", an,
                       excerpt_length=30, num_excerpts=1)
        exo = highlight(so, q, h.doc, "content", an,
                        excerpt_length=30, num_excerpts=1)
        assert ex == exo and "<b>fox</b>" in ex[0]


def test_multireader_manifest_unions_fields(ray_session, tmp_path):
    """MultiReader.manifest must union per-field configs across
    sub-readers — with dynamic schemas, fields discovered after the
    first delta exist only in newer deltas (ADVICE r3)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.multi import MultiReader
    from ferret_ray.search.reader import IndexReader

    tmp = str(tmp_path)

    def build(name, cols, cfg_fields):
        p = os.path.join(tmp, name + ".parquet")
        pq.write_table(pa.table(cols), p)
        d = os.path.join(tmp, name)
        build_index(
            p, d,
            IndexConfig(fields=cfg_fields, num_shards=2),
        )
        return d

    d1 = build(
        "a", {"content": ["hello world"]},
        {"content": FieldConfig(analyzer="standard")},
    )
    d2 = build(
        "b",
        {"content": ["hello ray"], "title": ["greetings"]},
        {
            "content": FieldConfig(analyzer="standard"),
            "title": FieldConfig(analyzer="whitespace"),
        },
    )
    mr = MultiReader([IndexReader(d1), IndexReader(d2)])
    fields = mr.manifest["config"]["fields"]
    assert "content" in fields and "title" in fields
    assert fields["title"]["analyzer"] == "whitespace"
