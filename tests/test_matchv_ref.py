"""Match-vector goldens from c/test/test_highlighter.c:150-356.

The reference asserts (start:end) position ranges per query per doc;
our get_match_vector returns a sorted de-duplicated set, so the goldens
normalize the same way (content equality; the compaction the highlighter
applies is order-insensitive).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _mk(tmp, docs, name):
    from ferret_ray.analysis.analyzer import Analyzer
    from ferret_ray.analysis.tokenizer import WhitespaceTokenizer
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    corpus = os.path.join(tmp, f"{name}.parquet")
    pq.write_table(pa.table({"field": list(docs)}), corpus)
    ws = Analyzer(WhitespaceTokenizer(), lowercase=True,
                  stop_words=None, hyphen=False)
    idx = os.path.join(tmp, f"{name}-idx")
    build_index(
        corpus, idx,
        IndexConfig(fields={"field": FieldConfig(analyzer=ws)},
                    num_shards=2),
    )
    return Searcher(IndexReader(idx))


def _g(spec: str):
    """'7:9 12:16' -> sorted set of (start, end) pairs."""
    out = set()
    for part in spec.split():
        a, b = part.split(":")
        out.add((int(a), int(b)))
    return sorted(out)


@pytest.fixture(scope="module")
def envs(ray_session, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("mv"))
    s_term = _mk(tmp, [
        "the phrase has the word rabbit once",
        "rabbit one rabbit two rabbit three rabbit four",
        "Term doesn't appear in this sentence",
    ], "term")
    s_ph = _mk(tmp, [
        "the magic phrase of the day is one two three not three "
        "two one one too three",
        "one two three and again one two three and maybe one more for "
        "good luck one two three",
        "phrase doesn't appear in this sentence",
        "multi phrase quick brown fox fast white wolf agile red fox "
        "quick pink hound",
        "multi phrase with slop brown quick fox the agile beautful and "
        "cunning white wolf",
    ], "phrase")
    s_bool = _mk(tmp, [
        "one and some words and two and three and some more words one two",
    ], "bool")
    return s_term, s_ph, s_bool


def test_term_query_mv(envs):
    from ferret_ray.search.query import TermQuery

    s, _, _ = envs
    q = TermQuery("field", "rabbit")
    assert s.get_match_vector(q, 0, "field") == _g("5:5")
    assert s.get_match_vector(q, 1, "field") == _g("0:0 2:2 4:4 6:6")
    assert s.get_match_vector(q, 2, "field") == []
    assert s.get_match_vector(
        TermQuery("diff_field", "rabbit"), 0, "field"
    ) == []


def test_phrase_query_mv(envs):
    from ferret_ray.search.query import PhraseQuery

    _, s, _ = envs

    def phq(slop=0):
        q = PhraseQuery("field", slop=slop)
        q.add_term("one").add_term("two").add_term("three")
        return q

    assert s.get_match_vector(phq(), 0, "field") == _g("7:9")
    assert s.get_match_vector(phq(), 1, "field") == _g("0:2 5:7 15:17")
    assert s.get_match_vector(phq(), 2, "field") == []
    assert s.get_match_vector(phq(3), 0, "field") == _g("7:9 12:16")
    assert s.get_match_vector(phq(4), 0, "field") == _g(
        "7:9 11:13 12:16"
    )

    # multi-term phrase slots (phq_append_multi_term)
    q = PhraseQuery("field")
    q.add_term("quick")
    q.append_multi_term("fast")
    q.append_multi_term("agile")
    q.add_term("brown")
    q.append_multi_term("pink")
    q.append_multi_term("red")
    q.append_multi_term("white")
    q.add_term("fox")
    q.append_multi_term("wolf")
    q.append_multi_term("hound")
    assert s.get_match_vector(q, 3, "field") == _g("2:4 5:7 8:10 11:13")
    assert s.get_match_vector(q, 4, "field") == []
    q.slop = 2
    assert s.get_match_vector(q, 4, "field") == _g("4:6")
    q.slop = 5
    assert s.get_match_vector(q, 4, "field") == _g("4:6 8:13")


def test_boolean_and_multi_term_mv(envs):
    from ferret_ray.search.query import (
        MUST,
        SHOULD,
        BooleanQuery,
        MultiTermQuery,
        PhraseQuery,
        TermQuery,
    )

    _, _, s = envs
    q = BooleanQuery()
    q.add(TermQuery("field", "one"), SHOULD)
    assert s.get_match_vector(q, 0, "field") == _g("0:0 12:12")
    q.add(TermQuery("field", "two"), MUST)
    assert s.get_match_vector(q, 0, "field") == _g(
        "0:0 5:5 12:12 13:13"
    )
    phq = PhraseQuery("field")
    phq.add_term("one").add_term("two")
    assert s.get_match_vector(phq, 0, "field") == _g("12:13")
    q.add(phq, SHOULD)
    assert s.get_match_vector(q, 0, "field") == _g(
        "0:0 5:5 12:13 12:12 13:13"
    )

    mtq = MultiTermQuery("field")
    mtq.add_term("one")
    assert s.get_match_vector(mtq, 0, "field") == _g("0:0 12:12")
    mtq.add_term("two")
    assert s.get_match_vector(mtq, 0, "field") == _g(
        "0:0 5:5 12:12 13:13"
    )
    mtq.add_term("and")
    assert s.get_match_vector(mtq, 0, "field") == _g(
        "0:0 1:1 4:4 5:5 6:6 8:8 12:12 13:13"
    )
