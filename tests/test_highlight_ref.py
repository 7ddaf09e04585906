"""Reference-exact highlighter goldens.

Every excerpt string asserted in the reference's
c/test/test_highlighter.c:358-532 (test_searcher_highlight), replayed
against OUR index + highlighter.  The reference indexes doc 0 with
whitespace_analyzer(lowercase=true) and doc 1 with
letter_analyzer(lowercase=true); we build one index per analyzer and
query the corresponding doc.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DOC0 = (
    "the words we are searching for are one and two also sometimes "
    "looking for them as a phrase like this; one two lets see "
    "how it goes"
)
DOC1 = "That's how it goes now."


def _build(tmp, name, text, analyzer):
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    corpus = os.path.join(tmp, f"{name}.parquet")
    pq.write_table(pa.table({"field": [text]}), corpus)
    cfg = IndexConfig(
        fields={"field": FieldConfig(analyzer=analyzer)}, num_shards=2
    )
    idx = os.path.join(tmp, f"{name}-idx")
    build_index(corpus, idx, cfg)
    return Searcher(IndexReader(idx))


@pytest.fixture(scope="module")
def env(ray_session, tmp_path_factory):
    from ferret_ray.analysis.analyzer import Analyzer
    from ferret_ray.analysis.tokenizer import (
        LetterTokenizer,
        WhitespaceTokenizer,
    )

    tmp = str(tmp_path_factory.mktemp("hl"))
    ws = Analyzer(WhitespaceTokenizer(), lowercase=True,
                  stop_words=None, hyphen=False)
    lt = Analyzer(LetterTokenizer(), lowercase=True,
                  stop_words=None, hyphen=False)
    s0 = _build(tmp, "ws", DOC0, ws)
    s1 = _build(tmp, "lt", DOC1, lt)
    return s0, ws, s1, lt


def _hl(searcher, analyzer, q, elen, n, text):
    from ferret_ray.search.highlight import highlight

    return highlight(
        searcher, q, 0, "field", analyzer,
        excerpt_length=elen, num_excerpts=n,
        pre_tag="<b>", post_tag="</b>", ellipsis="...",
        text=text,
    )


def test_term_query_excerpts(env):
    from ferret_ray.search.query import TermQuery

    s0, ws, _, _ = env
    q = TermQuery("field", "one")
    assert _hl(s0, ws, q, 10, 1, DOC0) == ["...are <b>one</b>..."]
    assert _hl(s0, ws, q, 10, 2, DOC0) == [
        "...are <b>one</b>...", "...this; <b>one</b>...",
    ]
    assert _hl(s0, ws, q, 10, 3, DOC0) == [
        "the words...", "...are <b>one</b>...", "...this; <b>one</b>...",
    ]
    assert _hl(s0, ws, q, 10, 4, DOC0) == [
        "the words we are...", "...are <b>one</b>...",
        "...this; <b>one</b>...",
    ]
    assert _hl(s0, ws, q, 10, 5, DOC0) == [
        "the words we are searching for are <b>one</b>...",
        "...this; <b>one</b>...",
    ]
    assert _hl(s0, ws, q, 10, 20, DOC0) == [
        "the words we are searching for are <b>one</b> and two also "
        "sometimes looking for them as a phrase like this; <b>one</b> "
        "two lets see how it goes"
    ]
    assert _hl(s0, ws, q, 1000, 1, DOC0) == [
        "the words we are searching for are <b>one</b> and two also "
        "sometimes looking for them as a phrase like this; <b>one</b> "
        "two lets see how it goes"
    ]


def test_boolean_and_phrase_excerpts(env):
    from ferret_ray.search.query import (
        SHOULD,
        BooleanQuery,
        PhraseQuery,
        TermQuery,
    )

    s0, ws, _, _ = env
    bq = BooleanQuery()
    bq.add(TermQuery("field", "one"), SHOULD)
    bq.add(TermQuery("field", "two"), SHOULD)
    assert _hl(s0, ws, bq, 15, 2, DOC0) == [
        "...<b>one</b> and <b>two</b>...",
        "...this; <b>one</b> <b>two</b>...",
    ]

    phq = PhraseQuery("field")
    phq.add_term("one").add_term("two")
    bq.add(phq, SHOULD)
    assert _hl(s0, ws, bq, 15, 2, DOC0) == [
        "...<b>one</b> and <b>two</b>...",
        "...this; <b>one two</b>...",
    ]
    # the phrase merger scores highest -> single excerpt picks it
    assert _hl(s0, ws, bq, 15, 1, DOC0) == ["...this; <b>one two</b>..."]


def test_phrase_priority_excerpts(env):
    from ferret_ray.search.query import (
        SHOULD,
        BooleanQuery,
        PhraseQuery,
        TermQuery,
    )

    s0, ws, _, _ = env
    bq = BooleanQuery()
    p1 = PhraseQuery("field")
    p1.add_term("the").add_term("words")
    bq.add(p1, SHOULD)
    p2 = PhraseQuery("field")
    for t in ("for", "are", "one", "and", "two"):
        p2.add_term(t)
    bq.add(p2, SHOULD)
    bq.add(TermQuery("field", "words"), SHOULD)
    bq.add(TermQuery("field", "one"), SHOULD)
    bq.add(TermQuery("field", "two"), SHOULD)
    bq.add(TermQuery("field", "UnKnOwNfIeLd"), SHOULD)

    assert _hl(s0, ws, bq, 10, 1, DOC0) == ["<b>the words</b>..."]
    assert _hl(s0, ws, bq, 10, 2, DOC0) == [
        "<b>the words</b>...", "...<b>one</b> <b>two</b>...",
    ]


def test_tail_ellipsis_rules(env):
    from ferret_ray.search.query import TermQuery

    s0, ws, s1, lt = env
    q = TermQuery("field", "goes")
    assert _hl(s0, ws, q, 13, 2, DOC0) == [
        "the words we...", "...how it <b>goes</b>",
    ]
    # doc 1, letter analyzer: trailing " now." is shorter than the
    # ellipsis would be, so the excerpt extends to the end
    assert _hl(s1, lt, q, 16, 1, DOC1) == ["...how it <b>goes</b> now."]


def test_no_match_long_field_is_none(env):
    from ferret_ray.search.query import TermQuery

    s0, ws, _, _ = env
    q = TermQuery("field", "zzznotthere")
    assert _hl(s0, ws, q, 10, 1, DOC0) is None
