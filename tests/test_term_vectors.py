"""Stored term vectors (TERM_VECTOR_WITH_POSITIONS_OFFSETS).

* codec round-trip;
* build-time storage matches the analyzer's token stream exactly;
* the highlighter produces the same reference-golden excerpts whether
  offsets come from the stored TV or from re-analysis.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TEXT = (
    "the words we are searching for are one and two also sometimes "
    "looking for them as a phrase like this; one two lets see "
    "how it goes"
)


def test_codec_roundtrip():
    from ferret_ray.codec.termvector import (
        decode_term_vector,
        encode_term_vector,
    )

    toks = [("hello", 0, 0, 5), ("world", 1, 6, 11),
            ("hello", 5, 30, 35), ("émoji", 6, 36, 41)]
    assert decode_term_vector(encode_term_vector(toks)) == toks
    assert decode_term_vector(encode_term_vector([])) == []
    assert decode_term_vector(b"") == []


@pytest.fixture(scope="module")
def tv_index(ray_session, tmp_path_factory):
    from ferret_ray.analysis.analyzer import Analyzer
    from ferret_ray.analysis.tokenizer import WhitespaceTokenizer
    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    tmp = str(tmp_path_factory.mktemp("tv"))
    corpus = os.path.join(tmp, "c.parquet")
    pq.write_table(
        pa.table({"field": [TEXT, "a second doc with words here"]}),
        corpus,
    )
    ws = Analyzer(WhitespaceTokenizer(), lowercase=True,
                  stop_words=None, hyphen=False)
    cfg = IndexConfig(
        fields={"field": FieldConfig(analyzer=ws, term_vector=True)},
        num_shards=2,
    )
    idx = os.path.join(tmp, "idx")
    build_index(corpus, idx, cfg)
    return Searcher(IndexReader(idx)), ws


def test_stored_tv_matches_analysis(tv_index):
    s, ws = tv_index
    tv = s.reader.term_vector(0, "field")
    assert tv is not None and len(tv) > 0
    pos = -1
    expect = []
    for tk in ws.token_stream(TEXT):
        pos += tk.pos_inc
        expect.append((tk.text, max(pos, 0), tk.start, tk.end))
    assert tv == expect
    # absent for unknown fields
    assert s.reader.term_vector(0, "nope") is None


def test_tv_highlight_matches_reference_golden(tv_index):
    from ferret_ray.search.highlight import highlight
    from ferret_ray.search.query import TermQuery

    s, ws = tv_index
    q = TermQuery("field", "one")
    # stored-field text exists here, so no text override: the offsets
    # table comes from the STORED term vector
    got = highlight(s, q, 0, "field", ws, excerpt_length=10,
                    num_excerpts=2)
    assert got == ["...are <b>one</b>...", "...this; <b>one</b>..."]


def test_batch_term_vectors_equal_sequential():
    """The whole-column batch tv path (Arrow double-split offsets +
    per-unique-region blobs) is byte-identical to the sequential
    token_stream encoding."""
    import numpy as np

    from ferret_ray.codec.termvector import encode_term_vector
    from ferret_ray.schema import analyzer_for

    an = analyzer_for("standard")

    def sequential(text):
        toks = []
        pos = -1
        for tk in an.token_stream(text):
            pos += tk.pos_inc
            toks.append((tk.text, max(pos, 0), tk.start, tk.end))
        return encode_term_vector(toks)

    rng = np.random.default_rng(3)
    words = ["alpha", "the", "e-mail", "T.N.T.", "x1", "((y))",
             "http://www.foo.com/a/", "won't", "-52", "Écoles"]
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(0, 15))))
        for _ in range(60)
    ] + ["", None, "   ", " lead", "trail ", "a  b   c", "the the"]
    got = an.batch_term_vectors(texts)
    for i, t in enumerate(texts):
        assert got[i] == sequential(t or ""), (i, repr(t))


def test_problem_text_1710(ray_session, tmp_path):
    """c/test/test_1710.c: a long URL-ish token (http://___...) indexed
    with the standard analyzer and positions+offsets term vectors must
    build, commit, and stay searchable (token-truncation edge case)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.query import TermQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    problem = "http://" + "_" * 290  # longer than FRT_MAX_WORD_SIZE
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"content": [problem, "plain words here"]}), corpus
    )
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(
        fields={
            "content": FieldConfig(analyzer="standard", term_vector=True)
        },
        num_shards=2,
    )
    m = build_index(corpus, idx, cfg)
    assert m["num_docs"] == 2
    r = IndexReader(idx)
    s = Searcher(r)
    td = s.search(TermQuery("content", "words"), 0, 10)
    assert [h.doc for h in td.hits] == [1]
    # the truncated token is still indexed and the term vector decodes
    tv = r.term_vector(0, "content")
    assert tv is not None and len(tv) >= 1
    for term, _pos, start, end in tv:
        assert len(term.encode()) <= 254
        assert end <= len(problem)
