"""mb/utf8 StandardTokenizer + mb LowerCaseFilter goldens.

Reference: c/test/test_analysis.c:164-213 (mb whitespace + mb lowercase),
308-390 (mb letter), 500-580 (do_mb_standard_tokenizer).  The C scanner
reports BYTE offsets; our tokens carry codepoint offsets, so expected
byte offsets are converted via the UTF-8 prefix length.
"""

from __future__ import annotations

import numpy as np
import pytest

from ferret_ray.analysis.analyzer import (
    Analyzer,
    lowercase_filter,
    standard_analyzer,
)
from ferret_ray.analysis.tokenizer import (
    LetterTokenizer,
    StandardTokenizer,
    WhitespaceTokenizer,
    tokenize,
)

MB_TEXT = (
    "DBalmain@gmail.com is My e-mail -52  #$ Address. 23#!$ "
    "http://www.google.com/results/ T.N.T. 123-1235-ASD-1234 "
    "underscored_word, won't we're 23#!$ ÁÄGÇ®ÊËÌ¯ÚØÃ¬ÖÎÍ"
)

# (text, byte_start, byte_end) — c/test/test_analysis.c:512-530
MB_STD_GOLDEN = [
    ("DBalmain@gmail.com", 0, 18),
    ("is", 19, 21),
    ("My", 22, 24),
    ("e-mail", 25, 31),
    ("-52", 32, 35),
    ("Address", 40, 47),
    ("23", 49, 51),
    ("www.google.com/results", 55, 85),
    ("TNT", 86, 91),
    ("123-1235-ASD-1234", 93, 110),
    ("underscored_word", 111, 127),
    ("won't", 129, 134),
    ("we're", 135, 140),
    ("23", 141, 143),
    ("ÁÄGÇ", 147, 154),
    ("ÊËÌ", 156, 162),
    ("ÚØÃ", 164, 170),
    ("ÖÎÍ", 172, 178),
]


def _with_byte_offsets(text, tokens):
    out = []
    for tk in tokens:
        out.append(
            (
                tk.text,
                len(text[: tk.start].encode()),
                len(text[: tk.end].encode()),
            )
        )
    return out


def test_mb_standard_tokenizer_golden():
    got = _with_byte_offsets(MB_TEXT, tokenize(MB_TEXT, "utf8"))
    assert got == MB_STD_GOLDEN


def test_mb_standard_tokenizer_tail():
    # c/test/test_analysis.c:531-546 — the tail of the golden text after
    # the \200 bad byte (a raw byte in C; the invalid-char skip there is
    # byte-level, which a Python str cannot carry, so the tail is
    # asserted as its own text)
    tail = (
        "badchar it's groups' Barnes&Noble file:///home/user/ "
        "svn://www.davebalmain.com/ www,.google.com www.google.com "
        "dave@balmain@gmail.com \"quoted string\" continue *star"
    )
    texts = [tk.text for tk in tokenize(tail, "utf8")]
    assert texts == [
        "badchar", "it", "groups", "Barnes&Noble", "home/user",
        "svn://www.davebalmain.com", "www", "google.com",
        "www.google.com", "dave@balmain", "gmail.com",
        "quoted", "string", "continue", "star",
    ]


def test_ascii_standard_tokenizer_drops_mb():
    # plain scanner (c/src/scanner.rl): non-ASCII letters are separators
    # (the C scanner sees UTF-8 bytes, so the embedded ASCII 'G' IS a
    # token — same here at codepoint level)
    texts = [tk.text for tk in tokenize("ÁÄGÇ®ÊËÌ word 52", "ascii")]
    assert texts == ["G", "word", "52"]


MB_WS_TEXT = (
    "DBalmän@gmail.com is My e-mail 52   #$ address. 23#!$ "
    "ÁÄGÇ®ÊËÌ¯ÚØÃ¬ÖÎÍ"
)


def test_mb_whitespace_tokenizer_golden():
    # c/test/test_analysis.c:164-181
    got = _with_byte_offsets(MB_WS_TEXT, WhitespaceTokenizer()(MB_WS_TEXT))
    assert got == [
        ("DBalmän@gmail.com", 0, 18),
        ("is", 19, 21),
        ("My", 22, 24),
        ("e-mail", 25, 31),
        ("52", 32, 34),
        ("#$", 37, 39),
        ("address.", 40, 48),
        ("23#!$", 49, 54),
        ("ÁÄGÇ®ÊËÌ¯ÚØÃ¬ÖÎÍ", 55, 86),
    ]


def test_mb_lowercase_filter_golden():
    # c/test/test_analysis.c:182-193
    toks = list(lowercase_filter(WhitespaceTokenizer()(MB_WS_TEXT)))
    assert toks[0].text == "dbalmän@gmail.com"
    assert toks[-1].text == "áägç®êëì¯úøã¬öîí"


def test_mb_letter_tokenizer_golden():
    # c/test/test_analysis.c:308-330
    got = _with_byte_offsets(
        MB_WS_TEXT, LetterTokenizer("utf8")(MB_WS_TEXT)
    )
    assert got == [
        ("DBalmän", 0, 8),
        ("gmail", 9, 14),
        ("com", 15, 18),
        ("is", 19, 21),
        ("My", 22, 24),
        ("e", 25, 26),
        ("mail", 27, 31),
        ("address", 40, 47),
        ("ÁÄGÇ", 55, 62),
        ("ÊËÌ", 64, 70),
        ("ÚØÃ", 72, 78),
        ("ÖÎÍ", 80, 86),
    ]
    # ascii letter tokenizer: [A-Za-z] runs only
    ascii_texts = [t.text for t in LetterTokenizer("ascii")(MB_WS_TEXT)]
    assert ascii_texts[0] == "DBalm"


def test_mb_standard_analyzer_chain():
    # mb standard analyzer = tokenizer -> mb lower -> stop -> hyphen
    # (c/test/test_analysis.c:618-648 shape)
    a = standard_analyzer()
    terms, positions = a.terms_positions("Écoles Françaises e-mail")
    assert terms == ["écoles", "françaises", "email", "e", "mail"]
    assert positions == [0, 1, 2, 2, 3]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batch_path_matches_per_doc_on_mb(seed):
    # the Arrow batch tokenizer must agree with the sequential chain on
    # non-ASCII text (the RE2 separator class == Python \s by table)
    rng = np.random.default_rng(seed)
    words = [
        "Écoles", "Straße", "naïve", "Бишкек", "北京", "café-crème",
        "the", "T.N.T.", "52", "dbalmain@gmail.com", "won't",
        "ÁÄGÇ®ÊËÌ", " ", "tab\ttab", "plain", "x y",
    ]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(1, 12)))
        for _ in range(40)
    ] + [None, "", "　  ", "中文没有空格的句子"]
    a = standard_analyzer()
    tids, poss, lens, id2term = a.batch_terms_positions(texts, 10_000)
    id2term = id2term.to_pylist()
    off = 0
    for di, t in enumerate(texts):
        seq_terms, seq_pos = a.terms_positions(t or "", 10_000)
        n = int(lens[di])
        got_terms = [id2term[tids[off + j]] for j in range(n)]
        got_pos = [int(poss[off + j]) for j in range(n)]
        assert got_terms == seq_terms, (di, t)
        assert got_pos == seq_pos, (di, t)
        off += n


def test_mb_index_end_to_end(tmp_path):
    # build a tiny index over non-ASCII docs and search an accented term
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferret_ray.pipelines.build import build_index
    from ferret_ray.schema import FieldConfig, IndexConfig
    from ferret_ray.search.query import TermQuery
    from ferret_ray.search.reader import IndexReader
    from ferret_ray.search.searcher import Searcher

    docs = [
        "Les Écoles françaises sont ouvertes",
        "Die Straße ist naß",
        "plain ascii text here",
        "École encore — ÉCOLES partout",
    ]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"id": list(range(len(docs))), "text": docs}), src
    )
    cfg = IndexConfig(
        fields={
            "id": FieldConfig(indexed=False, stored=True),
            "text": FieldConfig(indexed=True, stored=True,
                                analyzer="standard_nostop"),
        },
        id_columns=["id"],
        num_shards=4,
    )
    idx = str(tmp_path / "idx")
    build_index(src, idx, cfg)
    s = Searcher(IndexReader(idx))
    hits = s.search(TermQuery("text", "écoles"), 0, 10)
    assert sorted(h.doc for h in hits.hits) == [0, 3]
    hits = s.search(TermQuery("text", "straße"), 0, 10)
    assert [h.doc for h in hits.hits] == [1]
