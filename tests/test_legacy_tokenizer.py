"""LegacyStandardTokenizer goldens — c/test/test_analysis.c:443-499
(do_standard_tokenizer, shared by the standard and legacy tokenizers)."""

from ferret_ray.analysis.legacy import (
    LegacyStandardTokenizer,
    legacy_standard_analyzer,
)

TEXT = (
    "DBalmain@gmail.com is My e-mail -52  #$ Address. 23#!$ "
    "http://www.google.com/results/ T.N.T. 123-1235-ASD-1234 "
    "underscored_word, won't we're"
)

GOLDEN = [
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
]


def test_legacy_goldens():
    toks = list(LegacyStandardTokenizer()(TEXT))
    got = [(t.text, t.start, t.end) for t in toks]
    assert got == GOLDEN


def test_legacy_long_url():
    text = "http://" + "x" * 273
    toks = list(LegacyStandardTokenizer()(text))
    assert len(toks) == 1
    assert toks[0].text == "x" * 254
    assert (toks[0].start, toks[0].end) == (0, 280)


def test_legacy_extra_cases():
    """The ASCII subset of do_mb_standard_tokenizer
    (c/test/test_analysis.c:501-547)."""
    cases = {
        "it's groups'": [("it", 0, 4), ("groups", 5, 12)],
        "Barnes&Noble": [("Barnes&Noble", 0, 12)],
        "file:///home/user/": [("home/user", 0, 18)],
        "svn://www.davebalmain.com/": [
            ("svn://www.davebalmain.com", 0, 26)
        ],
        "www,.google.com": [("www", 0, 3), ("google.com", 5, 15)],
        "www.google.com": [("www.google.com", 0, 14)],
        "dave@balmain@gmail.com": [
            ("dave@balmain", 0, 12), ("gmail.com", 13, 22)
        ],
        '"quoted string"': [("quoted", 1, 7), ("string", 8, 14)],
        "continue *star": [("continue", 0, 8), ("star", 10, 14)],
    }
    tz = LegacyStandardTokenizer()
    for text, want in cases.items():
        got = [(t.text, t.start, t.end) for t in tz(text)]
        assert got == want, text


def test_legacy_analyzer_chain():
    """legacy_standard_analyzer: lowercase + stop + hyphen filters
    compose over the legacy tokenizer."""
    a = legacy_standard_analyzer()
    terms, positions = a.terms_positions("The e-mail is DBalmain@gmail.com")
    # "the"/"is" stopped (gaps preserved), hyphen compound expands
    assert terms == ["email", "e", "mail", "dbalmain@gmail.com"]
    assert positions == [1, 1, 2, 4]


def test_mb_legacy_standard_tokenizer_golden():
    """mb legacy scanner shares the mb standard golden suite
    (test_mb_legacy_standard_tokenizer, c/test/test_analysis.c:583-588
    runs do_mb_standard_tokenizer on both); byte offsets converted like
    tests/test_analysis_mb.py."""
    from tests.test_analysis_mb import (
        MB_STD_GOLDEN,
        MB_TEXT,
        _with_byte_offsets,
    )

    tz = LegacyStandardTokenizer(mode="mb")
    got = _with_byte_offsets(MB_TEXT, tz(MB_TEXT))
    assert got == MB_STD_GOLDEN


def test_mb_legacy_tokenizer_tail():
    # c/test/test_analysis.c:531-546 tail (post-\200), mb legacy variant
    tail = (
        "badchar it's groups' Barnes&Noble file:///home/user/ "
        "svn://www.davebalmain.com/ www,.google.com www.google.com "
        'dave@balmain@gmail.com "quoted string" continue *star'
    )
    want = [
        "badchar", "it", "groups", "Barnes&Noble", "home/user",
        "svn://www.davebalmain.com", "www", "google.com",
        "www.google.com", "dave@balmain", "gmail.com", "quoted",
        "string", "continue", "star",
    ]
    tz = LegacyStandardTokenizer(mode="mb")
    assert [t.text for t in tz(tail)] == want


def test_mb_legacy_analyzer_goldens():
    """mb legacy analyzer over the accented text
    (test_mb_legacy_standard_analyzer, c/test/test_analysis.c:743-792):
    default stop list + lowercase, then the custom stop list case."""
    from ferret_ray.analysis.analyzer import Analyzer
    from ferret_ray.analysis.stopwords import FULL_ENGLISH_STOP_WORDS

    text = (
        "DBalmain@gmail.com is My e-mail and the Address. -23!$ "
        "http://www.google.com/results/ T.N.T. 123-1235-ASD-1234 23#!$ "
        "ÁÄGÇ®ÊËÌ¯ÚØÃ¬ÖÎÍ"
    )
    a = Analyzer(
        LegacyStandardTokenizer(mode="mb"),
        lowercase=True,
        stop_words=FULL_ENGLISH_STOP_WORDS,
        hyphen=True,
    )
    terms, positions = a.terms_positions(text)
    assert terms == [
        "dbalmain@gmail.com", "email", "e", "mail", "address", "-23",
        "www.google.com/results", "tnt", "123-1235-asd-1234", "23",
        "áägç", "êëì", "úøã", "öîí",
    ]
    # absolute positions from the reference pos_inc chain
    # 1,3,0,1,3,1,1,... (c/test/test_analysis.c:776-791)
    assert positions == [0, 3, 3, 4, 7, 8, 9, 10, 11, 12, 13, 14,
                         15, 16]

    words = frozenset({"is", "the", "-23", "tnt"})
    a2 = Analyzer(
        LegacyStandardTokenizer(mode="mb"),
        lowercase=True,
        stop_words=words,
        hyphen=True,
    )
    terms2, _ = a2.terms_positions(text)
    assert terms2 == [
        "dbalmain@gmail.com", "my", "email", "e", "mail", "and",
        "address", "www.google.com/results", "123-1235-asd-1234", "23",
        "áägç", "êëì", "úøã", "öîí",
    ]
