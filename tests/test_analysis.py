"""Tokenizer/analyzer goldens from the reference test suite.

Expected token/offset sequences come from
/root/reference/c/test/test_analysis.c:443-483 (StandardTokenizer) and
:591-616 (standard analyzer with ENGLISH_STOP_WORDS + lowercase).
"""

from ferret_ray.analysis import (
    ENGLISH_STOP_WORDS,
    Analyzer,
    StandardTokenizer,
    standard_analyzer,
    tokenize,
    whitespace_analyzer,
)

STD_TOK_TEXT = (
    "DBalmain@gmail.com is My e-mail -52  #$ Address. 23#!$ "
    "http://www.google.com/results/ T.N.T. 123-1235-ASD-1234 "
    "underscored_word, won't we're"
)

STD_TOK_GOLDEN = [
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


def test_standard_tokenizer_golden():
    toks = [(t.text, t.start, t.end) for t in tokenize(STD_TOK_TEXT)]
    assert toks == STD_TOK_GOLDEN


def test_standard_tokenizer_extras():
    # from do_mb_standard_tokenizer (ASCII subset),
    # /root/reference/c/test/test_analysis.c:505-537
    text = (
        "badchar it's groups' Barnes&Noble file:///home/user/ "
        "svn://www.davebalmain.com/ www,.google.com www.google.com "
        "dave@balmain@gmail.com \"quoted string\" continue *star"
    )
    got = [(t.text) for t in tokenize(text)]
    assert got == [
        "badchar",
        "it",
        "groups",
        "Barnes&Noble",
        "home/user",
        "svn://www.davebalmain.com",
        "www",
        "google.com",
        "www.google.com",
        "dave@balmain",
        "gmail.com",
        "quoted",
        "string",
        "continue",
        "star",
    ]


def test_long_url_truncated_to_254():
    # c/src/scanner.rl:63-66 clamps token text to out_size (254)
    text = "http://" + "x" * 280
    toks = list(tokenize(text))
    assert len(toks) == 1
    assert toks[0].text == "x" * 254
    assert (toks[0].start, toks[0].end) == (0, 287)


STD_ANALYZER_TEXT = (
    "DBalmain@gmail.com is My e-mail and the Address. -23!$ "
    "http://www.google.com/results/ T.N.T. 123-1235-ASD-1234"
)

STD_ANALYZER_GOLDEN = [
    ("dbalmain@gmail.com", 0, 18, 1),
    ("my", 22, 24, 2),
    ("email", 25, 31, 1),
    ("e", 25, 26, 0),
    ("mail", 27, 31, 1),
    ("address", 40, 47, 3),
    ("-23", 49, 52, 1),
    ("www.google.com/results", 55, 85, 1),
    ("tnt", 86, 91, 1),
    ("123-1235-asd-1234", 93, 110, 1),
]


def test_standard_analyzer_golden():
    a = standard_analyzer(stop_words=ENGLISH_STOP_WORDS, lowercase=True)
    toks = [
        (t.text, t.start, t.end, t.pos_inc)
        for t in a.token_stream(STD_ANALYZER_TEXT)
    ]
    assert toks == STD_ANALYZER_GOLDEN


def test_terms_positions_accumulation():
    a = standard_analyzer(stop_words=ENGLISH_STOP_WORDS)
    terms, positions = a.terms_positions("the quick e-mail")
    # "the" dropped (gap 1): quick at 0+1=... pos starts -1; quick pos_inc=2
    assert terms == ["quick", "email", "e", "mail"]
    assert positions == [1, 2, 2, 3]


def test_whitespace_analyzer():
    a = whitespace_analyzer()
    terms, positions = a.terms_positions("word1 word2  the")
    assert terms == ["word1", "word2", "the"]
    assert positions == [0, 1, 2]


def test_max_field_length():
    a = whitespace_analyzer()
    text = " ".join(f"t{i}" for i in range(50))
    terms, _ = a.terms_positions(text, max_field_length=10)
    # reference post-increment check keeps max_field_length+1 tokens
    # (c/src/index.c:5601-5603)
    assert len(terms) == 11


def test_mapping_filter():
    # c/test/test_analysis.c:967-1011
    from ferret_ray.analysis.analyzer import MappingFilter
    from ferret_ray.analysis.tokenizer import LetterTokenizer

    text = "one, two, three, four, five, six, seven, eight, nine, ten."
    long_word = "x" * 200
    mf = MappingFilter({"ne": "hello", "four": long_word})
    got = [t.text for t in mf(LetterTokenizer()(text))]
    assert got == [
        "ohello", "two", "three", long_word, "five", "six", "seven",
        "eight", "nihello", "ten",
    ]
    mf.add("thr", "start")
    mf.add("en", "goodbye")
    got = [t.text for t in mf(LetterTokenizer()(text))]
    assert got == [
        "ohello", "two", "startee", long_word, "five", "six",
        "sevgoodbye", "eight", "nihello", "tgoodbye",
    ]
    # offsets keep the original token extents
    toks = list(mf(LetterTokenizer()(text)))
    assert (toks[0].start, toks[0].end) == (0, 3)
    assert (toks[2].start, toks[2].end) == (10, 15)


def test_stemmer_goldens():
    """250-word golden set stemmed by the compiled libstemmer (english),
    must match exactly."""
    import os

    from ferret_ray.analysis.stemmer import stem

    path = os.path.join(os.path.dirname(__file__), "goldens_stems.tsv")
    n = 0
    for line in open(path):
        w, want = line.rstrip("\n").split("\t")
        assert stem(w) == want, w
        n += 1
    assert n == 250


def test_stemming_analyzer():
    from ferret_ray.schema import analyzer_for

    a = analyzer_for("stem")
    terms, _ = a.terms_positions("the ponies are running happily")
    assert terms == ["poni", "run", "happili"]
