"""FQL parser round-trips from /root/reference/c/test/test_q_parser.c:22-142.

Parser setup mirrors the reference test: letter analyzer (lowercase),
fields xx (default, tokenized), f1/f2 (tokenized), field (untokenized);
canonical string compared against ``to_s(q, default_field="xx")``.
"""

import pytest

from ferret_ray.analysis import letter_analyzer
from ferret_ray.search.fql import FQLParser, to_s

PAIRS = [
    ("", ""),
    ("word", "word"),
    ("f1:word", "f1:word"),
    ("f1|f2:word", "f1:word f2:word"),
    ("field:word", "field:word"),
    ('"word1 word2 word3"', '"word word word"'),
    ('"word1 2342 word3"', '"word <> word"~1'),
    ('field:"one TWO ThrEe"', 'field:"one TWO ThrEe"'),
    ('field:"one 222 three"', 'field:"one 222 three"'),
    ('xx:"one 222 three"', '"one <> three"~1'),
    ('field:"one <> three"', 'field:"one <> three"'),
    ('field:"<> two three"', 'field:"two three"'),
    ('field:"one <> three <>"', 'field:"one <> three"'),
    ('field:"oNe <> <> <> three <>"', 'field:"oNe <> <> <> three"'),
    ('field:"one <> <> <> three|four|five <>"',
     'field:"one <> <> <> three|four|five"'),
    ('field:"on1|tw2 three|four|five six|seven"',
     'field:"on1|tw2 three|four|five six|seven"'),
    ('field:"testing|trucks"', 'field:"testing|trucks"'),
    ("[aaa bbb]", "[aaa bbb]"),
    ("{aaa bbb]", "{aaa bbb]"),
    ("field:[aaa bbb}", "field:[aaa bbb}"),
    ("{aaa bbb}", "{aaa bbb}"),
    ("{aaa>", "{aaa>"),
    ("[aaa>", "[aaa>"),
    ("field:<a\\ aa}", "field:<a aa}"),
    ("<aaa]", "<aaa]"),
    (">aaa", "{aaa>"),
    (">=aaa", "[aaa>"),
    ("<aaa", "<aaa}"),
    ("field:<=aaa", "field:<aaa]"),
    ("REQ one REQ two", "+one +two"),
    ("REQ one two", "+one two"),
    ("one REQ two", "one +two"),
    ("+one +two", "+one +two"),
    ("+one two", "+one two"),
    ("one +two", "one +two"),
    ("-one -two", "-one -two"),
    ("-one two", "-one two"),
    ("one -two", "one -two"),
    ("!one !two", "-one -two"),
    ("!one two", "-one two"),
    ("one !two", "one -two"),
    ("NOT one NOT two", "-one -two"),
    ("NOT one two", "-one two"),
    ("one NOT two", "one -two"),
    ("one two", "one two"),
    ("one OR two", "one two"),
    ("one AND two", "+one +two"),
    ("one two AND three", "one two +three"),
    ("one two OR three", "one two three"),
    ("Opus::City", '"opus city"~1'),
    ("()", ""),
    ("field:()", ""),
    ("one AND (f1:two OR f2:three) AND four",
     "+one +(f1:two f2:three) +four"),
    ('xx:"Hello Newman" field:()', '"hello newman" ()'),
    ("one (two AND three)", "one (+two +three)"),
    ("one AND (two OR three)", "+one +(two three)"),
    ("field:(one AND (two OR t\\=h\\=r\\=e\\=e))",
     "+field:one +(field:two field:t=h=r=e=e)"),
    ("one AND (two OR [aaa vvv})", "+one +(two [aaa vvv})"),
    ("one^1.2300", "one^1.23"),
    ("(one AND two)^100.23", "(+one +two)^100.23"),
    ("field:(one AND two)^100.23", "(+field:one +field:two)^100.23"),
    ("field:(one AND [aaa bbb]^23.300)^100.23",
     "(+field:one +field:[aaa bbb]^23.3)^100.23"),
    ('(REQ field:"one two three")^23.000', 'field:"one two three"^23.0'),
    ("asdf~0.2", "asdf~0.2"),
    ("field:asdf~0.2", "field:asdf~0.2"),
    ("asdf~0.2^100.00", "asdf~0.2^100.0"),
    ("field:asdf~0.2^0.1", "field:asdf~0.2^0.1"),
    ('field:"asdf <> asdf|asdf"~4', 'field:"asdf <> asdf|asdf"~4'),
    ('"one two three four five"~5', '"one two three four five"~5'),
    ("ab?de", "ab?de"),
    ("ab*de", "ab*de"),
    ("asdf?*?asd*dsf?asfd*asdf?", "asdf?*?asd*dsf?asfd*asdf?"),
    ("field:a* AND field:(b*)", "+field:a* +field:b*"),
    ("field:abc~ AND field:(b*)", "+field:abc~ +field:b*"),
    ("asdf?*?asd*dsf?asfd*asdf?^20.0", "asdf?*?asd*dsf?asfd*asdf?^20.0"),
    ("field:ASDF?*?22d*dsf?ASFD*asdf?^20.0",
     "field:ASDF?*?22d*dsf?ASFD*asdf?^20.0"),
    ("*:xxx", "xxx f1:xxx f2:xxx field:xxx"),
    ("f1|f2:xxx", "f1:xxx f2:xxx"),
    ("*:asd~0.2", "asd~0.2 f1:asd~0.2 f2:asd~0.2 field:asd~0.2"),
    ("f1|f2:asd~0.2", "f1:asd~0.2 f2:asd~0.2"),
    ("*:a?d*^20.0", "(a?d* f1:a?d* f2:a?d* field:a?d*)^20.0"),
    ("f1|f2:a?d*^20.0", "(f1:a?d* f2:a?d*)^20.0"),
    ('*:"asdf <> xxx|yyy"',
     '"asdf <> xxx|yyy" f1:"asdf <> xxx|yyy" f2:"asdf <> xxx|yyy" '
     'field:"asdf <> xxx|yyy"'),
    ('f1|f2:"asdf <> do|yyy"', 'f1:"asdf <> do|yyy" f2:"asdf <> do|yyy"'),
    ("*:[bbb xxx]", "[bbb xxx] f1:[bbb xxx] f2:[bbb xxx] field:[bbb xxx]"),
    ("f1|f2:[bbb xxx]", "f1:[bbb xxx] f2:[bbb xxx]"),
    ("*:(xxx AND bbb)",
     "+(xxx f1:xxx f2:xxx field:xxx) +(bbb f1:bbb f2:bbb field:bbb)"),
    ("f1|f2:(xxx AND bbb)", "+(f1:xxx f2:xxx) +(f1:bbb f2:bbb)"),
    ("ASDF?*?asd*dsf?ASFD*asdf?^20.0", "asdf?*?asd*dsf?asfd*asdf?^20.0"),
    ("ASDFasdAasAasASD~", "asdfasdaasaasasd~"),
    ('"onewordphrase"', "onewordphrase"),
    ("f1:*", "*"),
    ("f1:*^100.0", "*^100.0"),
    ("f1:?*", "f1:?*"),
    ("f1:?*^100.0", "f1:?*^100.0"),
    ("f1:(aaa f2:bbb ccc)", "f1:aaa f2:bbb f1:ccc"),
]


def make_parser(**kw) -> FQLParser:
    p = FQLParser(analyzer=letter_analyzer(lowercase=True), **kw)
    p.add_field("xx", default=True, tokenized=True)
    p.add_field("f1", tokenized=True)
    p.add_field("f2", tokenized=True)
    p.add_field("field", tokenized=False)
    return p


@pytest.mark.parametrize("qstr,expect", PAIRS, ids=range(len(PAIRS)))
def test_round_trip(qstr, expect):
    p = make_parser()
    q = p.parse(qstr)
    assert to_s(q, "xx") == expect


def test_unknown_field_dropped_vs_allowed():
    # test_q_parser.c:160-199
    p = make_parser()
    assert to_s(p.parse("not_field:word"), "xx") == ""
    p = make_parser(allow_any_fields=True)
    assert to_s(p.parse("not_field:word"), "xx") == "not_field:word"


def test_wild_lower_off():
    p = make_parser(allow_any_fields=True)
    p.wild_lower = False
    assert (
        to_s(p.parse("ASDF?*?asd*dsf?ASFD*asdf?^20.0"), "xx")
        == "ASDF?*?asd*dsf?ASFD*asdf?^20.0"
    )
    assert to_s(p.parse("ASDFasdAasAasASD~"), "xx") == "asdfasdaasaasasd~"


STD_PAIRS = [
    # test_q_parser_standard_analyzer (test_q_parser.c:186-260):
    # with the standard analyzer numbers survive tokenization
    ('"word1 word2 word3"', '"word1 word2 word3"'),
    ('"word1 2342 word3"', '"word1 2342 word3"'),
    ('field:"one two three"', 'field:"one two three"'),
    ('field:"one 222 three"', 'field:"one 222 three"'),
    ('xx:"one 222 three"', '"one 222 three"'),
    ("Opus::City", '"opus city"~1'),
    ("word", "word"),
    ("f1|f2:word", "f1:word f2:word"),
]


@pytest.mark.parametrize("qstr,expect", STD_PAIRS, ids=range(len(STD_PAIRS)))
def test_round_trip_standard_analyzer(qstr, expect):
    from ferret_ray.analysis import standard_analyzer

    p = FQLParser(analyzer=standard_analyzer(stop_words=None))
    p.add_field("xx", default=True, tokenized=True)
    p.add_field("f1", tokenized=True)
    p.add_field("f2", tokenized=True)
    p.add_field("field", tokenized=False)
    assert to_s(p.parse(qstr), "xx") == expect


# ---- qp_clean_str goldens (test_q_parser.c:353-378) ----------------------

CLEAN_PAIRS = [
    ("", ""),
    ('"< <>"', '"\\< <>"'),
    ('"hello there', '"hello there"'),
    ('hello there"', 'hello there""'),
    ("(hello there", "(hello there)"),
    ("(hello (there", "(hello (there))"),
    ('(hello" (there', '(hello" \\(there")'),
    ('(hello" &:()[]{}!+~^-<|>=*? <>there',
     '(hello" \\&\\:\\(\\)\\[\\]\\{\\}\\!\\+\\~\\^\\-\\<|\\>\\=\\*\\? '
     '<>there")'),
    ("hello) there)", "((hello) there)"),
    ('hello) "there)', '(hello) "there\\)"'),
    ("(hello \\&\\:\\(\\)\\[\\]\\{\\}\\!\\+\\~\\^\\-\\<|\\>\\=\\*\\?",
     "(hello \\&\\:\\(\\)\\[\\]\\{\\}\\!\\+\\~\\^\\-\\<|\\>\\=\\*\\?)"),
    ("hello \\\\&", "hello \\\\&"),
    ("hello \\\\\\&", "hello \\\\\\&"),
    ('"hello \\\\"', '"hello \\"'),
]


@pytest.mark.parametrize(
    "raw,expect", CLEAN_PAIRS, ids=range(len(CLEAN_PAIRS))
)
def test_clean_str(raw, expect):
    from ferret_ray.search.fql import clean_str

    assert clean_str(raw) == expect


@pytest.mark.parametrize("qstr,expect", PAIRS, ids=range(len(PAIRS)))
def test_round_trip_clean_str_mode(qstr, expect):
    # test_q_parser.c:155-158 — the whole pair table parses identically
    # with clean_str enabled
    p = make_parser()
    p.clean_str = True
    assert to_s(p.parse(qstr), "xx") == expect


# ---- test_qp_bad_queries (test_q_parser.c:383-412) -----------------------

BAD_PAIRS = [
    ("[, ]", ""),
    ("::*word", "word"),
    ("::))*&)(*^&*(", ""),
    ('::|)*&one)(*two(*&"', '"one two"~1'),
]


@pytest.mark.parametrize("clean", [False, True], ids=["raw", "clean"])
@pytest.mark.parametrize("qstr,expect", BAD_PAIRS, ids=range(len(BAD_PAIRS)))
def test_bad_queries(qstr, expect, clean):
    p = make_parser()
    p.handle_parse_errors = True
    p.clean_str = clean
    assert to_s(p.parse(qstr), "xx") == expect


# ---- test_qp_prefix_query (test_q_parser.c:414-437) -----------------------


def test_prefix_vs_wildcard_types():
    from ferret_ray.search.query import PrefixQuery, WildcardQuery

    p = make_parser()
    assert isinstance(p.parse("asdg*"), PrefixQuery)
    assert isinstance(p.parse("a?dg*"), WildcardQuery)
    assert isinstance(p.parse("a*dg*"), WildcardQuery)
    assert isinstance(p.parse("asdg*a"), WildcardQuery)


# ---- test_qp_keyword_switch (test_q_parser.c:439-453) ---------------------


def test_keyword_switch():
    p = make_parser()
    assert (
        to_s(p.parse("REQ www (xxx AND yyy) OR NOT zzz"), "xx")
        == "+www (+xxx +yyy) -zzz"
    )
    p = make_parser()
    p.use_keywords = False
    assert (
        to_s(p.parse("REQ www (xxx AND yyy) OR NOT zzz"), "xx")
        == "req www (xxx and yyy) or not zzz"
    )


# ---- standard analyzer with stops + hyphens (test_q_parser.c:300-305) -----

STD_STOP_PAIRS = [
    ("*:this", ""),
    ("this-is-a-hyphenated-word",
     '"thisisahyphenatedword|this is a hyphenated word"~4'),
    ('"the phrase and the phrase"', '"phrase <> <> phrase"~3'),
    ('"the e-mail was in the inbox"', '"email|e mail <> <> <> inbox"~5'),
]


@pytest.mark.parametrize(
    "qstr,expect", STD_STOP_PAIRS, ids=range(len(STD_STOP_PAIRS))
)
def test_round_trip_standard_stops(qstr, expect):
    from ferret_ray.analysis import standard_analyzer

    p = FQLParser(analyzer=standard_analyzer())
    p.add_field("xx", default=True, tokenized=True)
    p.add_field("f1", tokenized=True)
    p.add_field("f2", tokenized=True)
    p.add_field("field", tokenized=True)
    assert to_s(p.parse(qstr), "xx") == expect
