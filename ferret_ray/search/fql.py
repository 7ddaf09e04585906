"""Ferret Query Language (FQL) parser + canonical to_s.

Re-implementation (recursive-descent) of the reference's bison grammar
(c/src/q_parser.y:226-291) and lexer (yylex/get_word, :302-441):

* special chars ``&:()[]{}!"~^|<>=*?+-``; ``&&``=AND ``||``=OR ``+``=REQ
  ``-``/``!``=NOT; keywords AND/OR/REQ/NOT; words may contain escaped
  specials (``\\``), ``&``, ``-``, ``+``, ``::`` and wildcards ``*?``;
* field specifiers ``f:``, ``f1|f2:``, ``*:`` push onto a field stack, and
  multi-field queries expand to SHOULD-combined BooleanQueries (FLDS macro,
  q_parser.y:166-191);
* words are tokenized by the per-field analyzer; a word that yields several
  tokens becomes a phrase with slop per skipped position (get_term_q);
* phrases support ``<>`` gaps, ``a|b`` alternatives and ``~slop``
  (get_phrase_query); ranges ``[a b]``/``{a b}``/``<a``/``>=a``; wildcards
  simplify to Prefix/MatchAll where possible (get_wild_q).

``to_s`` reproduces the reference's canonical strings (including
phq_to_s's in-place position sort and the %#.7g trailing-zero-stripped
boost format, c/src/global.c:138-167) — round-trip pairs from
c/test/test_q_parser.c:22-142 are the conformance gate.
"""

from __future__ import annotations

import re

import numpy as np

from ..analysis import Analyzer, standard_analyzer
from .query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    MultiTermQuery,
    PhrasePosition,
    PhraseQuery,
    PrefixQuery,
    Query,
    RangeQuery,
    TermQuery,
    WildcardQuery,
)


_SPECIAL = set('&:()[]{}!"~^|<>=*?+-')
_NOT_WORD = set(' \t()[]{}!"~^|<>=')


class ParseError(Exception):
    pass


def _lex(s: str, use_keywords: bool = True) -> list[tuple[str, str]]:
    """Tokens: (kind, text); kinds: AND OR REQ NOT QWRD WILD and single
    chars ':()[]{}"~^|<>=*'."""
    toks: list[tuple[str, str]] = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c in " \t\n\r":
            i += 1
            continue
        if c in _SPECIAL:
            nc = s[i + 1] if i + 1 < n else ""
            if c in "-!":
                toks.append(("NOT", c))
                i += 1
                continue
            if c == "+":
                toks.append(("REQ", c))
                i += 1
                continue
            if c == "*":
                if nc == ":":
                    toks.append(("*", "*"))
                    i += 1
                    continue
                # else fall through to word
            elif c == "?":
                pass  # fall through to word
            elif c == "&":
                if nc == "&":
                    toks.append(("AND", "&&"))
                    i += 2
                    continue
                # else fall through to word
            elif c == "|":
                if nc == "|":
                    toks.append(("OR", "||"))
                    i += 2
                    continue
                toks.append(("|", "|"))
                i += 1
                continue
            else:
                toks.append((c, c))
                i += 1
                continue
        # get_word
        buf = []
        is_wild = False
        while i < n and s[i] not in _NOT_WORD:
            c = s[i]
            if c == "\\":
                if i + 1 < n:
                    buf.append(s[i + 1])
                    i += 2
                else:
                    buf.append("\\")
                    i += 1
                continue
            if c == ":":
                if i + 1 < n and s[i + 1] == ":":
                    buf.append("::")
                    i += 2
                    continue
                break
            if c in "*?":
                is_wild = True
            buf.append(c)
            i += 1
        word = "".join(buf)
        if use_keywords and not is_wild:
            if word == "AND":
                toks.append(("AND", word))
                continue
            if word == "OR":
                toks.append(("OR", word))
                continue
            if word == "NOT":
                toks.append(("NOT", word))
                continue
            if word == "REQ":
                toks.append(("REQ", word))
                continue
        if not word:
            # lone ':' or similar — skip char to avoid an infinite loop
            i += 1
            continue
        toks.append(("WILD" if is_wild else "QWRD", word))
    return toks


_SPECIAL_CHARS = '&:()[]{}!"~^|<>=*?+-'
_PHRASE_CHARS = '<>|"'


def clean_str(s: str) -> str:
    """qp_clean_str (q_parser.y:1220-1306): balance parens and quotes,
    escape special characters inside phrases (except the phrase-meaningful
    ``<>``, ``|`` and ``"``)."""
    out: list[str] = []
    pb = ""
    br_cnt = 0
    quote_open = False
    for b in s:
        if pb == "\\":
            if quote_open and b in _PHRASE_CHARS:
                out.append("\\")  # left off the first time through
            out.append(b)
            # \ has escaped itself so has no power
            pb = "r" if b == "\\" else b
            continue
        if b == "\\":
            if not quote_open:  # we do our own escaping below
                out.append(b)
        elif b == '"':
            quote_open = not quote_open
            out.append(b)
        elif b == "(":
            if not quote_open:
                br_cnt += 1
            else:
                out.append("\\")
            out.append(b)
        elif b == ")":
            if not quote_open:
                if br_cnt == 0:
                    out.insert(0, "(")
                else:
                    br_cnt -= 1
            else:
                out.append("\\")
            out.append(b)
        elif b == ">":
            if quote_open:
                if pb == "<":
                    # un-escape the '<' written as '\<' last iteration
                    out.pop()
                    out[-1] = "<"
                else:
                    out.append("\\")
            out.append(b)
        else:
            if quote_open and b in _SPECIAL_CHARS and b != "|":
                out.append("\\")
            out.append(b)
        pb = b
    if quote_open:
        out.append('"')
    out.append(")" * br_cnt)
    return "".join(out)


class FQLParser:
    """qp_new equivalent; add fields with add_field(name, default,
    tokenized)."""

    def __init__(
        self,
        analyzer: Analyzer | None = None,
        or_default: bool = True,
        allow_any_fields: bool = False,
        wild_lower: bool = True,
        use_keywords: bool = True,
        handle_parse_errors: bool = True,
        max_clauses: int = 512,
        # qp_parse runs qp_clean_str unconditionally before parsing
        # (q_parser.y:1340), so cleaning is the default; pass False to
        # parse the raw string (diverges from reference on unbalanced
        # input, which then degrades to the bad-query phrase).
        clean_str: bool = True,
    ):
        self.analyzer = analyzer or standard_analyzer()
        self.or_default = or_default
        self.allow_any_fields = allow_any_fields
        self.wild_lower = wild_lower
        self.use_keywords = use_keywords
        self.handle_parse_errors = handle_parse_errors
        self.max_clauses = max_clauses
        self.clean_str = clean_str
        self.def_fields: list[str] = []
        self.all_fields: list[str] = []
        self.tokenized_fields: set[str] = set()

    def add_field(
        self, name: str, default: bool = False, tokenized: bool = True
    ) -> "FQLParser":
        if name not in self.all_fields:
            self.all_fields.append(name)
        if default and name not in self.def_fields:
            self.def_fields.append(name)
        if tokenized:
            self.tokenized_fields.add(name)
        return self

    # ---- public ---------------------------------------------------------

    def parse(self, qstr: str) -> Query | None:
        if self.clean_str:
            qstr = clean_str(qstr)
        try:
            return self._parse(qstr)
        except ParseError:
            if not self.handle_parse_errors:
                raise
            # qp_get_bad_query (q_parser.y:1315-1324): analyze the whole
            # string as one term text per default field — multi-token
            # results become a phrase with slop++ per positioned token
            self.fields_stack = [list(self.def_fields)]
            return self._flds(lambda f: self._get_term_q(f, qstr))

    def _parse(self, qstr: str) -> Query | None:
        self.toks = _lex(qstr, self.use_keywords)
        self.pos = 0
        self.fields_stack: list[list[str]] = [list(self.def_fields)]
        if not self.toks:
            return None
        q = self._bool_clss(top=True)
        if self.pos != len(self.toks):
            raise ParseError(f"trailing tokens at {self.pos}")
        return q

    # ---- token helpers --------------------------------------------------

    def _peek(self, k: int = 0) -> tuple[str, str]:
        i = self.pos + k
        return self.toks[i] if i < len(self.toks) else ("EOF", "")

    def _next(self) -> tuple[str, str]:
        t = self._peek()
        self.pos += 1
        return t

    def _expect(self, kind: str) -> tuple[str, str]:
        t = self._next()
        if t[0] != kind:
            raise ParseError(f"expected {kind}, got {t}")
        return t

    # ---- grammar --------------------------------------------------------

    def _bool_clss(self, top: bool = False, closing: str | None = None):
        clauses: list[BooleanClause] = []
        while True:
            k = self._peek()[0]
            if k == "EOF" or (closing and k == closing):
                break
            conn = None
            if k in ("AND", "OR"):
                conn = self._next()[0]
                if self._peek()[0] in ("EOF", closing):
                    raise ParseError("dangling connector")
            cls = self._bool_cls()
            if conn == "AND" or (conn is None and clauses and
                                 not self.or_default):
                if cls is not None:
                    if len(clauses) == 1 and not clauses[0].is_prohibited:
                        clauses[0].occur = MUST
                    if not cls.is_prohibited:
                        cls.occur = MUST
                    clauses.append(cls)
            else:
                if cls is not None:
                    clauses.append(cls)
        return self._get_bool_q(clauses)

    def _get_bool_q(self, clauses: list[BooleanClause]) -> Query | None:
        # get_bool_q (q_parser.y)
        if not clauses:
            return None
        if len(clauses) == 1:
            bc = clauses[0]
            if bc.is_prohibited:
                q = BooleanQuery()
                q.clauses.append(BooleanClause(bc.query, MUST_NOT))
                q.add(MatchAllQuery(), MUST)
                return q
            return bc.query
        q = BooleanQuery()
        q.clauses = clauses
        return q

    def _bool_cls(self) -> BooleanClause | None:
        k = self._peek()[0]
        occur = SHOULD
        if k == "REQ":
            self._next()
            occur = MUST
        elif k == "NOT":
            self._next()
            occur = MUST_NOT
        q = self._boosted_q()
        return BooleanClause(q, occur) if q is not None else None

    def _boosted_q(self) -> Query | None:
        q = self._q()
        if self._peek()[0] == "^":
            self._next()
            word = self._expect("QWRD")[1]
            if q is not None:
                try:
                    q.boost = float(np.float32(float(word)))
                except ValueError:
                    pass
        return q

    def _q(self) -> Query | None:
        kind, text = self._peek()
        if kind == "(":
            self._next()
            if self._peek()[0] == ")":
                self._next()
                return BooleanQuery(coord_disabled=True)
            inner = self._bool_clss(closing=")")
            self._expect(")")
            return inner
        if kind == '"':
            return self._phrase_q()
        if kind in ("[", "{", "<", ">"):
            return self._range_q()
        if kind == "*" :
            # '*:' all-fields specifier
            if self._peek(1)[0] == ":":
                self._next()
                self._next()
                self.fields_stack.append(list(self.all_fields))
                q = self._q()
                self.fields_stack.pop()
                return q
            raise ParseError("bare *")
        if kind == "WILD":
            self._next()
            return self._flds(lambda f: self._get_wild_q(f, text))
        if kind == "QWRD":
            # lookahead for field specifier: QWRD ('|' QWRD)* ':'
            j = 1
            while self._peek(j)[0] == "|" and self._peek(j + 1)[0] == "QWRD":
                j += 2
            if self._peek(j)[0] == ":":
                fields = [text]
                self._next()
                while self._peek()[0] == "|":
                    self._next()
                    fields.append(self._expect("QWRD")[1])
                self._expect(":")
                allowed = [
                    f for f in fields
                    if self.allow_any_fields or f in self.all_fields
                ]
                self.fields_stack.append(allowed)
                q = self._q()
                self.fields_stack.pop()
                return q
            self._next()
            if self._peek()[0] == "~":
                self._next()
                if self._peek()[0] == "QWRD":
                    slop = self._next()[1]
                    return self._flds(
                        lambda f: self._get_fuzzy_q(f, text, slop)
                    )
                return self._flds(lambda f: self._get_fuzzy_q(f, text, None))
            return self._flds(lambda f: self._get_term_q(f, text))
        raise ParseError(f"unexpected token {kind}:{text}")

    # ---- FLDS -----------------------------------------------------------

    def _flds(self, func) -> Query | None:
        fields = self.fields_stack[-1]
        if len(fields) == 0:
            return None
        if len(fields) == 1:
            return func(fields[0])
        bq = BooleanQuery()
        for f in fields:
            sq = func(f)
            if sq is not None:
                bq.add(sq, SHOULD)
        return bq if bq.clauses else None

    # ---- word -> query --------------------------------------------------

    def _tokenize(self, field: str, word: str):
        # get_cached_ts: only fields registered as tokenized get analyzed
        if field in self.tokenized_fields:
            return list(self.analyzer.token_stream(word))
        from ..analysis.tokenizer import Token

        return [Token(word, 0, len(word), 1)] if word else []

    def _get_term_q(self, field: str, word: str) -> Query | None:
        toks = self._tokenize(field, word)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(field, toks[0].text)
        # several tokens -> phrase, slop++ per positioned term (get_term_q)
        phq = PhraseQuery(field)
        phq.add_term(toks[0].text, 0)
        for tk in toks[1:]:
            if tk.pos_inc:
                phq.add_term(tk.text, tk.pos_inc)
                phq.slop += 1
            else:
                phq.append_multi_term(tk.text)
        return phq

    def _get_fuzzy_q(self, field: str, word: str, slop: str | None) -> Query | None:
        toks = self._tokenize(field, word)
        if not toks:
            return None
        min_sim = 0.5
        if slop:
            try:
                min_sim = float(np.float32(float(slop)))
            except ValueError:
                pass
        return FuzzyQuery(
            field, toks[0].text, min_sim=min_sim,
            max_terms=self.max_clauses,
        )

    def _get_wild_q(self, field: str, pattern: str) -> Query:
        # get_wild_q: lower, simplify to MatchAll / Prefix
        if self.wild_lower and field in self.tokenized_fields:
            pattern = pattern.lower()
        if pattern == "*":
            return MatchAllQuery()
        if pattern.endswith("*") and not any(
            c in "*?" for c in pattern[:-1]
        ):
            return PrefixQuery(field, pattern[:-1],
                               max_terms=self.max_clauses)
        return WildcardQuery(field, pattern, max_terms=self.max_clauses)

    # ---- phrase ---------------------------------------------------------

    def _phrase_q(self) -> Query | None:
        self._expect('"')
        # collect (words | None-for-gap | multi) like ph_words
        slots: list[PhrasePosition] = []
        pos_inc = 0
        while True:
            kind, text = self._peek()
            if kind == '"':
                self._next()
                break
            if kind == "<" and self._peek(1)[0] == ">":
                self._next()
                self._next()
                pos_inc += 1
                continue
            if kind == "|" and slots:
                self._next()
                w = self._next()
                if w[0] not in ("QWRD", "WILD"):
                    raise ParseError("bad phrase alt")
                slots[-1].terms.append(w[1])
                continue
            if kind in ("QWRD", "WILD", "AND", "OR", "NOT", "REQ"):
                self._next()
                slots.append(PhrasePosition(pos_inc, [text]))
                pos_inc = 0
                continue
            raise ParseError(f"bad phrase token {kind}")
        slop_str = None
        if self._peek()[0] == "~":
            self._next()
            slop_str = self._expect("QWRD")[1]
        if not slots:
            return None
        return self._flds(
            lambda f: self._get_phrase_query(f, slots, slop_str)
        )

    def _get_phrase_query(
        self, field: str, slots: list[PhrasePosition], slop_str: str | None
    ) -> Query | None:
        # get_phrase_query (q_parser.y); slots[i].pos holds the <>-gap count
        if len(slots) == 1:
            words = slots[0].terms
            if len(words) == 1:
                return self._get_term_q(field, words[0])
            terms = []
            for wd in words:
                toks = self._tokenize(field, wd)
                if toks:
                    terms.append(toks[0].text)
            if not terms:
                return BooleanQuery()
            if len(terms) == 1:
                return TermQuery(field, terms[0])
            mtq = MultiTermQuery(field, max_terms=len(terms))
            for t in terms:
                mtq.add_term(t)
            return mtq
        q = PhraseQuery(field)
        if slop_str is not None:
            try:
                q.slop = int(float(slop_str))
            except ValueError:
                pass
        pos_inc = 0
        for slot in slots:
            if pos_inc:
                q.slop += 1
            pos_inc += slot.pos + 1  # slot.pos holds the gap count
            if len(slot.terms) == 1:
                toks = self._tokenize(field, slot.terms[0])
                for tk in toks:
                    if tk.pos_inc:
                        q.add_term(tk.text, pos_inc if pos_inc else tk.pos_inc)
                    else:
                        q.append_multi_term(tk.text)
                        q.slop += 1
                    pos_inc = 0
            else:
                added = False
                for wd in slot.terms:
                    toks = self._tokenize(field, wd)
                    if toks:
                        if not added:
                            q.add_term(
                                toks[0].text,
                                pos_inc if pos_inc else toks[0].pos_inc,
                            )
                            added = True
                            pos_inc = 0
                        else:
                            q.append_multi_term(toks[0].text)
        if not q.positions:
            return None
        return q

    # ---- range ----------------------------------------------------------

    def _range_q(self) -> Query | None:
        kind, _ = self._next()
        if kind in ("[", "{"):
            w1 = self._expect("QWRD")[1]
            k2, w2 = self._next()
            if k2 == "QWRD":
                closer = self._next()[0]
                if closer not in ("]", "}"):
                    raise ParseError("bad range close")
                return self._flds(
                    lambda f: self._make_range(
                        f, w1, w2, kind == "[", closer == "]"
                    )
                )
            if k2 == ">":
                return self._flds(
                    lambda f: self._make_range(
                        f, w1, None, kind == "[", False
                    )
                )
            raise ParseError("bad range")
        if kind == "<":
            if self._peek()[0] == "=":
                self._next()
                w = self._expect("QWRD")[1]
                return self._flds(
                    lambda f: self._make_range(f, None, w, False, True)
                )
            w = self._expect("QWRD")[1]
            nxt = self._peek()[0]
            if nxt in ("]", "}"):
                self._next()
                return self._flds(
                    lambda f: self._make_range(f, None, w, False, nxt == "]")
                )
            return self._flds(
                lambda f: self._make_range(f, None, w, False, False)
            )
        if kind == ">":
            if self._peek()[0] == "=":
                self._next()
                w = self._expect("QWRD")[1]
                return self._flds(
                    lambda f: self._make_range(f, w, None, True, False)
                )
            w = self._expect("QWRD")[1]
            return self._flds(
                lambda f: self._make_range(f, w, None, False, False)
            )
        raise ParseError("bad range start")

    def _make_range(self, field, lower, upper, inc_lower, inc_upper):
        if self.wild_lower and field in self.tokenized_fields:
            lower = lower.lower() if lower else lower
            upper = upper.lower() if upper else upper
        return RangeQuery(field, lower, upper, inc_lower, inc_upper)


# --------------------------------------------------------------------------
# to_s canonicalization
# --------------------------------------------------------------------------

def _boost_str(b: float) -> str:
    """dbl_to_s with %#.7g + trailing-zero strip (c/src/global.c:138-167)."""
    s = "%#.7g" % float(b)
    if "e" in s:
        mant, _, exp = s.partition("e")
        while mant.endswith("0") and mant[-2].isdigit():
            mant = mant[:-1]
        return mant + "e" + exp
    while s.endswith("0") and len(s) >= 2 and s[-2].isdigit():
        s = s[:-1]
    return s


def _maybe_boost(s: str, q: Query) -> str:
    return s if q.boost == 1.0 else f"{s}^{_boost_str(q.boost)}"


def to_s(q: Query, default_field: str | None = None) -> str:
    if q is None:
        return ""
    if isinstance(q, TermQuery):
        pre = "" if q.field == default_field else f"{q.field}:"
        return _maybe_boost(f"{pre}{q.term}", q)
    if isinstance(q, FuzzyQuery):
        pre = "" if q.field == default_field else f"{q.field}:"
        base = f"{pre}{q.term}~"
        if q.min_sim != 0.5:
            base += _boost_str(q.min_sim)
        return _maybe_boost(base, q)
    if isinstance(q, WildcardQuery):
        pre = "" if q.field == default_field else f"{q.field}:"
        return _maybe_boost(f"{pre}{q.pattern}", q)
    if isinstance(q, PrefixQuery):
        pre = "" if q.field == default_field else f"{q.field}:"
        return _maybe_boost(f"{pre}{q.prefix}*", q)
    if isinstance(q, MatchAllQuery):
        return _maybe_boost("*", q)
    if isinstance(q, RangeQuery):
        pre = "" if q.field == default_field else f"{q.field}:"
        if q.lower is not None and q.upper is not None:
            s = ("[" if q.include_lower else "{") + f"{q.lower} {q.upper}" + (
                "]" if q.include_upper else "}"
            )
        elif q.lower is not None:
            s = ("[" if q.include_lower else "{") + q.lower + ">"
        else:
            s = "<" + q.upper + ("]" if q.include_upper else "}")
        return _maybe_boost(pre + s, q)
    if isinstance(q, MultiTermQuery):
        pre = "" if q.field == default_field else f"{q.field}:"
        parts = []
        for b, t in sorted(q.boosted_terms):  # (boost, term) = pop order
            parts.append(t if b == 1.0 else f"{t}^{_boost_str(b)}")
        return _maybe_boost(pre + '"' + "|".join(parts) + '"', q)
    if isinstance(q, PhraseQuery):
        pre = "" if q.field == default_field else f"{q.field}:"
        if not q.positions:
            return f'{pre}""'
        # NOTE: sorts in place like phq_to_s (affects later add_term calls)
        q.positions.sort(key=lambda pp: (pp.pos, pp.terms[0]))
        out = []
        last_pos = q.positions[0].pos - 1
        for pp in q.positions:
            if pp.pos == last_pos:
                out[-1] = out[-1] + "&" + "|".join(pp.terms)
            else:
                for _ in range(last_pos, pp.pos - 1):
                    out.append("<>")
                out.append("|".join(pp.terms))
            last_pos = pp.pos
        s = f'{pre}"{" ".join(out)}"'
        if q.slop:
            s += f"~{q.slop}"
        return _maybe_boost(s, q)
    if isinstance(q, BooleanQuery):
        parts = []
        for c in q.clauses:
            cs = to_s(c.query, default_field)
            if isinstance(c.query, BooleanQuery):
                cs = f"({cs})"
            prefix = (
                "-" if c.is_prohibited else "+" if c.is_required else ""
            )
            parts.append(prefix + cs)
        s = " ".join(parts)
        if q.boost != 1.0:
            return f"({s})^{_boost_str(q.boost)}"
        return s
    raise TypeError(type(q).__name__)
