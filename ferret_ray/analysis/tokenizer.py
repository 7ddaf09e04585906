"""Ferret StandardTokenizer semantics, re-implemented with compiled regexes.

The reference tokenizer is a Ragel FSM (grammar: c/src/scanner.in:8-42,
c/src/url.rl:12-26, c/src/email.rl:20; driver: c/src/scanner.rl:32-85).
Ragel scanners use *longest-match* semantics with declaration-order priority
on ties.  We reproduce that with a two-level scan:

1. Split the input into candidate *regions* — maximal runs of characters
   that may appear inside some token (everything except whitespace and
   ``( ) < > ; "``, none of which occur inside any grammar rule except the
   rare quoted-string email local part, which we deliberately drop).
2. A region that wholly matches the alnum/[-_] compound rule or the signed
   number rule (optionally with one trailing '.' or ',') is emitted
   directly — this covers ~all tokens of real text/code.  Otherwise run the
   full longest-match loop (one anchored regex per grammar rule, ties ->
   lowest rule index) inside the region.

Golden outputs: c/test/test_analysis.c:443-483 (tokens + offsets).

Post-processing mirrors the reference driver (c/src/scanner.rl:60-85):
  * ``skip``  — URL "proto://" prefixes (http/https/ftp/file) are skipped in
    the token text but included in start/end offsets (c/src/url.rl:13-14).
  * ``trunc`` — trailing "'" / "'s" possessives and trailing "/" of URLs are
    included in the offsets but cut from the text (c/src/scanner.in:15-16,
    c/src/url.rl:25).
  * ``strip`` — acronyms drop their dots ("T.N.T." -> "TNT",
    c/src/scanner.in:32).
Token text is capped at 254 bytes (FRT_MAX_WORD_SIZE 255 minus NUL,
c/src/scanner.rl:35+63, c/include/global.h:17).
"""

from __future__ import annotations

import re
from typing import Iterator, NamedTuple


class Token(NamedTuple):
    text: str
    start: int
    end: int
    pos_inc: int = 1


MAX_WORD_LEN = 254  # FRT_MAX_WORD_SIZE(255) - trailing NUL

# --- rule regexes, in declaration (priority) order -------------------------
_ATEXT = r"[A-Za-z0-9!#$%&'*+\-/=?^_`{|}~]"
_DOT_ATOM = rf"{_ATEXT}+(?:\.{_ATEXT}+)*"
# RFC2822-ish (c/src/email.rl): dot_atom@ (dot_atom | domain_literal)
_EMAIL = rf"{_DOT_ATOM}@(?:{_DOT_ATOM}|\[[^\]]*\])"

_TOKEN = r"[A-Za-z][A-Za-z0-9]*"
# url.rl: uword=[_alnum] dword=[-_alnum] dalnum=[-alnum] urlc=[alnum.,/_\-@:]
_PROTO_HOST = r"[\-_A-Za-z0-9]+(?:\.[_A-Za-z0-9][\-_A-Za-z0-9]*)+"
_URL_PROTO = rf"(?:https?|ftp|file):/+{_PROTO_HOST}(?::\d+)?/?"
_URL_ANYPROTO = r"[A-Za-z0-9]+:/+[A-Za-z0-9.,/_\-@:]+"
_BARE_SUB = r"(?:[A-Za-z0-9](?:[\-A-Za-z0-9]*[A-Za-z0-9])?\.)+"
_TLDS = r"(?:com|edu|biz|gov|int|info|mil|net|org|[A-Za-z]{2})"
_URL_BARE = rf"{_BARE_SUB}{_TLDS}(?::\d+)?/?"

_RULES: list[tuple[str, re.Pattern[str]]] = [
    # kind, anchored pattern — priority order of c/src/scanner.in:10-37
    ("email", re.compile(_EMAIL)),
    ("token", re.compile(_TOKEN)),
    ("poss1", re.compile(_TOKEN + r"'")),            # trunc=1
    ("poss2", re.compile(_TOKEN + r"'[sS]")),        # trunc=2
    ("contraction", re.compile(r"[A-Za-z]+'[A-Za-z]+")),
    ("compound", re.compile(r"[A-Za-z0-9]+(?:[-_][A-Za-z0-9]+)*")),
    ("company", re.compile(rf"{_TOKEN}[&@](?:{_TOKEN})?")),
    ("url_proto", re.compile(_URL_PROTO)),
    ("url_any", re.compile(_URL_ANYPROTO)),
    ("url_bare", re.compile(_URL_BARE)),
    ("acronym", re.compile(r"(?:[A-Za-z]\.)+[A-Za-z]")),
    ("number", re.compile(r"[-+]?\d+(?:\.\d+)?")),
]

# Characters that can begin some rule (atext ∪ digits); everything else in a
# region is a one-char separator (c/src/scanner.in:36-40).
_START = re.compile(r"[A-Za-z0-9!#$%&'*+\-/=?^_`{|}~]")

# Region separator split: chars that cannot occur inside any token.
_REGION = re.compile(r"[^\s()<>;\"]+")

# Whole-region fast paths (cover ~all of real text and source code).
_SIMPLE_REGION = re.compile(r"[A-Za-z0-9]+(?:[-_][A-Za-z0-9]+)*[.,]?")
_NUMBER_REGION = re.compile(r"[-+]?\d+(?:\.\d+)?[.,]?")

_PROTO_PREFIX = re.compile(r"(?:https?|ftp|file):/+")


def _finish(kind: str, text: str) -> str:
    if kind == "poss1":
        text = text[:-1]
    elif kind == "poss2":
        text = text[:-2]
    elif kind == "acronym":
        text = text.replace(".", "")
    elif kind[0] == "u":  # url_*
        if kind != "url_bare":
            pm = _PROTO_PREFIX.match(text)
            if pm:  # skip "http://" etc. from the text, keep offsets
                text = text[pm.end():]
        if text.endswith("/"):
            text = text[:-1]
    return text[:MAX_WORD_LEN]


# first-char dispatch: which rules can possibly match given the start char
_ALPHA_RULES = [r for r in _RULES if r[0] != "number"]
_DIGIT_RULES = [
    r for r in _RULES
    if r[0] in ("email", "compound", "url_any", "url_bare", "number")
]
_SIGN_RULES = [r for r in _RULES if r[0] in ("email", "number")]
_PUNCT_RULES = [r for r in _RULES if r[0] == "email"]


def _rules_for(ch: str):
    if ch.isdigit():
        return _DIGIT_RULES
    if ch.isalpha():
        return _ALPHA_RULES
    if ch in "+-":
        return _SIGN_RULES
    return _PUNCT_RULES


def _scan_region(text: str, pos: int, end: int) -> Iterator[tuple[str, int, int]]:
    """Longest-match rule loop inside text[pos:end]."""
    while pos < end:
        m0 = _START.search(text, pos, end)
        if m0 is None:
            return
        pos = m0.start()
        best_len = 0
        best_kind = None
        best_m = None
        for kind, pat in _rules_for(text[pos]):
            m = pat.match(text, pos, end)
            if m is not None:
                ln = m.end() - pos
                if ln > best_len:
                    best_len, best_kind, best_m = ln, kind, m
        if best_m is None:
            pos += 1
            continue
        yield _finish(best_kind, best_m.group()), pos, best_m.end()
        pos = best_m.end()


def tokenize_raw(text: str) -> Iterator[tuple[str, int, int]]:
    """Yield (text, start, end) triples, StandardTokenizer semantics."""
    simple = _SIMPLE_REGION
    number = _NUMBER_REGION
    for rm in _REGION.finditer(text):
        start, end = rm.start(), rm.end()
        # fast path 1: plain word / identifier / hyphenated compound,
        # optionally with one trailing '.' or ','
        m = simple.fullmatch(text, start, end)
        if m is not None:
            g = text[start:end]
            if g[-1] in ".,":
                if len(g) > 1:
                    yield g[:-1][:MAX_WORD_LEN], start, end - 1
                continue
            yield g[:MAX_WORD_LEN], start, end
            continue
        # fast path 2: signed int/float
        m = number.fullmatch(text, start, end)
        if m is not None:
            g = text[start:end]
            if g[-1] in ".,":
                core = g[:-1]
                if core and core[-1].isdigit():
                    yield core[:MAX_WORD_LEN], start, end - 1
                continue
            yield g[:MAX_WORD_LEN], start, end
            continue
        yield from _scan_region(text, start, end)


def tokenize(text: str) -> Iterator[Token]:
    """Yield Ferret-StandardTokenizer tokens with (start, end) offsets."""
    for t, s, e in tokenize_raw(text):
        yield Token(t, s, e)


class WhitespaceTokenizer:
    """c/src/analysis.c:396-430 — split on whitespace runs."""

    _re = re.compile(r"\S+")

    def __call__(self, text: str) -> Iterator[Token]:
        for m in self._re.finditer(text):
            yield Token(m.group()[:MAX_WORD_LEN], m.start(), m.end())


class LetterTokenizer:
    """c/src/analysis.c:470-500 — maximal alpha runs."""

    _re = re.compile(r"[A-Za-z]+")

    def __call__(self, text: str) -> Iterator[Token]:
        for m in self._re.finditer(text):
            yield Token(m.group()[:MAX_WORD_LEN], m.start(), m.end())


class AlnumTokenizer:
    """Maximal [A-Za-z0-9] runs — SQL-parity tokenizer: with lowercase it
    equals DuckDB's regexp_extract_all(lower(text), '[a-z0-9]+')."""

    _re = re.compile(r"[A-Za-z0-9]+")

    def __call__(self, text: str) -> Iterator[Token]:
        for m in self._re.finditer(text):
            yield Token(m.group()[:MAX_WORD_LEN], m.start(), m.end())


class StandardTokenizer:
    """Callable wrapper around :func:`tokenize`."""

    def __call__(self, text: str) -> Iterator[Token]:
        return tokenize(text)


class NonTokenizer:
    """frt_non_tokenizer_new (c/include/analysis.h:140) — whole value as one
    token (keyword / untokenized fields)."""

    def __call__(self, text: str) -> Iterator[Token]:
        if text:
            yield Token(text[: MAX_WORD_LEN], 0, len(text))
