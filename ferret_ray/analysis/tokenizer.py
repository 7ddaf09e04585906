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

# Region separator split: chars that cannot occur inside any token.
_REGION = re.compile(r"[^\s()<>;\"]+")

# Python's ``\s`` (Unicode) as an explicit class, so the Arrow/RE2 batch
# split (analyzer.batch_terms_positions) sees EXACTLY the same separator
# set as the Python region split above — RE2's ``\s`` is ASCII-only.
_WS_CHARS = (
    "\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000"
)
ARROW_SEPARATOR_PATTERN = "[" + re.escape(_WS_CHARS) + '()<>;"' + "]+"
# complement class: maximal region runs (for offset recovery via the
# double split — split on separators gives regions, split on regions
# gives separators; codepoint lengths of both reconstruct offsets)
ARROW_REGION_PATTERN = "[^" + re.escape(_WS_CHARS) + '()<>;"' + "]+"

_PROTO_PREFIX = re.compile(r"(?:https?|ftp|file):/+")


class _RuleSet:
    """StandardTokenizer rule table for one alphabet.

    The reference builds three scanners from one grammar
    (c/src/scanner.in) by binding frt_alpha/frt_alnum/frt_digit to the
    ASCII classes (c/src/scanner.rl:21-23) or the Unicode 5.1 tables
    (c/src/scanner_mb.rl:24-26, scanner_utf8.rl:22-24 via
    uchar-utf8.rl).  Only those three classes vary: the email atext and
    URL alphabets stay ASCII in every variant (c/src/email.rl,
    c/src/url.rl use the Ragel builtins).  Python ``\\w``-based classes
    approximate the Unicode tables."""

    def __init__(self, uni: bool):
        if uni:
            alpha, alnum, digit = r"[^\W\d_]", r"[^\W_]", r"\d"
        else:
            alpha, alnum, digit = "[A-Za-z]", "[A-Za-z0-9]", "[0-9]"
        # --- rule regexes, declaration (priority) order ----------------
        atext = r"[A-Za-z0-9!#$%&'*+\-/=?^_`{|}~]"
        dot_atom = rf"{atext}+(?:\.{atext}+)*"
        # RFC2822-ish (c/src/email.rl): dot_atom@ (dot_atom | dom_literal)
        email = rf"{dot_atom}@(?:{dot_atom}|\[[^\]]*\])"
        token = rf"{alpha}{alnum}*"
        # url.rl: uword=[_alnum] dword=[-_alnum] dalnum=[-alnum]
        # urlc=[alnum.,/_\-@:]
        proto_host = r"[\-_A-Za-z0-9]+(?:\.[_A-Za-z0-9][\-_A-Za-z0-9]*)+"
        url_proto = rf"(?:https?|ftp|file):/+{proto_host}(?::[0-9]+)?/?"
        url_any = r"[A-Za-z0-9]+:/+[A-Za-z0-9.,/_\-@:]+"
        bare_sub = r"(?:[A-Za-z0-9](?:[\-A-Za-z0-9]*[A-Za-z0-9])?\.)+"
        tlds = r"(?:com|edu|biz|gov|int|info|mil|net|org|[A-Za-z]{2})"
        url_bare = rf"{bare_sub}{tlds}(?::[0-9]+)?/?"

        self.rules: list[tuple[str, re.Pattern[str]]] = [
            # kind, anchored pattern — priority of c/src/scanner.in:10-37
            ("email", re.compile(email)),
            ("token", re.compile(token)),
            ("poss1", re.compile(token + r"'")),          # trunc=1
            ("poss2", re.compile(token + r"'[sS]")),      # trunc=2
            ("contraction", re.compile(rf"{alpha}+'{alpha}+")),
            ("compound", re.compile(rf"{alnum}+(?:[-_]{alnum}+)*")),
            ("company", re.compile(rf"{token}[&@](?:{token})?")),
            ("url_proto", re.compile(url_proto)),
            ("url_any", re.compile(url_any)),
            ("url_bare", re.compile(url_bare)),
            ("acronym", re.compile(rf"(?:{alpha}\.)+{alpha}")),
            ("number", re.compile(rf"[-+]?{digit}+(?:\.{digit}+)?")),
        ]
        # chars that can begin some rule (atext ∪ alpha ∪ digits);
        # everything else in a region is a one-char separator
        # (c/src/scanner.in:36-40)
        self.start = re.compile(
            rf"[!#$%&'*+\-/=?^_`{{|}}~]|{alnum}" if uni
            else atext
        )
        # whole-region fast paths (cover ~all real text and source code)
        self.simple_region = re.compile(
            rf"{alnum}+(?:[-_]{alnum}+)*[.,]?"
        )
        self.number_region = re.compile(
            rf"[-+]?{digit}+(?:\.{digit}+)?[.,]?"
        )
        # first-char dispatch: rules that can match given the start char
        self.alpha_rules = [r for r in self.rules if r[0] != "number"]
        self.digit_rules = [
            r for r in self.rules
            if r[0] in ("email", "compound", "url_any", "url_bare",
                        "number")
        ]
        self.sign_rules = [
            r for r in self.rules if r[0] in ("email", "number")
        ]
        self.punct_rules = [r for r in self.rules if r[0] == "email"]


_RULESETS = {"ascii": _RuleSet(False), "utf8": _RuleSet(True)}


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


def _rules_for(rs: _RuleSet, ch: str):
    if ch.isdigit():
        return rs.digit_rules
    if ch.isalpha():
        return rs.alpha_rules
    if ch in "+-":
        return rs.sign_rules
    return rs.punct_rules


def _scan_region(
    text: str, pos: int, end: int, rs: _RuleSet
) -> Iterator[tuple[str, int, int]]:
    """Longest-match rule loop inside text[pos:end]."""
    while pos < end:
        m0 = rs.start.search(text, pos, end)
        if m0 is None:
            return
        pos = m0.start()
        best_len = 0
        best_kind = None
        best_m = None
        for kind, pat in _rules_for(rs, text[pos]):
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


def tokenize_raw(
    text: str, mode: str = "utf8"
) -> Iterator[tuple[str, int, int]]:
    """Yield (text, start, end) triples, StandardTokenizer semantics.

    ``mode`` picks the alphabet: "utf8" = the reference's default
    mb/utf8 scanner (Unicode letters/digits), "ascii" = the plain
    ASCII scanner.  Offsets are CODEPOINT indices (the C reference
    reports byte offsets; tests convert)."""
    rs = _RULESETS[mode]
    simple = rs.simple_region
    number = rs.number_region
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
        yield from _scan_region(text, start, end, rs)


def tokenize(text: str, mode: str = "utf8") -> Iterator[Token]:
    """Yield Ferret-StandardTokenizer tokens with (start, end) offsets."""
    for t, s, e in tokenize_raw(text, mode):
        yield Token(t, s, e)


class WhitespaceTokenizer:
    """whitespace/mb_whitespace tokenizer (c/src/analysis.c:396-430) —
    split on whitespace runs.  Python ``\\S`` is Unicode-aware, so the
    one implementation covers both reference variants."""

    _re = re.compile(r"\S+")

    def __call__(self, text: str) -> Iterator[Token]:
        for m in self._re.finditer(text):
            yield Token(m.group()[:MAX_WORD_LEN], m.start(), m.end())


class LetterTokenizer:
    """letter/mb_letter tokenizer (c/src/analysis.c:470-500) — maximal
    alpha runs; ``mode="utf8"`` (default) = Unicode letters
    (mb_letter_tokenizer_new), ``"ascii"`` = [A-Za-z]."""

    _res = {
        "ascii": re.compile(r"[A-Za-z]+"),
        "utf8": re.compile(r"[^\W\d_]+"),
    }

    def __init__(self, mode: str = "utf8"):
        self.mode = mode

    def __call__(self, text: str) -> Iterator[Token]:
        for m in self._res[self.mode].finditer(text):
            yield Token(m.group()[:MAX_WORD_LEN], m.start(), m.end())


class AlnumTokenizer:
    """Maximal [A-Za-z0-9] runs — SQL-parity tokenizer: with lowercase it
    equals DuckDB's regexp_extract_all(lower(text), '[a-z0-9]+')."""

    _re = re.compile(r"[A-Za-z0-9]+")

    def __call__(self, text: str) -> Iterator[Token]:
        for m in self._re.finditer(text):
            yield Token(m.group()[:MAX_WORD_LEN], m.start(), m.end())


class StandardTokenizer:
    """Callable wrapper around :func:`tokenize`.

    ``mode="utf8"`` (default) is the reference's mb/utf8 standard
    scanner (frt_std_scan_utf8, c/src/scanner_utf8.rl) — the default
    analyzer of the Ruby binding tokenizes non-ASCII words.
    ``mode="ascii"`` is the plain scanner (c/src/scanner.rl).  On
    pure-ASCII text the two are identical."""

    def __init__(self, mode: str = "utf8"):
        self.mode = mode

    def __call__(self, text: str) -> Iterator[Token]:
        return tokenize(text, self.mode)


class NonTokenizer:
    """frt_non_tokenizer_new (c/include/analysis.h:140) — whole value as one
    token (keyword / untokenized fields)."""

    def __call__(self, text: str) -> Iterator[Token]:
        if text:
            yield Token(text[: MAX_WORD_LEN], 0, len(text))
