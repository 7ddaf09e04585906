"""LegacyStandardTokenizer — the hand-rolled pre-Ragel tokenizer.

A faithful port of the C scanner's control flow
(c/src/analysis.c:632-1050, ASCII variant): plain alnum words,
apostrophe words with possessive stripping, company names with ``&``/
``@``, the numbers-with-punctuation rule (``legacy_std_get_number``:
``(alnum)((punc)(alnum))+`` where every second alnum run must contain a
digit), known-protocol URLs (proto stripped), generic url/email spans
over ``[./\\-_@ alnum]`` with the no-double-punctuation and single-``@``
rules, and acronym dot-stripping.  Token text capped at 254 chars like
the standard tokenizer; offsets always span the full match.

Goldens: c/test/test_analysis.c:443-491 (shared with StandardTokenizer)
via tests/test_legacy_tokenizer.py.
"""

from __future__ import annotations

from typing import Iterator

from .tokenizer import MAX_WORD_LEN, Token

_NUMPUNC = set(".,\\/_-")
_URLPUNC = set("./-_")
_URLXATPUNC = set("./-_@")

# ascii variant uses C isalnum; the mb variant the wide-char iswalnum
# under a UTF-8 locale (c/src/analysis.c:632-1050 with wide hooks) —
# Python's str predicates are the Unicode classification
_MB = False


def _isalnum(c: str, mb: bool = False) -> bool:
    return (mb or c.isascii()) and c.isalnum()


def _isalpha(c: str, mb: bool = False) -> bool:
    return (mb or c.isascii()) and c.isalpha()


def _isdigit(c: str, mb: bool = False) -> bool:
    return (mb or c.isascii()) and c.isdigit()


def _isurlc(c: str, mb: bool = False) -> bool:
    return c in _URLPUNC or _isalnum(c, mb)


def _isurlxatc(c: str, mb: bool = False) -> bool:
    return c in _URLXATPUNC or _isalnum(c, mb)


def _is_tok_char(c: str, mb: bool = False) -> bool:
    """legacy_std_is_tok_char (c/src/analysis.c:711-721)."""
    if not c or c.isspace():
        return False
    return _isalnum(c, mb) or c in _NUMPUNC or c in ("&", "@", "'", ":")


def _get_number(text: str, s: int, mb: bool = False) -> int:
    """legacy_std_get_number (c/src/analysis.c:748-781)."""
    n = len(text)

    def ch(k: int) -> str:
        return text[k] if 0 <= k < n else ""

    i = 0
    count = 0
    last_seen_digit = 2
    seen_digit = False
    while last_seen_digit >= 0:
        while _isalnum(ch(s + i), mb):
            if last_seen_digit < 2 and _isdigit(ch(s + i), mb):
                last_seen_digit = 2
            if not seen_digit and _isdigit(ch(s + i), mb):
                seen_digit = True
            i += 1
        last_seen_digit -= 1
        if ch(s + i) not in _NUMPUNC or not _isalnum(ch(s + i + 1), mb):
            if last_seen_digit >= 0:
                count = i
            break
        count = i
        i += 1
    return count if seen_digit else 0


def _get_url(text: str, base: int, i: int,
             mb: bool = False) -> tuple[str, int]:
    """std_get_url (c/src/analysis.c:810-838): scan url chars from
    text[base] starting at offset i; no two urlpuncs in a row; strip
    trailing puncs from the token but advance past them.

    Returns (token_text, next_pos)."""
    n = len(text)

    def ch(k: int) -> str:
        return text[k] if 0 <= k < n else ""

    while _isurlc(ch(base + i), mb):
        if ch(base + i) in _URLPUNC and ch(base + i - 1) in _URLPUNC:
            break
        i += 1
    next_pos = base + i
    if i >= MAX_WORD_LEN + 1:
        i = MAX_WORD_LEN
    while ch(base + i - 1) in _URLPUNC:
        i -= 1
    return text[base: base + i], next_pos


class LegacyStandardTokenizer:
    """legacy_standard_tokenizer_new (c/src/analysis.c:1036-1050);
    ``mode="mb"`` switches the char classes to the wide-char variant
    (mb_legacy_standard_tokenizer_new, same file)."""

    def __init__(self, mode: str = "ascii"):
        self.mode = mode

    def __call__(self, text: str) -> Iterator[Token]:
        mb = self.mode != "ascii"
        n = len(text)

        def ch(k: int) -> str:
            return text[k] if 0 <= k < n else ""

        pos = 0
        while True:
            # legacy_std_advance_to_start
            t = pos
            while t < n and not _isalnum(ch(t), mb):
                if ch(t) in _NUMPUNC and _isdigit(ch(t + 1), mb):
                    break
                t += 1
            if t >= n:
                return
            start = t
            # get_alpha
            i = t
            while _isalnum(ch(i), mb):
                i += 1
            token_i = i - t
            t = i

            if not _is_tok_char(ch(t), mb):
                # plain word — the very common case
                yield Token(text[start: t][:MAX_WORD_LEN], start, t)
                pos = t
                continue

            if ch(t) == "'":
                # apostrophe word, strip possessive
                j = t
                while _isalpha(ch(j), mb) or ch(j) == "'":
                    j += 1
                pos = j
                if ch(j - 1) in ("s", "S") and ch(j - 2) == "'":
                    tok = text[start: j - 2]
                elif ch(j - 1) == "'":
                    tok = text[start: j - 1]
                else:
                    tok = text[start: j]
                yield Token(tok[:MAX_WORD_LEN], start, j)
                continue

            if ch(t) == "&":
                # company name: alpha + '@'/'&'
                j = t
                while _isalpha(ch(j), mb) or ch(j) in ("@", "&"):
                    j += 1
                pos = j
                yield Token(text[start: j][:MAX_WORD_LEN], start, j)
                continue

            num_end = None
            if _isdigit(ch(start), mb) or ch(start) in _NUMPUNC:
                ln = _get_number(text, start, mb)
                if ln > 0:
                    num_end = start + ln
                    if not _is_tok_char(ch(num_end), mb):
                        # no longer token possible — emit the number
                        pos = num_end
                        yield Token(
                            text[start: num_end][:MAX_WORD_LEN],
                            start, num_end,
                        )
                        continue

            if ch(t) == ":" and ch(t + 1) == "/" and ch(t + 2) == "/":
                proto = text[start: start + token_i]
                t += 3
                while ch(t) == "/":
                    t += 1
                if _isalpha(ch(t), mb) and (
                    proto.startswith("ftp")
                    or proto.startswith("http")
                    or proto.startswith("file")
                ):
                    # known protocol: token drops the proto prefix
                    tok, pos = _get_url(text, t, 0, mb)
                else:
                    # unknown protocol stays in the token
                    tok, pos = _get_url(text, start, t - start, mb)
                yield Token(tok[:MAX_WORD_LEN], start, pos)
                continue

            # generic url / email / acronym span
            is_acronym = True
            seen_at = False
            while _isurlxatc(ch(t), mb):
                c = ch(t)
                if is_acronym and not _isalpha(c, mb) and c != ".":
                    is_acronym = False
                if c in _URLXATPUNC and ch(t - 1) in _URLXATPUNC:
                    break
                if c == "@":
                    if seen_at:
                        break
                    seen_at = True
                t += 1
            while ch(t - 1) in _URLXATPUNC and t > start:
                t -= 1

            if num_end is None or t > num_end:
                pos = t
                if is_acronym:
                    # must be single letters separated by dots
                    for s in range(start, t - 1):
                        if _isalpha(ch(s), mb) and ch(s + 1) != ".":
                            is_acronym = False
                            break
                if is_acronym:
                    tok = text[start: start + token_i] + text[
                        start + token_i: t
                    ].replace(".", "")
                else:
                    tok = text[start: t]
                yield Token(tok[:MAX_WORD_LEN], start, t)
            else:
                pos = num_end
                yield Token(
                    text[start: num_end][:MAX_WORD_LEN], start, num_end
                )


def legacy_standard_analyzer(stop_words=None, lowercase: bool = True,
                             mode: str = "ascii"):
    """legacy_standard_analyzer_new (c/src/analysis.c:1518-1537):
    LegacyStandardTokenizer -> lowercase -> stop -> hyphen;
    ``mode="mb"`` = mb_legacy_standard_analyzer_new."""
    from .analyzer import Analyzer
    from .stopwords import FULL_ENGLISH_STOP_WORDS

    return Analyzer(
        LegacyStandardTokenizer(mode=mode),
        lowercase=lowercase,
        stop_words=(
            FULL_ENGLISH_STOP_WORDS if stop_words is None else stop_words
        ),
        hyphen=True,
    )
