"""Analyzer chains: tokenizer -> filters, mirroring c/src/analysis.c.

The reference StandardAnalyzer chain is
``StandardTokenizer -> LowerCaseFilter -> StopFilter -> HyphenFilter``
(c/src/analysis.c:1497-1516).  Filters are implemented as generator
transforms over :class:`~ferret_ray.analysis.tokenizer.Token` streams.

Golden behavior (c/test/test_analysis.c:591-616):
  * StopFilter accumulates ``pos_inc`` across dropped words
    (c/src/analysis.c:1138-1152).
  * HyphenFilter: for an all-alpha hyphenated token ("e-mail") emit the
    concatenation ("email") first with the original pos_inc, then each part
    ("e" at pos_inc 0, "mail" at pos_inc 1) with offsets into the original
    text (c/src/analysis.c:1271-1336).  The leading char is not inspected
    and digits/punctuation disable the split.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

from .stopwords import FULL_ENGLISH_STOP_WORDS
from .tokenizer import (
    _REGION,
    LetterTokenizer,
    NonTokenizer,
    StandardTokenizer,
    Token,
    WhitespaceTokenizer,
    tokenize,
    tokenize_raw,
)

_REGION_FINDALL = _REGION.findall

TokenStream = Iterable[Token]

_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def lowercase_filter(stream: TokenStream) -> Iterator[Token]:
    """ASCII tolower per byte (c/src/analysis.c:1376-1395)."""
    for tk in stream:
        yield tk._replace(text=tk.text.translate(_ASCII_LOWER))


def stop_filter(
    stream: TokenStream, stop_words: frozenset[str] = FULL_ENGLISH_STOP_WORDS
) -> Iterator[Token]:
    """Drop stop words, accumulating pos_inc (c/src/analysis.c:1138-1152)."""
    gap = 0
    for tk in stream:
        if tk.text in stop_words:
            gap += tk.pos_inc
        else:
            if gap:
                tk = tk._replace(pos_inc=tk.pos_inc + gap)
                gap = 0
            yield tk


class MappingFilter:
    """Multi-pattern char-sequence rewriting inside token text
    (c/src/analysis.c:1199-1257 + multimapper.c): leftmost match wins,
    longest pattern wins at the same position.  Golden:
    c/test/test_analysis.c:967-1011."""

    def __init__(self, mappings: dict[str, str] | None = None):
        import re as _re

        self.mappings = dict(mappings or {})
        self._re = None
        if self.mappings:
            pats = sorted(self.mappings, key=len, reverse=True)
            self._re = _re.compile(
                "|".join(_re.escape(p) for p in pats)
            )

    def add(self, pattern: str, replacement: str) -> "MappingFilter":
        self.mappings[pattern] = replacement
        self.__init__(self.mappings)
        return self

    def map(self, text: str) -> str:
        if self._re is None:
            return text
        return self._re.sub(lambda m: self.mappings[m.group()], text)

    def __call__(self, stream: TokenStream) -> Iterator[Token]:
        for tk in stream:
            yield tk._replace(text=self.map(tk.text)[:254])


def stem_filter(stream: TokenStream) -> Iterator[Token]:
    """Snowball English stemming (StemFilter, c/src/analysis.c:1397-1470)
    via the pure-Python Porter2 in ``stemmer.py`` (libstemmer-exact)."""
    from .stemmer import stem

    for tk in stream:
        yield tk._replace(text=stem(tk.text))


def _is_splittable(text: str) -> bool:
    # c/src/analysis.c:1297-1310: scan from the SECOND char; need >=1 hyphen
    # and nothing but alpha/hyphen after the first char.
    seen_hyphen = False
    for ch in text[1:]:
        if ch == "-":
            seen_hyphen = True
        elif not ch.isalpha():
            return False
    return seen_hyphen


def hyphen_filter(stream: TokenStream) -> Iterator[Token]:
    """Expand all-alpha hyphen compounds (c/src/analysis.c:1271-1336)."""
    for tk in stream:
        if "-" in tk.text and _is_splittable(tk.text):
            # concat token keeps the ORIGINAL start/end offsets
            concat = tk.text.replace("-", "")
            yield Token(concat, tk.start, tk.end, tk.pos_inc)
            offset = 0
            first = True
            for part in tk.text.split("-"):
                start = tk.start + offset
                yield Token(part, start, start + len(part), 0 if first else 1)
                offset += len(part) + 1
                first = False
        else:
            yield tk


class Analyzer:
    """A configurable tokenizer+filter chain, picklable for Ray tasks."""

    def __init__(
        self,
        tokenizer: Callable[[str], Iterable[Token]] | None = None,
        lowercase: bool = True,
        stop_words: frozenset[str] | None = FULL_ENGLISH_STOP_WORDS,
        hyphen: bool = True,
        stem: bool = False,
    ) -> None:
        self.tokenizer = tokenizer or StandardTokenizer()
        self.lowercase = lowercase
        self.stop_words = stop_words
        self.hyphen = hyphen
        self.stem = stem

    def token_stream(self, text: str) -> Iterator[Token]:
        stream: Iterable[Token] = self.tokenizer(text)
        if self.lowercase:
            stream = lowercase_filter(stream)
        if self.stop_words is not None:
            stream = stop_filter(stream, self.stop_words)
        if self.hyphen:
            stream = hyphen_filter(stream)
        if self.stem:
            stream = stem_filter(stream)
        return iter(stream)

    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_region_cache", None)  # per-process memo, never shipped
        return state

    def _process_region(self, region: str) -> tuple[tuple, int]:
        """Run the full filter chain over ONE separator-free region.

        A region is a maximal run of non-separator characters, so its
        token output is context-free: the result is a tuple of
        ``(term, pos_inc)`` pairs (pos_inc folds in gaps from stop words
        dropped earlier in the region) plus the trailing stop-word gap to
        carry into the next region.  This is what makes per-region
        memoization exact."""
        lowercase = self.lowercase
        stop = self.stop_words
        hyphen = self.hyphen
        if self.stem:
            from .stemmer import stem as _stem
        else:
            _stem = None
        pairs: list[tuple[str, int]] = []
        gap = 0
        for t, _s, _e in tokenize_raw(region):
            if lowercase:
                t = t.lower()
            if stop is not None and t in stop:
                gap += 1
                continue
            pinc = 1 + gap
            gap = 0
            if hyphen and "-" in t and _is_splittable(t):
                concat = t.replace("-", "")
                pairs.append((_stem(concat) if _stem else concat, pinc))
                first = True
                for part in t.split("-"):
                    pairs.append(
                        (_stem(part) if _stem else part, 0 if first else 1)
                    )
                    first = False
            else:
                pairs.append((_stem(t) if _stem else t, pinc))
        return tuple(pairs), gap

    def _terms_positions_std(
        self, text: str, max_field_length: int
    ) -> tuple[list[str], list[int]]:
        """StandardTokenizer hot path with per-region memoization.

        Corpora (especially code) repeat a small vocabulary of regions
        enormously; caching region -> processed (term, pos_inc) pairs
        turns the per-token regex + filter chain into one dict hit."""
        cache: dict[str, tuple[tuple, int]] = getattr(
            self, "_region_cache", None
        ) or self.__dict__.setdefault("_region_cache", {})
        process = self._process_region
        terms: list[str] = []
        positions: list[int] = []
        append_t = terms.append
        append_p = positions.append
        pos = -1
        gap = 0
        n = 0
        get = cache.get
        for region in _REGION_FINDALL(text):
            v = get(region)
            if v is None:
                v = process(region)
                if len(region) <= 64:
                    if len(cache) >= 1_000_000:  # bound actor memory
                        cache.clear()
                    cache[region] = v
            pairs, tgap = v
            for t, pinc in pairs:
                pos += pinc + gap
                gap = 0
                append_t(t)
                append_p(pos)
                n += 1
                if n > max_field_length:
                    return terms, positions
            gap += tgap
        return terms, positions

    def terms_positions(
        self, text: str, max_field_length: int = 10_000
    ) -> tuple[list[str], list[int]]:
        """Hot-path API for the indexer: (terms, positions).

        Fuses tokenizer + lowercase + stop + hyphen filters in one loop
        (no Token objects).  Position accumulation and the
        max_field_length cut-off replicate dw_invert_field
        (c/src/index.c:5565-5640): ``pos += pos_inc``, clamped at 0, and
        the field is truncated after max_field_length+1 tokens (the
        reference's post-increment check keeps one extra).
        """
        if isinstance(self.tokenizer, StandardTokenizer):
            # memoized per-region path (exactly equivalent: the region
            # split is the tokenizer's own outer loop, and std-tokenizer
            # pos_inc is always 1 so positions are never negative)
            return self._terms_positions_std(text, max_field_length)
        raw = ((tk.text, tk.pos_inc) for tk in self.tokenizer(text))
        lowercase = self.lowercase
        stop = self.stop_words
        hyphen = self.hyphen
        if self.stem:
            from .stemmer import stem as _stem
        else:
            _stem = None
        terms: list[str] = []
        positions: list[int] = []
        append_t = terms.append
        append_p = positions.append
        pos = -1
        gap = 0  # accumulated pos_inc from dropped stop words
        n = 0
        for t, pos_inc in raw:
            if lowercase:
                t = t.lower()
            if stop is not None and t in stop:
                gap += pos_inc
                continue
            pos += pos_inc + gap
            gap = 0
            if pos < 0:
                pos = 0
            if hyphen and "-" in t and _is_splittable(t):
                concat = t.replace("-", "")
                append_t(_stem(concat) if _stem else concat)
                append_p(pos)
                n += 1
                if n > max_field_length:
                    break
                first = True
                stop_all = False
                for part in t.split("-"):
                    if not first:
                        pos += 1
                    first = False
                    append_t(_stem(part) if _stem else part)
                    append_p(pos)
                    n += 1
                    if n > max_field_length:
                        stop_all = True
                        break
                if stop_all:
                    break
            else:
                append_t(_stem(t) if _stem else t)
                append_p(pos)
                n += 1
                if n > max_field_length:
                    break
        return terms, positions


def standard_analyzer(
    stop_words: frozenset[str] | None = FULL_ENGLISH_STOP_WORDS,
    lowercase: bool = True,
) -> Analyzer:
    """standard_analyzer_new (c/src/analysis.c:1497-1516)."""
    return Analyzer(StandardTokenizer(), lowercase, stop_words, True)


def whitespace_analyzer(lowercase: bool = False) -> Analyzer:
    return Analyzer(WhitespaceTokenizer(), lowercase, None, False)


def letter_analyzer(lowercase: bool = True) -> Analyzer:
    return Analyzer(LetterTokenizer(), lowercase, None, False)


def keyword_analyzer() -> Analyzer:
    return Analyzer(NonTokenizer(), False, None, False)


__all__ = [
    "Analyzer",
    "Token",
    "hyphen_filter",
    "keyword_analyzer",
    "letter_analyzer",
    "lowercase_filter",
    "standard_analyzer",
    "stop_filter",
    "tokenize",
    "whitespace_analyzer",
]
