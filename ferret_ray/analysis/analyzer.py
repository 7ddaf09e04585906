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
    """Lowercase filter.  ``str.lower()`` covers both reference
    variants: the mb filter is towlower per char
    (c/src/analysis.c:1343-1374), and on the pure-ASCII tokens the
    ASCII variant (c/src/analysis.c:1376-1395) can emit, the two
    agree."""
    for tk in stream:
        yield tk._replace(text=tk.text.lower())


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


def stem_filter(
    stream: TokenStream, algorithm: str = "english"
) -> Iterator[Token]:
    """Snowball stemming (StemFilter, c/src/analysis.c:1397-1470).
    ``algorithm`` selects the Snowball language like the reference's
    sb_stemmer_new(algorithm, charenc); english uses the Porter2 in
    ``stemmer.py``, other languages live in ``stemmer_multi.py`` —
    all validated byte-exact against the reference's libstemmer."""
    from .stemmer_multi import snowball_stem

    fn = snowball_stem(algorithm)
    for tk in stream:
        yield tk._replace(text=fn(tk.text))


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


# Process-global memo state, keyed by analyzer config.  Ray reuses worker
# processes across tasks (and map_batches task-pool UDFs deserialize a
# FRESH instance per task), so instance-level caches reset every task and
# every build pays the vocabulary warm-up again.  Sharing at module level
# keeps the region memo + batch vocab warm for the worker's lifetime —
# the steady-state throughput a long-running cluster actually sees.
_SHARED_STATE: dict[tuple, dict] = {}


def _shared_state(key: tuple) -> dict:
    st = _SHARED_STATE.get(key)
    if st is None:
        st = {}
        _SHARED_STATE[key] = st
    return st


class Analyzer:
    """A configurable tokenizer+filter chain, picklable for Ray tasks."""

    def __init__(
        self,
        tokenizer: Callable[[str], Iterable[Token]] | None = None,
        lowercase: bool = True,
        stop_words: frozenset[str] | None = FULL_ENGLISH_STOP_WORDS,
        hyphen: bool = True,
        stem: "bool | str" = False,
    ) -> None:
        self.tokenizer = tokenizer or StandardTokenizer()
        self.lowercase = lowercase
        self.stop_words = stop_words
        self.hyphen = hyphen
        self.stem = stem

    def _cache_key(self) -> tuple:
        return (
            type(self.tokenizer).__name__,
            getattr(self.tokenizer, "mode", ""),
            self.lowercase,
            self.stop_words,
            self.hyphen,
            self.stem,
        )

    def token_stream(self, text: str) -> Iterator[Token]:
        stream: Iterable[Token] = self.tokenizer(text)
        if self.lowercase:
            stream = lowercase_filter(stream)
        if self.stop_words is not None:
            stream = stop_filter(stream, self.stop_words)
        if self.hyphen:
            stream = hyphen_filter(stream)
        if self.stem:
            stream = stem_filter(stream, self._stem_algorithm())
        return iter(stream)

    def _stem_algorithm(self) -> str:
        # stem=True keeps the historical default (Snowball english);
        # a string selects the algorithm like the reference's
        # StemFilter.new(ts, algorithm, charenc)
        return "english" if self.stem is True else str(self.stem)

    def _stem_fn(self):
        if not self.stem:
            return None
        from .stemmer_multi import snowball_stem

        return snowball_stem(self._stem_algorithm())

    def __getstate__(self):
        state = dict(self.__dict__)
        # per-process memo structures, never shipped
        state.pop("_region_cache", None)
        state.pop("_batch_vocab", None)
        return state

    def _process_region(self, region: str) -> tuple[tuple, int]:
        """Run the full filter chain over ONE separator-free region.

        A region is a maximal run of non-separator characters, so its
        token output is context-free: the result is a tuple of
        ``(term, pos_inc, start, end)`` tuples (offsets relative to the
        region; pos_inc folds in gaps from stop words dropped earlier in
        the region) plus the trailing stop-word gap to carry into the
        next region.  This is what makes per-region memoization exact."""
        lowercase = self.lowercase
        stop = self.stop_words
        hyphen = self.hyphen
        _stem = self._stem_fn()
        pairs: list[tuple[str, int, int, int]] = []
        gap = 0
        mode = getattr(self.tokenizer, "mode", "utf8")
        for t, s, e in tokenize_raw(region, mode):
            if lowercase:
                t = t.lower()
            if stop is not None and t in stop:
                gap += 1
                continue
            pinc = 1 + gap
            gap = 0
            if hyphen and "-" in t and _is_splittable(t):
                concat = t.replace("-", "")
                pairs.append(
                    (_stem(concat) if _stem else concat, pinc, s, e)
                )
                first = True
                off = 0
                for part in t.split("-"):
                    ps = s + off
                    pairs.append(
                        (
                            _stem(part) if _stem else part,
                            0 if first else 1,
                            ps,
                            ps + len(part),
                        )
                    )
                    off += len(part) + 1
                    first = False
            else:
                pairs.append((_stem(t) if _stem else t, pinc, s, e))
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
        ) or self.__dict__.setdefault(
            "_region_cache",
            _shared_state(self._cache_key()).setdefault("region", {}),
        )
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
            for t, pinc, _s, _e in pairs:
                pos += pinc + gap
                gap = 0
                append_t(t)
                append_p(pos)
                n += 1
                if n > max_field_length:
                    return terms, positions
            gap += tgap
        return terms, positions

    def terms_positions_offsets(
        self, text: str, max_field_length: int = 10_000
    ) -> list[tuple[str, int, int, int]]:
        """(term, position, start, end) per token — the memoized-region
        fast path for stored term vectors (fw_add_postings input).
        Offsets are codepoint indices into ``text``.  StandardTokenizer
        chains only; callers fall back to :meth:`token_stream`."""
        cache: dict[str, tuple[tuple, int]] = getattr(
            self, "_region_cache", None
        ) or self.__dict__.setdefault(
            "_region_cache",
            _shared_state(self._cache_key()).setdefault("region", {}),
        )
        process = self._process_region
        get = cache.get
        out: list[tuple[str, int, int, int]] = []
        append = out.append
        pos = -1
        gap = 0
        n = 0
        for rm in _REGION.finditer(text):
            region = rm.group()
            base = rm.start()
            v = get(region)
            if v is None:
                v = process(region)
                if len(region) <= 64:
                    if len(cache) >= 1_000_000:
                        cache.clear()
                    cache[region] = v
            pairs, tgap = v
            for t, pinc, s, e in pairs:
                pos += pinc + gap
                gap = 0
                append((t, max(pos, 0), base + s, base + e))
                n += 1
                if n > max_field_length:
                    return out
            gap += tgap
        return out

    def term_vector_blob(
        self, text: str, max_field_length: int = 10_000
    ) -> bytes:
        """Encoded term vector (codec.termvector layout) via per-region
        blob caching: within a region every delta (pos_inc, start, len)
        is context-free, so tokens 2..n of each region encode ONCE per
        unique region; per doc only the region-boundary deltas are
        written.  Byte-identical to
        ``encode_term_vector(terms_positions_offsets(text))``."""
        from ..codec.termvector import _vint, encode_term_vector

        parts: list[bytes] = []
        append = parts.append
        count = 0
        pos = -1
        prev_enc_pos = 0
        prev_start = 0
        gap = 0
        entry = self._tv_entry
        for rm in _REGION.finditer(text):
            head1, pinc1, rs1, tail, n, last_pos_rel, last_rs, tgap = (
                entry(rm.group())
            )
            if n:
                if count + n > max_field_length + 1:
                    # rare giant doc: exact truncation via the slow path
                    return encode_term_vector(
                        self.terms_positions_offsets(
                            text, max_field_length
                        )
                    )
                base = rm.start()
                pos_first = pos + pinc1 + gap
                gap = 0
                head = bytearray(head1)
                _vint(head, max(pos_first, 0) - prev_enc_pos)
                s_first = base + rs1
                _vint(head, s_first - prev_start)
                append(bytes(head))
                append(tail)  # first token's length vint + tokens 2..n
                pos = pos_first + last_pos_rel
                prev_enc_pos = max(pos, 0)
                prev_start = base + last_rs
                count += n
            gap += tgap
        out = bytearray()
        _vint(out, count)
        return bytes(out) + b"".join(parts)

    def _tv_entry(self, region: str):
        """Per-unique-region term-vector entry (cached): pre-encoded
        head term piece, fully pre-encoded tail (tokens 2..n — every
        delta is region-internal), and the boundary scalars."""
        from ..codec.termvector import _vint

        shared = _shared_state(self._cache_key())
        tvc = shared.setdefault("tv", {})
        e = tvc.get(region)
        if e is not None:
            return e
        cache = shared.setdefault("region", {})
        v = cache.get(region)
        if v is None:
            v = self._process_region(region)
            if len(region) <= 64:
                if len(cache) >= 1_000_000:
                    cache.clear()
                cache[region] = v
        pairs, tgap = v
        if pairs:
            t1, pinc1, rs1, re1 = pairs[0]
            tb1 = t1.encode("utf-8", "surrogatepass")
            head = bytearray()
            _vint(head, len(tb1))
            head += tb1
            tail = bytearray()
            _vint(tail, re1 - rs1)  # first token's length vint
            last_pos_rel = 0
            prev_rs = rs1
            for t, pinc, rs, re in pairs[1:]:
                tb = t.encode("utf-8", "surrogatepass")
                _vint(tail, len(tb))
                tail += tb
                _vint(tail, pinc)
                _vint(tail, rs - prev_rs)
                _vint(tail, re - rs)
                last_pos_rel += pinc
                prev_rs = rs
            e = (bytes(head), pinc1, rs1, bytes(tail), len(pairs),
                 last_pos_rel, prev_rs, tgap)
        else:
            e = (b"", 0, 0, b"", 0, 0, 0, tgap)
        if len(tvc) >= 500_000:
            tvc.clear()
        tvc[region] = e
        return e

    def batch_term_vectors(
        self, texts: list, max_field_length: int = 10_000
    ) -> list[bytes]:
        """Encoded term vectors for a whole column (verdict #10).

        Offsets are recovered WITHOUT per-char Python via the double
        Arrow split: splitting on separators yields the region pieces,
        splitting on regions yields the separator pieces; codepoint
        lengths of both reconstruct every region's start offset.  Each
        UNIQUE region encodes once (:meth:`_tv_entry`); per doc only the
        region-boundary deltas (position inc, start delta) are computed
        — as numpy arrays — and the final blobs are assembled with
        vectorized vint encoding + buffer scatters.  Byte-identical to
        ``encode_term_vector(terms_positions_offsets(text))`` per row.
        """
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..codec.termvector import encode_term_vector
        from ..codec.vint import vint_byte_len, vint_encode
        from .tokenizer import (
            ARROW_REGION_PATTERN,
            ARROW_SEPARATOR_PATTERN,
        )

        n_docs = len(texts)
        arr = pa.array(
            ["" if t is None else t for t in texts], type=pa.string()
        )
        regs = pc.split_pattern_regex(arr, ARROW_SEPARATOR_PATTERN)
        seps = pc.split_pattern_regex(arr, ARROW_REGION_PATTERN)
        if isinstance(regs, pa.ChunkedArray):
            regs = regs.combine_chunks()
        if isinstance(seps, pa.ChunkedArray):
            seps = seps.combine_chunks()
        r_off = regs.offsets.to_numpy().astype(np.int64)
        s_off = seps.offsets.to_numpy().astype(np.int64)
        r_flat = regs.flatten()
        s_flat = seps.flatten()
        r_len = pc.utf8_length(r_flat).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        s_len = pc.utf8_length(s_flat).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # exclusive prefix sums, reset per doc at use sites
        csum_r = np.concatenate(([0], np.cumsum(r_len)))
        csum_s = np.concatenate(([0], np.cumsum(s_len)))

        # region piece -> doc, local index
        n_r = np.diff(r_off)
        reg_doc = np.repeat(np.arange(n_docs, dtype=np.int64), n_r)
        local_k = (
            np.arange(r_len.size, dtype=np.int64) - r_off[reg_doc]
        )
        # case A (text starts with a region char): first sep piece empty
        first_sep_empty = np.zeros(n_docs, dtype=np.int64)
        ns = np.diff(s_off)
        has_sep = ns > 0
        first_sep_empty[has_sep] = (
            s_len[s_off[:-1][has_sep]] == 0
        ).astype(np.int64)
        # start offset of region piece g within its doc
        sep_idx = s_off[reg_doc] + local_k + first_sep_empty[reg_doc]
        np.clip(sep_idx, 0, s_len.size, out=sep_idx)
        reg_start = (
            (csum_r[np.arange(r_len.size)] - csum_r[r_off[reg_doc]])
            + (csum_s[sep_idx] - csum_s[s_off[reg_doc]])
        )

        # keep only nonempty region pieces, in (doc, local) order
        keep = r_len > 0
        kept = np.flatnonzero(keep)
        k_doc = reg_doc[kept]
        k_start = reg_start[kept]
        k_flat = r_flat.filter(pa.array(keep))

        # unique-region entries
        d = k_flat.dictionary_encode()
        codes = d.indices.to_numpy().astype(np.int64)
        uniq = d.dictionary.to_pylist()
        tvc = _shared_state(self._cache_key()).setdefault("tv", {})
        tget = tvc.get
        mk = self._tv_entry
        ent = [tget(r) or mk(r) for r in uniq]
        pinc1_u = np.array([e[1] for e in ent], dtype=np.int64)
        rs1_u = np.array([e[2] for e in ent], dtype=np.int64)
        n_u = np.array([e[4] for e in ent], dtype=np.int64)
        lpr_u = np.array([e[5] for e in ent], dtype=np.int64)
        lrs_u = np.array([e[6] for e in ent], dtype=np.int64)
        tgap_u = np.array([e[7] for e in ent], dtype=np.int64)
        head_len_u = np.array([len(e[0]) for e in ent], dtype=np.int64)
        tail_len_u = np.array([len(e[3]) for e in ent], dtype=np.int64)
        # per-unique byte pools: head/tail bytes concatenated ONCE per
        # batch; per-region copies are numpy buffer-to-buffer scatters
        uh_buf = np.frombuffer(
            b"".join(e[0] for e in ent), dtype=np.uint8
        )
        uh_off = np.concatenate(([0], np.cumsum(head_len_u)[:-1]))
        ut_buf = np.frombuffer(
            b"".join(e[3] for e in ent), dtype=np.uint8
        )
        ut_off = np.concatenate(([0], np.cumsum(tail_len_u)[:-1]))

        g_n = n_u[codes]
        g_tgap = tgap_u[codes]

        # gap pending before each EMITTING region: sum of tgaps since
        # the previous emitting region (doc-reset exclusive cumsum)
        m = codes.size
        z = np.concatenate(([0], np.cumsum(g_tgap)))  # global excl
        doc_first = np.ones(m, dtype=bool)
        if m:
            doc_first[1:] = k_doc[1:] != k_doc[:-1]
        emit = g_n > 0
        e_idx = np.flatnonzero(emit)
        if not e_idx.size:
            return [b"\x00"] * n_docs
        e_doc = k_doc[e_idx]
        e_first = np.ones(e_idx.size, dtype=bool)
        e_first[1:] = e_doc[1:] != e_doc[:-1]
        prev_e = np.empty(e_idx.size, dtype=np.int64)
        prev_e[1:] = e_idx[:-1]
        prev_e[0] = 0
        doc_start_region = np.zeros(m, dtype=np.int64)
        ds_per_region = np.flatnonzero(doc_first)
        doc_start_of = np.repeat(
            ds_per_region,
            np.diff(np.concatenate((ds_per_region, [m]))),
        )
        base_z = np.where(
            e_first, z[doc_start_of[e_idx]], z[prev_e]
        )
        gap = z[e_idx] - base_z

        # boundary deltas per emitting region
        e_pinc1 = pinc1_u[codes[e_idx]]
        e_rs1 = rs1_u[codes[e_idx]]
        e_lrs = lrs_u[codes[e_idx]]
        e_start = k_start[e_idx]
        pd = e_pinc1 + gap
        pd[e_first] -= 1  # pos starts at -1 per doc
        abs_start = e_start + e_rs1
        prev_last_start = np.empty(e_idx.size, dtype=np.int64)
        prev_last_start[1:] = e_start[:-1] + e_lrs[:-1]
        prev_last_start[0] = 0
        prev_last_start[e_first] = 0
        sd = abs_start - prev_last_start

        # per-doc token counts + cap fallback
        counts = np.bincount(e_doc, weights=g_n[e_idx],
                             minlength=n_docs).astype(np.int64)
        over = counts > max_field_length + 1

        # vectorized vint streams
        pd_buf = vint_encode(pd)
        pd_len = vint_byte_len(pd)
        sd_buf = vint_encode(sd)
        sd_len = vint_byte_len(sd)
        cnt_buf = vint_encode(counts)
        cnt_len = vint_byte_len(counts)

        e_head_len = head_len_u[codes[e_idx]]
        e_tail_len = tail_len_u[codes[e_idx]]
        # region blob = head | pd | sd | tail(len1 + tokens 2..n)
        reg_blob_len = e_head_len + pd_len + sd_len + e_tail_len
        # doc blob = count vint + its regions' blobs
        doc_body_len = np.bincount(
            e_doc, weights=reg_blob_len, minlength=n_docs
        ).astype(np.int64)
        doc_total = cnt_len + doc_body_len
        doc_off = np.concatenate(([0], np.cumsum(doc_total)))
        out = np.zeros(int(doc_off[-1]), dtype=np.uint8)

        def _within(lens: np.ndarray) -> np.ndarray:
            total = int(lens.sum())
            return np.arange(total, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(lens)[:-1])), lens
            )

        def _scatter(starts: np.ndarray, lens: np.ndarray,
                     data: bytes) -> None:
            if not len(data):
                return
            tgt = np.repeat(starts, lens) + _within(lens)
            out[tgt] = np.frombuffer(data, dtype=np.uint8)

        def _scatter_from(starts_out: np.ndarray, lens: np.ndarray,
                          src: np.ndarray,
                          starts_src: np.ndarray) -> None:
            if not src.size:
                return
            w = _within(lens)
            out[np.repeat(starts_out, lens) + w] = src[
                np.repeat(starts_src, lens) + w
            ]

        # count prefixes at each doc start
        _scatter(doc_off[:-1], cnt_len, cnt_buf)
        # region piece offsets: doc start + cnt + prior regions in doc
        csum_blob = np.concatenate(([0], np.cumsum(reg_blob_len)))
        doc_first_e = np.repeat(
            np.flatnonzero(e_first),
            np.diff(np.concatenate((np.flatnonzero(e_first),
                                    [e_idx.size]))),
        )
        reg_pos_in_doc = csum_blob[:-1] - csum_blob[doc_first_e]
        reg_tgt = doc_off[e_doc] + cnt_len[e_doc] + reg_pos_in_doc
        e_codes = codes[e_idx]
        _scatter_from(reg_tgt, e_head_len, uh_buf, uh_off[e_codes])
        _scatter(reg_tgt + e_head_len, pd_len, pd_buf)
        _scatter(reg_tgt + e_head_len + pd_len, sd_len, sd_buf)
        _scatter_from(
            reg_tgt + e_head_len + pd_len + sd_len, e_tail_len,
            ut_buf, ut_off[e_codes],
        )

        raw = out.tobytes()
        res = [
            raw[doc_off[i]: doc_off[i + 1]] for i in range(n_docs)
        ]
        if over.any():
            for i in np.flatnonzero(over):
                res[i] = encode_term_vector(
                    self.terms_positions_offsets(
                        "" if texts[i] is None else texts[i],
                        max_field_length,
                    )
                )
        return res

    def batch_terms_positions(
        self, texts: list, max_field_length: int = 10_000
    ):
        """Batch-vectorized StandardAnalyzer inversion over a column.

        Returns ``(tids, positions, lens, term_table)`` where ``tids``
        index into the pyarrow ``term_table`` of unique terms — the
        whole batch tokenizes with ONE Arrow regex split, each UNIQUE
        region processes once through the memoized filter chain, and
        positions reassemble by segmented cumsums.  Position algebra:
        the cumulative advance contributed by any region is uniformly
        ``sum(pos_incs) + trailing_gap``, so per-token positions =
        -1 + exclusive-prefix(advance) + within-region inclusive prefix
        of pos_incs — exactly the sequential chain (equivalence is
        fuzz-tested against the per-doc path).

        Only valid for StandardTokenizer chains and scalar (non-list)
        texts; callers fall back to :meth:`terms_positions` otherwise.
        """
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        n_docs = len(texts)
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            # zero-copy Arrow input from the invert stage: nulls -> ""
            # in C++, no Python string materialization at all
            arr = pc.fill_null(texts, "")
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if pa.types.is_large_string(arr.type):
                arr = arr.cast(pa.string())
        else:
            arr = pa.array(
                ["" if t is None else t for t in texts],
                type=pa.string(),
            )
        from .tokenizer import ARROW_SEPARATOR_PATTERN

        lists = pc.split_pattern_regex(arr, ARROW_SEPARATOR_PATTERN)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        doc_off = lists.offsets.to_numpy()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        reg_doc = np.repeat(
            np.arange(n_docs, dtype=np.int64), np.diff(doc_off)
        )[keep]
        flat = flat.filter(pa.array(keep))
        dcodes = flat.dictionary_encode()
        codes = dcodes.indices.to_numpy().astype(np.int64)

        # PERSISTENT per-process vocab tables: each distinct region is
        # expanded exactly once per worker lifetime; repeat batches do
        # one C++ hash probe per unique region and pure numpy gathers
        shared = _shared_state(self._cache_key())
        bv = getattr(self, "_batch_vocab", None) or shared.get("vocab")
        if bv is None or bv["n_tok"][0] > 5_000_000:  # bound memory
            bv = {
                "row": {}, "term_ids": {}, "terms": [],
                "k": [], "adv": [], "tok_off": [0],
                "tids": [], "pref": [], "np": None, "n_tok": [0],
                "known_pa": None,
            }
            shared["vocab"] = bv
        self.__dict__["_batch_vocab"] = bv
        # warm-path lookup: one pc.index_in against the persistent
        # region array (insertion order == row index) — no to_pylist of
        # the batch dictionary, no Python loop, for already-seen regions.
        # index_in hashes value_set per call (O(known)), so tiny batches
        # against a grown vocab fall back to per-region dict probes —
        # the crossover keeps per-batch cost O(batch), not O(lifetime).
        uniq_arr = dcodes.dictionary
        if bv["known_pa"] is None and bv["row"]:
            bv["known_pa"] = pa.array(bv["row"].keys(), type=pa.string())
        n_known = len(bv["known_pa"]) if bv["known_pa"] is not None else 0
        if n_known and n_known <= 32 * len(uniq_arr):
            rows = pc.fill_null(
                pc.index_in(uniq_arr, value_set=bv["known_pa"]), -1
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            miss_ui = np.flatnonzero(rows < 0)
        elif n_known:
            rget = bv["row"].get
            rows = np.empty(len(uniq_arr), dtype=np.int64)
            miss = []
            for ui, region in enumerate(uniq_arr.to_pylist()):
                r = rget(region)
                rows[ui] = -1 if r is None else r
                if r is None:
                    miss.append(ui)
            miss_ui = np.asarray(miss, dtype=np.int64)
        else:
            rows = np.full(len(uniq_arr), -1, dtype=np.int64)
            miss_ui = np.arange(len(uniq_arr))
        dirty = False
        if miss_ui.size:
            process = self._process_region
            miss_regions = uniq_arr.take(pa.array(miss_ui)).to_pylist()
            for ui, region in zip(miss_ui.tolist(), miss_regions):
                # a region can miss twice within one batch dictionary
                # only if Arrow dedup produced duplicates (it doesn't),
                # so each miss is genuinely new
                pairs, tgap = process(region)
                run = 0
                for t, pinc, _s, _e in pairs:
                    tid = bv["term_ids"].get(t)
                    if tid is None:
                        tid = len(bv["term_ids"])
                        bv["term_ids"][t] = tid
                        bv["terms"].append(t)
                    run += pinc
                    bv["tids"].append(tid)
                    bv["pref"].append(run)
                bv["k"].append(len(pairs))
                bv["adv"].append(run + tgap)
                bv["tok_off"].append(bv["tok_off"][-1] + len(pairs))
                bv["n_tok"][0] += len(pairs)
                r = len(bv["k"]) - 1
                bv["row"][region] = r
                rows[ui] = r
            dirty = True
            # incremental append: only the new regions are converted to
            # Arrow (a fresh chunk), never the whole lifetime vocab —
            # known_pa is a ChunkedArray whose chunk concatenation is
            # insertion order, i.e. chunk-wise row ids stay aligned
            new_arr = pa.array(miss_regions, type=pa.string())
            if bv["known_pa"] is None or not len(bv["known_pa"]):
                bv["known_pa"] = pa.chunked_array([new_arr])
            else:
                prev = bv["known_pa"]
                chunks = (
                    list(prev.chunks)
                    if isinstance(prev, pa.ChunkedArray) else [prev]
                )
                ca = pa.chunked_array(chunks + [new_arr])
                # bound chunk count over a long worker lifetime: one
                # consolidation per 64 dirty batches is O(V)/64 amortized
                bv["known_pa"] = (
                    ca.combine_chunks() if ca.num_chunks > 64 else ca
                )
        if dirty or bv["np"] is None:
            bv["np"] = (
                np.asarray(bv["k"], dtype=np.int64),
                np.asarray(bv["adv"], dtype=np.int64),
                np.asarray(bv["tok_off"], dtype=np.int64),
                # int32 ids: the vocab is capped well below 2^31 and the
                # indexer's stable argsort halves its radix passes
                np.asarray(bv["tids"], dtype=np.int32),
                np.asarray(bv["pref"], dtype=np.int64),
                # vocab as an Arrow array: the output term table is a
                # C++ take instead of a Python listcomp per batch
                pa.array(bv["terms"], type=pa.string()),
            )
        k_arr, adv_arr, tokoff_arr, u_tid, u_pref, terms_pa = bv["np"]
        u_k = k_arr[rows]
        u_adv = adv_arr[rows]
        u_tok_start = tokoff_arr[rows]

        # region-level: per-doc exclusive prefix of advances
        k_r = u_k[codes]
        a_r = u_adv[codes]
        n_reg = codes.size
        if n_reg:
            csum = np.cumsum(a_r)
            excl = csum - a_r
            new_doc = np.empty(n_reg, dtype=bool)
            new_doc[0] = True
            new_doc[1:] = reg_doc[1:] != reg_doc[:-1]
            doc_starts = np.flatnonzero(new_doc)
            base = np.repeat(
                excl[doc_starts], np.diff(
                    np.concatenate((doc_starts, [n_reg]))
                )
            )
            reg_base = excl - base
        else:
            reg_base = np.empty(0, dtype=np.int64)

        # token-level assembly
        n_tok = int(k_r.sum())
        tok_reg = np.repeat(np.arange(n_reg, dtype=np.int64), k_r)
        tok_off = np.concatenate(([0], np.cumsum(k_r)))
        within = np.arange(n_tok, dtype=np.int64) - tok_off[:-1][tok_reg]
        gidx = u_tok_start[codes][tok_reg] + within
        tids = u_tid[gidx]
        poss = reg_base[tok_reg] + u_pref[gidx] - 1
        tok_doc = reg_doc[tok_reg]

        # max_field_length: keep ordinals 0..max per doc (the reference
        # keeps one extra token, like the per-doc path)
        tok_new_doc = np.empty(n_tok, dtype=bool)
        if n_tok:
            tok_new_doc[0] = True
            tok_new_doc[1:] = tok_doc[1:] != tok_doc[:-1]
            tstarts = np.flatnonzero(tok_new_doc)
            ord_in_doc = np.arange(n_tok, dtype=np.int64) - np.repeat(
                tstarts, np.diff(np.concatenate((tstarts, [n_tok])))
            )
            keep_tok = ord_in_doc <= max_field_length
            tids = tids[keep_tok]
            poss = poss[keep_tok]
            tok_doc = tok_doc[keep_tok]
        lens = np.bincount(
            tok_doc, minlength=n_docs
        ).astype(np.int32)
        # deterministic output ids: remap the worker-global vocab ids to
        # first-appearance-in-batch order (the persistent table's id
        # order depends on which batches this worker saw earlier)
        if tids.size:
            # O(n) scatter instead of np.unique's O(n log n) sort over
            # the token stream: ids are bounded by the (small) vocab, so
            # a REVERSED scatter leaves each id's earliest position
            # (last write wins), then only the vocab-sized array sorts
            n_tok_out = tids.size
            vocab_n = len(terms_pa)
            first_pos = np.full(vocab_n, -1, dtype=np.int64)
            first_pos[tids[::-1]] = np.arange(
                n_tok_out - 1, -1, -1, dtype=np.int64
            )
            present = np.flatnonzero(first_pos >= 0)
            ids_in_order = present[
                np.argsort(first_pos[present], kind="stable")
            ]
            rank = np.empty(vocab_n, dtype=np.int32)
            rank[ids_in_order] = np.arange(
                ids_in_order.size, dtype=np.int32
            )
            tids = rank[tids]
            term_table = pc.take(terms_pa, pa.array(ids_in_order))
        else:
            term_table = pa.array([], type=pa.string())
        return tids, poss, lens, term_table

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
        _stem = self._stem_fn()
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
