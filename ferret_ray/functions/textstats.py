"""Text analysis stages: token stats, language id, quality, fingerprints.

All stateless ``map_batches`` transforms over the ``documents`` table,
vectorized with pyarrow.compute (RE2) + numpy segment reductions — no
per-row Python in the hot paths.  Tokenizer parity with the SQL oracle:
``[a-z0-9]+`` over ``lower(text)`` == DuckDB ``regexp_extract_all``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"[a-z0-9]+")

_STOPSETS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "pas", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "no"},
}

_CJK = re.compile(r"[一-鿿]")


def _texts_col(batch) -> pa.Array:
    if isinstance(batch, (pa.Table, pa.RecordBatch)):
        col = batch.column("text")
        return col.combine_chunks() if isinstance(
            col, pa.ChunkedArray
        ) else col
    return pa.array([str(t) for t in batch["text"]], type=pa.string())


def _ids_col(batch) -> np.ndarray:
    if isinstance(batch, (pa.Table, pa.RecordBatch)):
        return batch.column("doc_id").to_numpy()
    return np.asarray(batch["doc_id"], dtype=np.int64)


def _flat_tokens(texts: pa.Array):
    """Vectorized ``[a-z0-9]+`` tokenization of lower(texts).

    Returns (flat token array, seg_ids per token, token counts per doc).
    Matches re.findall semantics (empty splits dropped)."""
    lo = pc.utf8_lower(texts)
    lists = pc.split_pattern_regex(lo, "[^a-z0-9]+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    off = lists.offsets.to_numpy()
    seg = np.repeat(
        np.arange(len(lists), dtype=np.int64), np.diff(off)
    )
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    seg = seg[keep]
    counts = np.bincount(seg, minlength=len(lists)).astype(np.int64)
    return flat, seg, counts


def token_stats(batch) -> dict:
    """doc_id, n_tokens, n_unique, n_chars (oracle-parity tokenizer)."""
    texts = _texts_col(batch)
    n = len(texts)
    flat, seg, counts = _flat_tokens(texts)
    # unique tokens per doc: dictionary-encode once, count distinct
    # (seg, code) pairs per segment
    if len(flat):
        codes = flat.dictionary_encode()
        code_np = codes.indices.to_numpy().astype(np.int64)
        v = len(codes.dictionary)
        pairs = np.unique(seg * v + code_np)
        n_unique = np.bincount(pairs // v, minlength=n).astype(np.int64)
    else:
        n_unique = np.zeros(n, dtype=np.int64)
    return {
        "doc_id": _ids_col(batch),
        "n_tokens": counts,
        "n_unique": n_unique,
        "n_chars": pc.utf8_length(texts).to_numpy(
            zero_copy_only=False
        ).astype(np.int64),
    }


def detect_lang(text: str) -> str:
    """n-gram/stopword heuristic language id (scalar reference impl)."""
    if _CJK.search(text):
        return "zh"
    toks = set(_TOKEN_RE.findall(text.lower()))
    best, best_n = "en", -1
    for lang, stops in _STOPSETS.items():
        n = len(toks & stops)
        if n > best_n:
            best, best_n = lang, n
    return best


def lang_id(batch) -> dict:
    """Vectorized language id: per-doc UNIQUE-stopword overlap per
    language (same decision rule as :func:`detect_lang`; ties -> first
    language in _STOPSETS order)."""
    texts = _texts_col(batch)
    n = len(texts)
    flat, seg, _counts = _flat_tokens(texts)
    langs = list(_STOPSETS)
    scores = np.zeros((n, len(langs)), dtype=np.int64)
    if len(flat):
        codes = flat.dictionary_encode()
        code_np = codes.indices.to_numpy().astype(np.int64)
        v = len(codes.dictionary)
        pairs = np.unique(seg * v + code_np)  # unique (doc, token)
        u_seg = pairs // v
        u_code = pairs % v
        dict_tokens = codes.dictionary.to_pylist()
        for li, lang in enumerate(langs):
            stops = _STOPSETS[lang]
            is_stop = np.array(
                [t in stops for t in dict_tokens], dtype=bool
            )
            hits = is_stop[u_code]
            scores[:, li] = np.bincount(
                u_seg[hits], minlength=n
            )
    best = np.argmax(scores, axis=1)  # first max wins (en default)
    cjk = pc.count_substring_regex(texts, "[一-鿿]").to_numpy(
        zero_copy_only=False
    ) > 0
    preds = [langs[b] for b in best]
    out = ["zh" if c else p for c, p in zip(cjk, preds)]
    return {"doc_id": _ids_col(batch), "lang_pred": out}


def quality_score(batch) -> dict:
    """Heuristic quality features + a composite score in [0, 1].

    alpha_ratio = unicode-letter chars / chars; mean_word_len = token
    chars / tokens; stop_ratio = English-stopword tokens / tokens."""
    texts = _texts_col(batch)
    n = len(texts)
    flat, seg, counts = _flat_tokens(texts)
    nclamp = np.maximum(counts, 1).astype(np.float64)
    chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    alpha_chars = pc.count_substring_regex(
        texts, r"\p{L}"
    ).to_numpy(zero_copy_only=False).astype(np.float64)
    alpha = alpha_chars / np.maximum(chars, 1.0)
    if len(flat):
        tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        tok_chars = np.bincount(
            seg, weights=tok_lens, minlength=n
        )
        is_stop = pc.is_in(
            flat,
            value_set=pa.array(sorted(_STOPSETS["en"])),
        ).to_numpy(zero_copy_only=False)
        stop_cnt = np.bincount(
            seg, weights=is_stop.astype(np.float64), minlength=n
        )
    else:
        tok_chars = np.zeros(n)
        stop_cnt = np.zeros(n)
    mwl = tok_chars / nclamp
    stop = stop_cnt / nclamp
    q = np.minimum(
        1.0,
        0.5 * alpha
        + 0.3 * np.minimum(mwl / 6.0, 1.0)
        + 0.2 * np.minimum(stop * 5, 1.0),
    )
    return {
        "doc_id": _ids_col(batch),
        "alpha_ratio": alpha,
        "mean_word_len": mwl,
        "stop_ratio": stop,
        "quality": q,
    }


# GPT-2-style pretokenizer, RE2-safe (no lookahead): contractions,
# space-prefixed letter/digit/punct runs, whitespace runs.  RE2's
# leftmost-first alternation is identical in pyarrow and DuckDB, so the
# count is SQL-oracle-checkable (`regexp_extract_all`) bit-for-bit.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\pL+| ?\pN+| ?[^\pL\pN\s]+|\s+"


def bpe_token_count(batch) -> dict:
    """Per-doc BPE-ish token counts: whitespace tokens + the GPT-2-style
    pretokenizer regex above, both as one vectorized RE2 count per
    column (no per-row Python)."""
    texts = _texts_col(batch)
    bpe = pc.count_substring_regex(texts, BPE_PATTERN)
    ws = pc.count_substring_regex(texts, r"\S+")
    return {
        "doc_id": _ids_col(batch),
        "n_ws_tokens": ws.to_numpy(zero_copy_only=False).astype(np.int64),
        "n_bpe_tokens": bpe.to_numpy(zero_copy_only=False).astype(
            np.int64
        ),
    }


def fingerprint64(text: str, k: int = 5, window: int = 8) -> int:
    """Winnowing-style rolling-hash document fingerprint (XOR of window
    minima of k-gram hashes)."""
    import zlib

    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return 0
    grams = [
        " ".join(toks[i: i + k]) for i in range(max(len(toks) - k + 1, 1))
    ]
    hs = np.array(
        [(zlib.crc32(g.encode()) << 32) | zlib.crc32(g[::-1].encode())
         for g in grams],
        dtype=np.uint64,
    )
    if hs.size <= window:
        return int(np.bitwise_xor.reduce(hs))
    # vectorized sliding-window minima
    sw = np.lib.stride_tricks.sliding_window_view(hs, window)
    mins = sw.min(axis=1)
    return int(np.bitwise_xor.reduce(np.unique(mins)))


def fingerprints(batch, k: int = 5, window: int = 8) -> dict:
    """Batch-vectorized winnowing fingerprints (round-2 verdict #4):
    gram hashing is the shared vectorized crc kernel (one Arrow join +
    column-wise crc per batch); only the tiny per-doc sliding-window
    minima remain numpy-per-doc.  Bit-identical to
    :func:`fingerprint64` per row."""
    from .dedup import _gram_hashes_batch

    texts = _texts_col(batch)
    gh, _gseg, gcounts = _gram_hashes_batch(texts, k)
    doc_off = np.concatenate(([0], np.cumsum(gcounts)))
    # empty docs got one 0-hash gram from the shared kernel, but the
    # scalar fingerprint is 0 for them either way (xor of [0])
    out = np.empty(len(gcounts), dtype=np.uint64)
    for di in range(len(gcounts)):
        hs = gh[doc_off[di]: doc_off[di + 1]]
        if hs.size <= window:
            out[di] = np.bitwise_xor.reduce(hs) if hs.size else 0
        else:
            sw = np.lib.stride_tricks.sliding_window_view(hs, window)
            out[di] = np.bitwise_xor.reduce(np.unique(sw.min(axis=1)))
    # hand Arrow the uint64 array directly — a Python int list here
    # overflows C long for hashes >= 2^63 and forces a pickled block
    return {
        "doc_id": _ids_col(batch),
        "fingerprint": out,
    }
