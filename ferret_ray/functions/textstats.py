"""Text analysis stages: token stats, language id, quality, fingerprints.

All stateless, vectorized-per-batch ``map_batches`` transforms over the
``documents`` table.
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN_RE = re.compile(r"[a-z0-9]+")

_STOPSETS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "pas", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "no"},
}

_CJK = re.compile(r"[一-鿿]")


def token_stats(batch) -> dict:
    """doc_id, n_tokens, n_unique, n_chars — oracle-parity tokenizer is
    regexp [a-z0-9]+ over lower(text) (= DuckDB regexp_extract_all)."""
    out = {"doc_id": [], "n_tokens": [], "n_unique": [], "n_chars": []}
    for i, text in enumerate(batch["text"]):
        t = str(text)
        toks = _TOKEN_RE.findall(t.lower())
        out["doc_id"].append(int(batch["doc_id"][i]))
        out["n_tokens"].append(len(toks))
        out["n_unique"].append(len(set(toks)))
        out["n_chars"].append(len(t))
    return out


def detect_lang(text: str) -> str:
    """n-gram/stopword heuristic language id."""
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
    return {
        "doc_id": [int(i) for i in batch["doc_id"]],
        "lang_pred": [detect_lang(str(t)) for t in batch["text"]],
    }


def quality_score(batch) -> dict:
    """Heuristic quality features + a composite score in [0, 1]."""
    out = {
        "doc_id": [], "alpha_ratio": [], "mean_word_len": [],
        "stop_ratio": [], "quality": [],
    }
    en_stops = _STOPSETS["en"]
    for i, text in enumerate(batch["text"]):
        t = str(text)
        toks = _TOKEN_RE.findall(t.lower())
        n = max(len(toks), 1)
        alpha = sum(c.isalpha() for c in t) / max(len(t), 1)
        mwl = sum(map(len, toks)) / n
        stop = sum(1 for x in toks if x in en_stops) / n
        q = min(1.0, 0.5 * alpha + 0.3 * min(mwl / 6.0, 1.0) + 0.2 * min(
            stop * 5, 1.0
        ))
        out["doc_id"].append(int(batch["doc_id"][i]))
        out["alpha_ratio"].append(float(alpha))
        out["mean_word_len"].append(float(mwl))
        out["stop_ratio"].append(float(stop))
        out["quality"].append(float(q))
    return out


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
    mins = np.array(
        [hs[i: i + window].min() for i in range(hs.size - window + 1)],
        dtype=np.uint64,
    )
    return int(np.bitwise_xor.reduce(np.unique(mins)))


def fingerprints(batch) -> dict:
    return {
        "doc_id": [int(i) for i in batch["doc_id"]],
        "fingerprint": [fingerprint64(str(t)) for t in batch["text"]],
    }
