"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint: (repo, path, commit, lang, content).
Content is code-like text with a Zipfian ~50k-term vocabulary plus hot
"keyword" tokens at stop-word frequency (to exercise shuffle skew) and a
sprinkle of emails / URLs / hyphenated identifiers / acronyms / numbers so
every StandardTokenizer rule fires.  Everything derives from (seed, row
index) — regenerating any slice is reproducible at any parallelism.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["c", "ruby", "py", "js", "go", "java"]
EXT = {"c": "c", "ruby": "rb", "py": "py", "js": "js", "go": "go",
       "java": "java"}

HOT_TOKENS = [
    "the", "int", "if", "return", "for", "while", "void", "static",
    "class", "def", "self", "import", "const", "var", "func", "public",
    "new", "else", "case", "break",
]

SPECIALS = [
    "dbalmain@gmail.com", "http://www.google.com/results/", "T.N.T.",
    "123-1235-ASD-1234", "e-mail", "won't", "-52", "3.1415",
    "www.example.com", "foo_bar_baz", "Barnes&Noble", "svn://repo.host/",
]


def _vocab(size: int = 50_000) -> np.ndarray:
    return np.array(
        [f"tok{i}" for i in range(size)]
        + [f"fn_{i}" for i in range(size // 10)],
        dtype=object,
    )


_VOCAB = None


def generate_corpus(
    out_path: str,
    num_docs: int,
    seed: int = 42,
    rows_per_fragment: int = 500,
    min_tokens: int = 50,
    max_tokens: int = 800,
) -> str:
    """Write the corpus parquet with one row group per fragment."""
    global _VOCAB
    if _VOCAB is None:
        _VOCAB = _vocab()
    vocab = _VOCAB
    V = len(vocab)
    nh = len(HOT_TOKENS)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    writer = None
    for base in range(0, num_docs, rows_per_fragment):
        n = min(rows_per_fragment, num_docs - base)
        rng = np.random.default_rng(seed + base)
        lang_ids = rng.integers(0, len(LANGS), size=n)
        lens = rng.integers(min_tokens, max_tokens, size=n)
        contents = []
        for i in range(n):
            ln = int(lens[i])
            u = rng.random(ln)
            ids = (V * u**3.0).astype(np.int64)  # Zipf-ish skew
            words = vocab[ids]
            # ~15% hot keywords
            hot_mask = rng.random(ln) < 0.15
            hot_ids = rng.integers(0, nh, size=int(hot_mask.sum()))
            words[hot_mask] = np.array(HOT_TOKENS, dtype=object)[hot_ids]
            toks = words.tolist()
            if ln > 20:  # sprinkle special tokens
                for j in rng.integers(0, ln, size=2):
                    toks[int(j)] = SPECIALS[int(rng.integers(0, len(SPECIALS)))]
            contents.append(" ".join(toks))
        table = pa.table(
            {
                "repo": [f"org{(base + i) % 101}/proj{(base + i) % 977}"
                         for i in range(n)],
                "path": [
                    f"src/dir{(base + i) % 53}/file{base + i}."
                    f"{EXT[LANGS[lang_ids[i]]]}"
                    for i in range(n)
                ],
                "commit": [
                    hashlib.sha1(f"commit{base + i}".encode()).hexdigest()
                    for i in range(n)
                ],
                "lang": [LANGS[i] for i in lang_ids],
                "content": contents,
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(out_path, table.schema,
                                      compression="zstd")
        writer.write_table(table, row_group_size=rows_per_fragment)
    if writer is not None:
        writer.close()
    return out_path


def corpus_cache_path(
    num_docs: int, seed: int = 42, rows_per_fragment: int = 500
) -> str:
    return (
        f"/tmp/ferret_ray_corpus/code-{num_docs}-{seed}"
        f"-r{rows_per_fragment}.parquet"
    )


def ensure_corpus(
    num_docs: int, seed: int = 42, rows_per_fragment: int = 500
) -> str:
    path = corpus_cache_path(num_docs, seed, rows_per_fragment)
    if not os.path.exists(path):
        tmp = path + ".tmp"
        generate_corpus(tmp, num_docs, seed, rows_per_fragment)
        os.replace(tmp, path)
    return path
