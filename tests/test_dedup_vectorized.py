"""Bit-identity of the vectorized signature kernels (round-2 verdict
items #3/#4) against the scalar reference implementations: crc gram
hashes, minhash signatures, simhash, winnowing fingerprints."""

import numpy as np
import pyarrow as pa
import pytest

from ferret_ray.functions.dedup import (
    MinHasher,
    _gram_hashes_batch,
    _hash64_batch,
    _shingle_hashes,
    _tokens,
    simhash64,
    simhash64_batch,
)
from ferret_ray.functions.textstats import fingerprint64, fingerprints

WORDS = [
    "alpha", "beta", "gamma", "delta", "x1", "y22", "zzz", "data",
    "table", "merge", "the", "q", "0", "longtokenxyz123",
]


def _texts(seed: int, n: int = 120) -> list[str]:
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        ln = int(rng.integers(0, 40))
        if ln == 0:
            out.append("" if i % 2 else "  ,.;  ")
        else:
            out.append(" ".join(rng.choice(WORDS, size=ln)))
    out += ["one two", "single", "", "UPPER Case MIX 42"]
    return out


def test_hash64_batch_exact():
    import zlib

    strs = ["", "a", "ab cd", "zzz 123 q", "x" * 300, "0 0 0"]
    hb = _hash64_batch(pa.array(strs, type=pa.string()))
    for i, w in enumerate(strs):
        b = w.encode()
        assert hb[i] == ((zlib.crc32(b) << 32) | zlib.crc32(b[::-1]))


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("k", [3, 5])
def test_gram_hashes_match_scalar(seed, k):
    texts = _texts(seed)
    arr = pa.array(texts, type=pa.string())
    gh, gseg, gcounts = _gram_hashes_batch(arr, k)
    off = np.concatenate(([0], np.cumsum(gcounts)))
    for di, t in enumerate(texts):
        exp = _shingle_hashes(_tokens(t), k)
        got = gh[off[di]: off[di + 1]]
        assert np.array_equal(got, exp), (di, t)


@pytest.mark.parametrize("seed", [0, 1])
def test_minhash_signature_matches_scalar(seed):
    texts = _texts(seed)
    arr = pa.array(texts, type=pa.string())
    mh = MinHasher(64)
    gh, _gseg, gcounts = _gram_hashes_batch(arr, 3)
    starts = np.concatenate(([0], np.cumsum(gcounts)[:-1]))
    sig = np.empty((64, len(texts)), dtype=np.uint64)
    buf = np.empty_like(gh)
    for p in range(64):
        np.multiply(mh.a[p], gh, out=buf)
        buf += mh.b[p]
        sig[p] = np.minimum.reduceat(buf, starts)
    for di, t in enumerate(texts):
        exp = mh.signature(_shingle_hashes(_tokens(t), 3))
        assert np.array_equal(sig[:, di], exp), (di, t)


@pytest.mark.parametrize("seed", [0, 1])
def test_simhash_batch_matches_scalar(seed):
    texts = _texts(seed)
    sb = simhash64_batch(pa.array(texts, type=pa.string()))
    for di, t in enumerate(texts):
        assert int(sb[di]) == simhash64(_tokens(t)), (di, t)


@pytest.mark.parametrize("seed", [0, 1])
def test_fingerprints_batch_matches_scalar(seed):
    texts = _texts(seed)
    fp = fingerprints(
        {"doc_id": np.arange(len(texts)), "text": texts}
    )
    for di, t in enumerate(texts):
        assert fp["fingerprint"][di] == fingerprint64(t), (di, t)


def test_crc32_batch_with_init():
    """crc32_batch == zlib.crc32(b, init) exactly — the rebase path's
    term-shard hash (init = field number), incl. empty and utf-8 rows."""
    import zlib

    import numpy as np
    import pyarrow as pa

    from ferret_ray.functions.dedup import crc32_batch

    rng = np.random.default_rng(0)
    words = [
        "".join(chr(c) for c in rng.integers(97, 123, rng.integers(0, 30)))
        for _ in range(300)
    ] + ["", "a", "naïve-ütf8-слово", "x" * 300]
    inits = rng.integers(0, 50, size=len(words)).astype(np.int64)
    arr = pa.array(words, type=pa.string())
    exp = np.array(
        [zlib.crc32(w.encode(), int(i)) for w, i in zip(words, inits)],
        dtype=np.uint32,
    )
    assert (crc32_batch(arr, inits) == exp).all()
    exp0 = np.array([zlib.crc32(w.encode()) for w in words], dtype=np.uint32)
    assert (crc32_batch(arr) == exp0).all()


def test_bpe_token_count_matches_duckdb():
    import duckdb
    import numpy as np
    import pyarrow as pa

    from ferret_ray.functions.textstats import BPE_PATTERN, bpe_token_count

    texts = [
        "Hello world, it's a test!", "  leading space\ttabs\n",
        "naïve café 北京123 x_y", "", "don't stop-me now... 42.5%",
        "a'll b're c've d'd e'm f's g't", "__init__(self, *args)",
        "x" * 500 + " y", "tab\tsep\tvals", "ünïcödé wörds ß",
    ]
    out = bpe_token_count(
        pa.table({"doc_id": np.arange(len(texts)), "text": texts})
    )
    con = duckdb.connect()
    for i, t in enumerate(texts):
        nb = con.sql(
            "SELECT len(regexp_extract_all(?, ?))", params=[t, BPE_PATTERN]
        ).fetchone()[0]
        nw = con.sql(
            r"SELECT len(regexp_extract_all(?, '\S+'))", params=[t]
        ).fetchone()[0]
        assert out["n_bpe_tokens"][i] == nb, (i, t)
        assert out["n_ws_tokens"][i] == nw, (i, t)
