"""Codec round-trips + byte-compat fixtures (FIXTURES.md §5)."""

import numpy as np
import pytest

from ferret_ray.codec import (
    NORM_TABLE,
    byte2float,
    decode_docs_freqs,
    decode_positions,
    encode_norms,
    encode_postings,
    float2byte,
    frq_decode,
    frq_encode,
    vint_byte_len,
    vint_decode,
    vint_encode,
)


def test_vint_bytes_exact():
    # LSB-first 7-bit groups with 0x80 continuation (c/src/store.c:545-560)
    cases = {
        0: b"\x00",
        1: b"\x01",
        127: b"\x7f",
        128: b"\x80\x01",
        16383: b"\xff\x7f",
        16384: b"\x80\x80\x01",
        2**31 - 1: b"\xff\xff\xff\xff\x07",
    }
    for v, expect in cases.items():
        assert vint_encode(np.array([v])) == expect, v
    allv = np.array(sorted(cases), dtype=np.int64)
    enc = vint_encode(allv)
    assert enc == b"".join(cases[v] for v in sorted(cases))
    assert vint_decode(enc).tolist() == sorted(cases)
    assert vint_byte_len(allv).tolist() == [
        len(cases[v]) for v in sorted(cases)
    ]


def test_vint_random_roundtrip():
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 2**40, size=10_000)
    assert (vint_decode(vint_encode(vals)) == vals).all()


def test_norm_roundtrip_all_256():
    # c/test/test_search.c:12-20
    for b in range(256):
        assert float2byte(byte2float(b)) == b


def test_norm_vectorized_matches_scalar():
    rng = np.random.default_rng(0)
    f = rng.uniform(0, 20, size=1000).astype(np.float32)
    f[:10] = [0.0, 1.0, 0.5, 0.25, 1e-30, 1e30, 2.0, 3.0, 7.0, 18.0]
    vec = encode_norms(f)
    for x, b in zip(f.tolist(), vec.tolist()):
        assert float2byte(x) == b


def test_frq_ferret_codes():
    docs = np.array([3, 5, 12, 100])
    freqs = np.array([1, 7, 1, 2])
    # (3<<1)|1, (2<<1), 7, (7<<1)|1, (88<<1), 2
    enc = frq_encode(docs, freqs)
    assert vint_decode(enc).tolist() == [7, 4, 7, 15, 176, 2]
    d, f = frq_decode(enc)
    assert d.tolist() == docs.tolist() and f.tolist() == freqs.tolist()


def test_postings_roundtrip_with_positions():
    rng = np.random.default_rng(7)
    n = 500
    docs = np.cumsum(rng.integers(1, 50, size=n))
    freqs = rng.integers(1, 6, size=n)
    off = np.concatenate(([0], np.cumsum(freqs)))
    positions = np.concatenate(
        [np.sort(rng.choice(1000, size=f, replace=False)) for f in freqs]
    )
    enc = encode_postings(docs, freqs, positions, off)
    d2, f2 = decode_docs_freqs(enc.docs, enc.freqs)
    assert (d2 == docs).all() and (f2 == freqs).all()
    # all docs' positions
    pos_lists = decode_positions(enc.prx, enc.prx_lens, f2)
    got = np.concatenate(pos_lists)
    assert (got == positions).all()
    # selective decode
    sel = np.array([0, 10, n - 1])
    pos_sel = decode_positions(enc.prx, enc.prx_lens, f2, select=sel)
    for i, s in enumerate(sel):
        assert (pos_sel[i] == positions[off[s]: off[s + 1]]).all()
    assert enc.doc_min == docs[0] and enc.doc_max == docs[-1]
    assert enc.max_tf == freqs.max()
    # skip data decodes to consistent doc points
    skips = vint_decode(enc.skip)
    skip_docs = np.cumsum(skips[0::3])
    assert (skip_docs == docs[15::16]).all()
    bmax = vint_decode(enc.block_max_tf)
    assert bmax.max() == freqs.max()


def test_similarity_spot_values():
    # c/test/test_search.c:89-98 via the same float32 formulas
    from ferret_ray.search.similarity import (
        coord,
        idf,
        length_norm,
        query_norm,
        sloppy_freq,
        tf,
    )

    assert length_norm(16) == pytest.approx(0.25)
    assert query_norm(16.0) == pytest.approx(0.25)
    assert tf(9.0) == pytest.approx(3.0)
    assert sloppy_freq(9) == pytest.approx(0.1)
    assert idf(9, 10) == pytest.approx(1.0)
    assert coord(12, 3) == pytest.approx(4.0)
    assert NORM_TABLE.shape == (256,)
