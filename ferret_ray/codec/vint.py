"""Vectorized VInt codec, byte-compatible with Ferret's store format.

Reference encoding (c/src/store.c:545-560): LSB-first 7-bit groups, 0x80
continuation bit on every byte except the last:

    while (vi & ~0x7f) { write((vi & 0x7f) | 0x80); vi >>= 7; }
    write(vi);

Both directions are numpy-vectorized (no per-value Python loop): encode
computes per-value byte counts from bit lengths and scatters 7-bit groups;
decode finds value boundaries from the continuation bits and combines the
groups with shift + add.reduceat.
"""

from __future__ import annotations

import numpy as np

_SEVEN = np.uint64(7)
_MASK7 = np.uint64(0x7F)


# byte-count thresholds: value < 2^(7k) needs k bytes
_THRESH = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def vint_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int array to a Ferret VInt byte stream."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.digitize(v, _THRESH) + 1
    maxb = int(nbytes.max())
    if maxb == 1:  # fast path: everything fits one byte
        return v.astype(np.uint8).tobytes()
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    for p in range(maxb):
        mask = nbytes > p
        b = ((v[mask] >> np.uint64(7 * p)) & _MASK7).astype(np.uint8)
        b[(nbytes[mask] - 1) > p] |= 0x80
        out[starts[mask] + p] = b
    return out.tobytes()


def vint_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode a Ferret VInt byte stream to an int64 array.

    O(values x byte-position) with a shrinking alive set, instead of
    the old per-BYTE int64 temporaries (arange + cumsum + reduceat over
    the whole stream): on a 230MB cold-expansion stream the old path
    cost ~50s in pure memory traffic; this one touches each
    continuation byte once."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    is_last = (b & 0x80) == 0
    if is_last.all():  # fast path: every value fits one byte
        return b.astype(np.int64)
    # group start indices: 0 and every index following a terminator
    starts = np.flatnonzero(np.concatenate(([True], is_last[:-1])))
    ends = np.append(starts[1:], b.size)
    lens = ends - starts
    payload = b & 0x7F
    vals = payload[starts].astype(np.uint64)
    maxl = int(lens.max())
    # boolean-mask per byte position beats a shrinking fancy-index
    # alive set ~5x (no gather/scatter of the index array; the mask
    # compare + masked gather are straight-line memory passes)
    for p in range(1, maxl):
        mask = lens > p
        vals[mask] |= (
            payload[starts[mask] + p].astype(np.uint64)
            << np.uint64(7 * p)
        )
    return vals.astype(np.int64)


def vint_byte_len(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte length (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    return np.digitize(v, _THRESH) + 1
