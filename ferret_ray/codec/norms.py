"""Ferret's lossy 1-byte norm codec (3-bit mantissa, 5-bit exponent).

Byte-exact re-implementation of byte2float/float2byte
(c/src/helper.c:28-63), including the reference's 0xEf0000 mantissa mask
(equivalent to 0xE00000 after the >>21).  All 256 bytes round-trip:
``b == float2byte(byte2float(b))`` (asserted in c/test/test_search.c:12-20).
"""

from __future__ import annotations

import numpy as np


def byte2float(b: int) -> np.float32:
    if b == 0:
        return np.float32(0.0)
    mantissa = b & 0x07
    exponent = (b >> 3) & 0x1F
    bits = np.uint32((mantissa << 21) | ((exponent + 48) << 24))
    return bits.view(np.float32)


def float2byte(f: float) -> int:
    f32 = np.float32(f)
    if f32 <= 0.0:
        return 0
    i = int(f32.view(np.uint32))
    mantissa = (i & 0xEF0000) >> 21
    exponent = (i >> 24) - 48
    if exponent > 0x1F:
        exponent = 0x1F
        mantissa = 0x07
    if exponent < 0:
        exponent = 0
        mantissa = 1
    return (exponent << 3) | mantissa


# Decode table for vectorized scoring: NORM_TABLE[byte] -> float32
NORM_TABLE: np.ndarray = np.array(
    [byte2float(b) for b in range(256)], dtype=np.float32
)


def encode_norms(boosts: np.ndarray) -> np.ndarray:
    """Vectorized float2byte over an array of float32 boosts."""
    f = np.asarray(boosts, dtype=np.float32)
    out = np.zeros(f.shape, dtype=np.uint8)
    pos = f > 0.0
    i = f.view(np.uint32).astype(np.int64)
    mantissa = (i & 0xEF0000) >> 21
    exponent = (i >> 24) - 48
    hi = exponent > 0x1F
    mantissa[hi] = 0x07
    exponent[hi] = 0x1F
    lo = exponent < 0
    mantissa[lo] = 1
    exponent[lo] = 0
    out[pos] = ((exponent << 3) | mantissa)[pos].astype(np.uint8)
    return out
