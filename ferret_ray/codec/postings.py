"""Posting-list codecs: delta+VInt docs/freqs/positions, skip blocks.

Byte-stream formats follow Ferret's segment files (c/FileFormat.txt:97-110,
writer c/src/index.c:5376-5454):

* doc deltas and positions are VInt-delta encoded;
* a skip entry every SKIP_INTERVAL=16 docs records (doc delta, frq byte
  delta, prx byte delta) (c/src/index.c:5275-5327, FRT_SKIP_INTERVAL
  c/include/index.h:366-367);
* we additionally record the max term-freq per skip block ("block-max"
  metadata) to enable block-max WAND pruning at query time — the reference
  prunes only via its heap threshold.

Unlike Ferret's ``.frq`` (which interleaves ``(delta<<1)|freq==1`` codes
with freq values — an inherently sequential layout), our shard layout keeps
*separate* doc-delta and freq VInt streams so both decode fully vectorized
(numpy) — the Ray-native analogue of the same compression.  The exact
Ferret interleaved code is also provided (``frq_encode``/``frq_decode``)
and unit-tested for parity.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .vint import vint_byte_len, vint_decode, vint_encode

SKIP_INTERVAL = 16  # c/include/index.h:367
INDEX_INTERVAL = 128  # c/include/index.h:366 (term-dictionary sampling)


class EncodedPostings(NamedTuple):
    docs: bytes        # VInt deltas (first = absolute doc id)
    freqs: bytes       # VInt freqs
    prx: bytes         # per-doc position VInt deltas, concatenated
    prx_lens: bytes    # VInt per-doc prx byte length
    skip: bytes        # Ferret-style (docΔ, frqΔ, prxΔ) triples every 16 docs
    block_max_tf: bytes  # VInt max-freq per 16-doc block (block-max WAND)
    doc_min: int
    doc_max: int
    max_tf: int


def encode_postings(
    docs: np.ndarray,
    freqs: np.ndarray,
    positions: np.ndarray | None,
    pos_doc_offsets: np.ndarray | None,
    prx_lens_arr: np.ndarray | None = None,
) -> EncodedPostings:
    """Encode one term's postings.

    ``docs``/``freqs``: int64/int32 arrays (docs ascending).
    ``positions``: flat int32 array of all positions (doc-major order);
    ``pos_doc_offsets``: int64 array of len(docs)+1 giving each doc's slice.
    ``prx_lens_arr``: pre-computed per-doc prx byte lengths (merge path,
    where position blobs are concatenated without re-decoding).
    """
    docs = np.asarray(docs, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    n = docs.size
    deltas = np.empty(n, dtype=np.int64)
    if n:
        deltas[0] = docs[0]
        np.subtract(docs[1:], docs[:-1], out=deltas[1:])
    docs_enc = vint_encode(deltas)
    freqs_enc = vint_encode(freqs)

    if positions is not None and positions.size:
        positions = np.asarray(positions, dtype=np.int64)
        off = np.asarray(pos_doc_offsets, dtype=np.int64)
        pdeltas = np.empty(positions.size, dtype=np.int64)
        pdeltas[0] = positions[0]
        np.subtract(positions[1:], positions[:-1], out=pdeltas[1:])
        starts = off[:-1]
        nonempty = starts[(off[1:] - starts) > 0]
        pdeltas[nonempty] = positions[nonempty]  # restart delta per doc
        prx_enc = vint_encode(pdeltas)
        per_pos_len = vint_byte_len(pdeltas)
        # per-doc byte length = sum of its positions' byte lengths
        prx_lens_arr = np.add.reduceat(per_pos_len, starts) if n else (
            np.empty(0, dtype=np.int64)
        )
        prx_lens_arr = np.where((off[1:] - starts) > 0, prx_lens_arr, 0)
        prx_lens_enc = vint_encode(prx_lens_arr)
    else:
        prx_enc = b""
        if prx_lens_arr is None:
            prx_lens_arr = np.zeros(n, dtype=np.int64)
        else:
            prx_lens_arr = np.asarray(prx_lens_arr, dtype=np.int64)
        prx_lens_enc = vint_encode(prx_lens_arr) if n else b""

    # skip data every SKIP_INTERVAL docs + block-max freqs
    if n > SKIP_INTERVAL:
        doc_byte_lens = vint_byte_len(deltas)
        frq_byte_lens = vint_byte_len(freqs)
        frq_cum = np.cumsum(doc_byte_lens + frq_byte_lens)
        prx_cum = np.cumsum(prx_lens_arr)
        pts = np.arange(SKIP_INTERVAL - 1, n, SKIP_INTERVAL)
        skip_docs = docs[pts]
        skip_frq = frq_cum[pts]
        skip_prx = prx_cum[pts]
        sd = np.empty(pts.size, dtype=np.int64)
        sd[0] = skip_docs[0]
        np.subtract(skip_docs[1:], skip_docs[:-1], out=sd[1:])
        sf = np.empty(pts.size, dtype=np.int64)
        sf[0] = skip_frq[0]
        np.subtract(skip_frq[1:], skip_frq[:-1], out=sf[1:])
        sp = np.empty(pts.size, dtype=np.int64)
        sp[0] = skip_prx[0]
        np.subtract(skip_prx[1:], skip_prx[:-1], out=sp[1:])
        tri = np.empty(pts.size * 3, dtype=np.int64)
        tri[0::3], tri[1::3], tri[2::3] = sd, sf, sp
        skip_enc = vint_encode(tri)
    else:
        skip_enc = b""

    nblocks = (n + SKIP_INTERVAL - 1) // SKIP_INTERVAL
    if nblocks:
        pad = nblocks * SKIP_INTERVAL - n
        fpad = np.concatenate([freqs, np.zeros(pad, dtype=np.int64)])
        bmax = fpad.reshape(nblocks, SKIP_INTERVAL).max(axis=1)
        block_max_enc = vint_encode(bmax)
    else:
        block_max_enc = b""

    return EncodedPostings(
        docs=docs_enc,
        freqs=freqs_enc,
        prx=prx_enc,
        prx_lens=prx_lens_enc,
        skip=skip_enc,
        block_max_tf=block_max_enc,
        doc_min=int(docs[0]) if n else 0,
        doc_max=int(docs[-1]) if n else 0,
        max_tf=int(freqs.max()) if n else 0,
    )


def decode_docs_freqs(
    docs_enc: bytes, freqs_enc: bytes
) -> tuple[np.ndarray, np.ndarray]:
    deltas = vint_decode(docs_enc)
    docs = np.cumsum(deltas)
    freqs = vint_decode(freqs_enc)
    return docs, freqs


def decode_positions_all(
    prx_enc: bytes, freqs: np.ndarray
) -> np.ndarray:
    """Decode ALL positions of a posting list in one vectorized pass.

    Returns the flat absolute positions (doc-major); slice doc ``i`` with
    ``off = concatenate(([0], cumsum(freqs)))``.
    """
    deltas = vint_decode(prx_enc)
    if deltas.size == 0:
        return deltas
    freqs = np.asarray(freqs, dtype=np.int64)
    nz = freqs > 0
    starts = np.concatenate(([0], np.cumsum(freqs)))[:-1][nz]
    c = np.cumsum(deltas)
    corr = c[starts] - deltas[starts]
    return c - np.repeat(corr, freqs[nz])


def decode_positions(
    prx_enc: bytes,
    prx_lens_enc: bytes,
    freqs: np.ndarray,
    select: np.ndarray | None = None,
) -> list[np.ndarray]:
    """Decode positions; if ``select`` (doc indices) is given, decode only
    those docs' position lists (skipping byte ranges via prx_lens)."""
    prx_lens = vint_decode(prx_lens_enc)
    byte_off = np.concatenate(([0], np.cumsum(prx_lens)))
    buf = memoryview(prx_enc)
    idxs = select if select is not None else np.arange(len(prx_lens))
    out: list[np.ndarray] = []
    for i in idxs:
        seg = buf[byte_off[i]: byte_off[i + 1]]
        out.append(np.cumsum(vint_decode(seg)))
    return out


# --- Ferret-exact interleaved .frq codec (parity-tested; sequential) -------

def frq_encode(docs: np.ndarray, freqs: np.ndarray) -> bytes:
    """Ferret .frq doc codes: delta<<1|1 when freq==1 else delta<<1, freq
    (c/src/index.c:5412-5422)."""
    vals: list[int] = []
    last = 0
    for d, f in zip(np.asarray(docs).tolist(), np.asarray(freqs).tolist()):
        delta = d - last
        last = d
        if f == 1:
            vals.append((delta << 1) | 1)
        else:
            vals.append(delta << 1)
            vals.append(f)
    return vint_encode(np.array(vals, dtype=np.int64))


def frq_decode(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    vals = vint_decode(buf).tolist()
    docs: list[int] = []
    freqs: list[int] = []
    last = 0
    i = 0
    n = len(vals)
    while i < n:
        code = vals[i]
        i += 1
        last += code >> 1
        docs.append(last)
        if code & 1:
            freqs.append(1)
        else:
            freqs.append(vals[i])
            i += 1
    return np.array(docs, dtype=np.int64), np.array(freqs, dtype=np.int64)
