"""Per-doc term vectors: token-order (term, position, start, end) blobs.

The reference stores per-doc, per-field term vectors with positions and
offsets (TermVector, c/include/index.h:544-566; written per doc by
fw_add_postings) for the highlighter and get_matchv.  Ours is a compact
VInt-encoded token-order stream stored as a binary column
``tv_{field}`` in the docs table when ``FieldConfig.term_vector`` is
set: count, then per token (term_len, term_utf8, pos_delta,
start_delta, length).  Token order makes positions and offsets
monotone, so deltas stay small.
"""

from __future__ import annotations


def _vint(out: bytearray, v: int) -> None:
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


class _Cursor:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes):
        self.b = b
        self.i = 0

    def read(self) -> int:
        b = self.b
        i = self.i
        shift = 0
        v = 0
        while True:
            byte = b[i]
            i += 1
            v |= (byte & 0x7F) << shift
            if byte < 0x80:
                break
            shift += 7
        self.i = i
        return v


def encode_term_vector(
    tokens: list[tuple[str, int, int, int]]
) -> bytes:
    """tokens: token-order (term, position, start, end)."""
    out = bytearray()
    _vint(out, len(tokens))
    prev_pos = 0
    prev_start = 0
    for term, pos, start, end in tokens:
        tb = term.encode("utf-8", "surrogatepass")
        _vint(out, len(tb))
        out.extend(tb)
        _vint(out, pos - prev_pos)
        _vint(out, start - prev_start)
        _vint(out, end - start)
        prev_pos = pos
        prev_start = start
    return bytes(out)


def decode_term_vector(b: bytes) -> list[tuple[str, int, int, int]]:
    if not b:
        return []
    c = _Cursor(b)
    n = c.read()
    out: list[tuple[str, int, int, int]] = []
    pos = 0
    start = 0
    for _ in range(n):
        tl = c.read()
        term = c.b[c.i: c.i + tl].decode("utf-8", "surrogatepass")
        c.i += tl
        pos += c.read()
        start += c.read()
        length = c.read()
        out.append((term, pos, start, start + length))
    return out
