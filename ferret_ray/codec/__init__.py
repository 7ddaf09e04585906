from .norms import NORM_TABLE, byte2float, encode_norms, float2byte
from .postings import (
    INDEX_INTERVAL,
    SKIP_INTERVAL,
    EncodedPostings,
    decode_docs_freqs,
    decode_positions,
    encode_postings,
    frq_decode,
    frq_encode,
)
from .vint import vint_byte_len, vint_decode, vint_encode

__all__ = [
    "EncodedPostings",
    "INDEX_INTERVAL",
    "NORM_TABLE",
    "SKIP_INTERVAL",
    "byte2float",
    "decode_docs_freqs",
    "decode_positions",
    "encode_norms",
    "encode_postings",
    "float2byte",
    "frq_decode",
    "frq_encode",
    "vint_byte_len",
    "vint_decode",
    "vint_encode",
]
