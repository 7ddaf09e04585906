"""PII / secret scrubbing for training-data pipelines.

One vectorized RE2 pass per pattern per batch (`count_substring_regex`
+ `replace_substring_regex`) — no per-row Python.  The patterns are
RE2-safe and leftmost-first, so DuckDB's `regexp_extract_all` /
`regexp_replace(..., 'g')` are exact SQL oracles for both the counts
and the scrubbed text (verified element-wise in tests and by the
`scrub_pii` CORRECTNESS query).

At 100 TB this is a stateless `map_batches` stage: the regex set is
module-level (compiled once per worker process by RE2 internally), the
batch never leaves Arrow, and output order/docids are untouched.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement tag) — applied in this order, each on
# the output of the previous replacement
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    # long hex blobs: api keys, tokens, sha1/sha256 hashes
    ("hexkey", r"\b[0-9a-fA-F]{32,}\b", "[KEY]"),
]


def scrub_pii(batch, text_col: str = "text") -> dict:
    """doc_id, scrubbed text, and per-pattern match counts."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ids = batch.column("doc_id").to_numpy()
    out: dict = {"doc_id": ids}
    cur = col
    for name, pat, tag in PII_PATTERNS:
        out[f"n_{name}"] = (
            pc.count_substring_regex(cur, pat)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cur = pc.replace_substring_regex(cur, pat, tag)
    out["text"] = cur
    return out
