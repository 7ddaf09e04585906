"""Document chunking: fixed-size overlapping character windows — the
standard pre-tokenization splitter for long documents in training-data
pipelines.

Chunk k of a doc covers codepoints ``[k*stride, k*stride + size)``;
chunks exist for every ``k*stride < len(text)`` (empty docs emit none).
Vectorized: one ``utf8_length`` per batch, then ONE Arrow
``utf8_slice_codeunits`` kernel per chunk ordinal over the (filtered)
column — the loop is over the max chunk count in the batch (tiny),
never over rows.  SQL-oracle-exact vs DuckDB
``substring(text, k*stride+1, size)`` over a lateral
``generate_series`` (both slice by codepoints).

A ``flat_map``-shaped ``map_batches`` stage: rows out > rows in; at
100 TB pick ``size``/``stride`` so chunk bytes x batch_size stays in
worker heap, and let downstream repartition if chunk skew matters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_text(
    batch,
    size: int = 1000,
    stride: int = 800,
    text_col: str = "text",
) -> pa.Table:
    """rows (doc_id, chunk_id, chunk) for every window of every doc."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ids = batch.column("doc_id").to_numpy()
    lens = pc.utf8_length(col).to_numpy(zero_copy_only=False)
    out_ids: list[np.ndarray] = []
    out_ks: list[np.ndarray] = []
    out_chunks: list[pa.Array] = []
    max_k = int(np.ceil(lens.max() / stride)) if len(lens) else 0
    for k in range(max_k):
        mask = lens > k * stride
        if not mask.any():
            break
        sub = col.filter(pa.array(mask))
        out_ids.append(ids[mask])
        out_ks.append(np.full(int(mask.sum()), k, dtype=np.int64))
        out_chunks.append(
            pc.utf8_slice_codeunits(
                sub, start=k * stride, stop=k * stride + size
            )
        )
    if not out_ids:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "chunk_id": pa.array([], type=pa.int64()),
                "chunk": pa.array([], type=pa.string()),
            }
        )
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_ids)),
            "chunk_id": pa.array(np.concatenate(out_ks)),
            "chunk": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                 else c for c in out_chunks]
            ),
        }
    )
