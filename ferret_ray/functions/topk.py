"""Distributed top-k by a stored-field sort key.

The scale path for Sort/SortField over huge docs tables (the reference
builds a full in-memory field cache, c/src/field_index.c:34-90; fine per
segment, wrong shape for 10^9 docs): every block contributes only its
local top-k (``map_batches``), and the driver merges k*num_blocks rows —
the same partial-top-k + tiny-merge shape as the ANN and scorer paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sort_topk(
    ds,
    by: str,
    k: int,
    *,
    ascending: bool = False,
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
):
    """Top-k rows of ``ds`` by column ``by`` (ties -> lower id wins).

    Returns a pandas frame of k rows with columns (id_col, by, *extra),
    already globally sorted.  Only k rows per block reach the driver."""
    cols = [id_col, by, *extra_cols]

    def local_topk(batch: pa.Table) -> pa.Table:
        keys = batch.column(by).to_numpy()
        ids = batch.column(id_col).to_numpy()
        sign = keys if ascending else -keys
        order = np.lexsort((ids, sign))[:k]
        return batch.select(cols).take(pa.array(order))

    parts = ds.map_batches(
        local_topk, batch_format="pyarrow"
    ).to_pandas()
    sign = parts[by].to_numpy() if ascending else -parts[by].to_numpy()
    order = np.lexsort((parts[id_col].to_numpy(), sign))[:k]
    return parts.iloc[order].reset_index(drop=True)


def grouped_topk(ds, by: str, key: str, k: int, *, ascending: bool = False):
    """Top-k rows of an aggregated Dataset by (``by`` desc|asc, ``key``
    asc) — the scale shape for "top N of a huge groupby" (top domains,
    df-hottest terms): each output block of the groupby contributes only
    its local top-k (the (value, key) order is total, so any global
    top-k row is in its block's local top-k), and the driver merges
    k * num_blocks rows instead of the full group cardinality.

    Returns a pandas frame of <= k rows, globally sorted."""
    import pyarrow.compute as pc

    direction = "ascending" if ascending else "descending"

    def local(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch,
            sort_keys=[(by, direction), (key, "ascending")],
        )
        return batch.take(idx[:k])

    parts = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        [by, key], ascending=[ascending, True]
    ).head(k)
    return parts.reset_index(drop=True)
