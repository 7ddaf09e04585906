"""Deterministic stratified sampling — balanced per-group head
selection for training-data mixes (e.g. n documents per language /
source), reproducible across runs and cluster sizes.

Semantics: for each group key value, keep the ``n`` rows with the
smallest ``order_col`` (ties impossible for unique ids) — exactly SQL's
``row_number() OVER (PARTITION BY key ORDER BY order_col) <= n``.

Scale shape (the distributed top-k pattern, like functions/topk.py):
each batch reduces to its own per-group head (vectorized lexsort +
group-boundary mask — no Python over rows), so at most
``n_groups x n`` rows per block reach the ONE final groupby; the final
per-group head runs over those small survivors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _group_head(batch: pa.Table, key_col: str, order_col: str,
                n: int) -> pa.Table:
    """Per-group n smallest order_col rows within one batch."""
    if batch.num_rows == 0:
        return batch
    keys = batch.column(key_col).to_numpy(zero_copy_only=False)
    order = batch.column(order_col).to_numpy()
    # lexsort: primary = key, secondary = order
    idx = np.lexsort((order, keys))
    sk = keys[idx]
    # rank within group = position - start of the group's run
    starts = np.flatnonzero(
        np.concatenate(([True], sk[1:] != sk[:-1]))
    )
    run_id = np.cumsum(
        np.concatenate(([0], (sk[1:] != sk[:-1]).astype(np.int64)))
    )
    rank = np.arange(len(sk)) - starts[run_id]
    return batch.take(pa.array(idx[rank < n]))


def stratified_head(ds, key_col: str, order_col: str = "doc_id",
                    n: int = 5):
    """Ray Dataset of the n smallest ``order_col`` rows per ``key_col``
    value (all columns preserved)."""
    partial = ds.map_batches(
        lambda b: _group_head(b, key_col, order_col, n),
        batch_format="pyarrow",
    )

    def finish(group: pa.Table) -> pa.Table:
        return _group_head(group, key_col, order_col, n)

    # survivors are <= n_groups x n per input block: the groupby is tiny
    return partial.groupby(key_col).map_groups(
        finish, batch_format="pyarrow"
    )
