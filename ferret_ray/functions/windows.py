"""Windowed / sessionized aggregates over event streams.

Ray-Data-first event-time operators (the "streaming window" custom-op
class from the brief — event-time bucketing, not wall-clock streaming):

* tumbling_window_agg — assign window_start = floor(ts / window) and
  PRE-AGGREGATE inside every batch with Arrow's C++ group_by before the
  one small shuffle: the partial/combiner pattern that keeps the
  all-to-all exchange proportional to (windows x keys), not rows.
* sliding_window_agg  — each row replicates into window/slide buckets
  (flat expansion inside map_batches), then the same partial + shuffle.
* session_counts      — sessionization: hash-shuffle by user, per-group
  sorted gap-split (> gap starts a new session).

Money-style values aggregate as integer cents so results are exactly
reproducible (and SQL-oracle-checkable) regardless of summation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

US = 1_000_000


def _win_partial(
    batch: pa.Table, ts_col: str, key_col: str, value_col: str,
    window_sec: int,
) -> pa.Table:
    us = batch.column(ts_col).cast(pa.int64())
    win = pc.multiply(
        pc.divide(us, window_sec * US), window_sec
    )  # int64 floor-div -> window start in epoch seconds
    cents = pc.cast(
        pc.round(pc.multiply(batch.column(value_col), 100.0)),
        pa.int64(),
    )
    t = pa.table(
        {
            "window_start": win,
            key_col: batch.column(key_col),
            "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "cents": cents,
        }
    )
    agg = t.group_by(["window_start", key_col]).aggregate(
        [("n", "sum"), ("cents", "sum")]
    )
    # rename by NAME, not position: pyarrow's key/aggregate column order
    # in group_by output has changed across versions
    return agg.select(
        ["window_start", key_col, "n_sum", "cents_sum"]
    ).rename_columns(["window_start", key_col, "n", "cents"])


def tumbling_window_agg(
    ds,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_sec: int = 3600,
):
    """count + integer-cents sum per (tumbling window, key).

    Returns a Dataset with columns (window_start: epoch seconds int64,
    key, n, cents)."""
    partial = ds.map_batches(
        lambda b: _win_partial(b, ts_col, key_col, value_col, window_sec),
        batch_format="pyarrow",
    )
    out = partial.groupby(["window_start", key_col]).sum(["n", "cents"])
    return out


def sliding_window_agg(
    ds,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_sec: int = 3600,
    slide_sec: int = 900,
):
    """Sliding windows: every event lands in window//slide buckets."""
    k = window_sec // slide_sec

    def expand(batch: pa.Table) -> pa.Table:
        us = batch.column(ts_col).cast(pa.int64()).to_numpy()
        base = (us // (slide_sec * US)) * slide_sec  # last slide bound
        n = us.size
        reps = np.repeat(base, k)
        offs = np.tile(
            np.arange(k, dtype=np.int64) * slide_sec, n
        )
        win = reps - offs  # window_start candidates (desc)
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        keep = win >= 0
        rep_t = pa.table(
            {
                "window_start": pa.array(win[keep]),
                key_col: pc.take(
                    batch.column(key_col), pa.array(idx[keep])
                ),
                "n": pa.array(
                    np.ones(int(keep.sum()), dtype=np.int64)
                ),
                "cents": pc.take(
                    pc.cast(
                        pc.round(
                            pc.multiply(batch.column(value_col), 100.0)
                        ),
                        pa.int64(),
                    ),
                    pa.array(idx[keep]),
                ),
            }
        )
        agg = rep_t.group_by(["window_start", key_col]).aggregate(
            [("n", "sum"), ("cents", "sum")]
        )
        return agg.select(
            ["window_start", key_col, "n_sum", "cents_sum"]
        ).rename_columns(["window_start", key_col, "n", "cents"])

    return ds.map_batches(expand, batch_format="pyarrow").groupby(
        ["window_start", key_col]
    ).sum(["n", "cents"])


def session_counts(
    ds,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = 1800,
):
    """Sessions per user: a gap strictly greater than ``gap_sec`` starts
    a new session.  One hash shuffle on the user key; per-group work is
    a sort + one vectorized diff."""
    gap_us = gap_sec * US

    def per_user(group: pa.Table) -> pa.Table:
        us = np.sort(group.column(ts_col).cast(pa.int64()).to_numpy())
        n_sessions = 1 + int((np.diff(us) > gap_us).sum()) if us.size else 0
        return pa.table(
            {
                user_col: pa.array(
                    [group.column(user_col)[0].as_py()], type=pa.int64()
                ),
                "n_sessions": pa.array([n_sessions], type=pa.int64()),
            }
        )

    return ds.groupby(user_col).map_groups(
        per_user, batch_format="pyarrow"
    )
