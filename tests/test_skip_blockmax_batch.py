"""Batched skip/block-max encoder == scalar reference, byte for byte.

`_skip_blockmax_cols` re-derives the Ferret-style skip entries
(c/src/index.c:5275-5327; (docΔ, prxΔ) pairs under format v7) for every
qualifying run of a merge slice in one numpy pass; `_skip_blockmax` is
the per-run scalar it replaced.
This test drives both through `_MergedGroups` on randomized segment
rows (mixed dfs around the SKIP_INTERVAL threshold, runs with and
without positions, multi-fragment runs needing re-delta) and asserts
identical column bytes.
"""

import numpy as np
import pyarrow as pa
import pytest

from ferret_ray.codec.vint import vint_encode
from ferret_ray.stages.invert import SEGMENT_SCHEMA
from ferret_ray.stages.merge import (
    SKIP_INTERVAL,
    _MergedGroups,
    _skip_blockmax,
    _skip_blockmax_cols,
)


def _make_row(rng, term, salt, doc_base, df, with_positions):
    deltas = rng.integers(1, 50, size=df).astype(np.int64)
    docs = np.cumsum(deltas)
    freqs = rng.integers(1, 30, size=df).astype(np.int64)
    if with_positions:
        plens = rng.integers(0, 9, size=df).astype(np.int64)
        prx = bytes(rng.integers(0, 256, size=int(plens.sum()), dtype=np.uint8))
        plens_enc = vint_encode(plens)
    else:
        prx, plens_enc = b"", b""
    return {
        "field": 0,
        "term": term,
        "shard_salt": salt,
        "doc_base": doc_base,
        "doc_first": int(docs[0]),
        "doc_last": int(docs[-1]),
        "df": df,
        "tf_sum": int(freqs.sum()),
        "max_tf": int(freqs.max()),
        "docs_rest": deltas[1:].astype(np.int32),
        "freqs_list": freqs.astype(np.int32),
        "prx_enc": prx,
        "prx_lens_enc": plens_enc,
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batched_equals_scalar(seed):
    rng = np.random.default_rng(seed)
    rows = []
    base = 0
    for t in range(40):
        term = f"t{t:03d}"
        n_frags = int(rng.integers(1, 4))
        with_pos = bool(rng.integers(0, 2))
        fb = 0
        for _ in range(n_frags):
            df = int(rng.integers(1, 3 * SKIP_INTERVAL))
            rows.append(
                _make_row(rng, term, t % 3, fb, df, with_pos)
            )
            fb += 1000
        base += 1
    batch = pa.Table.from_pylist(rows, schema=SEGMENT_SCHEMA)
    mg = _MergedGroups(batch)

    # batched columns over sub-slices (exercises the i>0 offset path)
    splits = [0, mg.num_runs // 3, mg.num_runs]
    for i, j in zip(splits[:-1], splits[1:]):
        skip_col, bmax_col = _skip_blockmax_cols(mg, i, j)
        assert len(skip_col) == j - i and len(bmax_col) == j - i
        for k in range(i, j):
            df_k = int(mg.df[k])
            if df_k > SKIP_INTERVAL:
                deltas_k = mg.run_docs_vals(k).astype(np.int64)
                exp_skip, exp_bmax = _skip_blockmax(
                    np.cumsum(deltas_k),
                    mg.run_freq_vals(k).astype(np.int64),
                    mg.run_bytes("prx_lens_enc", k),
                )
            else:
                exp_skip, exp_bmax = b"", b""
            assert skip_col[k - i].as_py() == exp_skip, (k, "skip")
            assert bmax_col[k - i].as_py() == exp_bmax, (k, "bmax")


def test_all_short_runs_slice():
    """A slice where no run qualifies returns all-empty columns."""
    rng = np.random.default_rng(7)
    rows = [
        _make_row(rng, f"s{i}", 0, 0, int(rng.integers(1, SKIP_INTERVAL)),
                  True)
        for i in range(10)
    ]
    batch = pa.Table.from_pylist(rows, schema=SEGMENT_SCHEMA)
    mg = _MergedGroups(batch)
    skip_col, bmax_col = _skip_blockmax_cols(mg, 0, mg.num_runs)
    assert all(v.as_py() == b"" for v in skip_col)
    assert all(v.as_py() == b"" for v in bmax_col)
