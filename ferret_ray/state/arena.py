"""Hugepage-backed numpy allocation for large, short-lived kernels.

The sandbox kernel (and most cloud VMs) runs transparent hugepages in
``madvise`` mode, so every fresh numpy allocation is faulted in 4 KB at
a time: measured 7.2 s to first-touch 1 GB via ``np.empty`` vs 0.67 s
via an anonymous mmap with ``MADV_HUGEPAGE`` — a 10x difference that
dominated the cold wide-expansion profile (multi-hundred-MB cumsum /
accumulator temporaries cost tens of seconds in page faults alone).

``hp_empty``/``hp_zeros`` return ordinary ndarrays backed by a fresh
madvised anonymous mmap; the mapping is released when the array is
garbage-collected (the mmap object rides along as the array base).
Small requests fall through to numpy — hugepages only pay off past a
few MB.
"""

from __future__ import annotations

import mmap

import numpy as np

# below this, plain numpy allocation is cheaper than an mmap syscall
_MIN_BYTES = 1 << 22  # 4 MB

_HAVE_MADVISE = hasattr(mmap.mmap, "madvise") and hasattr(
    mmap, "MADV_HUGEPAGE"
)


def hp_empty(shape, dtype) -> np.ndarray:
    """np.empty on MADV_HUGEPAGE-backed anonymous memory."""
    dtype = np.dtype(dtype)
    if isinstance(shape, (int, np.integer)):
        shape = (int(shape),)
    nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
    if nbytes < _MIN_BYTES or not _HAVE_MADVISE:
        return np.empty(shape, dtype=dtype)
    mm = mmap.mmap(-1, nbytes)
    try:
        mm.madvise(mmap.MADV_HUGEPAGE)
    except OSError:  # kernel without THP; plain pages still work
        pass
    return np.frombuffer(mm, dtype=dtype).reshape(shape)


def hp_zeros(shape, dtype) -> np.ndarray:
    """np.zeros equivalent (anonymous mmap pages are already zero)."""
    dtype = np.dtype(dtype)
    if isinstance(shape, (int, np.integer)):
        shape = (int(shape),)
    nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
    if nbytes < _MIN_BYTES or not _HAVE_MADVISE:
        return np.zeros(shape, dtype=dtype)
    return hp_empty(shape, dtype)  # fresh anon mmap == zero-filled
