"""Fault-aware allocation for large host matrices.

On this class of sandboxed microVM (Firecracker; `uname -r` *-fc-*),
first-touch page faults on glibc-malloc'd memory run at ~180 MB/s while
the same memory re-written warm does 6.7 GB/s (measured 2026-08-20,
docs/ROUND5.md §6) — so a fresh ``np.empty`` for a 4 GB embedding matrix
costs ~19 s of pure fault handling before a single byte of real work.
A plain anonymous ``mmap`` faults ~10x faster (~1.7 GB/s), and the
consumer (the chunk decoder) writes every byte exactly once, so the
faults amortize into the decode pass itself — no separate populate pass
(``MADV_POPULATE_WRITE`` measured 2.5 GB/s but pays an extra full pass
and swings to 0.4 GB/s under this VM's noisy neighbors). This was the
actual "decode floor" of the index build: the C++ chunk decoder itself
runs at ~1 GB/s (native/bench_decode.cpp) and file reads at 3.7 GB/s.

``alloc_matrix`` returns an mmap-backed ndarray and falls back to
``np.empty`` wherever the machinery is unavailable (non-POSIX, tiny
sizes where fault cost is noise).
"""

from __future__ import annotations

import mmap
import os

import numpy as np

#: Below this, fault cost is noise and np.empty is simpler.
_MIN_BYTES = 16 << 20

_disabled = os.environ.get("PQVECTOR_TPU_NO_MMAP_ALLOC", "") not in ("", "0")


def alloc_matrix(shape, dtype=np.float32) -> np.ndarray:
    """A C-contiguous ndarray of ``shape``/``dtype``, mmap-backed when
    large (see module docstring); np.empty otherwise."""
    dtype = np.dtype(dtype)
    nbytes = int(np.prod(shape)) * dtype.itemsize
    if _disabled or nbytes < _MIN_BYTES or os.name != "posix":
        return np.empty(shape, dtype)
    try:
        mm = mmap.mmap(-1, nbytes)
        return np.frombuffer(mm, dtype).reshape(shape)
    except (OSError, ValueError, OverflowError):
        return np.empty(shape, dtype)
