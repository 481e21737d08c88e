"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import numpy as np
import pytest

from pqvector_tpu.kernels.assign import assign_clusters_pallas

INTERPRET = jax.default_backend() != "tpu"


def test_pallas_assign_matches_brute_force():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((700, 16)).astype(np.float32)
    c = rng.standard_normal((12, 16)).astype(np.float32)
    got = assign_clusters_pallas(x, c, tile=128, interpret=INTERPRET)
    want = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1).argmin(1)
    np.testing.assert_array_equal(got, want)


def test_pallas_assign_tie_breaks_low_index():
    # Duplicate centroids: argmin must pick the lower index (reference
    # strict-less-than keeps the first, index.rs:408-415).
    x = np.array([[1.0, 1.0]], np.float32)
    c = np.array([[1.0, 1.0], [1.0, 1.0], [0.0, 0.0]], np.float32)
    got = assign_clusters_pallas(x, c, tile=128, interpret=INTERPRET)
    assert got[0] == 0


def test_pallas_assign_pads_arbitrary_row_counts():
    rng = np.random.default_rng(1)
    for n in (1, 127, 129, 500):
        x = rng.standard_normal((n, 8)).astype(np.float32)
        c = rng.standard_normal((4, 8)).astype(np.float32)
        got = assign_clusters_pallas(x, c, tile=128, interpret=INTERPRET)
        assert got.shape == (n,)
        want = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1).argmin(1)
        np.testing.assert_array_equal(got, want)
